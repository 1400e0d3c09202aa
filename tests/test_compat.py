"""PyTorch-reference checkpoint import (lie_vae_tpu.compat).

Builds actual reference VAEs (from /root/reference, deps stubbed as in
test_torch_parity), saves their ``state_dict()`` the way the reference
checkpoints do (main.py:122-127), imports them through the public
``compat`` API, and asserts the imported model reproduces the reference
forward pass — the end-to-end migration path for existing reference runs.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "lie_vae")),
    reason="reference checkout not available")

from test_torch_parity import _install_stubs, t2n  # noqa: E402

from lie_vae_tpu.compat import (import_torch_state_dict,  # noqa: E402
                                load_torch_checkpoint)
from lie_vae_tpu.models import LieVAE  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import types

    import lie_vae.decoders as decoders
    from lie_vae.experiments import vae as vae_mod

    # Reference bug shims (documented in test_torch_parity): ActionNet
    # rejects the z_content decode always passes, r_callback is unset.
    if not getattr(decoders.ActionNet.forward, "_content_shim", False):
        orig = decoders.ActionNet.forward

        def fwd(self, angles, content=None):
            return orig(self, angles)

        fwd._content_shim = True
        decoders.ActionNet.forward = fwd
    return types.SimpleNamespace(vae=vae_mod)


def _build_pair(ref, seed, **cfg):
    """Reference VAE + LieVAE + init template for one shared config."""
    torch.manual_seed(seed)
    ref_model = ref.vae.VAE(deterministic=True, **cfg)
    ref_model.r_callback = None
    ref_model.eval()
    model = LieVAE(deterministic=True, **cfg)
    chans = 3 if cfg.get("rgb") else 1
    if cfg.get("deconv_mode") == "toy":
        x = np.random.default_rng(seed).normal(size=(
            4, (cfg["degrees"] + 1) ** 2, cfg["rep_copies"]),
        ).astype(np.float32)
    else:
        x = np.random.default_rng(seed).random(
            size=(4, 64, 64, chans)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), n=1, train=False)
    return ref_model, model, variables, x


def _assert_forward_match(ref_model, model, variables, x, atol=3e-5):
    if x.ndim == 4:                      # image: NHWC here, NCHW there
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    else:                                # toy spectra: same layout
        xt = torch.tensor(x)
    with torch.no_grad():
        recon_t = ref_model(xt, n=1)
    recon, _ = model.apply(variables, jnp.asarray(x), n=1, train=False)
    ours = np.asarray(recon)
    if x.ndim == 4:
        ours = np.transpose(ours, (0, 1, 4, 2, 3))
    theirs = t2n(recon_t).reshape(ours.shape)
    scale = max(1.0, np.abs(theirs).max())
    assert np.abs(ours - theirs).max() / scale < atol


FLAGSHIP = dict(latent_mode="so3", decoder_mode="action", mean_mode="s2s2",
                encode_mode="conv", deconv_mode="deconv", degrees=3,
                rep_copies=4, deconv_hidden=32, rgb=True, batch_norm=True)


def test_import_flagship_with_bn_stats(ref):
    """conv+BN encoder, s2s2 mean, action decoder — including non-trivial
    BatchNorm running statistics (the torch model sees a train-mode pass
    first so running_mean/var move off their init values)."""
    ref_model, model, variables, x = _build_pair(ref, 0, **FLAGSHIP)
    ref_model.train()
    with torch.no_grad():   # advance running stats away from (0, 1)
        ref_model(torch.tensor(np.transpose(x, (0, 3, 1, 2))), n=1)
    ref_model.eval()

    imported = import_torch_state_dict(ref_model.state_dict(), model,
                                       variables)
    assert not np.allclose(
        np.asarray(imported["batch_stats"]["encoder"]["BatchNorm_0"]["mean"]),
        0.0)
    _assert_forward_match(ref_model, model, imported, x)


def test_import_normal_mlp_no_bn(ref):
    """ConvNet (no BN) indices + Nreparameterize + MLPNet mapping."""
    cfg = dict(latent_mode="normal", decoder_mode="mlp", normal_dims=8,
               encode_mode="conv", deconv_mode="deconv", degrees=3,
               rep_copies=4, deconv_hidden=16, rgb=False, batch_norm=False)
    ref_model, model, variables, x = _build_pair(ref, 1, **cfg)
    imported = import_torch_state_dict(ref_model.state_dict(), model,
                                       variables)
    _assert_forward_match(ref_model, model, imported, x)


def test_import_toy_s2s1(ref):
    """Toy MLP encoder (Sequential index 1), S2S1 two-linear mean head,
    identity deconv."""
    cfg = dict(latent_mode="so3", decoder_mode="action", mean_mode="s2s1",
               encode_mode="toy", deconv_mode="toy", degrees=3, rep_copies=4)
    ref_model, model, variables, x = _build_pair(ref, 2, **cfg)
    imported = import_torch_state_dict(ref_model.state_dict(), model,
                                       variables)
    _assert_forward_match(ref_model, model, imported, x)


def test_import_vmfq(ref):
    """Sreparameterize head (mu + k linears), quaternion chart decode."""
    cfg = dict(latent_mode="vmfq", decoder_mode="action", encode_mode="conv",
               deconv_mode="deconv", degrees=3, rep_copies=4,
               deconv_hidden=16, rgb=False, batch_norm=False)
    ref_model, model, variables, x = _build_pair(ref, 3, **cfg)
    imported = import_torch_state_dict(ref_model.state_dict(), model,
                                       variables)
    _assert_forward_match(ref_model, model, imported, x)


def test_import_fixed_sigma_alg(ref):
    """fixed_sigma runs: the reference instantiates sigma_linear anyway
    (reparameterize.py:107) — its unused weights must be ignored, not
    rejected. Also covers the AlgebraMean head."""
    cfg = dict(latent_mode="so3", decoder_mode="action", mean_mode="alg",
               encode_mode="conv", deconv_mode="deconv", degrees=3,
               rep_copies=4, deconv_hidden=16, rgb=False, batch_norm=False,
               fixed_sigma=0.1)
    ref_model, model, variables, x = _build_pair(ref, 8, **cfg)
    imported = import_torch_state_dict(ref_model.state_dict(), model,
                                       variables)
    _assert_forward_match(ref_model, model, imported, x)


def test_config_mismatch_is_loud(ref):
    """A checkpoint from a different architecture fails with named keys
    instead of silently leaving submodules untrained."""
    ref_model, model, variables, _ = _build_pair(ref, 4, **FLAGSHIP)
    wrong = LieVAE(deterministic=True,
                   **{**FLAGSHIP, "batch_norm": False})
    with pytest.raises(ValueError, match="BatchNorm|running_mean|unknown"):
        import_torch_state_dict(ref_model.state_dict(), wrong, variables)

    sd = ref_model.state_dict()
    sd.pop(next(iter(sd)))
    with pytest.raises(ValueError, match="missing"):
        import_torch_state_dict(sd, model, variables)


TOY_CFG = dict(latent_mode="so3", decoder_mode="action", mean_mode="s2s2",
               encode_mode="toy", deconv_mode="toy", degrees=3, rep_copies=4)


def test_cli_torch_checkpoint(ref, tmp_path, monkeypatch):
    """--torch_checkpoint initializes a CLI run from a reference pickle
    (epochs=0: the imported params must survive untouched)."""
    from lie_vae_tpu.cli.main import main

    torch.manual_seed(6)
    ref_model = ref.vae.VAE(deterministic=False, **TOY_CFG)
    ckpt = tmp_path / "model.pickle"
    torch.save(ref_model.state_dict(), str(ckpt))

    monkeypatch.chdir(tmp_path)
    experiment = main([
        "--dataset", "toy", "--epochs", "0", "--degrees", "3",
        "--rep_copies", "4", "--beta", "1", "--ll_samples", "5",
        "--ll_max_items", "2", "--torch_checkpoint", str(ckpt)])
    got = np.asarray(experiment.state.params["decoder"]["item_rep"])
    np.testing.assert_allclose(got, t2n(ref_model.decoder.item_rep),
                               atol=1e-7)

    with pytest.raises(SystemExit, match="continue_epoch"):
        main(["--dataset", "toy", "--epochs", "0", "--degrees", "3",
              "--rep_copies", "4", "--continue_epoch", "1",
              "--save_dir", "out", "--torch_checkpoint", str(ckpt)])


def test_serve_export_torch(ref, tmp_path, monkeypatch):
    """serve export --torch converts a reference pickle into the .npz
    deployment artifact; the artifact round-trips into a session."""
    from lie_vae_tpu.cli.serve import cmd_export
    from lie_vae_tpu.serve import load_npz

    torch.manual_seed(7)
    ref_model = ref.vae.VAE(deterministic=False, **TOY_CFG)
    ckpt = tmp_path / "model.pickle"
    torch.save(ref_model.state_dict(), str(ckpt))

    monkeypatch.chdir(tmp_path)
    out = cmd_export(["--torch", str(ckpt), "--dataset", "toy",
                      "--degrees", "3", "--rep_copies", "4"])
    params, batch_stats, step = load_npz(out)
    assert step == 0
    np.testing.assert_allclose(np.asarray(params["decoder"]["item_rep"]),
                               t2n(ref_model.decoder.item_rep), atol=1e-7)


def test_export_to_reference_strict(ref):
    """Reverse migration: a TPU variables tree exports to a state_dict
    the live reference loads with strict=True, and the two models then
    agree forward — TPU-trained models flow back to the reference."""
    from lie_vae_tpu.compat import export_torch_state_dict

    ref_model, model, variables, x = _build_pair(ref, 9, **FLAGSHIP)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(variables, model).items()}
    ref_model.load_state_dict(sd, strict=True)
    ref_model.eval()
    _assert_forward_match(ref_model, model, variables, x)


def test_export_import_round_trip(ref):
    """import(export(v)) == v bit-exactly for every tensor."""
    from lie_vae_tpu.compat import export_torch_state_dict

    _, model, variables, _ = _build_pair(ref, 10, **FLAGSHIP)
    back = import_torch_state_dict(
        export_torch_state_dict(variables, model), model, variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        dict(variables), back)


def test_export_fixed_sigma_strict(ref):
    """fixed_sigma export synthesizes the buffer + untrained sigma_linear
    the reference registers (strict load must accept it)."""
    from lie_vae_tpu.compat import export_torch_state_dict

    cfg = dict(latent_mode="so3", decoder_mode="action", mean_mode="alg",
               encode_mode="toy", deconv_mode="toy", degrees=3,
               rep_copies=4, fixed_sigma=0.25)
    ref_model, model, variables, x = _build_pair(ref, 11, **cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(variables, model).items()}
    ref_model.load_state_dict(sd, strict=True)
    ref_model.eval()
    _assert_forward_match(ref_model, model, variables, x)


def test_serve_export_to_torch(ref, tmp_path, monkeypatch):
    """serve export --to_torch: orbax checkpoint -> reference pickle."""
    from lie_vae_tpu.cli.serve import cmd_export
    from lie_vae_tpu.train.checkpoint import save_state
    from lie_vae_tpu.train.state import TrainState, make_optimizer

    ref_model, model, variables, x = _build_pair(ref, 12, **TOY_CFG)
    tx = make_optimizer()
    state = TrainState.create(params=variables["params"], batch_stats={},
                              tx=tx)
    ckpt_dir = tmp_path / "outputs" / "run" / "checkpoint"
    save_state(str(ckpt_dir), state)

    monkeypatch.chdir(tmp_path)
    out = cmd_export(["--name", "run", "--to_torch", "model.pickle",
                      "--dataset", "toy", "--degrees", "3",
                      "--rep_copies", "4"])
    sd = torch.load(out, map_location="cpu", weights_only=True)
    ref_model.load_state_dict(sd, strict=True)
    ref_model.eval()
    _assert_forward_match(ref_model, model, variables, x)


def test_load_torch_checkpoint_file(ref, tmp_path):
    """Round trip through an on-disk torch checkpoint, the reference's
    actual artifact format (main.py:122-127)."""
    ref_model, model, variables, x = _build_pair(ref, 5, **FLAGSHIP)
    path = tmp_path / "model.pickle"
    torch.save(ref_model.state_dict(), str(path))
    imported = load_torch_checkpoint(str(path), model, variables)
    _assert_forward_match(ref_model, model, imported, x)
