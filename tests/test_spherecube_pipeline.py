"""End-to-end spherecube pipeline: render -> dataset -> conv VAE training.

This exercises the full image path of BASELINE.json configs 2-5 using the
in-repo renderer (the reference needs Blender for this; datasets are
format-compatible either way)."""
import os

import jax
import numpy as np
import pytest

from lie_vae_tpu.cli.gen_spherecube import generate
from lie_vae_tpu.data import ScPairsDataset, SphereCubeDataset, random_split
from lie_vae_tpu.data.render import render_spherecube
from lie_vae_tpu.models import LieVAE
from lie_vae_tpu.train import ConstantSchedule, UnsupervisedExperiment


@pytest.fixture(scope="module")
def spherecube_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("spherecube")
    generate(24, str(d), step_size=0.1, pairs=False, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def scpairs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sc-pairs")
    generate(12, str(d), step_size=0.1, pairs=True, seed=0)
    return str(d)


def test_generate_is_pose_pinned(tmp_path):
    """Datasets are reproducible across machine rotations: pose sampling is
    pure numpy (PCG64), every generate() writes an _poses.npz manifest, and
    ``from_poses`` re-renders a manifest byte-for-byte (the r2 pipeline
    sampled poses on the session's default jax device, so each host realized
    a different dataset and cross-round tables were not comparable)."""
    import hashlib

    from lie_vae_tpu.cli.gen_spherecube import sample_poses

    r1, q1 = sample_poses(16, 0.1, True, seed=5)
    r2, q2 = sample_poses(16, 0.1, True, seed=5)
    assert (r1 == r2).all() and (q1 == q2).all()
    assert r1.shape == (16, 2, 3, 3)
    # pair b is a valid rotation (numpy expmap path)
    b = r1[:, 1].astype(np.float64)
    assert np.abs(b @ b.transpose(0, 2, 1) - np.eye(3)).max() < 1e-5

    d1, d2 = tmp_path / "a", tmp_path / "b"
    generate(6, str(d1), step_size=0.1, pairs=False, seed=3)
    assert (d1 / "_poses.npz").exists()
    generate(6, str(d2), step_size=0.1, pairs=False, seed=99,
             from_poses=str(d1 / "_poses.npz"))

    def digest(d):
        return sorted(
            (f.name, hashlib.sha256(f.read_bytes()).hexdigest())
            for f in d.iterdir() if f.suffix == ".png")

    assert digest(d1) == digest(d2)
    # a SMALLER request renders an exact prefix of the manifest
    d3 = tmp_path / "c"
    generate(4, str(d3), step_size=0.1, pairs=False,
             from_poses=str(d1 / "_poses.npz"))
    assert digest(d3) == digest(d1)[:4]
    # a LARGER request is rejected, not silently padded
    with pytest.raises(ValueError):
        generate(7, str(d3), step_size=0.1, pairs=False,
                 from_poses=str(d1 / "_poses.npz"))


def test_generate_auto_pins_committed_manifest(tmp_path, monkeypatch):
    """generate() picks up data_poses/<dir-basename>.npz automatically, so
    drivers and bench.py render the committed realization on any host."""
    from lie_vae_tpu.cli import gen_spherecube as g

    src = tmp_path / "myset"
    generate(6, str(src), step_size=0.1, pairs=False, seed=11)
    pose_dir = tmp_path / "data_poses"
    pose_dir.mkdir()
    (pose_dir / "myset.npz").write_bytes((src / "_poses.npz").read_bytes())
    monkeypatch.setattr(g, "POSE_SETS_DIR", str(pose_dir))

    fresh = tmp_path / "elsewhere" / "myset"
    g.generate(4, str(fresh), step_size=0.1, pairs=False, seed=999)
    a = sorted(f.name for f in src.iterdir() if f.suffix == ".png")[:4]
    b = sorted(f.name for f in fresh.iterdir() if f.suffix == ".png")
    assert a == b
    # pairs mismatch or too-small manifest -> falls back to fresh sampling
    pairs_dir = tmp_path / "elsewhere2" / "myset"
    g.generate(4, str(pairs_dir), step_size=0.1, pairs=True, seed=1)
    assert len(list(pairs_dir.glob("*.png"))) == 8


def test_committed_manifests_match_sampler():
    """The committed data_poses/ manifests ARE sample_poses(num, seed=0) —
    i.e. the pinned realizations stay reproducible from code alone even if
    the npz files were lost (and the files haven't drifted)."""
    from lie_vae_tpu.cli.gen_spherecube import POSE_SETS_DIR, sample_poses

    for name, num in [("spherecube.npz", 2048),
                      ("spherecube-v2-32k.npz", 32768)]:
        path = os.path.join(POSE_SETS_DIR, name)
        assert os.path.exists(path), path
        with np.load(path) as f:
            r, q = f["r"], f["q"]
        r2, q2 = sample_poses(num, 0.1, False, seed=0)
        assert (r == r2).all() and (q == q2).all(), name


def test_renderer_pose_sensitivity():
    from lie_vae_tpu import ops
    R = np.asarray(ops.random_group_matrices(jax.random.PRNGKey(1), 8))
    imgs = render_spherecube(R)
    assert imgs.shape == (8, 64, 64, 3)
    assert np.isfinite(imgs).all()
    # pairwise distinct
    flat = imgs.reshape(8, -1)
    dists = np.linalg.norm(flat[:, None] - flat[None], axis=-1)
    np.fill_diagonal(dists, np.inf)
    assert dists.min() > 0.5


def test_spherecube_dataset_roundtrip(spherecube_dir):
    ds = SphereCubeDataset(directory=spherecube_dir)
    assert len(ds) == 24
    name, g, img = ds[0]
    assert img.shape == (64, 64, 3)
    assert g.shape == (3, 3)
    # pose label is a valid rotation
    np.testing.assert_allclose(g @ g.T, np.eye(3), atol=1e-3)
    # re-render from the parsed pose reproduces the image (same renderer,
    # quaternion was stored at 4 decimals)
    re_img = render_spherecube(g)
    assert np.abs(re_img - img).mean() < 0.01


def test_scpairs_dataset(scpairs_dir):
    ds = ScPairsDataset(directory=scpairs_dir)
    assert len(ds) == 12
    names, gs, imgs = ds[0]
    assert gs.shape == (2, 3, 3)
    assert imgs.shape == (2, 64, 64, 3)
    batch = ds.gather([0, 1])
    flat = ds.prep_batch(batch)
    assert flat[-1].shape == (4, 64, 64, 3)   # pairs flattened into batch


def test_spherecube_vae_trains(spherecube_dir):
    ds = SphereCubeDataset(directory=spherecube_dir)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="s2s2", encode_mode="conv",
                   deconv_mode="deconv", degrees=2, rep_copies=2,
                   deconv_hidden=8, rgb=True)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        beta_schedule=ConstantSchedule(1.0), batch_size=8,
        report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5)
    first = exp.test()
    exp.train(0)
    exp.train(1)
    last = exp.test()
    assert np.isfinite(last).all()
    assert last[0] < first[0]    # recon moved down


def test_scpairs_continuity_training(scpairs_dir):
    ds = ScPairsDataset(directory=scpairs_dir)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="s2s2", encode_mode="conv",
                   deconv_mode="deconv", degrees=2, rep_copies=2,
                   deconv_hidden=8, rgb=True)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        beta_schedule=ConstantSchedule(1.0), batch_size=4,
        report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
        encoder_continuity_lamb=lambda it: 10.0)
    exp.train(0)
    assert np.isfinite(exp.test()).all()


def test_equivariance_training_without_batchnorm(spherecube_dir):
    """Regression: the equivariance second encoder pass must work when the
    model has no BatchNorm (apply() with an empty mutable list still returns
    an (out, vars) tuple)."""
    ds = SphereCubeDataset(directory=spherecube_dir)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="alg", encode_mode="conv",
                   deconv_mode="deconv", degrees=2, rep_copies=2,
                   deconv_hidden=8, rgb=True, batch_norm=False)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        beta_schedule=ConstantSchedule(1.0), batch_size=8,
        report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
        equivariance_lamb=lambda it: 5.0)
    exp.train(0)
    assert np.isfinite(exp.test()).all()


def test_equivariance_second_pass_updates_batch_stats(spherecube_dir):
    """The reference's equivariance term encodes the rotated batch in train
    mode (equivariance_loss.py:34), so BN running statistics advance a
    second time each step. Pin that the second pass's stats mutation is
    kept: with lamb=0 the regularizer contributes nothing to the loss
    (params must match the no-regularizer run bitwise), so differing
    batch_stats can only come from the chained second encoder pass."""
    import jax

    def run(with_eq):
        ds = SphereCubeDataset(directory=spherecube_dir)
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       mean_mode="s2s2", encode_mode="conv",
                       deconv_mode="deconv", degrees=2, rep_copies=2,
                       deconv_hidden=8, rgb=True, batch_norm=True)
        exp = UnsupervisedExperiment(
            model=model, train_dataset=ds, test_dataset=ds,
            beta_schedule=ConstantSchedule(1.0), batch_size=8,
            report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
            equivariance_lamb=(lambda it: 0.0) if with_eq else None)
        exp.train(0)
        return (jax.tree_util.tree_leaves(exp.state.params),
                jax.tree_util.tree_leaves(exp.state.batch_stats))

    eq_params, eq_stats = run(True)
    params, stats = run(False)
    for a, b in zip(eq_params, params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(eq_stats, stats)), \
        "second encoder pass did not advance BN running statistics"


def test_beta_zero_skips_nan_kl(spherecube_dir):
    """Regression: with beta == 0 a NaN-producing KL (fixed_sigma=0 ->
    log(0)) must not poison gradients or trip the NaN guard — the reference
    skips the KL entirely in its Python branch (unsupervised.py:80-95)."""
    from lie_vae_tpu.data import ToyDataset

    ds = ToyDataset.generate(n=64, degrees=2, rep_copies=3)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy", mean_mode="alg",
                   degrees=2, rep_copies=3, fixed_sigma=0.0)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        beta_schedule=ConstantSchedule(0.0), batch_size=32,
        report_freq=10 ** 9, lr=1e-3, clip_grads=None)
    exp.train(0)   # must not raise 'NaN KL'
    import jax
    leaves = jax.tree_util.tree_leaves(exp.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves), \
        "NaN KL gradients leaked into parameters"


def test_equivariance_training(spherecube_dir):
    ds = SphereCubeDataset(directory=spherecube_dir)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="s2s2", encode_mode="conv",
                   deconv_mode="deconv", degrees=2, rep_copies=2,
                   deconv_hidden=8, rgb=True)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        beta_schedule=ConstantSchedule(1.0), batch_size=8,
        report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
        equivariance_lamb=lambda it: 5.0)
    exp.train(0)
    assert np.isfinite(exp.test()).all()
