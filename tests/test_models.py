"""Model assembly tests: shape/finiteness parity across the reference's
config grid (lie_vae/experiments/vae.py), gradient checks, AE mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lie_vae_tpu.models import LieVAE


def _init_and_run(model, x, n=1, seed=0):
    rngs = {"params": jax.random.PRNGKey(seed),
            "sample": jax.random.PRNGKey(seed + 1)}
    variables = model.init(rngs, x, n=n, train=True)
    out, mutated = model.apply(
        variables, x, n=n, train=True,
        rngs={"sample": jax.random.PRNGKey(seed + 2)},
        mutable=["batch_stats"])
    return variables, out


IMG_CONFIGS = [
    dict(latent_mode="so3", decoder_mode="action", mean_mode="s2s2"),
    dict(latent_mode="so3", decoder_mode="action", mean_mode="alg"),
    dict(latent_mode="so3", decoder_mode="action", mean_mode="q"),
    dict(latent_mode="so3", decoder_mode="action", mean_mode="s2s1"),
    dict(latent_mode="so3", decoder_mode="mlp", mean_mode="s2s2"),
    dict(latent_mode="normal", decoder_mode="mlp", normal_dims=30),
    dict(latent_mode="normal", decoder_mode="action", normal_dims=3),
    dict(latent_mode="vmf", decoder_mode="mlp"),
    dict(latent_mode="vmfq", decoder_mode="action"),
]


@pytest.mark.parametrize("cfg", IMG_CONFIGS,
                         ids=[f"{c['latent_mode']}-{c['decoder_mode']}"
                              + c.get("mean_mode", "") for c in IMG_CONFIGS])
def test_image_configs_forward(cfg):
    model = LieVAE(encode_mode="conv", deconv_mode="deconv", rgb=True,
                   degrees=2, deconv_hidden=8, rep_copies=2, **cfg)
    x = jnp.zeros((2, 64, 64, 3))
    _, (recon, stats) = _init_and_run(model, x, n=3)
    assert recon.shape == (3, 2, 64, 64, 3)
    assert np.isfinite(np.asarray(recon)).all()
    assert len(stats) == 1
    kl = stats[0].kl()
    assert kl.shape == (2,)
    assert np.isfinite(np.asarray(kl)).all()


def test_vmf_action_fails_fast():
    # the 4-dim S^3 latent has no Euler chart for the action decoder
    # (the reference crashes the same way, but only inside decode —
    # vae.py:183-184); here it must refuse at init, pointing at 'vmfq'
    model = LieVAE(latent_mode="vmf", decoder_mode="action",
                   encode_mode="conv", deconv_mode="deconv", rgb=True,
                   degrees=2, deconv_hidden=8, rep_copies=2)
    with pytest.raises(ValueError, match="vmfq"):
        _init_and_run(model, jnp.zeros((2, 64, 64, 3)))


def test_toy_config_forward(key):
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy",
                   mean_mode="s2s2", degrees=6, rep_copies=10)
    x = jax.random.normal(key, (4, 49, 10))
    _, (recon, stats) = _init_and_run(model, x, n=2)
    assert recon.shape == (2, 4, 49, 10)
    assert np.isfinite(np.asarray(recon)).all()


def test_elbo_and_ll(key):
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy",
                   mean_mode="s2s2", degrees=3, rep_copies=4)
    x = jax.random.normal(key, (4, 16, 4))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)

    (recon, kl_sum, kls, stats), _ = model.apply(
        variables, x, n=2, method="elbo",
        rngs={"sample": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert recon.shape == (2, 4)
    assert kl_sum.shape == (4,)
    assert len(kls) == 1
    assert np.isfinite(np.asarray(recon)).all()
    assert np.isfinite(np.asarray(kl_sum)).all()

    ll = model.apply(variables, x, n=50, method="log_likelihood",
                     rngs={"sample": jax.random.PRNGKey(3)})
    assert np.isfinite(float(ll))


def test_deterministic_ae_mode(key):
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy",
                   mean_mode="alg", degrees=2, rep_copies=2,
                   deterministic=True)
    x = jax.random.normal(key, (3, 9, 2))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)
    # two applies with different sample rngs must agree exactly
    out1, _ = model.apply(variables, x, n=2, train=True,
                          rngs={"sample": jax.random.PRNGKey(5)},
                          mutable=["batch_stats"])
    out2, _ = model.apply(variables, x, n=2, train=True,
                          rngs={"sample": jax.random.PRNGKey(99)},
                          mutable=["batch_stats"])
    np.testing.assert_allclose(out1[0], out2[0])
    # samples along n axis identical
    np.testing.assert_allclose(out1[0][0], out1[0][1])


def test_fixed_item_rep(key):
    spec = jax.random.normal(key, (9, 2))
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy",
                   mean_mode="alg", degrees=2, rep_copies=2,
                   fixed_item_rep=spec)
    x = jax.random.normal(key, (3, 9, 2))
    variables, _ = _init_and_run(model, x)
    # no item_rep parameter when fixed
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("item_rep" in n for n in names)


def test_wigner_transpose_flag(key):
    x = jax.random.normal(key, (3, 9, 2))
    outs = []
    for t in (False, True):
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       encode_mode="toy", deconv_mode="toy",
                       mean_mode="alg", degrees=2, rep_copies=2,
                       wigner_transpose=t)
        _, (recon, _) = _init_and_run(model, x)
        outs.append(np.asarray(recon))
    # transposed representation produces a different (finite) reconstruction
    assert np.isfinite(outs[0]).all() and np.isfinite(outs[1]).all()
    assert not np.allclose(outs[0], outs[1])


def test_action_decoder_with_mlp(key):
    from lie_vae_tpu.models import ActionDecoder

    dec = ActionDecoder(degrees=2, deconv=None, rep_copies=2, with_mlp=True)
    angles = jax.random.normal(key, (4, 3))
    variables = dec.init(jax.random.PRNGKey(0), angles)
    out = dec.apply(variables, angles)
    assert out.shape == (4, 9, 2)
    # the intermediate MLP adds parameters
    names = [
        "/".join(str(p) for p in path)
        for path, _ in jax.tree_util.tree_leaves_with_path(
            variables["params"])]
    assert any("MLP" in n for n in names)


def test_grad_flows_through_elbo(key):
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy",
                   mean_mode="s2s2", degrees=2, rep_copies=2)
    x = jax.random.normal(key, (4, 9, 2))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)

    def loss_fn(params):
        (recon, kl_sum, _, _), _ = model.apply(
            {"params": params}, x, n=1, method="elbo",
            rngs={"sample": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
        return jnp.mean(recon + kl_sum)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the decoder item_rep and encoder weights get signal
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_normal_action_requires_3_dims():
    with pytest.raises(ValueError):
        model = LieVAE(latent_mode="normal", decoder_mode="action",
                       normal_dims=5, encode_mode="toy", deconv_mode="toy")
        model.init({"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(1)},
                   jnp.zeros((2, 49, 10)))


def test_conv_encoder_batchnorm_updates(key):
    model = LieVAE(latent_mode="so3", decoder_mode="mlp", mean_mode="alg",
                   encode_mode="conv", deconv_mode="deconv",
                   degrees=2, rep_copies=2, deconv_hidden=4, batch_norm=True)
    x = jax.random.normal(key, (2, 64, 64, 1))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)
    assert "batch_stats" in variables
    _, mutated = model.apply(variables, x, train=True,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
    # running stats moved
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    # eval mode needs no mutability
    model.apply(variables, x, train=False,
                rngs={"sample": jax.random.PRNGKey(2)})


def test_jit_full_forward(key):
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy",
                   mean_mode="s2s2", degrees=6, rep_copies=10)
    x = jax.random.normal(key, (8, 49, 10))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)

    @jax.jit
    def run(variables, x, rng):
        (recon, kl, _, _), _ = model.apply(
            variables, x, method="elbo", rngs={"sample": rng},
            mutable=["batch_stats"])
        return jnp.mean(recon), jnp.mean(kl)

    r, k = run(variables, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(r)) and np.isfinite(float(k))


def test_conv_hidden_capacity_knob():
    """conv_hidden widens the encoder stack (TPU extension; default 50 is
    the reference's hardcoded width, nets.py:8)."""
    import jax
    m = LieVAE(latent_mode="so3", decoder_mode="action", mean_mode="s2s2",
               encode_mode="conv", deconv_mode="deconv", degrees=2,
               rep_copies=2, rgb=True, conv_hidden=64)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1)}, x, n=1, train=False)
    k = v["params"]["encoder"]["Conv_0"]["kernel"]
    assert k.shape[-1] == 64          # first conv outputs conv_hidden
    k3 = v["params"]["encoder"]["Conv_3"]["kernel"]
    assert k3.shape[-1] == 8 * 64     # 8h at the fourth layer


def test_density_k_plumbs_to_stats(key):
    """The density_k diagnostic knob reaches the SO3 stats struct (shell
    count used by log_posterior); default matches the reference's k=10."""
    base = LieVAE(latent_mode="so3", decoder_mode="action",
                  encode_mode="toy", deconv_mode="toy",
                  mean_mode="s2s2", degrees=3, rep_copies=4)
    x = jax.random.normal(key, (2, 16, 4))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = base.init(rngs, x)

    def stats_for(model):
        out, _ = model.apply(variables, x, n=1, method="encode",
                             rngs={"sample": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return out[0]

    assert stats_for(base).k == 10
    assert stats_for(base.clone(density_k=30)).k == 30


def test_sigma_clamp_bounds_posterior_sigma():
    """Opt-in sigma_clamp keeps the SO(3) posterior's learned sigma inside
    the wrapped density's validity regime (prevents the runaway-sigma
    divergence observed at scaled capacity — BENCHMARKS beta-seed study)."""
    import jax
    import jax.numpy as jnp
    from lie_vae_tpu.models import LieVAE

    def max_sigma(clamp):
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       mean_mode="s2s2", encode_mode="toy",
                       deconv_mode="toy", degrees=2, rep_copies=2,
                       sigma_clamp=clamp)
        x = 100.0 * jax.random.normal(jax.random.PRNGKey(0), (4, 9, 2))
        variables = model.init({"params": jax.random.PRNGKey(1),
                                "sample": jax.random.PRNGKey(2)},
                               x, n=1, train=True)
        stats = model.apply(variables, x, n=1, train=False,
                            method="encode",
                            rngs={"sample": jax.random.PRNGKey(3)})
        return float(jnp.max(stats[0].inner.sigma))

    unclamped = max_sigma(None)
    clamped = max_sigma(0.5 * unclamped)
    assert clamped <= 0.5 * unclamped + 1e-6
    assert unclamped > clamped


def test_sigma_clamp_cli_value():
    from lie_vae_tpu.cli.main import parse_args, sigma_clamp_value

    args = parse_args(["--dataset", "toy"])
    assert sigma_clamp_value(args) is None
    args = parse_args(["--dataset", "toy", "--sigma_clamp", "2.5"])
    assert sigma_clamp_value(args) == 2.5
    args = parse_args(["--dataset", "toy", "--sigma_clamp", "auto",
                       "--density_k", "10"])
    import math
    assert abs(sigma_clamp_value(args) - math.pi * 5) < 1e-9


def test_per_stack_dtype_overrides():
    """Mixed-precision knobs: encoder_dtype/decoder_dtype/deconv_head_dtype
    override compute_dtype per stack (attribution of the bf16 convergence
    penalty; BENCHMARKS converged-compare table).

    Overriding every stack to float32 must reproduce the full-f32 model
    to f32 roundoff (the explicit no-op converts shift XLA fusion
    boundaries, so bitwise equality is not guaranteed); overriding only
    the decoder must reproduce f32 pixels from bf16-encoder latents
    (same params, deterministic mode)."""
    kw = dict(latent_mode="so3", decoder_mode="action", mean_mode="s2s2",
              encode_mode="conv", deconv_mode="deconv", rgb=True,
              degrees=2, deconv_hidden=8, rep_copies=2, deterministic=True)
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)

    f32 = LieVAE(compute_dtype=None, **kw)
    variables, (out_f32, _) = _init_and_run(f32, x)

    def run(model):
        out, _ = model.apply(variables, x, n=1, train=True,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return out[0]

    # all-stack override == full f32 up to roundoff
    all_f32 = LieVAE(compute_dtype="bfloat16", encoder_dtype="float32",
                     decoder_dtype="float32", **kw)
    err_all = float(jnp.abs(run(all_f32) - out_f32).max())
    assert err_all < 1e-5, err_all

    # bf16 everywhere differs from f32 far beyond f32 roundoff (sanity
    # that the knob does cast)
    bf16 = LieVAE(compute_dtype="bfloat16", **kw)
    err_bf16_sanity = float(jnp.abs(run(bf16) - out_f32).max())
    assert err_bf16_sanity > 100 * max(err_all, 1e-7)

    # decoder-only f32: pixels closer to f32 than the all-bf16 model
    decf32 = LieVAE(compute_dtype="bfloat16", decoder_dtype="float32", **kw)
    err_dec = float(jnp.abs(run(decf32) - out_f32).max())
    err_bf16 = float(jnp.abs(run(bf16) - out_f32).max())
    assert err_dec <= err_bf16

    # head-only override builds and runs
    headf32 = LieVAE(compute_dtype="bfloat16", deconv_head_dtype="float32",
                     **kw)
    assert np.isfinite(np.asarray(run(headf32))).all()
