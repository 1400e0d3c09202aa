"""Training harness tests: schedules (porting the reference's inline test,
experiments/utils.py:88-109), optimizer semantics, and the end-to-end toy
integration (the minimum slice of SURVEY.md section 7)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lie_vae_tpu.data import ToyDataset, random_split
from lie_vae_tpu.models import LieVAE
from lie_vae_tpu.train import (
    ConstantSchedule, LinearSchedule, UnsupervisedExperiment,
    get_beta_schedule, make_optimizer)


def test_linear_schedule_reference_values():
    # Reference: test_linear_schedule, experiments/utils.py:88-105
    s = LinearSchedule(4, 10, 1, 4)
    for x, y in [(0, 4), (1, 4), (2, 6), (3, 8), (4, 10), (5, 10)]:
        np.testing.assert_allclose(s(x), y)
    s = LinearSchedule(10, 4, 1, 4)
    for x, y in [(0, 10), (1, 10), (2, 8), (3, 6), (4, 4), (5, 4)]:
        np.testing.assert_allclose(s(x), y)


def test_beta_schedule_presets():
    # Constant fallback and a couple of presets (beta_schedule.py:4-59)
    assert get_beta_schedule(None, 0.7)(123456) == 0.7
    x = get_beta_schedule("x", None)
    np.testing.assert_allclose(x(0), 7.0)
    np.testing.assert_allclose(x(250000), 7.0)
    np.testing.assert_allclose(x(500000), 11.0)
    np.testing.assert_allclose(x(750000), 15.0)
    np.testing.assert_allclose(x(10 ** 7), 15.0)
    with pytest.raises(ValueError):
        get_beta_schedule("t", None)  # deliberately missing in the reference


def test_beta_schedule_warmup_extension():
    # Framework extension: 'warmupN' = linear ramp 0 -> beta over N steps
    # (the production-recipe lever; identical to run_converged_compare's
    # --beta_warmup N). Not a reference preset.
    w = get_beta_schedule("warmup2000", 1.0)
    np.testing.assert_allclose(w(0), 0.0)
    np.testing.assert_allclose(w(1000), 0.5)
    np.testing.assert_allclose(w(2000), 1.0)
    np.testing.assert_allclose(w(10 ** 6), 1.0)
    # ramps to the requested beta, not hard-coded 1
    np.testing.assert_allclose(get_beta_schedule("warmup100", 0.5)(50), 0.25)
    with pytest.raises(ValueError):
        get_beta_schedule("warmup0", 1.0)
    with pytest.raises(ValueError):
        get_beta_schedule("warmupx", 1.0)


def test_clip_then_adam_ordering():
    """Gradient must be clipped to the global-norm bound before Adam."""
    params = {"w": jnp.asarray([10.0, 10.0])}
    tx = make_optimizer(lr=1e-3, clip_grads=1e-5)
    opt_state = tx.init(params)
    grads = {"w": jnp.asarray([1000.0, 0.0])}
    updates, _ = tx.update(grads, opt_state, params)
    # after clipping, the gradient norm is 1e-5; Adam's first step is
    # lr * g / (sqrt(g^2) + eps) ~ lr in the nonzero coordinate
    assert abs(float(updates["w"][0])) <= 1.1e-3
    assert float(updates["w"][1]) == 0.0


def test_selective_clip_masks_decoder():
    """The masked clip must rescale only encoder + rep_group gradients
    (reference: unsupervised.py:111-116). (Tested on the clip transform
    itself — Adam is scale-invariant, so post-Adam magnitudes can't
    distinguish the mask.)"""
    from lie_vae_tpu.train.state import _selective_mask

    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy", mean_mode="alg",
                   degrees=2, rep_copies=2)
    x = jnp.zeros((2, 9, 2))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x)
    params = variables["params"]
    mask = _selective_mask(params)
    assert all(jax.tree_util.tree_leaves(mask["encoder"]))
    assert all(jax.tree_util.tree_leaves(mask["rep_group"]))
    assert not any(jax.tree_util.tree_leaves(mask["decoder"]))

    clip = optax.masked(optax.clip_by_global_norm(1e-5), mask)
    opt_state = clip.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    clipped, _ = clip.update(grads, opt_state, params)
    # decoder untouched, encoder/rep_group scaled to the tiny global norm
    assert all(np.allclose(g, 1.0)
               for g in jax.tree_util.tree_leaves(clipped["decoder"]))
    enc_leaves = jax.tree_util.tree_leaves(clipped["encoder"])
    assert max(float(jnp.abs(g).max()) for g in enc_leaves) < 1e-5


def _toy_experiment(deterministic=True, beta=0.0, n=256, fixed=False, **kw):
    ds = ToyDataset.generate(n=n, degrees=3, rep_copies=4)
    nv = n // 8
    valid, test, train = random_split(ds, [nv, nv, n - 2 * nv])
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy", mean_mode="s2s2",
                   degrees=3, rep_copies=4, deterministic=deterministic,
                   fixed_item_rep=ds.harmonics if fixed else None)
    return UnsupervisedExperiment(
        model=model, train_dataset=train, test_dataset=valid,
        beta_schedule=ConstantSchedule(beta), batch_size=32,
        report_freq=10 ** 9, lr=1e-3, clip_grads=None, **kw)


def test_toy_ae_trains():
    """Integration: the toy SO(3) auto-encoder (BASELINE.json config 1,
    ground-truth spectrum) must make substantial progress within ~2k steps.

    Note: from-scratch pose recovery has a well-known non-convex landscape
    (the paper's subject — encoder local minima); full convergence takes far
    longer than a unit test, so the bar is a robust 25% reduction. The
    exactness of the pipeline itself is pinned by
    test_decode_exact_at_ground_truth below.
    """
    exp = _toy_experiment(deterministic=True, beta=0.0, n=1024, fixed=True)
    first = exp.test()[0]
    for epoch in range(100):
        exp.train(epoch)
    last = exp.test()[0]
    assert last < 0.75 * first, (first, last)


def test_decode_exact_at_ground_truth():
    """The recon loss at the ground-truth poses is ~0: the decode path
    (matrix -> quaternion -> ZYZ Euler -> block Wigner) exactly inverts the
    toy generator (quaternion -> Euler -> block Wigner). This is the
    self-consistency fixture of SURVEY.md section 4."""
    from lie_vae_tpu import ops

    ds = ToyDataset.generate(n=64, degrees=3, rep_copies=4)
    g = ops.quaternions_to_group_matrix(jnp.asarray(ds.quaternions))
    angles = ops.group_matrix_to_eazyz(g)
    x_rec = ops.block_wigner_matrix_multiply(
        angles, jnp.asarray(ds.harmonics), 3)
    err = float(jnp.max(jnp.sum((x_rec - jnp.asarray(ds.x)) ** 2,
                                axis=(-2, -1))))
    assert err < 1e-8, err


def test_vae_kl_term_active():
    exp = _toy_experiment(deterministic=False, beta=1.0)
    exp.train(0)
    vals = exp.test()
    assert np.isfinite(vals).all()
    assert vals[1] != 0.0  # KL is being estimated


def test_control_mode_runs():
    exp = _toy_experiment(deterministic=False, beta=2.0, control=10.0,
                          control_p=2)
    exp.train(0)
    assert np.isfinite(exp.test()).all()


def test_log_likelihood_runs():
    exp = _toy_experiment(deterministic=False, beta=1.0)
    exp.train(0)
    ll = exp.log_likelihood(exp.test_dataset, n=20, max_items=3)
    assert np.isfinite(ll)


def test_steps_per_call_scan_matches_single(tmp_path):
    """K-step scan training must produce the same parameters as K single
    steps (same batches, same per-step rngs/schedules)."""
    ds = ToyDataset.generate(n=128, degrees=2, rep_copies=3)

    def build(k):
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       encode_mode="toy", deconv_mode="toy",
                       mean_mode="s2s2", degrees=2, rep_copies=3)
        return UnsupervisedExperiment(
            model=model, train_dataset=ds, test_dataset=ds,
            beta_schedule=ConstantSchedule(1.0), batch_size=32,
            report_freq=10 ** 9, lr=1e-3, clip_grads=None, seed=0,
            steps_per_call=k)

    e1, e4 = build(1), build(4)
    e1.train(0)
    e4.train(0)
    for a, b in zip(jax.tree_util.tree_leaves(e1.state.params),
                    jax.tree_util.tree_leaves(e4.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_steps_per_call_with_ragged_tail(tmp_path):
    """Batch count not divisible by K: the tail group still runs and
    reporting still fires."""
    exp = _toy_experiment(deterministic=True, beta=0.0, n=256,
                          steps_per_call=4)
    # 192 train examples / 32 batch = 6 batches -> groups of 4 and 2
    exp.report_freq = 5
    exp.train(0)
    assert np.isfinite(exp.test()).all()


def test_device_data_matches_streaming():
    """On-device dataset caching must produce the same parameter trajectory
    as the host streaming path (same loader permutation, same rngs)."""
    ds = ToyDataset.generate(n=128, degrees=2, rep_copies=3)

    def build(device_data):
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       encode_mode="toy", deconv_mode="toy",
                       mean_mode="s2s2", degrees=2, rep_copies=3)
        return UnsupervisedExperiment(
            model=model, train_dataset=ds, test_dataset=ds,
            beta_schedule=ConstantSchedule(1.0), batch_size=32,
            report_freq=10 ** 9, lr=1e-3, clip_grads=None, seed=0,
            steps_per_call=2, device_data=device_data)

    e_host, e_dev = build(False), build(True)
    e_host.train(0)
    e_dev.train(0)
    np.testing.assert_allclose(e_dev.test(), e_host.test(),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(e_host.state.params),
                    jax.tree_util.tree_leaves(e_dev.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    """orbax save/restore preserves params, batch_stats, opt state, step."""
    from lie_vae_tpu.train.checkpoint import restore_state, save_state

    exp = _toy_experiment(deterministic=False, beta=1.0)
    exp.train(0)
    path = str(tmp_path / "ckpt")
    save_state(path, exp.state)

    exp2 = _toy_experiment(deterministic=False, beta=1.0)
    restored = restore_state(path, exp2.state)
    assert int(restored.step) == int(exp.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(exp.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(exp.state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored state trains on
    exp2.state = restored
    exp2.train(1)
    assert np.isfinite(exp2.test()).all()


def test_best_value_tracked(tmp_path):
    exp = _toy_experiment(deterministic=True, beta=0.0,
                          log=str(tmp_path / "logs"))
    exp.report_freq = 3
    exp.train(0)
    assert exp.best_value < np.inf
    # metrics jsonl written with the reference tag names
    text = (tmp_path / "logs" / "metrics.jsonl").read_text()
    for tag in ("train_recon", "train_kl", "test_recon", "beta"):
        assert tag in text


def test_log_likelihood_batched_matches_loop(tmp_path):
    """batch_size>1 / chunked LL equals the batch-1 full-n evaluation
    up to estimator noise (same per-item estimator, different rng keys),
    and is exactly finite/shaped on a ragged dataset tail."""
    import numpy as np
    import jax
    from lie_vae_tpu.data.toy import ToyDataset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train.loop import UnsupervisedExperiment
    from lie_vae_tpu.train.schedules import ConstantSchedule

    ds = ToyDataset.generate(7, degrees=2, rep_copies=3,
                             seed=0)                     # 7 items: ragged
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="alg", encode_mode="toy", deconv_mode="toy",
                   degrees=2, rep_copies=3)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        batch_size=4, lr=1e-3, beta_schedule=ConstantSchedule(1.0),
        log=str(tmp_path))
    ll_loop = exp.log_likelihood(ds, n=24, batch_size=1)
    ll_batched = exp.log_likelihood(ds, n=24, batch_size=4, n_chunk=8)
    assert np.isfinite(ll_loop) and np.isfinite(ll_batched)
    # same estimator, different sample draws: agree to MC noise
    assert abs(ll_loop - ll_batched) < 25.0
    # max_items respected with batching
    ll_two = exp.log_likelihood(ds, n=8, batch_size=4, max_items=2)
    assert np.isfinite(ll_two)


def test_log_likelihood_respects_jensen_bound(tmp_path):
    """The IW-LL must sit ABOVE the E[w] Jensen lower bound (logsumexp
    >= mean). The r4 TPU miscompile (in-jit scan-over-chunks with
    captured weights) produced LLs 25-80 nats BELOW E[w] on converged
    checkpoints — this invariant is the platform-independent tripwire;
    run it on any new backend before trusting its LL numbers."""
    import numpy as np
    import jax
    from lie_vae_tpu.data.toy import ToyDataset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train.loop import UnsupervisedExperiment
    from lie_vae_tpu.train.schedules import ConstantSchedule

    ds = ToyDataset.generate(12, degrees=2, rep_copies=3, seed=0)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="s2s2", encode_mode="toy", deconv_mode="toy",
                   degrees=2, rep_copies=3)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        batch_size=4, lr=1e-3, beta_schedule=ConstantSchedule(1.0),
        log=str(tmp_path))
    ll, items = exp.log_likelihood(ds, n=64, batch_size=4, n_chunk=16,
                                   max_items=8, return_items=True)
    assert np.isfinite(items).all() and len(items) == 8

    # E[w] from an independent direct apply (different keys): with n=256
    # samples the MC error on the mean is well under the tolerance
    import jax.numpy as jnp
    xb = jnp.asarray(ds.gather(np.arange(8))[-1])

    def _w(mdl, x, n):
        return mdl.log_weights(x, n=n)

    w = model.apply({"params": exp.state.params}, xb, 256, method=_w,
                    rngs={"sample": jax.random.PRNGKey(7)})
    e_w = float(np.mean(np.asarray(w, np.float64)))
    assert ll > e_w - 2.0, (
        f"IW-LL {ll:.2f} fell below the Jensen lower bound E[w]={e_w:.2f}"
        " — the estimator is computing different weights than the model")
    """Same seed + data -> bitwise-identical params and metrics after an
    epoch: the jitted step's RNG folds from (seed, global step) only, and
    nothing in the loop depends on host timing."""
    from lie_vae_tpu.data import ToyDataset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import ConstantSchedule, UnsupervisedExperiment

    def run():
        ds = ToyDataset.generate(n=96, degrees=2, rep_copies=3)
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       encode_mode="toy", deconv_mode="toy",
                       mean_mode="s2s2", degrees=2, rep_copies=3)
        exp = UnsupervisedExperiment(
            model=model, train_dataset=ds, test_dataset=ds,
            beta_schedule=ConstantSchedule(1.0), batch_size=32,
            report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5, seed=0,
            steps_per_call=2)
        exp.train(0)
        return exp.state.params, np.asarray(exp.test())

    p1, t1 = run()
    p2, t2 = run()
    np.testing.assert_array_equal(t1, t2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigma_drift_monitor(capsys):
    """SO(3) runs track the window-mean per-step max sigma and warn at
    report boundaries once it exceeds the wrapped-density validity bound
    (~pi*k/2) — the truncation-bias regime measured on the 32k flagship
    (BENCHMARKS '32k renders')."""
    exp = _toy_experiment(deterministic=False, beta=1.0)
    exp.report_freq = 10
    assert "sigma_max" in exp._metric_names
    exp.train(0)
    out = capsys.readouterr().out
    assert "Epoch 0" in out
    # healthy run: sigma ~ softplus(0)-scale, far below the bound
    assert "WARNING: posterior sigma_max" not in out

    # force the truncation regime via the bound (equivalent to sigma drift)
    exp._sigma_valid_bound = 1e-9
    exp.train(1)
    out = capsys.readouterr().out
    assert "WARNING: posterior sigma_max" in out
    assert "truncation-biased" in out
