"""Benchmark: spherecube SO(3)-VAE training steps/sec on one TPU chip.

Measures the full training step (conv encoder + BatchNorm, S2S2 mean,
algebra-noise sampling, matrix->Euler->block-Wigner action decoder, deconv
head, 21-shell wrapped-density KL, grad, global-norm clip, Adam) on the
reference's canonical run shape: batch 64, 64x64 RGB, degrees 6, rep_copies
10, deconv_hidden 200 (lie_vae/experiments/main.py:30-35,166-171).

Production configuration: bfloat16 conv compute (fp32 params/Lie math) and
lax.scan of SCAN_K steps per dispatch (the framework's steps_per_call feature) —
per-call host->chip latency through this image's tunneled runtime is ~10ms,
so single-step dispatch measures the tunnel, not the chip.

Timing note: on this platform jax.block_until_ready returns before remote
execution completes, so the harness drains the queue with a scalar device->
host read of the final loss (a true data dependency on every step).

Prints ONE JSON line. vs_baseline compares against REF_STEPS_PER_SEC, an
estimate of the reference PyTorch implementation's steps/sec on its original
single-GPU setup (cuda 9.1 era hardware, README.md:18; the reference prints
seconds/iteration at unsupervised.py:151-155 but publishes no numbers, so
the baseline is an estimate of a 2018 desktop GPU on this model: ~30 it/s).
The reference MEASURED on this host's CPU (the only shared hardware) is
far slower — see scripts/bench_reference_torch.py / BENCHMARKS.md.
The north-star target (BASELINE.md) is >=5x the GPU estimate.

The training batch is REAL spherecube renders (--data_dir, default
data/spherecube — rendered on the spot if absent, ~20 s one-time), so the
step exercises true image statistics through the conv/BN stack; pass
--synthetic to use the old uniform-noise batch.
"""
import argparse
import json
import os
import sys
import time

REF_STEPS_PER_SEC = 30.0
# steps per dispatch (overridable via --scan_k). 128 beats 64 by ~2%
# (700 vs 686 steps/s: the residual dispatch share halves); its one-time
# compile is ~15 min on this tunneled compiler but the persistent XLA
# cache (enabled by the lie_vae_tpu import) makes every later run warm
# (~40 s end to end). Use --scan_k 64 to avoid the cold compile.
SCAN_K = 128
N_CALLS = 16


def _real_batch(data_dir, batch):
    """(batch, 64, 64, 3) float32 of real renders; renders a minimal set
    on first use when the directory is absent."""
    import numpy as np
    from lie_vae_tpu.data import SphereCubeDataset, count_renders

    min_images = max(batch, 256)
    if count_renders(data_dir) < min_images:
        from lie_vae_tpu.cli.gen_spherecube import generate
        print(f"rendering {min_images} spherecube images into {data_dir} "
              "(one-time)", file=sys.stderr)
        os.makedirs(data_dir, exist_ok=True)
        generate(min_images, data_dir, step_size=0.1, pairs=False)
    ds = SphereCubeDataset(data_dir)
    imgs = ds.prep_batch(ds.gather(np.arange(batch)))[-1]
    return np.asarray(imgs, np.float32) / 255.0


def _wait_for_tunnel(budget_s):
    """The tunneled TPU runtime can be down for hours at a stretch, and a
    jax device init would hang with NO timeout. Probe with short-lived
    subprocesses (the probe runs a real device op) and wait out bounded
    outages so the benchmark still lands when the tunnel flaps; give up
    loudly instead of hanging when the budget is exhausted."""
    import subprocess
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); import jax.numpy as j; "
                 "print(float(j.ones(2).sum()))"],
                timeout=90, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"tunnel probe {attempt} failed; retrying "
              f"({deadline - time.time():.0f}s of budget left)",
              file=sys.stderr)
        time.sleep(60)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/spherecube")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on uniform noise instead of renders")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan_k", type=int, default=SCAN_K,
                    help="steps per dispatch (lax.scan length)")
    ap.add_argument("--wait_tunnel", type=float, default=1800,
                    help="seconds to wait for the TPU tunnel before "
                         "giving up (0 = no probe, init directly)")
    args = ap.parse_args(argv)
    scan_k = args.scan_k

    if args.wait_tunnel and not _wait_for_tunnel(args.wait_tunnel):
        print(f"TPU tunnel unreachable after {args.wait_tunnel:.0f}s of "
              "probes — not starting the benchmark (it would hang at "
              "device init)", file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    # importing lie_vae_tpu enables the persistent XLA cache: a warm cache
    # turns this benchmark's multi-minute remote compile into a disk read
    # (timing is unaffected — only compile latency changes)
    from lie_vae_tpu.train.state import TrainState, make_optimizer

    # production recipe (BENCHMARKS converged-compare, r4): bf16 stacks
    # + float32 final image-channel deconv + the sigma clamp at the
    # wrapped density's k=10 validity bound — converges to best recon
    # 15.46 / honest IW-LL -19.2 vs the fp32 torch reference's
    # 27.83 / -29.3 on the same data+protocol, at bf16-grade throughput
    # (chip-rates precision rows; the clamp is one fused min)
    import math as _math
    model = _flagship_model(compute_dtype="bfloat16",
                            deconv_head_dtype="float32",
                            sigma_clamp=_math.pi * 10 / 2)

    batch = args.batch
    if args.synthetic:
        data_note = "synthetic uniform-noise batch"
        x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 64, 64, 3),
                               jnp.float32)
    else:
        data_note = f"real renders from {args.data_dir}"
        x = jnp.asarray(_real_batch(args.data_dir, batch))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        x, n=1, train=True)
    tx = make_optimizer(lr=1e-3, clip_grads=1e-5)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    beta = jnp.float32(1.0)

    def train_step(state, x, rng):
        def loss_fn(params):
            (recon, kl_sum, _, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, n=1, train=True, method="elbo",
                rngs={"sample": rng}, mutable=["batch_stats"])
            loss = jnp.mean(recon) + beta * jnp.mean(kl_sum)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    def multi_step(state, x, rng):
        def body(s, k):
            s2, l = train_step(s, x, k)
            return s2, l
        s, ls = jax.lax.scan(body, state, jax.random.split(rng, scan_k))
        return s, ls[-1]

    step = jax.jit(multi_step, donate_argnums=0)

    # warmup / compile; drain via scalar readback
    state, loss = step(state, x, jax.random.PRNGKey(3))
    float(loss)

    t0 = time.perf_counter()
    for i in range(N_CALLS):
        state, loss = step(state, x, jax.random.fold_in(
            jax.random.PRNGKey(10), i))
    final_loss = float(loss)          # true queue drain
    dt = time.perf_counter() - t0
    steps_per_sec = N_CALLS * scan_k / dt

    print(json.dumps({
        "metric": "spherecube_so3_vae_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 2),
        "baseline_note": ("REF_STEPS_PER_SEC=30 estimated 2018-GPU "
                          "reference throughput (measured torch-CPU "
                          "reference: see BENCHMARKS.md); batch %d, 64x64 "
                          "RGB, degrees 6, bf16 compute + f32 image "
                          "head, scan=%d; %s; "
                          "loss=%.1f"
                          % (batch, scan_k, data_note, final_loss)),
    }))


if __name__ == "__main__":
    sys.exit(main())
