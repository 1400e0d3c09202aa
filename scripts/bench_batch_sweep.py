"""Batch-size scaling of the flagship train step on one TPU chip.

VERDICT r1 next-step #6: steps/s/chip and samples/s at batch 64 -> 1024
for the flagship spherecube SO(3)-VAE step. Identifies where the chip
saturates (the data-parallel knee: the batch at which adding chips beats
growing the per-chip batch) and grounds the v5e-8 scaling claim — DP
over the 'data' mesh axis multiplies samples/s by the chip count at the
per-chip batch's efficiency, minus an all-reduce of ~2M params/step
(~8 MB at bf16 grads, microseconds over ICI; the multi-chip program is
validated by __graft_entry__.dryrun_multichip and tests/test_parallel).

Run: python scripts/bench_batch_sweep.py [--batches 64 128 256 512 1024]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch, scan_k, n_calls):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from lie_vae_tpu.train.state import TrainState, make_optimizer

    model = _flagship_model(compute_dtype="bfloat16")
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 64, 64, 3),
                           jnp.float32)
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
            return jnp.mean(recon) + beta * jnp.mean(kl_sum), \
                mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    def multi(state, x, rng):
        def body(s, k):
            return train_step(s, x, k)
        s, ls = jax.lax.scan(body, state, jax.random.split(rng, scan_k))
        return s, ls[-1]

    step = jax.jit(multi, donate_argnums=0)
    state, loss = step(state, x, jax.random.PRNGKey(3))
    float(loss)                                    # compile + drain
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, loss = step(state, x, jax.random.fold_in(
            jax.random.PRNGKey(10), i))
    float(loss)
    dt = time.perf_counter() - t0
    sps = n_calls * scan_k / dt
    return sps, sps * batch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[64, 128, 256, 512, 1024])
    ap.add_argument("--scan_k", type=int, default=64)
    ap.add_argument("--n_calls", type=int, default=8)
    args = ap.parse_args(argv)

    rows = []
    for b in args.batches:
        sps, samples = measure(b, args.scan_k, args.n_calls)
        rows.append({"batch": b, "steps_per_sec": round(sps, 1),
                     "samples_per_sec": round(samples)})
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["samples_per_sec"]
    print("\n| batch | steps/s | samples/s | vs batch-%d |" % rows[0]["batch"])
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['steps_per_sec']} "
              f"| {r['samples_per_sec']} "
              f"| {r['samples_per_sec'] / base:.2f}x |")


if __name__ == "__main__":
    main()
