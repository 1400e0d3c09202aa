"""LL-gap forensics: re-evaluate a saved converged checkpoint's IW-LL
three ways and dump the per-term structure of the importance weights.

Motivation (r4): the converged clamp run measured best recon 15.46 with
IW-LL -106.3, yet its own importance-weight decomposition gives
E[w] = -E[recon] - log 8pi^2 - E[log q] = -23.9 — and Jensen forbids
LL < E[w] if both evaluate the same weights. One of the two computations
is wrong (platform miscompile, state mismatch, or estimator bug). This
script loads the pickled best state (written by run_converged_compare)
and computes, on the SAME process/platform:

  A. the production path: UnsupervisedExperiment.log_likelihood
     (jitted scan-chunked logsumexp) per item;
  B. a direct model.apply(method="log_weights") in float64 host
     logsumexp, per item;
  C. the per-term stats of w from B: recon(z), log q, log p quantiles
     per item (sample-level), exposing which term moves.

Run on TPU (default) and on CPU (--platform cpu, separate process) to
cross-check the axon compile path.

Usage:
  python scripts/debug_ll_gap.py --ckpt outputs/converged_ckpts/<slug>.pkl \
      [--platform cpu] [--n 500] [--items 10] [--sigma_clamp auto] \
      [--compute_dtype bfloat16 --deconv_head_dtype float32]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--state", choices=["best", "final"], default="best")
    p.add_argument("--platform", default=None)
    p.add_argument("--data_dir", default="data/spherecube")
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--items", type=int, default=10)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--encoder_dtype", default="unset")
    p.add_argument("--decoder_dtype", default="unset")
    p.add_argument("--deconv_head_dtype", default="unset")
    p.add_argument("--sigma_clamp", default=None)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from lie_vae_tpu.data import SphereCubeDataset, random_split
    from lie_vae_tpu.data.splits import Subset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import ConstantSchedule, UnsupervisedExperiment

    ds = SphereCubeDataset(args.data_dir)
    nv = max(16, len(ds) // 5)
    valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])

    import math
    sigma_clamp = (math.pi * 10 / 2 if args.sigma_clamp == "auto"
                   else float(args.sigma_clamp) if args.sigma_clamp
                   else None)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="s2s2", encode_mode="conv",
                   deconv_mode="deconv", rgb=True, degrees=6,
                   rep_copies=10, deconv_hidden=200, batch_norm=True,
                   compute_dtype=args.compute_dtype,
                   encoder_dtype=args.encoder_dtype,
                   decoder_dtype=args.decoder_dtype,
                   deconv_head_dtype=args.deconv_head_dtype,
                   sigma_clamp=sigma_clamp)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=train, test_dataset=valid,
        beta_schedule=ConstantSchedule(1.0), batch_size=64,
        report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
        steps_per_call=19, device_data=False, seed=0)

    with open(args.ckpt, "rb") as f:
        ck = pickle.load(f)
    st = ck[args.state]
    print(f"ckpt meta: {ck.get('meta')}")
    exp.state = exp.state.replace(
        params=jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s, t.dtype), exp.state.params,
            st["params"]),
        batch_stats=jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s, t.dtype), exp.state.batch_stats,
            st["batch_stats"]))

    # A. production path
    sub = Subset(valid, np.arange(args.items))
    ll_a, items_a = exp.log_likelihood(sub, n=args.n, max_items=args.items,
                                       batch_size=min(25, args.items),
                                       n_chunk=50, return_items=True)
    print(f"A production exp.log_likelihood: mean {ll_a:.2f}")
    print(f"A per-item: {np.round(np.sort(items_a), 2)}")

    # B/C. direct apply, float64 host logsumexp, per-term stats
    xs = valid.gather(np.arange(args.items))
    xb = jnp.asarray(valid.prep_batch(xs)[-1], jnp.float32)
    if float(xb.max()) > 1.5:
        xb = xb / 255.0

    def _terms(mdl, x, n):
        x_recon, st = mdl(x, n=n, train=False)
        recon = mdl.recon_loss(x_recon, x)                  # (n, B)
        log_q = sum(s.log_posterior() for s in st)          # (n, B)
        log_p = sum(s.log_prior() for s in st)              # (n, B)
        return recon, log_q, log_p

    terms_jit = jax.jit(
        lambda p_, b_, x_, k_: model.apply(
            {"params": p_, "batch_stats": b_}, x_, 50, method=_terms,
            rngs={"sample": k_}))
    chunks = []
    for i in range(max(1, args.n // 50)):
        r, q, pz = terms_jit(exp.state.params, exp.state.batch_stats, xb,
                             jax.random.PRNGKey(100 + i))
        chunks.append((np.asarray(r, np.float64), np.asarray(q, np.float64),
                       np.asarray(pz, np.float64)))
    recon = np.concatenate([c[0] for c in chunks])   # (n, B)
    log_q = np.concatenate([c[1] for c in chunks])
    log_p = np.concatenate([c[2] for c in chunks])
    w = -recon + log_p - log_q
    mx = w.max(0)
    items_b = np.log(np.mean(np.exp(w - mx), 0)) + mx
    print(f"B direct logsumexp: mean {items_b.mean():.2f}")
    print(f"B per-item: {np.round(np.sort(items_b), 2)}")
    print(f"C term stats over samples (mean/min/max per item):")
    for j in range(min(args.items, 10)):
        print(f"  item {j}: recon {recon[:, j].mean():7.2f} "
              f"[{recon[:, j].min():7.2f},{recon[:, j].max():8.2f}]  "
              f"log_q {log_q[:, j].mean():7.2f} "
              f"[{log_q[:, j].min():7.2f},{log_q[:, j].max():8.2f}]  "
              f"w_max {w[:, j].max():8.2f}  LL_B {items_b[j]:8.2f}  ")
    print(f"C global: E_recon {recon.mean():.2f}  E_log_q {log_q.mean():.2f} "
          f" E_log_p {log_p.mean():.2f}  E_w {w.mean():.2f}")
    print(f"JENSEN check (A): mean LL_A {items_a.mean():.2f} vs "
          f"E_w {w.mean():.2f} -> "
          f"{'VIOLATED' if items_a.mean() < w.mean() - 1 else 'ok'}")


if __name__ == "__main__":
    main()
