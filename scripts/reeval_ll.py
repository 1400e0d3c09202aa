"""Re-evaluate a converged-compare run's IW-LL from its saved checkpoint
with the FIXED log_likelihood path (r4: the in-jit scan-over-chunks
formulation miscompiled on the axon TPU runtime and published LLs 25-80
nats too low — see the loop.py fix commit and scripts/debug_ll_gap.py).

Loads the pickled best/final states written by run_converged_compare,
recomputes the n=500 IW-LL (+ k=30 cross-check and the per-item
quantiles), and patches the run's JSON in place: the corrected numbers
replace iw_ll_* and the pre-fix values are preserved under
iw_ll_*_prefixbug for the audit trail.

Usage (TPU, after the fix is validated by debug_ll_gap):
  python scripts/reeval_ll.py --json converged_state/framework_f32_clamp.json \
      --compute_dtype float32 --sigma_clamp auto
"""
import argparse
import json
import math
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", required=True)
    p.add_argument("--ckpt", default=None,
                   help="default: the json's recorded ckpt_path")
    p.add_argument("--platform", default=None)
    p.add_argument("--data_dir", default="data/spherecube")
    p.add_argument("--ll_items", type=int, default=50)
    p.add_argument("--ll_samples", type=int, default=500)
    p.add_argument("--ll_batch", type=int, default=25)
    p.add_argument("--ll_chunk", type=int, default=50)
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

    from lie_vae_tpu.data import SphereCubeDataset, random_split
    from lie_vae_tpu.data.splits import Subset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import ConstantSchedule, UnsupervisedExperiment

    res = json.load(open(args.json))
    ckpt_path = args.ckpt or res.get("ckpt_path")
    assert ckpt_path and os.path.exists(ckpt_path), (
        f"no checkpoint for {args.json} (ckpt_path={ckpt_path!r}) — "
        "pre-ckpt-persistence runs must be re-run, not re-evaluated")
    with open(ckpt_path, "rb") as f:
        ck = pickle.load(f)

    ds = SphereCubeDataset(args.data_dir)
    nv = max(16, len(ds) // 5)
    valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])
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

    def set_state(st):
        exp.state = exp.state.replace(
            params=jax.tree_util.tree_map(
                lambda t, s: jnp.asarray(s, t.dtype), exp.state.params,
                st["params"]),
            batch_stats=jax.tree_util.tree_map(
                lambda t, s: jnp.asarray(s, t.dtype), exp.state.batch_stats,
                st["batch_stats"]))

    sub = Subset(valid, np.arange(args.ll_items))
    kw = dict(n=args.ll_samples, max_items=args.ll_items,
              batch_size=args.ll_batch, n_chunk=args.ll_chunk)

    set_state(ck["final"])
    ll_final = exp.log_likelihood(sub, **kw)

    set_state(ck["best"])
    ll_best, items = exp.log_likelihood(sub, return_items=True, **kw)
    exp.model = model.clone(density_k=30)
    exp._ll_jit_cache = {}
    ll_best_k30 = exp.log_likelihood(sub, **kw)

    for key, new in (("iw_ll_final", round(float(ll_final), 2)),
                     ("iw_ll_best_ckpt", round(float(ll_best), 2)),
                     ("iw_ll_best_ckpt_k30", round(float(ll_best_k30), 2)),
                     ("iw_ll_best_ckpt_items", {
                         "min": round(float(items.min()), 2),
                         "p10": round(float(np.percentile(items, 10)), 2),
                         "median": round(float(np.median(items)), 2),
                         "p90": round(float(np.percentile(items, 90)), 2),
                         "max": round(float(items.max()), 2)})):
        if key in res:
            res[key + "_prefixbug"] = res[key]
        res[key] = new
    res["ll_reevaluated"] = "r4 LL fix (host-looped chunks)"
    with open(args.json + ".tmp", "w") as f:
        json.dump(res, f)
    os.replace(args.json + ".tmp", args.json)
    print(json.dumps({k: res[k] for k in
                      ("precision", "best_valid_recon", "iw_ll_best_ckpt",
                       "iw_ll_best_ckpt_prefixbug", "iw_ll_best_ckpt_k30",
                       "iw_ll_final", "iw_ll_best_ckpt_items")
                      if k in res}))


if __name__ == "__main__":
    main()
