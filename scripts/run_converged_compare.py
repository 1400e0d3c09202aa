"""CONVERGED reference-vs-framework comparison (VERDICT r2 next-step #3).

BASELINE.md demands "ELBO + recon MSE parity vs the PyTorch reference";
until r3 the only measured comparison was a 600-step smoke run. This
driver runs the FRAMEWORK side of the converged protocol — the exact
experiment `scripts/bench_reference_torch.py --configs 4 --converged`
runs on the actual reference implementation:

- config 4 (SO(3) latent, s2s2 mean, action decoder, conv+BN, batch 64,
  Adam 1e-3, grad clip 1e-5, beta 1) on data/spherecube (2048 ray-cast
  renders) with the SAME seeded split (pinned interchangeable by
  tests/test_data.py);
- the reference's epoch loop to early stop (eval once per epoch, best
  state kept, stop after --early_stop stale epochs, main.py:117-131);
- final n=500 importance-weighted LL on the first --ll_items valid items
  in split order (main.py:134-143; restricted item count because the
  torch side runs on a single CPU core), for BOTH the final model and
  the best checkpoint.

Writes one JSON line, and (with --torch_json) merges the two sides into
a BENCHMARKS.md table between `converged-compare` markers.

Run (TPU): python scripts/run_converged_compare.py \
    [--torch_json /tmp/ref_converged.jsonl]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BEGIN = "<!-- converged-compare:begin -->"
END = "<!-- converged-compare:end -->"


def run_framework(args):
    import jax

    from lie_vae_tpu.data import SphereCubeDataset, random_split
    from lie_vae_tpu.data.splits import Subset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import (ConstantSchedule, LinearSchedule,
                                   UnsupervisedExperiment)

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
    # plateau-escape reliability lever (VERDICT r4 next-step 1c): a short
    # linear beta warm-up (0 -> 1 over --beta_warmup steps) lets the
    # encoder learn pose before full KL pressure can collapse the
    # posterior onto the clamp bound; constant beta=1 elsewhere keeps the
    # reference protocol (main.py:103, beta_schedule None -> constant)
    beta_schedule = (LinearSchedule(0.0, 1.0, 0, args.beta_warmup)
                     if args.beta_warmup else ConstantSchedule(1.0))
    exp = UnsupervisedExperiment(
        model=model, train_dataset=train, test_dataset=valid,
        beta_schedule=beta_schedule, batch_size=64,
        report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
        elbo_samples=args.elbo_samples,
        steps_per_call=args.steps_per_call, device_data=True,
        seed=args.seed)

    steps_per_epoch = len(exp.train_loader)
    best = {"recon": float("inf"), "epoch": -1, "state": None}
    curve, stale = [], 0
    import time
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        exp.train(epoch)            # also evals at the epoch-end report
        vals = exp.test()
        v = float(vals[0])
        curve.append({"epoch": epoch, "step": (epoch + 1) * steps_per_epoch,
                      "valid_recon": round(v, 2),
                      "valid_kl": round(float(vals[1]), 2)})
        if v < best["recon"]:
            best.update(recon=v, epoch=epoch, state=jax.tree_util.tree_map(
                np.asarray, {"params": exp.state.params,
                             "batch_stats": exp.state.batch_stats}))
            stale = 0
        else:
            stale += 1
        if (epoch + 1) % 10 == 0 or stale > args.early_stop:
            print(json.dumps({**curve[-1], "stale": stale,
                              "wall_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        if stale > args.early_stop:
            break
    wall = time.perf_counter() - t0

    # persist the best checkpoint for post-hoc diagnostics (outputs/ is
    # gitignored; the LL-gap study needs to re-evaluate these states)
    import pickle
    os.makedirs("outputs/converged_ckpts", exist_ok=True)
    slug = "".join(c if c.isalnum() else "_" for c in (
        args.compute_dtype + "_" + "_".join(
            f"{k}{v}" for k, v in (
                ("enc", args.encoder_dtype), ("dec", args.decoder_dtype),
                ("head", args.deconv_head_dtype)) if v != "unset")
        + (f"_clamp{args.sigma_clamp}" if args.sigma_clamp else "")
        + (f"_warm{args.beta_warmup}" if args.beta_warmup else "")
        + (f"_es{args.elbo_samples}" if args.elbo_samples != 1 else "")
        + f"_s{args.seed}"))
    ckpt_path = f"outputs/converged_ckpts/{slug}.pkl"
    with open(ckpt_path, "wb") as f:
        pickle.dump({"best": best["state"],
                     "final": jax.tree_util.tree_map(
                         np.asarray, {"params": exp.state.params,
                                      "batch_stats": exp.state.batch_stats}),
                     "meta": {"best_epoch": best["epoch"],
                              "best_recon": best["recon"]}}, f)
    print(f"saved best/final states to {ckpt_path}", flush=True)

    ll_subset = Subset(valid, np.arange(args.ll_items))
    ll_kw = dict(n=args.ll_samples, max_items=args.ll_items,
                 batch_size=args.ll_batch, n_chunk=args.ll_chunk)
    ll_final = exp.log_likelihood(ll_subset, **ll_kw)
    exp.state = exp.state.replace(
        params=jax.tree_util.tree_map(
            lambda t, s: s.astype(t.dtype), exp.state.params,
            best["state"]["params"]),
        batch_stats=jax.tree_util.tree_map(
            lambda t, s: s.astype(t.dtype), exp.state.batch_stats,
            best["state"]["batch_stats"]))
    ll_best, ll_best_items = exp.log_likelihood(ll_subset, return_items=True,
                                                **ll_kw)

    # diagnostics on the best checkpoint: posterior sigma stats and a
    # deeper-shell (density_k=30) IW-LL — a k=10-vs-k=30 LL gap means the
    # wrapped posterior density is truncating (large sigma), which
    # INFLATES the k=10 LL (log q underestimated); comparing LLs across
    # precision modes is only honest at matching, non-truncating k
    import jax.numpy as jnp
    xs = valid.gather(np.arange(min(256, len(valid))))
    xb = jnp.asarray(valid.prep_batch(xs)[-1], jnp.float32)
    if float(xb.max()) > 1.5:
        xb = xb / 255.0
    stats = model.apply(
        {"params": exp.state.params, "batch_stats": exp.state.batch_stats},
        xb, n=1, train=False, method=model.encode,
        rngs={"sample": jax.random.PRNGKey(0)})
    sig = stats[0].inner.sigma
    sigma = {"mean": round(float(sig.mean()), 4),
             "median": round(float(jnp.median(sig)), 4),
             "max": round(float(sig.max()), 4)}
    # the log-space quantiles reveal bimodality (tiny identifiable-axis
    # components + huge symmetry-axis components average to a bland
    # median) — the shape that sets the log q scale inside the IW-LL
    qs = [5, 25, 50, 75, 95]
    sigma["log10_quantiles"] = {
        f"p{q:02d}": round(float(v), 3)
        for q, v in zip(qs, np.percentile(
            np.log10(np.asarray(sig, np.float64) + 1e-30), qs))}
    # importance-weight decomposition on the best checkpoint: where do the
    # LL nats live? E[recon], E[log q], E[log p] over the sample dim tell
    # whether an LL gap is reconstruction or posterior-density (log q)
    def _decomp(mdl, x, n):
        x_recon, st = mdl(x, n=n, train=False)
        return (mdl.recon_loss(x_recon, x).mean(),
                sum(s.log_posterior() for s in st).mean(),
                sum(s.log_prior() for s in st).mean())
    dr, dq, dp = jax.jit(
        lambda p, b, x: model.apply(
            {"params": p, "batch_stats": b}, x, 100, method=_decomp,
            rngs={"sample": jax.random.PRNGKey(1)}),
        static_argnums=())(exp.state.params, exp.state.batch_stats,
                           xb[:args.ll_items])
    decomp = {"E_recon": round(float(dr), 2),
              "E_log_q": round(float(dq), 2),
              "E_log_p": round(float(dp), 2)}
    exp.model = model.clone(density_k=30)
    exp._ll_jit_cache = {}
    ll_best_k30 = exp.log_likelihood(ll_subset, **ll_kw)
    precision = args.compute_dtype or "float32"
    overrides = [f"{k}={v}" for k, v in
                 (("enc", args.encoder_dtype), ("dec", args.decoder_dtype),
                  ("head", args.deconv_head_dtype)) if v != "unset"]
    if args.sigma_clamp:
        overrides.append(f"sigma_clamp={args.sigma_clamp}")
    if args.beta_warmup:
        overrides.append(f"beta_warmup={args.beta_warmup}")
    if args.elbo_samples != 1:
        overrides.append(f"elbo_samples={args.elbo_samples}")
    if args.seed:
        overrides.append(f"seed={args.seed}")
    if overrides:
        precision += " (" + ", ".join(overrides) + ")"
    return {"config": "4-spherecube-so3-action (lie_vae_tpu, converged)",
            "compute_dtype": args.compute_dtype,
            "precision": precision,
            "steps": (len(curve)) * steps_per_epoch, "epochs": len(curve),
            "steps_per_epoch": steps_per_epoch,
            "best_valid_recon": round(best["recon"], 2),
            "best_epoch": best["epoch"],
            "final_valid_recon": curve[-1]["valid_recon"],
            "iw_ll_final": round(float(ll_final), 2),
            "iw_ll_best_ckpt": round(float(ll_best), 2),
            "iw_ll_best_ckpt_k30": round(float(ll_best_k30), 2),
            "iw_ll_best_ckpt_items": {
                "min": round(float(ll_best_items.min()), 2),
                "p10": round(float(np.percentile(ll_best_items, 10)), 2),
                "median": round(float(np.median(ll_best_items)), 2),
                "p90": round(float(np.percentile(ll_best_items, 90)), 2),
                "max": round(float(ll_best_items.max()), 2)},
            "sigma_best_ckpt": sigma,
            "iw_decomp_best_ckpt": decomp,
            "ckpt_path": ckpt_path,
            # this run's LLs were computed with the fixed (host-looped
            # chunk) estimator — see the r4 LL-miscompile fix in
            # train/loop.py; rows without this marker (and without
            # ll_reevaluated) predate the fix and their LLs read low
            "ll_fixed": True,
            "epoch_cap": args.epochs, "early_stop": args.early_stop,
            "ll_items": args.ll_items, "ll_samples": args.ll_samples,
            "train_wall_s": round(wall, 1), "curve": curve}


def load_torch_result(path):
    """Last converged-run JSON line from bench_reference_torch --out,
    merged with the last sigma/shell diagnostics line (ref_sigma_diag.py)
    when present."""
    res, diag = None, None
    with open(path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if "sigma/shell diagnostics" in str(d.get("config", "")):
                diag = d
            elif "converged" in str(d.get("config", "")):
                res = d
    if res is not None and diag is not None:
        res.setdefault("sigma_best_ckpt", diag["sigma_best_ckpt"])
        k30 = diag.get("iw_ll_by_k", {}).get("30")
        if k30 is not None:
            res.setdefault("iw_ll_best_ckpt_k30", k30)
    return res


def write_table(ours, torch_res, args, extra_rows=()):
    """extra_rows: additional (label, result-dict) framework rows (e.g.
    the float32 attribution run) appended after the main framework row."""
    def row(label, r):
        # LLs from runs that predate the r4 LL-estimator fix (TPU
        # miscompile, train/loop.py) read 25-80 nats LOW; dagger them.
        # torch rows run on CPU and were never affected.
        fixed = (r.get("ll_fixed") or r.get("ll_reevaluated")
                 or "torch" in str(r.get("config", "")))
        dag = "" if fixed else "†"
        # per-row budget disclosure: a row that ran a different early-stop
        # budget than the caption's protocol says so inline (ADVICE r4:
        # the caption must not assert one protocol for all rows)
        cap, es = r.get("epoch_cap"), r.get("early_stop")
        if ((cap is not None and cap != args.epochs)
                or (es is not None and es != args.early_stop)):
            label += f" — ext. budget cap {cap}/stale {es}"

        def v(x):
            return "—" if x is None else x

        def ll(x):
            return "—" if x is None else f"{x}{dag}"
        sig = r.get("sigma_best_ckpt")
        sig = (f"{sig['median']:.1f} / {sig['max']:.0f}" if sig else "—")
        return (f"| {label} | {r['epochs']} | {r['steps']} "
                f"| {r['best_valid_recon']} (ep {r['best_epoch']}) "
                f"| {v(r['final_valid_recon'])} | {ll(r['iw_ll_best_ckpt'])} "
                f"| {ll(r.get('iw_ll_best_ckpt_k30'))} "
                f"| {sig} "
                f"| {ll(r['iw_ll_final'])} "
                f"| {r['train_wall_s'] / 60:.1f} min |")

    # a reference row finalized from persisted state (run killed by a
    # session budget / host rotation) must say so: its epoch count is a
    # lower bound, and there is no final-model IW-LL. A run that merely
    # carries a resume seam but ran to genuine early stop is NOT partial —
    # it gets only the seam disclosure.
    torch_note = ""
    if torch_res is not None:
        if "finalized" in str(torch_res["config"]):
            ll = torch_res.get("iw_ll_best_ckpt")
            torch_note = (
                " NOTE: the reference row is a PARTIAL run — training was "
                f"cut at epoch {torch_res['epochs']} by the session budget "
                f"(stale {torch_res.get('stale_at_stop', '?')}/"
                f"{args.early_stop}, still improving), and its best-ckpt "
                "IW-LL was finalized from the crash-safe persisted state "
                "(`--finalize_from`); the epoch loop continues across "
                "sessions via `--resume_from converged_state/torch`. Its "
                f"IW-LL ({ll}) comes from a not-yet-converged posterior "
                "and is not directly comparable to the converged "
                "framework LLs below."
                + (f" Resume seam: {torch_res['seam']}."
                   if torch_res.get("seam") else ""))
        elif torch_res.get("seam"):
            torch_note = f" Resume seam: {torch_res['seam']}."
        # protocol guard: the caption above asserts n={args.ll_samples}
        # IW samples on the first {args.ll_items} valid items — if the
        # torch row was produced with different flags, say so explicitly
        # rather than publishing a mismatched LL under a parity caption
        t_items = torch_res.get("ll_items")
        t_samples = torch_res.get("ll_samples")
        if (t_items, t_samples) != (args.ll_items, args.ll_samples):
            torch_note += (
                f" PROTOCOL MISMATCH: the reference row's IW-LL used "
                f"n={t_samples} samples on {t_items} items (not the "
                f"n={args.ll_samples}/{args.ll_items} of the caption); "
                "its LL column is not sample-for-sample comparable.")
            print(f"WARNING: torch LL protocol mismatch: "
                  f"({t_items},{t_samples}) vs "
                  f"({args.ll_items},{args.ll_samples})", file=sys.stderr)

    lines = [
        BEGIN,
        "### Converged reference comparison (config 4, 2048 ray-cast "
        "renders)",
        "",
        f"Both sides run the reference's protocol: epoch loop to "
        f"early stop ({args.early_stop} stale epochs, cap {args.epochs} — "
        "3x the reference's own default budget, main.py:164; rows marked "
        "'ext. budget' inline ran the longer cap/stale shown there, and "
        "are only compared against rows with the same budget), "
        "best-valid-recon checkpoint kept, then the final importance-"
        f"weighted LL (n={args.ll_samples}) on the first {args.ll_items} "
        "validation items in split order — for both the final model and "
        "the best checkpoint. Same data (pose-pinned: "
        "data_poses/spherecube.npz), same seeded split, same "
        "batch 64 / Adam 1e-3 / grad-clip 1e-5 / β=1. The reference runs "
        "the actual PyTorch implementation on this host's CPU "
        "(`scripts/bench_reference_torch.py --configs 4 --converged`); "
        "the framework rows run on one TPU chip "
        "(`scripts/run_converged_compare.py`). Init distributions differ "
        "(torch vs our torch-default-matched flax inits, different RNGs) "
        "— this compares converged quality, not trajectories."
        + torch_note,
        "",
        "**Reading the table (r5).** (1) **Headline:** with the r4 "
        "estimator fix applied to EVERY row (zero † remain; all rows "
        "re-trained r5 — the seeded runs reproduce their r4 curves "
        "bit-for-bit, so only the LL columns changed), the framework "
        "beats the converged torch reference on both quality metrics "
        "at every budget measured. At the reference's own protocol "
        "(cap 300 / stale 50): f32 23.76 recon / −24.21 IW-LL and "
        "bf16+f32-head 22.41 / −24.54 vs torch's 27.83 / −29.27. "
        "Under the extended budget (cap 900 / stale 75) — granted to "
        "BOTH sides: the torch 'ext. budget' row ran seam-free to a "
        "genuine early stop — torch reaches 27.61 / −27.56, while the "
        "production recipe (bf16 + f32 head + `--sigma_clamp auto`) "
        "lands between 15.46 and 29.38 recon / −19.23 and −28.68 LL "
        "across six seeds: five of six beat the extended torch LL "
        "(the worst, seed 3 at −28.68, sits 1.1 nats below torch's "
        "extended −27.56 though still above its protocol-budget "
        "−29.27), and the seeds that escape the plateau beat it by "
        "6-8 nats at ~10-12 recon points better. (2) **The binding "
        "constraint is a ~28-31-recon plateau** all runs enter first; "
        "escape to the concentrated-posterior optimum is "
        "seed-stochastic under constant β=1 (3/6 base seeds) and "
        "RELIABLE with a 2000-step β warm-up (6/6 arms, best recon "
        "13.99-15.68; per-seed forensics and the lever study in the "
        "escape-study block below). Non-escaped "
        "clamp seeds pin σ at the 15.708 bound — r4's reading that "
        "this mode scores LL ≈ −100 was itself a pre-fix estimator "
        "artifact: honestly evaluated, clamp-pinned seeds land at "
        "−23..−29, the torch reference's own band (torch σ is "
        "similarly broad, med 2.2 / max 155). (3) **Estimator audit:** "
        "IW-LLs published before the r4 fix were computed by a "
        "TPU-miscompiled program (in-jit scan-over-chunks; "
        "train/loop.py, scripts/debug_ll_gap.py) and read 25-80 nats "
        "low; per-item quantiles and the E[recon]/E[log q] "
        "decomposition for each row are in its run JSON under "
        "converged_state/.",
        "",
        "| implementation | epochs | steps | best valid recon | final "
        "valid recon | IW-LL (best ckpt) | IW-LL (k=30) | σ med/max "
        "| IW-LL (final) | train wall |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    if torch_res is not None:
        lines.append(row("PyTorch reference (CPU, fp32)", torch_res))
    known = {"bfloat16": "lie_vae_tpu (1 TPU chip, bf16 compute)",
             "float32": "lie_vae_tpu (1 TPU chip, float32 compute)"}
    ours_p = ours.get("precision") or ours.get("compute_dtype") or "bf16"
    lines.append(row(known.get(ours_p, f"lie_vae_tpu (1 TPU chip, "
                                       f"{ours_p})"), ours))
    for label, r in extra_rows:
        lines.append(row(label, r))
    lines.append(END)
    block = "\n".join(lines)

    doc = open(args.out).read() if os.path.exists(args.out) else ""
    if BEGIN in doc and END in doc:
        pre, rest = doc.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(args.out, "w") as f:
        f.write(doc)
    print(f"updated {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", default="data/spherecube")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--early_stop", type=int, default=50)
    p.add_argument("--ll_items", type=int, default=50)
    p.add_argument("--ll_samples", type=int, default=500)
    p.add_argument("--ll_batch", type=int, default=25)
    p.add_argument("--ll_chunk", type=int, default=50)
    p.add_argument("--steps_per_call", type=int, default=19)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--encoder_dtype", default="unset",
                   help="per-stack override (attribution/mixed recipes)")
    p.add_argument("--decoder_dtype", default="unset")
    p.add_argument("--deconv_head_dtype", default="unset")
    p.add_argument("--seed", type=int, default=0,
                   help="experiment RNG seed (plateau-escape replication)")
    p.add_argument("--beta_warmup", type=int, default=0,
                   help="linear beta 0->1 over this many steps (plateau-"
                        "escape reliability lever; 0 = reference constant "
                        "beta=1)")
    p.add_argument("--elbo_samples", type=int, default=1,
                   help="MC samples per ELBO term (reference default 1)")
    p.add_argument("--sigma_clamp", default=None,
                   help="'auto' clamps the posterior sigma at the wrapped "
                        "density's k=10 validity bound during training "
                        "(the framework's sigma-drift mitigation)")
    p.add_argument("--torch_json", default=None,
                   help="bench_reference_torch --out file with the "
                        "converged torch-side result")
    p.add_argument("--json_out", default=None,
                   help="also write this run's result JSON here")
    p.add_argument("--skip_table", action="store_true",
                   help="emit JSON only (a later merge writes the table)")
    p.add_argument("--merge", nargs="*", default=None, metavar="JSON",
                   help="no training: merge framework result JSONs "
                        "(bf16 first, then extra rows like the float32 "
                        "attribution run) + --torch_json into the table")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    if args.merge is not None:
        rows = [json.load(open(f)) for f in args.merge]
        torch_res = (load_torch_result(args.torch_json)
                     if args.torch_json and os.path.exists(args.torch_json)
                     else None)
        labels = {"bfloat16": "lie_vae_tpu (1 TPU chip, bf16 compute)",
                  "float32": "lie_vae_tpu (1 TPU chip, float32 compute)"}

        def label(r):
            # a torch-side result may also appear among --merge files
            # (e.g. the extended-budget reference run next to the
            # protocol run supplied via --torch_json)
            if "torch" in str(r.get("config", "")):
                return "PyTorch reference (CPU, fp32)"
            p = r.get("precision")
            if p and p not in labels:
                return f"lie_vae_tpu (1 TPU chip, {p})"
            return labels.get(r.get("compute_dtype", ""),
                              r.get("compute_dtype", "extra"))

        extra = [(label(r), r) for r in rows[1:]]
        write_table(rows[0], torch_res, args, extra_rows=extra)
        return

    ours = run_framework(args)
    print(json.dumps(ours), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(ours, f)
    if args.skip_table:
        return
    torch_res = (load_torch_result(args.torch_json)
                 if args.torch_json and os.path.exists(args.torch_json)
                 else None)
    if torch_res is None and args.torch_json:
        print("NOTE: no converged torch result found yet in "
              f"{args.torch_json}; table written with the framework row "
              "only — re-run once the torch side finishes")
    write_table(ours, torch_res, args)


if __name__ == "__main__":
    main()
