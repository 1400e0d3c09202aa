"""A/B the equivariance-loss rotation implementation at TRAINING scale.

r3 made the Paeth three-shear MXU rotation (`rotate_images_shear`,
losses/equivariance.py) the training default behind a 15.9x speedup of
the regularized config — validated at the operator level (exact at 90°
multiples, ~0.003 mean abs vs the reference's bilinear gather elsewhere)
but not at the trained-outcome level. This driver trains the full
regularized flagship (config 5: SO(3) latent, s2s2 mean, action decoder,
equivariance 100 + encoder continuity 3000 on sc-pairs — the reference's
`reg` preset, lie_vae/experiments/config/reg.yaml; rotation semantics
under test: lie_vae/losses/equivariance_loss.py:50-57) twice on the same
host-deterministic renders and same seed — once per rotation impl — and
writes a comparison table between `shear-ab` markers in BENCHMARKS.md:
best/final recon, final IW-LL, best-checkpoint LL at k=10/30, KL, σ_max.
Equivalence within the seed-study noise bar (σ(LL) ≈ 7 nats, BENCHMARKS
seed-study block) pins the speedup as semantics-free in outcome.

Usage (real TPU):
  python scripts/run_shear_ab.py [--device_data] [--epochs 400]
      [--impls shear gather] [--seeds 0]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN, END = "<!-- shear-ab:begin -->", "<!-- shear-ab:end -->"

MODEL = ["--latent_mode", "so3", "--mean_mode", "s2s2",
         "--decoder_mode", "action", "--beta", "1"]


def ensure_pairs(data_dir, n_pairs):
    import math

    from lie_vae_tpu.cli.gen_spherecube import generate
    from lie_vae_tpu.data import count_renders
    if count_renders(data_dir) >= 2 * n_pairs:
        return
    print(f"rendering {n_pairs} pairs into {data_dir} ...")
    generate(n_pairs, data_dir, step_size=2 * math.pi / 60, pairs=True)


def run_arm(impl, seed, args):
    from lie_vae_tpu.cli import main as cli_main
    from scripts._results_table import read_ll
    from scripts.eval_checkpoint import evaluate

    # impl == "recipe": the shear rotation PLUS the production convergence
    # recipe (bf16 + f32 image head + sigma clamp + beta warm-up 2000 — the
    # lever study in BENCHMARKS escape-study) — quality push, not an A/B arm.
    rotate = "shear" if impl == "recipe" else impl
    recipe = (["--deconv_head_dtype", "float32", "--sigma_clamp", "auto",
               "--beta_schedule", "warmup2000"] if impl == "recipe" else [])
    run_name = f"shear-ab-{impl}-s{seed}"
    argv = MODEL + recipe + [
        "--config", "scpairs", "reg",
        "--data_dir", args.data_dir,
        "--equivariance_rotate", rotate,
        "--epochs", str(args.epochs),
        "--max_early_stop", str(args.max_early_stop),
        "--report_freq", str(args.report_freq),
        "--steps_per_call", str(args.steps_per_call),
        "--compute_dtype", args.compute_dtype,
        "--ll_batch", "32", "--ll_chunk", "50",
        "--seed", str(seed), "--name", run_name,
    ]
    if args.device_data:
        argv.append("--device_data")
    exp = cli_main.main(argv)

    eval_args = cli_main.parse_args(MODEL + (
        ["--deconv_head_dtype", "float32", "--sigma_clamp", "auto"]
        if impl == "recipe" else []) + [
        "--config", "scpairs",
        "--data_dir", args.data_dir,
        "--compute_dtype", args.compute_dtype,
        "--ll_batch", "32", "--ll_chunk", "50", "--name", run_name])
    best = evaluate(eval_args, density_k=args.density_k)
    last = exp.test()
    return {"best_recon": float(exp.best_value),
            "final_recon": round(float(last[0]), 2),
            "final_kl": round(float(last[1]), 3),
            "final_ll": read_ll(run_name),
            "best_ll": best["ll"],
            "sigma_max": (best["sigma"] or {}).get("max")}


def write_table(results, args):
    from scripts._results_table import merge_marker_table

    k_lo, k_hi = args.density_k[0], args.density_k[-1]

    def row(desc, r):
        final = f"{r['final_ll']:.1f}" if r["final_ll"] is not None else "—"
        lo, hi = r["best_ll"].get(k_lo), r["best_ll"].get(k_hi)
        lo = f"{lo:.2f}" if lo is not None else "—"
        hi = f"{hi:.2f}" if hi is not None else "—"
        sig = f"{r['sigma_max']:.3f}" if r["sigma_max"] is not None else "—"
        return (f"| {desc} | {r['best_recon']:.2f} | {r['final_recon']} "
                f"| {r['final_kl']} | {final} | {lo} | {hi} | {sig} |")

    labels = {"shear": "three-shear MXU rotation (training default)",
              "gather": "bilinear gather (reference semantics)",
              "recipe": ("three-shear + production recipe (f32 head, "
                         "σ clamp, β warm-up 2000)")}
    # always list the standard arms so a partial rerun (e.g. --impls
    # recipe) preserves the other rows verbatim from the existing table
    descriptions = {"gather-s0": labels["gather"],
                    "shear-s0": labels["shear"],
                    "recipe-s0": labels["recipe"]}
    rows = {}
    for (impl, seed), r in sorted(results.items()):
        key = f"{impl}-s{seed}"
        descriptions[key] = labels.get(impl, impl) + (
            f", seed {seed}" if len({s for _, s in results}) > 1 else "")
        rows[key] = r

    merge_marker_table(
        args.out, BEGIN, END,
        caption=(
            "Training-scale A/B of the equivariance rotation "
            "implementation on the full regularized config (SO(3)+action, "
            "equivariance 100 + continuity 3000, sc-pairs batch 32, "
            f"{args.data_dir} host-deterministic renders, same seed both "
            f"arms, early stop {args.max_early_stop} stale epochs, cap "
            f"{args.epochs}, compute_dtype={args.compute_dtype}). "
            "'best-ckpt LL' re-evaluates the best-validation checkpoint "
            f"at density_k={k_lo}/{k_hi}. The r3 default flip to 'shear' "
            "bought a 15.9x step speedup (BENCHMARKS regularized rows); "
            "this table checks the trained OUTCOME is equivalent — the "
            "seed-study noise bar is σ(LL) ≈ 7 nats. The 'production "
            "recipe' row is a separate quality-push arm (shear rotation "
            "+ f32 image head + `--sigma_clamp auto` + `--beta_schedule "
            "warmup2000` — the converged-compare production recipe "
            "applied to the regularized config), not part of the A/B. "
            "Driven by `scripts/run_shear_ab.py`."),
        header=("| rotation impl | best test recon | final recon | final "
                f"KL | final LL | best-ckpt LL (k={k_lo}) | best-ckpt LL "
                f"(k={k_hi}) | σ_max |"),
        descriptions=descriptions, results=rows, format_row=row,
        section_title="Equivariance rotation impl A/B (trained outcome)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--impls", nargs="*", default=["shear", "gather"])
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--data_dir", default="data/sc-pairs-8k")
    p.add_argument("--n_pairs", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--max_early_stop", type=int, default=50)
    p.add_argument("--report_freq", type=int, default=2500)
    p.add_argument("--steps_per_call", type=int, default=19)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--density_k", type=int, nargs="+", default=[10, 30])
    p.add_argument("--device_data", action="store_true")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    ensure_pairs(args.data_dir, args.n_pairs)
    results = {}
    for seed in args.seeds:
        for impl in args.impls:
            print(f"=== shear-ab arm: {impl}, seed {seed}", flush=True)
            results[(impl, seed)] = run_arm(impl, seed, args)
            print(json.dumps({f"{impl}-s{seed}": results[(impl, seed)]}),
                  flush=True)
            write_table(results, args)


if __name__ == "__main__":
    main()
