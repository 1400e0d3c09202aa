"""Multi-seed confirmation of the beta=0.5 headline result.

The r2 KL-objective sweep found beta=0.5 beats the reference's beta=1 by
6.3 nats of best-checkpoint IW-LL on the scaled v2-32k flagship — but
that sweep is single-seed, and the 8k-scale seed study measured
sigma(LL) ~= 7 nats, so the win is within one seed-noise sigma until
replicated. This driver trains beta in {0.5, 1} x N seeds at the sweep's
exact settings (conv 100 / deconv 400, data/spherecube-v2-32k), then
re-evaluates each BEST checkpoint at density_k in {10, 30}
(shell-stability, scripts/eval_checkpoint.py semantics) and writes a
per-seed + per-beta-summary table between `beta-seed-confirm` markers in
BENCHMARKS.md. The claim stands if the per-beta mean gap exceeds the
per-beta spread.

Usage:
  python scripts/run_beta_seed_confirm.py --device_data [--seeds 0 1 2]
"""
import argparse
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- beta-seed-confirm:begin -->"
END = "<!-- beta-seed-confirm:end -->"

BETAS = {"beta05": "0.5", "beta1": "1"}

MODEL = ["--latent_mode", "so3", "--mean_mode", "s2s2",
         "--decoder_mode", "action",
         "--conv_hidden", "100", "--deconv_hidden", "400"]


def _cell_key(cell, seed):
    return f"{cell}-s{seed}"


def run_cell(cell, seed, args):
    from lie_vae_tpu.cli import main as cli_main
    from scripts._results_table import read_ll
    from scripts.eval_checkpoint import evaluate

    run_name = f"beta-confirm-{cell}-s{seed}"
    argv = ["--beta", BETAS[cell]] + MODEL + [
        "--dataset", "spherecube", "--data_dir", args.data_dir,
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

    eval_args = cli_main.parse_args(MODEL + [
        "--dataset", "spherecube", "--data_dir", args.data_dir,
        "--compute_dtype", args.compute_dtype,
        "--ll_batch", "32", "--ll_chunk", "50", "--name", run_name])
    best = evaluate(eval_args, density_k=args.density_k)
    return {"best_recon": float(exp.best_value),
            "final_ll": read_ll(run_name),
            "best_ll": best["ll"],
            "sigma_max": (best["sigma"] or {}).get("max")}


def write_table(results, args):
    """results: {(cell, seed): row dict}."""
    from scripts._results_table import (_pose_pin_note, merge_marker_table)

    k_lo, k_hi = args.density_k[0], args.density_k[-1]

    def row(desc, r):
        if isinstance(r, str):
            return r
        final = f"{r['final_ll']:.1f}" if r["final_ll"] is not None else "—"
        lo = r["best_ll"].get(k_lo)
        hi = r["best_ll"].get(k_hi)
        lo = f"{lo:.2f}" if lo is not None else "—"
        hi = f"{hi:.2f}" if hi is not None else "—"
        sig = f"{r['sigma_max']:.3f}" if r["sigma_max"] is not None else "—"
        return (f"| {desc} | {r['best_recon']:.2f} | {final} | {lo} | {hi} "
                f"| {sig} |")

    # seeds previously written to the table (partial reruns keep their rows)
    existing = set()
    if os.path.exists(args.out):
        doc = open(args.out).read()
        if BEGIN in doc and END in doc:
            for line in doc.split(BEGIN)[1].split(END)[0].splitlines():
                m = re.match(r"\| β=(0\.5|1), seed (\d+) \|", line)
                if m:
                    existing.add(("beta05" if m.group(1) == "0.5"
                                  else "beta1", int(m.group(2))))

    descriptions, rows = {}, {}
    for cell, label in (("beta05", "β=0.5"), ("beta1", "β=1")):
        seeds = sorted({s for (c, s) in results if c == cell}
                       | {s for (c, s) in existing if c == cell})
        for s in seeds:
            key = _cell_key(cell, s)
            descriptions[key] = f"{label}, seed {s}"
            if (cell, s) in results:
                rows[key] = results[(cell, s)]
        run_seeds = [s for s in seeds if (cell, s) in results]
        lls = [results[(cell, s)]["best_ll"].get(k_lo) for s in run_seeds]
        lls = [x for x in lls if x is not None]
        if len(lls) > 1:
            m = sum(lls) / len(lls)
            sd = math.sqrt(sum((x - m) ** 2 for x in lls) / (len(lls) - 1))
            key = f"{cell}-summary"
            descriptions[key] = f"**{label} mean ± std ({len(lls)} seeds)**"
            rows[key] = (f"| **{label} mean ± std ({len(lls)} seeds)** | — "
                         f"| — | **{m:.2f} ± {sd:.2f}** | — | — |")

    merge_marker_table(
        args.out, BEGIN, END,
        caption=(
            "Multi-seed confirmation of the KL-sweep's β=0.5 result at "
            f"scaled capacity (conv 100 / deconv 400) on {args.data_dir}"
            f"{_pose_pin_note(args.data_dir)}, "
            f"batch 64, early stop {args.max_early_stop} stale epochs (cap "
            f"{args.epochs}), compute_dtype={args.compute_dtype}. "
            "'best-ckpt LL' re-evaluates the best-validation checkpoint "
            f"at density_k={k_lo} and {k_hi} (shell stability); σ_max is "
            "the best checkpoint's largest posterior σ component. Rows "
            "produced by this script post-r4 use the fixed host-looped "
            "LL estimator (a partial rerun preserves prior rows "
            "verbatim — their provenance is the round that wrote them). "
            "Driven by `scripts/run_beta_seed_confirm.py`."),
        header=("| run | best test recon | final LL | best-ckpt LL "
                f"(k={k_lo}) | best-ckpt LL (k={k_hi}) | σ_max |"),
        descriptions=descriptions, results=rows,
        format_row=row,
        section_title="β=0.5 vs β=1 seed confirmation (v2-32k flagship)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--cells", nargs="*", default=["beta05", "beta1"])
    p.add_argument("--data_dir", default="data/spherecube-v2-32k")
    p.add_argument("--n_images", type=int, default=32768)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--max_early_stop", type=int, default=50)
    p.add_argument("--report_freq", type=int, default=2500)
    p.add_argument("--steps_per_call", type=int, default=19)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--density_k", type=int, nargs="+", default=[10, 30])
    p.add_argument("--device_data", action="store_true")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    from scripts.run_latent_matrix import ensure_data
    ensure_data(args.data_dir, args.n_images, style="v2")

    results = {}
    for seed in args.seeds:
        for cell in args.cells:
            print(f"=== {cell} seed {seed} ===")
            results[(cell, seed)] = run_cell(cell, seed, args)
            print(cell, seed, results[(cell, seed)])
            write_table(results, args)


if __name__ == "__main__":
    main()
