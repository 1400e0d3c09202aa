"""Beta / KL-objective sweep for the scaled flagship (v2 renders).

BENCHMARKS' "v2 renders" flagship row uses the reference's beta=1. This
driver sweeps the KL weight and the KL-controlled objective at scaled
capacity (conv 100 / deconv 400) on the 32k v2 renders, training each
cell through the normal CLI and reporting best validation recon,
final-state IW-LL, and the best-checkpoint shell-stability eval
(scripts/eval_checkpoint.py at k=10/30) between `beta-sweep` markers in
BENCHMARKS.md. The r2 finding it reproduces: beta=0.5 is the sweet spot
(-71.67 best-checkpoint LL, 6+ nats over beta=1); both controller cells
lose (see BENCHMARKS "Regularized / KL-controlled runs — v2").

Usage:
  python scripts/run_beta_sweep.py [--cells beta05 beta1 ...] [--device_data]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN, END = "<!-- beta-sweep:begin -->", "<!-- beta-sweep:end -->"

CELLS = {
    "beta025": (["--beta", "0.25"], "beta = 0.25"),
    "beta05": (["--beta", "0.5"], "beta = 0.5"),
    "beta1": (["--beta", "1"], "beta = 1 (reference default)"),
    "ctrl14": (["--control", "100", "--beta", "14"],
               "KL controller, target 14 (the natural KL)"),
    "klx": (["--config", "klx"],
            "klx preset (controller, target 7 ramp)"),
}

MODEL = ["--latent_mode", "so3", "--mean_mode", "s2s2",
         "--decoder_mode", "action",
         "--conv_hidden", "100", "--deconv_hidden", "400"]


def run_cell(cell, args):
    from lie_vae_tpu.cli import main as cli_main
    from scripts._results_table import read_ll

    flags, _ = CELLS[cell]
    run_name = f"beta-sweep-{cell}"
    argv = flags + MODEL + [
        "--dataset", "spherecube", "--data_dir", args.data_dir,
        "--epochs", str(args.epochs),
        "--max_early_stop", str(args.max_early_stop),
        "--report_freq", str(args.report_freq),
        "--steps_per_call", str(args.steps_per_call),
        "--compute_dtype", args.compute_dtype,
        "--ll_batch", "32", "--ll_chunk", "50",
        "--name", run_name,
    ]
    if args.device_data:
        argv.append("--device_data")
    exp = cli_main.main(argv)
    return {"best_recon": float(exp.best_value), "ll": read_ll(run_name)}


def write_table(results, args):
    from scripts._results_table import merge_marker_table

    def format_row(desc, r):
        ll = f"{r['ll']:.1f}" if r["ll"] is not None else "—"
        return f"| {desc} | {r['best_recon']:.2f} | {ll} |"

    caption = (
        f"KL-objective sweep at scaled capacity (conv 100 / deconv 400) on "
        f"{args.data_dir}, batch 64, early stop {args.max_early_stop} stale "
        f"epochs (cap {args.epochs}); compute_dtype={args.compute_dtype}. "
        "LL = final-state importance-sampled test log-likelihood, n=500. "
        "Re-evaluate best checkpoints with scripts/eval_checkpoint.py "
        "--density_k 10 30 for the shell-stable numbers quoted in the "
        "prose. Driven by `scripts/run_beta_sweep.py`.")
    merge_marker_table(
        getattr(args, "out", "BENCHMARKS.md"), BEGIN, END, caption,
        "| KL objective | best test recon | test LL (n=500) |",
        {c: CELLS[c][1] for c in CELLS}, results, format_row,
        "KL-objective sweep (scaled flagship, v2 renders)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cells", nargs="*", default=["beta025", "beta05",
                                                  "beta1", "ctrl14"])
    p.add_argument("--data_dir", default="data/spherecube-v2-32k")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--max_early_stop", type=int, default=50)
    p.add_argument("--report_freq", type=int, default=2500)
    p.add_argument("--steps_per_call", type=int, default=19)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--device_data", action="store_true")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    results = {}
    for cell in args.cells:
        print(f"=== {cell}: {CELLS[cell][1]}")
        results[cell] = run_cell(cell, args)
        print(cell, results[cell])
    write_table(results, args)


if __name__ == "__main__":
    main()
