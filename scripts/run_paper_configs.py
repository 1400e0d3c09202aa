"""Train the paper's regularized / KL-controlled configurations.

Complements scripts/run_latent_matrix.py (the latent-space comparison)
with the reference's remaining named experiment presets
(lie_vae/experiments/config/, merged by main.py:212-219):

- full-scpairs: the complete homeomorphic VAE — SO(3) latent, s2s2 mean,
  action decoder on the consecutive-pose pairs dataset with BOTH
  regularizers (equivariance 100 + encoder continuity 3000, the `scpairs`
  + `reg` presets) — the paper's full model.
- klx-spherecube: the KL-controlled objective (preset `klx`:
  beta_schedule 'x' + control 100, i.e. loss = recon + 100*|beta - kl|^2
  with beta the KL *target*, unsupervised.py:87-95) on the flagship
  spherecube config. At this run length schedule 'x' holds the target at
  its start value 7 (beta_schedule.py:51-52), so the end-of-run KL
  sitting at ~7 demonstrates the controller.

Each config runs through the real CLI entry point (lie_vae_tpu.cli.main)
and lands a row in BENCHMARKS.md between `paper-configs` markers.

Usage:
  python scripts/run_paper_configs.py [--configs full-scpairs klx-spherecube]
"""
import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "full-scpairs": [
        "--config", "scpairs", "reg",
        "--data_dir", "data/sc-pairs-8k",
        "--latent_mode", "so3", "--mean_mode", "s2s2",
        "--decoder_mode", "action", "--beta", "1",
    ],
    "klx-spherecube": [
        "--config", "klx",
        "--dataset", "spherecube", "--data_dir", "data/spherecube-8k",
        "--latent_mode", "so3", "--mean_mode", "s2s2",
        "--decoder_mode", "action",
    ],
    "contreg-scpairs": [
        "--config", "scpairs", "contreg",
        "--data_dir", "data/sc-pairs-8k",
        "--latent_mode", "so3", "--mean_mode", "s2s2",
        "--decoder_mode", "action", "--beta", "1",
    ],
}

DESCRIPTIONS = {
    "full-scpairs": ("full homeomorphic VAE: SO(3)+action, equivariance 100 "
                     "+ continuity 3000, sc-pairs (batch 32)"),
    "klx-spherecube": ("KL-controlled (target 7, gamma 100) SO(3)+action, "
                       "spherecube (batch 64)"),
    "contreg-scpairs": ("continuity-only (3000) SO(3)+action, sc-pairs "
                        "(batch 32)"),
}

BEGIN, END = "<!-- paper-configs:begin -->", "<!-- paper-configs:end -->"


def _config_argv(name, style):
    """The config's CLI argv, with the data dir retargeted for non-v1
    render styles (so each style trains on its own renders)."""
    argv = list(CONFIGS[name])
    if style != "v1":
        i = argv.index("--data_dir") + 1
        argv[i] = argv[i].replace("-8k", f"-{style}-8k")
    return argv


def ensure_data(name, style="v1"):
    """Render the dataset a config needs if it isn't present (the same
    in-repo ray-caster run_latent_matrix.ensure_data uses)."""
    from lie_vae_tpu.cli.gen_spherecube import generate
    from lie_vae_tpu.data import count_renders
    argv = _config_argv(name, style)
    pairs = "sc-pairs" in " ".join(argv)
    data_dir = argv[argv.index("--data_dir") + 1]
    n = 4096 if pairs else 8192
    if count_renders(data_dir) >= n:
        return
    print(f"rendering {n} {'pairs' if pairs else 'images'} into "
          f"{data_dir} ...")
    generate(n, data_dir, step_size=2 * math.pi / 60 if pairs else 0.1,
             pairs=pairs, style=style)


def run_config(name, args):
    from lie_vae_tpu.cli import main as cli_main
    from scripts._results_table import read_ll

    ensure_data(name, style=args.style)
    run_name = (f"paper-{name}" if args.style == "v1"
                else f"paper-{args.style}-{name}")
    argv = _config_argv(name, args.style) + [
        "--report_freq", str(args.report_freq),
        "--steps_per_call", str(args.steps_per_call),
        "--compute_dtype", args.compute_dtype,
        "--equivariance_rotate", args.equivariance_rotate,
        "--ll_batch", "32", "--ll_chunk", "50",
        "--name", run_name,
    ]
    if args.epochs:
        argv += ["--epochs", str(args.epochs),
                 "--max_early_stop", str(args.max_early_stop)]
    argv += args.extra
    exp = cli_main.main(argv)

    # end-of-run test KL from the metrics stream (controller evidence)
    kl = None
    metrics_path = os.path.join("runs", run_name, "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("tag") == "test_kl":
                    kl = rec["value"]
    return {"best_recon": float(exp.best_value),
            "ll": read_ll(run_name), "kl": kl}


def write_table(results, args):
    from scripts._results_table import merge_marker_table

    def row(desc, r):
        ll = f"{r['ll']:.1f}" if r["ll"] is not None else "—"
        kl = f"{r['kl']:.2f}" if r["kl"] is not None else "—"
        return f"| {desc} | {r['best_recon']:.2f} | {kl} | {ll} |"

    begin, end = BEGIN, END
    title = "Regularized / KL-controlled runs (reference presets)"
    style_note = ""
    if args.style != "v1":
        begin = f"<!-- paper-configs-{args.style}:begin -->"
        end = f"<!-- paper-configs-{args.style}:end -->"
        title += f" — {args.style} renders"
        style_note = f", {args.style} high-pose-contrast style"

    merge_marker_table(
        args.out, begin, end,
        caption=(
            "Reference preset combinations through `lie_vae_tpu.cli.main` "
            "(driven by `scripts/run_paper_configs.py`); spherecube/"
            "sc-pairs data from the in-repo renderer (8192 images / 4096 "
            f"pairs{style_note}), compute_dtype={args.compute_dtype}, "
            "equivariance_rotate="
            f"{getattr(args, 'equivariance_rotate', 'shear')}. "
            "LL = importance-sampled test log-likelihood, n=500."),
        header="| config | best test recon | final test KL "
               "| test LL (n=500) |",
        descriptions=DESCRIPTIONS, results=results, format_row=row,
        section_title=title)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", nargs="*", default=list(CONFIGS),
                   choices=list(CONFIGS))
    p.add_argument("--epochs", type=int, default=240,
                   help="0 = keep each preset's own epoch cap")
    p.add_argument("--max_early_stop", type=int, default=30)
    p.add_argument("--report_freq", type=int, default=500)
    p.add_argument("--steps_per_call", type=int, default=19)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--equivariance_rotate", default="shear",
                   help="rotation impl for the equivariance loss "
                        "(recorded in the table caption; the shear-ab "
                        "table pins outcome equivalence vs 'gather')")
    p.add_argument("--out", default="BENCHMARKS.md")
    p.add_argument("--style", choices=["v1", "v2"], default="v1",
                   help="render look; v2 runs are named paper-v2-* on "
                        "their own datasets and write a separate table")
    # unrecognized flags pass through to every config's CLI invocation
    # (e.g. --subsample 0.05 for smoke runs, --device_data)
    args, extra = p.parse_known_args(argv)
    args.extra = extra

    results = {}
    for name in args.configs:
        print(f"=== {name}: {DESCRIPTIONS[name]} ===")
        results[name] = run_config(name, args)
        print(name, results[name])
        write_table(results, args)
    return results


if __name__ == "__main__":
    main()
