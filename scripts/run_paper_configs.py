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


def ensure_data(name):
    """Render the dataset a config needs if it isn't present (the same
    in-repo ray-caster run_latent_matrix.ensure_data uses)."""
    from lie_vae_tpu.cli.gen_spherecube import generate
    pairs = "sc-pairs" in " ".join(CONFIGS[name])
    data_dir = CONFIGS[name][CONFIGS[name].index("--data_dir") + 1]
    n = 4096 if pairs else 8192
    if os.path.isdir(data_dir) and len(os.listdir(data_dir)) >= n:
        return
    print(f"rendering {n} {'pairs' if pairs else 'images'} into "
          f"{data_dir} ...")
    generate(n, data_dir, step_size=2 * math.pi / 60 if pairs else 0.1,
             pairs=pairs)


def run_config(name, args):
    from lie_vae_tpu.cli import main as cli_main
    from scripts._results_table import read_ll

    ensure_data(name)
    argv = CONFIGS[name] + [
        "--report_freq", str(args.report_freq),
        "--steps_per_call", str(args.steps_per_call),
        "--compute_dtype", args.compute_dtype,
        "--ll_batch", "32", "--ll_chunk", "50",
        "--name", f"paper-{name}",
    ]
    if args.epochs:
        argv += ["--epochs", str(args.epochs),
                 "--max_early_stop", str(args.max_early_stop)]
    argv += args.extra
    exp = cli_main.main(argv)

    # end-of-run test KL from the metrics stream (controller evidence)
    kl = None
    metrics_path = os.path.join("runs", f"paper-{name}", "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("tag") == "test_kl":
                    kl = rec["value"]
    return {"best_recon": float(exp.best_value),
            "ll": read_ll(f"paper-{name}"), "kl": kl}


def write_table(results, args):
    from scripts._results_table import merge_marker_table

    def row(desc, r):
        ll = f"{r['ll']:.1f}" if r["ll"] is not None else "—"
        kl = f"{r['kl']:.2f}" if r["kl"] is not None else "—"
        return f"| {desc} | {r['best_recon']:.2f} | {kl} | {ll} |"

    merge_marker_table(
        args.out, BEGIN, END,
        caption=(
            "Reference preset combinations through `lie_vae_tpu.cli.main` "
            "(driven by `scripts/run_paper_configs.py`); spherecube/"
            "sc-pairs data from the in-repo renderer (8192 images / 4096 "
            f"pairs), compute_dtype={args.compute_dtype}. LL = "
            "importance-sampled test log-likelihood, n=500."),
        header="| config | best test recon | final test KL "
               "| test LL (n=500) |",
        descriptions=DESCRIPTIONS, results=results, format_row=row,
        section_title="Regularized / KL-controlled runs "
                      "(reference presets)")


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
    p.add_argument("--out", default="BENCHMARKS.md")
    # unrecognized flags pass through to every config's CLI invocation
    # (e.g. --subsample 0.05 for smoke runs)
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
