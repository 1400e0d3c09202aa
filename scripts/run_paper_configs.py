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


def run_config(name, args):
    from lie_vae_tpu.cli import main as cli_main

    argv = CONFIGS[name] + [
        "--report_freq", str(args.report_freq),
        "--steps_per_call", str(args.steps_per_call),
        "--compute_dtype", args.compute_dtype,
        "--ll_batch", "16", "--ll_chunk", "50",
        "--name", f"paper-{name}",
    ]
    if args.epochs:
        argv += ["--epochs", str(args.epochs),
                 "--max_early_stop", str(args.max_early_stop)]
    argv += args.extra
    exp = cli_main.main(argv)

    ll = None
    if os.path.exists("ll.txt"):
        with open("ll.txt") as f:
            for line in f:
                if line.startswith(f"paper-{name} :"):
                    ll = float(line.split(":")[1])
    # end-of-run test KL from the metrics stream (controller evidence)
    kl = None
    metrics_path = os.path.join("runs", f"paper-{name}", "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("tag") == "test_kl":
                    kl = rec["value"]
    return {"best_recon": float(exp.best_value), "ll": ll, "kl": kl}


def write_table(results, args):
    lines = [
        "Reference preset combinations through `lie_vae_tpu.cli.main` "
        "(driven by `scripts/run_paper_configs.py`); spherecube/sc-pairs "
        "data from the in-repo renderer (8192 images / 4096 pairs), "
        f"compute_dtype={args.compute_dtype}. LL = importance-sampled test "
        "log-likelihood, n=500.",
        "",
        "| config | best test recon | final test KL | test LL (n=500) |",
        "|---|---|---|---|",
    ]
    doc = ""
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = f.read()
    old_rows = {}
    if BEGIN in doc and END in doc:
        for row in doc.split(BEGIN)[1].split(END)[0].splitlines():
            if row.startswith("| ") and not row.startswith("| config"):
                old_rows[row.split("|")[1].strip()] = row
    for name, desc in DESCRIPTIONS.items():
        if name in results:
            r = results[name]
            ll = f"{r['ll']:.1f}" if r["ll"] is not None else "—"
            kl = f"{r['kl']:.2f}" if r["kl"] is not None else "—"
            lines.append(f"| {desc} | {r['best_recon']:.2f} | {kl} | {ll} |")
        elif desc in old_rows:
            lines.append(old_rows[desc])
    block = f"{BEGIN}\n" + "\n".join(lines) + f"\n{END}"

    if BEGIN in doc and END in doc:
        doc = doc.split(BEGIN)[0] + block + doc.split(END, 1)[1]
    else:
        doc = (doc.rstrip() + "\n\n## Regularized / KL-controlled runs "
               "(reference presets)\n\n" + block + "\n")
    with open(args.out, "w") as f:
        f.write(doc)
    print(f"wrote {args.out}")


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
