"""Validate --sigma_clamp on the configuration that diverges without it.

The r3 beta-seed study (BENCHMARKS `beta-seed-confirm` markers) caught
seed-dependent runaway-sigma divergence at scaled capacity: beta=1
seed 0 on v2-32k ran away to sigma_max ~316 >> the wrapped density's
validity bound (pi*k/2 ~= 15.7 at k=10), recon stuck ~165. This driver
re-runs THAT exact cell with `--sigma_clamp auto` and records best
recon / final LL / sigma_max — the clamp should keep sigma <= the bound
and let the model actually train.

Run (real TPU): python scripts/run_sigma_clamp_demo.py --device_data
Writes a short block between `sigma-clamp-demo` markers in BENCHMARKS.md.
"""
import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- sigma-clamp-demo:begin -->"
END = "<!-- sigma-clamp-demo:end -->"

MODEL = ["--latent_mode", "so3", "--mean_mode", "s2s2",
         "--decoder_mode", "action",
         "--conv_hidden", "100", "--deconv_hidden", "400"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beta", default="1")
    p.add_argument("--data_dir", default="data/spherecube-v2-32k")
    p.add_argument("--n_images", type=int, default=32768)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--max_early_stop", type=int, default=50)
    p.add_argument("--report_freq", type=int, default=2500)
    p.add_argument("--steps_per_call", type=int, default=19)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--device_data", action="store_true")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    from lie_vae_tpu.cli import main as cli_main
    from scripts._results_table import read_ll
    from scripts.eval_checkpoint import evaluate
    from scripts.run_latent_matrix import ensure_data

    ensure_data(args.data_dir, args.n_images, style="v2")
    run_name = f"sigma-clamp-demo-b{args.beta}-s{args.seed}"
    argv2 = ["--beta", args.beta, "--sigma_clamp", "auto"] + MODEL + [
        "--dataset", "spherecube", "--data_dir", args.data_dir,
        "--epochs", str(args.epochs),
        "--max_early_stop", str(args.max_early_stop),
        "--report_freq", str(args.report_freq),
        "--steps_per_call", str(args.steps_per_call),
        "--compute_dtype", args.compute_dtype,
        "--ll_batch", "32", "--ll_chunk", "50",
        "--seed", str(args.seed), "--name", run_name,
    ]
    if args.device_data:
        argv2.append("--device_data")
    exp = cli_main.main(argv2)

    eval_args = cli_main.parse_args(
        MODEL + ["--sigma_clamp", "auto",
                 "--dataset", "spherecube", "--data_dir", args.data_dir,
                 "--compute_dtype", args.compute_dtype,
                 "--ll_batch", "32", "--ll_chunk", "50",
                 "--name", run_name])
    best = evaluate(eval_args, density_k=[10])
    res = {"best_recon": round(float(exp.best_value), 2),
           "final_ll": read_ll(run_name),
           "best_ll_k10": best["ll"].get(10),
           "sigma_max": (best["sigma"] or {}).get("max"),
           "bound": round(math.pi * 10 / 2, 2)}
    print(json.dumps(res), flush=True)

    sig = (f"{res['sigma_max']:.3f}" if res["sigma_max"] is not None
           else "—")
    bll = (f"{res['best_ll_k10']:.2f}" if res["best_ll_k10"] is not None
           else "—")
    block = "\n".join([
        BEGIN,
        "### `--sigma_clamp auto` on the diverging cell",
        "",
        f"β={args.beta}, seed {args.seed}, scaled capacity "
        f"(conv 100 / deconv 400) on {args.data_dir} — the exact cell "
        "that ran away WITHOUT the clamp in the beta-seed study above "
        "(σ_max ≈ 316, recon stuck ~165). With `--sigma_clamp auto` "
        f"(σ ≤ π·k/2 = {res['bound']}), cap {args.epochs} epochs: "
        f"best test recon **{res['best_recon']}**, best-ckpt IW-LL "
        f"(k=10) **{bll}**, checkpoint σ_max **{sig}** (inside the "
        "validity bound by construction). Driven by "
        "`scripts/run_sigma_clamp_demo.py`.",
        END,
    ])
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


if __name__ == "__main__":
    main()
