"""Train the paper's latent-space comparison matrix on spherecube images.

The homeomorphic-VAE paper's image evaluation compares latent manifolds
(N(0,I) Euclidean, von Mises-Fisher on S^3, SO(3) with each mean
parameterization) and decoders (group-action vs MLP) on the sphere-cube
dataset, reporting reconstruction + importance-sampled log-likelihood
(reference instrumentations: unsupervised.py:122-156 recon/KL,
main.py:134-143 the n=500 IW-LL appended to ll.txt).

This driver runs each config through the real CLI entry point
(lie_vae_tpu.cli.main — same code path a user runs), with the reference's
early-stopping policy, and writes a results table into BENCHMARKS.md
between `latent-matrix` markers.

The vmf+action combination is excluded: in the reference it is
unbuildable/broken (decode routes latent_mode 'vmf' through
vector_to_eazyz, vae.py:180, which asserts a 3-vector while Sreparameterize
emits 4) — only vmfq (quaternion interpretation of S^3) supports the
action decoder. Same constraint here.

Usage:
  python scripts/run_latent_matrix.py [--configs so3-s2s2-action ...]
      [--epochs 600] [--data_dir data/spherecube-8k] [--n_images 8192]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# config name -> extra CLI argv (on top of the shared spherecube settings)
CONFIGS = {
    "normal3-action": ["--latent_mode", "normal", "--normal_dims", "3",
                       "--decoder_mode", "action"],
    "normal30-mlp": ["--latent_mode", "normal", "--normal_dims", "30",
                     "--decoder_mode", "mlp"],
    "vmf-mlp": ["--latent_mode", "vmf", "--decoder_mode", "mlp"],
    "vmfq-action": ["--latent_mode", "vmfq", "--decoder_mode", "action"],
    "so3-alg-action": ["--latent_mode", "so3", "--mean_mode", "alg",
                       "--decoder_mode", "action"],
    "so3-q-action": ["--latent_mode", "so3", "--mean_mode", "q",
                     "--decoder_mode", "action"],
    "so3-s2s1-action": ["--latent_mode", "so3", "--mean_mode", "s2s1",
                        "--decoder_mode", "action"],
    "so3-s2s2-action": ["--latent_mode", "so3", "--mean_mode", "s2s2",
                        "--decoder_mode", "action"],
    "so3-s2s2-mlp": ["--latent_mode", "so3", "--mean_mode", "s2s2",
                     "--decoder_mode", "mlp"],
}

DESCRIPTIONS = {
    "normal3-action": "N(0,I) R^3 latent, action decoder",
    "normal30-mlp": "N(0,I) R^30 latent, MLP decoder",
    "vmf-mlp": "vMF S^3 latent, MLP decoder",
    "vmfq-action": "vMF S^3 latent (quaternion), action decoder",
    "so3-alg-action": "SO(3) latent, algebra mean, action decoder",
    "so3-q-action": "SO(3) latent, quaternion mean, action decoder",
    "so3-s2s1-action": "SO(3) latent, s2s1 mean, action decoder",
    "so3-s2s2-action": "SO(3) latent, s2s2 mean, action decoder",
    "so3-s2s2-mlp": "SO(3) latent, s2s2 mean, MLP decoder",
}

BEGIN, END = "<!-- latent-matrix:begin -->", "<!-- latent-matrix:end -->"


def ensure_data(data_dir, n_images, style="v1"):
    from lie_vae_tpu.cli.gen_spherecube import generate
    from lie_vae_tpu.data import count_renders
    if count_renders(data_dir) >= n_images:
        return
    print(f"rendering {n_images} spherecube images into {data_dir} ...")
    generate(n_images, data_dir, step_size=0.1, pairs=False, style=style)


def run_config(name, args):
    from lie_vae_tpu.cli import main as cli_main
    from scripts._results_table import read_ll

    run_name = (f"matrix-{name}" if args.style == "v1"
                else f"matrix-{args.style}-{name}")
    conv_h = getattr(args, "conv_hidden", 0)
    deconv_h = getattr(args, "deconv_hidden", 0)
    if conv_h or deconv_h:
        run_name = (f"matrix-{args.style}-c{conv_h or 50}"
                    f"d{deconv_h or 200}-{name}")
    argv = [
        "--dataset", "spherecube", "--data_dir", args.data_dir,
        "--beta", "1", "--epochs", str(args.epochs),
        "--report_freq", str(args.report_freq),
        "--steps_per_call", str(args.steps_per_call),
        "--compute_dtype", args.compute_dtype,
        "--max_early_stop", str(args.max_early_stop),
        "--ll_batch", "32", "--ll_chunk", "50",
        # NB: --name makes the CLI route logs/checkpoints to runs/<name> and
        # outputs/<name> (same behavior as the reference, main.py:23-25)
        "--name", run_name,
    ] + CONFIGS[name]
    if conv_h:
        argv += ["--conv_hidden", str(conv_h)]
    if deconv_h:
        argv += ["--deconv_hidden", str(deconv_h)]
    if getattr(args, "sigma_clamp", None):
        argv += ["--sigma_clamp", str(args.sigma_clamp)]
    if args.device_data:
        argv.append("--device_data")
    exp = cli_main.main(argv)
    return {"best_recon": float(exp.best_value),
            "ll": read_ll(run_name)}


def _pose_pin_note(data_dir):
    """'; poses pinned (...)' when the dataset renders from a committed
    manifest — absolute numbers then compare across rounds/hosts."""
    base = os.path.basename(os.path.normpath(data_dir))
    if os.path.exists(os.path.join("data_poses", base + ".npz")):
        return f"; poses pinned (data_poses/{base}.npz)"
    return ""


def write_table(results, args):
    from scripts._results_table import merge_marker_table

    def row(desc, r):
        ll = f"{r['ll']:.1f}" if r["ll"] is not None else "—"
        return f"| {desc} | {r['best_recon']:.2f} | {ll} |"

    begin, end, title = BEGIN, END, "Latent-space matrix (spherecube)"
    if args.style != "v1":
        begin = f"<!-- latent-matrix-{args.style}:begin -->"
        end = f"<!-- latent-matrix-{args.style}:end -->"
        title = f"Latent-space matrix (spherecube, {args.style} renders)"
    conv_h = getattr(args, "conv_hidden", 0)
    deconv_h = getattr(args, "deconv_hidden", 0)
    if conv_h or deconv_h:
        cap = f"c{conv_h or 50}d{deconv_h or 200}"
        begin = f"<!-- latent-matrix-{args.style}-{cap}:begin -->"
        end = f"<!-- latent-matrix-{args.style}-{cap}:end -->"
        title = (f"Latent-space matrix (spherecube, {args.style} renders, "
                 f"scaled capacity conv {conv_h or 50} / deconv "
                 f"{deconv_h or 200})")

    merge_marker_table(
        args.out, begin, end,
        caption=(
            f"Spherecube ({args.n_images} in-repo renders"
            + (f", {args.style} high-pose-contrast style"
               if args.style != "v1" else "")
            + (f", conv {conv_h or 50} / deconv {deconv_h or 200}"
               if conv_h or deconv_h else "")
            + "), batch 64, "
            f"beta=1, lr 1e-3, clip 1e-5, early stop {args.max_early_stop} "
            f"stale epochs (cap {args.epochs}); "
            f"compute_dtype={args.compute_dtype}"
            + (f"; sigma_clamp={args.sigma_clamp} on SO(3) cells"
               if getattr(args, "sigma_clamp", None) else "")
            + _pose_pin_note(getattr(args, "data_dir", ""))
            + ". LL = importance-sampled "
            "test log-likelihood, n=500 (the reference's final eval, "
            "main.py:134-143), computed with the post-r4-fix host-looped "
            "estimator unless a row is marked † (pre-fix value, reads "
            "low — see the audit note at the top of this file). Driven "
            "through `lie_vae_tpu.cli.main` by "
            "`scripts/run_latent_matrix.py`."),
        header="| latent space / decoder | best test recon "
               "| test LL (n=500) |",
        descriptions=DESCRIPTIONS, results=results, format_row=row,
        section_title=title)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", nargs="*", default=list(CONFIGS),
                   choices=list(CONFIGS))
    p.add_argument("--data_dir", default="data/spherecube-8k")
    p.add_argument("--n_images", type=int, default=8192)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--max_early_stop", type=int, default=50)
    p.add_argument("--report_freq", type=int, default=500)
    p.add_argument("--steps_per_call", type=int, default=19)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--out", default="BENCHMARKS.md")
    p.add_argument("--style", choices=["v1", "v2"], default="v1",
                   help="render look; v2 (high-pose-contrast) makes the "
                        "IW-LL rank pose models honestly — see BENCHMARKS "
                        "'32k renders' section. v2 runs are named "
                        "matrix-v2-* and write a separate table.")
    p.add_argument("--device_data", action="store_true",
                   help="keep the uint8 image cache device-resident "
                        "(fits HBM at these sizes; large wall speedup)")
    p.add_argument("--sigma_clamp", default=None,
                   help="forwarded to the CLI (SO(3) cells only): 'auto' "
                        "clamps posterior sigma at the wrapped density's "
                        "validity bound — REQUIRED at scaled capacity, "
                        "where unclamped beta=1 diverges on most seeds "
                        "(BENCHMARKS beta-seed study)")
    p.add_argument("--conv_hidden", type=int, default=0,
                   help="scaled-capacity matrix: conv base width "
                        "(0 = reference default 50); runs get their own "
                        "marker table and matrix-<style>-cXdY-* names")
    p.add_argument("--deconv_hidden", type=int, default=0,
                   help="scaled-capacity matrix: deconv width "
                        "(0 = reference default 200)")
    args = p.parse_args(argv)

    if args.style != "v1" and args.data_dir == "data/spherecube-8k":
        args.data_dir = f"data/spherecube-{args.style}-8k"
    ensure_data(args.data_dir, args.n_images, style=args.style)
    results = {}
    for name in args.configs:
        print(f"=== {name}: {DESCRIPTIONS[name]} ===")
        results[name] = run_config(name, args)
        print(name, results[name])
        write_table(results, args)   # update incrementally per config


if __name__ == "__main__":
    main()
