"""Image-scale latent-space analysis on the trained spherecube checkpoints.

VERDICT r1 next-step #8: reproduce the notebook's PCA / discontinuity /
encoded-pose figures (toy_results.ipynb cells 11-14) at the scale the
paper actually shows — the 64x64 spherecube IMAGE models from the
latent-matrix runs (outputs/matrix-*, trained by
scripts/run_latent_matrix.py) — instead of only the toy spectra.

For each checkpointed config this script:
  1. renders pose trajectories (circle + random walk on SO(3)) with the
     in-repo ray-caster and ENCODES the images (posterior-mean path);
  2. computes the encoder-discontinuity metric along each trajectory (the
     paper's continuity evaluation) + a PCA scatter figure;
  3. for rotation-interpretable latents, renders the poses the encoder
     assigned (encoded-pose strip, notebook cell 13, Blender-free);
  4. renders an input-vs-reconstruction strip along the circle (cell 12).

Outputs: figures + spherecube_results.json + SPHERECUBE_ANALYSIS.md under
--out_dir (default analysis_out/spherecube).

Usage: python scripts/analyze_spherecube.py [--configs so3-s2s2-action ...]
       (checkpoints must exist under outputs/matrix-<config>/checkpoint)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lie_vae_tpu import analysis
from lie_vae_tpu.data.render import render_spherecube

from scripts.run_latent_matrix import CONFIGS, DESCRIPTIONS

DEFAULT_CONFIGS = ["so3-s2s2-action", "so3-alg-action", "so3-q-action",
                   "normal3-action", "normal30-mlp", "vmfq-action"]


def load_checkpointed_model(name, args):
    """Rebuild the matrix config's model exactly as the CLI did and restore
    its orbax checkpoint (params + batch_stats + opt state + step)."""
    from lie_vae_tpu.cli.main import build_dataset, build_model, parse_args
    from lie_vae_tpu.train.checkpoint import restore_state
    from lie_vae_tpu.train.state import TrainState, make_optimizer

    argv = ["--dataset", "spherecube", "--data_dir", args.data_dir,
            "--compute_dtype", args.compute_dtype] + CONFIGS[name]
    if args.conv_hidden:
        argv += ["--conv_hidden", str(args.conv_hidden)]
    if args.deconv_hidden:
        argv += ["--deconv_hidden", str(args.deconv_hidden)]
    cli_args = parse_args(argv)
    dataset, _, item_rep = build_dataset(cli_args)
    model = build_model(cli_args, dataset, item_rep)

    example = np.asarray(dataset.prep_batch(
        dataset.gather(np.arange(2)))[-1], np.float32) / 255.0
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        jnp.asarray(example), n=1, train=True)
    tx = make_optimizer(lr=cli_args.lr, clip_grads=cli_args.clip_grads)
    template = TrainState.create(params=variables["params"],
                                 batch_stats=variables.get("batch_stats",
                                                           {}),
                                 tx=tx)
    ckpt = os.path.join("outputs", f"{args.run_prefix}{name}", "checkpoint")
    state = restore_state(ckpt, template)
    out = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        out["batch_stats"] = state.batch_stats
    return model, out, int(state.step), cli_args


def recon_strip(model, variables, xs, n_frames=10):
    """(inputs row, reconstructions row) along a trajectory."""
    model = model.clone(deterministic=True)
    idx = np.linspace(0, len(xs) - 1, n_frames).astype(int)
    x = jnp.asarray(xs[idx])
    # jit with variables as an argument (axon: eager dispatch is seconds
    # per op; closed-over params miscompile — CLAUDE.md)
    recon, _ = jax.jit(lambda v, x: model.apply(
        v, x, n=1, train=False,
        rngs={"sample": jax.random.PRNGKey(0)}))(variables, x)
    return np.asarray(x), np.asarray(recon)[0]


def _plot_pca(proj, path, title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.scatter(proj[:, 0], proj[:, 1], c=np.arange(len(proj)),
               cmap="viridis", s=8)
    ax.set_title(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def _plot_rows(rows, path, title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    strip = np.concatenate(
        [np.concatenate(list(np.clip(r, 0, 1)), axis=1) for r in rows],
        axis=0)
    fig, ax = plt.subplots(figsize=(1.1 * rows[0].shape[0],
                                    1.25 * len(rows)))
    ax.imshow(strip)
    ax.axis("off")
    ax.set_title(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def run_config(name, args):
    model, variables, step, cli_args = load_checkpointed_model(name, args)
    latent_mode = cli_args.latent_mode
    print(f"== {name} (checkpoint step {step})")

    results = {"checkpoint_step": step}
    circle = np.asarray(analysis.circle_trajectory(
        args.n_traj, axis=(0.3, 0.5, 0.81)))
    walk = np.asarray(analysis.random_walk_trajectory(
        jax.random.PRNGKey(7), args.n_traj, step=0.08))

    for traj_name, traj in (("circle", circle), ("random_walk", walk)):
        xs = render_spherecube(traj, size=64,
                               style=args.style).astype(np.float32)
        enc = analysis.encode_dataset(model, variables, xs)
        _, summary = analysis.discontinuity_score(enc)
        results[f"discontinuity_{traj_name}"] = summary

        proj, _ = analysis.pca(enc)
        _plot_pca(proj, os.path.join(args.out_dir,
                                     f"{name}_{traj_name}_pca.png"),
                  f"{name} — {traj_name} (encoder PCA)")

        rotation_latent = latent_mode in ("so3", "vmfq") or (
            latent_mode == "normal" and cli_args.normal_dims == 3)
        if traj_name == "circle":
            if rotation_latent:
                mats = np.asarray(analysis.encodings_to_group_matrices(
                    enc, latent_mode))
                idx = np.linspace(0, len(enc) - 1, 10).astype(int)
                strip = analysis.render_encoded_poses(
                    mats[idx], size=64, align_to=traj[0], style=args.style)
                _plot_rows([xs[idx], strip],
                           os.path.join(args.out_dir,
                                        f"{name}_encoded_poses.png"),
                           f"{name} — input poses (top) vs poses the "
                           "encoder assigns (bottom)")
            x_in, x_rec = recon_strip(model, variables, xs)
            _plot_rows([x_in, x_rec],
                       os.path.join(args.out_dir, f"{name}_recon.png"),
                       f"{name} — inputs (top) vs reconstructions "
                       "(bottom) along the circle")
            results["recon_mse_circle"] = float(
                np.mean((x_in - x_rec) ** 2))
    print(json.dumps(results))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=DEFAULT_CONFIGS)
    p.add_argument("--data_dir", default="data/spherecube-8k")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--n_traj", type=int, default=200)
    p.add_argument("--out_dir", default="analysis_out/spherecube")
    p.add_argument("--conv_hidden", type=int, default=0,
                   help="scaled-capacity matrix runs: conv width "
                        "(0 = reference 50)")
    p.add_argument("--deconv_hidden", type=int, default=0,
                   help="scaled-capacity matrix runs: deconv width "
                        "(0 = reference 200)")
    p.add_argument("--style", choices=["v1", "v2"], default="v1",
                   help="render style for trajectories/strips; v2 also "
                        "retargets the default checkpoint prefix, data "
                        "dir and out dir to the matrix-v2-* runs")
    args = p.parse_args(argv)
    args.run_prefix = "matrix-" if args.style == "v1" else \
        f"matrix-{args.style}-"
    if args.conv_hidden or args.deconv_hidden:
        # scaled-capacity matrix runs (run_latent_matrix --conv_hidden/
        # --deconv_hidden) use matrix-<style>-cXdY-* names
        cap = f"c{args.conv_hidden or 50}d{args.deconv_hidden or 200}"
        args.run_prefix = f"matrix-{args.style}-{cap}-"
        if args.out_dir.startswith("analysis_out/spherecube"):
            args.out_dir = f"analysis_out/spherecube-{args.style}-{cap}"
    if args.style != "v1":
        if args.data_dir == "data/spherecube-8k":
            args.data_dir = f"data/spherecube-{args.style}-8k"
        if args.out_dir == "analysis_out/spherecube":
            args.out_dir = f"analysis_out/spherecube-{args.style}"
    os.makedirs(args.out_dir, exist_ok=True)

    all_results = {}
    for name in args.configs:
        ckpt = os.path.join("outputs", f"{args.run_prefix}{name}",
                            "checkpoint")
        if not os.path.isdir(ckpt):
            print(f"skip {name}: no checkpoint at {ckpt}")
            continue
        all_results[name] = run_config(name, args)

    with open(os.path.join(args.out_dir, "spherecube_results.json"),
              "w") as f:
        json.dump(all_results, f, indent=2)

    lines = [
        "# Spherecube image models — latent-space continuity",
        "",
        f"Encoder discontinuity (per-step squared encoding jump) along "
        f"rendered SO(3) trajectories of {args.n_traj} poses, evaluated "
        f"on the latent-matrix checkpoints (outputs/{args.run_prefix}*, "
        f"{args.style} renders). Figures: "
        "*_pca.png (trajectory in encoder space), *_encoded_poses.png "
        "(poses the encoder assigns), *_recon.png (reconstructions).",
        "",
        "Within the SO(3) family the metric is scale-free (all encodings "
        "are 9-dim rotation matrices, squared jumps bounded by 8): the "
        "algebra-mean chart shows the paper's predicted wrap "
        "discontinuities — mean jump at the pi scale, maxing the 8.0 "
        "bound — while the s2s2 / quaternion charts traverse the same "
        "trajectories 1-2 orders of magnitude more smoothly. "
        "Cross-family rows (normal/vmf) are NOT directly comparable on "
        "raw magnitude (their encodings live in differently-scaled "
        "spaces); their pathologies show as outlier counts and in the "
        "PCA/encoded-pose figures instead.",
        "",
        "| config | circle: mean / max / outliers "
        "| walk: mean / max / outliers |",
        "|---|---|---|",
    ]
    for name, r in all_results.items():
        c = r["discontinuity_circle"]
        w = r["discontinuity_random_walk"]
        lines.append(
            f"| {DESCRIPTIONS[name]} "
            f"| {c['mean']:.3g} / {c['max']:.3g} / {c['num_outliers']} "
            f"| {w['mean']:.3g} / {w['max']:.3g} / {w['num_outliers']} |")
    md = os.path.join(args.out_dir, "SPHERECUBE_ANALYSIS.md")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"Wrote {md}")


if __name__ == "__main__":
    main()
