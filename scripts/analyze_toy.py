"""Toy-experiment analysis: train (or load) toy models and evaluate the
paper's latent-space diagnostics — the scriptable equivalent of the
reference's toy_results.ipynb.

Outputs (to --out_dir): discontinuity metrics per config (JSON), PCA
scatter figures of encodings along SO(3) trajectories, recon errors, and
— for rotation-interpretable latents (so3 / vmfq / normal-3) — ray-cast
strips of the poses the encoder assigns along the circle trajectory (the
notebook's Blender ``render_axes`` figure, cell 13, without Blender).

Usage:
  python scripts/analyze_toy.py --epochs 200 --out_dir analysis_out
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from lie_vae_tpu import analysis
from lie_vae_tpu.data import ToyDataset, random_split
from lie_vae_tpu.models import LieVAE
from lie_vae_tpu.train import ConstantSchedule, UnsupervisedExperiment

# The paper's toy model matrix (toy_results.ipynb cell 4 loads
# {ae,vae} x {action,mlp} x {q,alg,s2s2,s2s1,normal3,normal30,vmf,vmfq}
# checkpoints); built programmatically below.
def _toy_matrix():
    latents = {
        "alg": dict(latent_mode="so3", mean_mode="alg"),
        "q": dict(latent_mode="so3", mean_mode="q"),
        "s2s1": dict(latent_mode="so3", mean_mode="s2s1"),
        "s2s2": dict(latent_mode="so3", mean_mode="s2s2"),
        "normal3": dict(latent_mode="normal", normal_dims=3),
        "normal30": dict(latent_mode="normal", normal_dims=30),
        "vmf": dict(latent_mode="vmf"),
        "vmfq": dict(latent_mode="vmfq"),
    }
    configs = {}
    for kind, deterministic in (("ae", True), ("vae", False)):
        # action decoder: group latents + the decodable vector latents
        # (normal -> forced 3 dims -> vector_to_eazyz; vmfq -> quaternion
        # Euler conversion; plain vmf has no action path, vae.py:180-189)
        for lname in ("alg", "q", "s2s1", "s2s2", "normal3", "vmfq"):
            configs[f"{kind}-action-{lname}"] = dict(
                decoder_mode="action", deterministic=deterministic,
                **latents[lname])
        # mlp decoder: everything
        for lname in ("s2s2", "normal3", "normal30", "vmf", "vmfq"):
            configs[f"{kind}-mlp-{lname}"] = dict(
                decoder_mode="mlp", deterministic=deterministic,
                **latents[lname])
    return configs


CONFIGS = _toy_matrix()
# the six configs the quick-start exercises, kept as the default subset
DEFAULT_CONFIGS = ["ae-action-s2s2", "ae-action-alg", "ae-action-q",
                   "ae-action-s2s1", "ae-mlp-normal3", "vae-action-s2s2"]


def run_config(name, cfg, ds, train, valid, args):
    model = LieVAE(encode_mode="toy", deconv_mode="toy",
                   degrees=args.degrees, rep_copies=args.rep_copies,
                   fixed_item_rep=(ds.harmonics if args.fixed_spectrum
                                   else None), **cfg)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=train, test_dataset=valid,
        beta_schedule=ConstantSchedule(0.0 if cfg.get("deterministic")
                                       else 1.0),
        batch_size=64, report_freq=10 ** 9, lr=1e-3, clip_grads=None,
        steps_per_call=args.steps_per_call)
    for epoch in range(args.epochs):
        exp.train(epoch)

    variables = {"params": exp.state.params}
    if exp.state.batch_stats:
        variables["batch_stats"] = exp.state.batch_stats

    results = {"test_recon": float(exp.test()[0])}
    for traj_name, traj in [
        ("circle", analysis.circle_trajectory(200)),
        ("random_walk", analysis.random_walk_trajectory(
            jax.random.PRNGKey(7), 200, step=0.08)),
    ]:
        xs = analysis.toy_inputs_for_trajectory(
            traj, ds.harmonics, args.degrees)
        enc = analysis.encode_dataset(model, variables, np.asarray(xs))
        jumps, summary = analysis.discontinuity_score(enc)
        results[f"discontinuity_{traj_name}"] = summary

        proj, _ = analysis.pca(enc)
        _plot(proj, os.path.join(args.out_dir,
                                 f"{name}_{traj_name}_pca.png"),
              f"{name} — {traj_name}")

        latent_mode = cfg["latent_mode"]
        rotation_latent = latent_mode in ("so3", "vmfq") or (
            latent_mode == "normal" and cfg.get("normal_dims") == 3)
        if traj_name == "circle" and rotation_latent:
            # encoded-pose strip (toy_results.ipynb cell 13): render the
            # object at the encoder's poses, aligned to the trajectory
            # start, so latent-space discontinuities are visible as pose
            # jumps between adjacent frames
            mats = np.asarray(
                analysis.encodings_to_group_matrices(enc, latent_mode))
            idx = np.linspace(0, len(enc) - 1, 12).astype(int)
            strip = analysis.render_encoded_poses(
                mats[idx], size=64, align_to=np.asarray(traj[0]))
            _plot_strip(strip,
                        os.path.join(args.out_dir,
                                     f"{name}_encoded_poses.png"),
                        f"{name} — encoded poses along the circle")

    # absolute pose recovery (deterministic rotation-latent configs with
    # the ground-truth spectrum fixed): the pose is identifiable, so the
    # geodesic angle to the generating rotation is a scale-free accuracy
    # metric — unlike recon, whose magnitude grows with degree because
    # high-l blocks amplify a fixed angular error.
    latent_mode = cfg["latent_mode"]
    rotation_latent = latent_mode in ("so3", "vmfq") or (
        latent_mode == "normal" and cfg.get("normal_dims") == 3)
    # (for stochastic configs the encoding evaluated here is already the
    # posterior mean — encode_dataset clones deterministic=True)
    if args.fixed_spectrum and rotation_latent:
        import jax.numpy as jnp
        from lie_vae_tpu import ops
        q, _, x = valid.gather(np.arange(min(len(valid), 512)))
        enc = analysis.encode_dataset(model, variables, np.asarray(x))
        r_hat = np.asarray(
            analysis.encodings_to_group_matrices(enc, latent_mode))
        r_true = np.asarray(ops.quaternions_to_group_matrix(jnp.asarray(q)))
        rel_tr = np.einsum("bij,bij->b", r_hat, r_true)   # tr(R_hat R_true^T)
        ang = np.degrees(np.arccos(np.clip((rel_tr - 1.0) / 2.0, -1.0, 1.0)))
        # the error distribution is bimodal: gradient descent either
        # recovers the pose (~0 deg) or sticks in the classic 180-degree
        # flip local minima of SO(3) registration — report coverage, not
        # just central tendency
        results["pose_err_deg"] = {
            "median": float(np.median(ang)),
            "mean": float(np.mean(ang)),
            "frac_within_10deg": float(np.mean(ang <= 10.0)),
            "frac_near_flip": float(np.mean(ang >= 170.0))}
    return results


def _plot(proj, path, title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.scatter(proj[:, 0], proj[:, 1], c=np.arange(len(proj)),
               cmap="viridis", s=8)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def _plot_strip(imgs, path, title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    strip = np.concatenate(list(np.clip(imgs, 0.0, 1.0)), axis=1)
    fig, ax = plt.subplots(figsize=(1.2 * len(imgs), 1.7))
    ax.imshow(strip)
    ax.axis("off")
    ax.set_title(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--degrees", type=int, default=3)
    p.add_argument("--rep_copies", type=int, default=4)
    p.add_argument("--n_data", type=int, default=1024)
    p.add_argument("--fixed_spectrum", action=argparse.BooleanOptionalAction,
               default=True, help="--no-fixed_spectrum trains learned item representations")
    p.add_argument("--steps_per_call", type=int, default=8)
    p.add_argument("--out_dir", default="analysis_out")
    p.add_argument("--configs", nargs="*", default=DEFAULT_CONFIGS,
                   help="config names, or 'all' for the paper's full "
                        "{ae,vae} x {action,mlp} x latent matrix")
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force a jax platform (the toy models are small "
                        "enough that --platform cpu is practical)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.configs == ["all"]:
        args.configs = list(CONFIGS)

    os.makedirs(args.out_dir, exist_ok=True)
    ds = ToyDataset.generate(n=args.n_data, degrees=args.degrees,
                             rep_copies=args.rep_copies)
    nv = args.n_data // 8
    valid, _, train = random_split(ds, [nv, nv, args.n_data - 2 * nv])

    all_results = {}
    for name in args.configs:
        print(f"== {name}")
        all_results[name] = run_config(name, CONFIGS[name], ds, train,
                                       valid, args)
        print(json.dumps(all_results[name], indent=2))

    with open(os.path.join(args.out_dir, "results.json"), "w") as f:
        json.dump(all_results, f, indent=2)
    print(f"Wrote {args.out_dir}/results.json")

    # markdown summary table (the notebook's recon + discontinuity view)
    lines = [
        "# Toy experiment matrix — recon + encoder discontinuity",
        "",
        f"{args.epochs} epochs, degrees={args.degrees}, "
        f"rep_copies={args.rep_copies}, n={args.n_data}, "
        f"fixed_spectrum={args.fixed_spectrum}. Discontinuity = per-step "
        "squared encoding jumps along SO(3) trajectories "
        "(toy_results.ipynb cells 3+14); outliers = jumps >10x median. "
        "Pose coverage (rotation-interpretable latents under a fixed "
        "ground-truth spectrum, where the pose is identifiable) = "
        "fraction of validation poses recovered within 10 deg / fraction "
        "stuck at the 180-deg flip local minima of SO(3) registration.",
        "",
        "| config | test recon | pose cov. <=10 deg / flips "
        "| circle: mean / max / outliers "
        "| walk: mean / max / outliers |",
        "|---|---|---|---|---|",
    ]
    for name, r in all_results.items():
        c = r["discontinuity_circle"]
        w = r["discontinuity_random_walk"]
        p = r.get("pose_err_deg")
        pe = (f"{100 * p['frac_within_10deg']:.0f}% / "
              f"{100 * p['frac_near_flip']:.0f}%" if p else "—")
        lines.append(
            f"| {name} | {r['test_recon']:.3f} | {pe} "
            f"| {c['mean']:.3g} / {c['max']:.3g} / {c['num_outliers']} "
            f"| {w['mean']:.3g} / {w['max']:.3g} / {w['num_outliers']} |")
    md = os.path.join(args.out_dir, "TOY_RESULTS.md")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"Wrote {md}")


if __name__ == "__main__":
    main()
