"""Sphere-cube dataset generator CLI.

Mirrors the reference's generator (lie_vae/experiments/gen_spherecube_pairs.py):
sample Haar-random pose a, perturbation d = exp(N(0, step)), pair b = a @ d,
write per-pose images with the quaternion embedded in the filename (4-decimal
floats — the exact format the dataset loaders parse back,
datasets.py:67-72).

Rendering backends:
- default: the in-repo numpy ray-caster (data/render.py) — no external deps;
- --blender: shell out to Blender with the fresh script
  lie_vae_tpu/data/blender_spherecube.py (requires a blender binary).

Usage:
  python -m lie_vae_tpu.cli.gen_spherecube NUM DIR            # pairs
  python -m lie_vae_tpu.cli.gen_spherecube NUM DIR --singles  # single poses
"""
import argparse
import os
import subprocess
import sys

import numpy as np


def _pose_name(index, sub, q):
    return "{:06d}_{}_{:.4f}_{:.4f}_{:.4f}_{:.4f}.png".format(
        index, sub, *[float(x) for x in q])


def sample_poses(num, step_size, pairs, seed):
    """Haar pose a (+ pair b = a @ exp(N(0, step)) when ``pairs``) — pure
    numpy (PCG64), so the realization is HOST-DETERMINISTIC: re-rendering
    with the same (num, step_size, pairs, seed) reproduces the dataset
    bit-for-bit across machine rotations (the r2 pipeline sampled poses on
    the session's default jax device, which did not)."""
    from lie_vae_tpu.data._np_ops import (
        expmap_np, group_matrix_to_quaternions_np,
        quaternions_to_group_matrix_np, random_quaternions_np)

    rng = np.random.default_rng(seed)
    a_r = quaternions_to_group_matrix_np(random_quaternions_np(num, rng))
    if pairs:
        d = expmap_np(rng.normal(size=(num, 3)) * step_size)
        r = np.stack([a_r, a_r @ d], 1)                 # (num, 2, 3, 3)
    else:
        r = a_r[:, None]                                # (num, 1, 3, 3)
    return r, group_matrix_to_quaternions_np(r)


# Committed pose manifests live here, keyed by dataset-dir basename
# (data_poses/<basename>.npz): generate() picks them up automatically so
# every driver renders the SAME realization on every host/round.
POSE_SETS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data_poses")


def _pinned_manifest(out_dir, num, pairs):
    """Path of a committed manifest covering (out_dir, num, pairs), if any.

    A manifest with MORE poses than requested still pins the realization:
    the first ``num`` poses are used, so e.g. bench.py's 256-image warmup
    render is an exact prefix of the 2048-image converged-compare set."""
    path = os.path.join(POSE_SETS_DIR,
                        os.path.basename(os.path.normpath(out_dir)) + ".npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as f:
        shape = f["r"].shape
    if shape[0] < num or bool(shape[1] == 2) != bool(pairs):
        return None
    return path


def generate(num, out_dir, step_size, size=64, pairs=True, seed=0,
             use_blender=False, style="v1", from_poses=None):
    if from_poses is None:
        from_poses = _pinned_manifest(out_dir, num, pairs)
        if from_poses:
            print(f"using pinned poses {from_poses}")
    if from_poses:
        # exact re-render of a pinned realization (see --save_poses):
        # the ray-caster is deterministic host code, so poses pin pixels
        with np.load(from_poses) as f:
            r_np, q_np = f["r"], f["q"]
        if len(r_np) < num or bool(r_np.shape[1] == 2) != bool(pairs):
            raise ValueError(
                f"pose manifest {from_poses} holds {len(r_np)} "
                f"{'pairs' if r_np.shape[1] == 2 else 'singles'}; "
                f"asked for {num} {'pairs' if pairs else 'singles'}")
        r_np, q_np = r_np[:num], q_np[:num]
    else:
        r_np, q_np = sample_poses(num, step_size, pairs, seed)
    names = [[_pose_name(i, j, q_np[i, j]) for j in range(r_np.shape[1])]
             for i in range(num)]

    os.makedirs(out_dir, exist_ok=True)
    # manifest: lets a later host re-render THIS dataset bit-exactly
    # (``from_poses``) even if numpy's sampling streams ever change
    np.savez_compressed(
        os.path.join(out_dir, "_poses.npz"), r=r_np, q=q_np,
        meta=np.array([num, r_np.shape[1], size, seed], dtype=np.int64),
        step_size=np.float64(step_size), style=np.bytes_(style))
    if use_blender:
        if style != "v1":
            raise ValueError(
                f"style={style!r} is a ray-caster look; the Blender "
                "backend renders cube.blend only (drop --blender or "
                "--style)")
        _render_blender(r_np, names, out_dir, size)
    else:
        _render_numpy(r_np, names, out_dir, size, style=style)
    return names


def _render_numpy(r, names, out_dir, size, batch=256, style="v1"):
    # 'numpy' historically; dispatches to the native C++ renderer when
    # buildable (backend='auto'), ~100x faster on this host
    from PIL import Image

    from lie_vae_tpu.data.render import render_spherecube

    flat_r = r.reshape(-1, 3, 3)
    flat_names = [n for row in names for n in row]
    for i in range(0, len(flat_r), batch):
        imgs = render_spherecube(flat_r[i:i + batch], size=size, style=style)
        for img, name in zip(imgs, flat_names[i:i + batch]):
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(out_dir, name))


def _render_blender(r, names, out_dir, size):
    import json
    import tempfile

    # ship rotation MATRICES (convention-unambiguous) — this repo's
    # quaternion layout (lie_tools.py:183-192) is not Blender's (w,x,y,z)
    flat_names = [n for row in names for n in row]
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump({"matrices": r.reshape(-1, 3, 3).tolist(),
                   "names": flat_names,
                   "out_dir": os.path.abspath(out_dir), "size": size}, f)
        spec = f.name
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "blender_spherecube.py")
    subprocess.check_call(["blender", "--background", "--python", script,
                           "--", spec])


def main(argv=None):
    parser = argparse.ArgumentParser(__doc__)
    parser.add_argument("num", type=int)
    parser.add_argument("dir")
    parser.add_argument("--step_size", type=float, default=2 * np.pi / 60)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--singles", action="store_true",
                        help="single poses (spherecube) instead of pairs "
                             "(sc-pairs)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--blender", action="store_true")
    parser.add_argument("--style", choices=["v1", "v2"], default="v1",
                        help="render look: v1 (round-1, dim flat faces) or "
                             "v2 (high-pose-contrast textures; see "
                             "data/render.py)")
    parser.add_argument("--from_poses", default=None,
                        help="re-render exactly this pose manifest "
                             "(an _poses.npz written by a prior generate)")
    args = parser.parse_args(argv)
    generate(args.num, args.dir, args.step_size, size=args.size,
             pairs=not args.singles, seed=args.seed,
             use_blender=args.blender, style=args.style,
             from_poses=args.from_poses)
    print(f"Wrote {'pairs' if not args.singles else 'poses'} to {args.dir}")


if __name__ == "__main__":
    main()
