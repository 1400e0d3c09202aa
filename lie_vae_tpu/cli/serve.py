"""Serving CLI: ``python -m lie_vae_tpu.cli.serve <command> ...``.

Deployment/inference entry point over :mod:`lie_vae_tpu.serve`. The
reference has no serving CLI at all — post-training use is notebook code
(toy_results.ipynb) and a batch-size-1 LL loop (lie_vae/experiments/
main.py:134-143); this is a new TPU-first surface.

Commands (all take the training run's model flags after the command's own
options, exactly as passed to ``cli.main`` — the model must be rebuilt
with the same architecture the checkpoint was trained with):

  export      orbax checkpoint -> single .npz deployment artifact
  sample      decode n Haar-random prior poses -> .npz (and .png grid)
  trajectory  decode a latent geodesic between two encoded/random poses
  bench       serving latency/throughput on the current backend (JSON)
  http        network serving: HTTP endpoint over the compiled session
              (npz + JSON bodies; /v1/encode|decode|reconstruct|sample|
              geodesic, GET /healthz; lie_vae_tpu.serve_http)

Examples::

  python -m lie_vae_tpu.cli.serve export --name flagship-32k-h400-e100
  python -m lie_vae_tpu.cli.serve sample --artifact outputs/flagship-32k-h400-e100/artifact.npz \
      -n 16 --dataset spherecube --conv_hidden 100 --deconv_hidden 400
  python -m lie_vae_tpu.cli.serve bench --artifact ... --batch_size 64 \
      --dataset spherecube --conv_hidden 100 --deconv_hidden 400
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def _build_model(args):
    """Rebuild the LieVAE from training flags WITHOUT loading an image
    dataset.

    cli.build_model needs the dataset for ``rgb``, the toy/conv
    encode-mode switch (cli/main.py:63-88) — both functions of
    --dataset alone (spherecube and sc-pairs are rgb image datasets,
    datasets.py:87-92 in the reference) — and, for toy
    ``--fixed_spectrum`` runs, the ground-truth harmonics the decoder
    was frozen to (the checkpoint then has no item_rep param), which we
    reload from --toy_path exactly as training did.
    """
    from lie_vae_tpu.cli.main import sigma_clamp_value as \
        cli_main_sigma_clamp
    from lie_vae_tpu.models import LieVAE

    is_toy = args.dataset == "toy"
    item_rep = None
    if args.fixed_spectrum:
        if not is_toy:
            raise SystemExit("--fixed_spectrum is a toy-dataset flag")
        from lie_vae_tpu.data.toy import ToyDataset
        item_rep = ToyDataset(path=args.toy_path).harmonics
    return LieVAE(
        fixed_item_rep=item_rep,
        latent_mode=args.latent_mode,
        mean_mode=args.mean_mode,
        decoder_mode=args.decoder_mode,
        encode_mode=("toy" if is_toy else "conv"),
        deconv_mode=("toy" if is_toy else args.deconv_mode),
        rep_copies=args.rep_copies,
        degrees=args.degrees,
        deconv_hidden=args.deconv_hidden,
        conv_hidden=args.conv_hidden,
        batch_norm=bool(args.batch_norm),
        rgb=not is_toy,
        normal_dims=args.normal_dims,
        deterministic=args.deterministic,
        wigner_transpose=args.wigner_transpose,
        mlp_layers=args.mlp_layers,
        mlp_hidden=args.mlp_hidden,
        mlp_activation=args.mlp_activation,
        fixed_sigma=args.fixed_sigma,
        compute_dtype=args.compute_dtype,
        kernel_impl=args.kernel_impl,
        density_k=args.density_k,
        sigma_clamp=cli_main_sigma_clamp(args),
    )


def _session(opts, rest):
    """Build an InferenceSession from --artifact/--checkpoint + model flags."""
    from lie_vae_tpu.cli import main as cli
    from lie_vae_tpu.serve import AotSession, InferenceSession

    if getattr(opts, "aot", None):
        # mesh sharding is baked into the artifact at export time
        # (export --aot --aot_data_devices N); --data_devices here only
        # cross-checks the expectation against what the artifact records
        sess = AotSession(opts.aot, seed=opts.seed)
        recorded = int(sess.meta.get("data_devices", 1))
        if opts.data_devices and opts.data_devices != recorded:
            raise SystemExit(
                f"--data_devices {opts.data_devices} does not match the "
                f"AOT artifact (exported for {recorded} device(s) on the "
                "'data' axis); re-export with --aot_data_devices "
                f"{opts.data_devices}")
        return sess
    args = cli.parse_args(rest)
    model = _build_model(args)
    mesh = None
    if opts.data_devices:
        from lie_vae_tpu.parallel import make_mesh
        mesh = make_mesh(n_data=opts.data_devices)
    if opts.artifact:
        return InferenceSession.from_npz(
            opts.artifact, model, batch_size=opts.batch_size, seed=opts.seed,
            mesh=mesh)
    if getattr(opts, "torch", None):
        return InferenceSession.from_torch(
            opts.torch, model, batch_size=opts.batch_size, seed=opts.seed,
            mesh=mesh)
    path = opts.checkpoint or (args.name and
                               os.path.join("outputs", args.name,
                                            "checkpoint"))
    if not path:
        raise SystemExit("pass --artifact, --torch, --checkpoint, or --name")
    return InferenceSession.from_checkpoint(
        path, model, batch_size=opts.batch_size, seed=opts.seed, mesh=mesh)


def _add_session_flags(p):
    p.add_argument("--artifact", help=".npz deployment artifact (export)")
    p.add_argument("--aot", help="AOT artifact (export --aot): serves "
                                 "without model flags or model code")
    p.add_argument("--checkpoint", help="orbax checkpoint directory")
    p.add_argument("--torch", help="PyTorch reference checkpoint "
                                   "(state_dict pickle) to serve directly")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", help="output .npz path")
    p.add_argument("--data_devices", type=int, default=0,
                   help="shard each compiled batch over this many devices "
                        "('data' mesh axis); 0 = single-device serving")


def _save_png_grid(images, path):
    """Best-effort PNG contact sheet next to the .npz (images NHWC/NHW)."""
    try:
        from PIL import Image
    except ImportError:
        return None
    imgs = np.asarray(images)
    # images are NHWC everywhere in this repo; toy spectra are (N, dims,
    # copies) with no channel axis — skip those rather than render noise
    if imgs.ndim != 4:
        return None
    n, h, w, c = imgs.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = imgs[i]
    grid = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    if c == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
    return path


def cmd_export(argv):
    from lie_vae_tpu.serve import export_npz, export_npz_from_torch

    p = argparse.ArgumentParser("serve export")
    p.add_argument("--name", help="run name under outputs/")
    p.add_argument("--checkpoint", help="explicit orbax checkpoint dir")
    p.add_argument("--torch", help="PyTorch reference checkpoint "
                                   "(state_dict pickle) to convert; pass "
                                   "the run's model flags after it")
    p.add_argument("--to_torch", metavar="PICKLE",
                   help="export the orbax checkpoint as a PyTorch "
                        "reference state_dict instead (loadable by the "
                        "reference with strict=True); pass the run's "
                        "model flags after it")
    p.add_argument("--aot", action="store_true",
                   help="export an ahead-of-time artifact: weights + "
                        "StableHLO serving programs (jax.export) — "
                        "serve it with --aot and no model flags; pass "
                        "the run's model flags after it")
    p.add_argument("--aot_batch", type=int, default=64,
                   help="fixed batch size baked into the AOT programs")
    p.add_argument("--aot_data_devices", type=int, default=0,
                   help="export the AOT programs SPMD-sharded over this "
                        "many devices ('data' mesh axis; the batch must "
                        "divide evenly); serving then requires the same "
                        "device count. 0 = single-device programs")
    p.add_argument("--out", help="output .npz (default <run>/artifact.npz)")
    opts, rest = p.parse_known_args(argv)
    if opts.torch:
        from lie_vae_tpu.cli import main as cli
        out = opts.out or os.path.splitext(opts.torch)[0] + ".npz"
        export_npz_from_torch(opts.torch, _build_model(cli.parse_args(rest)),
                              out)
        print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")
        return out
    if rest and not (opts.to_torch or opts.aot):
        raise SystemExit(f"unknown arguments {rest} (model flags are only "
                         "meaningful with --torch/--to_torch/--aot)")
    ckpt = opts.checkpoint or (opts.name and
                               os.path.join("outputs", opts.name,
                                            "checkpoint"))
    if not ckpt:
        raise SystemExit("pass --name, --checkpoint, or --torch")
    if opts.to_torch:
        from lie_vae_tpu.cli import main as cli
        from lie_vae_tpu.compat import save_torch_checkpoint
        from lie_vae_tpu.serve import load_checkpoint_arrays
        params, batch_stats, _ = load_checkpoint_arrays(ckpt)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        save_torch_checkpoint(opts.to_torch, variables,
                              _build_model(cli.parse_args(rest)))
        print(f"wrote {opts.to_torch} "
              f"({os.path.getsize(opts.to_torch) / 1e6:.1f} MB)")
        return opts.to_torch
    if opts.aot:
        from lie_vae_tpu.cli import main as cli
        from lie_vae_tpu.serve import export_aot
        out = opts.out or os.path.join(os.path.dirname(ckpt.rstrip("/")),
                                       "artifact_aot.npz")
        mesh = None
        if opts.aot_data_devices:
            from lie_vae_tpu.parallel import make_mesh
            mesh = make_mesh(n_data=opts.aot_data_devices, n_model=1)
        export_aot(ckpt, _build_model(cli.parse_args(rest)), out,
                   batch_size=opts.aot_batch, mesh=mesh)
        print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")
        return out
    out = opts.out or os.path.join(os.path.dirname(ckpt.rstrip("/")),
                                   "artifact.npz")
    export_npz(ckpt, out)
    size = os.path.getsize(out)
    print(f"wrote {out} ({size / 1e6:.1f} MB)")
    return out


def cmd_sample(argv):
    p = argparse.ArgumentParser("serve sample")
    _add_session_flags(p)
    p.add_argument("-n", type=int, default=16, help="number of samples")
    opts, rest = p.parse_known_args(argv)
    sess = _session(opts, rest)
    imgs = sess.sample(opts.n, seed=opts.seed)
    out = opts.out or "samples.npz"
    np.savez(out, images=imgs)
    png = _save_png_grid(imgs, os.path.splitext(out)[0] + ".png")
    print(f"wrote {out}" + (f" and {png}" if png else ""))
    return out


def cmd_trajectory(argv):
    p = argparse.ArgumentParser("serve trajectory")
    _add_session_flags(p)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--images", nargs=2, metavar="PNG",
                   help="two image files to encode as the endpoints "
                        "(default: two random prior poses)")
    opts, rest = p.parse_known_args(argv)
    sess = _session(opts, rest)
    if opts.images:
        from PIL import Image
        if len(sess.model.out_shape) != 3:
            raise SystemExit("--images requires an image model "
                             f"(out_shape {sess.model.out_shape})")
        h, w, c = sess.model.out_shape
        mode = "RGB" if c == 3 else "L"
        x = np.stack([
            np.asarray(Image.open(f).convert(mode).resize((w, h)),
                       np.float32) / 255.0
            for f in opts.images])
        if c == 1:
            x = x[..., None]
        poses = sess.encode(x)["pose"]
        a, b = poses[0], poses[1]
    else:
        import jax
        from lie_vae_tpu import ops
        mode = sess.model.latent_mode
        key = jax.random.PRNGKey(opts.seed)
        if mode == "so3":
            a, b = np.asarray(ops.random_group_matrices(key, 2))
        elif mode in ("vmf", "vmfq"):
            a, b = np.asarray(ops.random_quaternions(key, 2))
        else:
            a, b = np.asarray(jax.random.normal(
                key, (2, sess.model.normal_dims)))
    frames = sess.geodesic(a, b, steps=opts.steps)
    out = opts.out or "trajectory.npz"
    np.savez(out, frames=frames, pose_a=a, pose_b=b)
    png = _save_png_grid(frames, os.path.splitext(out)[0] + ".png")
    print(f"wrote {out}" + (f" and {png}" if png else ""))
    return out


def cmd_bench(argv):
    p = argparse.ArgumentParser("serve bench")
    _add_session_flags(p)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--stream_chunks", type=int, default=32,
                   help="chunks per streamed request in the throughput "
                        "measurement (0 disables it)")
    p.add_argument("--chip_scan", type=int, default=0,
                   help="K-step scan length for the pure chip-rate "
                        "measurement (0 disables it; use >=128 on TPU)")
    opts, rest = p.parse_known_args(argv)
    sess = _session(opts, rest)
    b = sess.batch_size
    x = np.random.default_rng(0).random(
        (b,) + tuple(sess.model.out_shape), np.float32)
    sess.warmup()
    result = {"batch_size": b, "iters": opts.iters}
    for name, fn in [("encode", lambda: sess.encode(x)),
                     ("reconstruct", lambda: sess.reconstruct(x))]:
        fn()                                     # one extra settle pass
        # outputs are host numpy (serve._chunked np.asarray's every chunk)
        # so wall-clock here includes the full device round trip — no
        # block_until_ready needed (which the axon tunnel ignores anyway,
        # CLAUDE.md).
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            fn()
        dt = (time.perf_counter() - t0) / opts.iters
        result[name] = {"ms_per_batch": round(dt * 1e3, 3),
                        "items_per_s": round(b / dt, 1)}
    if opts.stream_chunks:
        # Throughput mode: one request of stream_chunks batches. _chunked
        # dispatches every chunk before converting any output to host
        # numpy, so async dispatch pipelines the chunks and the per-batch
        # round-trip latency above is paid once, not per chunk.
        n = b * opts.stream_chunks
        xs = np.random.default_rng(1).random(
            (n,) + tuple(sess.model.out_shape), np.float32)
        sess.encode(xs)                          # settle/compile
        t0 = time.perf_counter()
        sess.encode(xs)
        dt = time.perf_counter() - t0
        result["encode_stream"] = {"items": n,
                                   "items_per_s": round(n / dt, 1)}
    if opts.chip_scan:
        # Chip-rate mode: pure device compute per batch, dispatch and host
        # transfer amortized away by a K-step scan whose carry perturbs
        # the input (so XLA can neither hoist nor dead-code the model).
        # On this image's tunneled runtime the wall figures above measure
        # the relay, not the TPU — this is the hardware serving rate.
        import jax
        import jax.numpy as jnp

        def chip_ms(pure_fn, needs_key):
            def run(params, bn, xb, key):
                def body(c, _):
                    args = (params, bn, xb + c) + ((key,) if needs_key
                                                  else ())
                    out = pure_fn(*args)
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree_util.tree_leaves(out))
                    return (s * 1e-30).astype(xb.dtype), s
                _, outs = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), None,
                    length=opts.chip_scan)
                return outs

            jf = jax.jit(run)
            key = jax.random.PRNGKey(0)
            xb = jnp.asarray(x)
            float(jf(sess.params, sess.batch_stats, xb, key)[-1])  # compile
            t0 = time.perf_counter()
            o = jf(sess.params, sess.batch_stats, xb, key)
            float(o[-1])                                  # true queue drain
            return (time.perf_counter() - t0) / opts.chip_scan * 1e3

        for name, needs_key in [("encode", True), ("reconstruct", True)]:
            ms = chip_ms(sess.pure_fns[name], needs_key)
            result[name]["chip_ms_per_batch"] = round(ms, 3)
            result[name]["chip_items_per_s"] = round(b / ms * 1e3, 1)
    print(json.dumps(result))
    return result


def cmd_http(argv):
    """Network serving: HTTP endpoint over the pre-compiled session
    (lie_vae_tpu.serve_http — npz + JSON wire formats, /v1/encode|decode|
    reconstruct|sample|geodesic, GET /healthz)."""
    from lie_vae_tpu import serve_http

    p = argparse.ArgumentParser("serve http")
    _add_session_flags(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8310)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling the serving surface at startup "
                        "(first requests pay the compile)")
    opts, rest = p.parse_known_args(argv)
    sess = _session(opts, rest)
    return serve_http.serve(sess, host=opts.host, port=opts.port,
                            warmup=not opts.no_warmup)


COMMANDS = {"export": cmd_export, "sample": cmd_sample,
            "trajectory": cmd_trajectory, "bench": cmd_bench,
            "http": cmd_http}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in COMMANDS:
        raise SystemExit(
            f"usage: python -m lie_vae_tpu.cli.serve "
            f"{{{','.join(COMMANDS)}}} ...")
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    main()
