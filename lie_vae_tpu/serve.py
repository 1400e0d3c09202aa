"""Serving / inference surface: load a trained checkpoint and run
fixed-shape, pre-compiled encode / decode / reconstruct on device.

The reference has no serving story — its post-training inference is
notebook code that rebuilds the training module and calls it eagerly per
item (toy_results.ipynb cells 3-14) plus a batch-size-1 eval loop for the
final LL (lie_vae/experiments/main.py:134-143). Here inference is a
first-class production path, designed TPU-first:

- every callable is jit-compiled once at a fixed batch shape and reused
  (no per-shape retraces; arbitrary request sizes are padded to the
  compiled batch and sliced back on host);
- params / batch_stats are passed as jit ARGUMENTS, never closed over
  (closing over large constants is both a retrace hazard and, on this
  image's tunneled runtime, a known wrong-output compile path — see
  CLAUDE.md);
- ``warmup()`` pre-compiles the full surface so the first real request
  pays dispatch latency only;
- ``export_npz`` / ``load_npz`` turn an orbax training checkpoint into a
  single self-contained deployment artifact (no orbax dependency at
  serving time).

Typical use::

    model = LieVAE(latent_mode="so3", mean_mode="alg", ...)
    sess = InferenceSession.from_checkpoint("outputs/run/checkpoint", model)
    sess.warmup()
    poses = sess.encode(images)["pose"]          # (N, 3, 3) rotations
    frames = sess.geodesic(poses[0], poses[1], steps=30)  # latent traversal
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lie_vae_tpu import ops

_SEP = "/"


# Pose math used by the serving surface, jitted once: on this image's
# tunneled runtime every eager op is a remote compile/dispatch (seconds,
# CLAUDE.md), so even a handful of small ops must compile as one program.
@jax.jit
def _geodesic_so3(a, b, t):
    v = ops.vee(ops.logmap(jnp.swapaxes(a, -1, -2) @ b))
    return jax.vmap(lambda s: a @ ops.expmap(s * v))(t)


_haar_matrices = jax.jit(ops.random_group_matrices, static_argnums=1)
_haar_quaternions = jax.jit(ops.random_quaternions, static_argnums=1)
_normal_prior = jax.jit(lambda key, n, d: jax.random.normal(key, (n, d)),
                        static_argnums=(1, 2))


# --------------------------------------------------------------- checkpoints

def load_checkpoint_arrays(path):
    """Restore a training checkpoint WITHOUT a template TrainState.

    Returns ``(params, batch_stats, step)`` as plain nested dicts /
    numpy-backed arrays. The optimizer state (whose tree structure depends
    on the training flags: clip / selective clip / weight decay) is left
    untouched on disk — serving never needs it.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        restored = ckptr.restore(path)
    finally:
        ckptr.close()
    return (restored["params"], restored.get("batch_stats") or {},
            int(np.asarray(restored.get("step", 0))))


def _flatten(tree, prefix):
    from flax import traverse_util

    if not jax.tree_util.tree_leaves(tree):
        return {}
    return {prefix + _SEP + k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(tree, sep=_SEP).items()}


def _unflatten(flat, prefix):
    from flax import traverse_util

    sub = {k[len(prefix) + 1:]: jnp.asarray(v) for k, v in flat.items()
           if k.startswith(prefix + _SEP)}
    return traverse_util.unflatten_dict(sub, sep=_SEP)


def export_npz(checkpoint_path, out_path):
    """Flatten an orbax checkpoint's params + batch_stats into one .npz
    deployment artifact (path-encoded keys; loadable without orbax)."""
    params, batch_stats, step = load_checkpoint_arrays(checkpoint_path)
    flat = _flatten(params, "params")
    flat.update(_flatten(batch_stats, "batch_stats"))
    flat["__step__"] = np.asarray(step)
    np.savez(out_path, **flat)
    return out_path


def export_npz_from_torch(torch_path, model, out_path):
    """Like :func:`export_npz`, but sourced from a PyTorch reference
    checkpoint (``torch.save``'d state_dict, the reference's
    ``model.pickle``, main.py:122-127) — one-command migration of an
    existing reference run into a TPU deployment artifact."""
    from lie_vae_tpu.compat import load_torch_checkpoint

    variables = load_torch_checkpoint(torch_path, model)
    flat = _flatten(variables["params"], "params")
    flat.update(_flatten(variables.get("batch_stats", {}), "batch_stats"))
    flat["__step__"] = np.asarray(0)
    np.savez(out_path, **flat)
    return out_path


def load_npz(path):
    """Inverse of :func:`export_npz`: returns (params, batch_stats, step)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("__step__", 0))
    return _unflatten(flat, "params"), _unflatten(flat, "batch_stats"), step


# --------------------------------------------------------------- AOT export

def export_aot(checkpoint_path, model, out_path, batch_size=64,
               platforms=("tpu", "cpu"), mesh=None):
    """Ahead-of-time serving artifact: weights + the three serving
    programs (encode / decode / reconstruct) serialized as version-stable
    StableHLO via ``jax.export`` — loadable and runnable WITHOUT the
    model code (no flax, no lie_vae_tpu.models, no tracing at serving
    time; see :class:`AotSession`).

    The programs take (params, batch_stats, batch[, key]) as arguments —
    weights are never baked in as constants (besides keeping the artifact
    hot-swappable, closing over big constants is miscompiled on this
    image's TPU runtime, see CLAUDE.md). Shapes are fixed at
    ``batch_size`` rows, matching the session's padded-chunk dispatch.

    ``platforms``: lowering targets recorded in the artifact (default
    TPU + CPU — one artifact serves both; the export itself can run on
    either platform).

    ``mesh``: optional ``('data', 'model')`` mesh — the exported programs
    are then SPMD over the mesh's ``data`` axis (params replicated, each
    compiled batch split across devices; jax.export records the GSPMD
    shardings in the StableHLO). The artifact must then be served on the
    SAME device count (``AotSession`` rebuilds the mesh from the
    artifact's recorded ``data_devices``); exporting on N virtual CPU
    devices and serving on an N-chip TPU slice is supported —
    jax.export shardings are device-count-, not platform-, specific.
    """
    import json

    from jax import export as jexport

    params, batch_stats, _ = load_checkpoint_arrays(checkpoint_path)
    sess = InferenceSession(model, params, batch_stats,
                            batch_size=batch_size, mesh=mesh)
    b = int(batch_size)
    pose_dims = {"so3": (3, 3), "normal": (model.normal_dims,),
                 "vmf": (4,), "vmfq": (4,)}[model.latent_mode]
    struct = functools.partial(jax.tree_util.tree_map,
                               lambda a: jax.ShapeDtypeStruct(
                                   np.shape(a), np.asarray(a).dtype))
    p_s, bs_s = struct(sess.params), struct(sess.batch_stats)
    x_s = jax.ShapeDtypeStruct((b,) + tuple(model.out_shape), jnp.float32)
    z_s = jax.ShapeDtypeStruct((b,) + pose_dims, jnp.float32)
    key_s = struct(np.asarray(jax.random.PRNGKey(0)))

    flat = _flatten(sess.params, "params")
    flat.update(_flatten(sess.batch_stats, "batch_stats"))
    specs = {"encode": (p_s, bs_s, x_s, key_s),
             "decode": (p_s, bs_s, z_s),
             "reconstruct": (p_s, bs_s, x_s, key_s)}
    # export the session's OWN jitted callables: with a mesh they carry
    # the replicated/batch-sharded in/out shardings, so the exported
    # StableHLO is the same SPMD program live serving runs
    jitted = {"encode": sess._encode_jit, "decode": sess._decode_jit,
              "reconstruct": sess._recon_jit}
    for name, args in specs.items():
        exp = jexport.export(jitted[name],
                             platforms=list(platforms))(*args)
        flat[f"__aot_{name}__"] = np.frombuffer(exp.serialize(), np.uint8)
    n_data = (dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
              if mesh is not None else 1)
    meta = {"latent_mode": model.latent_mode,
            "normal_dims": model.normal_dims,
            "out_shape": list(model.out_shape),
            "batch_size": b, "platforms": list(platforms),
            "data_devices": n_data,
            "jax_version": jax.__version__}
    flat["__aot_meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                         np.uint8)
    np.savez(out_path, **flat)
    return out_path


# ----------------------------------------------------------------- session

class InferenceSession:
    """Fixed-shape, pre-compiled inference over a trained :class:`LieVAE`.

    All public methods take/return numpy arrays of arbitrary leading size
    N; work is dispatched in compiled chunks of ``batch_size`` (requests
    are padded by repeating the last row and sliced back). The latent
    "pose" representation matches the model's latent_mode: (3, 3) rotation
    matrices for 'so3', a ``normal_dims`` vector for 'normal', and a unit
    quaternion for 'vmf'/'vmfq' — exactly what :meth:`LieVAE.decode`
    consumes (vae.py:173-197 routing).
    """

    def __init__(self, model, params, batch_stats=None, batch_size=64,
                 seed=0, mesh=None):
        """``mesh``: optional :class:`jax.sharding.Mesh` with a ``data``
        axis — serving data parallelism. Params/batch_stats are replicated
        on every device, each compiled batch is split over the ``data``
        axis, and XLA GSPMD runs the chunk as one SPMD program over ICI
        (the serving mirror of the training mesh, parallel/mesh.py).
        ``batch_size`` must divide evenly over the data axis."""
        self.model = model
        self.mesh = mesh
        self.batch_size = int(batch_size)
        self._key = jax.random.PRNGKey(seed)
        self._has_bn = bool(jax.tree_util.tree_leaves(batch_stats or {}))

        jit_kwargs = {}
        if mesh is not None:
            n_data = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
            assert self.batch_size % n_data == 0, (
                f"batch_size {self.batch_size} does not divide over the "
                f"mesh's data axis ({n_data} devices); pick a multiple")
            repl = NamedSharding(mesh, P())
            batched = NamedSharding(mesh, P("data"))
            params = jax.device_put(params, repl)
            batch_stats = jax.device_put(batch_stats or {}, repl)
            # (params, batch_stats, x[, key]) -> batch-sharded outputs;
            # shardings are pytree prefixes, so one spec covers each tree.
            jit_kwargs = dict(in_shardings=(repl, repl, batched, repl),
                              out_shardings=batched)
        self.params = params
        self.batch_stats = batch_stats or {}

        model_ref = model  # locals close over config only, never params

        def variables(params, batch_stats):
            v = {"params": params}
            if self._has_bn:
                v["batch_stats"] = batch_stats
            return v

        def encode_fn(params, batch_stats, x, key):
            stats = model_ref.apply(
                variables(params, batch_stats), x, n=1, train=False,
                method=model_ref.encode, rngs={"sample": key})
            s = stats[0]
            mean = getattr(s, "mu_lie", None)
            if mean is None:
                mean = s.mu
            if hasattr(s, "inner"):          # SO3: algebra-noise scale
                spread = s.inner.sigma
            elif hasattr(s, "kappa"):        # vMF: concentration
                spread = s.kappa
            else:                            # Gaussian: std-dev
                spread = s.sigma
            return mean, spread, s.z[0]

        def decode_fn(params, batch_stats, z):
            out = model_ref.apply(variables(params, batch_stats), z[None],
                                  method=model_ref.decode)
            return out[0]

        def recon_fn(params, batch_stats, x, key):
            mean, _, _ = encode_fn(params, batch_stats, x, key)
            return decode_fn(params, batch_stats, mean)

        # unjitted pure fns, exposed for custom harnesses (cli.serve bench
        # wraps them in a K-step scan to measure chip time w/o dispatch)
        self.pure_fns = {"encode": encode_fn, "decode": decode_fn,
                         "reconstruct": recon_fn}
        decode_kwargs = {}
        if jit_kwargs:
            decode_kwargs = dict(
                in_shardings=jit_kwargs["in_shardings"][:3],
                out_shardings=jit_kwargs["out_shardings"])
        self._encode_jit = jax.jit(encode_fn, **jit_kwargs)
        self._decode_jit = jax.jit(decode_fn, **decode_kwargs)
        self._recon_jit = jax.jit(recon_fn, **jit_kwargs)

    # ------------------------------------------------------------ plumbing

    @classmethod
    def from_checkpoint(cls, path, model, batch_size=64, seed=0, mesh=None):
        """Build a session from an orbax training checkpoint directory."""
        params, batch_stats, _ = load_checkpoint_arrays(path)
        return cls(model, params, batch_stats, batch_size=batch_size,
                   seed=seed, mesh=mesh)

    @classmethod
    def from_npz(cls, path, model, batch_size=64, seed=0, mesh=None):
        """Build a session from an :func:`export_npz` deployment artifact."""
        params, batch_stats, _ = load_npz(path)
        return cls(model, params, batch_stats, batch_size=batch_size,
                   seed=seed, mesh=mesh)

    @classmethod
    def from_torch(cls, path, model, batch_size=64, seed=0, mesh=None):
        """Serve a PyTorch reference checkpoint directly (state_dict
        pickle; see :mod:`lie_vae_tpu.compat`)."""
        from lie_vae_tpu.compat import load_torch_checkpoint

        variables = load_torch_checkpoint(path, model)
        return cls(model, variables["params"],
                   variables.get("batch_stats", {}), batch_size=batch_size,
                   seed=seed, mesh=mesh)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @staticmethod
    def _normalize(x):
        x = np.asarray(x)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        return x.astype(np.float32, copy=False)

    def _chunked(self, x, fn):
        """Pad N rows to full ``batch_size`` chunks, run the compiled fn
        per chunk, concat and slice back to N rows (single compiled shape
        regardless of request size). ``fn(chunk, i)`` gets the chunk
        index so callers can use independent RNG per chunk."""
        n = x.shape[0]
        if n == 0:
            raise ValueError("empty request (0 rows)")
        b = self.batch_size
        outs = []
        for i, lo in enumerate(range(0, n, b)):
            chunk = x[lo:lo + b]
            if chunk.shape[0] < b:
                pad = np.repeat(chunk[-1:], b - chunk.shape[0], axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            outs.append(fn(jnp.asarray(chunk), i))
        outs = [jax.tree_util.tree_map(np.asarray, o) for o in outs]
        return jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0)[:n], *outs)

    def _chunk_keys(self, n):
        """One independent key per chunk of an N-row request (a single
        split dispatch; per-chunk fold_in would pay a device round trip
        each on the tunneled runtime)."""
        n_chunks = max(1, -(-int(n) // self.batch_size))
        # host numpy: indexing keys[i] must not dispatch a device gather
        # per chunk on the tunneled runtime
        return np.asarray(jax.random.split(self._next_key(), n_chunks))

    # ------------------------------------------------------------- surface

    def encode(self, images):
        """Posterior pose estimates for N images.

        Returns ``{"pose": (N, ...) latent means, "sigma": (N, ...) noise
        scales, "sample": (N, ...) one posterior sample}``.
        """
        x = self._normalize(images)
        keys = self._chunk_keys(x.shape[0])
        out = self._chunked(
            x, lambda c, i: self._encode_jit(self.params, self.batch_stats,
                                             c, keys[i]))
        return {"pose": out[0], "sigma": out[1], "sample": out[2]}

    def decode(self, poses):
        """Decode N latent poses to images (or toy spectra)."""
        z = np.asarray(poses, np.float32)
        return self._chunked(
            z, lambda c, i: self._decode_jit(self.params, self.batch_stats,
                                             c))

    def reconstruct(self, images):
        """encode-mean -> decode round trip, the AE serving path."""
        x = self._normalize(images)
        keys = self._chunk_keys(x.shape[0])
        return self._chunked(
            x, lambda c, i: self._recon_jit(self.params, self.batch_stats,
                                            c, keys[i]))

    def sample(self, n, seed=None):
        """Decode n Haar-random prior poses — generative sampling.

        Only meaningful for group latents (the prior over SO(3) is the
        Haar measure the KL regularizes toward, reparameterize.py:265-267).
        """
        key = (jax.random.PRNGKey(seed) if seed is not None
               else self._next_key())
        mode = self.model.latent_mode
        if mode == "so3":
            z = _haar_matrices(key, n)
        elif mode in ("vmf", "vmfq"):
            z = _haar_quaternions(key, n)
        elif mode == "normal":
            z = _normal_prior(key, n, self.model.normal_dims)
        else:
            raise ValueError(f"Unknown latent mode {mode!r}")
        return self.decode(np.asarray(z))

    def geodesic(self, pose_a, pose_b, steps=16, decode=True):
        """Latent traversal along the geodesic from pose_a to pose_b.

        For SO(3): r(t) = a @ exp(t * log(a^T b)), the bi-invariant
        geodesic (the paper's latent-interpolation figure; notebook cell 3
        'circle' trajectories are the special case a^T b = z-rotation).
        For vector/quaternion latents: linear / slerp interpolation.
        Returns decoded frames (steps, *out_shape), or the poses
        themselves when ``decode=False``.
        """
        t = np.linspace(0.0, 1.0, steps, dtype=np.float32)
        mode = self.model.latent_mode
        if mode == "so3":
            poses = _geodesic_so3(jnp.asarray(pose_a, jnp.float32),
                                  jnp.asarray(pose_b, jnp.float32),
                                  jnp.asarray(t))
        elif mode in ("vmf", "vmfq"):
            qa = np.asarray(pose_a, np.float32)
            qb = np.asarray(pose_b, np.float32)
            qa = qa / np.linalg.norm(qa)
            qb = qb / np.linalg.norm(qb)
            if np.dot(qa, qb) < 0:    # shorter arc on the double cover
                qb = -qb
            dot = np.clip(np.dot(qa, qb), -1.0, 1.0)
            omega = np.arccos(dot)
            if omega < 1e-6:
                poses = np.repeat(qa[None], steps, axis=0)
            else:
                poses = (np.sin((1 - t)[:, None] * omega) * qa[None]
                         + np.sin(t[:, None] * omega) * qb[None]) \
                    / np.sin(omega)
        else:
            za = np.asarray(pose_a, np.float32)
            zb = np.asarray(pose_b, np.float32)
            poses = (1 - t)[:, None] * za[None] + t[:, None] * zb[None]
        poses = np.asarray(poses)
        return self.decode(poses) if decode else poses

    def warmup(self):
        """Compile the full serving surface at the fixed batch shape."""
        b = self.batch_size
        x = np.zeros((b,) + tuple(self.model.out_shape), np.float32)
        out = self.encode(x)
        self.decode(out["pose"])
        self.reconstruct(x)
        return self


class AotSession(InferenceSession):
    """Model-code-free serving over an :func:`export_aot` artifact.

    Deserializes the StableHLO serving programs and the weights from one
    .npz — no flax modules, no LieVAE construction, no model flags, no
    tracing at serving time (the programs were traced at export). Same
    public surface as :class:`InferenceSession` (encode / decode /
    reconstruct / sample / geodesic / warmup). Artifacts exported with a
    mesh (``export_aot(..., mesh=...)``) serve mesh-sharded: the session
    rebuilds a ``data`` mesh over the artifact's recorded device count
    and runs the recorded SPMD programs (params replicated, batches
    split over ICI) — the host must expose at least that many devices.
    """

    def __init__(self, path, seed=0):
        import json
        import types

        from jax import export as jexport

        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        meta = json.loads(bytes(flat.pop("__aot_meta__")).decode())
        blobs = {name: bytes(flat.pop(f"__aot_{name}__"))
                 for name in ("encode", "decode", "reconstruct")}
        flat.pop("__step__", None)
        self.params = _unflatten(flat, "params")
        self.batch_stats = _unflatten(flat, "batch_stats")
        self._has_bn = bool(jax.tree_util.tree_leaves(self.batch_stats))
        self.batch_size = int(meta["batch_size"])
        self._key = jax.random.PRNGKey(seed)
        self.model = types.SimpleNamespace(
            latent_mode=meta["latent_mode"],
            normal_dims=int(meta["normal_dims"]),
            out_shape=tuple(meta["out_shape"]))
        self.meta = meta

        self.mesh = None
        jit_kwargs = {"encode": {}, "decode": {}, "reconstruct": {}}
        n_data = int(meta.get("data_devices", 1))
        if n_data > 1:
            # mesh-sharded artifact: rebuild the serving mesh at the
            # exported device count; the deserialized programs carry the
            # GSPMD shardings, the outer jit places the arguments
            from lie_vae_tpu.parallel import make_mesh
            if len(jax.devices()) < n_data:
                raise RuntimeError(
                    f"AOT artifact was exported for {n_data} devices on "
                    f"the 'data' axis, host exposes {len(jax.devices())}")
            self.mesh = make_mesh(n_data=n_data, n_model=1,
                                  devices=jax.devices()[:n_data])
            repl = NamedSharding(self.mesh, P())
            batched = NamedSharding(self.mesh, P("data"))
            self.params = jax.device_put(self.params, repl)
            self.batch_stats = jax.device_put(self.batch_stats, repl)
            shard4 = dict(in_shardings=(repl, repl, batched, repl),
                          out_shardings=batched)
            jit_kwargs = {"encode": shard4, "reconstruct": shard4,
                          "decode": dict(in_shardings=(repl, repl, batched),
                                         out_shardings=batched)}
        # jit the deserialized calls so repeat dispatches reuse the
        # executable instead of re-staging the exported module
        calls = {name: jax.jit(jexport.deserialize(blob).call,
                               **jit_kwargs[name])
                 for name, blob in blobs.items()}
        self.pure_fns = calls
        self._encode_jit = calls["encode"]
        self._decode_jit = calls["decode"]
        self._recon_jit = calls["reconstruct"]
