"""Analysis tools: latent-space trajectories, the encoder-discontinuity
metric, and PCA scatter — the programmatic equivalent of the reference's
results notebook (toy_results.ipynb: 'circle'/'random_walk' trajectory
generators and the ``discontinuities`` per-step encoding-jump metric,
cells 3, 11-14).

All functions are pure and framework-level; scripts/analyze_toy.py shows the
full evaluation flow (train -> encode trajectories -> metrics -> figures).
"""
import jax
import jax.numpy as jnp
import numpy as np

from lie_vae_tpu import ops


def circle_trajectory(n, axis=(0.0, 0.0, 1.0), start=None):
    """n rotations sweeping a full turn about ``axis``, starting at
    ``start`` (identity by default). Returns (n, 3, 3).

    Notebook equivalent: the 'circle' trajectory (toy_results.ipynb cell 3).
    """
    axis = np.asarray(axis, dtype=np.float32)
    axis = axis / np.linalg.norm(axis)
    angles = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False,
                         dtype=np.float32)
    vs = angles[:, None] * axis[None, :]
    g = ops.expmap(jnp.asarray(vs))
    if start is not None:
        g = jnp.asarray(start) @ g
    return g


def random_walk_trajectory(key, n, step=0.1, start=None):
    """Random walk on SO(3): g_{t+1} = g_t exp(eps), eps ~ N(0, step^2).

    Notebook equivalent: the 'random_walk' trajectory (cell 3).
    """
    eps = jax.random.normal(key, (n, 3)) * step
    increments = ops.expmap(eps)

    def body(g, inc):
        g = g @ inc
        return g, g

    g0 = jnp.eye(3) if start is None else jnp.asarray(start)
    _, traj = jax.lax.scan(body, g0, increments)
    return traj


def toy_inputs_for_trajectory(traj, harmonics, degrees):
    """Render toy observations x = W(g) @ harmonics along a trajectory."""
    angles = ops.group_matrix_to_eazyz(traj)
    return ops.block_wigner_matrix_multiply(
        angles, jnp.asarray(harmonics), degrees)


def encode_dataset(model, variables, xs, batch_size=256):
    """Mean-path encodings (first reparameterizer) for an array of inputs;
    returns flattened (N, D) numpy. The model is cloned with
    deterministic=True so stochastic configs contribute their posterior
    means, not one noisy sample (sampling noise would pollute the
    discontinuity statistics)."""
    model = model.clone(deterministic=True)

    # jitted with variables as an ARGUMENT (axon rule: eager dispatch is
    # seconds per op through the tunnel, and closed-over params miscompile
    # — see CLAUDE.md); one compile per distinct batch shape (the tail)
    @jax.jit
    def _encode(variables, x):
        stats = model.apply(variables, x, n=1, train=False,
                            method="encode",
                            rngs={"sample": jax.random.PRNGKey(0)})
        return stats[0].z[0]

    outs = []
    for i in range(0, len(xs), batch_size):
        z = np.asarray(_encode(variables, jnp.asarray(xs[i:i + batch_size])))
        outs.append(z.reshape(z.shape[0], -1))
    return np.concatenate(outs, 0)


def discontinuity_score(encodings):
    """Per-step squared encoding jumps along a trajectory: the notebook's
    ``discontinuities`` metric (cells 3 + 14). Returns (jumps, summary dict).
    """
    e = np.asarray(encodings)
    e = e.reshape(e.shape[0], -1)
    jumps = np.sum((e[1:] - e[:-1]) ** 2, axis=-1)
    return jumps, {
        "mean": float(jumps.mean()),
        "max": float(jumps.max()),
        # a discontinuity shows up as a jump orders of magnitude above the
        # median step; count >10x-median outliers
        "num_outliers": int((jumps > 10.0 * np.median(jumps)).sum()),
    }


def encodings_to_group_matrices(encodings, latent_mode):
    """Interpret flattened mean-path encodings as rotation matrices, per
    latent mode — the conversions the reference notebook applies before
    rendering encoded poses (toy_results.ipynb cell 13): 'so3' encodings
    are already matrices; 'vmfq' S^3 encodings map through the quaternion
    chart; 3-dim 'normal' encodings map through the tanh-squashed ZYZ
    Euler chart (vector_to_eazyz, the same chart the action decoder uses).
    Returns (N, 3, 3).
    """
    e = jnp.asarray(encodings)
    if latent_mode == "so3":
        return e.reshape(-1, 3, 3)
    if latent_mode == "vmfq":
        # 'vmf' is deliberately excluded: that mode's S^3 latent never
        # passes through the quaternion chart in the model (it is
        # MLP-decoded directly), so a quaternion reading here would
        # render poses the decoder never sees
        return ops.quaternions_to_group_matrix(e.reshape(-1, 4))
    if latent_mode == "normal":
        if e.shape[-1] != 3:
            raise ValueError(
                "only 3-dim normal latents have a rotation interpretation")
        return ops.eazyz_to_group_matrix(ops.vector_to_eazyz(e))
    if latent_mode == "vmf":
        raise ValueError(
            "latent_mode='vmf' encodings have no rotation interpretation "
            "(the model MLP-decodes the S^3 latent directly); use 'vmfq'")
    raise ValueError(f"unknown latent_mode {latent_mode!r}")


def render_encoded_poses(rotations, size=64, align_to=None, style="v1"):
    """Render the sphere-cube at the poses an encoder assigns along a
    trajectory — the native equivalent of the reference notebook's
    Blender ``render_axes`` strips (toy_results.ipynb cell 13), using the
    in-repo ray-caster instead of a Blender subprocess.

    ``align_to`` (a (3, 3) rotation) left-aligns the strip so its first
    pose equals ``align_to`` — the notebook aligns every model's strip to
    a common base pose before comparing. Returns (N, size, size, 3).
    """
    from lie_vae_tpu.data.render import render_spherecube

    R = np.asarray(rotations, dtype=np.float32).reshape(-1, 3, 3)
    if align_to is not None:
        d = np.asarray(align_to, dtype=np.float32) @ R[0].T
        R = d[None] @ R
    return render_spherecube(R, size=size, style=style)


def pca(x, n_components=2):
    """SVD-based PCA; returns (projections (N, k), components (k, D))."""
    x = np.asarray(x, dtype=np.float64)
    x = x - x.mean(0, keepdims=True)
    u, s, vt = np.linalg.svd(x, full_matrices=False)
    return (u[:, :n_components] * s[:n_components],
            vt[:n_components])


def reconstruction_error(model, variables, xs, batch_size=256):
    """Mean per-example recon loss under the deterministic (mean) path —
    the model is cloned with deterministic=True so stochastic configs are
    evaluated at their posterior means."""
    model = model.clone(deterministic=True)

    @jax.jit
    def _recon_err(variables, x):
        (x_recon, _) = model.apply(
            variables, x, n=1, train=False,
            rngs={"sample": jax.random.PRNGKey(0)})
        return model.recon_loss(x_recon, x)

    errs = []
    for i in range(0, len(xs), batch_size):
        x = jnp.asarray(xs[i:i + batch_size])
        errs.append(np.asarray(_recon_err(variables, x)).reshape(-1))
    return float(np.mean(np.concatenate(errs)))
