"""Analysis tool tests (reference: toy_results.ipynb diagnostics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lie_vae_tpu import analysis, ops
from lie_vae_tpu.data import ToyDataset
from lie_vae_tpu.models import LieVAE


def test_circle_trajectory_properties():
    traj = analysis.circle_trajectory(8, axis=(0, 0, 1))
    assert traj.shape == (8, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), traj.shape)
    np.testing.assert_allclose(traj @ jnp.swapaxes(traj, -1, -2), eye,
                               atol=1e-6)
    # quarter turn about z
    np.testing.assert_allclose(
        np.asarray(traj[2]),
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)


def test_random_walk_trajectory(key):
    traj = analysis.random_walk_trajectory(key, 50, step=0.1)
    assert traj.shape == (50, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), traj.shape)
    np.testing.assert_allclose(traj @ jnp.swapaxes(traj, -1, -2), eye,
                               atol=1e-5)
    # consecutive steps are close (small step size)
    d = np.asarray(jnp.linalg.norm(traj[1:] - traj[:-1], axis=(-2, -1)))
    assert d.max() < 1.0


def test_discontinuity_metric_detects_jump():
    smooth = np.cumsum(np.full((100, 3), 0.01), axis=0)
    jumps, s = analysis.discontinuity_score(smooth)
    assert s["num_outliers"] == 0
    broken = smooth.copy()
    broken[50:] += 5.0
    _, s2 = analysis.discontinuity_score(broken)
    assert s2["num_outliers"] >= 1
    assert s2["max"] > 10 * s["max"]


def test_pca_shapes(key):
    x = np.asarray(jax.random.normal(key, (40, 7)))
    proj, comp = analysis.pca(x, 2)
    assert proj.shape == (40, 2)
    assert comp.shape == (2, 7)
    # components orthonormal
    np.testing.assert_allclose(comp @ comp.T, np.eye(2), atol=1e-10)


def test_encode_and_recon_tools(key):
    ds = ToyDataset.generate(n=32, degrees=2, rep_copies=3)
    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   encode_mode="toy", deconv_mode="toy", mean_mode="alg",
                   degrees=2, rep_copies=3, deterministic=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(ds.x[:2]))
    enc = analysis.encode_dataset(model, variables, ds.x)
    assert enc.shape == (32, 9)           # flattened 3x3 encodings
    err = analysis.reconstruction_error(model, variables, ds.x)
    assert np.isfinite(err)

    traj = analysis.circle_trajectory(16)
    xs = analysis.toy_inputs_for_trajectory(traj, ds.harmonics, 2)
    assert xs.shape == (16, 9, 3)
    enc_t = analysis.encode_dataset(model, variables, np.asarray(xs))
    jumps, summary = analysis.discontinuity_score(enc_t)
    assert jumps.shape == (15,)
    assert np.isfinite(summary["mean"])


def test_encodings_to_group_matrices(key):
    k1, k2 = jax.random.split(key)
    r = ops.random_group_matrices(k1, 6)
    # so3: flattened matrices pass through
    out = analysis.encodings_to_group_matrices(
        np.asarray(r).reshape(6, 9), "so3")
    np.testing.assert_allclose(np.asarray(out), np.asarray(r), atol=1e-6)
    # vmfq: quaternion chart
    q = ops.random_quaternions(k2, 6)
    out = analysis.encodings_to_group_matrices(q, "vmfq")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ops.quaternions_to_group_matrix(q)),
                               atol=1e-6)
    # normal(3): tanh-squashed Euler chart lands on SO(3)
    v = np.asarray(jax.random.normal(k2, (6, 3)))
    out = np.asarray(analysis.encodings_to_group_matrices(v, "normal"))
    eye = np.broadcast_to(np.eye(3), out.shape)
    np.testing.assert_allclose(out @ np.swapaxes(out, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)
    # 'vmf' has no rotation interpretation (the model MLP-decodes the S^3
    # latent directly) — must refuse loudly, pointing at 'vmfq'
    with pytest.raises(ValueError, match="vmfq"):
        analysis.encodings_to_group_matrices(np.zeros((5, 4)), "vmf")


def test_render_encoded_poses_alignment(key):
    traj = np.asarray(analysis.circle_trajectory(5))
    base = np.asarray(ops.random_group_matrices(key, 1))[0]
    imgs = analysis.render_encoded_poses(traj, size=32)
    assert imgs.shape == (5, 32, 32, 3)
    assert np.isfinite(imgs).all() and imgs.max() <= 1.0
    # alignment: first frame must equal a direct render of the base pose
    aligned = analysis.render_encoded_poses(traj, size=32, align_to=base)
    from lie_vae_tpu.data.render import render_spherecube
    np.testing.assert_allclose(aligned[0], render_spherecube(base, size=32),
                               atol=1e-4)
