"""Property tests for SO(3) ops, porting the reference's inline suite
(lie_vae/lie_tools.py:271-452) to pytest, plus totality/gradient tests the
reference lacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lie_vae_tpu import ops


def _random_rotations(key, n, dtype=jnp.float64):
    return ops.random_group_matrices(key, n, dtype=dtype)


def test_algebra_maps(key):
    # Reference: test_algebra_maps, lie_tools.py:271-278
    vs = jax.random.normal(key, (100, 3), dtype=jnp.float64)
    X = ops.hat(vs)
    vs2 = ops.vee(X)
    X2 = ops.hat(vs2)
    np.testing.assert_allclose(vs2, vs)
    np.testing.assert_allclose(X2, X)
    # skew-symmetry
    np.testing.assert_allclose(X, -jnp.swapaxes(X, -1, -2))


@pytest.mark.parametrize("scale,error", [(0.1, 1e-6), (10.0, 1e-6)])
def test_log_exp_roundtrip(key, scale, error):
    # Reference: test_log_exp, lie_tools.py:281-291
    v_start = jax.random.normal(key, (50, 3), dtype=jnp.float64) * scale
    R = ops.expmap(v_start)
    v = ops.vee(ops.logmap(R))
    R2 = ops.expmap(v)
    v2 = ops.vee(ops.logmap(R2))
    np.testing.assert_allclose(R2, R, rtol=error, atol=error)
    np.testing.assert_allclose(v2, v, rtol=error, atol=error)


def test_expmap_properties(key):
    v = jax.random.normal(key, (200, 3), dtype=jnp.float64)
    R = ops.expmap(v)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(R.shape[0]),
                               atol=1e-12)


def test_expmap_total_at_zero():
    # The reference rodrigues NaNs at v=0 (lie_tools.py:56-64); ours must not.
    v = jnp.zeros((4, 3), dtype=jnp.float64)
    R = ops.expmap(v)
    np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), R.shape),
                               atol=1e-15)
    # gradient at zero must be finite and equal the hat-map differential
    g = jax.jacobian(lambda x: ops.expmap(x))(jnp.zeros(3, jnp.float64))
    assert np.isfinite(np.asarray(g)).all()
    # d/dv_i exp(v) at 0 is the generator L_i
    basis = np.stack([np.asarray(ops.hat(e)) for e in np.eye(3)], -1)
    np.testing.assert_allclose(np.asarray(g), basis, atol=1e-7)


def test_expmap_grad_matches_fd(key):
    # Finite differences through an independent oracle (scipy expm) because
    # XLA CPU's float64 sin only has ~1e-8 accuracy, which a 1e-6 FD step
    # would amplify.
    from scipy.linalg import expm

    v0 = jax.random.normal(key, (3,), dtype=jnp.float64) * 0.5
    w = np.arange(9.0).reshape(3, 3)

    def f(v):
        return jnp.sum(ops.expmap(v) * w)

    def f_oracle(v):
        return float(np.sum(expm(np.asarray(ops.hat(v))) * w))

    g = jax.grad(f)(v0)
    eps = 1e-6
    fd = np.array([(f_oracle(v0 + eps * e) - f_oracle(v0 - eps * e)) / (2 * eps)
                   for e in np.eye(3)])
    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-7)


def test_coordinate_changes_roundtrip(key):
    # Reference: test_coordinate_changes, lie_tools.py:294-320 (oracle parts
    # replaced by round-trip + group-property checks; lie_learn's 'Q'->'MAT'
    # matches quaternions_to_group_matrix per the reference's own test).
    r = _random_rotations(key, 10000)
    q = ops.group_matrix_to_quaternions(r)
    r_back = ops.quaternions_to_group_matrix(q)
    np.testing.assert_allclose(r_back, r, rtol=1e-5, atol=1e-5)

    # random (unnormalized) quaternions map to valid rotations
    q_rand = jax.random.normal(key, (10000, 4), dtype=jnp.float64)
    r2 = ops.quaternions_to_group_matrix(q_rand)
    eye = jnp.broadcast_to(jnp.eye(3), r2.shape)
    np.testing.assert_allclose(r2 @ jnp.swapaxes(r2, -1, -2), eye, atol=1e-6)
    np.testing.assert_allclose(jnp.linalg.det(r2), jnp.ones(r2.shape[0]),
                               atol=1e-6)

    # double cover: mat->quat->mat is identity even though quat sign may flip
    q3 = ops.group_matrix_to_quaternions(r2)
    r3 = ops.quaternions_to_group_matrix(q3)
    np.testing.assert_allclose(r3, r2, rtol=1e-5, atol=1e-5)


def test_quaternion_euler_consistency(key):
    # angles extracted from q must reproduce the same rotation through the
    # Wigner l=1 path (checked in test_wigner.py) and be in expected ranges
    q = ops.random_quaternions(key, 1000, dtype=jnp.float64)
    ea = ops.quaternions_to_eazyz(q)
    assert ea.shape == (1000, 3)
    beta = np.asarray(ea[:, 1])
    assert (beta >= 0).all() and (beta <= np.pi).all()


def test_s2s1rodrigues(key):
    # Reference: test_s2s1rodrigues, lie_tools.py:396-414
    n = 10000
    k1, k2 = jax.random.split(key)
    s2 = jax.random.normal(k1, (n, 3), dtype=jnp.float64)
    s2 = s2 / jnp.linalg.norm(s2, axis=-1, keepdims=True)
    s1 = jax.random.normal(k2, (n, 2), dtype=jnp.float64)
    s1 = s1 / jnp.linalg.norm(s1, axis=-1, keepdims=True)
    R = ops.s2s1rodrigues(s2, s1)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-10)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(n), atol=1e-10)


def test_s2s2_gram_schmidt(key):
    # Reference: test_s2s2_gram_schmidt, lie_tools.py:417-425
    k1, k2 = jax.random.split(key)
    v1 = jax.random.uniform(k1, (10000, 3), dtype=jnp.float64)
    v2 = jax.random.uniform(k2, (10000, 3), dtype=jnp.float64)
    R = ops.s2s2_gram_schmidt(v1, v2)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(10000),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye,
                               rtol=1e-6, atol=1e-6)


def test_vector_to_eazyz_ranges(key):
    v = jax.random.normal(key, (1000, 3), dtype=jnp.float64) * 5
    ea = np.asarray(ops.vector_to_eazyz(v))
    assert (np.abs(ea[:, 0]) <= np.pi).all()
    assert (ea[:, 1] >= 0).all() and (ea[:, 1] <= np.pi).all()
    assert (np.abs(ea[:, 2]) <= np.pi).all()


def test_random_quaternions_haar(key):
    q = np.asarray(ops.random_quaternions(key, 50000, dtype=jnp.float64))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
    # Haar measure => components are symmetric around 0 with var 1/4
    assert np.abs(q.mean(0)).max() < 0.02
    np.testing.assert_allclose(q.var(0), 0.25, atol=0.01)


def test_group_matrix_to_quaternions_grad(key):
    r = _random_rotations(key, 8)

    def f(r):
        return jnp.sum(ops.group_matrix_to_quaternions(r) ** 2)

    g = jax.grad(f)(r)
    assert np.isfinite(np.asarray(g)).all()


def test_jit_compatibility(key):
    v = jax.random.normal(key, (16, 3), dtype=jnp.float32)
    out = jax.jit(lambda x: ops.group_matrix_to_eazyz(ops.expmap(x)))(v)
    assert out.shape == (16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_logmap_total_at_antipode(key):
    """The reference's log_map NaNs at theta = pi (R - R^T = 0,
    lie_tools.py:100-109); ours must recover the axis there (and nearby)
    through the quaternion branch. Accuracy in that regime is bounded by
    the Shepperd extraction's 1e-6 denominator guard."""
    # exactly pi about the principal axes and about random axes
    a = jax.random.normal(key, (64, 3), dtype=jnp.float64)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    a = jnp.concatenate([jnp.eye(3, dtype=jnp.float64), a], 0)
    for theta in (np.pi, np.pi - 1e-5, np.pi - 1e-2, 2.8):
        R = ops.expmap(theta * a)
        v = ops.vee(ops.logmap(R))
        assert np.isfinite(np.asarray(v)).all()
        R2 = ops.expmap(v)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R),
                                   atol=5e-6,
                                   err_msg=f"theta={theta}")
        # the recovered angle is the wrapped one
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1),
                                   theta, atol=5e-6)
    # gradients stay finite through the antipode branch (and through the
    # unselected generic branch's where)
    g = jax.grad(lambda vv: jnp.sum(ops.logmap(ops.expmap(vv)) ** 2))(
        (np.pi - 1e-3) * a[3:8])
    assert np.isfinite(np.asarray(g)).all()


def test_logmap_branch_boundary_consistent(key):
    # the generic<->quaternion switch at cos(theta) = -0.9 must be seamless
    a = jax.random.normal(key, (128, 3), dtype=jnp.float64)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    theta = np.arccos(-0.9)
    for t in (theta - 1e-4, theta + 1e-4):
        v = t * a
        back = ops.vee(ops.logmap(ops.expmap(v)))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v),
                                   atol=2e-6)


def test_logmap_taylor_branch_reachable():
    """Regression: the cos clip floors theta at ~4.5e-4, so the Taylor
    branch threshold must exceed it; near-identity logs stay exact."""
    import jax.numpy as jnp
    from lie_vae_tpu import ops

    v = jnp.asarray([[1e-4, -2e-4, 1.5e-4], [0.0, 0.0, 0.0]])
    R = ops.rodrigues(v)
    X = ops.logmap(R)
    back = ops.vee(X)
    # the cos clip bounds attainable accuracy near the identity to ~theta
    # resolution of arccos in f32 (~5e-4)
    assert float(jnp.max(jnp.abs(back - v))) < 5e-4
    assert jnp.isfinite(X).all()
    # gradient must be finite through the near-identity branch
    import jax
    g = jax.grad(lambda vv: jnp.sum(ops.logmap(ops.rodrigues(vv))))(v)
    assert jnp.isfinite(g).all()


def test_eazyz_to_group_matrix_round_trip(key):
    # inverse of group_matrix_to_eazyz (the reference gets this map from
    # lie_learn 'EA323'->'MAT'; here it is pinned by the round trip).
    # The Euler chart is singular at the beta poles, and the extraction's
    # 1e-6-eps guards (lie_tools.py:169 and the quaternion case select)
    # amplify there as 1/sin(beta): empirically err*sin(beta) <= 7e-7
    # over 16k Haar samples. Assert that law plus a plain bound away from
    # the poles (cos(beta) = R[2,2] in this convention).

    def _roundtrip_errs(m):
        m2 = np.asarray(ops.eazyz_to_group_matrix(
            ops.group_matrix_to_eazyz(m)))
        m = np.asarray(m)
        err = np.abs(m2 - m).max(axis=(-2, -1))
        cosb = np.clip(np.abs(m[:, 2, 2]), None, 1.0)
        return err, np.sqrt(1.0 - cosb ** 2)

    r = ops.random_group_matrices(key, 2000, dtype=jnp.float64)
    err, sinb = _roundtrip_errs(r)
    assert (err * sinb).max() < 2e-6
    assert err[sinb > 0.43].max() < 2e-6          # |cos(beta)| < 0.9
    # and the quaternion chart composes consistently
    q = ops.random_quaternions(key, 2000, dtype=jnp.float64)
    err, sinb = _roundtrip_errs(ops.quaternions_to_group_matrix(q))
    assert (err * sinb).max() < 2e-6
    assert err[sinb > 0.43].max() < 2e-6
