"""Wigner-D property tests, porting the reference suite
(lie_vae/lie_tools.py:323-393) and pinning the trig-synthesis construction
against the naive Z J Z J Z chain as an in-repo oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lie_vae_tpu import ops
from lie_vae_tpu.ops.wigner import j_matrix, z_rot_mat


def _naive_wigner(angles, l, dtype=jnp.float64):
    """Oracle: the reference's dense chain Z(a) J Z(b) J Z(g)
    (lie_vae/lie_tools.py:211-223), built from the same tables."""
    angles = jnp.asarray(angles, dtype=dtype)
    J = jnp.asarray(j_matrix(l), dtype=dtype)
    xa = z_rot_mat(angles[:, 0], l)
    xb = z_rot_mat(angles[:, 1], l)
    xc = z_rot_mat(angles[:, 2], l)
    return xa @ J @ xb @ J @ xc


def test_j_matrix_properties():
    # every shipped table (lmax=16): symmetric involution
    l = 0
    while True:
        try:
            J = j_matrix(l)
        except ValueError:
            break
        eye = np.eye(2 * l + 1)
        np.testing.assert_allclose(J, J.T, atol=1e-12)
        np.testing.assert_allclose(J @ J, eye, atol=1e-11)
        l += 1
    assert l >= 17, f"expected tables through l=16, found lmax={l - 1}"
    np.testing.assert_allclose(
        j_matrix(1), [[0, 1, 0], [1, 0, 0], [0, 0, -1]], atol=1e-12)


def test_j_matrix_beyond_lmax_raises():
    with pytest.raises(ValueError, match="_gen_jd"):
        j_matrix(99)


@pytest.mark.parametrize("l", range(7))
def test_trig_synthesis_matches_naive_chain(key, l):
    r = ops.random_group_matrices(key, 512, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r)
    W = ops.wigner_d_matrix(angles, l)
    W_ref = _naive_wigner(angles, l)
    np.testing.assert_allclose(W, W_ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("l", range(7))
def test_orthogonality(key, l):
    # Reference: lie_tools.py:336-339
    r = ops.random_group_matrices(key, 2000, dtype=jnp.float64)
    W = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(r), l)
    eye = jnp.broadcast_to(jnp.eye(2 * l + 1), W.shape)
    np.testing.assert_allclose(W @ jnp.swapaxes(W, -1, -2), eye,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("l", range(1, 7))
def test_inverse(key, l):
    # Reference: W(g) W(g^-1) = I, lie_tools.py:341-346
    r = ops.random_group_matrices(key, 200, dtype=jnp.float64)
    w = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(r), l)
    winv = ops.wigner_d_matrix(
        ops.group_matrix_to_eazyz(jnp.swapaxes(r, -1, -2)), l)
    eye = jnp.broadcast_to(jnp.eye(2 * l + 1), w.shape)
    np.testing.assert_allclose(w @ winv, eye, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("l", range(1, 7))
def test_antihomomorphism(key, l):
    # Reference: W(a)W(b) semantics — wc == wb @ wa for rc = ra rb,
    # lie_tools.py:348-357 (same tolerance).
    ka, kb = jax.random.split(key)
    ra = ops.random_group_matrices(ka, 5000, dtype=jnp.float64)
    rb = ops.random_group_matrices(kb, 5000, dtype=jnp.float64)
    wa = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(ra), l)
    wb = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(rb), l)
    wc = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(ra @ rb), l)
    np.testing.assert_allclose(wb @ wa, wc, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("l", [10, 13, 16])
def test_high_degree_synthesis_and_orthogonality(key, l):
    """Training uses L<=6 and the serving benchmarks L=10, but the shipped
    tables go to l=16 — pin synthesis==chain and orthogonality over the
    whole advertised range."""
    r = ops.random_group_matrices(key, 128, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r)
    W = ops.wigner_d_matrix(angles, l)
    np.testing.assert_allclose(W, _naive_wigner(angles, l),
                               rtol=1e-9, atol=1e-9)
    eye = jnp.broadcast_to(jnp.eye(2 * l + 1), W.shape)
    np.testing.assert_allclose(W @ jnp.swapaxes(W, -1, -2), eye,
                               rtol=1e-5, atol=1e-5)


def test_high_degree_antihomomorphism(key):
    l = 16
    ka, kb = jax.random.split(key)
    ra = ops.random_group_matrices(ka, 500, dtype=jnp.float64)
    rb = ops.random_group_matrices(kb, 500, dtype=jnp.float64)
    wa = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(ra), l)
    wb = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(rb), l)
    wc = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(ra @ rb), l)
    np.testing.assert_allclose(wb @ wa, wc, rtol=1e-3, atol=1e-3)


def test_zjz_apply_high_degree(key):
    # serving-scale rep (L=10, S=121): factored apply == dense synthesis
    L = 10
    k1, k2 = jax.random.split(key)
    ang = jax.random.uniform(k1, (16, 3), minval=-3.0, maxval=3.0)
    spec = jax.random.normal(k2, (16, (L + 1) ** 2, 5))
    from lie_vae_tpu.ops import wigner
    for tr in (False, True):
        ref = wigner.block_wigner_matrix_multiply(
            ang, spec, L, transpose=tr, impl="dense")
        got = wigner.block_wigner_apply_zjz(ang, spec, L, transpose=tr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-5, atol=5e-5)


def test_l1_intertwines_with_rotation(key):
    """Geometric pin: the l=1 block equals P r^T P^T with P the (y,z,x)
    coordinate permutation — fixes the representation convention absolutely
    (equivalent to lie_learn oracle comparison, lie_tools.py:323-335)."""
    r = ops.random_group_matrices(key, 1000, dtype=jnp.float64)
    W1 = ops.wigner_d_matrix(ops.group_matrix_to_eazyz(r), 1)
    P = jnp.asarray([[0.0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=jnp.float64)
    expected = P @ jnp.swapaxes(r, -1, -2) @ P.T
    np.testing.assert_allclose(W1, expected, rtol=1e-4, atol=1e-4)


def test_block_matrix_matches_per_degree(key):
    L = 6
    r = ops.random_group_matrices(key, 64, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r)
    Wfull = ops.block_wigner_matrix(angles, L)
    assert Wfull.shape == (64, (L + 1) ** 2, (L + 1) ** 2)
    start = 0
    for l in range(L + 1):
        dim = 2 * l + 1
        Wl = ops.wigner_d_matrix(angles, l)
        np.testing.assert_allclose(
            Wfull[:, start:start + dim, start:start + dim], Wl,
            rtol=1e-10, atol=1e-10)
        start += dim
    # off-diagonal blocks are exactly zero
    mask = np.ones(((L + 1) ** 2, (L + 1) ** 2), bool)
    start = 0
    for l in range(L + 1):
        dim = 2 * l + 1
        mask[start:start + dim, start:start + dim] = False
        start += dim
    assert np.abs(np.asarray(Wfull)[:, mask]).max() == 0.0


def test_block_multiply_matches_loop(key):
    # Reference semantics: block_wigner_matrix_multiply, lie_tools.py:226-253
    L = 6
    k1, k2 = jax.random.split(key)
    r = ops.random_group_matrices(k1, 32, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r)
    spectrum = jax.random.normal(k2, (32, (L + 1) ** 2, 10), dtype=jnp.float64)

    out = ops.block_wigner_matrix_multiply(angles, spectrum, L)

    # loop oracle
    chunks = []
    start = 0
    for l in range(L + 1):
        dim = 2 * l + 1
        Wl = _naive_wigner(angles, l)
        chunks.append(Wl @ spectrum[:, start:start + dim, :])
        start += dim
    ref = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-10)

    # transpose flag
    out_t = ops.block_wigner_matrix_multiply(angles, spectrum, L,
                                             transpose=True)
    chunks = []
    start = 0
    for l in range(L + 1):
        dim = 2 * l + 1
        Wl = jnp.swapaxes(_naive_wigner(angles, l), -1, -2)
        chunks.append(Wl @ spectrum[:, start:start + dim, :])
        start += dim
    np.testing.assert_allclose(out_t, jnp.concatenate(chunks, axis=1),
                               rtol=1e-10, atol=1e-10)


def test_block_multiply_preserves_norm(key):
    # orthogonal rep preserves the per-degree (hence total) spectrum norm
    L = 4
    k1, k2 = jax.random.split(key)
    r = ops.random_group_matrices(k1, 16, dtype=jnp.float64)
    spectrum = jax.random.normal(k2, (16, (L + 1) ** 2, 3), dtype=jnp.float64)
    out = ops.block_wigner_matrix_multiply(
        ops.group_matrix_to_eazyz(r), spectrum, L)
    np.testing.assert_allclose(
        jnp.linalg.norm(out.reshape(16, -1), axis=-1),
        jnp.linalg.norm(spectrum.reshape(16, -1), axis=-1), rtol=1e-10)


def test_shared_spectrum_broadcast(key):
    L = 3
    k1, k2 = jax.random.split(key)
    r = ops.random_group_matrices(k1, 8, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r)
    spec = jax.random.normal(k2, ((L + 1) ** 2, 5), dtype=jnp.float64)
    out_shared = ops.block_wigner_matrix_multiply(angles, spec, L)
    out_batched = ops.block_wigner_matrix_multiply(
        angles, jnp.broadcast_to(spec, (8,) + spec.shape), L)
    np.testing.assert_allclose(out_shared, out_batched, rtol=1e-12)


def test_wigner_grad_finite(key):
    L = 6
    k1, k2, k3 = jax.random.split(key, 3)
    v = jax.random.normal(k1, (4, 3), dtype=jnp.float64)
    spec = jax.random.normal(k2, (4, (L + 1) ** 2, 10), dtype=jnp.float64)
    # NB: sum(out**2) is rotation-invariant (orthogonal rep), so weight the
    # output to get a nonzero gradient.
    w = jax.random.normal(k3, spec.shape, dtype=jnp.float64)

    def f(v):
        angles = ops.group_matrix_to_eazyz(ops.expmap(v))
        return jnp.sum(ops.block_wigner_matrix_multiply(angles, spec, L) * w)

    g = jax.grad(f)(v)
    assert np.isfinite(np.asarray(g)).all()

    # Compare against finite differences. eps is large-ish because XLA CPU's
    # float64 sin has only ~1e-8 accuracy (noise amplified by 1/eps).
    eps = 1e-3
    v0 = np.asarray(v)
    fd = np.zeros_like(v0)
    for i in range(v0.shape[0]):
        for j in range(3):
            vp, vm = v0.copy(), v0.copy()
            vp[i, j] += eps
            vm[i, j] -= eps
            fd[i, j] = (f(jnp.asarray(vp)) - f(jnp.asarray(vm))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-3,
                               atol=1e-3 * np.abs(fd).max())


def test_float32_accuracy(key):
    # the production dtype path must stay within fp32 tolerance of fp64
    L = 6
    r = ops.random_group_matrices(key, 128, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r)
    W64 = ops.block_wigner_matrix(angles, L)
    W32 = ops.block_wigner_matrix(angles.astype(jnp.float32), L)
    np.testing.assert_allclose(W32, W64, rtol=1e-4, atol=1e-4)


def test_zjz_apply_matches_dense():
    """block_wigner_apply_zjz == synthesize-then-bmm, incl. transpose and
    the shared-spectrum broadcast form."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lie_vae_tpu.ops import wigner

    key = jax.random.PRNGKey(11)
    for L in (0, 1, 4, 6):
        S = (L + 1) ** 2
        ang = jax.random.uniform(key, (12, 3), minval=-3.0, maxval=3.0)
        spec = jax.random.normal(jax.random.fold_in(key, L), (12, S, 5))
        for tr in (False, True):
            ref = wigner.block_wigner_matrix_multiply(
                ang, spec, L, transpose=tr, impl="dense")
            got = wigner.block_wigner_apply_zjz(ang, spec, L, transpose=tr)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)
    shared = jax.random.normal(key, (49, 3))
    ref = wigner.block_wigner_matrix_multiply(ang[:, :3], shared, 6,
                                              impl="dense")
    got = wigner.block_wigner_apply_zjz(ang[:, :3], shared, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_zjz_apply_grads_match_dense():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lie_vae_tpu.ops import wigner

    key = jax.random.PRNGKey(12)
    ang = jax.random.uniform(key, (6, 3), minval=-2.0, maxval=2.0)
    spec = jax.random.normal(jax.random.fold_in(key, 1), (6, 16, 4))
    ct = jax.random.normal(jax.random.fold_in(key, 2), (6, 16, 4))

    def loss(impl):
        return lambda a, s: jnp.sum(
            wigner.block_wigner_matrix_multiply(a, s, 3, impl=impl) * ct)

    ga_ref, gs_ref = jax.grad(loss("dense"), (0, 1))(ang, spec)
    ga, gs = jax.grad(loss("zjz"), (0, 1))(ang, spec)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref),
                               rtol=1e-4, atol=1e-5)
