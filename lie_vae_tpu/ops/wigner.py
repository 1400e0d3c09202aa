"""Real Wigner-D matrices and block-diagonal group actions — TPU-first.

Reference behavior (lie_vae/lie_tools.py:195-253): per degree l, build
``D^l(a,b,g) = Z(a) J Z(b) J Z(g)`` with dense (2l+1)^3 matmuls (where Z is
the sparse real z-rotation block and J the constant Pinchon-Hoggan block),
then loop over degrees in Python and ``bmm`` each block against a slice of
the spectrum.

TPU-first redesign (no per-degree Python matmul chain):

1. The middle factor ``d(b) = J Z(b) J`` is a trigonometric polynomial in b:
       d(b) = sum_m  cos(m b) * Ccos_m  +  sin(m b) * Csin_m,
   with constant coefficient matrices derived from J once per ``max_degree``
   (see ``_coeffs``). All degrees are packed into ONE block-diagonal
   coefficient tensor C of shape (2L+1, S, S), S = (L+1)^2, so a single
       einsum('bm,mse->bse', trig(b), C)
   builds the middle factor for the whole spectrum at once — one
   MXU-friendly contraction instead of 2(L+1) tiny matmuls.

2. The outer factors are applied *elementwise* (VPU, no matmul), using the
   identities (f = per-row frequency, rev = block-local reversal):
       (Z(a) M)[i, j] = cos(f_i a) M[i, j] + sin(f_i a) M[rev(i), j]
       (M Z(g))[i, j] = cos(f_j g) M[i, j] - sin(f_j g) M[i, rev(j)]

The result is bit-equal (up to fp association) to the reference's chain and
yields the full block-diagonal representation matrix W(a,b,g) of shape
(B, S, S) in one fused XLA computation; the action on a spectrum is then a
single batched matmul.
"""
import functools
import os

import numpy as np
import jax.numpy as jnp

__all__ = [
    "j_matrix", "z_rot_mat", "wigner_d_matrix",
    "block_wigner_matrix", "block_wigner_matrix_multiply",
    "block_wigner_apply_zjz",
]

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "jd_tables.npz")


@functools.lru_cache(maxsize=1)
def _tables():
    with np.load(_TABLE_PATH) as data:
        lmax = int(data["lmax"])
        return [np.asarray(data[f"J{l}"], dtype=np.float64)
                for l in range(lmax + 1)]


def j_matrix(l):
    """The constant Pinchon-Hoggan J block for degree l, float64 numpy.

    Equivalent of the reference's lru-cached lie_learn load
    (lie_vae/lie_tools.py:10-14); here the tables are a generated asset
    (see ops/_gen_jd.py).
    """
    tables = _tables()
    if l >= len(tables):
        raise ValueError(
            f"degree {l} exceeds precomputed lmax={len(tables) - 1}; "
            f"regenerate with `python -m lie_vae_tpu.ops._gen_jd --lmax {l}`")
    return tables[l]


def z_rot_mat(angle, l):
    """Batched real z-rotation irrep block, (B, 2l+1, 2l+1).

    Row i carries frequency l - i: cos on the diagonal, sin on the
    anti-diagonal. Reference: _z_rot_mat, lie_vae/lie_tools.py:195-208.
    Provided for tests/parity; the hot path never materializes Z.
    """
    angle = jnp.asarray(angle)
    freqs = jnp.arange(l, -l - 1, -1, dtype=angle.dtype)
    dim = 2 * l + 1
    c = jnp.cos(freqs * angle[:, None])
    s = jnp.sin(freqs * angle[:, None])
    eye = jnp.eye(dim, dtype=angle.dtype)
    anti = eye[::-1]
    return c[:, :, None] * eye + s[:, :, None] * anti


@functools.lru_cache(maxsize=32)
def _coeffs(max_degree):
    """Precompute (freqs, rev, C) for the packed block-diagonal rep.

    - freqs: (S,) per-row frequency, concatenating arange(l, -l-1, -1)
    - rev:   (S,) block-local reversed index
    - C:     (2L+1, S, S) float64; index m in [0, L] holds the cos(m b)
             coefficient matrix, index L + m (m in [1, L]) holds sin(m b).

    Derivation: (J Z(b) J)[a, e]
        = sum_c J[a, c] J[c, e] cos(f_c b) - J[a, 2l-c] J[c, e] sin(f_c b)
    with f_c = l - c, so with m = |f_c|:
        Ccos_m += outer(J[:, c], J[c, :])
        Csin_m += -sign(f_c) * outer(J[:, 2l-c], J[c, :]).
    """
    L = max_degree
    S = (L + 1) ** 2
    freqs = np.concatenate(
        [np.arange(l, -l - 1, -1) for l in range(L + 1)]).astype(np.float64)
    rev = np.concatenate(
        [np.arange(2 * l, -1, -1) + l * l for l in range(L + 1)]).astype(np.int32)
    C = np.zeros((2 * L + 1, S, S), dtype=np.float64)
    for l in range(L + 1):
        J = j_matrix(l)
        o = l * l
        for c in range(2 * l + 1):
            fc = l - c
            m = abs(fc)
            C[m, o:o + 2 * l + 1, o:o + 2 * l + 1] += np.outer(J[:, c], J[c, :])
            if fc != 0:
                C[L + m, o:o + 2 * l + 1, o:o + 2 * l + 1] += \
                    -np.sign(fc) * np.outer(J[:, 2 * l - c], J[c, :])
    return freqs, rev, C


def _trig_basis(beta, L):
    """(B, 2L+1): [cos(0 b) .. cos(L b), sin(1 b) .. sin(L b)]."""
    m = jnp.arange(0, L + 1, dtype=beta.dtype)
    arg = beta[:, None] * m[None, :]
    return jnp.concatenate([jnp.cos(arg), jnp.sin(arg[:, 1:])], axis=-1)


def block_wigner_matrix(angles, max_degree, dtype=None):
    """Full block-diagonal real Wigner-D matrix, (B, S, S), S=(L+1)^2.

    One einsum builds the middle factor for all degrees at once; outer
    z-rotations are elementwise. See module docstring.
    """
    angles = jnp.asarray(angles)
    assert angles.shape[-1] == 3, "angles must be (..., 3) ZYZ Euler"
    batch_shape = angles.shape[:-1]
    angles = angles.reshape((-1, 3))
    dtype = dtype or angles.dtype

    L = max_degree
    freqs_np, rev_np, C_np = _coeffs(L)
    freqs = jnp.asarray(freqs_np, dtype=dtype)
    rev = jnp.asarray(rev_np)
    C = jnp.asarray(C_np, dtype=dtype)

    a, b, g = angles[:, 0], angles[:, 1], angles[:, 2]
    t = _trig_basis(b, L)                                   # (B, 2L+1)
    d = jnp.einsum("bm,mse->bse", t, C)                     # (B, S, S)

    ca, sa = jnp.cos(freqs * a[:, None]), jnp.sin(freqs * a[:, None])
    tmp = ca[:, :, None] * d + sa[:, :, None] * d[:, rev, :]
    cg, sg = jnp.cos(freqs * g[:, None]), jnp.sin(freqs * g[:, None])
    W = tmp * cg[:, None, :] - tmp[:, :, rev] * sg[:, None, :]
    S = (L + 1) ** 2
    return W.reshape(batch_shape + (S, S))


def wigner_d_matrix(angles, degree, dtype=None):
    """Single-degree real Wigner-D block, (..., 2l+1, 2l+1).

    Same value as the reference chain Z(a) J Z(b) J Z(g)
    (lie_vae/lie_tools.py:211-223), computed by trig synthesis.
    """
    angles = jnp.asarray(angles)
    assert angles.shape[-1] == 3, "angles must be (..., 3) ZYZ Euler"
    batch_shape = angles.shape[:-1]
    angles = angles.reshape((-1, 3))
    dtype = dtype or angles.dtype

    l = degree
    dim = 2 * l + 1
    # the single-degree coefficients are the degree-l diagonal block of the
    # packed tensor (same m-basis when max_degree == l) — reuse the cached
    # derivation in _coeffs instead of duplicating it
    o = l * l
    C = jnp.asarray(_coeffs(l)[2][:, o:o + dim, o:o + dim], dtype=dtype)
    freqs = jnp.arange(l, -l - 1, -1, dtype=dtype)
    rev = jnp.arange(dim - 1, -1, -1)

    a, b, g = angles[:, 0], angles[:, 1], angles[:, 2]
    t = _trig_basis(b, l) if l > 0 else jnp.ones((angles.shape[0], 1), dtype)
    d = jnp.einsum("bm,mse->bse", t, C)
    ca, sa = jnp.cos(freqs * a[:, None]), jnp.sin(freqs * a[:, None])
    tmp = ca[:, :, None] * d + sa[:, :, None] * d[:, rev, :]
    cg, sg = jnp.cos(freqs * g[:, None]), jnp.sin(freqs * g[:, None])
    W = tmp * cg[:, None, :] - tmp[:, :, rev] * sg[:, None, :]
    return W.reshape(batch_shape + (dim, dim))


@functools.lru_cache(maxsize=32)
def _block_j(max_degree):
    """Constant block-diagonal J = diag(J_0 .. J_L), (S, S) float64."""
    L = max_degree
    S = (L + 1) ** 2
    J = np.zeros((S, S), dtype=np.float64)
    for l in range(L + 1):
        o = l * l
        J[o:o + 2 * l + 1, o:o + 2 * l + 1] = j_matrix(l)
    return J


def block_wigner_apply_zjz(angles, spectrum, max_degree, transpose=False):
    """W(angles) @ spectrum without ever materializing W.

    Applies the Pinchon-Hoggan chain Z(a) J Z(b) J Z(g) right-to-left to
    the spectrum: the two J factors are whole-batch matmuls against ONE
    constant block-diagonal (S, S) matrix, and each Z factor is elementwise
    (cos(f_i th) x[i] + sin(f_i th) x[rev i]). Per sample this is
    O(S^2 C + S C) work versus O(L S^2 + S^2 C) for synthesize-then-bmm,
    and — decisive on TPU — the batch dimension rides the MXU lanes of a
    single constant matmul instead of B tiny (2l+1)-sized products, so
    HBM traffic is just spectrum-in/spectrum-out.

    transpose=True applies W^T using the identity
        Z(th)^T = Z(-th),  (J Z J)^T = J Z(-b) J  (J symmetric)
    i.e. the same chain with angles (-g, -b, -a).

    Same value as block_wigner_matrix_multiply (tested); reference
    semantics: lie_vae/lie_tools.py:226-253.
    """
    angles = jnp.asarray(angles).reshape((-1, 3))
    dtype = spectrum.dtype
    L = max_degree
    S = (L + 1) ** 2
    freqs_np, rev_np, _ = _coeffs(L)
    freqs = jnp.asarray(freqs_np, dtype=dtype)
    rev = jnp.asarray(rev_np)
    J = jnp.asarray(_block_j(L), dtype=dtype)

    if spectrum.ndim == 2:
        spectrum = jnp.broadcast_to(
            spectrum[None], (angles.shape[0],) + spectrum.shape)
    assert spectrum.shape[1] == S, (spectrum.shape, S)

    a, b, g = angles[:, 0], angles[:, 1], angles[:, 2]
    if transpose:
        a, b, g = -g, -b, -a

    def zmul(theta, x):
        c = jnp.cos(freqs * theta[:, None]).astype(dtype)
        s = jnp.sin(freqs * theta[:, None]).astype(dtype)
        return c[:, :, None] * x + s[:, :, None] * x[:, rev, :]

    def jmul(x):
        return jnp.einsum("se,bec->bsc", J, x)

    return zmul(a, jmul(zmul(b, jmul(zmul(g, spectrum)))))


def block_wigner_matrix_multiply(angles, spectrum, max_degree,
                                 transpose=False, impl="zjz"):
    """Rotate a direct-sum spectrum by the group element given as ZYZ angles.

    Input:
      - angles   (B, 3) ZYZ Euler angles
      - spectrum (B, S, C) or (S, C) Fourier modes, S = (max_degree+1)^2
      - transpose: apply the transposed representation matrices
      - impl: 'fused' (the factored chain as ONE Pallas kernel,
        intermediates never leave VMEM; bf16 matmuls with f32
        accumulation, the same numeric class as XLA at TPU-default matmul
        precision; fastest measured at B >= ~2k) | 'zjz' (the factored
        chain in XLA ops — fastest at small B where the dispatch floor
        dominates, and the fallback when S*C exceeds the fused kernel's
        VMEM constant budget) | 'xla' (alias of 'zjz') | 'auto' (picks
        fused vs zjz by the measured crossover) | 'dense' (synthesize the
        full W then one batched matmul; for callers who also want W's
        structure) | 'pallas' (the older per-sample synthesize+apply
        kernel, kept for comparison — zjz beats it)

    Output: (B, S, C).

    Reference: block_wigner_matrix_multiply, lie_vae/lie_tools.py:226-253
    (a Python loop of per-degree bmm's).
    """
    if impl not in ("zjz", "xla", "auto", "dense", "pallas", "fused"):
        raise ValueError(f"unknown wigner impl {impl!r} (expected 'fused', "
                         "'zjz', 'dense', 'pallas', 'auto', or 'xla')")
    if impl == "auto":
        from lie_vae_tpu.ops.kernels import MAX_FUSED_SC
        S = (max_degree + 1) ** 2
        SC = spectrum.shape[-1] * S if spectrum.ndim >= 2 else None
        B = jnp.asarray(angles).reshape(-1, 3).shape[0]
        # measured crossovers (scripts/bench_kernels.py + BENCHMARKS):
        # small reps — below ~2k rows both paths sit on the dispatch
        # floor and zjz is marginally ahead, above it the fused kernel
        # wins; large reps (channels-as-rows path, C x the rows) — the
        # fused kernel already wins at B=1024 (0.123 vs 0.142 ms) and by
        # 1.6x at B=4096
        if SC is not None and SC <= MAX_FUSED_SC:
            impl = "fused" if B >= 2048 else "zjz"
        elif SC is not None and S <= MAX_FUSED_SC:
            impl = "fused" if B >= 1024 else "zjz"
        else:
            impl = "zjz"
    if impl in ("zjz", "xla"):
        return block_wigner_apply_zjz(angles, spectrum, max_degree,
                                      transpose=transpose)
    if impl == "fused":
        from lie_vae_tpu.ops.kernels import (
            block_wigner_matrix_multiply_fused)
        return block_wigner_matrix_multiply_fused(
            angles, spectrum, max_degree, transpose=transpose)
    if impl == "pallas":
        from lie_vae_tpu.ops.kernels import (
            block_wigner_matrix_multiply_pallas)
        return block_wigner_matrix_multiply_pallas(
            angles, spectrum, max_degree, transpose=transpose,
            block_b=32)
    W = block_wigner_matrix(angles, max_degree, dtype=spectrum.dtype)
    if transpose:
        W = jnp.swapaxes(W, -1, -2)
    if spectrum.ndim == 2:
        return jnp.einsum("bse,ec->bsc", W, spectrum)
    return jnp.einsum("bse,bec->bsc", W, spectrum)
