"""Pallas TPU kernel: the factored Z(a) J Z(b) J Z(g) Wigner chain, fused.

This is the chain `ops.block_wigner_apply_zjz` evaluates with XLA ops
(reference semantics: lie_vae/lie_tools.py:226-253), implemented as ONE
kernel so the four chain intermediates never round-trip through HBM —
the XLA path materializes each stage (6+ passes over (B, S, C) buffers),
which is where its measured 7.6x gap to the bytes bound comes from
(BENCHMARKS.md r1 kernel table).

Layout and algebra
------------------
The spectrum rides FLAT: (B, S*C) with s-major/c-minor lanes — exactly the
reshape of (B, S, C), so S*C = 490 pads to 512 lanes (4% tax) instead of
(B, 49, 10) padding its minor dims to (56, 128) (26x tax). With the
z-rotation written as Z(t) x = c_t (.) x + s_t (.) (P x) (P = block-local
index reversal, c/s = cos/sin(f_i t)) and the identity s (.) Px =
-P(s (.) x), each J-stage becomes two dots against CONSTANT matrices:

    J Z(t) x = J (c (.) x) - (J P) (s (.) x)

and the final Z(a) needs both z = J Z(b) y and P z, giving the chain

    y  = (cg.x) Jt - (sg.x) Kt          J~ = (J  kron I_C), K~ = (J P kron I_C)
    z  = (cb.y) Jt - (sb.y) Kt          (P J kron I_C), (P J P kron I_C)
    pz = (cb.y) PJt - (sb.y) PKt        for the P z path
    out = ca.z + sa.pz

— 6 MXU dots of (block_b, SC) x (SC, SC) per block with all elementwise
work (trig synthesis from the raw angles included) on the VPU in VMEM.
The Kronecker-with-I_C constants cost a factor C in MACs over the minimal
2-matmul algorithm, which bf16 inputs (f32 accumulation — the same
numeric class as the XLA path at TPU-default matmul precision) make
nearly free; compute_dtype=float32 is available for strict-precision use.

Backward pass (custom VJP) reuses the SAME kernel: dx = W^T dout is the
chain with angles (-g, -b, -a), and the residual variant's saved stage
intermediates (y, z forward; A, v backward) give the three angle
gradients as cheap XLA row-reductions:

    da = sum_i dout f (ca (.) Pz - sa (.) z)      out = Z(a) z
    db = sum_i A    f (cb (.) Py - sb (.) y)      A = J Z(-a) dout
    dg = sum_i v    f (cg (.) Px - sg (.) x)      v = J Z(-b) J Z(-a) dout

VMEM: 4 constants of (SC, SC) + ~10 (block_b, SC) live arrays; SC is
capped at 724 (4 f32 constants = 8.4 MB) — the flagship L=6, C=10 has
SC = 490. Larger reps fall back to the XLA zjz path at the dispatch site.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lie_vae_tpu.ops.wigner import _block_j, _coeffs

MAX_FUSED_SC = 724   # 4 float32 (SC, SC) constants ~ 8.4 MB of ~16 MB VMEM


@functools.lru_cache(maxsize=16)
def _fused_consts(max_degree, channels, dtype_name):
    """(f_exp, rev_exp, Jt, Kt, PJt, PKt) — numpy (lru_cached: jnp arrays
    created while tracing would leak tracers across traces).

    All four matmul constants are pre-transposed for row-vector dots
    (x @ M means M = op^T), and pre-Kroneckered with I_C for the flat
    s-major/c-minor lane layout.
    """
    freqs, rev, _ = _coeffs(max_degree)
    J = _block_j(max_degree)                     # (S, S) float64
    S = J.shape[0]
    P = np.zeros((S, S))
    P[np.arange(S), rev] = 1.0                   # (P x)[i] = x[rev i]
    eye_c = np.eye(channels)
    dt = np.dtype(dtype_name)

    def pack(M):                                 # (M kron I_C)^T, compute dt
        return np.kron(M, eye_c).T.astype(dt)

    f_exp = np.repeat(freqs, channels).astype(np.float32)[None, :]  # (1, SC)
    rev_exp = (rev[:, None] * channels
               + np.arange(channels)[None, :]).reshape(-1).astype(np.int32)
    return (f_exp, rev_exp, pack(J), pack(J @ P), pack(P @ J),
            pack(P @ J @ P))


def _chain_kernel(ang_ref, fexp_ref, x_ref, jt_ref, kt_ref, pjt_ref,
                  pkt_ref, out_ref, y_ref, z_ref, *, compute_dtype,
                  save_residuals):
    f = fexp_ref[:]                                   # (1, SC) f32
    x = x_ref[:]                                      # (bb, SC) f32
    cd = compute_dtype

    def trig(col):
        th = ang_ref[:, col:col + 1]                  # (bb, 1)
        arg = th * f                                  # (bb, SC)
        return jnp.cos(arg), jnp.sin(arg)

    def jstage(c, s, h, m1_ref, m2_ref):
        u = (c * h).astype(cd)
        v = (s * h).astype(cd)
        return (jnp.dot(u, m1_ref[:], preferred_element_type=jnp.float32)
                - jnp.dot(v, m2_ref[:], preferred_element_type=jnp.float32))

    cg, sg = trig(2)
    y = jstage(cg, sg, x, jt_ref, kt_ref)             # J Z(g) x
    cb, sb = trig(1)
    z = jstage(cb, sb, y, jt_ref, kt_ref)             # J Z(b) y
    pz = jstage(cb, sb, y, pjt_ref, pkt_ref)          # P (J Z(b) y)
    ca, sa = trig(0)
    out_ref[:] = ca * z + sa * pz                     # Z(a) z
    if save_residuals:
        y_ref[:] = y
        z_ref[:] = z


@functools.lru_cache(maxsize=32)
def _chain_call(L, C, block_b, compute_dtype_name, save_residuals,
                interpret):
    f_exp, _, Jt, Kt, PJt, PKt = _fused_consts(L, C, compute_dtype_name)
    SC = Jt.shape[0]
    cd = jnp.dtype(compute_dtype_name)

    def batch_spec(cols):
        return pl.BlockSpec((block_b, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [batch_spec(3), const_spec((1, SC)), batch_spec(SC),
                const_spec((SC, SC)), const_spec((SC, SC)),
                const_spec((SC, SC)), const_spec((SC, SC))]

    if save_residuals:
        def call(angles, x):
            Bp = x.shape[0]
            return pl.pallas_call(
                functools.partial(_chain_kernel, compute_dtype=cd,
                                  save_residuals=True),
                out_shape=tuple(jax.ShapeDtypeStruct((Bp, SC), jnp.float32)
                                for _ in range(3)),
                grid=(Bp // block_b,),
                in_specs=in_specs,
                out_specs=tuple(batch_spec(SC) for _ in range(3)),
                interpret=interpret,
            )(angles, f_exp, x, Jt, Kt, PJt, PKt)
        return call

    def call_plain(angles, x):
        Bp = x.shape[0]
        return pl.pallas_call(
            functools.partial(_plain_kernel, compute_dtype=cd),
            out_shape=jax.ShapeDtypeStruct((Bp, SC), jnp.float32),
            grid=(Bp // block_b,),
            in_specs=in_specs,
            out_specs=batch_spec(SC),
            interpret=interpret,
        )(angles, f_exp, x, Jt, Kt, PJt, PKt)

    return call_plain


def _plain_kernel(ang_ref, fexp_ref, x_ref, jt_ref, kt_ref, pjt_ref,
                  pkt_ref, out_ref, *, compute_dtype):
    _chain_kernel(ang_ref, fexp_ref, x_ref, jt_ref, kt_ref, pjt_ref,
                  pkt_ref, out_ref, None, None,
                  compute_dtype=compute_dtype, save_residuals=False)


@functools.lru_cache(maxsize=32)
def _make_fused_op(L, C, block_b, compute_dtype_name, interpret):
    """custom_vjp op over (angles (Bp, 3) f32, x (Bp, SC) f32) — Bp already
    padded to a block_b multiple. Returns out (Bp, SC) f32."""
    f_exp_np, rev_exp_np, *_ = _fused_consts(L, C, compute_dtype_name)
    plain = _chain_call(L, C, block_b, compute_dtype_name, False, interpret)
    with_res = _chain_call(L, C, block_b, compute_dtype_name, True,
                           interpret)

    def rev_angles(angles):
        # W(a,b,g)^T = W-chain at (-g, -b, -a): Z^T = Z(-t), J^T = J
        return -angles[:, ::-1]

    @jax.custom_vjp
    def op(angles, x):
        return plain(angles, x)

    def op_fwd(angles, x):
        out, y, z = with_res(angles, x)
        return out, (angles, x, y, z)

    def op_bwd(res, dout):
        angles, x, y, z = res
        # one fused call: dx = W^T dout, with residuals A = J Z(-a) dout
        # and v = J Z(-b) J Z(-a) dout (stage intermediates of that chain)
        dx, A, v = with_res(rev_angles(angles), dout)

        f = jnp.asarray(f_exp_np)                          # (1, SC)
        rev_exp = jnp.asarray(rev_exp_np)

        def dangle(coeff, th, h):
            # sum_i coeff * f * (cos(f th) (.) Ph - sin(f th) (.) h)
            arg = th[:, None] * f
            ph = jnp.take(h, rev_exp, axis=1)
            return jnp.sum(coeff * f * (jnp.cos(arg) * ph
                                        - jnp.sin(arg) * h), axis=1)

        da = dangle(dout, angles[:, 0], z)
        db = dangle(A, angles[:, 1], y)
        dg = dangle(v, angles[:, 2], x)
        return jnp.stack([da, db, dg], axis=-1), dx

    op.defvjp(op_fwd, op_bwd)
    return op


def block_wigner_apply_fused_flat(angles, spectrum_flat, max_degree,
                                  transpose=False, block_b=256,
                                  compute_dtype=jnp.bfloat16,
                                  interpret=None):
    """Fused W(angles) @ spectrum on the flat layout.

    angles (B, 3) ZYZ; spectrum_flat (B, S*C) or (S*C,) with s-major /
    c-minor lanes (== (B, S, C).reshape(B, -1)); returns (B, S*C) float32.
    `channels` is inferred as spectrum_flat.shape[-1] // (L+1)^2.

    Same value as ops.block_wigner_apply_zjz on the reshaped input
    (reference semantics lie_vae/lie_tools.py:226-253); with the default
    bfloat16 compute it matches to TPU-default-matmul-precision class,
    with compute_dtype=float32 to ~1e-6.
    """
    angles = jnp.asarray(angles, jnp.float32).reshape((-1, 3))
    B = angles.shape[0]
    S = (max_degree + 1) ** 2
    SC = spectrum_flat.shape[-1]
    assert SC % S == 0, (spectrum_flat.shape, S)
    C = SC // S
    assert SC <= MAX_FUSED_SC, (
        f"fused Wigner kernel supports S*C <= {MAX_FUSED_SC} (VMEM "
        f"constants); got {SC} — use impl='zjz'")
    if spectrum_flat.ndim == 1:
        spectrum_flat = jnp.broadcast_to(spectrum_flat[None], (B, SC))
    spectrum_flat = spectrum_flat.astype(jnp.float32)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if transpose:
        angles = -angles[:, ::-1]

    block_b = min(block_b, max(8, 1 << (B - 1).bit_length()))
    pad = (-B) % block_b
    if pad:
        angles = jnp.pad(angles, ((0, pad), (0, 0)))
        spectrum_flat = jnp.pad(spectrum_flat, ((0, pad), (0, 0)))

    op = _make_fused_op(max_degree, C, block_b, jnp.dtype(compute_dtype).name,
                        interpret)
    return op(angles, spectrum_flat)[:B]


def block_wigner_matrix_multiply_fused(angles, spectrum, max_degree,
                                       transpose=False, block_b=256,
                                       compute_dtype=jnp.bfloat16,
                                       interpret=None):
    """(B, S, C)-shaped convenience wrapper over the flat fused kernel."""
    if spectrum.ndim == 2:
        S, C = spectrum.shape
        flat = spectrum.reshape(-1)
    else:
        _, S, C = spectrum.shape
        flat = spectrum.reshape(spectrum.shape[0], -1)
    out = block_wigner_apply_fused_flat(
        angles, flat, max_degree, transpose=transpose, block_b=block_b,
        compute_dtype=compute_dtype, interpret=interpret)
    return out.reshape(out.shape[0], S, C)
