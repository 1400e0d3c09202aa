"""Pallas TPU kernel: fused block-Wigner build + apply.

Computes out[b] = W(angles[b]) @ spectrum[b] for the full direct-sum
representation WITHOUT materializing W in HBM. One kernel fuses:

  1. the Fourier synthesis of the middle factor d(beta) — an MXU matmul of
     the (B, 2L+1) trig features against the packed coefficient tensor;
  2. the outer z-rotation scalings (VPU elementwise);
  3. the application to the spectrum (MXU).

Block-local index reversals (the anti-diagonal couplings of the z-rotation)
are folded into FOUR precomputed coefficient tensors (C, C[rev,:], C[:,rev],
C[rev,rev]) so the kernel needs no gathers at all — everything is matmul +
elementwise.

Identity used (freqs f, block-local reversal rev; see ops/wigner.py):
  W = cg (.) (ca (.) d + sa (.) d_row) - sg (.) (ca (.) d_col + sa (.) d_both)
with ca/sa = cos/sin(f * alpha) scaling rows, cg/sg = cos/sin(f * gamma)
scaling columns, and d_* the Fourier syntheses of the four reversed
coefficient tensors.

VMEM budget: 4 * (2L+1) * S^2 floats of constants; fits comfortably for
L <= 10 (L=10: ~4.9 MB).

Differentiable: a custom VJP whose backward pass is a second fused Pallas
kernel (_wigner_bwd_kernel) producing gradients for the trig features and
the spectrum; angle gradients then flow through the (XLA) trig precompute.
Numerical note: the kernels accumulate in float32 (preferred_element_type),
which on TPU is MORE precise than the XLA einsum path at default matmul
precision (bf16-grade passes).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lie_vae_tpu.ops.wigner import _coeffs, _trig_basis


@functools.lru_cache(maxsize=16)
def _kernel_coeffs(max_degree):
    """The four block-reversed coefficient tensors, float32 numpy."""
    freqs, rev, C = _coeffs(max_degree)
    C = C.astype(np.float32)
    Crow = C[:, rev, :]
    Ccol = C[:, :, rev]
    Cboth = C[:, rev, :][:, :, rev]
    return freqs.astype(np.float32), C, Crow, Ccol, Cboth


def _wigner_apply_kernel(t_ref, ca_ref, sa_ref, cg_ref, sg_ref, spec_ref,
                         c_ref, crow_ref, ccol_ref, cboth_ref, out_ref,
                         *, transpose, block_b, num_freqs):
    # Everything is strictly 2D per batch element — Mosaic supports neither
    # 3D dot_general, last-dim reshapes, nor gathers on computed 3D values.
    # Fourier synthesis = num_freqs unrolled scalar * (S, S) multiply-adds
    # (VPU) against the coefficient tensors resident in VMEM; apply = one
    # (S, S) x (S, C) MXU dot per element.
    for i in range(block_b):
        d = t_ref[i, 0] * c_ref[0]
        drow = t_ref[i, 0] * crow_ref[0]
        dcol = t_ref[i, 0] * ccol_ref[0]
        dboth = t_ref[i, 0] * cboth_ref[0]
        for m in range(1, num_freqs):
            tm = t_ref[i, m]
            d += tm * c_ref[m]
            drow += tm * crow_ref[m]
            dcol += tm * ccol_ref[m]
            dboth += tm * cboth_ref[m]

        ca = ca_ref[i:i + 1, :].T      # (S, 1) row scaling
        sa = sa_ref[i:i + 1, :].T
        cg = cg_ref[i:i + 1, :]        # (1, S) column scaling
        sg = sg_ref[i:i + 1, :]
        w = cg * (ca * d + sa * drow) - sg * (ca * dcol + sa * dboth)
        if transpose:
            w = w.T
        out_ref[i] = jnp.dot(w, spec_ref[i],
                             preferred_element_type=jnp.float32)


def _wigner_bwd_kernel(t_ref, ca_ref, sa_ref, cg_ref, sg_ref, spec_ref,
                       dout_ref, c_ref, crow_ref, ccol_ref, cboth_ref,
                       dt_ref, dca_ref, dsa_ref, dcg_ref, dsg_ref,
                       dspec_ref, *, transpose, block_b, num_freqs):
    """Backward pass, all in VMEM. With A = dL/dW = dout @ spec^T:

      dspec = W^T dout                         (or W dout when transposed)
      dca_s = sum_e A (cg d - sg dcol)         dcg_e = sum_s A (ca d + sa drow)
      dsa_s = sum_e A (cg drow - sg dboth)     dsg_e = -sum_s A (ca dcol + sa dboth)
      dt_m  = <ca cg A, C_m> + <sa cg A, Crow_m>
              - <ca sg A, Ccol_m> - <sa sg A, Cboth_m>
    """
    for i in range(block_b):
        d = t_ref[i, 0] * c_ref[0]
        drow = t_ref[i, 0] * crow_ref[0]
        dcol = t_ref[i, 0] * ccol_ref[0]
        dboth = t_ref[i, 0] * cboth_ref[0]
        for m in range(1, num_freqs):
            tm = t_ref[i, m]
            d += tm * c_ref[m]
            drow += tm * crow_ref[m]
            dcol += tm * ccol_ref[m]
            dboth += tm * cboth_ref[m]

        ca = ca_ref[i:i + 1, :].T      # (S, 1)
        sa = sa_ref[i:i + 1, :].T
        cg = cg_ref[i:i + 1, :]        # (1, S)
        sg = sg_ref[i:i + 1, :]
        w = cg * (ca * d + sa * drow) - sg * (ca * dcol + sa * dboth)

        dout = dout_ref[i]             # (S, C)
        spec = spec_ref[i]             # (S, C)
        if transpose:
            # forward was out = W^T spec: dL/dW = spec dout^T, dspec = W dout
            dspec_ref[i] = jnp.dot(w, dout,
                                   preferred_element_type=jnp.float32)
            A = jnp.dot(spec, dout.T, preferred_element_type=jnp.float32)
        else:
            dspec_ref[i] = jnp.dot(w.T, dout,
                                   preferred_element_type=jnp.float32)
            A = jnp.dot(dout, spec.T, preferred_element_type=jnp.float32)

        dca_ref[i:i + 1, :] = jnp.sum(A * (cg * d - sg * dcol), axis=1,
                                      keepdims=True).T
        dsa_ref[i:i + 1, :] = jnp.sum(A * (cg * drow - sg * dboth), axis=1,
                                      keepdims=True).T
        dcg_ref[i:i + 1, :] = jnp.sum(A * (ca * d + sa * drow), axis=0,
                                      keepdims=True)
        dsg_ref[i:i + 1, :] = -jnp.sum(A * (ca * dcol + sa * dboth), axis=0,
                                       keepdims=True)

        g1 = (ca * cg) * A
        g2 = (sa * cg) * A
        g3 = -(ca * sg) * A
        g4 = -(sa * sg) * A

        # dt_m = <g, C_m> for all m at once (vector stores only — Mosaic
        # rejects scalar stores to VMEM)
        def contract(gmat, cref):
            tmp = jnp.sum(gmat[None] * cref[:], axis=2)     # (M, S)
            return jnp.sum(tmp, axis=1, keepdims=True)      # (M, 1)

        dt = (contract(g1, c_ref) + contract(g2, crow_ref)
              + contract(g3, ccol_ref) + contract(g4, cboth_ref))
        dt_ref[i:i + 1, :] = dt.T


@functools.lru_cache(maxsize=32)
def _make_op(L, channels, transpose, block_b, interpret):
    """custom_vjp op over padded trig features: forward and backward are
    both Pallas kernels, so the fused path is fully trainable."""
    freqs_np, Cc, Crow, Ccol, Cboth = _kernel_coeffs(L)
    M = Cc.shape[0]
    S = (L + 1) ** 2
    # keep as numpy: this function is lru_cached, and a jnp constant created
    # while tracing would memoize a tracer from that trace (leak on reuse);
    # numpy operands are lifted into each trace at bind time instead.
    consts = tuple(np.asarray(x, np.float32) for x in (Cc, Crow, Ccol, Cboth))

    def batch_spec(*trail):
        return pl.BlockSpec((block_b,) + trail,
                            lambda i: (i,) + (0,) * len(trail),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    const_specs = [const_spec((M, S, S))] * 4

    def forward(t, ca, sa, cg, sg, spec):
        Bp = t.shape[0]
        return pl.pallas_call(
            functools.partial(_wigner_apply_kernel, transpose=transpose,
                              block_b=block_b, num_freqs=M),
            out_shape=jax.ShapeDtypeStruct((Bp, S, channels), jnp.float32),
            grid=(Bp // block_b,),
            in_specs=[batch_spec(M), batch_spec(S), batch_spec(S),
                      batch_spec(S), batch_spec(S),
                      batch_spec(S, channels)] + const_specs,
            out_specs=batch_spec(S, channels),
            interpret=interpret,
        )(t, ca, sa, cg, sg, spec, *consts)

    @jax.custom_vjp
    def op(t, ca, sa, cg, sg, spec):
        return forward(t, ca, sa, cg, sg, spec)

    def op_fwd(t, ca, sa, cg, sg, spec):
        return forward(t, ca, sa, cg, sg, spec), (t, ca, sa, cg, sg, spec)

    def op_bwd(res, dout):
        t, ca, sa, cg, sg, spec = res
        Bp = t.shape[0]
        outs = pl.pallas_call(
            functools.partial(_wigner_bwd_kernel, transpose=transpose,
                              block_b=block_b, num_freqs=M),
            out_shape=(
                jax.ShapeDtypeStruct((Bp, M), jnp.float32),
                jax.ShapeDtypeStruct((Bp, S), jnp.float32),
                jax.ShapeDtypeStruct((Bp, S), jnp.float32),
                jax.ShapeDtypeStruct((Bp, S), jnp.float32),
                jax.ShapeDtypeStruct((Bp, S), jnp.float32),
                jax.ShapeDtypeStruct((Bp, S, channels), jnp.float32),
            ),
            grid=(Bp // block_b,),
            in_specs=[batch_spec(M), batch_spec(S), batch_spec(S),
                      batch_spec(S), batch_spec(S),
                      batch_spec(S, channels),
                      batch_spec(S, channels)] + const_specs,
            out_specs=(batch_spec(M), batch_spec(S), batch_spec(S),
                       batch_spec(S), batch_spec(S),
                       batch_spec(S, channels)),
            interpret=interpret,
        )(t, ca, sa, cg, sg, spec, dout, *consts)
        return outs

    op.defvjp(op_fwd, op_bwd)
    return op


def block_wigner_matrix_multiply_pallas(angles, spectrum, max_degree,
                                        transpose=False, block_b=8,
                                        interpret=None):
    """Fused W(angles) @ spectrum, shapes (B, 3) x (B, S, C) -> (B, S, C).

    Same value as ops.block_wigner_matrix_multiply (tested to fp32
    tolerance); the W matrix never touches HBM. Differentiable: the
    backward pass is a second fused Pallas kernel (custom VJP over the
    trig features; angle and spectrum gradients flow).
    """
    angles = jnp.asarray(angles, jnp.float32)
    B = angles.shape[0]
    L = max_degree
    if spectrum.ndim == 2:
        spectrum = jnp.broadcast_to(spectrum[None], (B,) + spectrum.shape)
    spectrum = spectrum.astype(jnp.float32)
    C = spectrum.shape[-1]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    freqs_np, *_ = _kernel_coeffs(L)
    freqs = jnp.asarray(freqs_np)

    # host-side tiny precompute (XLA-fused, differentiable): trig features
    a, b, g = angles[:, 0], angles[:, 1], angles[:, 2]
    t = _trig_basis(b, L)                              # (B, 2L+1)
    ca, sa = jnp.cos(freqs * a[:, None]), jnp.sin(freqs * a[:, None])
    cg, sg = jnp.cos(freqs * g[:, None]), jnp.sin(freqs * g[:, None])

    # pad batch to a multiple of block_b
    pad = (-B) % block_b
    if pad:
        t, ca, sa, cg, sg, spectrum = (
            jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            for x in (t, ca, sa, cg, sg, spectrum))

    op = _make_op(L, C, transpose, block_b, interpret)
    return op(t, ca, sa, cg, sg, spectrum)[:B]
