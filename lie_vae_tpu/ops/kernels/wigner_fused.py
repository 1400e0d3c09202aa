"""Pallas TPU kernel: the factored Z(a) J Z(b) J Z(g) Wigner chain, fused.

This is the chain `ops.block_wigner_apply_zjz` evaluates with XLA ops
(reference semantics: lie_vae/lie_tools.py:226-253), implemented as ONE
kernel so the four chain intermediates never round-trip through HBM —
the XLA path materializes each stage (6+ passes over (B, S, C) buffers).

Layout and algebra
------------------
The spectrum rides FLAT: (B, S*C) with s-major/c-minor lanes — exactly the
reshape of (B, S, C), so S*C = 490 pads to 512 lanes (4% tax) and matches
the measured-best HBM copy bandwidth of the candidate layouts
(scripts/bench_sol.py). With the z-rotation written as
Z(t) x = c_t (.) x + s_t (.) (P x) (P = block-local index reversal,
c/s = cos/sin(f_i t)), tracking every intermediate TOGETHER WITH its
reversal (h, P h) makes each z-rotation purely elementwise, so the chain
needs only the two constants J~ = (J kron I_C) and PJ~ = (P J kron I_C):

    zx = cg.x + sg.Px                  (P x supplied from XLA, fused gather)
    y  = zx J~         py = zx PJ~
    zy = cb.y + sb.py
    z  = zy J~         pz = zy PJ~
    out = ca.z + sa.pz

— 4 MXU dots of (block_b, SC) x (SC, SC) per block (the first r2 variant
used 6 dots against 4 constants; the pair form is 1/3 fewer MACs and
half the constant VMEM). The Kronecker-with-I_C constants cost a factor
C in MACs over the minimal 2-matmul algorithm, which bf16 inputs (f32
accumulation — the same numeric class as the XLA path at TPU-default
matmul precision) make cheap.

Trig enters COMPACT (measured v1 lesson, BENCHMARKS.md): cos(f_i t) takes
only |f_i| in {0..L} distinct values per angle, and the VPU's sin rate
(~36 Gop/s measured) makes full-width (B, S*C) trig the dominant cost of
a naive kernel. So the wrapper computes 2(L+1) trig FEATURES per angle in
XLA (6(L+1) lanes total, ~0.6M transcendentals at B=8192 instead of 24M)
and the kernel expands them to (block_b, S*C) with exact 0/+-1 selection
dots against constant matrices Eca/Esa — MXU work, no wide trig anywhere.

Backward pass (custom VJP) reuses the SAME kernel: dx = W^T dout is the
chain with angles (-g, -b, -a), whose trig features are sign-flips of the
forward features (no new trig), and whose saved stage intermediates
(y, z forward; A = J Z(-a) dout, V = J Z(-b) A backward) give the
feature cotangents as six XLA (B, SC) @ (SC, L+1) reductions:

    d tc_a = (dout.z) Eca^T     d ts_a = (dout.Pz) Esa^T
    d tc_b = (A.y)    Eca^T     d ts_b = -((PA).y) Esa^T
    d tc_g = (V.x)    Eca^T     d ts_g = -((PV).x) Esa^T

(the cotangent formulas are properties of the chain VALUE, so they are
unchanged by the pair-form rewrite — verified in tests). Angle gradients
then flow through the wrapper's (differentiable) feature computation.

VMEM: 2 (SC, SC) + 2 (L+1, SC) constants + ~10 (block_b, SC) live
arrays; SC is capped at 1024 (2 f32 constants ~ 8.4 MB of ~16 MB VMEM) —
the flagship L=6, C=10 has SC = 490. Larger reps fall back to the XLA
zjz path at the dispatch site.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lie_vae_tpu.ops.wigner import _block_j, _coeffs

MAX_FUSED_SC = 1024  # 2 float32 (SC, SC) constants ~ 8.4 MB of ~16 MB VMEM


@functools.lru_cache(maxsize=16)
def _fused_consts(max_degree, channels, dtype_name):
    """(freqs, rev_exp, Eca, Esa, Jt, PJt) — numpy (lru_cached: jnp arrays
    created while tracing would leak tracers across traces).

    The two matmul constants are pre-transposed for row-vector dots
    (x @ M applies M^T on the left) and pre-Kroneckered with I_C for the
    flat s-major/c-minor lane layout. Eca/Esa expand per-angle trig
    features [cos(m t)]_m / [sin(m t)]_m, m in 0..L, to full-lane
    cos(f_i t) / sin(f_i t) (sign(f_i) folded into Esa).
    """
    freqs, rev, _ = _coeffs(max_degree)
    J = _block_j(max_degree)                     # (S, S) float64
    S = J.shape[0]
    L1 = max_degree + 1
    P = np.zeros((S, S))
    P[np.arange(S), rev] = 1.0                   # (P x)[i] = x[rev i]
    eye_c = np.eye(channels)
    dt = np.dtype(dtype_name)

    def pack(M):                                 # (M kron I_C)^T, compute dt
        return np.kron(M, eye_c).T.astype(dt)

    f_exp = np.repeat(freqs, channels)                      # (SC,)
    rev_exp = (rev[:, None] * channels
               + np.arange(channels)[None, :]).reshape(-1).astype(np.int32)
    m_exp = np.abs(f_exp).astype(np.int64)
    Eca = np.zeros((L1, S * channels))
    Eca[m_exp, np.arange(S * channels)] = 1.0
    Esa = np.zeros((L1, S * channels))
    Esa[m_exp, np.arange(S * channels)] = np.sign(f_exp)
    return (f_exp.astype(np.float32), rev_exp, Eca.astype(dt),
            Esa.astype(dt), pack(J), pack(P @ J))


def trig_features(angles, max_degree):
    """(B, 6(L+1)) float32: [cos(m a), sin(m a), cos(m b), sin(m b),
    cos(m g), sin(m g)] for m = 0..L — the kernel's compact trig input.
    Differentiable; this is where angle gradients enter."""
    angles = jnp.asarray(angles, jnp.float32).reshape(-1, 3)
    m = jnp.arange(0, max_degree + 1, dtype=jnp.float32)
    arg = angles[:, :, None] * m[None, None, :]         # (B, 3, L+1)
    feats = jnp.stack([jnp.cos(arg), jnp.sin(arg)], axis=2)  # (B,3,2,L+1)
    return feats.reshape(angles.shape[0], -1)


def _reverse_features(T, L1):
    """Features of the transposed chain (-g, -b, -a) from the forward
    features: swap the a/g slots and negate every sin block."""
    t = T.reshape(T.shape[0], 3, 2, L1)
    t = t[:, ::-1]                                     # swap a <-> g
    return jnp.concatenate(
        [t[:, :, :1], -t[:, :, 1:]], axis=2).reshape(T.shape[0], -1)


def _chain_kernel(t_ref, x_ref, px_ref, eca_ref, esa_ref, jt_ref, pjt_ref,
                  out_ref, y_ref, z_ref, *, L1, compute_dtype,
                  save_residuals):
    x = x_ref[:]                                      # (bb, SC) f32
    px = px_ref[:]                                    # (bb, SC) = x[rev]
    cd = compute_dtype

    def expand(slot, which):
        # slot: 0=a, 1=b, 2=g; which: 0=cos, 1=sin. Exact selection dot
        # (0 / +-1 entries, one term per output lane).
        off = (2 * slot + which) * L1
        t = t_ref[:, off:off + L1].astype(cd)
        e_ref = eca_ref if which == 0 else esa_ref
        return jnp.dot(t, e_ref[:], preferred_element_type=jnp.float32)

    def jpair(h):
        hc = h.astype(cd)
        return (jnp.dot(hc, jt_ref[:], preferred_element_type=jnp.float32),
                jnp.dot(hc, pjt_ref[:], preferred_element_type=jnp.float32))

    cg, sg = expand(2, 0), expand(2, 1)
    y, py = jpair(cg * x + sg * px)                   # J Z(g) x and its P
    cb, sb = expand(1, 0), expand(1, 1)
    z, pz = jpair(cb * y + sb * py)                   # J Z(b) y and its P
    ca, sa = expand(0, 0), expand(0, 1)
    out_ref[:] = ca * z + sa * pz                     # Z(a) z
    if save_residuals:
        y_ref[:] = y
        z_ref[:] = z


def _plain_kernel(t_ref, x_ref, px_ref, eca_ref, esa_ref, jt_ref, pjt_ref,
                  out_ref, *, L1, compute_dtype):
    _chain_kernel(t_ref, x_ref, px_ref, eca_ref, esa_ref, jt_ref, pjt_ref,
                  out_ref, None, None, L1=L1,
                  compute_dtype=compute_dtype, save_residuals=False)


@functools.lru_cache(maxsize=32)
def _chain_call(L, C, block_b, compute_dtype_name, save_residuals,
                interpret):
    _, rev_exp_np, Eca, Esa, Jt, PJt = _fused_consts(L, C,
                                                     compute_dtype_name)
    SC = Jt.shape[0]
    L1 = L + 1
    cd = jnp.dtype(compute_dtype_name)

    def batch_spec(cols):
        return pl.BlockSpec((block_b, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [batch_spec(6 * L1), batch_spec(SC), batch_spec(SC),
                const_spec((L1, SC)), const_spec((L1, SC)),
                const_spec((SC, SC)), const_spec((SC, SC))]

    def prow(x):
        # the lane-reversal partner enters from XLA (a gather the compiler
        # fuses into the producer) — Mosaic supports no lane gathers
        return jnp.take(x, jnp.asarray(rev_exp_np), axis=1)

    if save_residuals:
        def call(T, x):
            Bp = x.shape[0]
            return pl.pallas_call(
                functools.partial(_chain_kernel, L1=L1, compute_dtype=cd,
                                  save_residuals=True),
                out_shape=tuple(jax.ShapeDtypeStruct((Bp, SC), jnp.float32)
                                for _ in range(3)),
                grid=(Bp // block_b,),
                in_specs=in_specs,
                out_specs=tuple(batch_spec(SC) for _ in range(3)),
                interpret=interpret,
            )(T, x, prow(x), Eca, Esa, Jt, PJt)
        return call

    def call_plain(T, x):
        Bp = x.shape[0]
        return pl.pallas_call(
            functools.partial(_plain_kernel, L1=L1, compute_dtype=cd),
            out_shape=jax.ShapeDtypeStruct((Bp, SC), jnp.float32),
            grid=(Bp // block_b,),
            in_specs=in_specs,
            out_specs=batch_spec(SC),
            interpret=interpret,
        )(T, x, prow(x), Eca, Esa, Jt, PJt)

    return call_plain


@functools.lru_cache(maxsize=32)
def _make_fused_op(L, C, block_b, compute_dtype_name, interpret):
    """custom_vjp op over (T (Bp, 6(L+1)) trig features, x (Bp, SC)) —
    Bp already padded to a block_b multiple. Returns out (Bp, SC) f32."""
    _, rev_exp_np, Eca, Esa, *_ = _fused_consts(L, C, compute_dtype_name)
    L1 = L + 1
    plain = _chain_call(L, C, block_b, compute_dtype_name, False, interpret)
    with_res = _chain_call(L, C, block_b, compute_dtype_name, True,
                           interpret)
    EcaT = Eca.T.astype(np.float32)          # (SC, L+1)
    EsaT = Esa.T.astype(np.float32)

    @jax.custom_vjp
    def op(T, x):
        return plain(T, x)

    def op_fwd(T, x):
        out, y, z = with_res(T, x)
        return out, (T, x, y, z)

    def op_bwd(res, dout):
        T, x, y, z = res
        # one fused call evaluates the transposed chain on dout, yielding
        # dx plus the backward stage intermediates A, V (see module doc)
        dx, A, V = with_res(_reverse_features(T, L1), dout)

        rev_exp = jnp.asarray(rev_exp_np)
        eca_t = jnp.asarray(EcaT)
        esa_t = jnp.asarray(EsaT)

        def prow(h):
            return jnp.take(h, rev_exp, axis=1)

        def block(coeff, h, e_t, sign=1.0):
            return sign * jnp.dot(coeff * h, e_t)        # (B, L+1)

        dT = jnp.concatenate([
            block(dout, z, eca_t), block(dout, prow(z), esa_t),
            block(A, y, eca_t), block(prow(A), y, esa_t, -1.0),
            block(V, x, eca_t), block(prow(V), x, esa_t, -1.0),
        ], axis=1)
        return dT, dx

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
    with compute_dtype=float32 to Mosaic-f32-dot precision (~1e-6 in
    interpret mode; pinned by tests/test_kernels.py).
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

    T = trig_features(angles, max_degree)

    block_b = min(block_b, max(8, 1 << (B - 1).bit_length()))
    pad = (-B) % block_b
    if pad:
        T = jnp.pad(T, ((0, pad), (0, 0)))
        spectrum_flat = jnp.pad(spectrum_flat, ((0, pad), (0, 0)))

    op = _make_fused_op(max_degree, C, block_b,
                        jnp.dtype(compute_dtype).name, interpret)
    return op(T, spectrum_flat)[:B]


def block_wigner_apply_fused_rows(angles, spectrum_cbs, max_degree,
                                  transpose=False, block_b=256,
                                  compute_dtype=jnp.bfloat16,
                                  interpret=None):
    """Fused apply for LARGE reps: channels ride the ROW axis.

    spectrum_cbs: (C, B, S) channel-major planes (or (B, S) for C=1);
    returns the same shape. Each (B, S) plane goes through the C=1 flat
    kernel as extra rows (features tiled per plane), so only S — not
    S*C — must fit the VMEM constant budget: this serves e.g. L=10
    (S=121) at any channel count. Callers holding the natural (B, S, C)
    layout pay two XLA transposes (one pass each); keep spectra
    channel-major to skip them.
    """
    angles = jnp.asarray(angles, jnp.float32).reshape((-1, 3))
    B = angles.shape[0]
    S = (max_degree + 1) ** 2
    if spectrum_cbs.ndim == 2:
        spectrum_cbs = spectrum_cbs[None]
    C = spectrum_cbs.shape[0]
    assert spectrum_cbs.shape[1] in (B, 1) and spectrum_cbs.shape[2] == S, \
        (spectrum_cbs.shape, B, S)
    if spectrum_cbs.shape[1] == 1:
        spectrum_cbs = jnp.broadcast_to(spectrum_cbs, (C, B, S))
    if transpose:
        angles = -angles[:, ::-1]

    rows = spectrum_cbs.reshape(C * B, S).astype(jnp.float32)
    T = jnp.tile(trig_features(angles, max_degree), (C, 1))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_b = min(block_b, max(8, 1 << (C * B - 1).bit_length()))
    pad = (-C * B) % block_b
    if pad:
        T = jnp.pad(T, ((0, pad), (0, 0)))
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
    op = _make_fused_op(max_degree, 1, block_b,
                        jnp.dtype(compute_dtype).name, interpret)
    return op(T, rows)[:C * B].reshape(C, B, S)


def block_wigner_matrix_multiply_fused(angles, spectrum, max_degree,
                                       transpose=False, block_b=256,
                                       compute_dtype=jnp.bfloat16,
                                       interpret=None):
    """(B, S, C)-shaped convenience wrapper over the fused kernels:
    flat-lane layout when S*C fits the VMEM constant budget, otherwise
    the channels-as-rows path (needs only S to fit)."""
    if spectrum.ndim == 2:
        S, C = spectrum.shape
        flat = spectrum.reshape(-1)
    else:
        _, S, C = spectrum.shape
        flat = spectrum.reshape(spectrum.shape[0], -1)
    if S * C <= MAX_FUSED_SC:
        out = block_wigner_apply_fused_flat(
            angles, flat, max_degree, transpose=transpose, block_b=block_b,
            compute_dtype=compute_dtype, interpret=interpret)
        return out.reshape(out.shape[0], S, C)
    assert S <= MAX_FUSED_SC, (
        f"fused Wigner kernel needs S <= {MAX_FUSED_SC}; got S={S}")
    cbs = (jnp.moveaxis(spectrum, -1, 0) if spectrum.ndim == 3
           else spectrum.T[:, None, :])
    out = block_wigner_apply_fused_rows(
        angles, cbs, max_degree, transpose=transpose, block_b=block_b,
        compute_dtype=compute_dtype, interpret=interpret)
    return jnp.moveaxis(out, 0, -1)
