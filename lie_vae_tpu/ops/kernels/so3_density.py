"""Pallas TPU kernel: fused SO(3) wrapped pushforward log-density.

One kernel computes, per sample, the full 2k+1-shell evaluation
(reference: lie_vae/reparameterize.py:233-263):
  theta = |v|; for each shell j: Gaussian log-density at u*(theta + 2 pi j)
  summed over the algebra axis + log volume correction, then a logsumexp
  over shells — all in VMEM, no (N, 2k+1, 3) intermediate in HBM.

The (N, 2k+1, 3) expansion the XLA path materializes is the dominant HBM
traffic of the KL at scale; here it never leaves the chip.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _density_kernel(v_ref, sigma_ref, shells_ref, out_ref, *, clamp):
    # Transposed layout: samples live on the 128-lane axis, the small
    # algebra (3) / shell (2k+1) axes on sublanes — no lane padding waste.
    #
    # Per-shell work is one transcendental (the exp), not three: the
    # volume denominator is shell-independent (cos(theta + 2 pi j) ==
    # cos(theta) exactly) so its log factors out of the logsumexp, and the
    # per-shell log of the clamped numerator is folded into the sum
    #   logsumexp_j y_j = log sum_j max(th_j^2, c) e^{-q(th_j^2 - m2)/2}
    #                     - q m2 / 2 - log denom + const
    # with m2 = min_j th_j^2 providing the max-shift (exponents <= 0, and
    # the sum >= the clamped m2 term > 0, so no over/underflow).
    v = v_ref[:]                                     # (3, TN)
    sigma = sigma_ref[:]                             # (3, TN)
    shells = shells_ref[:]                           # (2k+1, 1)

    theta = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))    # (1, TN)
    u = v / jnp.maximum(theta, 1e-12)                          # (3, TN)

    # sum_k N(u_k * theta_hat; 0, sigma_k): factored quadratic form
    #   sum_k (u_k theta_hat / sigma_k)^2 = theta_hat^2 * sum_k (u_k/sigma_k)^2
    q = jnp.sum((u / sigma) ** 2, axis=0, keepdims=True)       # (1, TN)
    log_norm = jnp.sum(jnp.log(sigma), axis=0, keepdims=True)  # (1, TN)

    theta_hat = shells + theta                                 # (2k+1, TN)
    th_sq = theta_hat * theta_hat
    m2 = jnp.min(th_sq, axis=0, keepdims=True)                 # (1, TN)
    E = jnp.sum(jnp.maximum(th_sq, clamp)
                * jnp.exp(-0.5 * q * (th_sq - m2)),
                axis=0, keepdims=True)                         # (1, TN)
    denom = jnp.maximum(2.0 - 2.0 * jnp.cos(theta), clamp)     # (1, TN)
    out_ref[:] = (jnp.log(E) - 0.5 * q * m2 - jnp.log(denom)
                  - log_norm - 1.5 * math.log(2.0 * math.pi))


def _density_bwd_kernel(v_ref, sigma_ref, shells_ref, g_ref,
                        dv_ref, ds_ref, *, clamp):
    """Analytic backward. With w_j = softmax(y_j) over shells,
    A = sum_j w_j dy_j/dtheta_hat_j, B = sum_j w_j theta_hat_j^2:

      dv    = g [ A u - (B / theta) (u / sigma^2 - q u) ]
      dsigma= g [ B u^2 / sigma^3 - 1 / sigma ]
    """
    v = v_ref[:]                                     # (3, TN)
    sigma = sigma_ref[:]                             # (3, TN)
    shells = shells_ref[:]                           # (2k+1, 1)
    g = g_ref[:]                                     # (1, TN)

    theta = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    theta_s = jnp.maximum(theta, 1e-12)
    u = v / theta_s
    theta_hat = shells + theta                       # (2k+1, TN)
    q = jnp.sum((u / sigma) ** 2, axis=0, keepdims=True)

    # shell weights w_j = softmax_j(y_j), computed log-free as in the
    # forward kernel (the shared -log denom cancels in the softmax)
    th_sq = theta_hat * theta_hat
    m2 = jnp.min(th_sq, axis=0, keepdims=True)
    e = jnp.maximum(th_sq, clamp) * jnp.exp(-0.5 * q * (th_sq - m2))
    w = e / jnp.sum(e, axis=0, keepdims=True)        # (2k+1, TN)

    # dy_j / dtheta_hat_j, with the clamp kill-switches; the volume
    # denominator is shell-independent (cos(theta_hat) == cos(theta)), so
    # its derivative term is a constant across shells (sum_j w_j = 1)
    denom = 2.0 - 2.0 * jnp.cos(theta)               # (1, TN)
    A = (jnp.sum(w * (-q * theta_hat
                      + jnp.where(th_sq > clamp, 2.0 / theta_hat, 0.0)),
                 axis=0, keepdims=True)
         - jnp.where(denom > clamp,
                     2.0 * jnp.sin(theta) / jnp.maximum(denom, clamp),
                     0.0))                           # (1, TN)
    B = jnp.sum(w * th_sq, axis=0, keepdims=True)    # (1, TN)

    sig2 = sigma * sigma
    dv_ref[:] = g * (A * u - (B / theta_s) * (u / sig2 - q * u))
    ds_ref[:] = g * (B * (u * u) / (sig2 * sigma) - 1.0 / sigma)


@functools.lru_cache(maxsize=16)
def _make_density_op(k, clamp, block_n, interpret):
    shells = (2.0 * math.pi
              * np.arange(-k, k + 1, dtype=np.float32))[:, None]
    # numpy, not jnp: this function is lru_cached, and a jnp constant made
    # while tracing would memoize that trace's tracer (leaks on reuse).
    shells_j = shells
    n_shells = 2 * k + 1

    def specs(i_rows):
        return pl.BlockSpec((i_rows, block_n), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    shell_spec = pl.BlockSpec((n_shells, 1), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    def forward(vt, st):
        Np = vt.shape[1]
        return pl.pallas_call(
            functools.partial(_density_kernel, clamp=clamp),
            out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
            grid=(Np // block_n,),
            in_specs=[specs(3), specs(3), shell_spec],
            out_specs=specs(1),
            interpret=interpret,
        )(vt, st, shells_j)

    @jax.custom_vjp
    def op(vt, st):
        return forward(vt, st)

    def op_fwd(vt, st):
        return forward(vt, st), (vt, st)

    def op_bwd(res, g):
        vt, st = res
        Np = vt.shape[1]
        dv, ds = pl.pallas_call(
            functools.partial(_density_bwd_kernel, clamp=clamp),
            out_shape=(jax.ShapeDtypeStruct((3, Np), jnp.float32),
                       jax.ShapeDtypeStruct((3, Np), jnp.float32)),
            grid=(Np // block_n,),
            in_specs=[specs(3), specs(3), shell_spec, specs(1)],
            out_specs=(specs(3), specs(3)),
            interpret=interpret,
        )(vt, st, shells_j, g)
        return dv, ds

    op.defvjp(op_fwd, op_bwd)
    return op


def so3_wrapped_log_density_pallas(v, sigma, k=10, clamp=1e-3,
                                   block_n=8192, interpret=None):
    """Fused wrapped log-density. v: (n, B, 3), sigma: (B, 3) -> (n, B).

    Same value as distributions.so3.so3_wrapped_log_density (uses the
    factored quadratic form, exact for diagonal sigma).
    """
    v = jnp.asarray(v, jnp.float32)
    n, b = v.shape[0], v.shape[1]
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32)[None],
                             (n, b, 3)).reshape(-1, 3)
    vf = v.reshape(-1, 3)
    N = vf.shape[0]
    block_n = min(block_n, max(128, 1 << (N - 1).bit_length()))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pad = (-N) % block_n
    vt = jnp.pad(vf, ((0, pad), (0, 0))).T                    # (3, Np)
    st = jnp.pad(sigma, ((0, pad), (0, 0)),
                 constant_values=1.0).T                        # (3, Np)

    op = _make_density_op(k, clamp, block_n, interpret)
    out = op(vt, st)
    return out[0, :N].reshape(n, b)
