"""SO(3) pushforward latent distribution — the paper's core.

Sample: z = mu_lie @ exp(v), v ~ N(0, diag(sigma^2)) on the algebra.
Density: exact pushforward with wrapping over 2k+1 shells
(theta_hat = theta + 2*pi*j, j in [-k, k]) and the exp-map volume Jacobian
log(theta_hat^2 / (2 - 2 cos theta_hat)).

Functional counterpart of the reference's stateful ``SO3reparameterize``
(lie_vae/reparameterize.py:200-278). The wrapped log-density
(reparameterize.py:233-263) is fully vectorized over (n, B, shells) — one
fused XLA computation, no Python loops — and is differentiable under
jax.grad (safe divide for v / ||v||, same 1e-3 clamps as the reference).
"""
import math

import jax
import jax.numpy as jnp
from flax import struct

from lie_vae_tpu.distributions.normal import (
    ZeroMeanGaussianStats, sample_zero_mean_gaussian)
from lie_vae_tpu.ops import so3 as so3_ops

LOG_HAAR_UNIFORM = -math.log(8.0 * math.pi ** 2)


@struct.dataclass
class SO3Stats:
    """Posterior stats of the SO(3) pushforward latent.

    mu_lie: (B, 3, 3) mean rotation; inner: algebra-noise Gaussian stats
    with sigma (B, 3) and v = inner.z (n, B, 3); z: (n, B, 3, 3) group
    samples; k: shell truncation (static).
    """
    mu_lie: jnp.ndarray
    inner: ZeroMeanGaussianStats
    z: jnp.ndarray
    k: int = struct.field(pytree_node=False, default=10)
    density_impl: str = struct.field(pytree_node=False, default="xla")

    def kl(self):
        """MC estimate E_q[log q - log p], mean over the sample axis, (B,).

        Reference: SO3reparameterize.kl, lie_vae/reparameterize.py:227-231.
        """
        return jnp.mean(self.log_posterior() - self.log_prior(), axis=0)

    def log_posterior(self, impl=None):
        """Wrapped pushforward log-density at the drawn samples, (n, B).

        Reference: SO3reparameterize.log_posterior,
        lie_vae/reparameterize.py:233-263 (same shell count, same 1e-3
        clamps on theta_hat^2 and 2-2cos(theta_hat)).

        impl: 'xla' (default) | 'pallas' (fused TPU kernel with a
        custom-VJP backward kernel — trainable) | 'auto' (pallas on TPU
        for large batches).
        """
        return so3_wrapped_log_density(self.inner.z, self.inner.sigma,
                                       self.k,
                                       impl=impl or self.density_impl)

    def log_prior(self):
        """Haar-uniform prior: constant -log(8 pi^2), (n, B).

        Reference: SO3reparameterize.log_prior, reparameterize.py:265-267.
        """
        n, b = self.inner.z.shape[0], self.inner.z.shape[1]
        return jnp.full((n, b), LOG_HAAR_UNIFORM, dtype=self.inner.z.dtype)


def so3_wrapped_log_density(v, sigma, k=10, clamp=1e-3, impl="xla"):
    """log q(exp(v)) for the pushforward of N(0, diag(sigma^2)) to SO(3).

    v: (n, B, 3) algebra samples; sigma: (B, 3). Returns (n, B).

    For each shell j in [-k, k]: evaluate the algebra Gaussian at
    u * (theta + 2 pi j) and add the log volume term, then logsumexp.

    impl='pallas' uses the fused VMEM kernel (ops/kernels/so3_density.py),
    ~2x the XLA path at large N on TPU, with an analytic custom-VJP
    backward kernel (trainable); 'auto' picks it for large batches on TPU.
    """
    if impl not in ("xla", "pallas", "fused", "auto"):
        raise ValueError(f"unknown so3 density impl {impl!r} "
                         "(expected 'xla', 'pallas', 'fused', or 'auto')")
    if impl == "fused":
        # the model-level kernel_impl knob names the Pallas family
        # 'fused'; for the density that IS the pallas kernel
        impl = "pallas"
    if impl != "xla":
        n_total = v.shape[0] * v.shape[1]
        on_tpu = jax.default_backend() == "tpu"
        if impl == "pallas" or (impl == "auto" and on_tpu
                                and n_total >= 2048):
            from lie_vae_tpu.ops.kernels import (
                so3_wrapped_log_density_pallas)
            return so3_wrapped_log_density_pallas(v, sigma, k=k, clamp=clamp)
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)            # (n,B,1)
    u = v / jnp.maximum(theta, 1e-12)                             # safe divide
    shells = 2.0 * math.pi * jnp.arange(-k, k + 1, dtype=v.dtype)  # (2k+1,)
    theta_hat = theta[..., None, :] + shells[:, None]             # (n,B,2k+1,1)
    x = u[..., None, :] * theta_hat                               # (n,B,2k+1,3)

    # N(0, sigma) log-density summed over the algebra axis; sigma broadcasts
    # (B, 3) -> (n, B, 2k+1, 3).
    log_p = jnp.sum(
        -0.5 * (x / sigma[..., None, :]) ** 2
        - jnp.log(sigma[..., None, :])
        - 0.5 * math.log(2.0 * math.pi), axis=-1)                 # (n,B,2k+1)

    theta_hat_sq = jnp.maximum(theta_hat ** 2, clamp)
    denom = jnp.maximum(2.0 - 2.0 * jnp.cos(theta_hat), clamp)
    log_vol = jnp.sum(jnp.log(theta_hat_sq / denom), axis=-1)     # (n,B,2k+1)

    return jax.nn.logsumexp(log_p + log_vol, axis=-1)


def sample_so3(key, mu_lie, sigma, n=1, k=10, deterministic=False,
               density_impl="xla"):
    """Draw n group samples z = mu_lie @ exp(v); returns :class:`SO3Stats`.

    Reference: SO3reparameterize.forward/nsample,
    lie_vae/reparameterize.py:220-225, 269-273 (deterministic mode returns
    the mean rotation, reparameterize.py:270-271).
    """
    inner = sample_zero_mean_gaussian(key, sigma, n=n,
                                      deterministic=deterministic)
    if deterministic:
        z = jnp.broadcast_to(mu_lie, (n,) + mu_lie.shape)
    else:
        v_lie = so3_ops.expmap(inner.z)                 # (n, B, 3, 3)
        z = mu_lie @ v_lie
    return SO3Stats(mu_lie=mu_lie, inner=inner, z=z, k=k,
                    density_impl=density_impl)
