"""Gaussian latent distributions — functional counterparts of the reference's
stateful ``Nreparameterize`` / ``N0reparameterize`` modules
(lie_vae/reparameterize.py:16-55, 100-145).

The reference stashes ``self.mu / self.sigma / self.z`` in ``forward`` and
reads them back in ``kl()`` / ``log_posterior()``. Here each sample returns an
explicit stats struct (a pytree) carrying the same quantities; all densities
are pure functions of it. Everything is jit/vmap/grad-safe.
"""
import math

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = math.log(2.0 * math.pi)


def _normal_log_prob(z, mu, sigma):
    """Elementwise N(mu, sigma) log-density (sigma is a std-dev)."""
    return -0.5 * ((z - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * _LOG_2PI


@struct.dataclass
class GaussianStats:
    """Posterior stats of a diagonal Gaussian latent.

    mu, sigma: (B, D); z: (n, B, D) samples (n = sample axis).
    """
    mu: jnp.ndarray
    sigma: jnp.ndarray
    z: jnp.ndarray

    def kl(self):
        """Closed-form KL(q || N(0, I)), (B,).

        Reference: Nreparameterize.kl, lie_vae/reparameterize.py:36.
        """
        return -0.5 * jnp.sum(
            1.0 + 2.0 * jnp.log(self.sigma) - self.mu ** 2 - self.sigma ** 2,
            axis=-1)

    def log_posterior(self, z=None):
        """log q(z | x), (n, B). Reference: reparameterize.py:38-42."""
        z = self.z if z is None else z
        return jnp.sum(_normal_log_prob(z, self.mu, self.sigma), axis=-1)

    def log_prior(self):
        """log p(z) under N(0, I), (n, B). Reference: reparameterize.py:44-45."""
        return jnp.sum(_normal_log_prob(self.z, 0.0, 1.0), axis=-1)


def sample_gaussian(key, mu, sigma, n=1, deterministic=False):
    """Draw n reparameterized samples; returns :class:`GaussianStats`.

    Reference: Nreparameterize.nsample, lie_vae/reparameterize.py:47-51
    (including the return-means 'deterministic' AE mode).
    """
    if deterministic:
        z = jnp.broadcast_to(mu, (n,) + mu.shape)
    else:
        eps = jax.random.normal(key, (n,) + mu.shape, dtype=mu.dtype)
        z = mu + eps * sigma
    return GaussianStats(mu=mu, sigma=sigma, z=z)


@struct.dataclass
class ZeroMeanGaussianStats:
    """Posterior stats of a zero-mean diagonal Gaussian (algebra noise).

    sigma: (B, D); z: (n, B, D).
    """
    sigma: jnp.ndarray
    z: jnp.ndarray

    def kl(self):
        """Reference: N0reparameterize.kl, lie_vae/reparameterize.py:125-126."""
        return -0.5 * jnp.sum(
            1.0 + 2.0 * jnp.log(self.sigma) - self.sigma ** 2, axis=-1)

    def log_posterior(self, z=None):
        """log q(z | x); sums the last axis. For z with extra broadcast axes
        (the SO(3) shell evaluation) the caller keeps the axes it needs.

        Reference: N0reparameterize._log_posterior, reparameterize.py:131-132.
        """
        z = self.z if z is None else z
        return jnp.sum(_normal_log_prob(z, 0.0, self.sigma), axis=-1)

    def log_prior(self):
        return jnp.sum(_normal_log_prob(self.z, 0.0, 1.0), axis=-1)


def sample_zero_mean_gaussian(key, sigma, n=1, deterministic=False):
    """Reference: N0reparameterize.nsample, lie_vae/reparameterize.py:137-141."""
    if deterministic:
        z = jnp.zeros((n,) + sigma.shape, dtype=sigma.dtype)
    else:
        eps = jax.random.normal(key, (n,) + sigma.shape, dtype=sigma.dtype)
        z = eps * sigma
    return ZeroMeanGaussianStats(sigma=sigma, z=z)
