"""Reparameterizer modules: Flax heads that map encoder features to latent
distributions and draw reparameterized samples.

Functional re-design of lie_vae/reparameterize.py: each module returns an
explicit stats struct (see lie_vae_tpu.distributions) instead of stashing
mu/sigma/z on self; ``kl``/``log_posterior``/``log_prior`` are methods of the
returned struct. Sampling randomness comes from the 'sample' RNG collection.
"""
import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from lie_vae_tpu import distributions as dist
from lie_vae_tpu import ops
from lie_vae_tpu.models.nets import Dense, uniform_init


# Floor on every softplus sigma head. The reference's bare softplus
# (reparameterize.py:26,116) underflows to 0 in f32 for logits < -90, which
# makes the wrapped/Gaussian log-density -inf (NaN under grad) and kills the
# run via the NaN-KL guard — observed in practice ~18k steps into a
# spherecube run. jnp.maximum is bit-exact for every sigma above the floor,
# so healthy training is unchanged; at the floor the KL blows up smoothly
# (finite grads) and the global-norm clip keeps the step bounded.
_SIGMA_FLOOR = 1e-6


class NormalReparameterize(nn.Module):
    """Diagonal Gaussian head. Reference: Nreparameterize,
    lie_vae/reparameterize.py:16-55 (mu linear + softplus sigma linear)."""
    z_dim: int
    deterministic: bool = False

    @nn.compact
    def __call__(self, h, n=1):
        mu = Dense(self.z_dim, name="mu")(h)
        sigma = jnp.maximum(nn.softplus(Dense(self.z_dim, name="sigma")(h)),
                            _SIGMA_FLOOR)
        key = self.make_rng("sample") if not self.deterministic else None
        return dist.sample_gaussian(key, mu, sigma, n=n,
                                    deterministic=self.deterministic)


class N0Reparameterize(nn.Module):
    """Zero-mean Gaussian head (algebra noise). Reference: N0reparameterize,
    lie_vae/reparameterize.py:100-145, incl. the fixed_sigma option
    (reparameterize.py:109-121)."""
    z_dim: int = 3
    fixed_sigma: Optional[float] = None
    deterministic: bool = False

    @nn.compact
    def __call__(self, h, n=1):
        if self.fixed_sigma is not None:
            sigma = jnp.full((h.shape[0], self.z_dim), self.fixed_sigma,
                             dtype=h.dtype)
        else:
            # NB: SO3Reparameterize carries its own copy of this head (it
            # cannot nest this module without renaming checkpoint paths) —
            # keep the two in sync
            sigma = jnp.maximum(
                nn.softplus(Dense(self.z_dim, name="sigma")(h)),
                _SIGMA_FLOOR)
        key = self.make_rng("sample") if not self.deterministic else None
        return dist.sample_zero_mean_gaussian(
            key, sigma, n=n, deterministic=self.deterministic)


class VmfReparameterize(nn.Module):
    """von Mises-Fisher head on S^{z_dim-1}. Reference: Sreparameterize,
    lie_vae/reparameterize.py:58-97 (normalized mu linear, softplus(k)+1)."""
    z_dim: int
    deterministic: bool = False

    @nn.compact
    def __call__(self, h, n=1):
        mu = Dense(self.z_dim, name="mu")(h)
        mu = mu / jnp.linalg.norm(mu, axis=-1, keepdims=True)
        kappa = nn.softplus(Dense(1, name="k")(h)) + 1.0
        key = self.make_rng("sample") if not self.deterministic else None
        return dist.sample_vmf(key, mu, kappa, n=n,
                               deterministic=self.deterministic)


# ----------------------------------------------------------- SO(3) mean heads

class AlgebraMean(nn.Module):
    """R^in -> so(3) -> SO(3) via exp map. Reference: AlgebraMean,
    lie_vae/reparameterize.py:148-155."""

    @nn.compact
    def __call__(self, h):
        return ops.expmap(Dense(3)(h))


class QuaternionMean(nn.Module):
    """R^in -> R^4 -> SO(3). Reference: QuaternionMean,
    lie_vae/reparameterize.py:158-164."""

    @nn.compact
    def __call__(self, h):
        return ops.quaternions_to_group_matrix(Dense(4)(h))


class S2S1Mean(nn.Module):
    """R^in -> S^2 x S^1 -> SO(3). Reference: S2S1Mean,
    lie_vae/reparameterize.py:167-181."""

    @nn.compact
    def __call__(self, h):
        s2 = Dense(3, name="s2")(h)
        s2 = s2 / jnp.linalg.norm(s2, axis=-1, keepdims=True)
        s1 = Dense(2, name="s1")(h)
        s1 = s1 / jnp.linalg.norm(s1, axis=-1, keepdims=True)
        return ops.s2s1rodrigues(s2, s1)


class S2S2Mean(nn.Module):
    """R^in -> S^2 x S^2 -> SO(3) by Gram-Schmidt. Reference: S2S2Mean,
    lie_vae/reparameterize.py:184-197, including the deliberate
    Uniform(-10, 10) init of weight AND bias ('start with big outputs').

    The reference routes through float64 (reparameterize.py:195-197); on TPU
    fp64 is emulated and slow, so we stay in fp32 — the 1e-5 norm clamps in
    the Gram-Schmidt keep it stable (validated in tests).
    """

    @nn.compact
    def __call__(self, h):
        v = Dense(6, kernel_init=uniform_init(-10.0, 10.0),
                  bias_init=uniform_init(-10.0, 10.0))(h)
        v = v.reshape(v.shape[:-1] + (2, 3))
        return ops.s2s2_gram_schmidt(v[..., 0, :], v[..., 1, :])


MEAN_MODULES = {
    "alg": AlgebraMean,
    "q": QuaternionMean,
    "s2s1": S2S1Mean,
    "s2s2": S2S2Mean,
}


class SO3Reparameterize(nn.Module):
    """SO(3) latent: mean rotation from a mean head, algebra noise from an
    inner N0 head, sample z = mu @ exp(v). Reference: SO3reparameterize,
    lie_vae/reparameterize.py:200-278 (k=10 wrapping shells)."""
    mean_mode: str = "s2s2"
    k: int = 10
    fixed_sigma: Optional[float] = None
    deterministic: bool = False
    density_impl: str = "xla"   # 'xla' | 'pallas' | 'auto' (fused kernel)
    # Opt-in upper clamp on the learned algebra sigma. The k-shell wrapped
    # density is only valid while the noise mass fits the wrapping window
    # (sigma <~ pi*k/2); past it log q is truncation-biased, the MC KL can
    # go NEGATIVE, and training can run away (sigma in the hundreds —
    # observed on scaled-capacity 32k runs, BENCHMARKS beta-seed study).
    # Clamping constrains the posterior family to the regime where its
    # density is exact; gradients above the clamp are zero, which is the
    # point (no gradient pressure toward the invalid regime). None = off
    # (reference behavior).
    sigma_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, h, n=1):
        mu_lie = MEAN_MODULES[self.mean_mode](name="mean")(h)
        if self.fixed_sigma is not None:
            sigma = jnp.full((h.shape[0], 3), self.fixed_sigma, dtype=h.dtype)
        else:
            # same head as N0Reparameterize (the reference wraps N0 inside
            # SO3, reparameterize.py:200-215; nesting the module here would
            # rename the checkpoint parameter paths) — keep in sync
            sigma = jnp.maximum(nn.softplus(Dense(3, name="sigma")(h)),
                                _SIGMA_FLOOR)
            if self.sigma_clamp is not None:
                sigma = jnp.minimum(sigma, self.sigma_clamp)
        key = self.make_rng("sample") if not self.deterministic else None
        return dist.sample_so3(key, mu_lie, sigma, n=n, k=self.k,
                               deterministic=self.deterministic,
                               density_impl=self.density_impl)
