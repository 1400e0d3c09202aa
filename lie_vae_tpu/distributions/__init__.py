"""Functional latent distributions (reference: lie_vae/reparameterize.py)."""
from lie_vae_tpu.distributions.normal import (  # noqa: F401
    GaussianStats, ZeroMeanGaussianStats,
    sample_gaussian, sample_zero_mean_gaussian)
from lie_vae_tpu.distributions.so3 import (  # noqa: F401
    SO3Stats, sample_so3, so3_wrapped_log_density, LOG_HAAR_UNIFORM)
from lie_vae_tpu.distributions.vmf import (  # noqa: F401
    VonMisesFisherStats, sample_vmf, ive, bessel_ratio,
    hyperspherical_uniform_entropy, hyperspherical_uniform_log_prob)
