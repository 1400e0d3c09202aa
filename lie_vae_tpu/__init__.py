"""lie_vae_tpu — a TPU-native JAX framework for Lie-group latent VAEs.

Re-implements (from scratch, TPU-first) the capabilities of the reference
PyTorch implementation of "Explorations in Homeomorphic Variational
Auto-Encoding" (Falorsi et al., arXiv:1807.04689; reference repo pimdh/lie-vae).

Layout
------
- ``ops``            pure-jnp SO(3) group math + Wigner-D representations
                     (reference: lie_vae/lie_tools.py)
- ``ops.kernels``    Pallas TPU kernels for the hot math
- ``distributions``  functional reparameterizers / latent distributions
                     (reference: lie_vae/reparameterize.py)
- ``models``         Flax networks, decoders and the VAE assembly
                     (reference: lie_vae/experiments/nets.py, lie_vae/decoders.py,
                     lie_vae/experiments/vae.py)
- ``losses``         equivariance / encoder-continuity regularizers
                     (reference: lie_vae/losses/)
- ``data``           toy + spherecube data pipelines, seeded splits
                     (reference: lie_vae/experiments/datasets.py)
- ``train``          jit-compiled training harness, schedules, checkpointing
                     (reference: lie_vae/experiments/unsupervised.py, main.py)
- ``parallel``       device mesh + sharding rules (new; the reference is
                     single-GPU only)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache for every entry point that imports the
# package (see utils.enable_compilation_cache: opt out with
# LIE_VAE_TPU_NO_COMPILE_CACHE=1, relocate with LIE_VAE_TPU_CACHE_DIR).
from lie_vae_tpu.utils import enable_compilation_cache as _enable_cache

_enable_cache()
del _enable_cache
