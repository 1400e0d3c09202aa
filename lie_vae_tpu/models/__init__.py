"""Flax networks, reparameterizer heads, decoders, and the VAE assembly."""
from lie_vae_tpu.models.nets import (  # noqa: F401
    ACTIVATIONS, ConvEncoder, DeconvNet, Dense, MLP)
from lie_vae_tpu.models.reparameterize import (  # noqa: F401
    AlgebraMean, QuaternionMean, S2S1Mean, S2S2Mean, MEAN_MODULES,
    NormalReparameterize, N0Reparameterize, VmfReparameterize,
    SO3Reparameterize)
from lie_vae_tpu.models.decoders import ActionDecoder, MLPDecoder  # noqa: F401
from lie_vae_tpu.models.vae import LieVAE  # noqa: F401
