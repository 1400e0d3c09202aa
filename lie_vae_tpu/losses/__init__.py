"""Regularizer losses (reference: lie_vae/losses/)."""
from lie_vae_tpu.losses.continuity import encoder_continuity_loss  # noqa: F401
from lie_vae_tpu.losses.equivariance import (  # noqa: F401
    equivariance_loss, rotate_images, rotate_images_shear)
