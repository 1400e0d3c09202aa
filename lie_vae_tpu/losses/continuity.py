"""Encoder continuity regularizer for paired datasets.

Reference: EncoderContinuityLoss, lie_vae/losses/encoder_continuity_loss.py:6-35.
The batch is consecutive-pose pairs flattened as (2n, ...) by
ScPairsDataset.prep_batch; penalize the squared distance between each
pair's encodings. Pure function; schedule weight applied by the caller.
"""
import jax.numpy as jnp


def encoder_continuity_loss(encodings):
    """Returns (mean squared pair distance, per-pair diffs).

    encodings: (2n, ...) where consecutive rows are pose pairs.
    """
    n = encodings.shape[0] // 2
    enc = encodings.reshape(n, 2, -1)
    diffs = jnp.sum((enc[:, 0] - enc[:, 1]) ** 2, axis=-1)
    return jnp.mean(diffs), diffs
