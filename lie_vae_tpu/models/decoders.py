"""Decoders: the group-action decoder (learned Fourier modes rotated by the
block Wigner representation) and the MLP baseline.

Reference: lie_vae/decoders.py. The action decoder's hot path is the fused
block Wigner apply (ops.wigner) instead of the reference's per-degree bmm loop.
"""
from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import normal as normal_init

from lie_vae_tpu import ops
from lie_vae_tpu.models.nets import MLP


class ActionDecoder(nn.Module):
    """Group-action decoder. Reference: ActionNet, lie_vae/decoders.py:9-61.

    - item_rep: learned ((degrees+1)^2, rep_copies) Fourier coefficients
      (standard normal init, decoders.py:35), or a fixed constant buffer when
      ``fixed_item_rep`` is given (the toy fixed-spectrum experiment,
      main.py:38-39);
    - forward takes ZYZ angles (B, 3), rotates the coefficients with the
      fused block Wigner multiply, flattens, optionally routes through a
      3-layer MLP(50) and then the deconv head.
    """
    degrees: int
    deconv: Optional[nn.Module]
    rep_copies: int = 10
    with_mlp: bool = False
    fixed_item_rep: Optional[Any] = None
    transpose: bool = False
    wigner_impl: str = "xla"   # 'xla' | 'pallas' | 'auto' (fused kernel)

    @nn.compact
    def __call__(self, angles, content=None):
        assert angles.shape[-1] == 3, "input must be ZYZ Euler angles"
        matrix_dims = (self.degrees + 1) ** 2
        if self.fixed_item_rep is not None:
            item_rep = jnp.asarray(self.fixed_item_rep)
        else:
            item_rep = self.param(
                "item_rep", normal_init(1.0), (matrix_dims, self.rep_copies))

        item = ops.block_wigner_matrix_multiply(
            angles, item_rep.astype(angles.dtype), self.degrees,
            transpose=self.transpose, impl=self.wigner_impl)
        item = item.reshape(angles.shape[0], matrix_dims * self.rep_copies)

        if self.with_mlp:
            item = MLP(matrix_dims * self.rep_copies, 50, 3)(item)

        if self.deconv is None:
            return item.reshape(-1, matrix_dims, self.rep_copies)
        return self.deconv(item)


class MLPDecoder(nn.Module):
    """Baseline decoder: flatten group element, MLP to the spectrum size,
    then the deconv head. Reference: MLPNet, lie_vae/decoders.py:64-87.
    """
    degrees: int
    deconv: Optional[nn.Module]
    in_dims: int = 9
    rep_copies: int = 10
    layers: int = 3
    hidden_dims: int = 50
    activation: Callable = nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x, content=None):
        matrix_dims = (self.degrees + 1) ** 2
        x = x.reshape(x.shape[0], -1)
        # in_dims sizes the first Linear in the reference (decoders.py:80);
        # flax infers it, so enforce it as the latent-width contract instead
        assert x.shape[-1] == self.in_dims, (
            f"MLPDecoder configured for in_dims={self.in_dims} but got a "
            f"flattened latent of width {x.shape[-1]}")
        out = MLP(matrix_dims * self.rep_copies, self.hidden_dims,
                  self.layers, self.activation, dtype=self.dtype)(x)
        if self.deconv is None:
            return out.reshape(-1, matrix_dims, self.rep_copies)
        return self.deconv(out)
