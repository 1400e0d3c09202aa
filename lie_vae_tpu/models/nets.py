"""Flax neural building blocks (reference: lie_vae/experiments/nets.py).

TPU-first choices:
- NHWC layout throughout (the TPU-native conv layout; the reference is NCHW);
- initializers reproduce torch's Linear/Conv defaults (kaiming-uniform with
  a = sqrt(5), i.e. U(+/- 1/sqrt(fan_in)) for both kernel and bias), because
  the reference's training regime (grad-norm clip 1e-5, main.py:171) makes
  dynamics highly sensitive to the initialization scale;
- no BatchNorm python branching inside jit: train/eval is a static flag.
"""
import math
from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import uniform as _uniform_base


def torch_init(fan_in):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch's default Linear/Conv init."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return _uniform_base(2.0 * bound)(key, shape, dtype) - bound

    return init


def uniform_init(low, high):
    def init(key, shape, dtype=jnp.float32):
        return _uniform_base(high - low)(key, shape, dtype) + low

    return init


class Dense(nn.Module):
    """nn.Dense with torch-default initialization.

    dtype: optional compute dtype (params stay float32; inputs and kernel
    are cast for the matmul — the TPU mixed-precision pattern).
    """
    features: int
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or torch_init(fan_in)
        binit = self.bias_init or torch_init(fan_in)
        kernel = self.param("kernel", kinit, (fan_in, self.features))
        bias = self.param("bias", binit, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return x @ kernel + bias


class MLP(nn.Module):
    """Dense stack; num_layers=0 means a single Linear.

    Reference: MLP, lie_vae/experiments/nets.py:78-91.
    """
    out_dims: int
    hidden_dims: int
    num_layers: int = 1
    activation: Callable = nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.num_layers == 0:
            return Dense(self.out_dims, dtype=self.dtype)(x)
        x = self.activation(Dense(self.hidden_dims, dtype=self.dtype)(x))
        for _ in range(self.num_layers - 1):
            x = self.activation(Dense(self.hidden_dims, dtype=self.dtype)(x))
        out = Dense(self.out_dims, dtype=self.dtype)(x)
        return out.astype(jnp.float32) if self.dtype is not None else out


def _conv(features, kernel, stride, pad, fan_in, dtype=None):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)) if pad else "VALID",
        kernel_init=torch_init(fan_in), bias_init=torch_init(fan_in),
        dtype=dtype)


def _deconv(features, kernel, stride, fan_in, valid=False, dtype=None,
            name=None):
    # stride-2 'SAME' transpose conv doubles spatial dims (torch k4 s2 p1);
    # 'VALID' stride-1 k4 maps 1x1 -> 4x4 (torch k4 s1 p0).
    return nn.ConvTranspose(
        features, (kernel, kernel), strides=(stride, stride),
        padding="VALID" if valid else "SAME",
        kernel_init=torch_init(fan_in), bias_init=torch_init(fan_in),
        dtype=dtype, name=name)


class ConvEncoder(nn.Module):
    """5-layer strided conv encoder, 64x64 -> out_dims (flattened 1x1).

    Reference: ConvNet / ConvNetBN, lie_vae/experiments/nets.py:7-57
    (channels in->h->2h->4h->8h->out, kernel 4 stride 2 pad 1, last 4/1/0,
    LeakyReLU(0.2), optional BatchNorm after every conv). Input is NHWC.
    """
    out_dims: int
    hidden_dims: int = 50
    rgb: bool = False
    batch_norm: bool = True
    dtype: Any = None    # compute dtype for convs (params stay fp32)

    @nn.compact
    def __call__(self, x, train=True):
        in_dims = 3 if self.rgb else 1
        h = self.hidden_dims
        widths = [h, 2 * h, 4 * h, 8 * h]
        fan_ins = [in_dims] + widths[:-1]
        for w, f in zip(widths, fan_ins):
            x = _conv(w, 4, 2, 1, f * 16, dtype=self.dtype)(x)
            if self.batch_norm:
                # BatchNorm statistics in fp32 for stability
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = _conv(self.out_dims, 4, 1, 0, widths[-1] * 16,
                  dtype=self.dtype)(x)  # 4x4 -> 1x1
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


class FastConvTranspose2x(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (4,4), (2,2), 'SAME') computed
    via the phase decomposition (ops/fastconv.py) — exact same function and
    parameter tree, ~2x faster on TPU when `features` is far below the
    128-lane tile (the 1|3-channel image head)."""
    features: int
    fan_in: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from lie_vae_tpu.ops.fastconv import phase_deconv2x
        kernel = self.param("kernel", torch_init(self.fan_in),
                            (4, 4, x.shape[-1], self.features))
        bias = self.param("bias", torch_init(self.fan_in), (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return phase_deconv2x(x, kernel, bias)


class DeconvNet(nn.Module):
    """1x1 -> 64x64 transpose-conv stack, NHWC; no output nonlinearity.

    Reference: DeconvNet, lie_vae/experiments/nets.py:60-75.
    The final (image-channel) layer uses the phase-decomposed transpose conv
    when fast_head is set: same math and identical parameter tree, but the
    four output phases ride the MXU lanes together (see ops/fastconv.py).
    """
    in_dims: int
    hidden_dims: int
    rgb: bool = False
    dtype: Any = None    # compute dtype for convs (params stay fp32)
    # override for the final image-channel layer only (mixed recipes: keep
    # the stack in bf16 for MXU throughput but render the pixels in f32);
    # None = same as dtype
    head_dtype: Any = "unset"
    fast_head: bool = True
    fast_stack: bool = False  # phase-decompose the hidden k4s2 layers too

    @nn.compact
    def __call__(self, x):
        out_dims = 3 if self.rgb else 1
        h = self.hidden_dims
        d = self.dtype
        hd = self.dtype if self.head_dtype == "unset" else self.head_dtype
        # NB: torch ConvTranspose2d's kaiming fan_in is weight.size(1)*k^2
        # = OUT-channels * 16, not in-channels (weight is (in, out, kH, kW))
        x = x.reshape(x.shape[0], 1, 1, self.in_dims)
        x = nn.relu(_deconv(h, 4, 1, h * 16, valid=True, dtype=d)(x))
        for i in (1, 2, 3):   # the three k4-s2 hidden layers, 4x4 -> 32x32
            if self.fast_stack:
                y = FastConvTranspose2x(h, h * 16, dtype=d,
                                        name=f"ConvTranspose_{i}")(x)
            else:
                y = _deconv(h, 4, 2, h * 16, dtype=d,
                            name=f"ConvTranspose_{i}")(x)
            x = nn.relu(y)
        if self.fast_head:
            x = FastConvTranspose2x(out_dims, out_dims * 16, dtype=hd,
                                    name="ConvTranspose_4")(x)
        else:
            x = _deconv(out_dims, 4, 2, out_dims * 16, dtype=hd,
                        name="ConvTranspose_4")(x)
        return x.astype(jnp.float32)


ACTIVATIONS = {
    "relu": nn.relu,
    "softplus": nn.softplus,
    "tanh": jnp.tanh,
}
