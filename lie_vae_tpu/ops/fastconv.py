"""Fast exact reformulations of k4-s2 'SAME' transpose convolutions.

XLA's TPU emitters handle most transpose convs well, but the image head of
the deconv stack (reference DeconvNet's last ConvTranspose2d to 1|3 output
channels, lie_vae/experiments/nets.py:60-75) is pathological: with C_out in
{1, 3} the native emitter runs at <5% MXU lane utilization (~178 us/step at
the flagship shape, ~30x off roofline, measured via jax.profiler on v5e).

`phase_deconv2x` computes the identical function as one stride-1 k2 VALID
convolution producing all four output phases as channel blocks (4*C_out
lanes instead of C_out), followed by a slice-stack into (B, H, 2, W, 2, C)
whose final reshape to (B, 2H, 2W, C) is a free bitcast (row-major order
(h, dh, w, dw) == interleaved rows/cols).

Derivation (1D, lax.conv_transpose semantics — kernel NOT flipped,
'SAME' padding for stride 2 / kernel 4 gives out = 2*in):

    out[2m]   = K[0] x[m-1] + K[2] x[m]
    out[2m+1] = K[1] x[m]   + K[3] x[m+1]

i.e. output phase d is a 2-tap stride-1 conv with taps K[2a + d] over the
window (x[m-1+d], x[m+d]); 2D is the tensor product of row/col phases.
Verified exactly equal (zero ulp in f32) to lax.conv_transpose in
tests/test_fastconv.py, including gradients.
"""
import jax.numpy as jnp
from jax import lax


def phase_deconv2x(x, kernel, bias=None):
    """Exact equivalent of lax.conv_transpose(x, kernel, (2, 2), 'SAME').

    Args:
      x: (B, H, W, C_in) NHWC input.
      kernel: (4, 4, C_in, C_out) in flax ConvTranspose HWIO layout.
      bias: optional (C_out,) added to the output.

    Returns:
      (B, 2H, 2W, C_out), bit-identical to the flax/XLA transpose conv
      (same dtype/precision behavior: the conv runs in x.dtype).
    """
    if kernel.shape[:2] != (4, 4):
        raise ValueError(f"phase_deconv2x needs a 4x4 kernel, got "
                         f"{kernel.shape}")
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    # kernel[2a+dh, 2b+dw, i, o] -> k[a, dh, b, dw, i, o]; conv taps for
    # phase (dh, dw) at window position (a, b) are kernel[2a+dh, 2b+dw].
    k = kernel.reshape(2, 2, 2, 2, Cin, Cout)
    kc = jnp.transpose(k, (0, 2, 4, 1, 3, 5)).reshape(2, 2, Cin, 4 * Cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, kc, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H + 1, W + 1, 2, 2, Cout)
    # out[2m+dh, 2n+dw] = y[m+dh, n+dw, dh, dw]; stack directly into
    # (B, H, 2, W, 2, C) so the final reshape is a layout no-op.
    rows = []
    for dh in (0, 1):
        cols = [y[:, dh:dh + H, dw:dw + W, dh, dw] for dw in (0, 1)]
        rows.append(jnp.stack(cols, axis=3))        # (B, H, W, 2, C)
    out = jnp.stack(rows, axis=2).reshape(B, 2 * H, 2 * W, Cout)
    if bias is not None:
        out = out + bias
    return out
