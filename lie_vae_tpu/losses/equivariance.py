"""SO(2)-subgroup equivariance regularizer.

Reference: EquivarianceLoss, lie_vae/losses/equivariance_loss.py:10-57.
Sample theta ~ U(0, 2pi); g = rotation about the x-axis; require
g @ encode(img) == encode(rotate(img, theta)) in squared Frobenius norm.

TPU-first: the in-plane image rotation is a bilinear resample via
jax.scipy.ndimage.map_coordinates on NHWC images (the reference uses torch
affine_grid + grid_sample, equivariance_loss.py:50-57); the second encoder
pass runs inside the same jitted step. The schedule weight lamb is a host
scalar argument. Pure function — the (loss, diff) pair is returned for the
metrics accumulator instead of the reference's stateful tensorboard buffer.
"""
import math

import jax
import jax.numpy as jnp

from lie_vae_tpu import ops


def rotate_images(img, theta):
    """Rotate NHWC images in-plane by per-example angles (bilinear, zeros
    padding, align-corners grid like the reference's affine_grid)."""
    b, h, w, c = img.shape
    # normalized grid in [-1, 1], matching affine_grid(align_corners=True)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")          # (H, W)
    cos, sin = jnp.cos(theta), jnp.sin(theta)             # (B,)
    # torch convention: output(x) = input(A x) with A = [[cos, -sin], [sin, cos]]
    sx = cos[:, None, None] * gx - sin[:, None, None] * gy
    sy = sin[:, None, None] * gx + cos[:, None, None] * gy
    # back to pixel coordinates
    px = (sx + 1.0) * (w - 1) / 2.0
    py = (sy + 1.0) * (h - 1) / 2.0

    def sample_one(im, py_, px_):
        # im: (H, W, C); map_coordinates over spatial dims per channel
        def chan(imc):
            return jax.scipy.ndimage.map_coordinates(
                imc, [py_, px_], order=1, mode="constant", cval=0.0)
        return jnp.stack([chan(im[..., i]) for i in range(im.shape[-1])], -1)

    return jax.vmap(sample_one)(img, py, px)


def equivariance_loss(encode_fn, img, encoding, key, num_samples=None):
    """Returns (mean squared diff, per-example diffs).

    encode_fn: img -> (B, 3, 3) group-element encodings (the first
    reparameterizer's first sample, as in unsupervised.py:100-102).
    encoding: precomputed encode_fn(img) from the main forward pass.
    num_samples: optionally evaluate on only the first num_samples
    examples (reference: equivariance_loss.py:24-25).
    Reference: equivariance_loss.py:22-48.
    """
    assert encoding.shape[-2:] == (3, 3), "Rotation matrix input required"
    if num_samples:
        img = img[:num_samples]
        encoding = encoding[:num_samples]
    n = img.shape[0]
    theta = jax.random.uniform(key, (n,), dtype=img.dtype) * 2.0 * math.pi
    v = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], dtype=encoding.dtype), (n, 3))
    s1 = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
    g = ops.s2s1rodrigues(v, s1)

    enc_rot = g @ encoding
    img_rot = rotate_images(img, theta)
    img_rot_enc = encode_fn(img_rot)

    diffs = jnp.sum((enc_rot - img_rot_enc) ** 2, axis=(-2, -1))
    return jnp.mean(diffs), diffs
