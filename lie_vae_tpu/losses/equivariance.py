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


def _shear_x(img, s):
    """1-D bilinear resample along W with a per-(example, row) shift:
    out[b,y,x,c] = img[b, y, x + s[b,y], c], zeros outside. Expressed as a
    dense banded-matrix einsum — pure MXU work, no gathers."""
    b, h, w, c = img.shape
    x = jnp.arange(w, dtype=img.dtype)
    # A[b,y,x,v] = hat(v - (x + s[b,y])): the two bilinear taps per output
    d = (x[None, None, None, :]                  # v (source)
         - x[None, None, :, None]                # x (target)
         - s[:, :, None, None])
    A = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return jnp.einsum("byxv,byvc->byxc", A, img)


def _shear_y(img, s):
    """Same along H with a per-(example, column) shift s[b,x]."""
    b, h, w, c = img.shape
    y = jnp.arange(h, dtype=img.dtype)
    # A[b,y,u,x] = hat(u - (y + s[b,x]))
    d = (y[None, None, :, None]                  # u (source row)
         - y[None, :, None, None]                # y (target row)
         - s[:, None, None, :])
    A = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return jnp.einsum("byux,buxc->byxc", A, img)


def rotate_images_shear(img, theta):
    """TPU-native in-plane rotation: Paeth three-shear decomposition.

    R(θ) = Shear_x(-tan(θ/2)) · Shear_y(sin θ) · Shear_x(-tan(θ/2)); each
    shear is a 1-D bilinear resample along one axis, expressed as a dense
    banded-matrix einsum — three batched matmuls on the MXU instead of the
    per-element gathers map_coordinates lowers to (measured ~35 ms/step of
    pure gather time in the regularized BASELINE config; the shears are
    sub-millisecond). θ is first reduced to [-π/4, π/4] by an exact
    90°-multiple pre-rotation, so the shear factors stay small.

    Interpolation-wise this is the classic Paeth rotation: three 1-D
    bilinear passes rather than one 2-D bilinear pass — not bit-identical
    to ``rotate_images`` but the same rotation with comparable (slightly
    smoother) reconstruction; exact at multiples of 90°. Same align-corners
    center and zeros padding.
    """
    b, h, w, c = img.shape
    assert h == w, "square images (the spherecube pipeline is 64x64)"
    theta = jnp.asarray(theta, img.dtype)
    # wrap to [-pi, pi), then split off the nearest multiple of 90 deg
    theta = (theta + math.pi) % (2.0 * math.pi) - math.pi
    k = jnp.round(theta / (math.pi / 2.0))
    phi = theta - k * (math.pi / 2.0)            # residual in [-pi/4, pi/4]
    km = jnp.mod(k.astype(jnp.int32), 4)         # (B,) in {0,1,2,3}

    # exact 90-degree pre-rotations, selected per example.
    # rotate_images' convention is out(p) = in(R(θ) p) (inverse map):
    # out[y, x] = in[x, (w-1) - y] for θ = +90°, which is jnp.rot90 with
    # k=+1 over (H, W); build all four variants (cheap: transposes +
    # flips) and mask-select per example.
    rots = [img]
    for _ in range(3):
        rots.append(jnp.rot90(rots[-1], k=1, axes=(1, 2)))
    sel = jnp.stack(rots, 0)                      # (4, B, H, W, C)
    onehot = (jnp.arange(4)[:, None] == km[None, :]).astype(img.dtype)
    base = jnp.einsum("kb,kbhwc->bhwc", onehot, sel)

    # centered pixel coordinates; shifts are the shear offsets
    cy = (h - 1) / 2.0
    alpha = -jnp.tan(phi / 2.0)                   # (B,)
    beta = jnp.sin(phi)
    yy = jnp.arange(h, dtype=img.dtype) - cy      # (H,) == centered x too
    s_row = alpha[:, None] * yy[None, :]          # (B, H): x-shift per row
    s_col = beta[:, None] * yy[None, :]           # (B, W): y-shift per col
    out = _shear_x(base, s_row)
    out = _shear_y(out, s_col)
    out = _shear_x(out, s_row)
    return out


ROTATE_IMPLS = {"gather": rotate_images, "shear": rotate_images_shear}


def equivariance_loss(encode_fn, img, encoding, key, num_samples=None,
                      rotate_impl="gather"):
    """Returns (mean squared diff, per-example diffs).

    encode_fn: img -> (B, 3, 3) group-element encodings (the first
    reparameterizer's first sample, as in unsupervised.py:100-102).
    encoding: precomputed encode_fn(img) from the main forward pass.
    num_samples: optionally evaluate on only the first num_samples
    examples (reference: equivariance_loss.py:24-25).
    rotate_impl: 'gather' = map_coordinates bilinear (bit-matches the
    reference's grid_sample semantics); 'shear' = Paeth three-shear via
    MXU matmuls (the TPU-fast path the training loop defaults to — the
    gather lowering costs ~35 ms/step on the regularized config).
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
    img_rot = ROTATE_IMPLS[rotate_impl](img, theta)
    img_rot_enc = encode_fn(img_rot)

    diffs = jnp.sum((enc_rot - img_rot_enc) ** 2, axis=(-2, -1))
    return jnp.mean(diffs), diffs
