"""Regularizer loss tests (reference: lie_vae/losses/)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from lie_vae_tpu.losses import (
    encoder_continuity_loss, equivariance_loss, rotate_images)
from lie_vae_tpu import ops


def test_rotate_images_identity(key):
    img = jax.random.uniform(key, (3, 16, 16, 2))
    out = rotate_images(img, jnp.zeros(3))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_rotate_images_quarter_turn():
    # a single bright pixel rotates to the expected quadrant
    img = jnp.zeros((1, 17, 17, 1)).at[0, 8, 12, 0].set(1.0)
    out = rotate_images(img, jnp.asarray([math.pi / 2]))
    # torch convention output(p) = input(A p): the pixel right of center
    # (row 8, col 12) lands above center (row 4, col 8)
    pos = jnp.unravel_index(jnp.argmax(out[0, :, :, 0]), (17, 17))
    assert abs(int(pos[0]) - 4) <= 1 and abs(int(pos[1]) - 8) <= 1, pos


def test_rotate_images_preserves_mass(key):
    # center-weighted blob: rotation keeps total intensity (away from edges)
    img = jnp.zeros((1, 32, 32, 1)).at[0, 12:20, 12:20, 0].set(1.0)
    out = rotate_images(img, jnp.asarray([0.7]))
    np.testing.assert_allclose(float(out.sum()), float(img.sum()), rtol=0.02)


def test_continuity_loss_values():
    # pairs (a, a) -> 0; known distance otherwise
    enc = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 0.0], [3.0, 4.0]])
    mean, diffs = encoder_continuity_loss(enc)
    np.testing.assert_allclose(diffs, [0.0, 25.0])
    np.testing.assert_allclose(mean, 12.5)


def test_equivariance_loss_identity_encoder_range(key):
    """A constant identity encoder is deliberately NON-equivariant: the loss
    measures |g I - I|_F^2 = 4 - 4 cos(theta) per example, bounded by 8 and
    positive in expectation. (The exact analytic value is pinned by
    test_equivariance_loss_detects_mismatch below; a perfectly equivariant
    encoder is exercised end-to-end in the training tests.)"""
    img = jnp.ones((8, 16, 16, 1)) * 0.5
    encoding = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
    mean, diffs = equivariance_loss(lambda im: encoding, img, encoding,
                                    jax.random.PRNGKey(3))
    assert 0.0 < float(mean) < 8.0
    assert diffs.shape == (8,)


def test_equivariance_loss_detects_mismatch(key):
    """Loss equals the analytic value when the second encoding is identity:
    E|g - I|_F^2 = E[4 - 4 cos theta] = 4."""
    img = jnp.zeros((4096, 4, 4, 1))
    encoding = jnp.broadcast_to(jnp.eye(3), (4096, 3, 3))
    mean, _ = equivariance_loss(lambda im: encoding, img, encoding,
                                jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(mean), 4.0, rtol=0.05)


def test_equivariance_loss_jit_and_grad(key):
    img = jax.random.uniform(key, (4, 8, 8, 1))

    def f(enc_flat):
        enc = enc_flat.reshape(4, 3, 3)
        mean, _ = equivariance_loss(lambda im: enc, img, enc,
                                    jax.random.PRNGKey(1))
        return mean

    enc = jnp.broadcast_to(jnp.eye(3), (4, 3, 3)).reshape(4, 9) * 0.9
    g = jax.jit(jax.grad(f))(enc.reshape(-1))
    assert np.isfinite(np.asarray(g)).all()


def test_rotate_images_shear_matches_gather():
    """The Paeth three-shear rotation (MXU path) agrees with the
    map_coordinates bilinear rotation: exactly at 90-degree multiples,
    and to interpolation tolerance in the interior elsewhere."""
    from lie_vae_tpu.losses import rotate_images_shear

    rng = np.random.default_rng(0)
    img = rng.random((3, 64, 64, 3)).astype(np.float32)
    # smooth it so the comparison measures geometry, not interp aliasing
    img = (img[:, :-1, :-1] + img[:, 1:, :-1] + img[:, :-1, 1:]
           + img[:, 1:, 1:]) / 4.0
    img = np.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    img = jnp.asarray(img)

    for k in range(-2, 3):
        th = jnp.full((3,), k * math.pi / 2)
        np.testing.assert_allclose(rotate_images_shear(img, th),
                                   rotate_images(img, th), atol=1e-5)
    for th_val in (0.3, 0.7, 2.0, -1.2, 2.9):
        th = jnp.full((3,), th_val)
        a = np.asarray(rotate_images(img, th))[:, 8:-8, 8:-8]
        b = np.asarray(rotate_images_shear(img, th))[:, 8:-8, 8:-8]
        assert np.abs(a - b).mean() < 0.02, th_val

    # per-example angles really are per-example
    mixed = rotate_images_shear(img, jnp.asarray([0.0, math.pi / 2, 1.0]))
    np.testing.assert_allclose(mixed[0], img[0], atol=1e-5)
    np.testing.assert_allclose(
        mixed[1], rotate_images(img[1:2], jnp.asarray([math.pi / 2]))[0],
        atol=1e-5)


def test_equivariance_loss_shear_impl(key):
    """The shear rotation plugs into the loss: identity encoder keeps the
    loss in range, jit+grad work, and values track the gather impl."""
    img = jax.random.uniform(key, (6, 64, 64, 1))
    enc = jnp.broadcast_to(jnp.eye(3), (6, 3, 3))

    def encode_fn(x):
        return jnp.broadcast_to(jnp.eye(3), (x.shape[0], 3, 3))

    vals = {}
    for impl in ("gather", "shear"):
        loss, diffs = equivariance_loss(encode_fn, img, enc, key,
                                        rotate_impl=impl)
        # identity encoder: diff = |g - I|^2 = 2(1 - cos theta) * 2,
        # bounded by 8 per example — identical for BOTH impls (the image
        # rotation cancels out of this loss since encode_fn ignores x)
        assert float(loss) > 0.0 and float(loss) <= 8.0
        assert diffs.shape == (6,)
        vals[impl] = float(loss)
    np.testing.assert_allclose(vals["gather"], vals["shear"], rtol=1e-6)

    # grads flow through the second encoder pass on the shear path
    def loss_of_scale(s):
        return equivariance_loss(
            lambda x: jnp.broadcast_to(jnp.eye(3), (x.shape[0], 3, 3))
            * jnp.mean(x) * s, img, enc, key, rotate_impl="shear")[0]

    g = jax.grad(loss_of_scale)(1.0)
    assert np.isfinite(g)
