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
