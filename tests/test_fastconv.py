"""phase_deconv2x must be exactly lax.conv_transpose (values and grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from lie_vae_tpu.ops.fastconv import phase_deconv2x


def _ref(x, k):
    return lax.conv_transpose(x, k, (2, 2), "SAME",
                              dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("H,Cin,Cout", [(4, 5, 7), (8, 16, 3), (32, 20, 1)])
def test_matches_conv_transpose(H, Cin, Cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, H, H, Cin), jnp.float32)
    k = jnp.asarray(rng.randn(4, 4, Cin, Cout), jnp.float32)
    ref = _ref(x, k)
    got = phase_deconv2x(x, k)
    assert got.shape == (3, 2 * H, 2 * H, Cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_bias_and_dtype():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
    k = jnp.asarray(rng.randn(4, 4, 6, 3), jnp.float32)
    b = jnp.asarray(rng.randn(3), jnp.float32)
    np.testing.assert_allclose(np.asarray(phase_deconv2x(x, k, b)),
                               np.asarray(_ref(x, k) + b),
                               rtol=1e-6, atol=1e-5)
    out16 = phase_deconv2x(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16


def test_gradients_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 5), jnp.float32)
    k = jnp.asarray(rng.randn(4, 4, 5, 3), jnp.float32)
    ct = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)

    def loss(f):
        return lambda xx, kk: jnp.sum(f(xx, kk) * ct)

    gx_ref, gk_ref = jax.grad(loss(_ref), (0, 1))(x, k)
    gx, gk = jax.grad(loss(phase_deconv2x), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-5, atol=1e-4)


def test_deconvnet_head_equivalence():
    """fast_head=True/False give the same DeconvNet function and param tree."""
    from lie_vae_tpu.models.nets import DeconvNet
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 490), jnp.float32)
    fast = DeconvNet(in_dims=490, hidden_dims=16, rgb=True, fast_head=True)
    slow = DeconvNet(in_dims=490, hidden_dims=16, rgb=True, fast_head=False)
    v = fast.init(jax.random.PRNGKey(0), x)
    v2 = slow.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(fast.apply(v, x)),
                               np.asarray(slow.apply(v, x)),
                               rtol=1e-6, atol=1e-5)


def test_deconvnet_stack_equivalence():
    """fast_stack=True phase-decomposes the three hidden k4s2 layers:
    identical param tree and function (and gradients) as the XLA
    transpose-conv stack."""
    from lie_vae_tpu.models.nets import DeconvNet
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 490), jnp.float32)
    fast = DeconvNet(in_dims=490, hidden_dims=16, rgb=True, fast_stack=True)
    slow = DeconvNet(in_dims=490, hidden_dims=16, rgb=True, fast_stack=False)
    v = fast.init(jax.random.PRNGKey(0), x)
    v2 = slow.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(fast.apply(v, x)),
                               np.asarray(slow.apply(v, x)),
                               rtol=1e-6, atol=1e-5)

    def loss(m):
        return lambda vv: jnp.sum(m.apply(vv, x) ** 2)

    gf = jax.grad(loss(fast))(v)
    gs = jax.grad(loss(slow))(v)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)
