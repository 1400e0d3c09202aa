"""Pallas kernel correctness vs the XLA reference paths (interpret mode on
CPU; the same kernels compile for TPU — benchmarked by scripts/bench_kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lie_vae_tpu import ops
from lie_vae_tpu.distributions.so3 import so3_wrapped_log_density
from lie_vae_tpu.ops.kernels import (
    block_wigner_matrix_multiply_pallas, so3_wrapped_log_density_pallas)


@pytest.mark.parametrize("L,B,C", [(6, 64, 10), (3, 17, 4), (10, 8, 2)])
def test_wigner_kernel_matches_xla(key, L, B, C):
    k1, k2 = jax.random.split(key)
    r = ops.random_group_matrices(k1, B, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r).astype(jnp.float32)
    spec = jax.random.normal(k2, (B, (L + 1) ** 2, C),
                             dtype=jnp.float32)
    ref = ops.block_wigner_matrix_multiply(angles, spec, L)
    out = block_wigner_matrix_multiply_pallas(angles, spec, L,
                                              interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_wigner_kernel_transpose(key):
    L, B, C = 4, 12, 3
    k1, k2 = jax.random.split(key)
    r = ops.random_group_matrices(k1, B, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r).astype(jnp.float32)
    spec = jax.random.normal(k2, (B, (L + 1) ** 2, C), dtype=jnp.float32)
    ref = ops.block_wigner_matrix_multiply(angles, spec, L, transpose=True)
    out = block_wigner_matrix_multiply_pallas(angles, spec, L,
                                              transpose=True, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_wigner_kernel_shared_spectrum(key):
    L, B, C = 3, 10, 5
    k1, k2 = jax.random.split(key)
    r = ops.random_group_matrices(k1, B, dtype=jnp.float64)
    angles = ops.group_matrix_to_eazyz(r).astype(jnp.float32)
    spec = jax.random.normal(k2, ((L + 1) ** 2, C), dtype=jnp.float32)
    ref = ops.block_wigner_matrix_multiply(angles, spec, L)
    out = block_wigner_matrix_multiply_pallas(angles, spec, L,
                                              interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n,B", [(1, 64), (4, 33)])
def test_density_kernel_matches_xla(key, n, B):
    k1, k2 = jax.random.split(key)
    v = jax.random.normal(k1, (n, B, 3), dtype=jnp.float32)
    sigma = jax.nn.softplus(
        jax.random.normal(k2, (B, 3), dtype=jnp.float32)) + 0.05
    ref = so3_wrapped_log_density(v, sigma, k=10)
    out = so3_wrapped_log_density_pallas(v, sigma, k=10, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_density_kernel_padding_safe(key):
    # N not divisible by block_n; padded rows must not produce NaNs
    v = jax.random.normal(key, (1, 7, 3), dtype=jnp.float32)
    sigma = jnp.full((7, 3), 0.5, dtype=jnp.float32)
    out = so3_wrapped_log_density_pallas(v, sigma, k=10, block_n=512,
                                         interpret=True)
    assert out.shape == (1, 7)
    assert np.isfinite(np.asarray(out)).all()
