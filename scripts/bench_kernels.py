"""Benchmark Pallas kernels vs the XLA paths on the real TPU chip.

Run: python scripts/bench_kernels.py
(Queue drained by scalar readbacks; block_until_ready is unreliable through
this image's tunneled runtime.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lie_vae_tpu import ops
from lie_vae_tpu.distributions.so3 import so3_wrapped_log_density
from lie_vae_tpu.ops.kernels import (
    block_wigner_matrix_multiply_pallas, so3_wrapped_log_density_pallas)


def timeit(f, *args, n=50):
    jf = jax.jit(f)
    out = jf(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = jf(*args)
    float(jnp.sum(o))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}")

    print("== block Wigner apply (L=6, C=10) ==")
    for B in (64, 1024, 8192):
        k1, k2 = jax.random.split(jax.random.fold_in(key, B))
        angles = ops.group_matrix_to_eazyz(
            ops.random_group_matrices(k1, B)).astype(jnp.float32)
        spec = jax.random.normal(k2, (B, 49, 10), dtype=jnp.float32)
        t_xla = timeit(
            lambda a, s: ops.block_wigner_matrix_multiply(a, s, 6),
            angles, spec)
        t_pl = timeit(
            lambda a, s: block_wigner_matrix_multiply_pallas(
                a, s, 6, block_b=8, interpret=False),
            angles, spec)
        t_pl32 = timeit(
            lambda a, s: block_wigner_matrix_multiply_pallas(
                a, s, 6, block_b=32, interpret=False),
            angles, spec)
        print(f"B={B:6d}: xla {t_xla:7.3f} ms | pallas(b8) {t_pl:7.3f} ms "
              f"| pallas(b32) {t_pl32:7.3f} ms")

    print("== block Wigner apply, serving scale (L=10, S=121, C=16) ==")
    for B in (1024, 4096):
        k1, k2 = jax.random.split(jax.random.fold_in(key, 1000 + B))
        angles = ops.group_matrix_to_eazyz(
            ops.random_group_matrices(k1, B)).astype(jnp.float32)
        spec = jax.random.normal(k2, (B, 121, 16), dtype=jnp.float32)
        t_xla = timeit(
            lambda a, s: ops.block_wigner_matrix_multiply(a, s, 10),
            angles, spec, n=20)
        t_pl = timeit(
            lambda a, s: block_wigner_matrix_multiply_pallas(
                a, s, 10, block_b=16, interpret=False),
            angles, spec, n=20)
        print(f"B={B:6d}: xla {t_xla:7.3f} ms | pallas(b16) {t_pl:7.3f} ms")

    print("== wrapped log-density (k=10) ==")
    for N in (4096, 65536, 524288):
        k1, k2 = jax.random.split(jax.random.fold_in(key, N))
        v = jax.random.normal(k1, (1, N, 3), dtype=jnp.float32)
        sigma = jax.nn.softplus(
            jax.random.normal(k2, (N, 3), dtype=jnp.float32)) + 0.05
        t_xla = timeit(lambda v, s: so3_wrapped_log_density(v, s, 10),
                       v, sigma)
        t_pl = timeit(
            lambda v, s: so3_wrapped_log_density_pallas(
                v, s, 10, interpret=False), v, sigma)
        print(f"N={N:7d}: xla {t_xla:7.3f} ms | pallas {t_pl:7.3f} ms")


if __name__ == "__main__":
    main()
