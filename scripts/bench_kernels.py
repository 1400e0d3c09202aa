"""Benchmark Pallas kernels vs the XLA paths on the real TPU chip.

Run: python scripts/bench_kernels.py

Measurement notes (this image's tunneled axon runtime):
- jax.block_until_ready returns before remote execution finishes; the queue
  is drained with a scalar readback instead.
- a single dispatch costs ~1-10 ms of host/tunnel time, so each candidate is
  wrapped in a K-step lax.scan whose carry feeds back into the inputs —
  XLA can neither hoist the op out of the loop nor dead-code it, and the
  per-step figure is chip time, not dispatch rate.

The table prints an HBM speed-of-light estimate per shape (bytes moved at
819 GB/s on v5e) — BASELINE.md's north star is these kernels at HBM
roofline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from lie_vae_tpu import ops
from lie_vae_tpu.distributions.so3 import so3_wrapped_log_density
from lie_vae_tpu.ops.kernels import (
    block_wigner_apply_fused_flat, block_wigner_matrix_multiply_pallas,
    so3_wrapped_log_density_pallas)

HBM_GBPS = 819.0  # v5e


def timeit(f, *args, scan_k=128, n=3):
    """Per-call milliseconds of f(*args) on chip, dispatch amortized away."""

    def run(*xs):
        def body(c, _):
            out = f(xs[0] + c, *xs[1:])
            s = jnp.sum(out)
            return s.astype(xs[0].dtype) * 1e-30, s

        _, outs = lax.scan(body, jnp.zeros((), xs[0].dtype), None,
                           length=scan_k)
        return outs

    jf = jax.jit(run)
    float(jf(*args)[-1])                      # compile + drain
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = jf(*args)
    float(o[-1])                              # true queue drain
    return (time.perf_counter() - t0) / (n * scan_k) * 1e3


def sol_ms(bytes_moved):
    return bytes_moved / (HBM_GBPS * 1e9) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}")

    print("== block Wigner apply (L=6, C=10) ==")
    for B in (64, 1024, 8192):
        k1, k2 = jax.random.split(jax.random.fold_in(key, B))
        angles = ops.group_matrix_to_eazyz(
            ops.random_group_matrices(k1, B)).astype(jnp.float32)
        spec = jax.random.normal(k2, (B, 49, 10), dtype=jnp.float32)
        sol = sol_ms(2 * B * 49 * 10 * 4 + B * 3 * 4)
        t_xla = timeit(
            lambda a, s: ops.block_wigner_matrix_multiply(
                a, s, 6, impl="dense"),
            angles, spec)
        t_pl = timeit(
            lambda a, s: block_wigner_matrix_multiply_pallas(
                a, s, 6, block_b=8, interpret=False),
            angles, spec)
        t_pl32 = timeit(
            lambda a, s: block_wigner_matrix_multiply_pallas(
                a, s, 6, block_b=32, interpret=False),
            angles, spec)
        t_zjz = timeit(
            lambda a, s: ops.block_wigner_apply_zjz(a, s, 6),
            angles, spec)
        spec_flat = spec.reshape(B, -1)
        t_fused = timeit(
            lambda a, s: block_wigner_apply_fused_flat(
                a, s, 6, interpret=False),
            angles, spec_flat)
        t_fused32 = timeit(
            lambda a, s: block_wigner_apply_fused_flat(
                a, s, 6, compute_dtype=jnp.float32, interpret=False),
            angles, spec_flat)
        print(f"B={B:6d}: dense {t_xla:7.3f} ms | pallas(b8) {t_pl:7.3f} ms "
              f"| pallas(b32) {t_pl32:7.3f} ms | zjz {t_zjz:7.3f} ms "
              f"| fused-bf16 {t_fused:7.3f} ms | fused-f32 {t_fused32:7.3f} "
              f"ms | HBM-SoL {sol:7.3f} ms")

    print("== block Wigner apply fwd+bwd (L=6, C=10, B=8192) ==")
    k1, k2 = jax.random.split(jax.random.fold_in(key, 777))
    B = 8192
    angles = ops.group_matrix_to_eazyz(
        ops.random_group_matrices(k1, B)).astype(jnp.float32)
    spec_flat = jax.random.normal(k2, (B, 490), dtype=jnp.float32)

    def grad_wrap(fn):
        # the summed GRADIENTS feed the scan carry — feeding only the loss
        # lets XLA dead-code-eliminate the whole backward pass
        def f(a, s):
            ga, gs = jax.grad(
                lambda aa, ss: jnp.sum(fn(aa, ss)), argnums=(0, 1))(a, s)
            return jnp.sum(ga) + jnp.sum(gs)
        return f

    for name, fn in (
            ("zjz", lambda a, s: ops.block_wigner_apply_zjz(
                a, s.reshape(B, 49, 10), 6)),
            ("fused-bf16", lambda a, s: block_wigner_apply_fused_flat(
                a, s, 6, interpret=False)),
            ("fused-f32", lambda a, s: block_wigner_apply_fused_flat(
                a, s, 6, compute_dtype=jnp.float32, interpret=False))):
        t = timeit(grad_wrap(fn), angles, spec_flat)
        print(f"  {name:12s} fwd+bwd {t:7.3f} ms")

    print("== block Wigner apply, serving scale (L=10, S=121, C=16) ==")
    for B in (1024, 4096):
        k1, k2 = jax.random.split(jax.random.fold_in(key, 1000 + B))
        angles = ops.group_matrix_to_eazyz(
            ops.random_group_matrices(k1, B)).astype(jnp.float32)
        spec = jax.random.normal(k2, (B, 121, 16), dtype=jnp.float32)
        sol = sol_ms(2 * B * 121 * 16 * 4 + B * 3 * 4)
        t_xla = timeit(
            lambda a, s: ops.block_wigner_matrix_multiply(
                a, s, 10, impl="dense"),
            angles, spec)
        t_pl = timeit(
            lambda a, s: block_wigner_matrix_multiply_pallas(
                a, s, 10, block_b=16, interpret=False),
            angles, spec)
        t_zjz = timeit(
            lambda a, s: ops.block_wigner_apply_zjz(a, s, 10),
            angles, spec)
        print(f"B={B:6d}: dense {t_xla:7.3f} ms | pallas(b16) {t_pl:7.3f} ms "
              f"| zjz {t_zjz:7.3f} ms | HBM-SoL {sol:7.3f} ms")

    print("== SO(3) rsample path: z = mu @ exp(sigma*eps) ==")
    # BASELINE.md's "exp-map kernels at HBM roofline" row. This is the
    # sampling path of SO3Reparameterize (distributions/so3.py:119-133,
    # reference reparameterize.py:269-273): elementwise scale, the
    # Rodrigues exp map, and a 3x3 compose. It is measured (rather than
    # given a Pallas kernel) because it is 0.4% of a training step
    # (BENCHMARKS whole-step profile) — the table shows the XLA fusion is
    # already at/near the measured dispatch-floor-dominated bound.
    for B in (64, 4096, 65536):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 31 + B), 3)
        mu = ops.random_group_matrices(k1, B).astype(jnp.float32)
        sigma = jax.nn.softplus(
            jax.random.normal(k2, (B, 3), dtype=jnp.float32)) + 0.05
        eps = jax.random.normal(k3, (B, 3), dtype=jnp.float32)
        # reads mu 9f + sigma 3f + eps 3f, writes z 9f per row
        sol = sol_ms(B * (9 + 3 + 3 + 9) * 4)
        t_xla = timeit(lambda m, s, e: m @ ops.expmap(s * e),
                       mu, sigma, eps)
        print(f"B={B:6d}: xla-fused {t_xla:7.3f} ms | HBM-SoL {sol:7.3f} ms")

    print("== wrapped log-density (k=10) ==")
    for N in (4096, 65536, 524288):
        k1, k2 = jax.random.split(jax.random.fold_in(key, N))
        v = jax.random.normal(k1, (1, N, 3), dtype=jnp.float32)
        sigma = jax.nn.softplus(
            jax.random.normal(k2, (N, 3), dtype=jnp.float32)) + 0.05
        sol = sol_ms(N * 3 * 4 * 2 + N * 4)
        t_xla = timeit(lambda v, s: so3_wrapped_log_density(v, s, 10),
                       v, sigma)
        t_pl = timeit(
            lambda v, s: so3_wrapped_log_density_pallas(
                v, s, 10, interpret=False), v, sigma)
        print(f"N={N:7d}: xla {t_xla:7.3f} ms | pallas {t_pl:7.3f} ms "
              f"| HBM-SoL {sol:7.3f} ms")


if __name__ == "__main__":
    main()
