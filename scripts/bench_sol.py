"""Measured speed-of-light study for the Lie-group kernels (real TPU chip).

VERDICT r1 weak #1: the kernel table quoted a *theoretical* HBM bytes bound
(819 GB/s on logical bytes) that is unreachable — the Wigner apply is
MXU-shape-bound and the wrapped density transcendental-rate-bound, and TPU
arrays are physically tiled (8, 128), so narrow-lane layouts read padded
bytes. This script MEASURES the machine's actual rates at the kernels'
own shapes and derives an honest per-kernel speed-of-light:

  1. achievable HBM bandwidth via elementwise copy at each candidate layout
     (including the lane-padding tax of (.., 49) / (.., 10) minor dims);
  2. MXU matmul rates at the kernel's operand shapes for bf16 inputs,
     f32-default and f32-highest precision;
  3. VPU transcendental issue rates (sin / exp / log);
  4. derived bounds: for each kernel, SoL = max(bytes, flops, transc) using
     the measured rates and the algorithm's true op counts.

Run: python scripts/bench_sol.py  (writes nothing; paste into BENCHMARKS.md)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, *args, scan_k=128, n=3):
    """Per-call ms on chip; dispatch amortized by a scan whose carry feeds
    back into the first input (XLA can't hoist or DCE), drained by a scalar
    readback (block_until_ready does not block through the tunnel)."""

    def run(*xs):
        def body(c, _):
            out = f(xs[0] + c, *xs[1:])
            s = jnp.sum(out)
            return s.astype(xs[0].dtype) * 1e-30, s

        _, outs = lax.scan(body, jnp.zeros((), xs[0].dtype), None,
                           length=scan_k)
        return outs

    jf = jax.jit(run)
    float(jf(*args)[-1])
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = jf(*args)
    float(o[-1])
    return (time.perf_counter() - t0) / (n * scan_k) * 1e3


def bw_row(name, shape, dtype=jnp.float32):
    x = jnp.ones(shape, dtype)
    ms = timeit(lambda a: a + 1.0, x)
    logical = 2 * x.size * x.dtype.itemsize          # read + write
    bw = logical / (ms * 1e-3) / 1e9
    print(f"  {name:28s} {ms:7.4f} ms  -> {bw:7.1f} GB/s (logical bytes)")
    return bw


def mm_row(name, m, k, n, dtype, precision=None, scan_k=64):
    x = jnp.ones((m, k), dtype)
    w = jnp.ones((k, n), dtype)
    f = (lambda a, b: jnp.dot(a, b, precision=precision,
                              preferred_element_type=jnp.float32))
    ms = timeit(f, x, w, scan_k=scan_k)
    tf = 2 * m * k * n / (ms * 1e-3) / 1e12
    print(f"  {name:44s} {ms:7.4f} ms  -> {tf:7.2f} TFLOP/s")
    return tf


def vpu_row(name, fn, shape=(8192, 512), reps=8):
    x = jnp.full(shape, 0.7, jnp.float32)

    def f(a):
        y = a
        for _ in range(reps):        # amortize the load/store bytes
            y = fn(y) * 1e-3 + a
        return y

    ms = timeit(f, x)
    rate = reps * x.size / (ms * 1e-3) / 1e9
    print(f"  {name:10s} {rate:7.2f} Gop/s")
    return rate


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    print("== per-scan-iteration floor (tiny copy) ==")
    floor_ms = timeit(lambda a: a + 1.0, jnp.ones((8, 128), jnp.float32))
    print(f"  floor: {floor_ms:7.4f} ms/iteration — every per-op row below "
          "contains this; amortized only by large shapes")

    print("== elementwise copy (x+1): achievable HBM bandwidth per layout ==")
    bw_big = bw_row("big (8192,4096) f32 [256MB mv]", (8192, 4096))
    bw_peak = bw_row("peak (4096,4096) f32", (4096, 4096))
    bw_flat = bw_row("(8192,490) f32 [flat SC]", (8192, 490))
    bw_512 = bw_row("(8192,512) f32", (8192, 512))
    bw_bsc = bw_row("(8192,49,10) f32 [B,S,C]", (8192, 49, 10))
    bw_bcs = bw_row("(81920,49) f32 [B*C,S]", (81920, 49))
    bw_d = bw_row("(3,172032) f32 [density]", (3, 172032))

    print("== MXU matmul rate at kernel shapes ==")
    tf_bf16 = mm_row("bf16 (8192,512)@(512,512)", 8192, 512, 512,
                     jnp.bfloat16)
    tf_f32d = mm_row("f32 default (8192,512)@(512,512)", 8192, 512, 512,
                     jnp.float32)
    tf_f32h = mm_row("f32 highest (8192,512)@(512,512)", 8192, 512, 512,
                     jnp.float32, precision=lax.Precision.HIGHEST)
    tf_small = mm_row("bf16 (8192,128)@(128,128)", 8192, 128, 128,
                      jnp.bfloat16)
    tf_490 = mm_row("f32 default (8192,490)@(490,490)", 8192, 490, 490,
                    jnp.float32)
    tf_peak = mm_row("bf16 peak (4096,4096)@(4096,4096)", 4096, 4096, 4096,
                     jnp.bfloat16, scan_k=16)

    print("== VPU transcendental issue rate (f32, (8192,512)) ==")
    r_sin = vpu_row("sin", jnp.sin)
    r_exp = vpu_row("exp", jnp.exp)
    r_log = vpu_row("log", lambda x: jnp.log(jnp.abs(x) + 1.0))
    r_mul = vpu_row("mul-add", lambda x: x * 1.0001 + 0.1)

    print("== derived measured speed-of-light ==")
    print(f"(each bound EXCLUDES the {floor_ms:.3f} ms/iteration dispatch "
          "floor; a one-kernel implementation pays it once, an N-op XLA "
          "graph inside one jit also pays it once)")
    print("-- block-Wigner apply, L=6 C=10 B=8192 (S=49, SC=490) --")
    B, S, C = 8192, 49, 10
    SC = S * C
    t_bytes = 2 * B * SC * 4 / (bw_big * 1e9) * 1e3
    # minimal algorithm = 2 block-J matmuls over the spectrum
    t_flop_min = 2 * 2 * B * S * S * C / (tf_bf16 * 1e12) * 1e3
    # the shipped fused kernel (ops/kernels/wigner_fused.py): compact trig
    # (6 (L+1)-wide features, expanded in-kernel) + 6 Kronecker main dots
    # + 6 selection-expansion dots, all bf16->f32 on lane-padded 512
    L = 6
    t_flop_v2 = ((6 * 2 * B * 512 * 512 + 6 * 2 * B * 128 * 512)
                 / (tf_peak * 1e12) * 1e3)
    t_trig_v2 = 6 * B * (L + 1) / (r_sin * 1e9) * 1e3
    print(f"  bytes (in+out at big-copy BW):    {t_bytes:7.4f} ms")
    print(f"  flops minimal (2 J-matmuls):      {t_flop_min:7.4f} ms")
    print(f"  flops fused kernel (12 dots @peak): {t_flop_v2:7.4f} ms")
    print(f"  trig (compact features, XLA-side): {t_trig_v2:7.4f} ms")
    sol_min = max(t_bytes, t_flop_min)
    sol_v2 = max(t_bytes, t_flop_v2, t_trig_v2)
    print(f"  => SoL (algorithm-free lower bound) = {sol_min:7.4f} ms "
          f"(+floor: {sol_min + floor_ms:7.4f})")
    print(f"  => SoL (shipped fused design bound) = {sol_v2:7.4f} ms "
          f"(+floor: {sol_v2 + floor_ms:7.4f})")

    print("-- wrapped 21-shell log-density, N=524288 --")
    N, shells = 524288, 21
    # 7 f32 lanes per element in+out; use the big-copy BW (the transposed
    # (3, N) copy above is floor-dominated at this size and reads as a
    # nonsense bandwidth)
    t_bytes = (2 * 3 * N * 4 + N * 4) / (bw_big * 1e9) * 1e3
    # per element: `shells` exps + 1 cos + 2 logs (+ sqrt, divisions)
    t_transc = (N * (shells / r_exp + 1 / r_sin + 2 / r_log) / 1e9) * 1e3
    # plus the shell-expanded elementwise work: ~8 VPU ops per shell per
    # element (shift, square, clamp, 3-op exp argument, product, reduce)
    t_vpu = N * 8 * shells / (r_mul * 1e9) * 1e3
    sol_d = max(t_bytes, t_transc, t_vpu)
    print(f"  bytes (big-copy measured BW):     {t_bytes:7.4f} ms")
    print(f"  transcendental (21 exp + cos + 2 log): {t_transc:7.4f} ms")
    print(f"  VPU elementwise (~8 ops x 21 shells):  {t_vpu:7.4f} ms")
    print(f"  => SoL = {sol_d:7.4f} ms (+floor: {sol_d + floor_ms:7.4f})")


if __name__ == "__main__":
    main()
