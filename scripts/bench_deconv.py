"""A/B the deconv stack: XLA transpose convs vs the phase-decomposed stack.

Times forward+backward of DeconvNet at the flagship shape (batch 64,
in 490, hidden 200, RGB, bf16) with fast_stack False/True — same params,
bit-identical function (tests/test_fastconv.py). Timing per the repo
rule: lax.scan of K steps with a carry data-dependency + scalar readback
drain (dispatches through this image's tunnel don't block).
"""
import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fast_stack, scan_k, calls, dtype):
    import jax
    import jax.numpy as jnp

    from lie_vae_tpu.models.nets import DeconvNet

    net = DeconvNet(in_dims=490, hidden_dims=200, rgb=True, dtype=dtype,
                    fast_stack=fast_stack)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 490), jnp.float32)
    v = net.init(jax.random.PRNGKey(1), x)

    def fwd_bwd(params, xin):
        def loss(p):
            return jnp.sum(net.apply(p, xin) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        return l, g

    def multi(params, xin):
        def body(carry, _):
            p, xc = carry
            l, g = fwd_bwd(p, xc)
            # data dependency: feed the loss AND a reduction of every
            # gradient leaf back into the input — without the gradient
            # term XLA dead-code-eliminates the whole backward pass and
            # the "fwd+bwd" timing silently measures forward only
            gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g))
            return (p, xc + (l + gsum) * 1e-20), l
        (_, _), ls = jax.lax.scan(body, (params, xin), None, length=scan_k)
        return ls[-1]

    f = jax.jit(multi)
    float(f(v, x))                      # compile + drain
    t0 = time.perf_counter()
    last = None
    for _ in range(calls):
        last = f(v, x)
    float(last)                         # queue drain
    dt = time.perf_counter() - t0
    return dt / (calls * scan_k) * 1e3  # ms per fwd+bwd


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scan_k", type=int, default=64)
    p.add_argument("--calls", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    import jax.numpy as jnp
    dtype = jnp.dtype(args.dtype)
    slow = bench(False, args.scan_k, args.calls, dtype)
    fast = bench(True, args.scan_k, args.calls, dtype)
    print(f"deconv fwd+bwd ms/step  xla_transpose={slow:.3f}  "
          f"phase_stack={fast:.3f}  speedup={slow / fast:.2f}x")


if __name__ == "__main__":
    main()
