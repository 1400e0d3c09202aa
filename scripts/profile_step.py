"""Whole-step device-time breakdown of the flagship train step (real TPU).

VERDICT r1 next-step #2: publish per-op device-time shares of the
~680 steps/s flagship step (which op family owns the step: deconv stack
vs conv+BN vs Wigner vs wrapped-KL vs Adam) plus step-level HBM / MXU
utilization, so optimization effort lands on the largest slice.

Captures a jax.profiler device trace of the bench.py training dispatch
(scan of SCAN_K steps), then parses the XLA-op XPlane directly
(tensorflow.tsl protobuf) — no TensorBoard round-trip:

  python scripts/profile_step.py [--scan_k 64] [--calls 2] [--top 25]

Prints: top ops by device time, grouped category shares, and (when the
runtime exports flops/bytes stats) aggregate MXU/HBM utilization.
The reference's only perf instrument is a wall-clock seconds/iteration
print (lie_vae/experiments/unsupervised.py:151-155).
"""
import argparse
import collections
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(scan_k):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from lie_vae_tpu.train.state import TrainState, make_optimizer

    model = _flagship_model(compute_dtype="bfloat16")
    batch = 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 64, 64, 3),
                           jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        x, n=1, train=True)
    tx = make_optimizer(lr=1e-3, clip_grads=1e-5)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    beta = jnp.float32(1.0)

    def train_step(state, x, rng):
        def loss_fn(params):
            (recon, kl_sum, _, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, n=1, train=True, method="elbo",
                rngs={"sample": rng}, mutable=["batch_stats"])
            loss = jnp.mean(recon) + beta * jnp.mean(kl_sum)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    def multi_step(state, x, rng):
        def body(s, k):
            return train_step(s, x, k)
        s, ls = jax.lax.scan(body, state, jax.random.split(rng, scan_k))
        return s, ls[-1]

    return jax.jit(multi_step, donate_argnums=0), state, x


# matched against the FULL HLO instruction text (op name, output shape,
# operand shapes, fusion kind); first hit wins. The model's conv layers
# are identifiable by their unique filter-operand shapes: deconv stack
# (deconv_hidden=200, input spectrum 490) vs conv encoder
# (conv_hidden=50 -> 50/100/200/400 chain ending at 64x64x3 images).
CATEGORY_RULES = [
    ("loop / control", r"%while|%condition|%tuple|%parameter|%constant"),
    ("deconv stack (490->200->...->3 transposed convs, fwd+bwd)",
     r"4,4,490,200\]|4,4,200,200\]|2,2,200,12\]|4,4,200,3\]|33,33,12\]"),
    ("conv encoder (3->50->100->200->400, fwd+bwd)",
     r"4,4,3,50\]|4,4,50,100\]|4,4,100,200\]|4,4,200,400\]|4,4,400,"),
    ("matmul / dense (heads, Wigner, MLP)", r"\bdot\b|dot\(|dot_general"),
    ("rng (keys + normals)", r"\brng\b|rng-bit|xor|threefry"),
    ("copy / transpose / reshape / pad", r"%copy|%transpose|%reshape"
                                         r"|%bitcast|%pad|%slice|%reverse"),
    ("reduce (loss/BN stats/grad-norm)", r"reduce"),
    ("elementwise fusion (incl. Adam/clip)", r"fusion"),
]


def categorize(name):
    low = name.lower()
    for cat, pat in CATEGORY_RULES:
        if re.search(pat, low):
            return cat
    return "other"


def parse_xplane(trace_dir, top, debug=False):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    assert pbs, f"no xplane.pb under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(pbs[0], "rb") as f:
        xspace.ParseFromString(f.read())

    # only the TPU device plane's per-op line — the host-interface /
    # Megascale planes carry DMA bookkeeping, and the module/step lines
    # double-count their children
    dev_planes = [p for p in xspace.planes
                  if p.name.startswith("/device:TPU")]
    assert dev_planes, ("no TPU plane in trace; planes: "
                        + str([p.name for p in xspace.planes]))

    per_op = collections.Counter()
    per_op_count = collections.Counter()
    per_cat = collections.Counter()
    flops_total = 0.0
    bytes_total = 0.0
    span = [float("inf"), 0.0]
    for plane in dev_planes:
        meta = {m_id: m for m_id, m in plane.event_metadata.items()}
        stat_names = {s_id: s.name for s_id, s in plane.stat_metadata.items()}
        op_lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
        if not op_lines:
            print(f"note: no 'XLA Ops' line in {plane.name}; lines:",
                  [ln.name for ln in plane.lines])
            op_lines = plane.lines
        for line in op_lines:
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                full = m.name if m else "?"            # full HLO text
                name = (m.display_name or m.name) if m else "?"
                dur = ev.duration_ps / 1e9            # ps -> ms
                t0 = line.timestamp_ns / 1e6 + ev.offset_ps / 1e9
                span[0] = min(span[0], t0)
                span[1] = max(span[1], t0 + dur)
                per_op[full] += dur
                per_op_count[full] += 1
                cat = None
                for st in ev.stats:
                    sname = stat_names.get(st.metadata_id, "")
                    if debug and per_op_count[full] == 1:
                        print("   stat:", name[:40], sname,
                              st.WhichOneof("value"))
                    if sname == "flops":
                        flops_total += st.uint64_value or st.int64_value
                    elif sname in ("bytes accessed", "bytes_accessed"):
                        bytes_total += st.uint64_value or st.int64_value
                    elif sname == "hlo_category":
                        cat = st.str_value or None
                per_cat[cat or categorize(full)] += dur
    return per_op, per_op_count, per_cat, flops_total, bytes_total, span


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan_k", type=int, default=64)
    ap.add_argument("--calls", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default="/tmp/flagship_profile")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args(argv)

    if not args.parse_only:
        import jax
        step, state, x = build_step(args.scan_k)
        state, loss = step(state, x, jax.random.PRNGKey(3))   # compile
        float(loss)
        t0 = time.perf_counter()
        with jax.profiler.trace(args.trace_dir):
            for i in range(args.calls):
                state, loss = step(state, x, jax.random.PRNGKey(10 + i))
            float(loss)                                       # drain
        wall = time.perf_counter() - t0
        n_steps = args.calls * args.scan_k
        print(f"trace captured: {n_steps} steps in {wall:.3f}s "
              f"({n_steps / wall:.1f} steps/s wall)")

    per_op, counts, cats, flops, bytes_acc, span = parse_xplane(
        args.trace_dir, args.top, debug=getattr(args, "debug", False))
    loop_ms = cats.pop("loop / control", 0.0)
    total = sum(per_op.values()) - loop_ms
    print(f"\ntotal device op time: {total:.3f} ms (excl. {loop_ms:.1f} ms"
          f" parent while-loop spans); busy span {span[1] - span[0]:.3f} ms")

    print("\n== category shares ==")
    for cat, ms in cats.most_common():
        print(f"  {cat:40s} {ms:9.3f} ms  {100 * ms / total:5.1f}%")

    print(f"\n== top {args.top} ops ==")
    for name, ms in per_op.most_common(args.top):
        print(f"  {ms:9.3f} ms  x{counts[name]:<5d} {100 * ms / total:5.1f}%"
              f"  {name[:200]}")

    if flops or bytes_acc:
        dev_s = total / 1e3
        print("\n== aggregate utilization (xplane stats) ==")
        print(f"  flops total {flops:.3e} -> {flops / dev_s / 1e12:.2f} "
              "TFLOP/s")
        print(f"  bytes accessed {bytes_acc:.3e} -> "
              f"{bytes_acc / dev_s / 1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
