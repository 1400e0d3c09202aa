"""Measure the HOST data-feeding ceiling vs the device-resident path.

VERDICT r2 weak #4: the 8-chip samples/s projection implicitly assumed
the streaming loader can feed 8 chips; nothing measured that ceiling.
This driver measures, on one host:

1. loader-only rate: BatchLoader gather+prep (warm uint8 cache) —
   pure host-side batch assembly;
2. streaming feed rate: loader + the actual per-group device_put
   (jnp.asarray of stacked (K, B, 64, 64, 3) uint8 through the tunnel)
   drained by readback — what the chip-side scan would actually receive;
3. the device-resident path's consumption rate for reference
   (config-4 chip steps/s x batch, from scripts/bench_chip_rates.py
   markers when present).

The multi-host implication is direct: with per-process device_data
(supported since r3 — every process replicates the uint8 cache on its
devices), the streaming ceiling only bounds STARTUP, not steady-state
training; for datasets too big for HBM, the streaming rate here is the
per-host bound to compare against chips-per-host x chip samples/s.

Run (real TPU): python scripts/bench_data_path.py
Writes a table between `data-path` markers in BENCHMARKS.md.
"""
import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- data-path:begin -->"
END = "<!-- data-path:end -->"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", default="data/spherecube")
    p.add_argument("--n_images", type=int, default=2048)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--group_k", type=int, default=16,
                   help="batches stacked per device put (the train loop's "
                        "steps_per_call grouping)")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    import numpy as np

    from lie_vae_tpu.data import SphereCubeDataset, count_renders
    from lie_vae_tpu.data.loader import BatchLoader

    if count_renders(args.data_dir) < args.n_images:
        from lie_vae_tpu.cli.gen_spherecube import generate
        generate(args.n_images, args.data_dir, step_size=0.1, pairs=False)
    ds = SphereCubeDataset(args.data_dir)
    ds.warm_cache()
    loader = BatchLoader(ds, args.batch, shuffle=True, drop_last=True)

    # 1. host-only batch assembly rate (what the loader can produce)
    n = 0
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        for b in loader:
            n += b[-1].shape[0]
    host_rate = n / (time.perf_counter() - t0)

    # 2. streaming feed: loader + grouped uint8 device puts, drained
    import jax
    import jax.numpy as jnp
    checks = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    n = 0
    group = []
    last = None
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        for b in loader:
            group.append(np.asarray(b[-1]))
            if len(group) == args.group_k:
                last = checks(jnp.asarray(np.stack(group)))
                n += args.group_k * args.batch
                group.clear()
    _ = int(last)                               # drain the queue
    feed_rate = n / (time.perf_counter() - t0)

    # 3. chip consumption (config 4) from the chip-rates table, if present
    chip_consumption = None
    if os.path.exists(args.out):
        doc = open(args.out).read()
        m = re.search(r"action decoder\s*\+ deconv \(batch 64\) \| 64 \| "
                      r"([\d.]+) \| (\d+)", doc)
        if m:
            chip_consumption = int(m.group(2))

    result = {
        "host_loader_samples_per_sec": round(host_rate),
        "streamed_feed_samples_per_sec": round(feed_rate),
        "chip_consumption_samples_per_sec": chip_consumption,
        "batch": args.batch, "group_k": args.group_k,
        "uint8_bytes_per_sample": 64 * 64 * 3,
    }
    print(json.dumps(result), flush=True)

    chip_row = (f"{chip_consumption}" if chip_consumption
                else "see chip-rates table")
    feeds = (f"{feed_rate / chip_consumption:.1f}" if chip_consumption
             else "—")
    block = "\n".join([
        BEGIN,
        "### Host data-feeding ceiling vs device-resident data",
        "",
        f"Measured on {args.n_images} spherecube renders (warm uint8 "
        f"cache), batch {args.batch}, groups of {args.group_k} batches "
        "per device put (the train loop's dispatch grouping). The "
        "streamed rate is the per-HOST bound for feeding chips when the "
        "dataset cannot live in HBM; with `device_data` (multi-host "
        "supported since r3: every process replicates the uint8 cache "
        "on its local devices) the host feeds images only at startup "
        "and steady-state training is NOT host-bound. Driven by "
        "`scripts/bench_data_path.py`.",
        "",
        "| path | samples/s |",
        "|---|---|",
        f"| host batch assembly (loader only) | {round(host_rate)} |",
        f"| streamed host→device feed (uint8, grouped) | "
        f"{round(feed_rate)} |",
        f"| chip consumption, config 4 (device-resident) | {chip_row} |",
        "",
        (f"The streamed feed sustains {feeds}× one chip's consumption — "
         "the per-host loader bound for the 8-chip projection; "
         "`device_data` removes the bound entirely at these dataset "
         "sizes." if chip_consumption else ""),
        END,
    ])
    doc = open(args.out).read() if os.path.exists(args.out) else ""
    if BEGIN in doc and END in doc:
        pre, rest = doc.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(args.out, "w") as f:
        f.write(doc)
    print(f"updated {args.out}")
    return result


if __name__ == "__main__":
    main()
