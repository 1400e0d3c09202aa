"""Scan-amortized CHIP training rates for all five BASELINE configs.

VERDICT r2 weak #5: the five-config BASELINE table publishes wall-clock
steps/s with an acknowledged 2-3x session variance (the tunneled runtime's
dispatch latency drifts); only config 4 ever got the session-stable
scan-amortized treatment (bench.py). This driver times the REAL
UnsupervisedExperiment multi-step program (the same jitted scan
`train()` dispatches — config 5 includes the equivariance second encoder
pass, the continuity loss, and BN stat updates) for every config:
K train steps per dispatch on device-resident data, N dispatches, queue
drained by a scalar readback — pure chip rate, independent of the
session's dispatch weather.

Run (real TPU): python scripts/bench_chip_rates.py [--scan_k 64]
Writes a table between `chip-rates` markers in BENCHMARKS.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- chip-rates:begin -->"
END = "<!-- chip-rates:end -->"

# config-4 precision variants: model-dtype kwargs on top of the bf16
# default (the throughput side of the converged bf16-vs-f32 study)
PRECISIONS = {
    "float32": {"compute_dtype": "float32"},
    "f32enc": {"encoder_dtype": "float32"},
    "f32dec": {"decoder_dtype": "float32"},
    "f32head": {"deconv_head_dtype": "float32"},
}
PRECISION_LABELS = {
    "float32": "float32 everywhere",
    "f32enc": "mixed: f32 encoder, bf16 decoder",
    "f32dec": "mixed: bf16 encoder, f32 decoder",
    "f32head": "mixed: bf16 stacks, f32 image head",
}


def chip_rate(exp, n_calls):
    """Steps/sec of the experiment's own compiled multi-step program."""
    import itertools

    import jax.numpy as jnp
    import numpy as np

    K = exp.steps_per_call
    data, factor = exp._device_train
    # K index batches (cycled if the epoch is shorter than the scan)
    idx_iter = itertools.cycle(exp._train_idx_loader._index_batches())
    batches = [exp._expand_item_indices(next(idx_iter), factor)
               for _ in range(K)]
    its = np.arange(1, K + 1, dtype=np.int32)
    scheds = [exp._schedule_values(int(g)) for g in its]
    betas, eqs, conts = (jnp.asarray([s[i] for s in scheds],
                                     dtype=jnp.float32) for i in range(3))
    idxs = exp._put(jnp.asarray(np.stack(batches)), replicate=True)

    # compile + warm
    exp.state, m = exp._multi_step_idx(exp.state, data, idxs, betas, eqs,
                                       conts, exp._rng, its)
    _ = float(np.asarray(m["recon"])[-1])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        exp.state, m = exp._multi_step_idx(exp.state, data, idxs, betas,
                                           eqs, conts, exp._rng, its)
    last = float(np.asarray(m["recon"])[-1])     # true queue drain
    dt = time.perf_counter() - t0
    return n_calls * K / dt, last


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scan_k", type=int, default=64,
                   help="train steps per dispatch (compile scales with K; "
                        "64 is within ~2%% of 128 — BENCHMARKS scan-depth "
                        "study)")
    p.add_argument("--n_calls", type=int, default=12)
    p.add_argument("--configs", nargs="*",
                   default=["1", "2", "3", "4", "5"])
    p.add_argument("--n_images", type=int, default=2048)
    p.add_argument("--n_pairs", type=int, default=512)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--precision_rows", nargs="*", default=[],
                   metavar="NAME",
                   help="extra precision-variant rows for config 4 "
                        f"(choices: {sorted(PRECISIONS)}) — the "
                        "throughput side of the bf16-vs-f32 convergence "
                        "study (converged-compare table)")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    from scripts.run_baseline_configs import (
        CONFIG_DESCRIPTIONS, build, ensure_data)

    ensure_data(args.n_images, args.n_pairs)
    names = {c.split("-")[0]: c for c in CONFIG_DESCRIPTIONS}

    class BuildArgs:
        steps_per_call = args.scan_k
        compute_dtype = args.compute_dtype
        device_data = True

    import jax
    print(f"backend: {jax.default_backend()}, scan_k={args.scan_k}")
    results = {}
    descriptions = dict(CONFIG_DESCRIPTIONS)
    for key in args.configs:
        name = names[key]
        exp = build(name, BuildArgs)
        sps, last_recon = chip_rate(exp, args.n_calls)
        batch = exp.train_loader.batch_size
        results[name] = {"chip_steps_per_sec": round(sps, 1),
                         "chip_samples_per_sec": round(sps * batch),
                         "batch": batch,
                         "recon_after": round(last_recon, 2)}
        print(name, json.dumps(results[name]), flush=True)
        del exp
        write_table(results, args, descriptions)

    for pname in args.precision_rows:
        class PArgs(BuildArgs):
            pass
        for k, v in PRECISIONS[pname].items():
            setattr(PArgs, k, v)
        exp = build("4-spherecube-so3-action", PArgs)
        sps, last_recon = chip_rate(exp, args.n_calls)
        batch = exp.train_loader.batch_size
        rname = f"4-spherecube-so3-action ({pname})"
        descriptions[rname] = (CONFIG_DESCRIPTIONS["4-spherecube-so3-action"]
                               + f" — {PRECISION_LABELS[pname]}")
        results[rname] = {"chip_steps_per_sec": round(sps, 1),
                          "chip_samples_per_sec": round(sps * batch),
                          "batch": batch,
                          "recon_after": round(last_recon, 2)}
        print(rname, json.dumps(results[rname]), flush=True)
        del exp
        write_table(results, args, descriptions)

    # persist + refresh the unified five-config BASELINE table (chip
    # column primary, wall secondary)
    from scripts._results_table import (update_baseline_store,
                                        write_baseline_sweep)
    store = update_baseline_store(
        "chip", results, meta={"scan_k": args.scan_k,
                               "compute_dtype": args.compute_dtype})
    write_baseline_sweep(store, args.out, descriptions)
    return results


def write_table(results, args, descriptions=None):
    from scripts._results_table import merge_marker_table
    from scripts.run_baseline_configs import CONFIG_DESCRIPTIONS

    def row(desc, r):
        return (f"| {desc} | {r['batch']} | {r['chip_steps_per_sec']} "
                f"| {r['chip_samples_per_sec']} |")

    merge_marker_table(
        args.out, BEGIN, END,
        caption=(
            "Scan-amortized CHIP rates for every BASELINE config on one "
            "TPU chip — the experiment harness's own compiled "
            f"scan-of-{args.scan_k} train program (config 5 includes the "
            "equivariance second encoder pass + continuity loss), "
            "device-resident data, queue drained by scalar readback — "
            "session-stable chip throughput (these are the quotable "
            "numbers; the unified five-config table above carries this "
            "column too). compute_dtype="
            f"{args.compute_dtype} unless a row says otherwise. Driven by "
            "`scripts/bench_chip_rates.py`."),
        header=("| config | batch | chip steps/s | chip samples/s |"),
        descriptions=descriptions or CONFIG_DESCRIPTIONS, results=results,
        format_row=row,
        section_title="Chip rates, all BASELINE configs")


if __name__ == "__main__":
    main()
