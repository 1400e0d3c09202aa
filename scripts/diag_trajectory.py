"""Posterior-health trajectory summary for a finished run.

Reads `runs/<name>/metrics.jsonl` (the training loop's device-side
metric window, flushed at report boundaries — tags: train/test recon,
train/test kl, sigma_max when the SO(3) drift monitor is active) and
prints a compact epoch-binned table: recon, KL, sigma_max. This is the
forensics tool for mean-image-bound cells in the latent matrices — a
collapse shows up as KL -> 0 (posterior carries no pose information)
or as sigma pinned at the clamp bound, and the trajectory dates the
collapse. Reference for what a healthy cell looks like:
unsupervised.py:122-156 logs the same quantities in the reference.

Usage: python scripts/diag_trajectory.py matrix-v2-c100d400-vmfq-action \
          [--bins 12]
"""
import argparse
import json
import os


def load(run_name):
    path = os.path.join("runs", run_name, "metrics.jsonl")
    series = {}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            series.setdefault(d["tag"], []).append((d["step"], d["value"]))
    # metrics.jsonl is opened in append mode by MetricWriter, so re-running
    # a run NAME concatenates step series that restart at 0 (ADVICE r4):
    # keep only the LAST monotonic segment per tag so the table and the
    # best/min stats describe one run, and say so when older runs existed.
    truncated = False
    for tag, pts in series.items():
        start = 0
        for i in range(1, len(pts)):
            if pts[i][0] < pts[i - 1][0]:
                start = i
        if start:
            truncated = True
            series[tag] = pts[start:]
    if truncated:
        print(f"NOTE: {path} holds multiple runs (step counter restarts); "
              "summarizing only the most recent one")
    return series


def summarize(run_name, bins=12):
    series = load(run_name)
    test_recon = series.get("test_recon", [])
    if not test_recon:
        print(f"{run_name}: no test_recon series")
        return
    steps = [s for s, _ in test_recon]
    lo, hi = steps[0], steps[-1]
    edges = [lo + (hi - lo) * i // max(1, bins - 1) for i in range(bins)]

    def at(tag, step):
        pts = series.get(tag, [])
        best = None
        for s, v in pts:
            if s <= step:
                best = v
            else:
                break
        return best

    print(f"== {run_name} (steps {lo}..{hi})")
    print("| step | test recon | test KL | sigma_max |")
    print("|---|---|---|---|")
    for e in edges:
        r = at("test_recon", e)
        k = at("test_kl", e)
        sg = at("sigma_max", e)
        print(f"| {e} | {r if r is None else round(r, 2)} "
              f"| {k if k is None else round(k, 3)} "
              f"| {sg if sg is None else round(sg, 3)} |")
    # headline stats
    kl_last = series.get("test_kl", [(None, None)])[-1][1]
    rec_best = min(v for _, v in test_recon)
    sg_all = [v for _, v in series.get("sigma_max", [])]
    print(f"best test recon {round(rec_best, 2)}; final KL "
          f"{kl_last if kl_last is None else round(kl_last, 3)}; "
          f"sigma_max range "
          f"{[round(min(sg_all), 3), round(max(sg_all), 3)] if sg_all else '—'}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("runs", nargs="+")
    p.add_argument("--bins", type=int, default=12)
    args = p.parse_args(argv)
    for r in args.runs:
        summarize(r, args.bins)


if __name__ == "__main__":
    main()
