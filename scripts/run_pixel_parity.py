"""Pixel-level dataset-interchangeability run (VERDICT r1 next-step #4).

The reference's real data pipeline is Blender + cube.blend; this repo's
spherecube data comes from the in-repo ray-caster. To prove the datasets
are interchangeable at the PIXELS (not just loader/label semantics), the
actual PyTorch reference is trained on the ray-cast renders
(scripts/bench_reference_torch.py --configs 4 --train_steps 600) and this
script runs the SAME experiment on the same renders with the same seeded
split: flagship config 4 (SO(3) latent, s2s2 mean, action decoder,
batch 64, Adam 1e-3, clip 1e-5, beta 1), valid-recon evaluated at the
same step counts, and the same small-scale IW-LL (first 24 valid items in
split order, n=100). Matching learning curves on both frameworks = the
renders carry the same learnable pose signal for the reference as for us.

Run (TPU): python scripts/run_pixel_parity.py [--data_dir data/spherecube]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="data/spherecube")
    p.add_argument("--train_steps", type=int, default=607)
    p.add_argument("--eval_every", type=int, default=150)
    p.add_argument("--ll_items", type=int, default=24)
    p.add_argument("--ll_samples", type=int, default=100)
    p.add_argument("--steps_per_call", type=int, default=16)
    p.add_argument("--compute_dtype", default="bfloat16")
    args = p.parse_args(argv)

    from lie_vae_tpu.data import SphereCubeDataset, random_split
    from lie_vae_tpu.data.splits import Subset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import ConstantSchedule, UnsupervisedExperiment

    ds = SphereCubeDataset(args.data_dir)
    nv = max(16, len(ds) // 5)
    valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])

    model = LieVAE(latent_mode="so3", decoder_mode="action",
                   mean_mode="s2s2", encode_mode="conv",
                   deconv_mode="deconv", rgb=True, degrees=6,
                   rep_copies=10, deconv_hidden=200, batch_norm=True,
                   compute_dtype=args.compute_dtype)
    exp = UnsupervisedExperiment(
        model=model, train_dataset=train, test_dataset=valid,
        beta_schedule=ConstantSchedule(1.0), batch_size=64,
        report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
        steps_per_call=args.steps_per_call, device_data=True)

    steps_per_epoch = len(exp.train_loader)
    curve = []
    done = 0
    next_eval = args.eval_every
    epoch = 0
    while done < args.train_steps:
        exp.train(epoch)
        epoch += 1
        done += steps_per_epoch
        if done >= next_eval or done >= args.train_steps:
            vals = exp.test()
            curve.append({"step": done, "valid_recon":
                          round(float(vals[0]), 2)})
            print(json.dumps(curve[-1]), flush=True)
            next_eval = done + args.eval_every

    ll_subset = Subset(valid, np.arange(args.ll_items))
    ll = exp.log_likelihood(ll_subset, n=args.ll_samples,
                            max_items=args.ll_items, batch_size=8,
                            n_chunk=50)
    print(json.dumps({
        "config": "4-spherecube-so3-action (this framework)",
        "data_dir": args.data_dir,
        "curve": curve,
        "iw_ll": {"items": args.ll_items, "samples": args.ll_samples,
                  "value": round(ll, 2)},
    }), flush=True)


if __name__ == "__main__":
    main()
