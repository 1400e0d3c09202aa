"""Run the five BASELINE.json configs end-to-end on the TPU and write a
results table to BENCHMARKS.md.

Configs (BASELINE.json):
  1. toy SO(3) auto-encoder (MLP -> algebra mean -> Rodrigues, matrix recon)
  2. spherecube VAE, Euclidean N(0, I) latent + MLP decoder baseline
  3. SO(3)-latent VAE: s2s2 Gram-Schmidt mean, MLP decoder
  4. action decoder: block-Wigner rotation of learned Fourier modes + deconv
  5. full homeomorphic VAE: SO(3) latent + action decoder + equivariance +
     continuity regularizers (sc-pairs data)

Spherecube data comes from the in-repo renderer (see data/render.py) — the
reference needs Blender for this step; the dataset format is identical.

Usage: python scripts/run_baseline_configs.py [--steps 500] [--n_images 2048]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def ensure_data(n_images, n_pairs):
    from lie_vae_tpu.cli.gen_spherecube import generate

    if not os.path.isdir("data/spherecube") or \
            len(os.listdir("data/spherecube")) < n_images:
        print(f"rendering {n_images} spherecube images ...")
        os.makedirs("data/spherecube", exist_ok=True)
        generate(n_images, "data/spherecube", step_size=0.1, pairs=False)
    if not os.path.isdir("data/sc-pairs") or \
            len(os.listdir("data/sc-pairs")) < 2 * n_pairs:
        print(f"rendering {n_pairs} spherecube pairs ...")
        os.makedirs("data/sc-pairs", exist_ok=True)
        generate(n_pairs, "data/sc-pairs", step_size=2 * np.pi / 60,
                 pairs=True)


def build(config_name, args):
    from lie_vae_tpu.data import (ScPairsDataset, SphereCubeDataset,
                                  ToyDataset, random_split)
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import (ConstantSchedule, LinearSchedule,
                                   UnsupervisedExperiment)

    common_img = dict(encode_mode="conv", deconv_mode="deconv", rgb=True,
                      degrees=6, rep_copies=10, deconv_hidden=200,
                      batch_norm=True, compute_dtype=args.compute_dtype,
                      # per-stack mixed-precision overrides (defaults
                      # follow compute_dtype; see LieVAE.encoder_dtype)
                      encoder_dtype=getattr(args, "encoder_dtype", "unset"),
                      decoder_dtype=getattr(args, "decoder_dtype", "unset"),
                      deconv_head_dtype=getattr(args, "deconv_head_dtype",
                                                "unset"))
    kw = dict(batch_size=64, report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
              steps_per_call=args.steps_per_call,
              device_data=args.device_data)

    if config_name == "1-toy-so3-ae":
        ds = ToyDataset.generate(n=4096, degrees=6, rep_copies=10)
        nv = 512
        valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       mean_mode="alg", encode_mode="toy",
                       deconv_mode="toy", degrees=6, rep_copies=10,
                       deterministic=True, fixed_item_rep=ds.harmonics)
        return UnsupervisedExperiment(
            model=model, train_dataset=train, test_dataset=valid,
            beta_schedule=ConstantSchedule(0.0), **kw)

    if config_name == "5-full-regularized":
        ds = ScPairsDataset()
        nv = max(8, len(ds) // 5)
        valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       mean_mode="s2s2", **common_img)
        kw["batch_size"] = 32
        return UnsupervisedExperiment(
            model=model, train_dataset=train, test_dataset=valid,
            beta_schedule=ConstantSchedule(1.0),
            equivariance_lamb=LinearSchedule(0, 100, 10, 1000),
            encoder_continuity_lamb=LinearSchedule(0, 3000, 10, 1000),
            **kw)

    ds = SphereCubeDataset()
    nv = max(16, len(ds) // 5)
    valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])
    if config_name == "2-spherecube-normal-mlp":
        model = LieVAE(latent_mode="normal", decoder_mode="mlp",
                       normal_dims=30, **common_img)
    elif config_name == "3-spherecube-so3-mlp":
        model = LieVAE(latent_mode="so3", decoder_mode="mlp",
                       mean_mode="s2s2", **common_img)
    elif config_name == "4-spherecube-so3-action":
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       mean_mode="s2s2", **common_img)
    else:
        raise ValueError(config_name)
    return UnsupervisedExperiment(
        model=model, train_dataset=train, test_dataset=valid,
        beta_schedule=ConstantSchedule(1.0), **kw)


def run(config_name, args):
    exp = build(config_name, args)
    first = exp.test()
    steps_per_epoch = len(exp.train_loader)
    n_epochs = max(2, args.steps // steps_per_epoch + 1)
    # epoch 0 untimed: jit compilation (remote-compile through the tunnel
    # costs tens of seconds) + data decode into the cache
    exp.train(0)
    exp.test()
    # NOTE: timed epochs still include the per-epoch validation pass +
    # report that loop.py runs at every epoch end (reference semantics,
    # unsupervised.py:122-156) — steps/s here is conservative wall-clock;
    # chip-only throughput is what bench.py measures.
    t0 = time.perf_counter()
    for epoch in range(1, n_epochs):
        exp.train(epoch)
    last = exp.test()   # reads back values -> drains the queue
    dt = time.perf_counter() - t0
    timed_steps = (n_epochs - 1) * steps_per_epoch
    res = {
        "steps": n_epochs * steps_per_epoch,
        "steps_per_sec": round(timed_steps / dt, 1),
        "recon_first": round(float(first[0]), 2),
        "recon_last": round(float(last[0]), 2),
        "kl_last": round(float(last[1]), 3),
    }
    print(config_name, json.dumps(res))
    return res


CONFIG_DESCRIPTIONS = {
    "1-toy-so3-ae": "toy SO(3) AE: MLP enc, algebra mean, fixed spectrum, "
                    "matrix recon (batch 64)",
    "2-spherecube-normal-mlp": "spherecube VAE, N(0,I) latent (30d) + MLP "
                               "decoder (batch 64)",
    "3-spherecube-so3-mlp": "spherecube SO(3)-latent VAE, s2s2 mean + MLP "
                            "decoder (batch 64)",
    "4-spherecube-so3-action": "spherecube SO(3)-latent VAE, action decoder "
                               "+ deconv (batch 64)",
    "5-full-regularized": "full homeomorphic VAE: SO(3)+action + "
                          "equivariance + continuity (sc-pairs, batch 32)",
}


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--n_images", type=int, default=2048)
    p.add_argument("--n_pairs", type=int, default=512)
    p.add_argument("--steps_per_call", type=int, default=16)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--device_data", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="cache datasets on device (fits easily at these "
                        "sizes); --no-device_data streams from host")
    p.add_argument("--out", default="BENCHMARKS.md")
    p.add_argument("--configs", nargs="*",
                   default=list(CONFIG_DESCRIPTIONS))
    args = p.parse_args(argv)

    ensure_data(args.n_images, args.n_pairs)
    results = {}
    for name in args.configs:
        results[name] = run(name, args)

    # persist into the shared store and render the unified table (chip
    # steps/s primary when bench_chip_rates has populated its side)
    from scripts._results_table import (update_baseline_store,
                                        write_baseline_sweep)
    store = update_baseline_store(
        "wall", results,
        meta={"compute_dtype": args.compute_dtype,
              "steps_per_call": args.steps_per_call,
              "n_images": args.n_images, "n_pairs": args.n_pairs,
              "backend": jax.default_backend()})
    write_baseline_sweep(store, args.out, CONFIG_DESCRIPTIONS)


if __name__ == "__main__":
    main()
