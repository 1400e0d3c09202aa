"""Experiment CLI: ``python -m lie_vae_tpu.cli.main``.

Mirrors the reference's flag surface and flow (lie_vae/experiments/main.py):
argparse (~35 flags, main.py:146-210) with ``--config a b c`` merging YAML
presets into the parser defaults (CLI still overrides, main.py:212-219);
dataset/model/experiment construction, epoch loop with best-checkpoint
saving and early stopping (main.py:117-131), final importance-sampled LL
(main.py:134-143).

TPU deltas: checkpoints via orbax (params + batch_stats + optimizer state +
step — the reference drops optimizer state, main.py:122-127); data-parallel
mesh opt-in via --mesh_data/--mesh_model.
"""
import argparse
import os

import numpy as np
import yaml

from lie_vae_tpu.data import (
    ScPairsDataset, SphereCubeDataset, ToyDataset, random_split)
from lie_vae_tpu.models import LieVAE
from lie_vae_tpu.train import (
    LinearSchedule, MetricWriter, UnsupervisedExperiment, get_beta_schedule)
from lie_vae_tpu.train.checkpoint import restore_state, save_state


def build_dataset(args):
    batch_size = 64
    item_rep = None
    if args.dataset == "spherecube":
        dataset = SphereCubeDataset(subsample=args.subsample,
                                    **({"directory": args.data_dir}
                                       if args.data_dir else {}))
    elif args.dataset == "sc-pairs":
        dataset = ScPairsDataset(subsample=args.subsample,
                                 **({"directory": args.data_dir}
                                    if args.data_dir else {}))
        batch_size = 32
    elif args.dataset == "toy":
        if not os.path.exists(args.toy_path):
            print(f"Generating toy dataset at {args.toy_path} ...")
            ToyDataset.generate(
                n=1000, degrees=args.degrees,
                rep_copies=args.rep_copies).save(args.toy_path)
        dataset = ToyDataset(path=args.toy_path)
        expected = ((args.degrees + 1) ** 2, args.rep_copies)
        if dataset.harmonics.shape != expected:
            raise ValueError(
                f"{args.toy_path} was generated with spectrum shape "
                f"{dataset.harmonics.shape}, but --degrees/--rep_copies "
                f"request {expected}; regenerate it or pass a different "
                f"--toy_path")
        if args.fixed_spectrum:
            item_rep = dataset.harmonics
    else:
        raise ValueError("Wrong dataset")
    if len(dataset) == 0:
        raise RuntimeError("Dataset empty")
    return dataset, batch_size, item_rep


def sigma_clamp_value(args):
    """--sigma_clamp: float upper bound on the SO(3) posterior sigma, or
    'auto' = pi*density_k/2, the k-shell wrapped density's validity bound
    (see SO3Reparameterize.sigma_clamp)."""
    import math

    raw = getattr(args, "sigma_clamp", None)
    if raw is None:
        return None
    if str(raw).lower() == "auto":
        return math.pi * args.density_k / 2.0
    return float(raw)


def build_model(args, dataset, item_rep):
    return LieVAE(
        latent_mode=args.latent_mode,
        mean_mode=args.mean_mode,
        decoder_mode=args.decoder_mode,
        encode_mode=("toy" if args.dataset == "toy" else "conv"),
        deconv_mode=("toy" if args.dataset == "toy" else args.deconv_mode),
        rep_copies=args.rep_copies,
        degrees=args.degrees,
        deconv_hidden=args.deconv_hidden,
        conv_hidden=args.conv_hidden,
        batch_norm=bool(args.batch_norm),
        rgb=dataset.rgb,
        normal_dims=args.normal_dims,
        deterministic=args.deterministic,
        fixed_item_rep=item_rep,
        wigner_transpose=args.wigner_transpose,
        mlp_layers=args.mlp_layers,
        mlp_hidden=args.mlp_hidden,
        mlp_activation=args.mlp_activation,
        fixed_sigma=args.fixed_sigma,
        compute_dtype=args.compute_dtype,
        encoder_dtype=args.encoder_dtype,
        decoder_dtype=args.decoder_dtype,
        deconv_head_dtype=args.deconv_head_dtype,
        kernel_impl=args.kernel_impl,
        density_k=args.density_k,
        sigma_clamp=sigma_clamp_value(args),
    )


def main(argv=None):
    args = parse_args(argv)
    print({k: v for k, v in sorted(vars(args).items())})
    if args.name is not None:
        args.log_dir = "runs/" + args.name
        args.save_dir = "outputs/" + args.name

    dataset, batch_size, item_rep = build_dataset(args)
    model = build_model(args, dataset, item_rep)

    num_valid = min(25000, int(0.2 * len(dataset)))
    num_test = min(25000, int(0.2 * len(dataset)))
    split = [num_valid, num_test, len(dataset) - num_valid - num_test]
    valid_dataset, test_dataset, train_dataset = random_split(dataset, split)
    print("Dataset splits: train={}, valid={}, test={}".format(
        len(train_dataset), len(valid_dataset), len(test_dataset)))

    equivariance = (LinearSchedule(0, args.equivariance, 1000,
                                   args.equivariance_end_it)
                    if args.equivariance is not None else None)
    encoder_continuity = (LinearSchedule(0, args.encoder_continuity, 1000,
                                         args.encoder_continuity_end_it)
                          if args.encoder_continuity is not None else None)

    mesh = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        from lie_vae_tpu.parallel import make_mesh
        mesh = make_mesh(args.mesh_data, args.mesh_model)

    experiment = UnsupervisedExperiment(
        model=model,
        train_dataset=train_dataset,
        test_dataset=valid_dataset,
        beta_schedule=get_beta_schedule(args.beta_schedule, args.beta),
        lr=args.lr,
        weight_decay=args.weight_decay,
        elbo_samples=args.elbo_samples,
        report_freq=args.report_freq,
        clip_grads=args.clip_grads,
        selective_clip=args.selective_clip,
        batch_size=batch_size,
        equivariance_lamb=equivariance,
        encoder_continuity_lamb=encoder_continuity,
        control=args.control,
        control_p=args.control_p,
        log=MetricWriter(args.log_dir),
        mesh=mesh,
        log_histograms=args.log_histograms,
        steps_per_call=args.steps_per_call,
        device_data=args.device_data,
        seed=args.seed,
        equivariance_rotate=args.equivariance_rotate,
    )

    if args.torch_checkpoint:
        # migrate a reference run: torch.save'd state_dict (the reference's
        # save_dir/model.pickle, main.py:122-127) -> our params/batch_stats;
        # optimizer state starts fresh (the reference never saved it)
        if args.continue_epoch > 0:
            raise SystemExit("--torch_checkpoint initializes a fresh run; "
                             "it cannot be combined with --continue_epoch "
                             "(use the orbax checkpoint to resume)")
        from lie_vae_tpu.compat import load_torch_checkpoint
        print(f"Importing torch checkpoint {args.torch_checkpoint} ..")
        variables = {"params": experiment.state.params}
        if experiment.state.batch_stats:
            variables["batch_stats"] = experiment.state.batch_stats
        imported = load_torch_checkpoint(args.torch_checkpoint, model,
                                         variables)
        experiment.state = experiment.state.replace(
            params=imported["params"],
            batch_stats=imported.get("batch_stats",
                                     experiment.state.batch_stats))

    if args.continue_epoch > 0 and args.save_dir:
        print("Loading..")
        experiment.state = restore_state(
            os.path.join(args.save_dir, "checkpoint"), experiment.state)

    if args.profile_dir:
        experiment.profile(args.profile_dir)

    early_stop_counter = 0
    for epoch in range(args.continue_epoch, args.epochs):
        previous_best = experiment.best_value
        experiment.train(epoch)

        if args.save_dir:
            improved = previous_best != experiment.best_value
            if args.max_early_stop is None or improved:
                save_state(os.path.join(args.save_dir, "checkpoint"),
                           experiment.state)
                early_stop_counter = 0
            elif early_stop_counter < args.max_early_stop:
                early_stop_counter += 1
            else:
                print(f"Early stop at epoch {epoch}")
                break
    experiment.log.close()

    if args.beta != 0:
        print("Computing LL..")
        ll = experiment.log_likelihood(test_dataset, n=args.ll_samples,
                                       max_items=args.ll_max_items,
                                       batch_size=args.ll_batch,
                                       n_chunk=args.ll_chunk)
        print("LL: {:.2f}".format(ll))
        with open("ll.txt", "a") as f:
            f.write("{} : {:4f}\n".format(args.name, ll))
    return experiment


def parse_args(argv=None):
    # flag surface mirrors main.py:146-210 (same names and defaults)
    parser = argparse.ArgumentParser("VAE experiment")
    parser.add_argument("--dataset", default="toy",
                        help="[toy, spherecube, sc-pairs]")
    parser.add_argument("--decoder_mode", default="action",
                        help="[action, mlp]")
    parser.add_argument("--latent_mode", default="so3",
                        help="[so3, normal, vmf, vmfq]")
    parser.add_argument("--mean_mode", default="s2s2",
                        help="For SO(3). Choose [q, alg, s2s2, s2s1]")
    parser.add_argument("--deconv_mode", default="deconv")
    parser.add_argument("--batch_norm", type=int, default=1)
    parser.add_argument("--beta", type=float, default=1.0)
    parser.add_argument("--beta_schedule", type=str)
    parser.add_argument("--control", type=float,
                        help="KL-controlled VAE gamma. Beta is KL target.")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--report_freq", type=int, default=2500)
    parser.add_argument("--degrees", type=int, default=6)
    parser.add_argument("--deconv_hidden", type=int, default=200)
    parser.add_argument("--conv_hidden", type=int, default=50,
                        help="conv-encoder base width (TPU extension; the "
                             "reference hardcodes 50)")
    parser.add_argument("--rep_copies", type=int, default=10)
    parser.add_argument("--clip_grads", type=float, default=1e-5)
    parser.add_argument("--selective_clip", action="store_true")
    parser.add_argument("--elbo_samples", type=int, default=1)
    parser.add_argument("--log_dir")
    parser.add_argument("--save_dir")
    parser.add_argument("--name")
    parser.add_argument("--continue_epoch", type=int, default=0)
    parser.add_argument("--equivariance", type=float)
    parser.add_argument("--equivariance_end_it", type=int, default=20000)
    parser.add_argument("--encoder_continuity", type=float)
    parser.add_argument("--encoder_continuity_end_it", type=int,
                        default=20000)
    parser.add_argument("--max_early_stop", type=int, default=50)
    parser.add_argument("--subsample", type=float, default=1.0)
    parser.add_argument("--data_dir", default=None,
                        help="override the image-dataset directory "
                             "(default: the reference's data/spherecube / "
                             "data/sc-pairs)")
    parser.add_argument("--normal_dims", type=int, default=3)
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--wigner_transpose", action="store_true")
    parser.add_argument("--fixed_spectrum", action="store_true")
    parser.add_argument("--mlp_hidden", type=int, default=50)
    parser.add_argument("--mlp_layers", type=int, default=3)
    parser.add_argument("--mlp_activation", default="relu")
    parser.add_argument("--fixed_sigma", type=float)
    parser.add_argument("--equivariance_rotate", default="shear",
                        choices=["shear", "gather"],
                        help="equivariance-loss image rotation: 'shear' = "
                             "Paeth three-matmul rotation (TPU-fast, "
                             "default), 'gather' = map_coordinates "
                             "bilinear (bit-matches the reference's "
                             "grid_sample)")
    parser.add_argument("--sigma_clamp", default=None,
                        help="upper clamp on the SO(3) posterior's learned "
                             "algebra sigma: a float, or 'auto' = "
                             "pi*density_k/2 (the wrapped density's "
                             "validity bound) — prevents the runaway-sigma "
                             "divergence seen at scaled capacity")
    parser.add_argument("--control_p", type=int, default=2)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--lr", type=float, default=1.0e-3)
    parser.add_argument("--config", nargs="*")
    # TPU-specific additions
    parser.add_argument("--mesh_data", type=int, default=1,
                        help="data-parallel mesh axis size")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="model-parallel mesh axis size")
    parser.add_argument("--toy_path", default="data/toy.npz")
    parser.add_argument("--log_histograms", action="store_true")
    parser.add_argument("--seed", type=int, default=0,
                        help="training RNG seed (param init, sampling "
                             "noise, shuffle); the data split stays the "
                             "reference's np-seed-0 so all seeds train on "
                             "identical splits")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="optimizer steps per jitted dispatch (scan); "
                             "use 8-32 on TPU to amortize host overhead")
    parser.add_argument("--device_data", action="store_true",
                        help="cache the whole dataset on device (uint8) and "
                             "gather batches on-chip — zero per-step "
                             "host->chip image traffic for datasets that "
                             "fit in HBM")
    parser.add_argument("--compute_dtype", default=None,
                        help="conv/MLP compute dtype, e.g. bfloat16 "
                             "(params and Lie math stay float32)")
    parser.add_argument("--encoder_dtype", default="unset",
                        help="override compute_dtype for the encoder stack "
                             "('bfloat16'|'float32'; default: follow "
                             "--compute_dtype)")
    parser.add_argument("--decoder_dtype", default="unset",
                        help="override compute_dtype for the decoder "
                             "(deconv/MLP) stack")
    parser.add_argument("--deconv_head_dtype", default="unset",
                        help="override dtype for just the final "
                             "image-channel transpose conv (mixed recipe: "
                             "bf16 stack, float32 pixel head)")
    parser.add_argument("--kernel_impl", default="xla",
                        help="[xla, fused, pallas, auto] impl of the "
                             "Lie-group ops ('fused' = single-Pallas-kernel "
                             "Wigner chain, fastest at serving batch; "
                             "'auto' picks by measured crossover; Pallas "
                             "kernels have custom-VJP backwards, safe for "
                             "training)")
    parser.add_argument("--density_k", type=int, default=10,
                        help="wrapping shells of the SO(3) posterior "
                             "density (reference hardcodes 10); raise when "
                             "the sigma_max monitor warns of truncation "
                             "bias")
    parser.add_argument("--ll_samples", type=int, default=500)
    parser.add_argument("--ll_max_items", type=int, default=None)
    parser.add_argument("--ll_batch", type=int, default=1,
                        help="items per LL-eval dispatch (the estimator is "
                             "per-item, so batching is exact; 1 = the "
                             "reference's loop, main.py:137-140; measured optimum 32)")
    parser.add_argument("--ll_chunk", type=int, default=None,
                        help="samples per scan chunk inside LL eval "
                             "(bounds the (n,B,...) decoder intermediates)")
    parser.add_argument("--torch_checkpoint", default=None,
                        help="initialize params (+BN stats) from a PyTorch "
                             "reference checkpoint (torch.save'd "
                             "state_dict, the reference's model.pickle) — "
                             "fine-tune or evaluate a reference run on TPU")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler device trace of a few "
                             "training dispatches before the run")

    conf = {}
    pkg_config = os.path.join(os.path.dirname(__file__), "config")
    for name in parser.parse_args(argv).config or []:
        for base in ("config", pkg_config):
            path = os.path.join(base, name + ".yaml")
            if os.path.exists(path):
                with open(path) as f:
                    conf = {**conf, **yaml.safe_load(f)}
                break
        else:
            raise FileNotFoundError(f"config preset '{name}' not found")
    parser.set_defaults(**conf)
    return parser.parse_args(argv)


if __name__ == "__main__":
    main()
