"""Re-evaluate a saved checkpoint's importance-sampled test LL.

Two jobs the in-training eval can't do (cli/main.py computes the final LL
on the *final* state, mirroring the reference, main.py:134-143):

1. evaluate the BEST checkpoint (cli/main.py only saves on validation
   improvement, so `outputs/<name>/checkpoint` is the best state, not the
   last one);
2. vary the wrapped-density shell count (`--density_k`) to detect
   shell-truncation bias: when late-training sigma grows, the k=10
   truncated log q underestimates the posterior density, which inflates
   the IW-LL and pushes the MC KL negative. An honest LL is one that is
   stable in k.

Usage:
  python scripts/eval_checkpoint.py --name flagship-32k-h400-e100 \
      --dataset spherecube --data_dir data/spherecube-32k \
      --conv_hidden 100 --deconv_hidden 400 --compute_dtype bfloat16 \
      --density_k 10 30
(pass the same model flags as the training run; --density_k takes one or
more shell counts to evaluate.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(args, density_k=(10,), ll_n=500, max_items=None):
    """Best-checkpoint eval for run `args.name` (parsed CLI model flags).

    Returns {"sigma": {mean, median, max} or None,
             "ll": {k: best-checkpoint IW-LL at that shell count}}.
    """
    from lie_vae_tpu.cli import main as cli
    from lie_vae_tpu.data.splits import random_split
    from lie_vae_tpu.train.checkpoint import restore_state
    from lie_vae_tpu.train.loop import UnsupervisedExperiment
    from lie_vae_tpu.train.schedules import ConstantSchedule

    assert args.name, "--name selects outputs/<name>/checkpoint"
    dataset, batch_size, item_rep = cli.build_dataset(args)
    model = cli.build_model(args, dataset, item_rep)

    num_valid = min(25000, int(0.2 * len(dataset)))
    num_test = min(25000, int(0.2 * len(dataset)))
    split = [num_valid, num_test, len(dataset) - num_valid - num_test]
    valid_dataset, test_dataset, train_dataset = random_split(dataset, split)

    exp = UnsupervisedExperiment(
        model=model, train_dataset=train_dataset, test_dataset=valid_dataset,
        beta_schedule=ConstantSchedule(args.beta), batch_size=batch_size,
        log=None)
    exp.state = restore_state(os.path.join("outputs", args.name, "checkpoint"),
                              exp.state)
    out = {"sigma": None, "ll": {}}

    # posterior sigma stats on one test batch (drift diagnostic; the
    # algebra-noise sigma only exists for the SO(3) pushforward latent)
    if args.latent_mode == "so3":
        xs = test_dataset.gather(np.arange(min(256, len(test_dataset))))
        x = jnp.asarray(test_dataset.prep_batch(xs)[-1], jnp.float32)
        if float(x.max()) > 1.5:      # uint8-cached datasets
            x = x / 255.0

        @jax.jit
        def sigma_stats(params, bn, x):
            stats = model.apply(exp._variables(params, bn),
                                x, n=1, train=False, method=model.encode,
                                rngs={"sample": jax.random.PRNGKey(0)})
            sig = stats[0].inner.sigma
            return sig.mean(), sig.max(), jnp.median(sig)

        mean_s, max_s, med_s = sigma_stats(exp.state.params,
                                           exp.state.batch_stats, x)
        out["sigma"] = {"mean": float(mean_s), "median": float(med_s),
                        "max": float(max_s)}
        print(f"posterior sigma on {x.shape[0]} test items: "
              f"mean {float(mean_s):.4f}  median {float(med_s):.4f}  "
              f"max {float(max_s):.4f}")

    for k in density_k:
        exp.model = model.clone(density_k=k)
        exp._ll_jit_cache = {}        # ll_fn closes over exp.model
        ll = exp.log_likelihood(test_dataset, n=ll_n,
                                max_items=max_items,
                                batch_size=args.ll_batch,
                                n_chunk=args.ll_chunk)
        out["ll"][k] = float(ll)
        print(f"IW-LL (n={ll_n}, density_k={k}): {ll:.2f}")
    return out


def main(argv=None):
    from lie_vae_tpu.cli import main as cli

    outer = argparse.ArgumentParser("eval_checkpoint")
    outer.add_argument("--density_k", type=int, nargs="+", default=[10])
    outer.add_argument("--ll_n", type=int, default=500)
    outer.add_argument("--max_items", type=int, default=None)
    outer_args, rest = outer.parse_known_args(argv)

    args = cli.parse_args(rest)
    evaluate(args, density_k=outer_args.density_k, ll_n=outer_args.ll_n,
             max_items=outer_args.max_items)


if __name__ == "__main__":
    main()
