"""Worker process for the REAL multi-process distributed test.

Launched by tests/test_distributed.py via subprocess (one Python process
per simulated host, each with its own set of virtual CPU devices, talking
through jax.distributed's coordination service + Gloo CPU collectives).
This exercises the actual multi-host code paths — initialize_distributed,
per-process BatchLoader shards, jax.make_array_from_process_local_data
global-batch assembly, and the n_proc-aware eval pass — across real
process boundaries, which in-process simulations cannot.

Two modes:
- ``toy``: a deterministic toy-SO(3) training epoch + eval.
- ``flagship``: the full production path — conv+BatchNorm image model on
  streaming uint8 ScPairs batches (pair flattening), equivariance +
  encoder-continuity regularizers (the second encoder pass advances BN
  stats), AND an orbax checkpoint save -> restore into a fresh experiment
  -> continue-training round trip, all across the process boundary
  (checkpoint save/restore are collective under jax.distributed).

Each worker writes the resulting metrics and a parameter checksum to
--out as JSON; the test asserts the 2-process run equals the
single-process run.
"""
import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local_devices", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["toy", "flagship"], default="toy")
    ap.add_argument("--data_dir", help="sc-pairs dir (flagship mode)")
    ap.add_argument("--ckpt_dir", help="orbax round-trip dir (flagship)")
    ap.add_argument("--device_data", action="store_true",
                    help="device-resident dataset cache (toy mode): every "
                         "process replicates the data on its devices and "
                         "batches are global on-device index gathers")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    # xla_cpu_collective_timeout_seconds: Gloo context rendezvous (KV
    # exchange + TCP connect) defaults to a hard 30 s window per
    # communicator; on an oversubscribed single-core CI host the two
    # workers' multi-minute compiles can skew past it at any first
    # collective of a new clique/stream. 600 s rides out worst-case skew.
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{args.local_devices}"
        " --xla_cpu_collective_timeout_seconds=600").strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from lie_vae_tpu.parallel import initialize_distributed, make_mesh
    if args.num_processes > 1:
        initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes, process_id=args.process_id)
        assert jax.process_count() == args.num_processes
        # Establish the cross-process Gloo context NOW, while the
        # processes are still in lockstep: context rendezvous has a hard
        # 30 s timeout, and on a contended single-core host the flagship
        # model's multi-minute compiles can skew the processes past it at
        # the first collective. The cheap all-reduce here creates (and
        # caches) the communicator under near-zero skew.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("worker-start")

    import jax.numpy as jnp
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import (ConstantSchedule, LinearSchedule,
                                   UnsupervisedExperiment)

    mesh = make_mesh()     # all global devices on the 'data' axis

    def tree_l1(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return float(sum(jnp.sum(jnp.abs(p)) for p in leaves)) \
            if leaves else 0.0

    if args.mode == "toy":
        from lie_vae_tpu.data import ToyDataset
        ds = ToyDataset.generate(n=96, degrees=2, rep_copies=3)  # seeded:
        model = LieVAE(latent_mode="so3", decoder_mode="action",  # every
                       encode_mode="toy", deconv_mode="toy",      # process
                       mean_mode="s2s2", degrees=2, rep_copies=3)  # sees the
        exp = UnsupervisedExperiment(                              # same data
            model=model, train_dataset=ds, test_dataset=ds,
            beta_schedule=ConstantSchedule(1.0), batch_size=16,
            report_freq=10 ** 9, lr=1e-3, clip_grads=None, mesh=mesh,
            seed=0, steps_per_call=2, device_data=args.device_data)
        exp.train(0)
        vals = exp.test()
        out = {"param_l1": tree_l1(exp.state.params),
               "test_recon": float(vals[0]), "test_kl": float(vals[1])}
    else:
        out = run_flagship(args, mesh, tree_l1)

    out.update(process_count=jax.process_count(),
               global_devices=jax.device_count())
    with open(args.out, "w") as f:
        json.dump(out, f)


def run_flagship(args, mesh, tree_l1):
    """Production path across the process boundary: conv+BN image model,
    streaming uint8 ScPairs batches (pair flattening), equivariance +
    continuity regularizers, orbax save -> fresh-experiment restore ->
    continue training. Every process must observe identical replicated
    state throughout (the test compares against single-process)."""
    import jax
    from lie_vae_tpu.data import ScPairsDataset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import (ConstantSchedule, LinearSchedule,
                                   UnsupervisedExperiment)
    from lie_vae_tpu.train.checkpoint import restore_state, save_state

    ds = ScPairsDataset(args.data_dir)

    def build():
        model = LieVAE(latent_mode="so3", decoder_mode="action",
                       mean_mode="s2s2", encode_mode="conv",
                       deconv_mode="deconv", rgb=True, batch_norm=True,
                       degrees=2, rep_copies=2, conv_hidden=8,
                       deconv_hidden=16)
        return UnsupervisedExperiment(
            model=model, train_dataset=ds, test_dataset=ds,
            beta_schedule=ConstantSchedule(1.0), batch_size=8,
            report_freq=10 ** 9, lr=1e-3, clip_grads=1e-5,
            equivariance_lamb=LinearSchedule(0.0, 100.0, 1, 8),
            encoder_continuity_lamb=LinearSchedule(0.0, 3000.0, 1, 8),
            mesh=mesh, seed=0, steps_per_call=2)

    exp = build()
    exp.train(0)
    ckpt = os.path.join(args.ckpt_dir, "ckpt")
    save_state(ckpt, exp.state)     # collective across processes
    saved_param_l1 = tree_l1(exp.state.params)
    saved_bn_l1 = tree_l1(exp.state.batch_stats)
    del exp

    # fresh experiment (new init state) -> restore -> continue training.
    # Align the stateful counters with a continuous run so the 1- and
    # 2-process runs stay step-for-step comparable after the round trip:
    exp2 = build()
    exp2.state = restore_state(ckpt, exp2.state)
    exp2.train_loader.epoch = 1     # epoch-1 permutation, not epoch-0 again
    exp2._eval_seq = 1              # epoch-0's report already drew eval key 0
    restored_step = int(exp2.state.step)
    exp2.train(1)
    vals = exp2.test()
    return {
        "saved_param_l1": saved_param_l1,
        "saved_bn_l1": saved_bn_l1,
        "restored_step": restored_step,
        "param_l1": tree_l1(exp2.state.params),
        "bn_l1": tree_l1(exp2.state.batch_stats),
        "test_recon": float(vals[0]),
        "test_kl": float(vals[1]),
    }


if __name__ == "__main__":
    main()
