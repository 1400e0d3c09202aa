"""Worker process for the REAL multi-process distributed test.

Launched by tests/test_distributed.py via subprocess (one Python process
per simulated host, each with its own set of virtual CPU devices, talking
through jax.distributed's coordination service + Gloo CPU collectives).
This exercises the actual multi-host code paths — initialize_distributed,
per-process BatchLoader shards, jax.make_array_from_process_local_data
global-batch assembly, and the n_proc-aware eval pass — across real
process boundaries, which in-process simulations cannot.

Runs a deterministic toy-SO(3) training epoch + eval and writes the
resulting metrics and a parameter checksum to --out as JSON; the test
asserts the 2-process run equals the single-process run.
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
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{args.local_devices}").strip()
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

    import jax.numpy as jnp
    from lie_vae_tpu.data import ToyDataset
    from lie_vae_tpu.models import LieVAE
    from lie_vae_tpu.train import ConstantSchedule, UnsupervisedExperiment

    ds = ToyDataset.generate(n=96, degrees=2, rep_copies=3)  # seeded: every
    model = LieVAE(latent_mode="so3", decoder_mode="action",  # process sees
                   encode_mode="toy", deconv_mode="toy",      # the same data
                   mean_mode="s2s2", degrees=2, rep_copies=3)
    mesh = make_mesh()     # all global devices on the 'data' axis
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds,
        beta_schedule=ConstantSchedule(1.0), batch_size=16,
        report_freq=10 ** 9, lr=1e-3, clip_grads=None, mesh=mesh,
        seed=0, steps_per_call=2)

    exp.train(0)
    vals = exp.test()
    param_l1 = float(sum(
        jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(
            exp.state.params)))
    with open(args.out, "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "test_recon": float(vals[0]),
            "test_kl": float(vals[1]),
            "param_l1": param_l1,
        }, f)


if __name__ == "__main__":
    main()
