"""Device mesh + sharding rules.

The reference is single-GPU (cuda:0 throughout, lie_vae/experiments/main.py:17,
unsupervised.py:8) — this module is a new first-class component.

Design (scaling-book recipe): pick a mesh, annotate shardings on the inputs,
let XLA GSPMD insert the collectives over ICI.

- 'data' axis: batch-sharded data parallelism — the scaling axis for this
  model family (~1-10M params; gradient all-reduce rides ICI).
- 'model' axis (optional): tensor parallelism for the wide deconv/dense
  kernels — output-feature sharded; XLA all-gathers activations where needed.
  Off (size 1) by default; exercised by the multi-chip dry run.
"""
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host initialization (jax.distributed).

    Call once per host before creating the mesh when running on a multi-host
    TPU slice; all hosts then see the global device set and per-host data
    loading shards the batch (BatchLoader seeds are deterministic, so shard
    by process_id). No-op arguments defer to TPU auto-configuration.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_data=None, n_model=1, devices=None):
    """Create a ('data', 'model') mesh. n_data defaults to all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data >= 1 and n_model >= 1, (
        f"mesh {n_data}x{n_model} is empty — n_model={n_model} exceeds "
        f"the {len(devices)} available devices?")
    use = n_data * n_model
    assert use <= len(devices), (
        f"mesh {n_data}x{n_model} needs {use} devices, have {len(devices)}")
    dev_array = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[:use])
    return Mesh(dev_array, ("data", "model"))


def batch_spec(mesh, ndim):
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(x, mesh):
    return jax.device_put(x, batch_spec(mesh, np.ndim(x)))


def param_shardings(params, mesh, min_size=1 << 13):
    """Per-parameter shardings: big >=2D kernels are output-feature sharded
    over 'model' (when the axis exists, is > 1, and divides the dim);
    everything else is replicated."""
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def rule(path, p):
        if (n_model > 1 and p.ndim >= 2 and p.size >= min_size
                and p.shape[-1] % n_model == 0):
            return NamedSharding(
                mesh, P(*([None] * (p.ndim - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_state(state, mesh):
    """Place a TrainState on the mesh: params (and the matching optimizer
    moments) per param_shardings, everything else replicated."""
    p_sh = param_shardings(state.params, mesh)
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(state.params, p_sh)

    # Adam moments have the same tree structure as params; map them too.
    def place_opt(opt_state):
        def try_place(entry):
            try:
                return jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, s), entry, p_sh)
            except (ValueError, TypeError):
                return jax.device_put(entry, replicated)

        if isinstance(opt_state, tuple):
            placed = []
            for part in opt_state:
                if hasattr(part, "mu") and hasattr(part, "nu"):
                    placed.append(part._replace(
                        mu=try_place(part.mu), nu=try_place(part.nu),
                        count=jax.device_put(part.count, replicated)))
                else:
                    placed.append(jax.device_put(part, replicated))
            return tuple(placed)
        return jax.device_put(opt_state, replicated)

    return state.replace(
        params=params,
        batch_stats=jax.device_put(state.batch_stats, replicated),
        opt_state=place_opt(state.opt_state),
        step=jax.device_put(state.step, replicated))
