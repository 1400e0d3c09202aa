"""Device mesh + sharding (new component; the reference is single-GPU)."""
from lie_vae_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed, make_mesh, batch_spec, shard_batch,
    param_shardings, shard_state)
