"""Data pipelines (reference: lie_vae/experiments/datasets.py)."""
from lie_vae_tpu.data.loader import BatchLoader  # noqa: F401
from lie_vae_tpu.data.shapes import (  # noqa: F401
    ShapeDataset, SphereCubeDataset, ScPairsDataset, count_renders,
    filename_to_quaternion, filename_to_name)
from lie_vae_tpu.data.splits import Subset, random_split  # noqa: F401
from lie_vae_tpu.data.toy import ToyDataset  # noqa: F401
