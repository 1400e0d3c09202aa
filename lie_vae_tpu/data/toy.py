"""Toy dataset: random spherical-harmonic spectra rotated by Haar-random
group elements with the exact forward operator the action decoder learns.

Reference: ToyDataset, lie_vae/experiments/datasets.py:130-165 (generation at
:142-158 — seeded harmonics normalized to Frobenius norm 10, Haar
quaternions, batched block-Wigner rotation). Stored as .npz instead of a
torch pickle.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from lie_vae_tpu import ops

DEFAULT_PATH = "data/toy.npz"


class ToyDataset:
    """In-memory (quaternions, harmonics, x) triples.

    Attributes mirror the reference's TensorDataset-of-3 layout: item i is
    (q_i, harmonics, x_i).
    """
    num_workers = 0
    single_id = True
    rgb = False

    def __init__(self, tensors=None, path=DEFAULT_PATH):
        if tensors is None:
            with np.load(path) as data:
                tensors = (data["quaternions"], data["harmonics"], data["x"])
        q, harmonics, x = tensors
        self.quaternions = np.asarray(q, dtype=np.float32)
        self.harmonics = np.asarray(harmonics, dtype=np.float32)
        self.x = np.asarray(x, dtype=np.float32)

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, idx):
        return (self.quaternions[idx], self.harmonics, self.x[idx])

    def gather(self, indices):
        """Vectorized batch fetch (numpy fancy indexing, no per-item loop)."""
        idx = np.asarray(indices)
        return (self.quaternions[idx],
                np.broadcast_to(self.harmonics,
                                (len(idx),) + self.harmonics.shape),
                self.x[idx])

    @staticmethod
    def prep_batch(batch):
        return batch

    @classmethod
    def generate(cls, n=1000, degrees=6, rep_copies=10, seed=0,
                 batch_size=512):
        """Reference: ToyDataset.generate, datasets.py:142-158."""
        key = jax.random.PRNGKey(seed)
        k_h, k_q = jax.random.split(key)
        harmonics = jax.random.normal(k_h, ((degrees + 1) ** 2, rep_copies))
        harmonics = harmonics / jnp.linalg.norm(harmonics) * 10.0

        xs, qs = [], []
        for i, k in zip(range(0, n, batch_size),
                        jax.random.split(k_q, -(-n // batch_size))):
            m = min(i + batch_size, n) - i
            q = ops.random_quaternions(k, m)
            x = ops.block_wigner_matrix_multiply(
                ops.quaternions_to_eazyz(q), harmonics, degrees)
            qs.append(np.asarray(q))
            xs.append(np.asarray(x))
        return cls(tensors=(np.concatenate(qs, 0), np.asarray(harmonics),
                            np.concatenate(xs, 0)))

    def save(self, path=DEFAULT_PATH):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, quaternions=self.quaternions,
                 harmonics=self.harmonics, x=self.x)
