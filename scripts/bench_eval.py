"""Benchmark importance-sampled LL evaluation throughput on the real TPU.

The reference evaluates the final test log-likelihood one item at a time
with n=500 importance samples (lie_vae/experiments/main.py:134-143). The
estimator is per-item, so batching items and chunking samples is exact —
this script measures items/sec of the same computation at the reference's
loop shape vs the batched TPU-native path.

Run: python scripts/bench_eval.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_model
from lie_vae_tpu.train.loop import UnsupervisedExperiment
from lie_vae_tpu.train.schedules import ConstantSchedule


class _ArrayDataset:
    def __init__(self, x):
        self.x = x

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return (self.x[i],)

    def gather(self, idx):
        return (self.x[np.asarray(idx)],)

    @staticmethod
    def prep_batch(batch):
        return batch


def main():
    n_items, n = 64, 500
    rng = np.random.RandomState(0)
    imgs = rng.rand(n_items, 64, 64, 3).astype(np.float32)
    ds = _ArrayDataset(imgs)

    model = _flagship_model(compute_dtype="bfloat16")
    exp = UnsupervisedExperiment(
        model=model, train_dataset=ds, test_dataset=ds, batch_size=8,
        beta_schedule=ConstantSchedule(1.0), log=None)

    results = {}
    for label, kwargs in [
            ("reference loop (batch 1, full n)", dict(batch_size=1)),
            ("batched (B=16, chunk 50)", dict(batch_size=16, n_chunk=50)),
            ("batched (B=32, chunk 50)", dict(batch_size=32, n_chunk=50)),
            ("batched (B=32, chunk 100)", dict(batch_size=32, n_chunk=100)),
            ("batched (B=64, chunk 50)", dict(batch_size=64, n_chunk=50)),
    ]:
        # compile warmup on 1-2 dispatches
        exp.log_likelihood(ds, n=n, max_items=kwargs.get("batch_size", 1),
                           **kwargs)
        t0 = time.perf_counter()
        ll = exp.log_likelihood(ds, n=n, **kwargs)
        dt = time.perf_counter() - t0
        results[label] = (n_items / dt, ll)
        print(f"{label:36s} {n_items / dt:8.1f} items/s  (LL {ll:9.2f}, "
              f"{dt:5.2f}s for {n_items} items, n={n})")


if __name__ == "__main__":
    main()
