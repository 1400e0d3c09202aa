"""Host-side batch loader with threaded prefetch.

Replaces the reference's torch DataLoader worker processes
(lie_vae/experiments/unsupervised.py:32-37, num_workers at datasets.py:16).
TPU-first differences:

- batches are assembled into single contiguous numpy arrays (one device put
  per step, no per-item tensor traffic);
- ``drop_last=True`` by default for training so every step has a static
  shape (no XLA recompilation on the ragged last batch); evaluation keeps
  ragged batches on host;
- prefetch is a thread pool with a bounded lookahead (image decode releases
  the GIL), overlapping host IO with device compute.
"""
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue

import numpy as np


class BatchLoader:
    def __init__(self, dataset, batch_size, shuffle=True, drop_last=True,
                 seed=0, num_threads=None, prefetch=4, num_shards=1,
                 shard_index=0):
        """num_shards/shard_index: multi-host data sharding — every host
        draws the same seeded global permutation and keeps its contiguous
        slice of each global batch (so
        jax.make_array_from_process_local_data can assemble the global
        batch). batch_size is the GLOBAL batch size."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        assert batch_size % num_shards == 0, \
            "global batch must divide evenly across hosts"
        self.num_shards = num_shards
        self.shard_index = shard_index
        if num_threads is None:
            num_threads = getattr(dataset, "num_workers", 0)
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.prep = getattr(dataset, "prep_batch", lambda b: b)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last or self.num_shards > 1:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        drop_last = self.drop_last or self.num_shards > 1
        stop = (n // self.batch_size) * self.batch_size if drop_last else n
        batches = [order[i:i + self.batch_size]
                   for i in range(0, stop, self.batch_size)]
        if self.num_shards > 1:
            # only full global batches shard into equal per-host slices;
            # the ragged tail is dropped on multi-host
            per = self.batch_size // self.num_shards
            batches = [b[self.shard_index * per:(self.shard_index + 1) * per]
                       for b in batches]
        return batches

    def __iter__(self):
        batches = self._index_batches()
        self.epoch += 1
        gather = self.dataset.gather

        if self.num_threads <= 0:
            for idx in batches:
                yield self.prep(gather(idx))
            return

        # bounded-lookahead threaded prefetch: a semaphore caps the number
        # of batches in flight (pool.map would eagerly gather the whole
        # epoch regardless of the queue bound)
        q = Queue()
        sentinel = object()
        window = threading.Semaphore(self.prefetch + self.num_threads)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_threads) as pool:
                for idx in batches:
                    if stop.is_set():
                        break
                    window.acquire()
                    q.put(pool.submit(gather, idx))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                out = item.result()
                window.release()
                yield self.prep(out)
        finally:
            stop.set()
            # unblock the producer if the consumer bailed early
            window.release()
            t.join()
