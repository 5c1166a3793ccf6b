"""Host-side training data loader: policy shuffling, pair assembly, static
packing, and background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(reference train.py:77-97): the global batch is assembled on the host and
sharded over the mesh's dp axis by the step function, so there is no
per-process sampler arithmetic — one loader feeds the whole mesh.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from . import batching


class TrainLoader:
    def __init__(self, dataset, batch_size: int, pack_size: int,
                 max_seq_len: int, num_gt: int, feat_dim: int, seed: int = 42,
                 prefetch: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.pack_size = pack_size
        self.max_seq_len = max_seq_len
        self.num_gt = num_gt
        self.feat_dim = feat_dim
        self.seed = seed
        self.prefetch = prefetch

    def steps_per_epoch(self) -> int:
        return self.ds.num_train_items() // self.batch_size

    def epoch(self, epoch: int):
        """Yields packed batches for one epoch (shuffled, drop-last)."""
        rng = np.random.default_rng(self.seed + 1000 * epoch)
        order = rng.permutation(self.ds.num_train_items())
        n_steps = self.steps_per_epoch()

        def produce(q: queue.Queue):
            try:
                for step in range(n_steps):
                    idxs = order[step * self.batch_size:
                                 (step + 1) * self.batch_size]
                    pairs = []
                    for i in idxs:
                        pairs += self.ds.get_train_item(int(i), rng)
                    q.put(batching.pack_train_batch(
                        pairs, self.pack_size, self.max_seq_len,
                        self.num_gt, self.feat_dim))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            q.put(None)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
