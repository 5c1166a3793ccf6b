"""Host-side training data loader: policy shuffling, pair assembly, static
packing, and background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(reference train.py:77-97). Single-process, the global batch is assembled
on the host and sharded over the mesh's dp axis by the step function.
Multi-process (a pod slice), every process derives the SAME shuffled order
from the seed and packs only its contiguous slice of each global batch —
the per-rank subset logic of the reference's DistributedSampler
(reference train.py:77-83) without any host materialising the full batch;
parallel/mesh.py::shard_batch assembles the global array from the local
shards.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from . import batching


class TrainLoader:
    def __init__(self, dataset, batch_size: int, pack_size: int,
                 max_seq_len: int, num_gt: int, feat_dim: int, seed: int = 42,
                 prefetch: int = 4, process_index: int = 0,
                 process_count: int = 1):
        assert batch_size % process_count == 0, (batch_size, process_count)
        assert pack_size % process_count == 0, (pack_size, process_count)
        self.ds = dataset
        self.batch_size = batch_size
        self.pack_size = pack_size
        self.max_seq_len = max_seq_len
        self.num_gt = num_gt
        self.feat_dim = feat_dim
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count

    def steps_per_epoch(self) -> int:
        return self.ds.num_train_items() // self.batch_size

    def epoch(self, epoch: int):
        """Yields packed batches for one epoch (shuffled, drop-last).

        With process_count > 1 each batch holds only this process's
        local rows (batch_size / process_count items, process-major
        chunking — the layout shard_batch expects)."""
        rng = np.random.default_rng(self.seed + 1000 * epoch)
        order = rng.permutation(self.ds.num_train_items())
        n_steps = self.steps_per_epoch()
        local_bs = self.batch_size // self.process_count
        local_pack = self.pack_size // self.process_count
        lo = self.process_index * local_bs

        def produce(q: queue.Queue):
            try:
                for step in range(n_steps):
                    start = step * self.batch_size + lo
                    idxs = order[start:start + local_bs]
                    pairs = []
                    for i in idxs:
                        pairs += self.ds.get_train_item(int(i), rng)
                    q.put(batching.pack_train_batch(
                        pairs, local_pack, self.max_seq_len,
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
