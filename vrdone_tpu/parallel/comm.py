"""Cross-process communication helpers (multi-host eval gather).

TPU-native counterparts of the reference's NCCL-backed utilities
(datasets/mega/mega_core/utils/comm.py): `all_gather` pickles arbitrary
python objects into padded byte tensors and gathers them across ranks
(:48-88), `reduce_dict` averages a loss dict (:91-117), and the engine
merges per-rank prediction dicts after inference
(mega_core/engine/inference.py:50-69).

Here the transport is jax's cross-process collectives over ICI/DCN
(`multihost_utils.process_allgather`); with a single process every
function degenerates to the identity-style result, so the same code path
runs on one chip, on a CPU test mesh, and on a pod slice.
"""

from __future__ import annotations

import pickle

import numpy as np

import jax


def all_gather_objects(obj) -> list:
    """Gather one arbitrary picklable object per process; every process
    returns the full list ordered by process id (reference
    comm.py:48-88: byte-tensor all_gather with size exchange + padding).
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray([data.size], np.int64))).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[:data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(sizes), -1)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(len(sizes))]


def reduce_dict(d: dict, average: bool = True) -> dict:
    """Average (or sum) a {name: scalar} dict across processes
    (reference comm.py:91-117; unlike the reference, every process gets
    the result, not just rank 0 — collectives are symmetric on TPU)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in d.items()}
    from jax.experimental import multihost_utils

    keys = sorted(d)
    vals = np.asarray([float(d[k]) for k in keys], np.float32)
    allv = np.asarray(multihost_utils.process_allgather(vals))
    allv = allv.reshape(jax.process_count(), len(keys))
    red = allv.mean(axis=0) if average else allv.sum(axis=0)
    return dict(zip(keys, red.astype(float)))


def accumulate_predictions(local_preds: dict) -> dict:
    """Merge per-process {image_id: prediction} dicts into one global
    dict, detecting index gaps (reference
    inference.py:_accumulate_predictions_from_multiple_gpus:50-69)."""
    merged: dict = {}
    for part in all_gather_objects(local_preds):
        merged.update(part)
    ids = sorted(merged)
    # the contiguity check only makes sense for integer image ids (the
    # detector path); relation eval merges {video_name: relations} dicts
    if (ids and all(isinstance(i, (int, np.integer)) for i in ids)
            and list(ids) != list(range(int(ids[0]),
                                        int(ids[0]) + len(ids)))):
        import logging
        logging.getLogger("vrdone_tpu").warning(
            "accumulate_predictions: image ids are not contiguous — "
            "some images may be missing from the evaluation")
    return merged
