"""Device mesh and sharding layout.

The reference parallelises with DDP over NCCL (reference train.py:52-57,
103-108) — pure data parallelism. TPU-native equivalent: one jax.sharding
Mesh with a leading "dp" axis; batches are sharded on "dp", parameters are
replicated, and XLA inserts the gradient all-reduce (psum over ICI) when the
loss is differentiated under jit. A "tp" axis is exposed for future
tensor-parallel sharding of the einsum-heavy heads — the model is small
enough that dp-only is the production layout, but the train step accepts any
mesh whose batch axis is named "dp".
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_tp: int = 1, n_sp: int = 1,
              devices=None) -> Mesh:
    """("dp", "tp", "sp") mesh. dp shards the batch, tp shards large
    kernels' output features (tp_shardings), sp shards the sequence
    (time) axis of long-video batches (sp_batch_shardings)."""
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // (n_tp * n_sp)
    total = n_dp * n_tp * n_sp
    assert total <= len(devices), (n_dp, n_tp, n_sp, len(devices))
    arr = np.asarray(devices[:total]).reshape(n_dp, n_tp, n_sp)
    return Mesh(arr, axis_names=("dp", "tp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, batch-dim sharded.

    Single-process: `batch` is the full global batch (device_put splits
    it over the local devices). Multi-process (a real pod slice or the
    2-process CPU world of tests/test_multihost.py): `batch` is this
    process's LOCAL shard only — rows [rank*local_bs, (rank+1)*local_bs)
    of the global batch, matching the mesh's process-major device order —
    and the global array is assembled without any host ever materialising
    the full batch (the reference equivalent is per-rank
    DistributedSampler subsets, reference train.py:77-83)."""
    if "sp" in mesh.axis_names and mesh.shape["sp"] > 1:
        sh = sp_batch_shardings(mesh, batch)
    else:
        sh = {k: batch_sharding(mesh) for k in batch}
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
            sh[k], np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}


def local_batch_slice(global_batch_size: int) -> slice:
    """The rows of the global batch this process must produce for
    shard_batch (contiguous process-major chunking, matching
    make_mesh's jax.devices() order)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    local = global_batch_size // n
    r = jax.process_index()
    return slice(r * local, (r + 1) * local)


def sp_batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """Sequence-parallel placement for a train batch dict: the time axis
    of the temporal tensors is sharded over "sp" on top of the "dp" batch
    sharding. GSPMD then partitions the whole forward/backward along T —
    convolution halos, attention K/V gathers, and the psum of the
    time-reduced losses are inserted by the compiler (the scaling-book
    recipe: annotate shardings, let XLA place collectives). This is a
    beyond-reference capability (the reference is DDP-only;
    SURVEY.md §2.5 lists SP as "optional extension"): it scales VidOR-
    length (T=512+) sequences past one chip's HBM without streaming.

    Time-carrying keys (see models/maskvrd.py batch contract):
      feats (B, T, C), seq_mask (B, T) -> P(dp, sp)
      gt_masks (B, G, T)               -> P(dp, None, sp)
    everything else is dp-sharded on its leading batch dim only.
    """
    specs = {
        "feats": P("dp", "sp"),
        "seq_mask": P("dp", "sp"),
        "gt_masks": P("dp", None, "sp"),
    }
    return {k: NamedSharding(mesh, specs.get(k, P("dp")))
            for k in batch}


def tp_shardings(mesh: Mesh, params, min_size: int = 1 << 16):
    """Tensor-parallel placement for the parameter pytree.

    Large matmul kernels get their output-feature (last) dimension sharded
    over the "tp" axis; everything else is replicated. GSPMD then
    propagates the sharding through the matmuls and inserts the collectives
    — no model-code changes (this is the "expose a mesh axis" extension
    noted in SURVEY.md §2.5; the reference has no TP at all).

    Returns a pytree of NamedSharding matching params.
    """
    ntp = mesh.shape["tp"]
    repl = NamedSharding(mesh, P())

    def place(x):
        if (ntp > 1 and hasattr(x, "shape") and x.ndim >= 2
                and int(np.prod(x.shape)) >= min_size
                and x.shape[-1] % ntp == 0):
            spec = [None] * (x.ndim - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return repl

    return jax.tree.map(place, params)


def shard_params(mesh: Mesh, params, min_size: int = 1 << 16):
    """device_put params according to tp_shardings."""
    return jax.tree.map(jax.device_put, params,
                        tp_shardings(mesh, params, min_size))
