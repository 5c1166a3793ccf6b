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


def make_mesh(n_dp: int | None = None, n_tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_tp
    assert n_dp * n_tp <= len(devices), (n_dp, n_tp, len(devices))
    arr = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, axis_names=("dp", "tp"))


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
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_batch_slice(global_batch_size: int) -> slice:
    """The rows of the global batch this process must produce for
    shard_batch (contiguous process-major chunking, matching
    make_mesh's jax.devices() order)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    local = global_batch_size // n
    r = jax.process_index()
    return slice(r * local, (r + 1) * local)


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
