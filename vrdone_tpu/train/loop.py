"""Training state and the jitted train step.

One fused XLA program per step: forward (incl. on-device Hungarian
matching), backward, global-norm clip, AdamW update, EMA — no host syncs.
Replaces the reference epoch loop body (reference train.py:175-213) where
matching bounced through scipy on the CPU every step.

Data parallelism: the step is jitted with the batch sharded over the mesh's
"dp" axis and params replicated; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.maskvrd import MaskVRD, compute_losses
from . import optim


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.999)


def create_train_state(cfg: ModelConfig, training_config: dict,
                       num_iters_per_epoch: int, rng: jax.Array,
                       sample_batch: dict, mesh: Optional[Mesh] = None,
                       tp: bool = False,
                       tp_min_size: int = 1 << 16) -> tuple[TrainState, Any]:
    """Init model + optimizer state, optionally placed on a mesh.

    With a mesh, params are committed up front (replicated, or with large
    kernels sharded over "tp" when tp=True) so the EMA copy and optimizer
    moments inherit the same placement and the first donated step compiles
    for the final layouts (see commit_state).
    """
    model = MaskVRD(cfg)
    if jax.default_backend() == "cpu":
        # eager init: on CPU the op dispatches are cheap and a full-model
        # jit compile would dominate (test-suite path)
        params = model.init(
            {"params": rng},
            sample_batch["feats"], sample_batch["seq_mask"],
            deterministic=True)["params"]
    else:
        # jit the init: one compiled (and persistently cached) program
        # instead of thousands of eager op dispatches — on the
        # remote-dispatch axon TPU path the eager form costs minutes
        # (DEVNOTES round 4)
        init_fn = jax.jit(lambda r, f, m: model.init(
            {"params": r}, f, m, deterministic=True))
        params = init_fn(rng, sample_batch["feats"],
                         sample_batch["seq_mask"])["params"]
    if mesh is not None:
        if tp:
            from ..parallel.mesh import shard_params
            params = shard_params(mesh, params, tp_min_size)
        else:
            params = jax.device_put(params, NamedSharding(mesh, P()))
    tx, schedule = optim.build_optimizer(params, training_config,
                                         num_iters_per_epoch)
    step0 = jnp.zeros((), jnp.int32)
    if mesh is not None:
        step0 = jax.device_put(step0, NamedSharding(mesh, P()))
    state = TrainState(
        step=step0,
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),  # distinct buffers: the
        # step donates its input state, params and ema must not alias
        opt_state=tx.init(params),
        tx=tx,
        # reference parity: ModelEma decay 0.999 (train_utils.py:10-32).
        # Configurable because eval restores EMA-first: short runs (tiny
        # corpora, smoke tests) need a faster-converging average or the
        # evaluated weights lag hundreds of steps behind the raw params.
        ema_decay=float(training_config.get("ema_decay", 0.999)))
    return state, schedule


def train_step(state: TrainState, batch: dict, rng: jax.Array,
               cfg: ModelConfig) -> tuple[TrainState, dict]:
    """One optimization step. batch: see models/maskvrd.py contract."""
    model = MaskVRD(cfg)
    step_rng = jax.random.fold_in(rng, state.step)
    bf16 = cfg.compute_dtype == "bfloat16"

    def forward(params, feats, seq_mask):
        if bf16:
            # mixed precision: master params stay f32 (the optimizer and
            # EMA never see bf16); the network body computes in bf16 on
            # the MXU. LN stats / softmax stay f32 inside the model, and
            # predictions are cast back so matching + losses run in f32.
            from ..utils.precision import cast_floating
            params = cast_floating(params)
            feats = feats.astype(jnp.bfloat16)
        preds = model.apply(
            {"params": params}, feats, seq_mask, deterministic=False,
            rngs={"droppath": step_rng, "dropout": step_rng})
        if bf16:
            preds = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == jnp.bfloat16 else x, preds)
        return preds

    if cfg.remat:
        # trade FLOPs for HBM: recompute the forward during the backward.
        # policy "dots" keeps matmul outputs resident and recomputes only
        # the elementwise chains between them — fewer HBM round-trips for
        # a bandwidth-bound step at a small FLOP surcharge
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if getattr(cfg, "remat_policy", "full") == "dots"
                  else None)
        forward = jax.checkpoint(forward, policy=policy)

    def loss_fn(params):
        preds = forward(params, batch["feats"], batch["seq_mask"])
        losses = compute_losses(cfg, preds, batch)
        return losses["total_loss"], losses

    grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = optim.ema_update(state.ema_params, params, state.ema_decay)
    new_state = state.replace(step=state.step + 1, params=params,
                              ema_params=ema, opt_state=opt_state)
    return new_state, losses


def commit_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the state on the mesh (replicated) BEFORE the first step.

    The step donates its state; an uncommitted initial state makes call 1
    compile for host-default layouts and call 2 recompile for the donated
    replicated outputs — two multi-minute compiles of the same program.
    Committing up front pins one layout for every call."""
    return jax.device_put(state, NamedSharding(mesh, P()))


def make_jitted_train_step(cfg: ModelConfig, mesh: Optional[Mesh] = None,
                           infer_shardings: bool = False):
    """jit train_step; with a mesh, shard the batch over "dp" and replicate
    state (grad all-reduce is inserted by XLA). A mesh with an "sp" axis
    of size > 1 additionally shards the time dimension of the temporal
    batch tensors (sequence parallelism — parallel/mesh.py::
    sp_batch_shardings); GSPMD places the conv halos / attention gathers.

    infer_shardings=True drops the explicit replication constraints and
    lets GSPMD propagate from the committed inputs — required when the
    state carries tensor-parallel ("tp") shardings from
    create_train_state(tp=True)."""
    step_fn = functools.partial(train_step, cfg=cfg)
    if mesh is None:
        return jax.jit(step_fn)
    if infer_shardings:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    if "sp" in mesh.axis_names and mesh.shape["sp"] > 1:
        # per-key specs (the time axis sits at a different rank per key)
        from ..parallel.mesh import sp_batch_shardings
        data = sp_batch_shardings(mesh, {
            "feats": None, "seq_mask": None, "item_valid": None,
            "gt_labels": None, "gt_masks": None, "gt_segs": None,
            "gt_valid": None})
    else:
        data = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,))
