"""Checkpoint save/restore (orbax).

Bundles the same state as the reference checkpoints (reference
utils/train_utils.py:167-179): params, EMA params, optimizer state, epoch
and batch size — written asynchronously-safe via orbax's atomic directory
protocol instead of torch.save on rank 0.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


# Singleton async checkpointer for training saves. orbax's
# StandardCheckpointer is an AsyncCheckpointer: .save() performs a
# blocking device->host snapshot of the arrays, then serializes and
# commits the atomic directory in a background thread — the train loop
# keeps stepping while the previous epoch's checkpoint is still being
# written. At most one save is in flight (we wait before enqueuing the
# next); call wait_for_saves() before process exit or before reading a
# checkpoint back.
_CKPTR: ocp.StandardCheckpointer | None = None


def _ckptr() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_saves():
    """Block until every async checkpoint save has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(path: str, state, *, epoch: int, batch_size: int,
                    block: bool = False):
    path = os.path.abspath(path)
    payload = {
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"crt_epoch": np.asarray(epoch + 1),
                 "batch_size": np.asarray(batch_size)},
    }
    ckptr = _ckptr()
    ckptr.wait_until_finished()  # at most one outstanding save
    ckptr.save(path, payload, force=True)
    if block:
        ckptr.wait_until_finished()


def restore_checkpoint(path: str, state) -> tuple[Any, int, int]:
    """Restore into an existing TrainState template. Returns
    (state, crt_epoch, batch_size)."""
    path = os.path.abspath(path)
    wait_for_saves()  # a same-process in-flight async save must commit first
    template = {
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"crt_epoch": np.asarray(0), "batch_size": np.asarray(0)},
    }
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, target=template)
    new_state = state.replace(
        params=payload["params"], ema_params=payload["ema_params"],
        opt_state=payload["opt_state"], step=payload["step"])
    return (new_state, int(payload["meta"]["crt_epoch"]),
            int(payload["meta"]["batch_size"]))


def restore_params_for_eval(path: str, params_template) -> Any:
    """Load eval weights, preferring EMA when present (reference
    eval.py:119-122)."""
    path = os.path.abspath(path)
    wait_for_saves()  # a same-process in-flight async save must commit first
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)  # raw pytree, no template needed
    tree = payload.get("ema_params", payload.get("params"))
    if params_template is not None:
        # re-attach the template's tree structure (and catch drift early)
        ref_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_flatten_with_path(
                         params_template)[0]}
        got_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_flatten_with_path(
                         tree)[0]}
        missing = ref_paths - got_paths
        if missing:
            raise ValueError(f"checkpoint missing params: {sorted(missing)[:5]}")
    return tree
