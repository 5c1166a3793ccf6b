"""Optimizer, LR schedule and EMA.

Reproduces the reference recipe (reference utils/train_utils.py):
  * AdamW with a minGPT-style decay / no-decay parameter split
    (train_utils.py:35-94): matmul/conv kernels decay, everything else
    (biases, LayerNorm affine, AffineDropPath scales, rel-PE, query
    embeddings) does not. In our pytree the split is exactly
    "leaf name == 'kernel'".
  * per-iteration LinearWarmupCosineAnnealing schedule
    (utils/lr_schedulers.py:9-120, closed form), stepping after each
    optimizer update so step t uses lr(t) with lr(0) = warmup_start_lr.
  * EMA of parameters with decay 0.999 (train_utils.py:10-32) — a single
    fused tree_map instead of the reference's state-dict copy loop.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, max_steps: int,
                           warmup_start_lr: float = 0.0,
                           eta_min: float = 1e-8):
    """Closed-form LinearWarmupCosineAnnealingLR."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + step * (base_lr - warmup_start_lr) / max(
            warmup_steps - 1, 1)
        prog = (step - warmup_steps) / max(max_steps - warmup_steps, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def multistep_schedule(base_lr: float, warmup_steps: int,
                       milestones: tuple[int, ...], gamma: float,
                       warmup_start_lr: float = 0.0):
    """LinearWarmupMultiStepLR (utils/lr_schedulers.py:122-210)."""
    milestones = tuple(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + step * (base_lr - warmup_start_lr) / max(
            warmup_steps - 1, 1)
        decays = sum(jnp.where(step >= m, 1, 0) for m in milestones)
        return jnp.where(step < warmup_steps, warm,
                         base_lr * gamma ** decays)

    return schedule


def decay_mask(params) -> Any:
    """True where weight decay applies (kernels of Dense / conv layers)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def leaf_is_decay(path):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", None))
        return name == "kernel" or (
            isinstance(name, str) and name.endswith("_kernel"))

    mask_flat = [leaf_is_decay(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def bias_mask(params) -> Any:
    """True on bias leaves (reference solver: `"bias" in key`)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def leaf_is_bias(path):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", None))
        return isinstance(name, str) and "bias" in name

    mask_flat = [leaf_is_bias(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def detector_sgd(schedule, params, *, momentum: float = 0.9,
                 weight_decay: float = 1e-4, bias_lr_factor: float = 2.0,
                 weight_decay_bias: float = 0.0,
                 clip: float = 10.0) -> optax.GradientTransformation:
    """The reference detector optimizer (mega_core/solver/build.py:7-20):
    SGD with momentum where bias parameters get lr x BIAS_LR_FACTOR and
    WEIGHT_DECAY_BIAS (default 0) while everything else decays at
    WEIGHT_DECAY. Ordering matches torch.optim.SGD: decay is added to the
    gradient before the momentum buffer; the per-group lr factor applies
    after it."""
    bmask = bias_mask(params)
    nonbias = jax.tree.map(lambda b: not b, bmask)
    parts = [optax.add_decayed_weights(weight_decay, mask=nonbias)]
    if weight_decay_bias:
        parts.append(optax.add_decayed_weights(weight_decay_bias,
                                               mask=bmask))
    parts.append(optax.trace(decay=momentum))
    if bias_lr_factor != 1.0:
        parts.append(optax.masked(optax.scale(bias_lr_factor), bmask))
    parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)
    if clip and clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def build_optimizer(params, training_config: dict,
                    num_iters_per_epoch: int) -> optax.GradientTransformation:
    """Reference build_optimizer + build_scheduler in one optax chain."""
    base_lr = training_config["training_lr"]
    clip = training_config.get("clip_grad_l2norm", 0.0)
    wd = training_config.get("weight_decay", 0.05)
    total_epoch = training_config["total_epoch"]
    max_steps = total_epoch * num_iters_per_epoch

    if training_config.get("warmup", True):
        warmup_steps = training_config["warmup_epochs"] * num_iters_per_epoch
        if training_config.get("schedule_type", "cosine") == "cosine":
            schedule = warmup_cosine_schedule(base_lr, warmup_steps, max_steps)
        else:
            steps = tuple(num_iters_per_epoch * s
                          for s in training_config["schedule_steps"])
            schedule = multistep_schedule(
                base_lr, warmup_steps, steps,
                training_config.get("schedule_gamma", 0.1))
    else:
        schedule = optax.cosine_decay_schedule(base_lr, max_steps)

    opt_type = training_config.get("type", "AdamW")
    mask = decay_mask(params)
    if opt_type == "AdamW":
        tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=wd, mask=mask)
    elif opt_type == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=mask),
            optax.sgd(schedule, momentum=training_config.get("momentum", 0.9)))
    else:
        raise TypeError(f"Unsupported optimizer: {opt_type}")

    if clip and clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule


def ema_update(ema_params, params, decay: float = 0.999):
    """ema = decay * ema + (1 - decay) * params, fused over the pytree."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
