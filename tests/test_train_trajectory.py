"""Multi-step training-trajectory parity: 10 AdamW+clip+EMA steps on the
same weights and same batch must keep our parameters within 1e-3 relative
drift of the reference's (reference train.py:175-213 loop body with
utils/train_utils.py build_optimizer/build_scheduler/ModelEma). Single
losses (test_model_parity) and the schedule (test_train_step) are pinned
individually; this test pins the COMPOUND numerics — matcher + grads +
global-norm clip + AdamW moments + cosine warmup + EMA — over a real
trajectory."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import oracle
from tests.test_model_parity import (make_models, packed_channels,
                                     small_cfg, _patch_reference_num_masks)
from vrdone_tpu.config import ModelConfig, PredictorConfig
from vrdone_tpu.train import optim as topt
from vrdone_tpu.train.loop import TrainState, train_step

torch = pytest.importorskip("torch")

LR = 1e-3
WD = 0.05
CLIP = 1.0
ITERS_PER_EPOCH = 5          # warmup 5 steps, cosine to step 10
STEPS = 10


def _deterministic_cfg():
    cfg = small_cfg(with_fuzzy=True, scale_range=0.85, droppath=0.0,
                    fuse_path_drop=0.0)
    return ModelConfig(**{**{k: getattr(cfg, k)
                             for k in cfg.__dataclass_fields__},
                          "predictor": PredictorConfig(
                              n_input=32, n_embd=16, n_head=4, n_hidden=64,
                              num_queries=5, num_classes=20,
                              path_pdrop=0.0, num_layers=3,
                              deep_supervision=True)})


def _make_batch(cfg, seed=1):
    """One batch in both containers: the reference's per-item list dict
    and our padded-array batch."""
    rng = np.random.default_rng(seed)
    b, t = 3, cfg.max_seq_len
    c = packed_channels(cfg)
    g = cfg.predictor.num_queries
    lens = np.array([t, 30, 17])
    feats_list, preds_list, masks_list, segs_list = [], [], [], []
    gt_labels = np.zeros((b, g), np.int64)
    gt_masks = np.zeros((b, g, t), np.float32)
    gt_segs = np.zeros((b, g, 2), np.int64)
    gt_valid = np.zeros((b, g), bool)
    x = np.zeros((b, t, c), np.float32)
    for i, ln in enumerate(lens):
        xi = rng.standard_normal((ln, c)).astype(np.float32)
        x[i, :ln] = xi
        feats_list.append(torch.from_numpy(xi.T.copy()))
        ngt = int(rng.integers(1, 4))
        labels, segs, masks = [], [], []
        for k in range(ngt):
            s = int(rng.integers(0, ln - 2))
            e = int(rng.integers(s + 2, min(ln, s + 20) + 1))
            lab = int(rng.integers(1, cfg.num_classes + 1))
            m = np.zeros(t, np.float32)
            m[s:e] = 1
            labels.append(lab)
            segs.append([s, e])
            masks.append(m)
            gt_labels[i, k] = lab
            gt_masks[i, k] = m
            gt_segs[i, k] = [s, e]
            gt_valid[i, k] = True
        preds_list.append(torch.tensor(labels, dtype=torch.int64))
        segs_list.append(torch.tensor(segs, dtype=torch.int64))
        masks_list.append(torch.from_numpy(np.stack(masks)))

    input_data = {
        "so_features_list": feats_list,
        "preds_list": preds_list,
        "masks_list": masks_list,
        "segs_list": segs_list,
    }
    mask = np.arange(t)[None] < lens[:, None]
    batch = {
        "feats": jnp.asarray(x),
        "seq_mask": jnp.asarray(mask),
        "item_valid": jnp.ones((b,), bool),
        "gt_labels": jnp.asarray(gt_labels.astype(np.int32)),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_segs": jnp.asarray(gt_segs.astype(np.int32)),
        "gt_valid": jnp.asarray(gt_valid),
    }
    return input_data, batch


def _max_rel_drift(got_tree, want_tree, grad_tree):
    """Worst per-leaf relative drift, skipping gradient-free leaves.

    Leaves whose loss gradient is at float-noise level (key/key_norm
    biases — softmax attention is invariant to an additive key shift, it
    moves every logit of a query row by q·b) get lr-sized AdamW random
    walks driven by numerical noise on BOTH sides; comparing them is
    noise vs noise, so they are excluded by gradient magnitude."""
    worst = (0.0, "")
    for (p, got), (_, want), (_, grad) in zip(
            jax.tree_util.tree_flatten_with_path(got_tree)[0],
            jax.tree_util.tree_flatten_with_path(want_tree)[0],
            jax.tree_util.tree_flatten_with_path(grad_tree)[0]):
        if float(np.abs(np.asarray(grad)).max()) < 1e-8:
            continue
        got = np.asarray(got)
        want = np.asarray(want)
        denom = np.abs(want).max() + 1e-6
        rel = float(np.abs(got - want).max() / denom)
        if rel > worst[0]:
            worst = (rel, jax.tree_util.keystr(p))
    return worst


@pytest.mark.slow
def test_ten_step_trajectory_parity():
    _patch_reference_num_masks()
    cfg = _deterministic_cfg()
    tm, jm, params = make_models(cfg, seed=1)
    # oracle.maskvrd_params returns numpy VIEWS of the torch parameters,
    # and on the CPU backend jnp.asarray can alias host numpy buffers —
    # force real copies, or the torch loop below mutates them in place and
    # our trajectory starts from the post-training weights
    params = jax.tree.map(lambda x: jnp.asarray(np.array(x, copy=True)),
                          params)
    init_params = params["params"]
    tm.train()
    input_data, batch = _make_batch(cfg, seed=1)

    # --- reference trajectory (train.py:175-213) ---
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from utils.train_utils import (ModelEma, build_optimizer,
                                       build_scheduler)
    finally:
        sys.path.pop(0)
    opt_cfg = {"type": "AdamW", "training_lr": LR, "weight_decay": WD,
               "warmup": True, "warmup_epochs": 1, "total_epoch": 2,
               "schedule_type": "cosine"}
    optimizer = build_optimizer(tm, opt_cfg)
    scheduler = build_scheduler(optimizer, opt_cfg, ITERS_PER_EPOCH)
    ema = ModelEma(tm)
    ref_losses = []
    for _ in range(STEPS):
        loss = tm.forward_training(input_data)
        optimizer.zero_grad(set_to_none=True)
        loss["total_loss"].backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        optimizer.step()
        scheduler.step()
        ema.update(tm)
        ref_losses.append(float(loss["total_loss"]))

    # --- our trajectory (train/loop.py fused step) ---
    training_config = {"type": "AdamW", "training_lr": LR,
                       "weight_decay": WD, "clip_grad_l2norm": CLIP,
                       "warmup": True, "warmup_epochs": 1,
                       "total_epoch": 2, "schedule_type": "cosine",
                       "ema_decay": 0.999}
    tx, _ = topt.build_optimizer(params["params"], training_config,
                                 ITERS_PER_EPOCH)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=params["params"],
                       ema_params=jax.tree.map(jnp.copy, params["params"]),
                       opt_state=tx.init(params["params"]), tx=tx)
    import functools
    step_fn = jax.jit(functools.partial(train_step, cfg=cfg))
    rng = jax.random.key(0)   # droppath/dropout are 0: rng is inert
    our_losses = []
    for _ in range(STEPS):
        state, losses = step_fn(state, batch, rng)
        our_losses.append(float(losses["total_loss"]))

    # per-step loss trajectories agree (the compound update numerics)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3,
                               atol=2e-3)

    # gradient magnitudes at the initial weights, to identify
    # gradient-free leaves (see _max_rel_drift)
    from vrdone_tpu.models.maskvrd import MaskVRD, compute_losses
    model = MaskVRD(cfg)

    def loss_at(p):
        preds = model.apply({"params": p}, batch["feats"],
                            batch["seq_mask"], deterministic=True)
        return compute_losses(cfg, preds, batch)["total_loss"]

    grads = jax.jit(jax.grad(loss_at))(init_params)

    # parameter drift after 10 compound steps: transplant the trained
    # torch weights into our layout and compare leaf-wise
    want = oracle.maskvrd_params(tm)
    rel, path = _max_rel_drift(state.params, want, grads)
    assert rel < 1e-3, (rel, path)

    want_ema = oracle.maskvrd_params(ema.module)
    rel, path = _max_rel_drift(state.ema_params, want_ema, grads)
    assert rel < 1e-3, ("ema", rel, path)
