"""Headline benchmark: subject-object pair throughput of the flagship
(VidVRD full-size) model's eval forward on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: the reference PyTorch stack's same forward (backbone->neck->
predictor, batch of 8 SO pairs, T=96, fp32) measured on this container's
CPU with torch 2.13: 7.6 pairs/s (single core — the reference publishes no
accelerator numbers, and its GPU path is unavailable here; see BASELINE.md).
vs_baseline therefore reports our TPU-chip throughput relative to that
torch-CPU figure; the driver's north star is >=10x.
"""

from __future__ import annotations

import json
import time

import vrdone_tpu.utils.compilation_cache  # noqa: F401  (persistent cache)

import jax
import jax.numpy as jnp

TORCH_CPU_BASELINE_PAIRS_PER_SEC = 7.6

BATCH_PAIRS = 64
SEQ_LEN = 96


def main():
    import __graft_entry__ as g
    from vrdone_tpu.models.maskvrd import MaskVRD

    from vrdone_tpu.utils.precision import cast_floating

    cfg = g._vidvrd_cfg()
    model = MaskVRD(cfg)
    c = g._feat_dim(cfg)
    key = jax.random.key(0)
    feats = jax.random.normal(key, (BATCH_PAIRS, SEQ_LEN, c), jnp.float32)
    mask = jnp.ones((BATCH_PAIRS, SEQ_LEN), bool)
    params = model.init({"params": key}, feats, mask,
                        deterministic=True)["params"]
    # bf16 serving precision (LN stats / softmax / heads stay f32 inside)
    params = cast_floating(params)
    feats = feats.astype(jnp.bfloat16)

    @jax.jit
    def forward(feats, mask):
        preds = model.apply({"params": params}, feats, mask,
                            deterministic=True)
        # include the decode-side math that runs per forward at eval
        probs = jax.nn.softmax(preds["pred_logits"], axis=-1)
        scores, catids = jax.lax.top_k(probs[..., 1:], 8)
        masks_bin = jax.nn.sigmoid(preds["pred_masks"]) > 0.5
        return scores, catids, masks_bin

    out = forward(feats, mask)
    jax.block_until_ready(out)

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = forward(feats, mask)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    pairs_per_sec = BATCH_PAIRS / dt

    print(json.dumps({
        "metric": "vidvrd_eval_forward_so_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / TORCH_CPU_BASELINE_PAIRS_PER_SEC,
                             2),
    }))


if __name__ == "__main__":
    main()
