"""On-chip train-step MFU analysis (VERDICT r2 item 1).

Measures the fused VidVRD train step at several batch shapes on the real
chip, reports per-shape latency / pairs-per-sec / compiler FLOPs / MFU,
and optionally writes an xplane trace for the chosen shape.

Usage:
    python tools/profile_train_step.py [--pairs 24 96 192] \
        [--trace_dir /tmp/xplane_b96 --trace_pairs 96]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import vrdone_tpu.utils.compilation_cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12


def build_batch(cfg, c, p, g=9):
    rng = np.random.default_rng(0)
    t = cfg.max_seq_len
    batch = {
        "feats": rng.standard_normal((p, t, c)).astype(np.float32),
        "seq_mask": np.ones((p, t), bool),
        "item_valid": np.ones((p,), bool),
        "gt_labels": rng.integers(1, cfg.num_classes + 1,
                                  size=(p, g)).astype(np.int32),
        "gt_masks": np.zeros((p, g, t), np.float32),
        "gt_segs": np.zeros((p, g, 2), np.int32),
        "gt_valid": np.zeros((p, g), bool),
    }
    batch["gt_valid"][:, :3] = True
    batch["gt_segs"][:, :3] = [8, 40]
    batch["gt_masks"][:, :3, 8:40] = 1.0
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _drain(out):
    """Force remote execution + completion via a tiny D2H read
    (block_until_ready is unreliable over the axon tunnel — see
    DEVNOTES "Bench methodology")."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def measure(cfg, c, pairs, trace_dir=None, n_iter=20, dtype=None,
            remat=None, remat_policy=None, stream_batch=None):
    from dataclasses import replace
    if dtype:
        cfg = replace(cfg, compute_dtype=dtype)
    if remat is not None:
        cfg = replace(cfg, remat=remat)
    if remat_policy is not None:
        cfg = replace(cfg, remat_policy=remat_policy)
    if stream_batch is not None:
        cfg = replace(cfg, stem_stream_batch=stream_batch)
    from vrdone_tpu.parallel.mesh import make_mesh, shard_batch
    from vrdone_tpu.train.loop import (commit_state, create_train_state,
                                       make_jitted_train_step)

    jb = build_batch(cfg, c, pairs)
    training_config = dict(training_lr=2e-4, clip_grad_l2norm=1.0,
                           weight_decay=0.05, total_epoch=15, warmup=True,
                           warmup_epochs=5, type="AdamW",
                           schedule_type="cosine")
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])
    state, _ = create_train_state(cfg, training_config, 1000,
                                  jax.random.key(0), jb)
    state = commit_state(state, mesh)
    step_fn = make_jitted_train_step(cfg, mesh)
    sharded = shard_batch(mesh, jb)
    t0 = time.perf_counter()
    state, losses = step_fn(state, sharded, jax.random.key(1))
    _drain(losses)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n_iter):
        state, losses = step_fn(state, sharded, jax.random.fold_in(
            jax.random.key(2), i))
    _drain(losses)
    dt = (time.perf_counter() - t0) / n_iter

    rec = {"pairs": pairs, "step_ms": round(dt * 1e3, 2),
           "pairs_per_sec": round(pairs / dt, 1),
           "compile_s": round(compile_s, 1)}
    try:
        cost = step_fn.lower(state, sharded,
                             jax.random.key(3)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        rec["tflop_per_step"] = round(flops / 1e12, 3)
        rec["achieved_tflops"] = round(flops / dt / 1e12, 2)
        rec["mfu_vs_v5e_bf16_peak"] = round(
            flops / dt / V5E_BF16_PEAK_FLOPS, 4)
        rec["bytes_accessed_gb"] = round(
            float(cost.get("bytes accessed", 0.0)) / 1e9, 3)
    except Exception as e:
        rec["cost_error"] = str(e)

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        for i in range(5):
            state, losses = step_fn(state, sharded, jax.random.fold_in(
                jax.random.key(4), i))
        _drain(losses)
        jax.profiler.stop_trace()
        rec["trace_dir"] = trace_dir
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, nargs="+", default=[24, 96])
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--trace_pairs", type=int, default=96)
    p.add_argument("--dtype", default=None,
                   help="override cfg.compute_dtype (e.g. bfloat16)")
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize the forward in the backward")
    p.add_argument("--remat_policy", default=None,
                   choices=[None, "full", "dots"])
    p.add_argument("--stream_batch", action="store_true", default=None,
                   help="batch the backbone's shared-weight s/o stream ops"
                        " as one 2B call (cfg.stem_stream_batch)")
    p.add_argument("--config", default=None,
                   help="YAML config path (e.g. configs/vidor_local.yaml)"
                        " instead of the flagship VidVRD config")
    p.add_argument("--pallas_min_t", type=int, default=None,
                   help="override ops.masked.PALLAS_BAND_MIN_T (engage "
                        "the band kernel at shorter T, e.g. 512)")
    args = p.parse_args()

    if args.pallas_min_t is not None:
        from vrdone_tpu.ops import masked
        masked.PALLAS_BAND_MIN_T = args.pallas_min_t

    import __graft_entry__ as g
    if args.config:
        from vrdone_tpu.config import (load_yaml_config,
                                       model_config_from_yaml)
        yc = load_yaml_config(args.config)
        yc["dataset_config"].update(yc["training_dataset_config"])
        cfg = model_config_from_yaml(yc)
        c = g._feat_dim(cfg)
    else:
        cfg = g._vidvrd_cfg()
        c = g._feat_dim(cfg)
    for pairs in args.pairs:
        td = (args.trace_dir if args.trace_dir
              and pairs == args.trace_pairs else None)
        rec = measure(cfg, c, pairs, trace_dir=td, dtype=args.dtype,
                      remat=args.remat, remat_policy=args.remat_policy,
                      stream_batch=args.stream_batch)
        if args.dtype:
            rec["compute_dtype"] = args.dtype
        if args.remat:
            rec["remat"] = args.remat_policy or "full"
        if args.stream_batch:
            rec["stream_batch"] = True
        if args.config:
            rec["config"] = args.config
        if args.pallas_min_t is not None:
            rec["pallas_min_t"] = args.pallas_min_t
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
