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

The headline goes to stdout FIRST (so a driver-side timeout can never erase
it) and is RE-PRINTED as the very last line (round 4: the driver's parsed
record took the LAST json line, which was a budget-skip marker).
Supplementary metrics (b96 bf16 train MFU, serving fps, VidOR eval, fp32
train step) go to stderr as extra JSON lines, most valuable first, each
gated on measured remaining budget.

Cost model (measured 2026-08-20 on this host's axon tunnel): the dominant
cold cost is not XLA compile (the persistent repo-local .xla_cache hits
across processes, 26.7 s -> 3.8 s) but the FIRST EXECUTION of each program
over the tunnel (~300 s cold / ~64 s warm for the flagship forward).
Section gating therefore keys off whether the headline section itself ran
warm or cold.
"""

from __future__ import annotations

import json
import os
import sys
import time

import vrdone_tpu.utils.compilation_cache  # noqa: F401  (persistent cache)

import jax
import jax.numpy as jnp

TORCH_CPU_BASELINE_PAIRS_PER_SEC = 7.6
V5E_BF16_PEAK_FLOPS = 197e12

# Wall-clock budget for the whole bench run. Round-3 lesson: the driver
# kills bench.py at its own timeout (rc=124, nothing parsed); round-4
# lesson: a cold first-execution alone can eat ~1550 s, so the budget must
# cover headline-cold and then gate the rest on what actually remains.
# The round-4 driver run finished at ~1600 s elapsed with rc=0, so its
# timeout is above that; 1650 s keeps us under it with slack.
_T0 = time.time()
_BUDGET_S = float(os.environ.get("VRDONE_BENCH_BUDGET_S", "1650"))


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _T0)

BATCH_PAIRS = 128   # measured sweet spot (64: 11304, 128: 11686,
                    # 256: 11425 pairs/s, 2026-08-17)
SEQ_LEN = 96


def _progress(msg):
    print(f"[bench] {msg} (t={time.time() - _T0:.0f}s)", file=sys.stderr,
          flush=True)


def _emit(rec):
    print(json.dumps(rec), file=sys.stderr, flush=True)


def _drain(out):
    """Force remote execution + completion via a tiny D2H read
    (block_until_ready is unreliable over the axon tunnel)."""
    import numpy as np
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])


def _tunnel_probe():
    """Attribute VM/tunnel degradation before any heavy work: tiny-jit
    roundtrip, per-dispatch latency, H2D bandwidth (VERDICT r4 weak-3 —
    without this a slow tunnel is indistinguishable from a chip
    regression in the driver record)."""
    import numpy as np
    t0 = time.time()
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((1024,), jnp.float32)
    np.asarray(f(x))[:1]
    tiny_jit_s = time.time() - t0
    t0 = time.time()
    for _ in range(20):
        y = f(x)
    np.asarray(y)[:1]
    dispatch_ms = (time.time() - t0) / 20 * 1e3
    h2d = np.zeros((2 * 1024 * 1024,), np.float32)  # 8 MB
    t0 = time.time()
    xb = jax.device_put(h2d)
    np.asarray(xb[:1])
    h2d_mb_s = 8.0 / max(time.time() - t0, 1e-9)
    _emit({"metric": "tunnel_health", "value": round(dispatch_ms, 2),
           "unit": "ms/dispatch", "tiny_jit_s": round(tiny_jit_s, 2),
           "h2d_mb_per_s": round(h2d_mb_s, 1),
           "device": str(jax.devices()[0])})


def main():
    import __graft_entry__ as g
    from vrdone_tpu.models.maskvrd import MaskVRD

    from vrdone_tpu.utils.precision import cast_floating_onedispatch

    _progress(f"budget {_BUDGET_S:.0f}s; probing tunnel")
    try:
        _tunnel_probe()
    except Exception as e:
        _emit({"metric": "tunnel_health_error", "value": str(e)})

    cfg = g._vidvrd_cfg()
    model = MaskVRD(cfg)
    c = g._feat_dim(cfg)
    key = jax.random.key(0)
    feats = jax.random.normal(key, (BATCH_PAIRS, SEQ_LEN, c), jnp.float32)
    mask = jnp.ones((BATCH_PAIRS, SEQ_LEN), bool)
    params = jax.jit(lambda k, f, m: model.init(
        {"params": k}, f, m, deterministic=True))(key, feats,
                                                  mask)["params"]
    # bf16 serving precision (LN stats / softmax / heads stay f32 inside)
    params = cast_floating_onedispatch(params)
    feats = feats.astype(jnp.bfloat16)

    # params are an ARGUMENT, not a closed-over constant: baking them in
    # produced a 222 MB serialized executable whose transfer to the remote
    # axon device cost 5-10 min per run, cache hit or not (DEVNOTES r4)
    @jax.jit
    def forward(params, feats, mask):
        preds = model.apply({"params": params}, feats, mask,
                            deterministic=True)
        # include the decode-side math that runs per forward at eval
        probs = jax.nn.softmax(preds["pred_logits"], axis=-1)
        scores, catids = jax.lax.top_k(probs[..., 1:], 8)
        masks_bin = jax.nn.sigmoid(preds["pred_masks"]) > 0.5
        return scores, catids, masks_bin

    _progress("compiling vidvrd eval forward")
    t_sec = time.time()
    compiled = forward.lower(params, feats, mask).compile()
    compile_s = time.time() - t_sec
    _progress(f"compiled in {compile_s:.1f}s "
              f"(cache {'HIT' if compile_s < 10 else 'MISS'})")
    out = compiled(params, feats, mask)
    _drain(out)
    headline_elapsed = time.time() - t_sec
    _progress(f"first execution done (section {headline_elapsed:.0f}s)")

    # NOTE on methodology: jax.block_until_ready does not reliably force
    # remote execution over the axon tunnel (DEVNOTES "Serving round 3b");
    # timing loops therefore end with a tiny D2H drain INSIDE the timed
    # region. The device executes queued programs serially, so the drain
    # of the last output waits for the whole queue.
    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = compiled(params, feats, mask)
    _drain(out)
    dt = (time.perf_counter() - t0) / n_iter
    pairs_per_sec = BATCH_PAIRS / dt

    # HEADLINE FIRST (driver contract: one JSON line on stdout).
    headline = {
        "metric": "vidvrd_eval_forward_so_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / TORCH_CPU_BASELINE_PAIRS_PER_SEC,
                             2),
    }
    print(json.dumps(headline), flush=True)

    # compiler-reported FLOPs -> achieved TFLOP/s and MFU vs v5e bf16 peak
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            tflops = flops / dt / 1e12
            _emit({"metric": "eval_forward_achieved_tflops_per_sec",
                   "value": round(tflops, 2), "unit": "TFLOP/s",
                   "vs_baseline": round(
                       tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 4)})
    except Exception:
        pass

    # Supplementary sections, most valuable first (VERDICT r5 item 1b:
    # the b96 bf16 MFU claim runs immediately after the headline).
    # Estimated cost per section: (warm_s, cold_s) — warm when the
    # persistent cache hit AND the tunnel first-execution path is warm,
    # which the headline section itself just measured.
    import dataclasses

    def _b96_metric():
        return _train_step_metric(
            dataclasses.replace(cfg, compute_dtype="bfloat16"), c,
            pairs=96, tag="train_step_b96_bf16")

    warm = headline_elapsed < 180.0
    sections = [
        #  name                 fn                 (warm_s, cold_s)
        ("train_step_b96_bf16", _b96_metric,        (220.0, 700.0)),
        ("serving",             _serving_metric,    (240.0, 500.0)),
        ("vidor_eval",          _vidor_eval_metric, (150.0, 400.0)),
        ("train_step",
         lambda: _train_step_metric(cfg, c),        (180.0, 550.0)),
    ]
    for name, fn, (warm_s, cold_s) in sections:
        est = warm_s if warm else cold_s
        left = _remaining()
        if left < est + 30.0:
            _emit({"metric": f"{name}_skipped", "value": round(left, 1),
                   "unit": "s_budget_left",
                   "note": f"needs ~{est:.0f}s ({'warm' if warm else 'cold'}"
                           f" estimate; VRDONE_BENCH_BUDGET_S="
                           f"{_BUDGET_S:.0f})"})
            continue
        _progress(f"starting {name} (budget left {left:.0f}s, "
                  f"est {est:.0f}s {'warm' if warm else 'cold'})")
        t_sec = time.time()
        try:
            rec = fn()
            rec["section_s"] = round(time.time() - t_sec, 1)
            _emit(rec)
        except Exception as e:
            _emit({"metric": f"{name}_error", "value": str(e)})
    _progress("bench complete")
    # Re-print the headline as the LAST json line: the driver's parsed
    # record is the last line, which in round 4 was a skip marker.
    print(json.dumps(headline), flush=True)


def _vidor_eval_metric():
    """Eval forward at the VidOR production shape (T=512, vidor.yaml
    dims, bf16 serving)."""
    from vrdone_tpu.config import load_yaml_config, model_config_from_yaml
    from vrdone_tpu.models.maskvrd import MaskVRD
    from vrdone_tpu.utils.precision import cast_floating_onedispatch

    config = load_yaml_config("configs/vidor.yaml")
    config["dataset_config"].update(config["test_dataset_config"])
    cfg = model_config_from_yaml(config)
    model = MaskVRD(cfg)
    c = 2 * cfg.visual_dim + cfg.bbox_so_dim + 2 * cfg.bbox_entity_dim
    b, t = 16, cfg.max_seq_len       # 16 pairs x T=512
    key = jax.random.key(0)
    feats = jax.random.normal(key, (b, t, c), jnp.float32)
    mask = jnp.ones((b, t), bool)
    params = jax.jit(lambda k, f, m: model.init(
        {"params": k}, f, m, deterministic=True))(key, feats,
                                                  mask)["params"]
    params = cast_floating_onedispatch(params)
    feats = feats.astype(jnp.bfloat16)

    @jax.jit
    def forward(params, feats, mask):
        preds = model.apply({"params": params}, feats, mask,
                            deterministic=True)
        probs = jax.nn.softmax(preds["pred_logits"], axis=-1)
        scores, catids = jax.lax.top_k(probs[..., 1:], 6)
        masks_bin = jax.nn.sigmoid(preds["pred_masks"]) > 0.5
        return scores, catids, masks_bin

    compiled = forward.lower(params, feats, mask).compile()
    out = compiled(params, feats, mask)
    _drain(out)
    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = compiled(params, feats, mask)
    _drain(out)
    dt = (time.perf_counter() - t0) / n_iter
    rec = {"metric": "vidor_eval_forward_so_pairs_per_sec_per_chip",
           "value": round(b / dt, 1), "unit": "pairs/s",
           "vs_baseline": round(dt * 1e3, 2),
           "note": "vs_baseline field = batch latency ms (T=512)"}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            rec["achieved_tflops_per_sec"] = round(flops / dt / 1e12, 2)
    except Exception:
        pass
    return rec


def _serving_metric():
    """detect_video phase-method frames/s: R-101-C4 full MEGA head,
    608x1088 canvas, 300 key / 75 ref proposals, bf16 backbone/RoI
    precompute. vs_baseline field = round-1 baseline 0.79 frames/s."""
    from tools.profile_serving import measure
    r = measure(frames=16, dtype="bfloat16")
    return {"metric": "serving_detect_video_frames_per_sec",
            "value": r["frames_per_sec"], "unit": "frames/s",
            "vs_baseline": round(r["frames_per_sec"] / 0.79, 1),
            "phase_ms_per_frame": {
                "precompute": r["precompute_ms_per_frame"],
                "stream": r["stream_ms_per_frame"],
                "predict": r["predict_ms_per_frame"]}}


def _train_step_metric(cfg, c, tag="train_step", pairs=24):
    import numpy as np

    from vrdone_tpu.parallel.mesh import make_mesh, shard_batch
    from vrdone_tpu.train.loop import commit_state, create_train_state

    # default: production VidVRD shape, batch 6 videos x 4 pairs, T=96,
    # 9 gt slots; pairs=96 measures the large-batch recipe (24 x 4)
    p, t, g = pairs, cfg.max_seq_len, 9
    rng = np.random.default_rng(0)
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

    training_config = dict(training_lr=2e-4, clip_grad_l2norm=1.0,
                           weight_decay=0.05, total_epoch=15, warmup=True,
                           warmup_epochs=5, type="AdamW",
                           schedule_type="cosine")
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])
    state, _ = create_train_state(cfg, training_config, 1000,
                                  jax.random.key(0), jb)
    state = commit_state(state, mesh)
    sharded = shard_batch(mesh, jb)

    # n_iter steps chained inside ONE dispatch (lax.scan over the step).
    # A per-step host dispatch loop measures the tunnel, not the chip:
    # on the remote axon path each dispatch of the ~500-leaf state tree
    # costs 5-100 ms host-side (measured 2026-08-19, DEVNOTES "Tunnel
    # degradation"), which quadrupled the reported step time while the
    # compiled program was byte-identical. Production training dispatches
    # from a local host (microseconds) or jits whole epochs, so the
    # scan-chained number is the honest per-chip throughput.
    import functools

    from vrdone_tpu.train.loop import train_step

    n_iter = 20
    step = functools.partial(train_step, cfg=cfg)

    def multi_step(state, batch, rng):
        def body(st, i):
            st, losses = step(st, batch, jax.random.fold_in(rng, i))
            return st, losses["total_loss"]
        return jax.lax.scan(body, state, jnp.arange(n_iter))

    multi_jit = jax.jit(multi_step, donate_argnums=(0,))
    t_c = time.time()
    compiled = multi_jit.lower(state, sharded, jax.random.key(1)).compile()
    compile_s = time.time() - t_c
    _progress(f"{tag} compiled in {compile_s:.1f}s "
              f"(cache {'HIT' if compile_s < 20 else 'MISS'})")
    state2, tl = compiled(state, sharded, jax.random.key(1))  # warm-up
    _drain(tl)
    t0 = time.perf_counter()
    state3, tl = compiled(state2, sharded, jax.random.key(2))
    _drain(tl)
    dt = (time.perf_counter() - t0) / n_iter
    rec = {"metric": f"{tag}_so_pairs_per_sec_per_chip",
           "value": round(p / dt, 1), "unit": "pairs/s",
           "vs_baseline": round(dt * 1e3, 2),
           "note": "vs_baseline field = step latency ms"}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        # XLA's cost analysis counts a scan/while body ONCE, not x trip
        # count (verified on this JAX: scan of 20 matmuls reports one
        # matmul's flops) — so this is already per-step flops.
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            rec["mfu_vs_v5e_bf16_peak"] = round(
                flops / dt / V5E_BF16_PEAK_FLOPS, 4)
    except Exception:
        pass
    return rec


if __name__ == "__main__":
    main()
