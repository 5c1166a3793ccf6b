"""On-chip detect_video phase breakdown (VERDICT r2 item 6).

Times the three serving phases separately — per-frame precompute
(backbone + RPN + fc0), the streaming MEGA scan, and the prediction
head — on a synthetic video at the production shape (608x1088 canvas,
300 key / 75 ref proposals), and optionally writes an xplane trace.

Phase boundaries are forced with tiny D2H drains, not block_until_ready
— the latter does not reliably force remote execution over the axon
tunnel (DEVNOTES "Serving round 3b").

Usage:
    python tools/profile_serving.py [--frames 30] [--dtype bfloat16]
        [--trace_dir /tmp/xp]
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


def measure(frames: int = 30, canvas=(608, 1088), chunk: int = 4,
            num_classes: int = 31, dtype: str = "float32",
            trace_dir: str | None = None) -> dict:
    """Run the three serving phases and return the timing dict."""
    from vrdone_tpu.models.detector import (MegaDetector,
                                            _cast_f32_leaves,
                                            _precompute_chunk_jit,
                                            _predict_jit, make_mega_head)
    from vrdone_tpu.models.mega import global_indices, stream_video

    det = MegaDetector(num_classes=num_classes)
    h, w = canvas
    t_total = frames
    rng = np.random.default_rng(0)
    # uint8 transfer: serving sends raw frames at 1 byte/px (cast to f32
    # + mean-subtract happen on device in MegaDetector.features)
    images = rng.integers(0, 255, (t_total, h, w, 3)).astype(np.uint8)
    hw = jnp.asarray((h, w), jnp.float32)

    chunk = min(chunk, t_total)
    run = _precompute_chunk_jit(det, 300, chunk, dtype)

    from tools.detect_and_track import init_detector_params
    params = init_detector_params(det, images[0], hw, key_post_nms=300)
    cparams = _cast_f32_leaves(params, jnp.dtype(dtype))

    # stage the whole uint8 video on device BEFORE the timed region: the
    # H2D path here is a WAN tunnel (~0.05 GB/s measured 2026-08-19,
    # DEVNOTES "Tunnel degradation") whereas production frames arrive
    # over local PCIe at GB/s. The timed phases slice on-device.
    images_dev = jax.device_put(images)
    np.asarray(images_dev[0, 0, 0])     # force the transfer now

    def phase_precompute():
        outs = []
        for lo in range(0, t_total, chunk):
            hi = min(lo + chunk, t_total)
            if hi - lo < chunk:
                imgs = jnp.concatenate(
                    [images_dev[lo:hi],
                     jnp.repeat(images_dev[hi - 1:hi],
                                chunk - (hi - lo), axis=0)])
            else:
                imgs = jax.lax.slice_in_dim(images_dev, lo, hi, axis=0)
            outs.append(run(cparams, imgs, hw))
        np.asarray(outs[-1][1])            # D2H drain forces execution
        return outs

    outs = phase_precompute()           # compile
    t0 = time.perf_counter()
    outs = phase_precompute()
    pre_s = time.perf_counter() - t0

    kb, kv, ks, kf, rb, rv, rf = (
        jnp.concatenate([o[i] for o in outs])[:t_total] for i in range(7))
    glob_idx = global_indices(t_total, min(det.global_size, t_total))

    head = make_mega_head(det, fused_pe_bias=True, fused_attention=True)
    hp = {"params": params["params"]["mega"]}

    def phase_stream():
        v = stream_video(head, hp, key_feat=kf, key_rois=kb, key_valid=kv,
                         key_is_fc0=True, ref_feat=rf, ref_rois=rb,
                         ref_valid=rv, mem_size=det.window,
                         window=det.window, key_loc=det.key_loc,
                         glob_idx=glob_idx, compute_dtype=dtype)
        np.asarray(v[0, 0, :4])
        return v

    visual = phase_stream()             # compile
    t0 = time.perf_counter()
    visual = phase_stream()
    stream_s = time.perf_counter() - t0

    predict = _predict_jit(det)

    def phase_predict():
        out = predict(params, visual.reshape(-1, 1024))
        np.asarray(out[0][0, :4])
        return out

    phase_predict()                     # compile
    t0 = time.perf_counter()
    phase_predict()
    pred_s = time.perf_counter() - t0

    tot = pre_s + stream_s + pred_s
    result = {
        "frames": t_total,
        "dtype": dtype,
        "precompute_ms_per_frame": round(pre_s / t_total * 1e3, 2),
        "stream_ms_per_frame": round(stream_s / t_total * 1e3, 2),
        "predict_ms_per_frame": round(pred_s / t_total * 1e3, 2),
        "total_ms_per_frame": round(tot / t_total * 1e3, 2),
        "frames_per_sec": round(t_total / tot, 2)}

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        phase_precompute()
        phase_stream()
        phase_predict()
        jax.profiler.stop_trace()
        result["trace_dir"] = trace_dir
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--canvas", type=int, nargs=2, default=(608, 1088))
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--num_classes", type=int, default=31)
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="precompute compute dtype (serving fast path)")
    args = p.parse_args()
    result = measure(frames=args.frames, canvas=tuple(args.canvas),
                     chunk=args.chunk, num_classes=args.num_classes,
                     dtype=args.dtype, trace_dir=args.trace_dir)
    trace_dir = result.pop("trace_dir", None)
    print(json.dumps(result), flush=True)
    if trace_dir:
        print(json.dumps({"trace_dir": trace_dir}), flush=True)


if __name__ == "__main__":
    main()
