"""Microbenchmark: dense masked full attention vs the Pallas flash kernel.

Motivation (DEVNOTES "VidOR-scale train step"): the T=512 VidOR train step
is bound by the materialised (B, H, T, T) attention scores — throughput
*drops* past 24 pairs because the attention working set spills HBM. A flash
(streaming-softmax) kernel never materialises the score matrix, so both the
forward and the backward become O(T * block) resident instead of O(T^2).

Compares, at the VidOR stem-attention train shape:
  * dense `vrdone_tpu.ops.masked.full_attention` fwd and fwd+bwd
  * `jax.experimental.pallas.ops.tpu.flash_attention` with segment-id
    padding masks, fwd and fwd+bwd

Timing uses the drained methodology from bench.py (block_until_ready is
unreliable over the axon tunnel).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vrdone_tpu.ops import masked as mops


def _drain(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--valid_frac", type=float, default=0.75)
    ap.add_argument("--tune", action="store_true",
                    help="sweep flash BlockSizes (bf16, f+b) instead of the "
                         "dense-vs-default comparison")
    args = ap.parse_args()

    b, h, t, d = args.batch, args.heads, args.t, args.d
    c = h * d
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    n_valid = int(t * args.valid_frac)
    mask = jnp.asarray(np.arange(t)[None, :] < n_valid, bool)
    mask = jnp.broadcast_to(mask, (b, t))

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    def dense(q, k, v):
        return mops.full_attention(q, k, v, mask, n_head=h)

    def make_flash(block_sizes=None):
        def flash(q, k, v):
            qh = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
            kh = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
            vh = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
            seg = mask.astype(jnp.int32)
            out = fa.flash_attention(
                qh, kh, vh, segment_ids=fa.SegmentIds(seg, seg),
                sm_scale=1.0 / np.sqrt(d), block_sizes=block_sizes)
            return out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return flash

    flash = make_flash()

    def loss_of(f):
        def g(q, k, v):
            return jnp.sum(f(q, k, v) ** 2)
        return g

    if args.tune:
        # the default (all-128, block_b=1) grid runs 4 MFLOP tiles — sweep
        # fatter blocks. bf16 only (the production train dtype).
        qd, kd, vd = (x.astype(jnp.bfloat16) for x in (q, k, v))
        base = dict(block_q=128, block_k_major=128, block_k=128, block_b=1,
                    block_q_major_dkv=128, block_k_major_dkv=128,
                    block_k_dkv=128, block_q_dkv=128,
                    block_k_major_dq=128, block_k_dq=128, block_q_dq=128)
        tmax = t

        def mk(**over):
            cfg = dict(base)
            cfg.update(over)
            return cfg

        candidates = {
            "default": base,
            "q512": mk(block_q=tmax, block_q_major_dkv=tmax,
                       block_q_dkv=tmax, block_q_dq=tmax),
            "k512": mk(block_k_major=tmax, block_k=tmax,
                       block_k_major_dkv=tmax, block_k_dkv=tmax,
                       block_k_major_dq=tmax, block_k_dq=tmax),
            "qk512": mk(block_q=tmax, block_q_major_dkv=tmax,
                        block_q_dkv=tmax, block_q_dq=tmax,
                        block_k_major=tmax, block_k=tmax,
                        block_k_major_dkv=tmax, block_k_dkv=tmax,
                        block_k_major_dq=tmax, block_k_dq=tmax),
            "qk256": mk(block_q=256, block_q_major_dkv=256,
                        block_q_dkv=256, block_q_dq=256,
                        block_k_major=256, block_k=256,
                        block_k_major_dkv=256, block_k_dkv=256,
                        block_k_major_dq=256, block_k_dq=256),
            "qk512_b2": mk(block_b=2, block_q=tmax, block_q_major_dkv=tmax,
                           block_q_dkv=tmax, block_q_dq=tmax,
                           block_k_major=tmax, block_k=tmax,
                           block_k_major_dkv=tmax, block_k_dkv=tmax,
                           block_k_major_dq=tmax, block_k_dq=tmax),
            "qk512_b4": mk(block_b=4, block_q=tmax, block_q_major_dkv=tmax,
                           block_q_dkv=tmax, block_q_dq=tmax,
                           block_k_major=tmax, block_k=tmax,
                           block_k_major_dkv=tmax, block_k_dkv=tmax,
                           block_k_major_dq=tmax, block_k_dq=tmax),
        }
        dj = jax.jit(dense)
        dg = jax.jit(jax.grad(loss_of(dense), argnums=(0, 1, 2)))
        t_d, t_dg = time_fn(dj, qd, kd, vd), time_fn(dg, qd, kd, vd)
        print(f"[bf16] dense     fwd {t_d:7.3f} ms  f+b {t_dg:7.3f} ms")
        for nm, cfg in candidates.items():
            try:
                fl = make_flash(fa.BlockSizes(**cfg))
                fj = jax.jit(fl)
                fg = jax.jit(jax.grad(loss_of(fl), argnums=(0, 1, 2)))
                t_f = time_fn(fj, qd, kd, vd)
                t_fg = time_fn(fg, qd, kd, vd)
                print(f"[bf16] {nm:9s} fwd {t_f:7.3f} ms ({t_d/t_f:4.2f}x)"
                      f"  f+b {t_fg:7.3f} ms ({t_dg/t_fg:4.2f}x)",
                      flush=True)
            except Exception as e:
                print(f"[bf16] {nm:9s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        return

    for dtype in (jnp.float32, jnp.bfloat16):
        qd, kd, vd = (x.astype(dtype) for x in (q, k, v))
        name = np.dtype(dtype).name if dtype == jnp.float32 else "bf16"

        dj = jax.jit(dense)
        fj = jax.jit(flash)
        o1 = np.asarray(dj(qd, kd, vd), np.float32)
        o2 = np.asarray(fj(qd, kd, vd), np.float32)
        # compare only valid query rows (invalid rows are masked by callers)
        o1v, o2v = o1[:, :n_valid], o2[:, :n_valid]
        err = np.max(np.abs(o1v - o2v)) / (np.max(np.abs(o1v)) + 1e-9)
        t_d = time_fn(dj, qd, kd, vd)
        t_f = time_fn(fj, qd, kd, vd)

        dg = jax.jit(jax.grad(loss_of(dense), argnums=(0, 1, 2)))
        fg = jax.jit(jax.grad(loss_of(flash), argnums=(0, 1, 2)))
        g1 = [np.asarray(x, np.float32) for x in dg(qd, kd, vd)]
        g2 = [np.asarray(x, np.float32) for x in fg(qd, kd, vd)]
        gerr = max(np.max(np.abs(a - b_)) / (np.max(np.abs(a)) + 1e-9)
                   for a, b_ in zip(g1, g2))
        t_dg = time_fn(dg, qd, kd, vd)
        t_fg = time_fn(fg, qd, kd, vd)

        print(f"[{name}] fwd dense {t_d:7.3f} ms  flash {t_f:7.3f} ms  "
              f"({t_d / t_f:4.2f}x)  rel-err {err:.2e}")
        print(f"[{name}] f+b dense {t_dg:7.3f} ms  flash {t_fg:7.3f} ms  "
              f"({t_dg / t_fg:4.2f}x)  grad rel-err {gerr:.2e}")


if __name__ == "__main__":
    main()
