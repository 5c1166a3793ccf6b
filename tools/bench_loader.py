"""Input-pipeline throughput benchmark at VidOR scale.

Builds a synthetic VidOR-sized train corpus (long videos, per-video
feature caches, 16 pairs per policy item) and measures TrainLoader
throughput in both cache modes:

  * pickle  — the reference behavior: every train item re-unpickles its
    videos' whole feature caches (reference dataloaders/vidor.py:745-747),
  * memmap  — our packed cache (data/memmap_cache.py): items page in only
    the rows their pairs slice.

The number that matters: ms/batch must stay below the fused train-step
time (~20 ms on the v5e for the VidVRD config; VidOR's bigger batch is
~100+ ms), otherwise the chip starves. Pure host benchmark — safe to run
alongside nothing (no JAX import).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle
import shutil
import time

import numpy as np


def build_corpus(root: str, *, n_videos: int, n_frames: int,
                 n_tracklets: int, pairs_per_video: int, visual_dim: int,
                 seed: int = 0):
    """Synthesize per-video train caches directly in the dataset cache
    schema (datasets.py _prepare_train output)."""
    rng = np.random.default_rng(seed)
    cache = os.path.join(root, "cache_synth_VidOR_training")
    os.makedirs(cache, exist_ok=True)
    names = []
    pair_counts = []
    for v in range(n_videos):
        name = f"group/{v:04d}"
        names.append(name)
        visual, bboxes, intervals, classes = {}, {}, {}, {}
        for t in range(n_tracklets):
            iv = [[0, n_frames]]
            intervals[t] = iv
            visual[t] = [rng.standard_normal(
                (n_frames, visual_dim)).astype(np.float32)]
            xy = rng.uniform(0, 400, (n_frames, 2))
            wh = rng.uniform(20, 200, (n_frames, 2))
            bboxes[t] = [np.concatenate([xy, xy + wh],
                                        1).astype(np.float32)]
            classes[t] = 1 + t % 10
        merged, keys = {}, []
        for p in range(pairs_per_video):
            s, o = p % n_tracklets, (p + 1) % n_tracklets
            key = (s, o, 0, 0)
            lo = int(rng.integers(0, n_frames - 40))
            merged.setdefault(key, []).append(
                {"predicate": 1 + p % 5, "begin_fid": lo,
                 "end_fid": lo + 30})
            if key not in keys:
                keys.append(key)
        data = {"video_hw": (720, 1280),
                "relation_merged": merged,
                "relation_keys": [list(k) for k in keys],
                "visual_features": visual,
                "entity_bboxes": bboxes,
                "entity_classes": classes,
                "traj_intervals": intervals}
        path = os.path.join(cache, name + ".pkl")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(data, f)
        pair_counts.append([name, len(keys)])
    return cache, names, pair_counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/bench_loader")
    p.add_argument("--n_videos", type=int, default=48)
    p.add_argument("--n_frames", type=int, default=512)
    p.add_argument("--n_tracklets", type=int, default=6)
    p.add_argument("--pairs_per_video", type=int, default=32)
    p.add_argument("--visual_dim", type=int, default=1024)
    p.add_argument("--num_pairs", type=int, default=16,
                   help="pairs per policy item (vidor.yaml)")
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--feat_stride", type=int, default=4)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    if os.path.exists(args.root):
        shutil.rmtree(args.root)
    os.makedirs(args.root)
    cache, names, pair_counts = build_corpus(
        args.root, n_videos=args.n_videos, n_frames=args.n_frames,
        n_tracklets=args.n_tracklets,
        pairs_per_video=args.pairs_per_video,
        visual_dim=args.visual_dim)
    size_mb = sum(os.path.getsize(os.path.join(dp, f))
                  for dp, _, fs in os.walk(cache)
                  for f in fs) / 1e6
    print(f"corpus: {args.n_videos} videos x {args.n_frames} frames, "
          f"{size_mb:.0f} MB")

    from vrdone_tpu.data.datasets import build_policy
    from vrdone_tpu.data.loader import TrainLoader
    from vrdone_tpu.data import memmap_cache

    class SynthDataset:
        """Minimal PairDataset stand-in over the synthetic cache."""

        def __init__(self, mode):
            from vrdone_tpu.data.datasets import PairDataset
            self.mode = mode
            self.policy = build_policy(pair_counts, args.num_pairs)
            self.cache_path = cache
            self.cache_in_memory = False
            self.cache_memmap = mode == "memmap"
            self._memmap_lru = {}
            self.feat_stride = args.feat_stride
            self.max_seq_len = args.max_seq_len
            self.cut_max_preds = False
            self.proposal_max_preds = 100
            self.with_clip_feature = False
            self._pd = PairDataset
            if mode == "memmap":
                for n in names:
                    if not memmap_cache.has_packed(cache, n):
                        with open(os.path.join(cache, n + ".pkl"),
                                  "rb") as f:
                            memmap_cache.write_packed(cache, n,
                                                      pickle.load(f))

        def num_train_items(self):
            return len(self.policy)

        def get_train_item(self, idx, rng):
            return self._pd.get_train_item(self, idx, rng)

        def _load_video(self, name):
            return self._pd._load_video(self, name)

        def train_pairs(self, *a, **kw):
            return self._pd.train_pairs(self, *a, **kw)

    feat_dim = 2 * args.visual_dim + 5 + 16
    results = {}
    for mode in ("pickle", "memmap"):
        ds = SynthDataset(mode)
        loader = TrainLoader(ds, args.batch_size,
                             args.batch_size * args.num_pairs,
                             args.max_seq_len,
                             num_gt=10, feat_dim=feat_dim)
        it = loader.epoch(0)
        next(it)  # warm
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            n += 1
            if n >= args.steps:
                break
        dt = (time.perf_counter() - t0) / max(n, 1)
        results[mode] = dt * 1e3
        print(json.dumps({"metric": f"loader_{mode}_ms_per_batch",
                          "value": round(dt * 1e3, 1), "unit": "ms",
                          "batch": f"{args.batch_size}x{args.num_pairs}"
                                   f"pairs T{args.max_seq_len}"}))
    print(json.dumps({"metric": "loader_memmap_speedup",
                      "value": round(results["pickle"]
                                     / results["memmap"], 2),
                      "unit": "x"}))
    if not args.keep:
        shutil.rmtree(args.root)


if __name__ == "__main__":
    main()
