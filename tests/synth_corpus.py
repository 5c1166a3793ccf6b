"""Synthetic VidVRD-format corpus generator for dataset golden tests.

Writes annotation JSONs, MEGA-style GT feature pickles, and BIG-style
proposal pickles in the exact on-disk formats both the reference dataloaders
and ours consume, so the two can be compared end to end.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

VIS_DIM = 8  # default; generators accept vis_dim overrides


def _bbox(rng, w, h):
    x0 = float(rng.uniform(0, w - 20))
    y0 = float(rng.uniform(0, h - 20))
    x1 = float(x0 + rng.uniform(8, w - x0 - 1))
    y1 = float(y0 + rng.uniform(8, h - y0 - 1))
    return {"xmin": x0, "ymin": y0, "xmax": min(x1, w - 1),
            "ymax": min(y1, h - 1)}


def make_vidvrd_corpus(root: str, n_videos: int = 3, n_frames: int = 40,
                       seed: int = 0, categories=("dog", "person", "car"),
                       predicates=("walk_next_to", "chase", "watch"),
                       vis_dim: int = VIS_DIM):
    rng = np.random.default_rng(seed)
    ann_dir = os.path.join(root, "annotations", "train")
    feat_dir = os.path.join(root, "features", "GT_boxfeatures_training")
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)

    for v in range(n_videos):
        name = f"synth_{v:04d}"
        w, h = 320, 240
        n_tracks = int(rng.integers(2, 4))
        # each track lives on 1-2 contiguous intervals
        track_frames = {}
        for tid in range(n_tracks):
            s1 = int(rng.integers(0, 5))
            e1 = int(rng.integers(s1 + 10, min(s1 + 25, n_frames)))
            frames = set(range(s1, e1))
            if rng.random() < 0.5 and e1 + 3 < n_frames - 4:
                s2 = e1 + 3
                e2 = int(rng.integers(s2 + 3, n_frames))
                frames |= set(range(s2, e2))
            track_frames[tid] = sorted(frames)

        trajectories = []
        for f in range(n_frames):
            frame = []
            for tid in range(n_tracks):
                if f in track_frames[tid]:
                    frame.append({"tid": tid, "bbox": _bbox(rng, w, h)})
            trajectories.append(frame)

        # relations on overlapping track intervals; (s, o, pred, begin) must
        # be unique — the merging contract assumes strictly increasing
        # begin_fid within a triplet group
        relations = []
        seen_keys = {}
        for _ in range(int(rng.integers(2, 6))):
            s_tid, o_tid = rng.choice(n_tracks, size=2, replace=False)
            common = sorted(set(track_frames[int(s_tid)])
                            & set(track_frames[int(o_tid)]))
            if len(common) < 6:
                continue
            # pick a contiguous run inside the common support
            runs, cur = [], [common[0]]
            for f in common[1:]:
                if f == cur[-1] + 1:
                    cur.append(f)
                else:
                    runs.append(cur)
                    cur = [f]
            runs.append(cur)
            run = runs[int(rng.integers(0, len(runs)))]
            if len(run) < 6:
                continue
            bf = int(run[0] + rng.integers(0, max(1, len(run) // 3)))
            ef = int(bf + rng.integers(4, len(run) - (bf - run[0]) + 1))
            pred = str(rng.choice(predicates))
            # per-(s, o, pred), generated spans must not overlap or touch:
            # the dataloaders' merge contract asserts strictly increasing,
            # non-contained instances within a triplet group
            key = (int(s_tid), int(o_tid), pred)
            if any(bf <= e and ef >= b for b, e in seen_keys.get(key, [])):
                continue
            seen_keys.setdefault(key, []).append((bf, ef))
            relations.append({
                "subject_tid": int(s_tid),
                "object_tid": int(o_tid),
                "predicate": pred,
                "begin_fid": bf,
                "end_fid": ef,
            })

        anno = {
            "video_id": name,
            "height": h,
            "width": w,
            "frame_count": n_frames,
            "subject/objects": [
                {"tid": tid, "category": str(categories[tid % len(categories)])}
                for tid in range(n_tracks)],
            "trajectories": trajectories,
            "relation_instances": relations,
        }
        with open(os.path.join(ann_dir, name + ".json"), "w") as f:
            json.dump(anno, f)

        # MEGA-style per-frame GT features (frame ids are 1-based)
        feats = {}
        for f in range(n_frames):
            tids = [t["tid"] for t in trajectories[f]]
            if not tids:
                continue
            feats[f + 1] = {
                "frame_id": f + 1,
                "tids": np.asarray(tids, np.int64),
                "visual_features": rng.standard_normal(
                    (len(tids), vis_dim)).astype(np.float32),
            }
        with open(os.path.join(feat_dir, name + ".pkl"), "wb") as f:
            pickle.dump(feats, f)

    return {
        "ann_dir": os.path.join(root, "annotations"),
        "gt_boxfeatures_dir": feat_dir,
    }


def make_vidvrd_test_corpus(root: str, n_videos: int = 2, seed: int = 1,
                            vis_dim: int = VIS_DIM, video_len: int = 40,
                            max_span: int = 30):
    """BIG-style proposal pickles + MEGA test feature pickles (torch tensors,
    as the reference writes them)."""
    import torch
    rng = np.random.default_rng(seed)
    ann_dir = os.path.join(root, "annotations", "test")
    info_dir = os.path.join(root, "features", "per_video_val")
    feat_dir = os.path.join(root, "features", "Proposal_boxfeatures_test")
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(info_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)

    for v in range(n_videos):
        name = f"synthtest_{v:04d}"
        w, h = 320, 240
        n_prop = int(rng.integers(3, 6))
        durations, bboxes, cat_ids = [], [], []
        for p in range(n_prop):
            s = int(rng.integers(0, 15))
            e = int(rng.integers(s + 8, min(s + max_span, video_len)))
            durations.append([s, e - 1])  # stored closed; loader adds +1
            boxes = []
            for _ in range(e - s):
                bb = _bbox(rng, w, h)
                boxes.append([bb["xmin"], bb["ymin"], bb["xmax"], bb["ymax"]])
            bboxes.append(torch.tensor(boxes, dtype=torch.float32))
            cat_ids.append(int(rng.integers(1, 4)))
        proposal = {
            "MAX_PROPOSAL": 50,
            "video_name": name,
            "cat_ids": torch.tensor(cat_ids, dtype=torch.int64),
            "scores": torch.rand(n_prop),
            "bboxes_list": bboxes,
            "traj_durations": torch.tensor(durations, dtype=torch.int64),
            "features_list": [torch.randn(len(b), vis_dim) for b in bboxes],
            "num_proposals": n_prop,
            "dim_feat": vis_dim,
            "video_len": video_len,
            "video_wh": (w, h),
        }
        with open(os.path.join(info_dir, name + ".pkl"), "wb") as f:
            pickle.dump({"traj_proposal": proposal}, f)

        # matching eval annotations: trajectories follow the first two
        # proposals, with one relation instance over their overlap
        trajectories = [[] for _ in range(video_len)]
        for tid in (0, 1):
            s, e = durations[tid][0], durations[tid][1] + 1
            for i, f_id in enumerate(range(s, e)):
                x0, y0, x1, y1 = bboxes[tid][i].tolist()
                trajectories[f_id].append(
                    {"tid": tid, "bbox": {"xmin": x0, "ymin": y0,
                                          "xmax": x1, "ymax": y1}})
        ov_s = max(durations[0][0], durations[1][0])
        ov_e = min(durations[0][1] + 1, durations[1][1] + 1)
        relations = []
        if ov_e - ov_s >= 4:
            relations.append({"subject_tid": 0, "object_tid": 1,
                              "predicate": "walk_next_to",
                              "begin_fid": int(ov_s), "end_fid": int(ov_e)})
        anno = {
            "video_id": name, "height": h, "width": w,
            "frame_count": video_len,
            "subject/objects": [{"tid": 0, "category": "dog"},
                                {"tid": 1, "category": "person"}],
            "trajectories": trajectories,
            "relation_instances": relations,
        }
        with open(os.path.join(ann_dir, name + ".json"), "w") as f:
            json.dump(anno, f)

        feats = {}
        for fid in range(video_len):
            tids = [p for p in range(n_prop)
                    if durations[p][0] <= fid <= durations[p][1]]
            if not tids:
                continue
            feats[fid] = {
                "frame_id": fid,
                "tids": np.asarray(tids, np.int64),
                "visual_features": rng.standard_normal(
                    (len(tids), vis_dim)).astype(np.float32),
            }
        with open(os.path.join(feat_dir, name + ".pkl"), "wb") as f:
            pickle.dump(feats, f)

    return {"info_dir": info_dir, "test_boxfeatures_dir": feat_dir}


def make_learnable_corpus(root: str, n_train_videos: int = 6,
                          n_test_videos: int = 2, n_frames: int = 40,
                          seed: int = 7, vis_dim: int = VIS_DIM,
                          predicates=("walk_next_to", "chase", "watch")):
    """Train + test corpus whose predicates ARE PREDICTABLE from the
    features: while a relation (s, o, pred) is active, the subject's
    visual feature carries +E[pred] and the object's carries -E[pred]
    (orthogonal patterns, amplitude >> noise), both in the train GT
    feature pickles and the test proposal feature pickles. Test proposal
    boxes equal the GT trajectories (vIoU 1) and proposal cat_ids match
    the annotation categories, so a model that learns the mapping scores
    RelDet_mAP ~= 1. The one cheap end-to-end signal that matching +
    losses + decode + scoring jointly constitute a learnable objective.
    """
    import torch

    from vrdone_tpu.data.category import get_vocab
    entity_vocab, _ = get_vocab("vidvrd")
    name_to_id = {v: k for k, v in entity_vocab.items()}

    rng = np.random.default_rng(seed)
    sig = np.zeros((len(predicates), vis_dim), np.float32)
    for i in range(len(predicates)):
        sig[i, i % vis_dim] = 4.0

    ann_tr = os.path.join(root, "annotations", "train")
    feat_tr = os.path.join(root, "features", "GT_boxfeatures_training")
    ann_te = os.path.join(root, "annotations", "test")
    info_te = os.path.join(root, "features", "per_video_val")
    feat_te = os.path.join(root, "features", "Proposal_boxfeatures_test")
    for d in (ann_tr, feat_tr, ann_te, info_te, feat_te):
        os.makedirs(d, exist_ok=True)

    def tracks_and_relation(v):
        """Two full-length tracks + one relation with a per-video span."""
        pred = predicates[v % len(predicates)]
        bf = 4 + int(rng.integers(0, 6))
        ef = bf + 12 + int(rng.integers(0, 8))
        ef = min(ef, n_frames - 2)
        return pred, bf, ef

    def feat_of(tid, f, pred_idx, bf, ef):
        x = 0.1 * rng.standard_normal(vis_dim).astype(np.float32)
        if bf <= f < ef:
            x = x + (sig[pred_idx] if tid == 0 else -sig[pred_idx])
        return x

    w, h = 320, 240
    for v in range(n_train_videos):
        name = f"learn_{v:04d}"
        pred, bf, ef = tracks_and_relation(v)
        pred_idx = predicates.index(pred)
        trajectories = []
        for f in range(n_frames):
            trajectories.append([
                {"tid": 0, "bbox": {"xmin": 10.0, "ymin": 10.0,
                                    "xmax": 110.0, "ymax": 110.0}},
                {"tid": 1, "bbox": {"xmin": 150.0, "ymin": 60.0,
                                    "xmax": 250.0, "ymax": 160.0}},
            ])
        anno = {
            "video_id": name, "height": h, "width": w,
            "frame_count": n_frames,
            "subject/objects": [{"tid": 0, "category": "dog"},
                                {"tid": 1, "category": "person"}],
            "trajectories": trajectories,
            "relation_instances": [{
                "subject_tid": 0, "object_tid": 1, "predicate": pred,
                "begin_fid": bf, "end_fid": ef}],
        }
        with open(os.path.join(ann_tr, name + ".json"), "w") as f:
            json.dump(anno, f)
        feats = {}
        for f in range(n_frames):
            feats[f + 1] = {
                "frame_id": f + 1,
                "tids": np.asarray([0, 1], np.int64),
                "visual_features": np.stack([
                    feat_of(0, f, pred_idx, bf, ef),
                    feat_of(1, f, pred_idx, bf, ef)]),
            }
        with open(os.path.join(feat_tr, name + ".pkl"), "wb") as f:
            pickle.dump(feats, f)

    for v in range(n_test_videos):
        name = f"learntest_{v:04d}"
        pred, bf, ef = tracks_and_relation(v)
        pred_idx = predicates.index(pred)
        boxes0 = [[10.0, 10.0, 110.0, 110.0]] * n_frames
        boxes1 = [[150.0, 60.0, 250.0, 160.0]] * n_frames
        proposal = {
            "MAX_PROPOSAL": 50,
            "video_name": name,
            "cat_ids": torch.tensor([name_to_id["dog"],
                                     name_to_id["person"]]),
            "scores": torch.tensor([0.9, 0.9]),
            "bboxes_list": [torch.tensor(boxes0), torch.tensor(boxes1)],
            "traj_durations": torch.tensor([[0, n_frames - 1],
                                            [0, n_frames - 1]]),
            "features_list": [torch.randn(n_frames, vis_dim)
                              for _ in range(2)],
            "num_proposals": 2,
            "dim_feat": vis_dim,
            "video_len": n_frames,
            "video_wh": (w, h),
        }
        with open(os.path.join(info_te, name + ".pkl"), "wb") as f:
            pickle.dump({"traj_proposal": proposal}, f)

        trajectories = []
        for f in range(n_frames):
            trajectories.append([
                {"tid": 0, "bbox": {"xmin": 10.0, "ymin": 10.0,
                                    "xmax": 110.0, "ymax": 110.0}},
                {"tid": 1, "bbox": {"xmin": 150.0, "ymin": 60.0,
                                    "xmax": 250.0, "ymax": 160.0}},
            ])
        anno = {
            "video_id": name, "height": h, "width": w,
            "frame_count": n_frames,
            "subject/objects": [{"tid": 0, "category": "dog"},
                                {"tid": 1, "category": "person"}],
            "trajectories": trajectories,
            "relation_instances": [{
                "subject_tid": 0, "object_tid": 1, "predicate": pred,
                "begin_fid": bf, "end_fid": ef}],
        }
        with open(os.path.join(ann_te, name + ".json"), "w") as f:
            json.dump(anno, f)

        feats = {}
        for f in range(n_frames):
            feats[f] = {
                "frame_id": f,
                "tids": np.asarray([0, 1], np.int64),
                "visual_features": np.stack([
                    feat_of(0, f, pred_idx, bf, ef),
                    feat_of(1, f, pred_idx, bf, ef)]),
            }
        with open(os.path.join(feat_te, name + ".pkl"), "wb") as f:
            pickle.dump(feats, f)

    return {
        "ann_dir": os.path.join(root, "annotations"),
        "gt_boxfeatures_dir": feat_tr,
        "info_dir": info_te,
        "test_boxfeatures_dir": feat_te,
    }
