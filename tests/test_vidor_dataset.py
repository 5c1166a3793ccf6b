"""VidOR dataset golden parity vs the reference dataloader on a synthetic
corpus: group-structured annotations, persisted policy file, CLIP feature
streams, and the validation-proposal duration convention."""

import json
import os
import pickle

import numpy as np
import pytest

from tests import oracle  # reference on sys.path
from tests.synth_corpus import _bbox
from vrdone_tpu.data.datasets import VidORDataset

VIS, CLIP = 8, 6


def make_vidor_corpus(root, n_videos=3, n_frames=40, seed=0):
    """Group-structured VidOR-style corpus with CLIP feature pickles."""
    rng = np.random.default_rng(seed)
    ann_dir = os.path.join(root, "annotations", "training")
    feat_dir = os.path.join(root, "features", "gt")
    clip_dir = os.path.join(root, "features", "clip")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(clip_dir, exist_ok=True)
    categories = ("dog", "adult", "car")
    predicates = ("next_to", "in_front_of", "watch")

    for v in range(n_videos):
        group = f"{v % 2:04d}"
        vid = f"{2000000000 + v}"
        name = f"{group}_{vid}"
        os.makedirs(os.path.join(ann_dir, group), exist_ok=True)
        w, h = 640, 360
        n_tracks = 2
        track_frames = {t: list(range(0, n_frames - 5 * t))
                        for t in range(n_tracks)}
        trajectories = []
        for f in range(n_frames):
            frame = [{"tid": t, "bbox": _bbox(rng, w, h)}
                     for t in range(n_tracks) if f in track_frames[t]]
            trajectories.append(frame)
        common = sorted(set(track_frames[0]) & set(track_frames[1]))
        bf, ef = common[2], common[2] + 10
        anno = {
            "video_id": vid, "height": h, "width": w,
            "frame_count": n_frames, "fps": 30,
            "subject/objects": [{"tid": t, "category": categories[t]}
                                for t in range(n_tracks)],
            "trajectories": trajectories,
            "relation_instances": [
                {"subject_tid": 0, "object_tid": 1,
                 "predicate": predicates[v % 3],
                 "begin_fid": int(bf), "end_fid": int(ef)}],
        }
        with open(os.path.join(ann_dir, group, vid + ".json"), "w") as f:
            json.dump(anno, f)

        feats = {}
        for f in range(n_frames):
            tids = [t["tid"] for t in trajectories[f]]
            if not tids:
                continue
            feats[f + 1] = {"frame_id": f + 1,
                            "tids": np.asarray(tids, np.int64),
                            "visual_features": rng.standard_normal(
                                (len(tids), VIS)).astype(np.float32)}
        with open(os.path.join(feat_dir, name + ".pkl"), "wb") as f:
            pickle.dump(feats, f)

        clip = {t: rng.standard_normal((n_frames, CLIP)).astype(np.float32)
                + 0.1 for t in range(n_tracks)}
        with open(os.path.join(clip_dir, name + ".pkl"), "wb") as f:
            pickle.dump(clip, f)

    return {"ann_dir": os.path.join(root, "annotations"),
            "gt_boxfeatures_dir": feat_dir,
            "clip_training_features_dir": clip_dir}


def vidor_config(root, dirs, with_clip, cache_tag):
    return {
        "ann_dir": dirs["ann_dir"],
        "cache_tag": cache_tag,
        "cache_dir": os.path.join(root, "cache_" + cache_tag),
        "feat_stride": 1,
        "max_seq_len": 48,
        "split": "training",
        "with_clip_feature": with_clip,
        "cut_max_preds": True,
        "proposal_max_preds": 9,
        "num_pairs": 2,
        "gt_boxfeatures_dir": dirs["gt_boxfeatures_dir"],
        "clip_training_features_dir": dirs["clip_training_features_dir"],
        "policy_path": os.path.join(root, f"policy_{cache_tag}.txt"),
        # reference-only keys
        "min_frames_th": 15, "max_proposal": 180, "max_preds": 200,
        "score_th": 0.4, "dim_visualfeature": VIS, "dim_wordfeature": 300,
    }


@pytest.mark.parametrize("with_clip", [False, True])
def test_vidor_train_parity(tmp_path, with_clip):
    root = str(tmp_path)
    dirs = make_vidor_corpus(root, n_videos=3)
    tag = "clip" if with_clip else "base"

    ours_cfg = vidor_config(root, dirs, with_clip, tag + "_ours")
    ours = VidORDataset(ours_cfg)
    assert os.path.exists(ours_cfg["policy_path"])

    from dataloaders.vidor import VidOR as RefVidOR
    ref_cfg = vidor_config(root, dirs, with_clip, tag + "_ref")
    ref = RefVidOR(ref_cfg)

    assert ours.video_name_list == ref.video_name_list
    assert len(ours.policy) == len(ref.policy)

    rng = np.random.default_rng(0)
    for name in ours.video_name_list:
        ours_pairs = ours.train_pairs(ours._load_video(name), None, rng)
        with open(os.path.join(ref.cache_path, name + ".pkl"), "rb") as f:
            ref_data = pickle.load(f)
        ref_out = ref._train_getitem(ref_data, None)
        if not ours_pairs:
            assert len(ref_out) == 0
            continue
        assert len(ours_pairs) == len(ref_out["so_features_list"])
        for i, pair in enumerate(ours_pairs):
            ref_feat = oracle.t2n(ref_out["so_features_list"][i]).T
            np.testing.assert_allclose(pair["so_feat"], ref_feat,
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_array_equal(
                pair["preds"], oracle.t2n(ref_out["preds_list"][i]))


def test_vidor_policy_file_reuse(tmp_path):
    """Second construction must read the persisted policy (not rebuild)."""
    root = str(tmp_path)
    dirs = make_vidor_corpus(root, n_videos=3)
    cfg = vidor_config(root, dirs, False, "reuse")
    ds1 = VidORDataset(cfg)
    counts1 = [tuple(x) for x in ds1.video_num_pairs]
    ds2 = VidORDataset(cfg)
    assert [tuple(x) for x in ds2.video_num_pairs] == counts1
    assert len(ds2.policy) == len(ds1.policy)
