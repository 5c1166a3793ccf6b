"""Eval-pipeline tests: metric unit tests + decode parity vs the reference
forward_test on a synthetic corpus with transplanted weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.eval import metrics as M
from vrdone_tpu.eval import convert as C
from vrdone_tpu.eval.decode import InferenceRunner, infer_video
from vrdone_tpu.config import InferenceConfig


def boxes(n, x=10, y=10, w=20, h=20):
    return [[x, y, x + w, y + h] for _ in range(n)]


def rel(triplet, dur, sub, obj, score=1.0):
    return {"triplet": list(triplet), "duration": list(dur), "score": score,
            "sub_traj": sub, "obj_traj": obj}


def test_viou_identical():
    t = boxes(10)
    assert M.viou(t, [0, 10], t, [0, 10]) == pytest.approx(1.0)


def test_viou_temporal_disjoint():
    t = boxes(10)
    assert M.viou(t, [0, 10], t, [10, 20]) == 0.0


def test_viou_half_temporal():
    t1 = boxes(10)
    t2 = boxes(10)
    # [0,10) vs [5,15): overlap 5 frames, identical boxes
    v = M.viou(t1, [0, 10], t2, [5, 15])
    # overlap volume = 5*a, v1 = v2 = 10*a -> 5a / (20a - 5a) = 1/3
    assert v == pytest.approx(1 / 3)


def test_viou_spatial():
    a = boxes(5, x=0, y=0, w=9, h=9)    # area 100/frame (+1 convention)
    b = boxes(5, x=5, y=0, w=9, h=9)    # overlap width 5 -> 50/frame
    v = M.viou(a, [0, 5], b, [0, 5])
    assert v == pytest.approx(50.0 / (100 + 100 - 50))


def test_perfect_predictions_score_one():
    gt = {"v1": [rel(("dog", "chase", "cat"), (0, 10), boxes(10), boxes(10)),
                 rel(("dog", "watch", "cat"), (5, 15), boxes(10), boxes(10))]}
    pred = {"v1": [dict(r, score=0.9 - 0.1 * i)
                   for i, r in enumerate(gt["v1"])]}
    out = M.relation_metrics(gt, pred)
    assert out["RelDet_mAP"] == pytest.approx(1.0)
    assert out["RelDet_AR@50"] == pytest.approx(1.0)
    assert out["RelTag_AP@1"] == pytest.approx(1.0)


def test_wrong_triplet_scores_zero():
    gt = {"v1": [rel(("dog", "chase", "cat"), (0, 10), boxes(10), boxes(10))]}
    pred = {"v1": [rel(("dog", "bite", "cat"), (0, 10), boxes(10), boxes(10),
                       score=0.9)]}
    out = M.relation_metrics(gt, pred)
    assert out["RelDet_mAP"] == 0.0
    assert out["RelTag_AP@1"] == 0.0


def test_detection_greedy_matching_consumes_gt():
    g = rel(("a", "b", "c"), (0, 10), boxes(10), boxes(10))
    gt = {"v": [g]}
    # two identical predictions: only one can match
    pred = {"v": [dict(g, score=0.9), dict(g, score=0.8)]}
    prec, recl, hits = M.eval_detection_scores(gt["v"], pred["v"], 0.5)
    assert np.isfinite(hits[0]) and not np.isfinite(hits[1])
    assert recl[-1] == pytest.approx(1.0)
    assert prec[-1] == pytest.approx(0.5)


def test_voc_ap_simple():
    # single TP out of single GT: rec [1], prec [1] -> AP 1
    assert M.voc_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    # TP then FP: rec [1,1], prec [1,0.5] -> AP 1
    assert M.voc_ap(np.array([1.0, 1.0]),
                    np.array([1.0, 0.5])) == pytest.approx(1.0)
    # FP then TP: rec [0,1], prec [0,0.5] -> AP 0.5
    assert M.voc_ap(np.array([0.0, 1.0]),
                    np.array([0.0, 0.5])) == pytest.approx(0.5)


def test_convert_and_gt_builder(tmp_path):
    from tests.synth_corpus import make_vidvrd_corpus
    dirs = make_vidvrd_corpus(str(tmp_path), n_videos=2, n_frames=30, seed=3)
    gts = C.build_groundtruth(dirs["ann_dir"], "train", "vidvrd")
    assert len(gts) == 2
    for vid, insts in gts.items():
        for inst in insts:
            assert len(inst["sub_traj"]) == \
                inst["duration"][1] - inst["duration"][0]
            assert len(inst["triplet"]) == 3


def test_decode_parity_vs_reference_forward_test(tmp_path):
    """Same weights + same video item: our bucketed inference must produce
    the same triplet set as the reference forward_test."""
    import torch
    from tests import oracle
    from tests.synth_corpus import make_vidvrd_test_corpus, VIS_DIM
    from tests.test_model_parity import small_cfg, make_models
    from vrdone_tpu.data.datasets import VidVRDDataset
    import os, json

    root = str(tmp_path)
    dirs = make_vidvrd_test_corpus(root, n_videos=2, seed=5)
    cfg = small_cfg(visual_dim=VIS_DIM, max_so_pair=4)
    tm, jm, params = make_models(cfg, seed=2)
    tm.eval()
    infer = InferenceConfig(topk=3, feat_stride=1, pred_min_frames=2,
                            n_max_pair=10000, viou_th=0.5, max_so_pair=4)
    tm._config_eval({"topk": infer.topk, "n_max_pair": infer.n_max_pair,
                     "feat_stride": infer.feat_stride,
                     "pred_min_frames": infer.pred_min_frames})

    ds = VidVRDDataset({
        "ann_dir": os.path.join(root, "annotations"),
        "cache_tag": "T", "cache_dir": os.path.join(root, "cache"),
        "feat_stride": 1, "max_seq_len": cfg.max_seq_len, "split": "test",
        "proposal_min_frames": 2, "random_stride": False, "stride_offset": 0,
        "info_dir": dirs["info_dir"],
        "test_boxfeatures_dir": dirs["test_boxfeatures_dir"],
    })
    feat_dim = 2 * VIS_DIM + 5 + 16
    runner = InferenceRunner(cfg, params["params"], infer, feat_dim)

    n_checked = 0
    for idx in range(ds.num_test_items()):
        item = ds.get_test_item(idx)
        if item is None:
            continue
        ours = infer_video(runner, item)

        tin = {
            "sids": torch.from_numpy(item["sids"]),
            "oids": torch.from_numpy(item["oids"]),
            "cat_ids": torch.from_numpy(item["cat_ids"]),
            "cat_scores": torch.from_numpy(item["cat_scores"]),
            "traj_durations": torch.from_numpy(item["traj_durations"]),
            "bboxes_list": [torch.from_numpy(b)
                            for b in item["bboxes_list"]],
            "so_features_list": [torch.from_numpy(f.T.copy())
                                 for f in item["so_features_list"]],
            "so_offset": torch.from_numpy(item["so_offset"]),
        }
        with torch.no_grad():
            theirs = tm.forward_test(tin)

        if ours is None:
            assert theirs is None
            continue
        n_checked += 1
        assert theirs is not None
        assert len(ours["triplets"]) == len(theirs["triplets"])

        def key_set(res):
            return sorted(
                (tuple(t), tuple(d))
                for t, d in zip(res["triplets"], res["pred_durations"]))
        assert key_set(ours) == key_set(theirs)
        # scores per matching triplet
        ours_map = {}
        for t, d, s in zip(ours["triplets"], ours["pred_durations"],
                           ours["triple_scores_avg"]):
            ours_map[(tuple(t), tuple(d))] = s
        for t, d, s in zip(theirs["triplets"], theirs["pred_durations"],
                           theirs["triple_scores_avg"]):
            assert abs(ours_map[(tuple(t), tuple(d))] - s) < 5e-4
    assert n_checked > 0


def test_decode_parity_long_bucket(tmp_path):
    """Sequences longer than max_seq_len: our geometric length buckets must
    reproduce the reference's pad-to-max_div_factor long path."""
    import torch
    from tests import oracle
    from tests.synth_corpus import make_vidvrd_test_corpus, VIS_DIM
    from tests.test_model_parity import small_cfg, make_models
    from vrdone_tpu.data.datasets import VidVRDDataset
    import os

    root = str(tmp_path)
    dirs = make_vidvrd_test_corpus(root, n_videos=2, seed=9, video_len=90,
                                   max_span=80)
    # max_seq_len 32 with window 5 (strides 4..32 all divide 32); test
    # videos run up to 90 frames -> the long bucket is exercised
    cfg = small_cfg(visual_dim=VIS_DIM, max_so_pair=4, max_seq_len=32,
                    n_mha_win_size=5)
    tm, jm, params = make_models(cfg, seed=3)
    tm.eval()
    infer = InferenceConfig(topk=2, feat_stride=1, pred_min_frames=2,
                            n_max_pair=10000, viou_th=0.5, max_so_pair=4)
    tm._config_eval({"topk": infer.topk, "n_max_pair": infer.n_max_pair,
                     "feat_stride": infer.feat_stride,
                     "pred_min_frames": infer.pred_min_frames})

    ds = VidVRDDataset({
        "ann_dir": os.path.join(root, "annotations"),
        "cache_tag": "L", "cache_dir": os.path.join(root, "cache"),
        "feat_stride": 1, "max_seq_len": cfg.max_seq_len, "split": "test",
        "proposal_min_frames": 2, "random_stride": False, "stride_offset": 0,
        "info_dir": dirs["info_dir"],
        "test_boxfeatures_dir": dirs["test_boxfeatures_dir"],
    })
    feat_dim = 2 * VIS_DIM + 5 + 16
    runner = InferenceRunner(cfg, params["params"], infer, feat_dim)

    n_long = 0
    for idx in range(ds.num_test_items()):
        item = ds.get_test_item(idx)
        if item is None:
            continue
        lengths = [f.shape[0] for f in item["so_features_list"]]
        n_long += sum(l > cfg.max_seq_len for l in lengths)
        ours = infer_video(runner, item)
        tin = {
            "sids": torch.from_numpy(item["sids"]),
            "oids": torch.from_numpy(item["oids"]),
            "cat_ids": torch.from_numpy(item["cat_ids"]),
            "cat_scores": torch.from_numpy(item["cat_scores"]),
            "traj_durations": torch.from_numpy(item["traj_durations"]),
            "bboxes_list": [torch.from_numpy(b)
                            for b in item["bboxes_list"]],
            "so_features_list": [torch.from_numpy(f.T.copy())
                                 for f in item["so_features_list"]],
            "so_offset": torch.from_numpy(item["so_offset"]),
        }
        with torch.no_grad():
            theirs = tm.forward_test(tin)
        if ours is None:
            assert theirs is None
            continue

        def key_set(res):
            return sorted(
                (tuple(t), tuple(d))
                for t, d in zip(res["triplets"], res["pred_durations"]))
        assert key_set(ours) == key_set(theirs)
    assert n_long > 0, "fixture produced no long sequences"
