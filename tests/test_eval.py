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


# ---------------------------------------------------------------------------
# Adversarial edge-case battery for the scoring reimplementation
# (VidVRD-helper protocol; every expected number derived by hand inline)
# ---------------------------------------------------------------------------


def test_two_preds_one_gt_greedy_order():
    """Two predictions both matching the single GT: the higher-scored one
    is the TP, the duplicate is an FP.

    Hand derivation: sorted preds -> [TP, FP]. prec = [1/1, 1/2],
    rec = [1, 1]. voc_ap: recall changes only at the first point ->
    AP = 1.0. AR@50 over the corpus: 1 GT, 1 TP -> 1.0."""
    t = boxes(10)
    gt = {"v": [rel(("a", "r", "b"), (0, 10), t, t)]}
    pred = {"v": [rel(("a", "r", "b"), (0, 10), t, t, score=0.9),
                  rel(("a", "r", "b"), (0, 10), t, t, score=0.8)]}
    out = M.relation_metrics(gt, pred)
    assert out["RelDet_mAP"] == pytest.approx(1.0)
    assert out["RelDet_AR@50"] == pytest.approx(1.0)
    # reversed score order with a NON-matching high scorer: FP first ->
    # prec = [0, 1/2], rec = [0, 1] -> AP = 0.5
    pred2 = {"v": [rel(("a", "r", "b"), (0, 10),
                       boxes(10, x=500), boxes(10, x=500), score=0.9),
                   rel(("a", "r", "b"), (0, 10), t, t, score=0.8)]}
    out2 = M.relation_metrics(gt, pred2)
    assert out2["RelDet_mAP"] == pytest.approx(0.5)


def test_duplicate_gt_triplets_best_iou_wins():
    """Two GTs with the SAME triplet at different locations: a single
    prediction overlapping both (above threshold) must match the
    higher-vIoU one, leaving the other for a later prediction."""
    a = boxes(10, x=0)           # gt 1 location
    b = boxes(10, x=6)           # gt 2 location (overlaps a)
    gt = {"v": [rel(("a", "r", "b"), (0, 10), a, a),
                rel(("a", "r", "b"), (0, 10), b, b)]}
    # pred at exactly location b -> must consume gt2 (vIoU 1 > vIoU(a,b))
    pred = {"v": [rel(("a", "r", "b"), (0, 10), b, b, score=0.9),
                  rel(("a", "r", "b"), (0, 10), a, a, score=0.8)]}
    out = M.relation_metrics(gt, pred)
    # both matched -> prec [1, 1], rec [0.5, 1] -> AP 1
    assert out["RelDet_mAP"] == pytest.approx(1.0)


def test_zero_gt_video_excluded_from_map_and_ar():
    """A video with zero GT relations is skipped entirely (helper
    behavior: its predictions contribute no FPs to the corpus AR and it
    has no per-video AP)."""
    t = boxes(10)
    gt = {"v1": [rel(("a", "r", "b"), (0, 10), t, t)], "v2": []}
    pred = {"v1": [rel(("a", "r", "b"), (0, 10), t, t, score=0.9)],
            "v2": [rel(("x", "y", "z"), (0, 10), t, t, score=1.0)] * 30}
    out = M.relation_metrics(gt, pred)
    assert out["RelDet_mAP"] == pytest.approx(1.0)
    assert out["RelDet_AR@50"] == pytest.approx(1.0)
    assert out["RelTag_AP@1"] == pytest.approx(1.0)


def test_score_ties_stable_order():
    """Equal scores: python sorted() is stable, so input order decides.
    First-listed matching prediction takes the GT."""
    t = boxes(10)
    far = boxes(10, x=500)
    gt = {"v": [rel(("a", "r", "b"), (0, 10), t, t)]}
    # both score 0.5; first is the true match
    pred = {"v": [rel(("a", "r", "b"), (0, 10), t, t, score=0.5),
                  rel(("a", "r", "b"), (0, 10), far, far, score=0.5)]}
    out = M.relation_metrics(gt, pred)
    # prec [1, 1/2], rec [1, 1] -> AP 1
    assert out["RelDet_mAP"] == pytest.approx(1.0)
    # swapped: FP first -> prec [0, 1/2] -> AP 0.5
    pred2 = {"v": [rel(("a", "r", "b"), (0, 10), far, far, score=0.5),
                   rel(("a", "r", "b"), (0, 10), t, t, score=0.5)]}
    out2 = M.relation_metrics(gt, pred2)
    assert out2["RelDet_mAP"] == pytest.approx(0.5)


def test_tagging_fewer_unique_triplets_than_k():
    """prec@k when the video has fewer unique predicted triplets than k:
    the helper takes the precision at the LAST available rank.

    1 unique correct triplet predicted; prec@5 should read the curve at
    rank 1 -> 1.0 (not 1/5)."""
    t = boxes(10)
    gt = {"v": [rel(("a", "r", "b"), (0, 10), t, t),
                rel(("c", "r", "d"), (0, 10), t, t)]}
    pred = {"v": [rel(("a", "r", "b"), (0, 10), t, t, score=0.9)]}
    out = M.relation_metrics(gt, pred)
    assert out["RelTag_AP@1"] == pytest.approx(1.0)
    assert out["RelTag_AP@5"] == pytest.approx(1.0)
    # duplicate-triplet predictions collapse to one tagging entry
    pred2 = {"v": [rel(("a", "r", "b"), (0, 10), t, t, score=0.9),
                   rel(("a", "r", "b"), (5, 15), t, t, score=0.8)]}
    out2 = M.relation_metrics(gt, pred2)
    assert out2["RelTag_AP@5"] == pytest.approx(1.0)


def test_tagging_mixed_rank_precision():
    """Tagging prec@k reads the cumulative precision curve: correct,
    wrong, correct -> prec = [1, 1/2, 2/3]; prec@1 = 1, prec@5 = 2/3."""
    t = boxes(10)
    gt = {"v": [rel(("a", "r", "b"), (0, 10), t, t),
                rel(("c", "r", "d"), (0, 10), t, t)]}
    pred = {"v": [rel(("a", "r", "b"), (0, 10), t, t, score=0.9),
                  rel(("x", "y", "z"), (0, 10), t, t, score=0.8),
                  rel(("c", "r", "d"), (0, 10), t, t, score=0.7)]}
    out = M.relation_metrics(gt, pred)
    assert out["RelTag_AP@1"] == pytest.approx(1.0)
    assert out["RelTag_AP@5"] == pytest.approx(2 / 3)


def test_prediction_overflowing_gt_duration():
    """A prediction covering twice the GT's temporal extent has vIoU
    10a/(20a + 10a - 10a) = 0.5 (boundary): at threshold 0.5 it still
    matches; a slightly longer one (21 frames) drops below and is an FP."""
    t10, t20, t21 = boxes(10), boxes(20), boxes(21)
    gt = {"v": [rel(("a", "r", "b"), (5, 15), t10, t10)]}
    pred_ok = {"v": [rel(("a", "r", "b"), (0, 20), t20, t20, score=0.9)]}
    assert M.relation_metrics(gt, pred_ok)["RelDet_mAP"] == \
        pytest.approx(1.0)
    pred_long = {"v": [rel(("a", "r", "b"), (0, 21), t21, t21, score=0.9)]}
    assert M.relation_metrics(gt, pred_long)["RelDet_mAP"] == \
        pytest.approx(0.0)


def test_empty_predictions_video():
    """GT video with no predictions: AP 0 for that video, and the mAP
    averages over videos -> (1 + 0)/2."""
    t = boxes(10)
    gt = {"v1": [rel(("a", "r", "b"), (0, 10), t, t)],
          "v2": [rel(("c", "r", "d"), (0, 10), t, t)]}
    pred = {"v1": [rel(("a", "r", "b"), (0, 10), t, t, score=0.9)]}
    out = M.relation_metrics(gt, pred)
    assert out["RelDet_mAP"] == pytest.approx(0.5)
    # corpus AR: 2 GTs, 1 TP
    assert out["RelDet_AR@50"] == pytest.approx(0.5)
    # tagging prec for v2: no predictions -> 0 contribution
    assert out["RelTag_AP@1"] == pytest.approx(0.5)


def test_recall_at_n_cutoff():
    """AR@N truncates each video's score-sorted detections at N before
    the corpus-level merge. 3 TPs in one video, AR@2 keeps only the two
    highest-scored -> corpus recall 2/3."""
    t = boxes(10)
    gts = [rel(("a", "r", "b"), (0, 10), boxes(10, x=100 * i),
               boxes(10, x=100 * i)) for i in range(3)]
    preds = [dict(g, score=0.9 - 0.1 * i) for i, g in enumerate(gts)]
    mean_ap, rec_at_n, _ = M.eval_visual_relation(
        {"v": gts}, {"v": preds}, 0.5, det_nreturns=(2, 50))
    assert rec_at_n[2] == pytest.approx(2 / 3)
    assert rec_at_n[50] == pytest.approx(1.0)
    assert mean_ap == pytest.approx(1.0)


def test_min_of_subject_object_viou_gates_match():
    """Matching requires min(sub vIoU, obj vIoU) >= threshold: a perfect
    subject with a displaced object must NOT match."""
    t = boxes(10)
    far = boxes(10, x=500)
    gt = {"v": [rel(("a", "r", "b"), (0, 10), t, t)]}
    pred = {"v": [rel(("a", "r", "b"), (0, 10), t, far, score=0.9)]}
    assert M.relation_metrics(gt, pred)["RelDet_mAP"] == pytest.approx(0.0)


def test_corpus_ar_merges_across_videos_by_score():
    """AR@N merges per-video cutoffs then re-sorts by score; recall is
    against the corpus GT total. v1: 1 TP (0.9); v2: 1 FP (0.8) + 1 TP
    (0.7) over 1 GT each -> AR@50 = 2/2 = 1; AR computation is
    cutoff-then-merge, so AR@1 keeps v1's TP and v2's FP -> 1/2."""
    t = boxes(10)
    far = boxes(10, x=500)
    gt = {"v1": [rel(("a", "r", "b"), (0, 10), t, t)],
          "v2": [rel(("c", "r", "d"), (0, 10), t, t)]}
    pred = {"v1": [rel(("a", "r", "b"), (0, 10), t, t, score=0.9)],
            "v2": [rel(("c", "r", "d"), (0, 10), far, far, score=0.8),
                   rel(("c", "r", "d"), (0, 10), t, t, score=0.7)]}
    _, rec_at_n, _ = M.eval_visual_relation(gt, pred, 0.5,
                                            det_nreturns=(1, 50))
    assert rec_at_n[50] == pytest.approx(1.0)
    assert rec_at_n[1] == pytest.approx(0.5)


def test_dp_sharded_runner_matches_single_device():
    """InferenceRunner(mesh=...) shards the pack axis over the dp mesh;
    per-item math is untouched, so outputs must match the single-device
    runner on every bucket shape (short + long)."""
    import __graft_entry__ as g
    from vrdone_tpu.config import PredictorConfig
    from vrdone_tpu.models.maskvrd import MaskVRD
    from vrdone_tpu.parallel.mesh import make_mesh

    cfg = g._vidvrd_cfg(
        visual_dim=16, embd_dim=32, num_classes=10, fpn_dim=16,
        max_seq_len=48,
        predictor=PredictorConfig(n_input=32, n_embd=16, n_head=4,
                                  n_hidden=64, num_queries=9,
                                  num_classes=10, num_layers=2,
                                  deep_supervision=False))
    c = g._feat_dim(cfg)
    model = MaskVRD(cfg)
    key = jax.random.key(0)
    params = jax.jit(lambda k, f, m: model.init(
        {"params": k}, f, m, deterministic=True))(
            key, jnp.zeros((2, cfg.max_seq_len, c)),
            jnp.ones((2, cfg.max_seq_len), bool))["params"]

    rng = np.random.default_rng(0)
    # short bucket (<= max_seq_len) and long bucket lengths
    so_features = [rng.standard_normal((t, c)).astype(np.float32)
                   for t in (7, 20, 48, 60, 33)]
    infer = InferenceConfig(topk=4, feat_stride=1, pred_min_frames=2,
                            n_max_pair=100, viou_th=0.5, max_so_pair=200)

    single = InferenceRunner(cfg, params, infer, c)
    mesh = make_mesh(n_dp=8)
    sharded = InferenceRunner(cfg, params, infer, c, mesh=mesh)

    s0, c0, m0 = single.run_pairs(so_features)
    s1, c1, m1 = sharded.run_pairs(so_features)
    for i in range(len(so_features)):
        np.testing.assert_allclose(s0[i], s1[i], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(c0[i], c1[i])
        np.testing.assert_array_equal(m0[i], m1[i])
