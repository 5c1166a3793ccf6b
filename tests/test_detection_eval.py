"""Detector evaluation protocol tests (VID AP / motion buckets / proposal
recall / COCO AP) with hand-computed expected values.

Reference semantics: datasets/mega/mega_core/data/datasets/evaluation/
vid/vid_eval.py.
"""

import numpy as np

from vrdone_tpu.eval.detection import (calc_vid_ap, calc_vid_prec_rec,
                                       compute_motion_ious,
                                       eval_detection_coco,
                                       eval_detection_vid,
                                       eval_proposal_recall, iou_matrix)


def B(*boxes):
    return np.asarray(boxes, np.float64)


def test_iou_plus_one_convention():
    # identical 10x10 boxes (integer convention: 11x11 = 121 px)
    a = B([0, 0, 10, 10])
    assert iou_matrix(a, a)[0, 0] == 1.0
    # half-overlap: [0,0,10,10] vs [0,0,4,10] -> inter 5*11, union 11*11
    got = iou_matrix(B([0, 0, 10, 10]), B([0, 0, 4, 10]))[0, 0]
    assert abs(got - (5 * 11) / (11 * 11)) < 1e-9


def test_perfect_detection_ap_one():
    gts = [{"boxes": B([0, 0, 10, 10], [20, 20, 40, 40]),
            "labels": np.asarray([1, 2])}]
    preds = [{"boxes": B([0, 0, 10, 10], [20, 20, 40, 40]),
              "labels": np.asarray([1, 2]),
              "scores": np.asarray([0.9, 0.8])}]
    res = eval_detection_vid(gts, preds)
    assert abs(res["all"]["map"] - 1.0) < 1e-9
    assert abs(res["all"]["ap"][1] - 1.0) < 1e-9
    assert abs(res["all"]["ap"][2] - 1.0) < 1e-9


def test_duplicate_detection_is_fp():
    """Two detections of the same GT: one TP + one FP.

    By hand: scores 0.9 (TP), 0.8 (dup -> FP). PR points: (p=1, r=1),
    (p=0.5, r=1). AP = 1.0 (the lower-precision point adds no recall)."""
    gts = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([1])}]
    preds = [{"boxes": B([0, 0, 10, 10], [0, 0, 10, 10]),
              "labels": np.asarray([1, 1]),
              "scores": np.asarray([0.9, 0.8])}]
    res = eval_detection_vid(gts, preds)
    assert abs(res["all"]["map"] - 1.0) < 1e-9
    # reversed: the FP outranks the TP -> PR points (0, 0), (0.5, 1)
    # AP = 0.5
    preds2 = [{"boxes": B([50, 50, 60, 60], [0, 0, 10, 10]),
               "labels": np.asarray([1, 1]),
               "scores": np.asarray([0.9, 0.8])}]
    res2 = eval_detection_vid(gts, preds2)
    assert abs(res2["all"]["map"] - 0.5) < 1e-9


def test_missed_gt_halves_recall():
    """2 GT, 1 detected: AP = 0.5 (recall plateaus at 0.5)."""
    gts = [{"boxes": B([0, 0, 10, 10], [50, 50, 70, 70]),
            "labels": np.asarray([1, 1])}]
    preds = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([1]),
              "scores": np.asarray([0.9])}]
    res = eval_detection_vid(gts, preds)
    assert abs(res["all"]["map"] - 0.5) < 1e-9


def test_class_confusion_is_fp():
    gts = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([1])}]
    preds = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([2]),
              "scores": np.asarray([0.9])}]
    res = eval_detection_vid(gts, preds)
    # class 1: no detections -> AP 0; class 2: no GT -> AP nan (excluded)
    assert res["all"]["ap"][1] == 0.0
    assert np.isnan(res["all"]["ap"][2])
    assert res["all"]["map"] == 0.0


def test_vid_07_metric():
    """11-point metric: single TP at recall 1 -> AP = 1.0 under both."""
    prec = {1: np.asarray([1.0])}
    rec = {1: np.asarray([1.0])}
    assert abs(calc_vid_ap(prec, rec, use_07_metric=True)[1] - 1.0) < 1e-9
    assert abs(calc_vid_ap(prec, rec, use_07_metric=False)[1] - 1.0) < 1e-9
    # TP at recall 0.5 only: 07-metric averages max precision over 11
    # recall points -> 6/11; exact metric -> 0.5
    prec = {1: np.asarray([1.0])}
    rec = {1: np.asarray([0.5])}
    assert abs(calc_vid_ap(prec, rec, use_07_metric=True)[1] - 6 / 11) < 1e-9
    assert abs(calc_vid_ap(prec, rec, use_07_metric=False)[1] - 0.5) < 1e-9


def test_motion_bucket_ignores_out_of_range_gt():
    """One slow GT (motion IoU 0.95), one fast GT (0.3). In the 'slow'
    bucket the fast GT is ignored: detecting only the slow one gives
    AP 1.0 there."""
    gts = [{"boxes": B([0, 0, 10, 10], [50, 50, 70, 70]),
            "labels": np.asarray([1, 1])}]
    preds = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([1]),
              "scores": np.asarray([0.9])}]
    motion = [np.asarray([0.95, 0.3])]
    res = eval_detection_vid(gts, preds, motion_ious=motion)
    assert abs(res["slow"]["map"] - 1.0) < 1e-9
    # in the fast bucket the detection matches an ignored GT -> not a TP,
    # and the fast GT is missed -> AP 0
    assert res["fast"]["map"] == 0.0
    # 'all' bucket sees both GTs, one detected
    assert abs(res["all"]["map"] - 0.5) < 1e-9


def test_match_prefers_nonignored_gt_on_tie():
    """Two coincident GTs, one ignored (fast), one in-range: the single
    detection must match the NON-ignored one (vid_eval.py:235-238) and
    count as a TP in the slow bucket."""
    gts = [{"boxes": B([0, 0, 10, 10], [0, 0, 10, 10]),
            "labels": np.asarray([1, 1])}]
    preds = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([1]),
              "scores": np.asarray([0.9])}]
    motion = [np.asarray([0.1, 0.95])]   # first ignored in 'slow'
    res = eval_detection_vid(gts, preds, motion_ious=motion)
    assert abs(res["slow"]["map"] - 1.0) < 1e-9


def test_proposal_recall():
    gts = [{"boxes": B([0, 0, 10, 10], [50, 50, 70, 70]),
            "labels": np.asarray([1, 1])}]
    preds = [{"boxes": B([0, 0, 10, 10], [100, 100, 120, 120]),
              "labels": np.asarray([0, 0]),
              "scores": np.asarray([0.9, 0.8])}]
    assert abs(eval_proposal_recall(gts, preds) - 0.5) < 1e-9
    # limit=1 keeps only the top-scored proposal
    assert abs(eval_proposal_recall(gts, preds, limit=1) - 0.5) < 1e-9


def test_motion_iou_from_trajectories():
    """A static box has motion IoU 1; a fast-moving one less."""
    def frame(tid, x):
        return [{"tid": tid,
                 "bbox": {"xmin": x, "ymin": 0, "xmax": x + 10,
                          "ymax": 10}}]
    # static track
    trajs = [frame(0, 5) for _ in range(5)]
    m = compute_motion_ious(trajs)
    assert all(abs(v[0] - 1.0) < 1e-9 for v in m)
    # jumping track (no overlap between consecutive frames)
    trajs = [frame(0, 100 * t) for t in range(5)]
    m = compute_motion_ious(trajs)
    assert all(v[0] == 0.0 for v in m)
    # singleton frame with no neighbors -> defined as 1.0 (slow)
    m = compute_motion_ious([frame(0, 5)])
    assert m[0][0] == 1.0


def test_coco_ap_perfect_and_loose():
    gts = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([1])}]
    perfect = [{"boxes": B([0, 0, 10, 10]), "labels": np.asarray([1]),
                "scores": np.asarray([0.9])}]
    res = eval_detection_coco(gts, perfect)
    assert abs(res["AP"] - 1.0) < 1e-6 and abs(res["AP75"] - 1.0) < 1e-6

    # a detection with IoU ~0.60 counts at thresholds 0.5..0.6 only
    loose = [{"boxes": B([0, 0, 10, 6.1]), "labels": np.asarray([1]),
              "scores": np.asarray([0.9])}]
    res = eval_detection_coco(gts, loose)
    assert abs(res["AP50"] - 1.0) < 1e-6
    assert res["AP75"] == 0.0
    assert 0.0 < res["AP"] < 1.0
