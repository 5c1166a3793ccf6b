"""IoU tracker tests: identity maintenance, gap tolerance, class
separation, and proposal-builder integration."""

import numpy as np

from vrdone_tpu.data.proposals import build_traj_proposal
from vrdone_tpu.data.tracking import IoUTracker


def moving_box(t, x0=10.0, y0=10.0, v=3.0, size=30.0):
    x = x0 + v * t
    return [x, y0, x + size, y0 + size]


def test_two_objects_tracked():
    tracker = IoUTracker(min_length=5)
    for t in range(20):
        boxes = np.asarray([moving_box(t), moving_box(t, x0=200, v=-2.0)],
                           np.float32)
        labels = np.asarray([1, 2])
        scores = np.asarray([0.9, 0.8], np.float32)
        feats = np.full((2, 4), t, np.float32)
        tracker.update(t, boxes, labels, scores, feats)
    tracks = tracker.finish()
    assert len(tracks) == 2
    for tr in tracks:
        assert len(tr["frame_ids"]) == 20
        np.testing.assert_array_equal(tr["frame_ids"], np.arange(20))
    cats = sorted(t["category_id"] for t in tracks)
    assert cats == [1, 2]


def test_gap_tolerance_and_split():
    tracker = IoUTracker(min_length=3, max_gap=2)
    # object visible frames 0-9, missing 10-11 (within gap), back 12-19
    for t in range(20):
        if t in (10, 11):
            tracker.update(t, np.zeros((0, 4), np.float32),
                           np.zeros((0,), np.int64),
                           np.zeros((0,), np.float32))
            continue
        tracker.update(t, np.asarray([moving_box(t, v=0.5)], np.float32),
                       np.asarray([1]), np.asarray([0.9], np.float32))
    tracks = tracker.finish()
    assert len(tracks) == 1  # gap bridged
    assert len(tracks[0]["frame_ids"]) == 18

    # a longer gap splits the track
    tracker2 = IoUTracker(min_length=3, max_gap=2)
    for t in range(20):
        if 8 <= t < 14:
            tracker2.update(t, np.zeros((0, 4), np.float32),
                            np.zeros((0,), np.int64),
                            np.zeros((0,), np.float32))
            continue
        tracker2.update(t, np.asarray([moving_box(t, v=0.2)], np.float32),
                        np.asarray([1]), np.asarray([0.9], np.float32))
    assert len(tracker2.finish()) == 2


def test_same_position_different_class_not_linked():
    tracker = IoUTracker(min_length=2)
    box = np.asarray([moving_box(0, v=0)], np.float32)
    tracker.update(0, box, np.asarray([1]), np.asarray([0.9], np.float32))
    tracker.update(1, box, np.asarray([2]), np.asarray([0.9], np.float32))
    tracks = tracker.finish()
    # two single-frame tracks, both below min_length=2
    assert len(tracks) == 0


def test_tracker_to_proposals():
    tracker = IoUTracker(min_length=4)
    rng = np.random.default_rng(0)
    for t in range(12):
        boxes = np.asarray([moving_box(t)], np.float32)
        tracker.update(t, boxes, np.asarray([3]),
                       np.asarray([0.7], np.float32),
                       rng.standard_normal((1, 8)).astype(np.float32))
    tracks = tracker.finish()
    prop = build_traj_proposal("v", tracks, (320, 240), 12, dim_feat=8)
    assert prop["num_proposals"] == 1
    s, e = prop["traj_durations"][0]
    assert (s, e) == (0, 11)
    assert prop["features_list"][0].shape == (12, 8)
