"""Native C++ tracklet ops vs the numpy reference implementations."""

import subprocess


import numpy as np
import pytest

from vrdone_tpu.data import native
from vrdone_tpu.data.datasets import viou_dedup_tracklets


def build_native():
    if not native.have_native():
        subprocess.run(["bash", "native/build.sh"], cwd="/root/repo",
                       check=True)
        native._LIB = None
    return native.have_native()


def random_tracklets(rng, n, video_len=60):
    boxes_list, durations, cat_ids = [], [], []
    for _ in range(n):
        s = int(rng.integers(0, video_len - 8))
        e = int(rng.integers(s + 4, video_len))
        base = rng.uniform(0, 150, 2)
        boxes = np.zeros((e - s, 4), np.float32)
        boxes[:, 0] = base[0] + rng.normal(0, 2, e - s)
        boxes[:, 1] = base[1] + rng.normal(0, 2, e - s)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 40)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 40)
        boxes_list.append(boxes)
        durations.append([s, e])
        cat_ids.append(int(rng.integers(1, 4)))
    return boxes_list, np.asarray(durations, np.int64), \
        np.asarray(cat_ids, np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_viou_dedup_native_vs_numpy(seed):
    assert build_native()
    rng = np.random.default_rng(seed)
    boxes_list, durations, cat_ids = random_tracklets(rng, 24)
    # duplicate a few tracklets so the dedup actually fires
    for i in (0, 5):
        boxes_list.append(boxes_list[i].copy())
        durations = np.vstack([durations, durations[i]])
        cat_ids = np.append(cat_ids, cat_ids[i])

    native_valid = native.viou_dedup(boxes_list, durations, cat_ids, 0.9)

    # force numpy path
    lib = native._LIB
    native._LIB = False
    try:
        numpy_valid = viou_dedup_tracklets(boxes_list, durations, cat_ids,
                                           0.9)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(native_valid, numpy_valid)
    assert not native_valid.all()  # dedup fired on the duplicates


def test_pack_pairs_native_vs_numpy():
    assert build_native()
    rng = np.random.default_rng(4)
    c, t, pack = 12, 32, 6
    feats = [rng.standard_normal((int(rng.integers(4, t + 1)), c))
             .astype(np.float32) for _ in range(4)]
    out, mask = native.pack_pairs(feats, pack, t, c)
    assert out.shape == (pack, t, c) and mask.shape == (pack, t)
    for i, f in enumerate(feats):
        ti = f.shape[0]
        np.testing.assert_array_equal(out[i, :ti], f)
        assert np.abs(out[i, ti:]).max() == 0
        assert mask[i].sum() == ti
    # padded slots: zero features, one valid frame
    for i in range(len(feats), pack):
        assert np.abs(out[i]).max() == 0
        assert mask[i].sum() == 1 and mask[i, 0]
