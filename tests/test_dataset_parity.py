"""Dataset-layer golden tests: our numpy datasets vs the reference torch
dataloaders on an identical synthetic corpus (feat_stride=1, short
sequences, so no RNG enters the comparison)."""

import os

import numpy as np
import pytest

from tests import oracle  # inserts /root/reference into sys.path
from tests.synth_corpus import (VIS_DIM, make_vidvrd_corpus,
                                make_vidvrd_test_corpus)
from vrdone_tpu.data.datasets import VidVRDDataset
from vrdone_tpu.data import batching


def base_config(root, dirs, split, extra):
    cfg = {
        "ann_dir": dirs["ann_dir"],
        "cache_tag": "TEST",
        "cache_dir": os.path.join(root, "cache"),
        "feat_stride": 1,
        "max_seq_len": 48,
        "split": split,
    }
    cfg.update(extra)
    return cfg


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vidvrd"))
    dirs = make_vidvrd_corpus(root, n_videos=3, n_frames=40, seed=0)
    dirs.update(make_vidvrd_test_corpus(root, n_videos=2, seed=1))
    dirs["root"] = root
    return dirs


def test_train_parity(corpus):
    root = corpus["root"]
    extra = {
        "cut_max_preds": True,
        "proposal_max_preds": 9,
        "num_pairs": 4,
        "gt_boxfeatures_dir": corpus["gt_boxfeatures_dir"],
    }
    ours_cfg = base_config(root, corpus, "train", dict(extra))
    ours_cfg["cache_dir"] = os.path.join(root, "cache_ours")
    ours = VidVRDDataset(ours_cfg)

    from dataloaders.vidvrd import VidVRD as RefVidVRD
    ref_cfg = base_config(root, corpus, "train", dict(extra))
    ref_cfg["cache_dir"] = os.path.join(root, "cache_ref")
    ref = RefVidVRD(ref_cfg)

    assert ours.video_name_list == ref.video_name_list
    assert [tuple(x) for x in ours.video_num_pairs] == \
        [tuple(x) for x in ref.video_num_pairs]
    # policy structures identical
    assert len(ours.policy) == len(ref.policy)
    for a, b in zip(ours.policy, ref.policy):
        assert [(v, tuple(r)) for v, r in a] == [(v, tuple(r)) for v, r in b]

    rng = np.random.default_rng(0)
    for name in ours.video_name_list:
        ours_pairs = ours.train_pairs(ours._load_video(name), None, rng)
        ref_out = ref._train_getitem(ref.video_features[name], None)
        if not ours_pairs:
            assert len(ref_out) == 0
            continue
        assert len(ours_pairs) == len(ref_out["so_features_list"])
        for i, pair in enumerate(ours_pairs):
            ref_feat = oracle.t2n(ref_out["so_features_list"][i]).T  # (T, C)
            np.testing.assert_allclose(pair["so_feat"], ref_feat,
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_array_equal(
                pair["preds"], oracle.t2n(ref_out["preds_list"][i]))
            np.testing.assert_array_equal(
                pair["segs"], oracle.t2n(ref_out["segs_list"][i]))
            np.testing.assert_array_equal(
                pair["masks"], oracle.t2n(ref_out["masks_list"][i]))


def test_test_parity(corpus):
    root = corpus["root"]
    extra = {
        "proposal_min_frames": 2,
        "random_stride": False,
        "stride_offset": 0,
        "info_dir": corpus["info_dir"],
        "test_boxfeatures_dir": corpus["test_boxfeatures_dir"],
    }
    ours_cfg = base_config(root, corpus, "test", dict(extra))
    ours_cfg["cache_dir"] = os.path.join(root, "cache_ours")
    ours = VidVRDDataset(ours_cfg)

    from dataloaders.vidvrd import VidVRD as RefVidVRD
    ref_cfg = base_config(root, corpus, "test", dict(extra))
    ref_cfg["cache_dir"] = os.path.join(root, "cache_ref")
    ref = RefVidVRD(ref_cfg)

    for idx, name in enumerate(ours.video_name_list):
        ours_item = ours.get_test_item(idx)
        ref_item = ref._test_getitem(ref.video_features[name])
        if ours_item is None:
            assert len(ref_item) == 0
            continue
        np.testing.assert_array_equal(ours_item["sids"],
                                      oracle.t2n(ref_item["sids"]))
        np.testing.assert_array_equal(ours_item["oids"],
                                      oracle.t2n(ref_item["oids"]))
        np.testing.assert_array_equal(ours_item["so_offset"],
                                      oracle.t2n(ref_item["so_offset"]))
        assert len(ours_item["so_features_list"]) == \
            len(ref_item["so_features_list"])
        for a, b in zip(ours_item["so_features_list"],
                        ref_item["so_features_list"]):
            np.testing.assert_allclose(a, oracle.t2n(b).T, atol=1e-5,
                                       rtol=1e-5)


def test_pack_train_batch(corpus):
    root = corpus["root"]
    cfg = base_config(root, corpus, "train", {
        "cut_max_preds": True,
        "proposal_max_preds": 9,
        "num_pairs": 4,
        "gt_boxfeatures_dir": corpus["gt_boxfeatures_dir"],
        "cache_dir": os.path.join(root, "cache_ours"),
    })
    ds = VidVRDDataset(cfg)
    rng = np.random.default_rng(3)
    pairs = ds.get_train_item(0, rng)
    c = 2 * VIS_DIM + 5 + 16
    batch = batching.pack_train_batch(pairs, pack_size=8, max_seq_len=48,
                                      num_gt=9, feat_dim=c)
    assert batch["feats"].shape == (8, 48, c)
    assert batch["gt_masks"].shape == (8, 9, 48)
    n = len(pairs[:8])
    assert batch["item_valid"].sum() == n
    for i, pair in enumerate(pairs[:8]):
        t = pair["so_feat"].shape[0]
        assert batch["seq_mask"][i].sum() == t
        np.testing.assert_array_equal(batch["feats"][i, :t], pair["so_feat"])


def test_eval_bucketing():
    lengths = np.array([10, 96, 97, 200, 500, 1000])
    out = batching.eval_bucket_lengths(lengths, max_seq_len=96,
                                       max_div_factor=48)
    assert out[0] == 96 and out[1] == 96
    assert out[2] == 192 and out[3] == 384
    assert all(o % 48 == 0 for o in out)
    assert all(o >= l for o, l in zip(out, lengths))
