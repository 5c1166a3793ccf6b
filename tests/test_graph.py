"""Golden parity for the GT VideoGraph builder vs the reference BIG
dataloader (datasets/VidSGG-BIG/dataloaders/dataloader_vidvrd.py)."""

from __future__ import annotations

import json
import sys
import types

import numpy as np
import pytest

from vrdone_tpu.data.graph import VideoGraph, build_video_graph

BIG_PATH = "/root/reference/datasets/VidSGG-BIG"


def _make_anno():
    """Synthetic VidVRD-style annotation: 3 tracklets (one gappy, so the
    interpolation path runs), one trituple annotated as overlapping
    30-frame segments (so merging runs), plus a second trituple."""
    rng = np.random.default_rng(7)

    def bbox():
        x, y = rng.uniform(0, 100, 2)
        w, h = rng.uniform(10, 50, 2)
        return {"xmin": float(x), "ymin": float(y),
                "xmax": float(x + w), "ymax": float(y + h)}

    video_len = 90
    trajectories = [[] for _ in range(video_len)]
    # tid 0: frames 0..89; tid 2: 10..69 with a gap 30..39; tid 5: 20..89
    for f in range(video_len):
        trajectories[f].append({"tid": 0, "bbox": bbox()})
        if 10 <= f < 70 and not (30 <= f < 40):
            trajectories[f].append({"tid": 2, "bbox": bbox()})
        if f >= 20:
            trajectories[f].append({"tid": 5, "bbox": bbox()})
    relations = [
        # one long relation annotated as overlapping pieces
        {"subject_tid": 0, "object_tid": 2, "predicate": "chase",
         "begin_fid": 15, "end_fid": 45},
        {"subject_tid": 0, "object_tid": 2, "predicate": "chase",
         "begin_fid": 30, "end_fid": 60},
        {"subject_tid": 0, "object_tid": 2, "predicate": "chase",
         "begin_fid": 65, "end_fid": 70},
        {"subject_tid": 5, "object_tid": 0, "predicate": "follow",
         "begin_fid": 25, "end_fid": 85},
    ]
    return {
        "width": 640, "height": 360,
        "subject/objects": [
            {"tid": 0, "category": "dog"},
            {"tid": 2, "category": "person"},
            {"tid": 5, "category": "car"},
        ],
        "trajectories": trajectories,
        "relation_instances": relations,
    }


@pytest.fixture()
def ref_big():
    """Import the reference BIG dataloader package, shielding it from this
    repo's / the VrdONE reference's own top-level `utils` package."""
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k.split(".")[0] in ("utils", "dataloaders")}
    # pin the `utils` / `dataloaders` parent packages to BIG's directories
    # (BIG ships them without __init__.py, so the VrdONE reference's
    # regular `dataloaders` package would otherwise always shadow them
    # once other parity tests have put /root/reference on sys.path)
    for name, sub in (("utils", "utils"), ("dataloaders", "dataloaders")):
        pkg = types.ModuleType(name)
        pkg.__path__ = [f"{BIG_PATH}/{sub}"]
        sys.modules[name] = pkg
    if "torchvision" not in sys.modules:
        # utils_func imports torchvision.ops at module scope; the graph
        # code path never touches it (same stub as oracle.py:312-323)
        def _unavail(*a, **k):
            raise RuntimeError("torchvision op unavailable in oracle")
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.nms = tv_ops.roi_align = tv_ops.roi_pool = _unavail
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    # numpy 2.x removed the np.float/np.int aliases the reference uses
    patched = []
    for name, val in (("float", float), ("int", int)):
        if not hasattr(np, name):
            setattr(np, name, val)
            patched.append(name)
    try:
        import dataloaders.dataloader_vidvrd as mod
        yield mod
    finally:
        for k in list(sys.modules):
            if k.split(".")[0] in ("utils", "dataloaders"):
                sys.modules.pop(k)
        sys.modules.update(saved)
        for name in patched:
            delattr(np, name)


@pytest.mark.parametrize("split,max_preds", [("train", 3), ("test", 100)])
def test_video_graph_matches_reference(tmp_path, ref_big, split, max_preds):
    anno = _make_anno()
    (tmp_path / "v1.json").write_text(json.dumps(anno))

    from utils.categories_v2 import vidvrd_CatName2Id, vidvrd_PredName2Id

    stub = types.SimpleNamespace(video_ann_dir=str(tmp_path), split=split,
                                 max_preds=max_preds)
    ref = ref_big.Dataset._get_gt_graph(stub, "v1")

    ours = build_video_graph(anno, "v1", vidvrd_CatName2Id,
                             vidvrd_PredName2Id, split=split,
                             max_preds=max_preds)

    assert ours.video_len == ref.video_len == 90
    assert ours.video_wh == ref.video_wh == (640, 360)
    np.testing.assert_array_equal(ours.traj_cat_ids,
                                  ref.traj_cat_ids.numpy())
    np.testing.assert_array_equal(ours.traj_durations,
                                  ref.traj_durations.numpy())
    np.testing.assert_array_equal(ours.pred_cat_ids,
                                  ref.pred_cat_ids.numpy())
    np.testing.assert_allclose(ours.pred_durations,
                               ref.pred_durations.numpy())
    np.testing.assert_allclose(ours.adj, ref.adj_matrix.numpy())
    assert ours.num_preds == ref.num_preds
    assert ours.num_trajs == ref.num_trajs

    # padded boxes row-for-row vs the reference's ragged list (the gappy
    # tid-2 row exercises interpolation parity)
    for i, ref_boxes in enumerate(ref.traj_bboxes):
        nf = int(ours.traj_n_frames[i])
        assert nf == ref_boxes.shape[0]
        np.testing.assert_allclose(ours.traj_boxes[i, :nf],
                                   ref_boxes.numpy(), atol=1e-4)
        assert (ours.traj_boxes[i, nf:] == 0).all()


def test_video_graph_merge_and_clip():
    """Hand-derived: the 'chase' segments [15,45)+[30,60) merge to
    [15,60); [65,70) stays; train clipping keeps insertion order."""
    anno = _make_anno()
    cat = {"dog": 1, "person": 2, "car": 3}
    pred = {"chase": 1, "follow": 2}
    g = build_video_graph(anno, "v1", cat, pred, split="test")
    assert isinstance(g, VideoGraph)
    np.testing.assert_array_equal(g.pred_cat_ids, [1, 1, 2])
    np.testing.assert_allclose(g.pred_durations,
                               [[15, 59], [65, 69], [25, 84]])
    # subject one-hot: chase rows point at traj 0, follow at traj 2
    np.testing.assert_allclose(g.adj[0, :, 0], [1, 1, 0])
    np.testing.assert_allclose(g.adj[1, :, 1], [1, 1, 0])
    np.testing.assert_allclose(g.adj[0, 2], [0, 0, 1])
    np.testing.assert_allclose(g.adj[1, 2], [1, 0, 0])

    g2 = build_video_graph(anno, "v1", cat, pred, split="train",
                           max_preds=2)
    assert g2.num_preds == 2
    np.testing.assert_array_equal(g2.pred_cat_ids, [1, 1])
    assert g2.adj.shape == (2, 2, 3)
