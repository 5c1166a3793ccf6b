"""Proposal repackaging utilities."""

import os
import pickle

import numpy as np

from vrdone_tpu.data.proposals import (build_traj_proposal,
                                       linear_interpolate_boxes,
                                       merge_durations,
                                       repackage_monolithic_pickle)


def test_linear_interpolation():
    fids = np.array([2, 4, 7])
    boxes = np.array([[0, 0, 10, 10], [2, 2, 12, 12], [8, 8, 18, 18]],
                     np.float32)
    dense_ids, dense = linear_interpolate_boxes(fids, boxes)
    np.testing.assert_array_equal(dense_ids, np.arange(2, 8))
    np.testing.assert_allclose(dense[1], [1, 1, 11, 11])   # fid 3: midpoint
    np.testing.assert_allclose(dense[3], [4, 4, 14, 14])   # fid 5: 1/3 to 7


def test_merge_durations():
    assert merge_durations([(0, 5), (3, 8), (10, 12)]) == [(0, 8), (10, 12)]
    assert merge_durations([(5, 6), (0, 2)]) == [(0, 2), (5, 6)]


def test_build_traj_proposal_contract():
    rng = np.random.default_rng(0)
    tracklets = []
    for i in range(3):
        fids = np.sort(rng.choice(np.arange(0, 30), size=10, replace=False))
        tracklets.append({
            "category_id": i + 1,
            "score": float(rng.random()),
            "frame_ids": fids,
            "boxes": rng.uniform(0, 100, (10, 4)).astype(np.float32),
            "features": rng.standard_normal((10, 16)).astype(np.float32),
        })
    prop = build_traj_proposal("v0", tracklets, (320, 240), 30,
                               max_proposal=2, dim_feat=16)
    assert prop["num_proposals"] == 2  # clipped to max_proposal
    # score-sorted
    assert prop["scores"][0] >= prop["scores"][1]
    for i in range(2):
        s, e = prop["traj_durations"][i]
        assert len(prop["bboxes_list"][i]) == e - s + 1
        assert len(prop["features_list"][i]) == e - s + 1


def test_repackage_monolithic(tmp_path):
    blob = {"0001_v1": {"num_proposals": 3, "video_wh": (10, 10)},
            "0002_v2": {"num_proposals": 1, "video_wh": (20, 20)}}
    src = os.path.join(tmp_path, "mono.pkl")
    with open(src, "wb") as f:
        pickle.dump(blob, f)
    out = os.path.join(tmp_path, "per_video")
    n = repackage_monolithic_pickle(src, out)
    assert n == 2
    with open(os.path.join(out, "0001_v1.pkl"), "rb") as f:
        d = pickle.load(f)
    assert d["traj_proposal"]["num_proposals"] == 3


def test_resnet_converter_shapes():
    """Fabricated torch-style state dict transplants into our flax ResNet."""
    import jax
    import jax.numpy as jnp
    from tools.convert_torch_resnet import convert
    from vrdone_tpu.models.resnet import ResNetC4

    layers = (1, 1, 1, 1)
    rng = np.random.default_rng(0)

    sd = {}

    def add_conv(name, cout, cin, k):
        sd[name] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)

    def add_bn(prefix, c):
        sd[prefix + ".weight"] = np.ones(c, np.float32)
        sd[prefix + ".bias"] = np.zeros(c, np.float32)
        sd[prefix + ".running_mean"] = np.zeros(c, np.float32)
        sd[prefix + ".running_var"] = np.ones(c, np.float32)

    add_conv("conv1.weight", 64, 3, 7)
    add_bn("bn1", 64)
    specs = [("layer1", 64, 64), ("layer2", 128, 256), ("layer3", 256, 512),
             ("layer4", 512, 1024)]
    for lname, planes, cin in specs:
        pre = f"{lname}.0"
        add_conv(pre + ".conv1.weight", planes, cin, 1)
        add_bn(pre + ".bn1", planes)
        add_conv(pre + ".conv2.weight", planes, planes, 3)
        add_bn(pre + ".bn2", planes)
        add_conv(pre + ".conv3.weight", planes * 4, planes, 1)
        add_bn(pre + ".bn3", planes * 4)
        add_conv(pre + ".downsample.0.weight", planes * 4, cin, 1)
        add_bn(pre + ".downsample.1", planes * 4)

    converted = convert(sd, layers)
    model = ResNetC4(layers[:3])
    x = jnp.zeros((1, 64, 64, 3))
    ref_params = model.init(jax.random.key(0), x)["params"]
    # structures must match exactly (so transplant is a drop-in)
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    got_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                 jax.tree_util.tree_flatten_with_path(converted["c4"])[0]}
    assert ref_paths == got_paths
    out = model.apply({"params": converted["c4"]}, x)
    assert out.shape == (1, 4, 4, 1024)


# ---------------------------------------------------------------------------
# Raw per-frame tracker rebuild (reference prepare_vidvrd_proposal.py)
# ---------------------------------------------------------------------------

import sys
import types

import pytest

from vrdone_tpu.data.proposals import (rebuild_raw_proposal,
                                       rebuild_vidvrd_proposals)

BIG_PATH = "/root/reference/datasets/VidSGG-BIG"
DIM = 7


def _raw_rows(rng):
    """Synthetic raw tracker rows: long + short forms, a frame gap with a
    zero-feature (short-form) boundary row, a majority-vote category
    conflict, a below-min-frames traj, a no-votes traj, and distinct
    scores so the descending sort + max_proposal clip are exercised."""
    rows = []

    def long_row(fid, tid, cat, conf):
        tb = [10.0 + fid, 20.0, 30.0, 40.0]           # tracker xywh
        db = [12.0 + fid, 22.0, 28.0, 38.0]           # detector xywh
        feat = rng.standard_normal(DIM).round(3).tolist()
        return [float(fid), float(tid)] + tb + [conf, float(cat)] + db + feat

    def short_row(fid, tid):
        tb = [11.0 + fid, 21.0, 29.0, 39.0]
        return [float(fid), float(tid)] + tb

    # tid 0: frames 0-2 long (cat 3), frame 3 short (zero feature),
    # gap, frames 6-8 long (cat 3, one vote cat 2) -> interpolation
    # across the gap with a zero-feature boundary
    for f in range(3):
        rows.append(long_row(f, 0, 3, 0.9 - 0.01 * f))
    rows.append(short_row(3, 0))
    rows.append(long_row(6, 0, 2, 0.8))
    rows.append(long_row(7, 0, 3, 0.7))
    rows.append(long_row(8, 0, 3, 0.6))
    # tid 1: 5 consecutive long rows, higher mean score (sorts first)
    for f in range(2, 7):
        rows.append(long_row(f, 1, 4, 0.95))
    # tid 2: only 2 frames -> below min_frames_th, dropped
    rows.append(long_row(0, 2, 5, 0.99))
    rows.append(long_row(1, 2, 5, 0.99))
    # tid 3: short rows only -> no category votes, dropped
    for f in range(5):
        rows.append(short_row(f, 3))
    # tid 4: 5 long rows, lowest score -> clipped by max_proposal=2
    for f in range(5):
        rows.append(long_row(f, 4, 6, 0.1))
    return rows


@pytest.fixture()
def ref_prepare():
    """Import the reference prepare_vidvrd_proposal module with the same
    package shielding as tests/test_graph.py's ref_big fixture."""
    import importlib.util

    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k.split(".")[0] in ("utils", "dataloaders")}
    for name, sub in (("utils", "utils"), ("dataloaders", "dataloaders")):
        pkg = types.ModuleType(name)
        pkg.__path__ = [f"{BIG_PATH}/{sub}"]
        sys.modules[name] = pkg
    if "torchvision" not in sys.modules:
        def _unavail(*a, **k):
            raise RuntimeError("torchvision op unavailable in oracle")
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.nms = tv_ops.roi_align = tv_ops.roi_pool = _unavail
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    patched = []
    for name, val in (("float", float), ("int", int)):
        if not hasattr(np, name):
            setattr(np, name, val)
            patched.append(name)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_prepare_vidvrd", f"{BIG_PATH}/prepare_vidvrd_proposal.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k in list(sys.modules):
            if k.split(".")[0] in ("utils", "dataloaders",
                                   "ref_prepare_vidvrd"):
                sys.modules.pop(k)
        sys.modules.update(saved)
        for name in patched:
            delattr(np, name)


def test_rebuild_raw_proposal_matches_reference(tmp_path, ref_prepare):
    rng = np.random.default_rng(11)
    rows = _raw_rows(rng)
    arr = np.empty(len(rows), dtype=object)
    for i, r in enumerate(rows):
        arr[i] = r
    np.save(tmp_path / "v1.npy", arr, allow_pickle=True)

    stub = types.SimpleNamespace(proposal_dir=str(tmp_path),
                                 dim_boxfeature=DIM, min_frames_th=3,
                                 max_proposal=2)
    ref = ref_prepare.VidVRD._get_proposal(stub, "v1")

    got = rebuild_raw_proposal("v1", np.load(tmp_path / "v1.npy",
                                             allow_pickle=True),
                               dim_boxfeature=DIM, min_frames_th=3,
                               max_proposal=2)

    assert got["num_proposals"] == ref.num_proposals == 2
    np.testing.assert_array_equal(got["cat_ids"], ref.cat_ids.numpy())
    np.testing.assert_allclose(got["scores"], ref.scores.numpy(),
                               rtol=1e-6)
    np.testing.assert_array_equal(got["traj_durations"],
                                  ref.traj_durations.numpy())
    assert got["dim_feat"] == ref.dim_feat == DIM
    for ours, theirs in zip(got["bboxes_list"], ref.bboxes_list):
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-6,
                                   atol=1e-6)
    for ours, theirs in zip(got["features_list"], ref.features_list):
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-6,
                                   atol=1e-6)


def test_rebuild_vidvrd_proposals_end_to_end(tmp_path):
    """Driver: raw npy + annotation JSON -> {"traj_proposal","gt_graph"}
    pickle loadable by VidVRDDataset._prepare_test's proposal reader."""
    import json

    rng = np.random.default_rng(5)
    raw_dir = tmp_path / "raw"
    ann_dir = tmp_path / "annotations" / "test"
    raw_dir.mkdir()
    ann_dir.mkdir(parents=True)

    rows = _raw_rows(rng)
    arr = np.empty(len(rows), dtype=object)
    for i, r in enumerate(rows):
        arr[i] = r
    np.save(raw_dir / "v1.npy", arr, allow_pickle=True)

    trajectories = [[{"tid": 0, "bbox": {"xmin": 1.0, "ymin": 2.0,
                                         "xmax": 30.0, "ymax": 40.0}}]
                    for _ in range(10)]
    anno = {"video_id": "v1", "width": 320, "height": 240,
            "frame_count": 10,
            "subject/objects": [{"tid": 0, "category": "dog"}],
            "trajectories": trajectories, "relation_instances": []}
    (ann_dir / "v1.json").write_text(json.dumps(anno))

    n = rebuild_vidvrd_proposals(str(raw_dir), str(tmp_path / "annotations"),
                                 str(tmp_path / "out"), split="test",
                                 dim_boxfeature=DIM, min_frames_th=3,
                                 max_proposal=2)
    assert n == 1
    with open(tmp_path / "out" / "v1.pkl", "rb") as f:
        blob = pickle.load(f)
    prop = blob["traj_proposal"]
    assert prop["video_len"] == 10 and prop["video_wh"] == (320, 240)
    assert prop["num_proposals"] == 2
    assert blob["gt_graph"]["video_name"] == "v1"
    # idempotent skip on rerun
    assert rebuild_vidvrd_proposals(
        str(raw_dir), str(tmp_path / "annotations"),
        str(tmp_path / "out"), split="test", dim_boxfeature=DIM) == 0
