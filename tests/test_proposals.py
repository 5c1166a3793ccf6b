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
