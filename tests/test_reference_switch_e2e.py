"""The complete switcher story: a reference-format torch checkpoint is
converted with tools/convert_reference_checkpoint.py and evaluated with
eval.py; the saved predictions must carry the same triplets the reference
model produces on the same videos."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests import oracle
from tests.synth_corpus import VIS_DIM, make_vidvrd_test_corpus
from tests.test_cli_e2e import tiny_yaml
from tests.test_model_parity import small_cfg, make_models


@pytest.mark.slow
def test_reference_checkpoint_through_eval_cli(tmp_path):
    import torch
    root = str(tmp_path)
    dirs = make_vidvrd_test_corpus(root, n_videos=2, seed=11)
    dirs["ann_dir"] = os.path.join(root, "annotations")
    # train-side dirs unused at eval; point at test dirs to satisfy config
    dirs["gt_boxfeatures_dir"] = dirs["test_boxfeatures_dir"]

    cfg_yaml = tiny_yaml(root, dirs)
    # align model width with the converter fixture (embd 32, queries 5,
    # predictor classes 20 like small_cfg)
    mc = small_cfg()
    cfg_yaml["model_config"].update({
        "embd_dim": mc.embd_dim, "num_classes": mc.num_classes,
        "backbone_arch": list(mc.backbone_arch),
        "max_seq_len": mc.max_seq_len, "n_mha_win_size": mc.n_mha_win_size,
        "fpn_dim": mc.fpn_dim, "visual_dim": VIS_DIM,
        "with_fuzzy": False, "scale_range": None,
    })
    cfg_yaml["model_config"]["predictor"].update({
        "n_input": mc.predictor.n_input, "n_embd": mc.predictor.n_embd,
        "n_hidden": mc.predictor.n_hidden,
        "num_queries": mc.predictor.num_queries,
        "num_classes": mc.predictor.num_classes,
        "num_layers": mc.predictor.num_layers,
    })
    cfg_yaml["dataset_config"]["max_seq_len"] = mc.max_seq_len
    cfg_yaml["inference_config"]["topk"] = 3
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_yaml, f)

    # reference-format checkpoint from a randomly-initialised reference model
    cfg = small_cfg(visual_dim=VIS_DIM, max_so_pair=4)
    tm, _, _ = make_models(cfg, seed=11)
    tm.eval()
    pth = os.path.join(root, "model_epoch_5_vidvrd.pth")
    torch.save({"model_state_dict": tm.state_dict(),
                "model_state_dict_ema": tm.state_dict(),
                "batch_size": 6, "crt_epoch": 5}, pth)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    ckpt_dir = os.path.join(root, "converted.ckpt")
    r = subprocess.run(
        [sys.executable, "tools/convert_reference_checkpoint.py",
         "--torch_ckpt", pth, "--out", ckpt_dir],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    exp = os.path.join(root, "exp")
    r = subprocess.run(
        [sys.executable, "eval.py", "--data_name", "vidvrd",
         "--cfg_path", cfg_path, "--exp_dir", exp,
         "--ckpt_path", ckpt_dir, "--topk", "3", "--save_result",
         "--eval_start_epoch", "1"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]

    pred_files = [f for f in os.listdir(exp) if f.startswith("predicted")]
    assert pred_files
    with open(os.path.join(exp, pred_files[0])) as f:
        ours = json.load(f)

    # reference expectations on the same items
    tm._config_eval({"topk": 3, "n_max_pair": 200, "feat_stride": 1,
                     "pred_min_frames": 2})
    from vrdone_tpu.data.datasets import VidVRDDataset
    ds = VidVRDDataset({
        "ann_dir": dirs["ann_dir"], "cache_tag": "SW",
        "cache_dir": os.path.join(root, "cache_sw"), "feat_stride": 1,
        "max_seq_len": mc.max_seq_len, "split": "test",
        "proposal_min_frames": 2, "random_stride": False,
        "stride_offset": 0, "info_dir": dirs["info_dir"],
        "test_boxfeatures_dir": dirs["test_boxfeatures_dir"]})
    n_checked = 0
    for idx in range(ds.num_test_items()):
        item = ds.get_test_item(idx)
        if item is None:
            continue
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
        vid = item["video_name"]
        if theirs is None:
            assert vid not in ours or not ours[vid]
            continue
        n_checked += 1
        from vrdone_tpu.data.category import get_vocab
        ent, prd = get_vocab("vidvrd")
        ref_keys = sorted(
            ((ent[t[0]], prd[t[1]], ent[t[2]]), tuple(d))
            for t, d in zip(theirs["triplets"], theirs["pred_durations"]))
        our_keys = sorted(
            (tuple(rec["triplet"]), tuple(rec["duration"]))
            for rec in ours[vid])
        assert our_keys == ref_keys, vid
    assert n_checked > 0
