"""Evaluate a VrdONE-TPU relation detector.

TPU-native counterpart of the reference eval entry (reference
eval.py:41-195): multi-checkpoint sweep, EMA weights, per-video bucketed
inference, helper-format scoring.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import jax

from vrdone_tpu.config import (InferenceConfig, load_yaml_config,
                               model_config_from_yaml)
from vrdone_tpu.data.datasets import VidORDataset, VidVRDDataset
from vrdone_tpu.eval.convert import build_groundtruth, to_eval_format
from vrdone_tpu.eval.decode import InferenceRunner, infer_video
from vrdone_tpu.eval.metrics import relation_metrics
from vrdone_tpu.train.checkpoint import restore_params_for_eval
from vrdone_tpu.utils.logging import setup_logger

METRIC_KEYS = ["RelDet_mAP", "RelDet_AR@50", "RelDet_AR@100",
               "RelTag_AP@1", "RelTag_AP@5", "RelTag_AP@10"]


def parse_args():
    p = argparse.ArgumentParser(description="Test a Video Relation Detector")
    p.add_argument("--data_name", type=str, choices=["vidor", "vidvrd"])
    p.add_argument("--cfg_path", type=str, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--exp_dir", type=str, required=True)
    p.add_argument("--ckpt_path", type=str)
    p.add_argument("--eval_exp_dir", default=False, action="store_true")
    p.add_argument("--scale", default=None, type=int)
    p.add_argument("--eval_start_epoch", type=int, default=3)
    p.add_argument("--epochs", type=int)
    p.add_argument("--eval_file_name", type=str, default="eval")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--save_result", default=False, action="store_true")
    p.add_argument("--multihost", action="store_true", default=False,
                   help="call jax.distributed.initialize(); test videos "
                        "are strided across processes and predictions "
                        "merged before scoring (the reference evaluates "
                        "on a single GPU, reference eval.py:83)")
    p.add_argument("--eval_dp", type=int, default=1,
                   help="shard each bucketed pair batch over this many "
                        "local devices (data-parallel eval forward)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        jax.distributed.initialize()
    config = load_yaml_config(args.cfg_path)
    if args.epochs is not None:
        config["training_config"]["training_epoch"] = args.epochs
    config["training_config"]["eval_start_epoch"] = args.eval_start_epoch
    config["inference_config"]["topk"] = args.topk
    config["dataset_config"].update(config["test_dataset_config"])
    model_cfg = model_config_from_yaml(config)
    ic = config["inference_config"]
    infer_cfg = InferenceConfig(
        topk=ic["topk"], feat_stride=ic["feat_stride"],
        pred_min_frames=ic["pred_min_frames"], n_max_pair=ic["n_max_pair"],
        viou_th=ic["viou_th"], max_so_pair=model_cfg.max_so_pair)

    os.makedirs(args.exp_dir, exist_ok=True)
    logger = setup_logger("Test", os.path.join(args.exp_dir, "logfile"),
                          distributed_rank=jax.process_index(),
                          filename=args.eval_file_name + "_log.json")
    logger.info(f"JAX {jax.__version__}, devices: {jax.devices()}")

    if args.data_name == "vidor":
        dataset = VidORDataset(config["dataset_config"], args.scale)
    else:
        dataset = VidVRDDataset(config["dataset_config"])

    # ground truth (built directly from annotations; cached as json)
    gt_path = config["prepare_gt_config"]["gt_relations_path"]
    if gt_path and os.path.exists(gt_path):
        logger.info(f"Loading GT from {gt_path}")
        with open(gt_path) as f:
            gt_relations = json.load(f)
    else:
        logger.info("Building GT from annotations...")
        gt_relations = build_groundtruth(
            config["dataset_config"]["ann_dir"], dataset.split,
            args.data_name)
        # cache write: rank 0 only, atomic tmp+rename — concurrent
        # multihost writers interleaving json.dump on shared storage
        # would corrupt the cache for the next run
        if gt_path and jax.process_index() == 0:
            os.makedirs(os.path.dirname(gt_path) or ".", exist_ok=True)
            tmp_path = gt_path + f".tmp.{os.getpid()}"
            with open(tmp_path, "w") as f:
                json.dump(gt_relations, f)
            os.replace(tmp_path, gt_path)

    ckpt_paths = []
    if args.eval_exp_dir:
        tc = config["training_config"]
        for epoch in range(args.eval_start_epoch - 1, tc["training_epoch"],
                           tc.get("save_interval", 1)):
            ckpt_paths.append(os.path.join(
                args.exp_dir, f"model_epoch_{epoch + 1}_{args.data_name}.ckpt"))
    else:
        assert args.ckpt_path
        ckpt_paths.append(args.ckpt_path)

    c = 2 * model_cfg.visual_dim + model_cfg.bbox_so_dim \
        + 2 * model_cfg.bbox_entity_dim
    if model_cfg.with_clip_feature:
        c += 2 * model_cfg.clip_dim

    mesh = None
    if args.eval_dp > 1:
        from vrdone_tpu.parallel.mesh import make_mesh
        devs = jax.local_devices()
        assert args.eval_dp <= len(devs), (args.eval_dp, devs)
        mesh = make_mesh(n_dp=args.eval_dp, devices=devs[:args.eval_dp])
        logger.info(f"Eval forward sharded over {args.eval_dp} devices")

    all_results = defaultdict(list)
    for ckpt_idx, ckpt_path in enumerate(ckpt_paths):
        logger.info(f"Loading checkpoint from: {ckpt_path}")
        params = restore_params_for_eval(ckpt_path, None)
        runner = InferenceRunner(model_cfg, params, infer_cfg, c, mesh=mesh)

        predict_relations = {}
        for idx in range(dataset.num_test_items()):
            # stride videos across processes (reference equivalent:
            # MEGA's sharded inference, mega_core/engine/inference.py;
            # the relation eval itself is single-GPU in the reference)
            if idx % jax.process_count() != jax.process_index():
                continue
            item = dataset.get_test_item(idx)
            if item is None:
                continue
            triplets = infer_video(runner, item)
            if triplets is None:
                continue
            predict_relations.update(
                to_eval_format(args.data_name, item["video_name"], triplets))
        if jax.process_count() > 1:
            from vrdone_tpu.parallel.comm import accumulate_predictions
            predict_relations = accumulate_predictions(predict_relations)

        if len(predict_relations) < 1:
            logger.info("None of valid prediction.")
            results = {k: 0.0 for k in METRIC_KEYS}
        elif jax.process_index() != 0:
            # scoring (vIoU matching + AP over the whole test set) is the
            # most expensive host step; ranks > 0 have silent loggers and
            # their results go nowhere — skip the duplicated work
            results = {k: 0.0 for k in METRIC_KEYS}
        else:
            results = relation_metrics(gt_relations, predict_relations,
                                       viou_threshold=infer_cfg.viou_th)
        for k, v in results.items():
            all_results[k].append(v)
            logger.info(f"{k}: {v:.6f}")

        if args.save_result and jax.process_index() == 0:
            save_path = os.path.join(
                args.exp_dir,
                f"predicted_relations_topk{args.topk}_"
                f"epoch{ckpt_idx + args.eval_start_epoch}.json")
            with open(save_path, "w") as f:
                json.dump(predict_relations, f)
            logger.info(f"Predicted relations saved at {save_path}")

    if len(ckpt_paths) > 1:
        # Reference protocol (reference eval.py:182-192): for each metric
        # key, locate the sweep epoch with that key's maximum and report
        # the FULL metric row of that epoch (RelDet_mAP is first, so the
        # first block is the headline best-epoch row).
        logger.info("-" * 90)
        interval = config["training_config"].get("save_interval", 1)
        for key in METRIC_KEYS:
            best = all_results[key].index(max(all_results[key]))
            epoch = best * interval + args.eval_start_epoch
            logger.info(f"Best {key} result is in epoch {epoch}")
            for k, vs in all_results.items():
                logger.info(f"{k}: {vs[best]:.6f}")
        logger.info("All of the results:")
        logger.info(f"{dict(all_results)}")
    logger.info("Eval done.")


if __name__ == "__main__":
    main()
