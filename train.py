"""Train a VrdONE-TPU relation detector.

TPU-native counterpart of the reference train entry (reference
train.py:38-232): same CLI flags and YAML configs, but the runtime is a
jax.sharding mesh (dp axis over all local devices) instead of
torchrun+DDP — launch ONE process per host; XLA handles the collectives.

Usage:
    python train.py --data_name vidvrd --cfg_path configs/vidvrd.yaml \
        --exp_dir experiments/vidvrd
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import yaml

from vrdone_tpu.config import load_yaml_config, model_config_from_yaml
from vrdone_tpu.data.datasets import VidORDataset, VidVRDDataset
from vrdone_tpu.data.loader import TrainLoader
from vrdone_tpu.parallel.mesh import make_mesh, shard_batch
from vrdone_tpu.train import checkpoint as ckpt
from vrdone_tpu.train.loop import (commit_state, create_train_state,
                                   make_jitted_train_step)
from vrdone_tpu.utils.logging import AverageMeter, setup_logger


def parse_args():
    p = argparse.ArgumentParser(description="Train a Video Relation Detector")
    p.add_argument("--data_name", type=str, choices=["vidor", "vidvrd"])
    p.add_argument("--cfg_path", type=str, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--exp_dir", type=str, required=True)
    p.add_argument("--from_checkpoint", action="store_true", default=False)
    p.add_argument("--ckpt_path", type=str)
    p.add_argument("--scale", default=None, type=int)
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=[None, "float32", "bfloat16"])
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize the forward in the backward")
    p.add_argument("--remat_policy", type=str, default=None,
                   choices=[None, "full", "dots"],
                   help="remat policy (dots = save matmul outputs, "
                        "recompute elementwise chains)")
    p.add_argument("--n_dp", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--n_sp", type=int, default=1,
                   help="sequence-parallel mesh size (shards the time "
                        "axis of long-video batches over the mesh; "
                        "n_dp x n_sp devices are used)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write an xplane profiler trace of steps 10-20")
    p.add_argument("--multihost", action="store_true", default=False,
                   help="call jax.distributed.initialize() for multi-host "
                        "pods (coordinator from env, cf. torchrun env vars)")
    p.add_argument("--auto_resume", action="store_true", default=False,
                   help="resume from <exp_dir>/model_last.ckpt if present")
    return p.parse_args()


def feat_channels(model_cfg) -> int:
    c = 2 * model_cfg.visual_dim + model_cfg.bbox_so_dim \
        + 2 * model_cfg.bbox_entity_dim
    if model_cfg.with_clip_feature:
        c += 2 * model_cfg.clip_dim
    return c


def main():
    args = parse_args()
    if args.multihost:
        jax.distributed.initialize()
    config = load_yaml_config(args.cfg_path)
    config["training_config"]["seed"] = args.seed
    config["dataset_config"].update(config["training_dataset_config"])
    if args.compute_dtype:
        config["model_config"]["compute_dtype"] = args.compute_dtype
    if args.remat:
        config["model_config"]["remat"] = True
    if args.remat_policy:
        config["model_config"]["remat_policy"] = args.remat_policy
    model_cfg = model_config_from_yaml(config)

    os.makedirs(args.exp_dir, exist_ok=True)
    logger = setup_logger("Train", os.path.join(args.exp_dir, "logfile"),
                          filename="train_log.json")
    logger.info(f"JAX {jax.__version__}, devices: {jax.devices()}")
    logger.info(f"Config:\n{json.dumps(config, indent=4)}")
    with open(os.path.join(args.exp_dir, "config.yaml"), "w") as f:
        f.write(yaml.dump(config, indent=2, allow_unicode=True))

    tc = config["training_config"]
    if args.data_name == "vidor":
        dataset = VidORDataset(config["dataset_config"], args.scale)
    else:
        dataset = VidVRDDataset(config["dataset_config"])

    batch_size = tc["batch_size"]
    num_pairs = config["training_dataset_config"]["num_pairs"]
    pack_size = batch_size * num_pairs
    num_gt = config["training_dataset_config"]["proposal_max_preds"]
    fdim = feat_channels(model_cfg)
    loader = TrainLoader(dataset, batch_size, pack_size,
                         model_cfg.max_seq_len, num_gt, fdim,
                         seed=args.seed,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
    steps_per_epoch = loader.steps_per_epoch()
    logger.info(f"Pairs per step: {pack_size}; steps/epoch: {steps_per_epoch}")

    mesh = make_mesh(n_dp=args.n_dp, n_sp=args.n_sp)
    logger.info(f"Mesh: {mesh}")

    sample = {
        "feats": jnp.zeros((pack_size, model_cfg.max_seq_len, fdim),
                           jnp.float32),
        "seq_mask": jnp.ones((pack_size, model_cfg.max_seq_len), bool),
    }
    state, schedule = create_train_state(
        model_cfg, tc, steps_per_epoch, jax.random.key(args.seed), sample)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.info(f"Number of model parameters: {n_params}")

    step_fn = make_jitted_train_step(model_cfg, mesh)
    state = commit_state(state, mesh)

    crt_epoch = 0
    if args.auto_resume and not args.from_checkpoint:
        last = os.path.join(args.exp_dir, "model_last.ckpt")
        if os.path.exists(last):
            args.from_checkpoint = True
            args.ckpt_path = last
    if args.from_checkpoint:
        state, crt_epoch, ckpt_bs = ckpt.restore_checkpoint(args.ckpt_path,
                                                            state)
        if ckpt_bs != batch_size:
            logger.warning(f"batch_size from checkpoint not match: "
                           f"{batch_size} != {ckpt_bs}")
        logger.info(f"Resumed from {args.ckpt_path} at epoch {crt_epoch}")

    rng = jax.random.key(args.seed)
    training_epoch = tc["training_epoch"]
    log_interval = tc.get("log_interval", 20)
    save_interval = tc.get("save_interval", 1)
    eval_start_epoch = tc.get("eval_start_epoch", 3)

    total_steps = crt_epoch * steps_per_epoch
    try:
        for epoch in range(crt_epoch, training_epoch):
            logger.info(f"[Train]: Epoch {epoch:d} started")
            trackers: dict[str, AverageMeter] = {}
            epoch_start = time.time()
            data_t0 = time.time()
            for step, batch in enumerate(loader.epoch(epoch)):
                data_time = time.time() - data_t0
                if args.profile_dir and total_steps == 10:
                    jax.profiler.start_trace(args.profile_dir)
                batch = shard_batch(mesh, batch)
                state, losses = step_fn(state, batch, rng)
                if args.profile_dir and total_steps == 20:
                    jax.block_until_ready(losses)
                    jax.profiler.stop_trace()
                    logger.info(f"Profiler trace written to {args.profile_dir}")
                if total_steps % log_interval == 0:
                    losses = jax.device_get(losses)
                    for k, v in losses.items():
                        trackers.setdefault(k, AverageMeter()).update(float(v))
                    lr = float(schedule(total_steps))
                    parts = [f"[Train]: [{epoch:03d}][{step:05d}/"
                             f"{steps_per_epoch - 1:05d}]",
                             f"Total loss={trackers['total_loss'].avg:.4f}"]
                    parts += [f"{k}={m.avg:.4f}" for k, m in trackers.items()
                              if k != "total_loss" and "_" not in k[-2:]]
                    parts.append(f"training lr={lr:.1e}")
                    parts.append(f"data={data_time*1e3:.0f}ms")
                    logger.info("  ".join(parts))
                total_steps += 1
                data_t0 = time.time()
            logger.info(f"Epoch time: {time.time() - epoch_start:.4f}s")

            if (epoch + 1) % save_interval == 0 and (epoch + 1) >= eval_start_epoch:
                path = os.path.join(
                    args.exp_dir, f"model_epoch_{epoch + 1}_{args.data_name}.ckpt")
                ckpt.save_checkpoint(path, state, epoch=epoch,
                                     batch_size=batch_size)
                logger.info(f"Checkpoint save enqueued (async): {path}")

        path = os.path.join(args.exp_dir, "model_last.ckpt")
        ckpt.save_checkpoint(path, state, epoch=training_epoch - 1,
                             batch_size=batch_size, block=True)
        logger.info(f"Checkpoint is saved: {path}")
        logger.info("Training Over...")

    finally:
        # async epoch saves must commit even on exceptions /
        # KeyboardInterrupt exits from the loop (ADVICE r3)
        ckpt.wait_for_saves()


if __name__ == "__main__":
    main()
