"""Remat flag: identical losses, gradients still flow."""

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.config import ModelConfig
from vrdone_tpu.train.loop import create_train_state, train_step
from tests.test_train_step import synth_batch, tiny_cfg


def test_remat_matches_no_remat():
    cfg = tiny_cfg()
    cfg_remat = ModelConfig(**{**{k: getattr(cfg, k)
                                  for k in cfg.__dataclass_fields__},
                               "remat": True})
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(rng, cfg).items()}
    tc = dict(training_lr=1e-3, clip_grad_l2norm=1.0, weight_decay=0.05,
              total_epoch=10, warmup=True, warmup_epochs=1, type="AdamW",
              schedule_type="cosine")
    state, _ = create_train_state(cfg, tc, 10, jax.random.key(0), batch)
    key = jax.random.key(1)

    s1, l1 = train_step(state, batch, key, cfg=cfg)
    s2, l2 = train_step(state, batch, key, cfg=cfg_remat)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # updated params match too (same grads)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-5
