"""Async checkpoint save/restore round-trip.

save_checkpoint enqueues an orbax async save (device->host snapshot is
blocking, serialization commits in a background thread; reference
equivalent is the blocking torch.save at utils/train_utils.py:167-179).
wait_for_saves() must make the committed checkpoint visible and exact.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.train import checkpoint as ckpt
from vrdone_tpu.train.loop import create_train_state
from tests.test_train_step import synth_batch, tiny_cfg


def _make_state():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(rng, cfg).items()}
    tc = dict(training_lr=1e-3, clip_grad_l2norm=1.0, weight_decay=0.05,
              total_epoch=10, warmup=True, warmup_epochs=1, type="AdamW",
              schedule_type="cosine")
    state, _ = create_train_state(cfg, tc, 10, jax.random.key(0), batch)
    return state


def test_async_save_restore_roundtrip(tmp_path):
    state = _make_state()
    path = str(tmp_path / "ep1")
    ckpt.save_checkpoint(path, state, epoch=3, batch_size=6)
    # async: the save may still be committing here; wait makes it visible
    ckpt.wait_for_saves()

    blank = state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params),
        ema_params=jax.tree.map(jnp.zeros_like, state.ema_params))
    restored, crt_epoch, batch_size = ckpt.restore_checkpoint(path, blank)
    assert crt_epoch == 4 and batch_size == 6
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_back_to_back_saves_serialize(tmp_path):
    """A second save while the first is in flight must not corrupt either
    (save_checkpoint waits for the outstanding save before enqueuing)."""
    state = _make_state()
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    ckpt.save_checkpoint(p1, state, epoch=0, batch_size=6)
    ckpt.save_checkpoint(p2, state, epoch=1, batch_size=6, block=True)
    for p, ep in ((p1, 1), (p2, 2)):
        restored, crt_epoch, _ = ckpt.restore_checkpoint(p, state)
        assert crt_epoch == ep
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]))
