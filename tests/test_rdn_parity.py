"""Golden parity: our RDNHead vs the reference RDNFeatureExtractor
(reference roi_box_feature_extractors.py:253-455). The torch side drives
genuine reference methods with transplanted weights; the harness only
composes them the way _forward_test does (:412-454)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tests import oracle
from vrdone_tpu.models.mega import BoxSet
from vrdone_tpu.models.rdn import RDNHead, stream_video_rdn

torch = pytest.importorskip("torch")

IN_DIM, FEAT_DIM, GROUPS = 12, 1024, 16
BASE, ADV = 2, 1          # exercise the advanced-distillation branch too
B, A, NK = 4, 2, 3
WINDOW, KEY_LOC = 5, 2


@pytest.fixture(scope="module")
def rbfe():
    return oracle.load_mega_reference()


@pytest.fixture(scope="module")
def ref_rdn(rbfe):
    return oracle.make_reference_rdn(
        rbfe, in_dim=IN_DIM, feat_dim=FEAT_DIM, groups=GROUPS,
        base_stage=BASE, advanced_stage=ADV, advanced_num=A, base_num=B,
        seed=3)


@pytest.fixture(scope="module")
def head_and_params(ref_rdn):
    head = RDNHead(feat_dim=FEAT_DIM, groups=GROUPS, base_stage=BASE,
                   advanced_stage=ADV, advanced_num=A)
    return head, {"params": oracle.rdn_head_params(ref_rdn)}


def rand_rois(rng, n):
    xy = rng.uniform(0, 200, size=(n, 2))
    wh = rng.uniform(8, 80, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _reference_rdn_flow(M, x_pooled, rois_cur, x_refs, rois_ref):
    """_forward_test stage composition (reference :412-454) on fc0-level
    ref tensors."""
    import torch.nn.functional as F

    pe = M.cal_position_embedding(rois_cur, rois_ref)
    x = x_pooled
    for i in range(M.base_stage):
        x = F.relu(M.fcs[i](x))
        att = M.attention_module_multi_head(
            x, x_refs, pe, feat_dim=FEAT_FIXED, group=GROUPS,
            dim=(FEAT_FIXED,) * 3, index=i)
        x = x + att

    if M.advanced_stage > 0:
        x_refs_adv = torch.cat(
            [c[:M.advanced_num] for c in torch.split(x_refs, M.base_num)],
            dim=0)
        rois_ref_adv = torch.cat(
            [c[:M.advanced_num] for c in torch.split(rois_ref, M.base_num)],
            dim=0)
        pe_adv = torch.cat(
            [c[..., :M.advanced_num]
             for c in torch.split(pe, M.base_num, dim=-1)], dim=-1)
        pe2 = M.cal_position_embedding(rois_ref_adv, rois_ref)
        for i in range(M.advanced_stage):
            att = M.attention_module_multi_head(
                x_refs_adv, x_refs, pe2, feat_dim=FEAT_FIXED, group=GROUPS,
                dim=(FEAT_FIXED,) * 3, index=i + M.base_stage)
            x_refs_adv = F.relu(M.fcs[i + M.base_stage](x_refs_adv + att))
        att = M.attention_module_multi_head(
            x, x_refs_adv, pe_adv, feat_dim=FEAT_FIXED, group=GROUPS,
            dim=(FEAT_FIXED,) * 3,
            index=M.base_stage + M.advanced_stage)
        x = x + att
    return x


FEAT_FIXED = 1024  # hardcoded inside the reference attention defaults


def test_rdn_flow_parity(ref_rdn, head_and_params):
    M = ref_rdn
    head, params = head_and_params
    rng = np.random.default_rng(4)
    f = WINDOW
    key_pooled = rng.standard_normal((NK, IN_DIM)).astype(np.float32)
    key_rois = rand_rois(rng, NK)
    win_pooled = rng.standard_normal((f, B, IN_DIM)).astype(np.float32)
    win_rois = rand_rois(rng, f * B).reshape(f, B, 4)

    with torch.no_grad():
        x_refs = torch.nn.functional.relu(M.fcs[0](
            torch.from_numpy(win_pooled))).reshape(f * B, FEAT_DIM)
        want = _reference_rdn_flow(
            M, torch.from_numpy(key_pooled), torch.from_numpy(key_rois),
            x_refs, torch.from_numpy(win_rois).reshape(f * B, 4))

    win_fc0 = head.apply(params, jnp.asarray(win_pooled),
                         method=RDNHead.pre_calculate)
    got = head.apply(
        params, jnp.asarray(key_pooled), jnp.asarray(key_rois),
        jnp.ones(NK, bool),
        BoxSet(win_fc0, jnp.asarray(win_rois), jnp.ones((f, B), bool)),
        method=RDNHead.enhance)
    np.testing.assert_allclose(np.asarray(got), oracle.t2n(want),
                               rtol=5e-4, atol=5e-4)


def test_rdn_stream_matches_reference_window(ref_rdn, head_and_params):
    """Streaming: per-frame outputs equal the reference deque-window
    composition (prefill with key_loc+1 copies of frame 0, clamp at the
    end — generalized_rcnn_rdn.py:137-168)."""
    from collections import deque

    M = ref_rdn
    head, params = head_and_params
    rng = np.random.default_rng(5)
    t_total = 7
    key_pooled = rng.standard_normal((t_total, NK, IN_DIM)).astype(
        np.float32)
    key_rois = rand_rois(rng, t_total * NK).reshape(t_total, NK, 4)
    ref_pooled = rng.standard_normal((t_total, B, IN_DIM)).astype(
        np.float32)
    ref_rois = rand_rois(rng, t_total * B).reshape(t_total, B, 4)

    with torch.no_grad():
        fc0 = torch.nn.functional.relu(M.fcs[0](
            torch.from_numpy(ref_pooled)))
        rois_t = torch.from_numpy(ref_rois)
        win: deque = deque(maxlen=WINDOW)
        end_id = 0
        while len(win) < KEY_LOC + 1:
            win.append((fc0[0], rois_t[0]))
        while len(win) < WINDOW:
            end_id = min(end_id + 1, t_total - 1)
            win.append((fc0[end_id], rois_t[end_id]))
        want = []
        for t in range(t_total):
            if t > 0:
                end_id = min(end_id + 1, t_total - 1)
                win.append((fc0[end_id], rois_t[end_id]))
            x_refs = torch.cat([x for x, _ in win]).reshape(-1, FEAT_DIM)
            rr = torch.cat([r for _, r in win]).reshape(-1, 4)
            want.append(oracle.t2n(_reference_rdn_flow(
                M, torch.from_numpy(key_pooled[t]),
                torch.from_numpy(key_rois[t]), x_refs, rr)))

    ref_fc0 = head.apply(params, jnp.asarray(ref_pooled),
                         method=RDNHead.pre_calculate)
    got = np.asarray(stream_video_rdn(
        head, params, key_pooled=jnp.asarray(key_pooled),
        key_rois=jnp.asarray(key_rois),
        key_valid=jnp.ones((t_total, NK), bool),
        ref_feat=ref_fc0, ref_rois=jnp.asarray(ref_rois),
        ref_valid=jnp.ones((t_total, B), bool),
        window=WINDOW, key_loc=KEY_LOC))
    for t in range(t_total):
        np.testing.assert_allclose(got[t], want[t], rtol=1e-3, atol=1e-3,
                                   err_msg=f"frame {t}")
