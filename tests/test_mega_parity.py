"""Golden parity: our MEGAHead vs the reference MEGAFeatureExtractor.

The torch side runs genuine reference methods (attention_module_multi_head,
cal_position_embedding, _forward_test_single, update_lm, init_memory/
update_memory/update_global) with random transplanted weights; the test
harness only composes them the way _forward_test / _forward_train and
GeneralizedRCNNMEGA._forward_test do (reference
roi_box_feature_extractors.py:833-952, generalized_rcnn_mega.py:137-228).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tests import oracle
from vrdone_tpu.models.mega import (MEGAHead, BoxSet, cal_position_embedding,
                                    global_indices, stream_video)

torch = pytest.importorskip("torch")

# feat_dim/groups are hardcoded to 1024/16 inside the reference's
# _forward_{train,test}_single and update_lm; set sizes stay tiny
IN_DIM, FEAT_DIM, GROUPS, STAGE = 12, 1024, 16, 3
RES_STAGE = 1
BASE, ADV = 4, 2
NK = 3          # key proposals per frame
WINDOW, KEY_LOC = 5, 2
# the reference's long-range-memory deques use maxlen=ALL_FRAME_INTERVAL
# (init_memory, roi_box_feature_extractors.py:658-665) — the
# MEMORY.SIZE config knob is written but never read
MEM_SIZE, GSIZE = WINDOW, 2


@pytest.fixture(scope="module")
def rbfe():
    return oracle.load_mega_reference()


@pytest.fixture(scope="module")
def ref_mega(rbfe):
    return oracle.make_reference_mega(
        rbfe, in_dim=IN_DIM, feat_dim=FEAT_DIM, groups=GROUPS, stage=STAGE,
        global_res_stage=RES_STAGE, advanced_num=ADV, base_num=BASE,
        memory_size=MEM_SIZE, global_size=GSIZE,
        all_frame_interval=WINDOW, seed=7)


@pytest.fixture(scope="module")
def head_and_params(ref_mega):
    head = MEGAHead(feat_dim=FEAT_DIM, embed_dim=64, groups=GROUPS,
                    stage=STAGE, global_res_stage=RES_STAGE,
                    advanced_num=ADV)
    params = {"params": oracle.mega_head_params(ref_mega)}
    return head, params


def rand_rois(rng, n):
    xy = rng.uniform(0, 200, size=(n, 2))
    wh = rng.uniform(8, 80, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_position_embedding_parity(ref_mega):
    rng = np.random.default_rng(0)
    r1, r2 = rand_rois(rng, 5), rand_rois(rng, 9)
    ref = oracle.t2n(ref_mega.cal_position_embedding(
        torch.from_numpy(r1), torch.from_numpy(r2)))[0]   # (64, N, M)
    ours = np.asarray(cal_position_embedding(jnp.asarray(r1),
                                             jnp.asarray(r2)))
    # sin/cos of large phases differ at float32 ulp level between
    # torch and XLA
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref,
                               rtol=1e-3, atol=1e-4)


def test_attention_module_parity(ref_mega, head_and_params):
    head, params = head_and_params
    rng = np.random.default_rng(1)
    n, m = 5, 11
    roi = rng.standard_normal((n, FEAT_DIM)).astype(np.float32)
    ref_feat = rng.standard_normal((m, FEAT_DIM)).astype(np.float32)
    rois, ref_rois = rand_rois(rng, n), rand_rois(rng, m)

    for index in range(STAGE):
        pe = ref_mega.cal_position_embedding(torch.from_numpy(rois),
                                             torch.from_numpy(ref_rois))
        with torch.no_grad():
            want = oracle.t2n(ref_mega.attention_module_multi_head(
                torch.from_numpy(roi), torch.from_numpy(ref_feat), pe,
                feat_dim=FEAT_DIM, dim=(FEAT_DIM,) * 3, group=GROUPS,
                index=index))
        got = head.apply(
            params, jnp.asarray(roi), jnp.asarray(rois),
            BoxSet(jnp.asarray(ref_feat), jnp.asarray(ref_rois),
                   jnp.ones(m, bool)), index, "local",
            method=MEGAHead.attention)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)


def test_global_attention_parity(ref_mega, head_and_params):
    head, params = head_and_params
    rng = np.random.default_rng(2)
    n, m = 6, 8
    x = rng.standard_normal((n, FEAT_DIM)).astype(np.float32)
    g = rng.standard_normal((m, FEAT_DIM)).astype(np.float32)
    for index in range(RES_STAGE + 1):
        with torch.no_grad():
            want = oracle.t2n(ref_mega.attention_module_multi_head(
                torch.from_numpy(x), torch.from_numpy(g), None,
                feat_dim=FEAT_DIM, dim=(FEAT_DIM,) * 3, group=GROUPS,
                index=index, ver="global"))
        got = head.apply(
            params, jnp.asarray(x), None,
            BoxSet(jnp.asarray(g), jnp.zeros((m, 4)), jnp.ones(m, bool)),
            index, "global", method=MEGAHead.attention)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)


def _reference_local_flow(M, x_key_t, key_rois_t, win_feat_t, win_rois_t,
                          mem, glob_feats_t):
    """Reference _forward_test stage flow (roi_box_feature_extractors.py
    :911-951) on fc0-level tensors, without the memory updates. mem:
    list of {rois, feats} or None. Returns (x, local_cache_refs) where
    local_cache_refs[i] is the stage-i reference set (for update_memory
    parity checks)."""
    f = win_feat_t.shape[0]
    x = x_key_t
    x_ref = win_feat_t.reshape(f * BASE, FEAT_DIM)
    rois_ref = win_rois_t.reshape(f * BASE, 4)
    x_ref_dis = win_feat_t[:, :ADV].reshape(f * ADV, FEAT_DIM)
    rois_dis = win_rois_t[:, :ADV].reshape(f * ADV, 4)

    if glob_feats_t is not None:
        M.global_cache = [{"feats": glob_feats_t}]
        x = M.update_lm(x)
        x_ref = M.update_lm(x_ref)
        x_ref_dis = M.update_lm(x_ref_dis)
    else:
        M.global_cache = []

    # generate_feats_test cache layout (:755-776)
    cache = [{"rois_cur": torch.cat([key_rois_t, rois_dis]),
              "rois_ref": rois_ref,
              "feats_cur": torch.cat([x, x_ref_dis]),
              "feats_ref": x_ref}]
    for _ in range(M.stage - 2):
        cache.append({"rois_cur": torch.cat([key_rois_t, rois_dis]),
                      "rois_ref": rois_dis})
    cache.append({"rois_cur": key_rois_t, "rois_ref": rois_dis})

    nk = x_key_t.shape[0]
    pushes = []
    for i in range(M.stage):
        n_push = M.base_num if i == 0 else M.advanced_num
        pushes.append({"rois": cache[i]["rois_ref"][:n_push].clone(),
                       "feats": cache[i]["feats_ref"][:n_push].clone()})
        memory = mem[i] if (mem is not None and mem[i]) else None
        feat_cur = M._forward_test_single(i, cache[i], memory)
        if i == M.stage - 1:
            x = feat_cur
        elif i == M.stage - 2:
            cache[i + 1]["feats_cur"] = feat_cur[:nk]
            cache[i + 1]["feats_ref"] = feat_cur[nk:]
        else:
            cache[i + 1]["feats_cur"] = feat_cur
            cache[i + 1]["feats_ref"] = feat_cur[nk:]

    if glob_feats_t is not None:
        for i in range(M.global_res_stage):
            x = M.update_lm(x, i + 1)
    return x, pushes


def _fc0(M, pooled_t):
    return torch.nn.functional.relu(M.l_fcs[0](pooled_t))


def test_local_flow_parity(ref_mega, head_and_params):
    """Single-step flow: key + window + per-stage memory + global."""
    M = ref_mega
    head, params = head_and_params
    rng = np.random.default_rng(3)
    f = WINDOW
    key_pooled = rng.standard_normal((NK, IN_DIM)).astype(np.float32)
    key_rois = rand_rois(rng, NK)
    win_pooled = rng.standard_normal((f, BASE, IN_DIM)).astype(np.float32)
    win_rois = rand_rois(rng, f * BASE).reshape(f, BASE, 4)
    glob_pooled = rng.standard_normal((GSIZE * BASE, IN_DIM)).astype(
        np.float32)
    mem_np = []
    for i in range(STAGE):
        n = (BASE if i == 0 else ADV) * MEM_SIZE
        mem_np.append((rng.standard_normal((n, FEAT_DIM)).astype(np.float32),
                       rand_rois(rng, n)))

    with torch.no_grad():
        x_key = _fc0(M, torch.from_numpy(key_pooled))
        win_feat = _fc0(M, torch.from_numpy(win_pooled))
        glob_feat = _fc0(M, torch.from_numpy(glob_pooled))
        mem_t = [{"feats": torch.from_numpy(fe), "rois": torch.from_numpy(ro)}
                 for fe, ro in mem_np]
        want, _ = _reference_local_flow(
            M, x_key, torch.from_numpy(key_rois), win_feat,
            torch.from_numpy(win_rois), mem_t, glob_feat)

    mem_sets = [BoxSet(jnp.asarray(fe), jnp.asarray(ro),
                       jnp.ones(fe.shape[0], bool)) for fe, ro in mem_np]
    glob_j = head.apply(params, jnp.asarray(glob_pooled),
                        method=MEGAHead.pre_calculate)
    win_j = head.apply(params, jnp.asarray(win_pooled),
                       method=MEGAHead.pre_calculate)
    got = head.apply(
        params, jnp.asarray(key_pooled), jnp.asarray(key_rois),
        jnp.ones(NK, bool),
        BoxSet(win_j, jnp.asarray(win_rois), jnp.ones((f, BASE), bool)),
        mem_sets,
        BoxSet(glob_j, jnp.zeros((GSIZE * BASE, 4)),
               jnp.ones(GSIZE * BASE, bool)),
        method=MEGAHead.enhance)
    np.testing.assert_allclose(np.asarray(got), oracle.t2n(want),
                               rtol=5e-4, atol=5e-4)


def test_train_memory_build_parity(ref_mega, head_and_params):
    """build_memory vs reference _forward_train step 1 (:849-862)."""
    M = ref_mega
    head, params = head_and_params
    rng = np.random.default_rng(4)
    fm = 3  # memory frames
    mem_pooled = rng.standard_normal((fm, BASE, IN_DIM)).astype(np.float32)
    mem_rois = rand_rois(rng, fm * BASE).reshape(fm, BASE, 4)
    glob_pooled = rng.standard_normal((GSIZE * BASE, IN_DIM)).astype(
        np.float32)

    with torch.no_grad():
        glob_feat = _fc0(M, torch.from_numpy(glob_pooled))
        M.global_cache = [{"feats": glob_feat}]
        x = _fc0(M, torch.from_numpy(mem_pooled)).reshape(-1, FEAT_DIM)
        x = M.update_lm(x)
        rois = torch.from_numpy(mem_rois).reshape(-1, 4)
        x_dis = torch.cat([c[:ADV] for c in torch.split(x, BASE)], dim=0)
        rois_dis = torch.cat([c[:ADV] for c in torch.split(rois, BASE)],
                             dim=0)
        # memory_cache layout (generate_feats ver="memory", :734-741)
        caches = [{"rois_cur": rois_dis, "rois_ref": rois,
                   "feats_cur": x_dis, "feats_ref": x}]
        for _ in range(STAGE - 1):
            caches.append({"rois_cur": rois_dis, "rois_ref": rois_dis})
        M.mem = []
        for i in range(STAGE):
            feats = M._forward_train_single(i, dict(caches[i]), None,
                                            ver="memory")
            if i == STAGE - 1:
                break
            caches[i + 1]["feats_cur"] = feats
            caches[i + 1]["feats_ref"] = feats
        want = M.mem

    glob_j = head.apply(params, jnp.asarray(glob_pooled),
                        method=MEGAHead.pre_calculate)
    mem_fc0 = head.apply(params, jnp.asarray(mem_pooled),
                         method=MEGAHead.pre_calculate)
    got = head.apply(
        params,
        BoxSet(mem_fc0, jnp.asarray(mem_rois), jnp.ones((fm, BASE), bool)),
        BoxSet(glob_j, jnp.zeros((GSIZE * BASE, 4)),
               jnp.ones(GSIZE * BASE, bool)),
        method=MEGAHead.build_memory)
    assert len(got) == STAGE
    for i in range(STAGE):
        np.testing.assert_allclose(np.asarray(got[i].feat),
                                   oracle.t2n(want[i]["feats"]),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(got[i].rois),
                                   oracle.t2n(want[i]["rois"]),
                                   rtol=1e-5, atol=1e-5)


def test_stream_video_parity(ref_mega, head_and_params):
    """Whole-video streaming: window prefill/clamp, per-stage long-range
    memory (read-before-push), and the shuffled global schedule, vs a
    torch driver replicating GeneralizedRCNNMEGA._forward_test
    (:163-228) with reference init_memory/update_memory/update_global."""
    from collections import deque

    M = ref_mega
    head, params = head_and_params
    rng = np.random.default_rng(5)
    t_total = 8
    pooled = rng.standard_normal((t_total, BASE, IN_DIM)).astype(np.float32)
    rois = rand_rois(rng, t_total * BASE).reshape(t_total, BASE, 4)
    gidx = global_indices(t_total, GSIZE, shuffle=True, seed=11)

    # ---- torch driver ----
    with torch.no_grad():
        fc0 = _fc0(M, torch.from_numpy(pooled))        # (T, BASE, D)
        rois_t = torch.from_numpy(rois)
        want = []
        win: deque = deque(maxlen=WINDOW)              # (feat, rois) pairs
        M.init_memory()
        M.init_global()
        # shuffled schedule: t=0 pushes the first row of gidx (GSIZE
        # frames, oldest first); each later step pushes the newest entry
        for g in gidx[0]:
            M.update_global(fc0[g])
        end_id = 0
        while len(win) < KEY_LOC + 1:
            win.append((fc0[0], rois_t[0]))
        while len(win) < WINDOW:
            end_id = min(end_id + 1, t_total - 1)
            win.append((fc0[end_id], rois_t[end_id]))
        for t in range(t_total):
            if t > 0:
                end_id = min(end_id + 1, t_total - 1)
                win.append((fc0[end_id], rois_t[end_id]))
                M.update_global(fc0[gidx[t, -1]])
            win_feat = torch.stack([f for f, _ in win])
            win_rois = torch.stack([r for _, r in win])
            glob_feats = M.global_cache[0]["feats"]
            mem = [dict(m) if m else None for m in M.mem]
            x, pushes = _reference_local_flow(
                M, fc0[t], rois_t[t], win_feat, win_rois, mem, glob_feats)
            for i in range(STAGE):
                M.update_memory(i, {"rois_ref": pushes[i]["rois"],
                                    "feats_ref": pushes[i]["feats"]})
            want.append(oracle.t2n(x))

    # ---- ours ----
    fc0_j = head.apply(params, jnp.asarray(pooled),
                       method=MEGAHead.pre_calculate)
    got = stream_video(
        head, params, key_feat=fc0_j, key_rois=jnp.asarray(rois),
        key_valid=jnp.ones((t_total, BASE), bool), key_is_fc0=True,
        ref_feat=fc0_j, ref_rois=jnp.asarray(rois),
        ref_valid=jnp.ones((t_total, BASE), bool),
        mem_size=MEM_SIZE, window=WINDOW, key_loc=KEY_LOC, glob_idx=gidx)
    got = np.asarray(got)
    for t in range(t_total):
        np.testing.assert_allclose(got[t], want[t], rtol=1e-3, atol=1e-3,
                                   err_msg=f"frame {t}")


def test_padding_invariance(head_and_params):
    """Padded (invalid) slots must not change valid outputs."""
    head, params = head_and_params
    rng = np.random.default_rng(6)
    f = WINDOW
    key_pooled = rng.standard_normal((NK, IN_DIM)).astype(np.float32)
    key_rois = rand_rois(rng, NK)
    win_pooled = rng.standard_normal((f, BASE, IN_DIM)).astype(np.float32)
    win_rois = rand_rois(rng, f * BASE).reshape(f, BASE, 4)

    win_j = head.apply(params, jnp.asarray(win_pooled),
                       method=MEGAHead.pre_calculate)
    base = head.apply(
        params, jnp.asarray(key_pooled), jnp.asarray(key_rois),
        jnp.ones(NK, bool),
        BoxSet(win_j, jnp.asarray(win_rois), jnp.ones((f, BASE), bool)),
        None, None, method=MEGAHead.enhance)

    # pad each window frame with 2 junk slots (invalid)
    pad = 2
    win_pooled_p = np.concatenate(
        [win_pooled, rng.standard_normal((f, pad, IN_DIM)).astype(
            np.float32) * 50], axis=1)
    win_rois_p = np.concatenate(
        [win_rois, rand_rois(rng, f * pad).reshape(f, pad, 4)], axis=1)
    valid_p = np.concatenate([np.ones((f, BASE), bool),
                              np.zeros((f, pad), bool)], axis=1)
    win_jp = head.apply(params, jnp.asarray(win_pooled_p),
                        method=MEGAHead.pre_calculate)
    padded = head.apply(
        params, jnp.asarray(key_pooled), jnp.asarray(key_rois),
        jnp.ones(NK, bool),
        BoxSet(win_jp, jnp.asarray(win_rois_p), jnp.asarray(valid_p)),
        None, None, method=MEGAHead.enhance)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base),
                               rtol=1e-4, atol=1e-4)
