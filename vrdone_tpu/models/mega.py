"""MEGA relation-attention head (TPU-native, reference-fidelity).

Reimplements the reference MEGAFeatureExtractor's attention machinery
(reference datasets/mega/mega_core/modeling/roi_heads/box_head/
roi_box_feature_extractors.py:458-952) on static shapes:

  * position embedding: pairwise log-geometry -> 64-d sinusoid
    (AttentionExtractor.extract_position_matrix/:146-176,
    extract_position_embedding/:125-144 — exact math incl. the +1 box
    width/height and the (|dx|+1e-3).log() floor),
  * attention_module_multi_head (:567-646): grouped (16-way) content
    attention with a learned content-free query `u` per group
    (aff_c = u @ k^T, :619-622), log-added position bias through a
    per-group projection Wg (:592-597, :629-630), raw reference features
    as values, and a grouped Wv output projection (:638-644),
  * per-stage FC ladder l_fcs (:515-517 + :803-804): fc0 maps pooled RoI
    features to feat_dim; fc[i+1] follows attention stage i,
  * the three-set stage flow: key + distilled window proposals attend over
    the full window (stage 0) / distilled window (later stages), each
    stage augmented with its own long-range memory (update_memory caches
    per-stage INTERMEDIATE features, :679-690),
  * global aggregation (update_lm, :691-700): unbiased attention over a
    set of video-level frame features, applied inside feature generation
    (index 0) and as `global_res_stage` residual stages after the local
    stack (:882-883, index i+1).

The reference maintains all of this as python deques mutated while
streaming (generalized_rcnn_mega.py:137-228); deques and data-dependent
set sizes are anti-XLA. Here every set is padded to a static size with a
validity mask, the per-stage memories are fixed-size ring buffers, and a
whole video is one lax.scan over key frames (see stream_video) after a
batched, embarrassingly-parallel precompute of per-frame fc0-level
features — the sequential part is only the small-set attention.

Reference default knobs (configs/MEGA/vidvrd_R_101_C4_MEGA_1x_2gpu_freq5
.yaml + mega_core/config/defaults.py:394-449): stage=3, groups=16,
embed_dim=64, feat_dim=1024, base_num=75 (REF_POST_NMS_TOP_N),
advanced_num=15 (RATIO 0.2), window=25 (ALL_FRAME_INTERVAL),
key_frame_location=12, memory_size=25, global_size=10, global_res_stage=1.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

NEG_INF = -1e9  # additive mask for padded reference slots


# ---------------------------------------------------------------------------
# Position embedding (exact reference math)
# ---------------------------------------------------------------------------

def position_matrix(rois: Array, ref_rois: Array) -> Array:
    """Pairwise log-space geometry, (N, M, 4).

    Mirrors AttentionExtractor.extract_position_matrix (reference
    roi_box_feature_extractors.py:146-176): widths/heights use the +1
    convention, dx/dy are normalized by the *query* box size and floored
    as log(|d| + 1e-3), dw/dh are log(query/ref).
    """
    def cwh(b):
        w = b[..., 2] - b[..., 0] + 1.0
        h = b[..., 3] - b[..., 1] + 1.0
        cx = 0.5 * (b[..., 0] + b[..., 2])
        cy = 0.5 * (b[..., 1] + b[..., 3])
        return cx, cy, w, h

    cx, cy, w, h = cwh(rois)
    rcx, rcy, rw, rh = cwh(ref_rois)
    dx = jnp.log(jnp.abs((cx[:, None] - rcx[None, :]) / w[:, None]) + 1e-3)
    dy = jnp.log(jnp.abs((cy[:, None] - rcy[None, :]) / h[:, None]) + 1e-3)
    dw = jnp.log(w[:, None] / rw[None, :])
    dh = jnp.log(h[:, None] / rh[None, :])
    return jnp.stack([dx, dy, dw, dh], axis=2)


def position_embedding(pos_mat: Array, feat_dim: int = 64,
                       wave_length: float = 1000.0) -> Array:
    """(N, M, 4) -> (N, M, feat_dim) sinusoid embedding (reference
    extract_position_embedding, roi_box_feature_extractors.py:125-144)."""
    feat_range = jnp.arange(feat_dim // 8, dtype=pos_mat.dtype)
    dim_mat = wave_length ** (8.0 / feat_dim * feat_range)     # (feat_dim/8,)
    div = pos_mat[..., None] * 100.0 / dim_mat                 # (N,M,4,fd/8)
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=-1)
    return emb.reshape(*pos_mat.shape[:2], feat_dim)


def cal_position_embedding(rois: Array, ref_rois: Array,
                           feat_dim: int = 64) -> Array:
    """(N, 4) x (M, 4) -> (N, M, feat_dim)."""
    return position_embedding(position_matrix(rois, ref_rois), feat_dim)


# ---------------------------------------------------------------------------
# Set containers
# ---------------------------------------------------------------------------

class BoxSet(NamedTuple):
    """A padded proposal set: features + boxes + validity."""
    feat: Array    # (..., N, D)
    rois: Array    # (..., N, 4)
    valid: Array   # (..., N) bool


def cat_sets(*sets: BoxSet) -> BoxSet:
    return BoxSet(jnp.concatenate([s.feat for s in sets], axis=-2),
                  jnp.concatenate([s.rois for s in sets], axis=-2),
                  jnp.concatenate([s.valid for s in sets], axis=-1))


def flatten_set(s: BoxSet) -> BoxSet:
    """(F, N, ...) frame-major set -> (F*N, ...)."""
    return BoxSet(s.feat.reshape(-1, s.feat.shape[-1]),
                  s.rois.reshape(-1, 4), s.valid.reshape(-1))


# ---------------------------------------------------------------------------
# The head
# ---------------------------------------------------------------------------

def _fc_init():
    # make_fc: kaiming_uniform_(a=1) == uniform(+-sqrt(3/fan_in)), bias 0
    # (reference mega_core/modeling/make_layers.py)
    return nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class MEGAHead(nn.Module):
    """Reference-fidelity MEGA attention head over padded proposal sets.

    Parameter inventory mirrors MEGAFeatureExtractor.__init__
    (roi_box_feature_extractors.py:513-563): per-stage {fc, Wg, Wq, Wk,
    grouped Wv, u} for the shared local/memory attention, plus
    (global_res_stage+1) sets of {Wq, Wk, Wv, u} for the global stages.
    """
    feat_dim: int = 1024
    embed_dim: int = 64
    groups: int = 16
    stage: int = 3
    global_res_stage: int = 1
    memory_enable: bool = True
    global_enable: bool = True
    advanced_num: int = 15   # distilled proposals per frame (base_num*RATIO)
    # serving-only: compute the geometric bias with the fused pallas
    # kernel (ops/pallas/position_bias.py) instead of materialising the
    # (N, M, embed_dim) embedding in HBM. Forward-only (no VJP) — keep
    # False for training; parameter tree is identical either way.
    fused_pe_bias: bool = False
    # serving-only: run the WHOLE grouped attention (scores + u-term +
    # geometric bias + online softmax + value average) as one pallas
    # kernel (ops/pallas/mega_attention.py) — no (g, N, M) score or bias
    # tensor in HBM. Forward-only; supersedes fused_pe_bias when set.
    # Parameter tree identical either way.
    fused_attention: bool = False

    def setup(self):
        fd, g = self.feat_dim, self.groups
        std = nn.initializers.normal(0.01)
        self.l_fcs = [nn.Dense(fd, kernel_init=_fc_init(), name=f"l_fc{i}")
                      for i in range(self.stage)]
        self.l_Wgs = [nn.Dense(g, kernel_init=std, name=f"l_Wg{i}")
                      for i in range(self.stage)]
        self.l_Wqs = [nn.Dense(fd, kernel_init=_fc_init(), name=f"l_Wq{i}")
                      for i in range(self.stage)]
        self.l_Wks = [nn.Dense(fd, kernel_init=_fc_init(), name=f"l_Wk{i}")
                      for i in range(self.stage)]
        self.l_Wvs = [GroupedLinear(fd, g, name=f"l_Wv{i}")
                      for i in range(self.stage)]
        self.l_us = [self.param(f"l_u{i}", std, (g, fd // g))
                     for i in range(self.stage)]
        if self.global_enable:
            n_g = self.global_res_stage + 1
            self.g_Wqs = [nn.Dense(fd, kernel_init=_fc_init(),
                                   name=f"g_Wq{i}") for i in range(n_g)]
            self.g_Wks = [nn.Dense(fd, kernel_init=_fc_init(),
                                   name=f"g_Wk{i}") for i in range(n_g)]
            self.g_Wvs = [GroupedLinear(fd, g, name=f"g_Wv{i}")
                          for i in range(n_g)]
            self.g_us = [self.param(f"g_u{i}", std, (g, fd // g))
                         for i in range(n_g)]

    # -- primitives ---------------------------------------------------------

    def attention(self, roi_feat: Array, rois: Array, ref: BoxSet,
                  index: int, ver: str = "local") -> Array:
        """attention_module_multi_head (reference :567-646) + padding mask.

        roi_feat: (N, D); ref: (M, D)/(M, 4)/(M,). Returns (N, D).
        ver="global" uses the g_* parameter sets and no position bias
        (reference asserts position_embedding is None for global, :585).
        """
        g = self.groups
        dg = self.feat_dim // g
        if ver == "global":
            Wq, Wk, Wv, u = (self.g_Wqs[index], self.g_Wks[index],
                             self.g_Wvs[index], self.g_us[index])
        else:
            Wq, Wk, Wv, u = (self.l_Wqs[index], self.l_Wks[index],
                             self.l_Wvs[index], self.l_us[index])

        q = Wq(roi_feat).reshape(-1, g, dg).transpose(1, 0, 2)   # (g, N, dg)
        k = Wk(ref.feat).reshape(-1, g, dg).transpose(1, 0, 2)   # (g, M, dg)

        if self.fused_attention and not self.is_initializing():
            from vrdone_tpu.ops.pallas.mega_attention import (
                fused_mega_attention)
            # value projection first (reassociated order, GroupedLinear
            # docstring): one (M, D) @ (D, D) MXU pass outside the kernel
            vproj = Wv.project_values(ref.feat)
            ub = jnp.einsum("gd,gmd->gm", u, k) / np.sqrt(dg)
            interp = jax.default_backend() == "cpu"
            if ver != "global":
                wg_p = self.l_Wgs[index].variables["params"]
                out = fused_mega_attention(
                    q, k, vproj, ub, ref.valid, rois, ref.rois,
                    wg_p["kernel"].astype(jnp.float32),
                    wg_p["bias"].astype(jnp.float32),
                    embed_dim=self.embed_dim, interpret=interp)
            else:
                out = fused_mega_attention(q, k, vproj, ub, ref.valid,
                                           interpret=interp)
            return out + Wv.output_bias().astype(out.dtype)      # (N, D)

        aff = jnp.einsum("gnd,gmd->gnm", q, k)                   # content
        aff_c = jnp.einsum("gd,gmd->gm", u, k)                   # u @ k^T
        aff = (aff + aff_c[:, None, :]) / np.sqrt(dg)

        if ver != "global":
            # log-added geometric bias through Wg (reference :592-597,:630)
            # geometry/bias math always runs fp32 (rois are fp32; a bf16
            # log-bias drifts attention under bf16 streaming) and is cast
            # to the compute dtype only at the add
            if self.fused_pe_bias and not self.is_initializing():
                from vrdone_tpu.ops.pallas.position_bias import (
                    fused_position_bias)
                wg_p = self.l_Wgs[index].variables["params"]
                bias = fused_position_bias(
                    rois, ref.rois,
                    wg_p["kernel"].astype(jnp.float32),
                    wg_p["bias"].astype(jnp.float32),
                    embed_dim=self.embed_dim,
                    interpret=jax.default_backend() == "cpu")
            else:
                # pe is fp32 (built from fp32 rois), so the Dense promotes
                # to fp32 even under bf16 params
                pe = cal_position_embedding(rois, ref.rois, self.embed_dim)
                wg = jax.nn.relu(self.l_Wgs[index](pe))          # (N, M, g)
                bias = jnp.log(wg + 1e-6).transpose(2, 0, 1)
            aff = aff + bias.astype(aff.dtype)

        aff = jnp.where(ref.valid[None, None, :], aff, NEG_INF)
        att = jax.nn.softmax(aff, axis=-1)                       # (g, N, M)
        # all-invalid reference set -> zero output, not a uniform average
        # over padding
        att = att * ref.valid[None, None, :].astype(att.dtype)
        # raw (unprojected) reference features as values (reference :613);
        # apply Wv in whichever association order is statically cheaper
        # (GroupedLinear docstring) — identical math either way
        n, m = att.shape[1], att.shape[2]
        d = ref.feat.shape[-1]
        dg = self.feat_dim // g
        reassoc_cost = m * d * self.feat_dim + g * n * m * dg
        legacy_cost = g * n * m * d + n * d * self.feat_dim
        if reassoc_cost < legacy_cost:
            return Wv(att=att, values=ref.feat)                  # (N, D)
        out = jnp.einsum("gnm,md->gnd", att, ref.feat)           # (g,N,D)
        return Wv(out)                                           # (N, D)

    def fc(self, i: int, x: Array) -> Array:
        return jax.nn.relu(self.l_fcs[i](x))

    def pre_calculate(self, pooled: Array) -> Array:
        """fc0 on pooled RoI features — the `pre_calculate=True` path the
        streaming driver uses to cache window/global frame features
        (reference _forward_ref, :887-909)."""
        return self.fc(0, pooled)

    def attend_global(self, x: Array, glob: BoxSet | None,
                      index: int) -> Array:
        """update_lm (reference :691-700): residual global attention."""
        if not self.global_enable or glob is None:
            return x
        return x + self.attention(x, None, glob, index, ver="global")

    # -- flows ---------------------------------------------------------------

    def build_memory(self, mem_frames: BoxSet,
                     glob: BoxSet | None) -> list[BoxSet]:
        """Training-time long-range-memory construction from sampled memory
        frames (reference _forward_train steps 1, :849-862; generate_feats
        ver="memory", :730-741).

        mem_frames: fc0-LEVEL features (F, B, D) frame-major (already
        through pre_calculate). Returns per-stage memory sets; the caller
        wraps this in jax.lax.stop_gradient (reference torch.no_grad
        :844, :850).
        """
        a = self.advanced_num
        assert a <= mem_frames.feat.shape[1], (
            f"advanced_num {a} > per-frame slots {mem_frames.feat.shape[1]}")
        allset = flatten_set(mem_frames)
        allset = allset._replace(
            feat=self.attend_global(allset.feat, glob, 0))
        f = mem_frames.feat.shape[0]
        d = self.feat_dim

        def dis_of(flat_feat):
            return flat_feat.reshape(f, -1, d)[:, :a].reshape(-1, d)

        dis = BoxSet(dis_of(allset.feat),
                     mem_frames.rois[:, :a].reshape(-1, 4),
                     mem_frames.valid[:, :a].reshape(-1))

        mem: list[BoxSet] = []
        cur, cur_rois, cur_valid = dis.feat, dis.rois, dis.valid
        ref = allset
        for i in range(self.stage):
            mem.append(ref)
            if i == self.stage - 1:
                break
            att = self.attention(cur, cur_rois, ref, i, ver="memory")
            cur = self.fc(i + 1, cur + att)
            cur = cur * cur_valid[:, None].astype(cur.dtype)
            ref = BoxSet(cur, cur_rois, cur_valid)
        return mem

    def enhance(self, key_pooled: Array, key_rois: Array, key_valid: Array,
                window: BoxSet, mem: Sequence[BoxSet] | None,
                glob: BoxSet | None, *, key_is_fc0: bool = False,
                return_pushes: bool = False):
        """The local stage flow enhancing the key frame's proposals.

        key_pooled: (Nk, in_dim) pooled RoI features of the key set (or
        fc0-level if key_is_fc0). window: fc0-level features (F, B, D)
        frame-major — the temporally-ordered local window (train: key +
        REF_NUM_LOCAL sampled frames; test: the 25-frame sliding window).
        mem: per-stage memory sets or None. Returns enhanced (Nk, D)
        [, per-stage push sets for the streaming memory update].

        Mirrors _forward_train step 2 (:864-884) == _forward_test
        (:928-951): stage-0 queries are [key; distilled-window], the
        reference set is the full window (+mem[0]); middle stages query
        the same rows over the distilled rows (+mem[i]); the final stage
        queries only the key rows; fc[i+1] after each non-final stage;
        then global_res_stage residual global attentions.
        """
        a = self.advanced_num
        nk = key_pooled.shape[0]
        d = self.feat_dim
        f = window.feat.shape[0]
        assert a <= window.feat.shape[1], (
            f"advanced_num {a} > per-frame slots {window.feat.shape[1]}")

        x_key = key_pooled if key_is_fc0 else self.fc(0, key_pooled)
        x_key = self.attend_global(x_key, glob, 0)

        ref_all = flatten_set(window)
        ref_all = ref_all._replace(
            feat=self.attend_global(ref_all.feat, glob, 0))

        def dis_rows(flat_feat):
            return flat_feat.reshape(f, -1, d)[:, :a].reshape(-1, d)

        dis = BoxSet(dis_rows(ref_all.feat),
                     window.rois[:, :a].reshape(-1, 4),
                     window.valid[:, :a].reshape(-1))

        cur = jnp.concatenate([x_key, dis.feat], axis=0)
        cur_rois = jnp.concatenate([key_rois, dis.rois], axis=0)
        cur_valid = jnp.concatenate([key_valid, dis.valid], axis=0)
        ref = ref_all
        pushes: list[BoxSet] = []

        for i in range(self.stage):
            if return_pushes:
                # update_memory(i, cache): the first frame-slot of this
                # stage's reference set (reference :679-690)
                n_push = ref.feat.shape[0] // f if i == 0 else a
                pushes.append(BoxSet(ref.feat[:n_push], ref.rois[:n_push],
                                     ref.valid[:n_push]))
            ref_i = cat_sets(ref, mem[i]) if mem is not None else ref
            if i == self.stage - 1:
                cur, cur_rois, cur_valid = (cur[:nk], cur_rois[:nk],
                                            cur_valid[:nk])
            att = self.attention(cur, cur_rois, ref_i, i, ver="local")
            cur = cur + att
            if i != self.stage - 1:
                cur = self.fc(i + 1, cur)
                cur = cur * cur_valid[:, None].astype(cur.dtype)
                ref = BoxSet(cur[nk:], dis.rois, dis.valid)

        x = cur * key_valid[:, None].astype(cur.dtype)
        for i in range(self.global_res_stage if self.global_enable else 0):
            x = self.attend_global(x, glob, i + 1)
            x = x * key_valid[:, None].astype(x.dtype)
        if return_pushes:
            return x, pushes
        return x

    def enhance_train(self, key_pooled: Array, key_rois: Array,
                      key_valid: Array, window: BoxSet,
                      mem_frames: BoxSet | None,
                      glob: BoxSet | None) -> Array:
        """Full training forward (_forward_train, :833-885): build the
        long-range memory from sampled memory frames under stop_gradient,
        then run the local flow."""
        mem = None
        if self.memory_enable and mem_frames is not None:
            mem = jax.tree.map(jax.lax.stop_gradient,
                               self.build_memory(mem_frames, glob))
        return self.enhance(key_pooled, key_rois, key_valid, window, mem,
                            glob)

    def __call__(self, key_pooled, key_rois, key_valid, window_feat,
                 window_rois, window_valid):
        """Init-friendly entry: minimal local flow without memory/global."""
        return self.enhance(key_pooled, key_rois, key_valid,
                            BoxSet(window_feat, window_rois, window_valid),
                            None, None)


class GroupedLinear(nn.Module):
    """The grouped 1x1-conv output projection Wv (reference :521, :552):
    group g's attention output (D-dim, raw value features) maps to the
    g-th (D/groups)-slice of the output.

    Two mathematically identical application orders (associativity of
    att @ V @ W_g), chosen by static FLOP count at trace time:

      legacy   concat_g[(att_g @ V) @ W_g]   cost g*N*M*D + g*N*D*dg
      reassoc  concat_g[att_g @ (V @ W_g)]   cost M*D*(g*dg) + g*N*M*dg

    At the serving shapes (N=675 queries, M=3750 refs, g=16, D=1024) the
    reassociated order is ~6x fewer FLOPs — the (g, N, M) @ (M, 1024)
    value einsum was the single largest FLOP source of the streaming
    step. The reference hard-codes the legacy order
    (attention_module_multi_head :613-646); results are equal up to
    matmul re-association rounding."""
    feat_dim: int
    groups: int
    in_dim: int | None = None   # value feature dim; defaults to feat_dim

    def setup(self):
        d = self.in_dim if self.in_dim is not None else self.feat_dim
        dg = self.feat_dim // self.groups
        self.kernel = self.param("kernel", nn.initializers.normal(0.01),
                                 (self.groups, d, dg))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.feat_dim,))

    def project_values(self, values: Array) -> Array:
        """(M, D) raw value features -> (groups, M, dg) pre-projected
        values for the reassociated order (also consumed by the fused
        attention kernel, ops/pallas/mega_attention.py)."""
        return jnp.einsum("md,gdo->gmo", values,
                          self.kernel.astype(values.dtype))

    def output_bias(self) -> Array:
        return self.bias

    def __call__(self, per_group: Array | None = None, *,
                 att: Array | None = None,
                 values: Array | None = None) -> Array:
        """Either per_group: (groups, N, D) -> (N, D)   [legacy order]
        or att: (groups, N, M) + values: (M, D) -> (N, D), applying the
        value projection before the attention average."""
        if per_group is not None:
            out = jnp.einsum("gnd,gdo->ngo", per_group, self.kernel)
        else:
            out = jnp.einsum("gnm,gmo->ngo", att,
                             self.project_values(values))
        return out.reshape(-1, self.feat_dim) + self.bias


# ---------------------------------------------------------------------------
# Streaming (whole-video) driver
# ---------------------------------------------------------------------------

class MegaStreamState(NamedTuple):
    """Functional replacement for the reference's deques + per-stage
    memory caches (generalized_rcnn_mega.py:163-201,
    roi_box_feature_extractors.py:658-690)."""
    mem_feat: tuple[Array, ...]    # per stage: (mem_size, n_i, D)
    mem_rois: tuple[Array, ...]    # per stage: (mem_size, n_i, 4)
    mem_valid: tuple[Array, ...]   # per stage: (mem_size, n_i)


def init_stream_state(stage: int, mem_size: int, base_num: int,
                      advanced_num: int, feat_dim: int,
                      dtype=jnp.float32) -> MegaStreamState:
    ns = [base_num] + [advanced_num] * (stage - 1)
    return MegaStreamState(
        tuple(jnp.zeros((mem_size, n, feat_dim), dtype) for n in ns),
        tuple(jnp.zeros((mem_size, n, 4), jnp.float32) for n in ns),
        tuple(jnp.zeros((mem_size, n), bool) for n in ns))


def window_indices(t: int | Array, seg_len: Array, *, window: int = 25,
                   key_loc: int = 12) -> Array:
    """Frame indices of the sliding window at key frame t: [t-key_loc,
    t+window-1-key_loc] clamped to [0, seg_len-1] — reproducing the
    reference deque prefill/clamp behavior (generalized_rcnn_mega.py:
    177-201: the deque is seeded with key_loc+1 copies of frame 0, topped
    up with future frames, and the trailing edge clamps at seg_len-1)."""
    offs = jnp.arange(window) - key_loc
    return jnp.clip(t + offs, 0, seg_len - 1)


def global_indices(seg_len: int, global_size: int = 10,
                   shuffle: bool = True, seed: int = 0) -> np.ndarray:
    """(T, G) frame indices of the global set at each key step, mirroring
    vid_mega.py:_get_test (:112-120) + the update_global deque: at frame
    0 the deque fills with G shuffled frames; each later frame pushes one
    more, evicting the oldest."""
    from collections import deque

    idx = np.arange(seg_len)
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(idx)
    out = np.zeros((seg_len, global_size), np.int64)
    dq: deque = deque(maxlen=global_size)
    for t in range(seg_len):
        size = global_size if t == 0 else 1
        # pushed newest-of-the-window first at t=0 (reference vid_mega.py
        # :116-118 iterates id=0..size-1 over (t+G-1-id) % seg_len)
        for i in range(size):
            dq.append(idx[(t + global_size - i - 1) % seg_len])
        out[t] = np.array(dq)
    return out


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _stream_jit(head: MEGAHead, mem_size: int, window: int, key_loc: int,
                key_is_fc0: bool, use_glob: bool,
                compute_dtype: str = "float32"):
    """One compiled scan per (head config, schedule knobs); params and
    the per-video arrays are arguments, so every same-shaped video
    reuses the program (the per-video serving loop must not re-trace).

    compute_dtype="bfloat16" runs the set-attention scan in bf16 (params,
    features, and the ring-buffer memories; rois and the softmax mask
    math keep their types) and returns fp32 — the serving fast path."""
    dt = jnp.dtype(compute_dtype)

    @jax.jit
    def run(params, key_feat, key_rois, key_valid, ref_feat, ref_rois,
            ref_valid, glob_idx):
        if dt != jnp.float32:
            params = jax.tree.map(
                lambda x: x.astype(dt) if x.dtype == jnp.float32 else x,
                params)
            key_feat = key_feat.astype(dt)
            ref_feat = ref_feat.astype(dt)
        t_total, b, d = ref_feat.shape
        state = init_stream_state(head.stage, mem_size, b,
                                  head.advanced_num, d, dtype=dt)
        seg_len = jnp.int32(t_total)

        def step(carry, t):
            st = carry
            widx = window_indices(t, seg_len, window=window,
                                  key_loc=key_loc)
            win = BoxSet(ref_feat[widx], ref_rois[widx], ref_valid[widx])
            glob = None
            if use_glob:
                gi = glob_idx[t]
                glob = flatten_set(BoxSet(ref_feat[gi], ref_rois[gi],
                                          ref_valid[gi]))
            # memory read BEFORE this step's push (reference :932-937
            # binds `memory` before update_memory); disabled entirely
            # when MEMORY.ENABLE is off (the reference gates
            # update_memory and the mem concat on self.memory_enable)
            mem = None
            if head.memory_enable:
                mem = [flatten_set(BoxSet(st.mem_feat[i], st.mem_rois[i],
                                          st.mem_valid[i]))
                       for i in range(head.stage)]

            out, pushes = head.apply(
                params, key_feat[t], key_rois[t], key_valid[t], win, mem,
                glob, key_is_fc0=key_is_fc0, return_pushes=True,
                method=MEGAHead.enhance)

            new_f, new_r, new_v = [], [], []
            for i in range(head.stage):
                p = pushes[i]
                new_f.append(jnp.roll(st.mem_feat[i], -1, axis=0)
                             .at[-1].set(p.feat))
                new_r.append(jnp.roll(st.mem_rois[i], -1, axis=0)
                             .at[-1].set(p.rois))
                new_v.append(jnp.roll(st.mem_valid[i], -1, axis=0)
                             .at[-1].set(p.valid))
            st = MegaStreamState(tuple(new_f), tuple(new_r),
                                 tuple(new_v))
            return st, out

        _, outs = jax.lax.scan(step, state, jnp.arange(t_total))
        return outs.astype(jnp.float32)

    return run


def stream_video(head: MEGAHead, params, *, key_feat: Array,
                 key_rois: Array, key_valid: Array, key_is_fc0: bool,
                 ref_feat: Array, ref_rois: Array, ref_valid: Array,
                 mem_size: int = 25, window: int = 25, key_loc: int = 12,
                 glob_idx: np.ndarray | None = None,
                 compute_dtype: str = "float32") -> Array:
    """Enhance every frame of a video with full MEGA semantics.

    key_feat: (T, Nk, .) the per-frame key proposal sets — raw pooled
    features (key_is_fc0=False) or fc0-level (True; e.g. the same arrays
    as ref_feat in GT-extraction mode). ref_feat: (T, B, D) fc0-LEVEL
    per-frame window/global reference sets (pre_calculate output; the
    detector uses RPN top-`base_num` refs). glob_idx: (T, G) per-step
    global frame indices (see global_indices), or None to disable the
    global stages. Returns (T, Nk, D).

    One compiled program per (head config, schedule, (T, Nk, B) bucket) —
    cached in _stream_jit so the per-video loop never re-traces. The
    per-frame fc0 features are computed by the caller in one batched
    pass; this scan is only the sequential set-attention.
    """
    use_glob = glob_idx is not None and head.global_enable
    run = _stream_jit(head, mem_size, window, key_loc, key_is_fc0,
                      use_glob, compute_dtype)
    if use_glob:
        gi = jnp.asarray(glob_idx)
    else:  # fixed arity for the cached jit; traced but unused
        gi = jnp.zeros((ref_feat.shape[0], 1), jnp.int32)
    return run(params, key_feat, key_rois, key_valid, ref_feat, ref_rois,
               ref_valid, gi)
