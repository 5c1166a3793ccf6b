"""Video object detector (MEGA-equivalent): ResNet-C4 + RPN + MEGA
relation-attention RoI head.

This is the offline feature producer of the stack (reference layer L9,
SURVEY.md §1): it (a) detects/tracks entities and (b) emits the per-frame
1024-d RoI visual features the relation model consumes. The reference
implementation is maskrcnn-benchmark's GeneralizedRCNNMEGA (reference
datasets/mega/mega_core/modeling/detector/generalized_rcnn_mega.py) with
stateful deque memory; here the per-frame feature generation is one big
batched XLA program and the sequential part (the sliding window +
per-stage long-range memory + global set) is a lax.scan with ring buffers
(models/mega.py stream_video).

Classification and regression run on the MEGA-ENHANCED 1024-d features —
the predictor input is the attention head's output, exactly as in the
reference (roi_box_feature_extractors.py forward -> box_head.py
`class_logits, box_regression = self.predictor(x)`).

Weights: the reference starts from a Caffe2 R-101 catalog checkpoint. No
pretrained weights ship in this environment; tools/convert_torch_resnet.py
transplants torchvision-format ResNet state dicts when available.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import boxes as box_ops
from . import rpn as rpn_lib
from .mega import MEGAHead, global_indices, stream_video

Array = jax.Array

# ImageNet mean in BGR order, matching the Caffe2-lineage preprocessing
# (reference mega_core/config/defaults.py PIXEL_MEAN)
PIXEL_MEAN = np.array([102.9801, 115.9465, 122.7717], np.float32)


class BoxHead(nn.Module):
    """RoIAlign(14x14) on C4 -> C5 stage -> pooled features; predictors
    consume the MEGA-enhanced 1024-d representation (reference
    FPNPredictor over MEGAFeatureExtractor output)."""
    num_classes: int
    c5_blocks: int = 3
    stride_in_1x1: bool = False

    def setup(self):
        from .resnet import ResNetC5Head
        self.c5 = ResNetC5Head(self.c5_blocks,
                               stride_in_1x1=self.stride_in_1x1,
                               name="c5")
        self.cls_score = nn.Dense(self.num_classes + 1,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name="cls_score")
        self.bbox_pred = nn.Dense(4 * (self.num_classes + 1),
                                  kernel_init=nn.initializers.normal(0.001),
                                  name="bbox_pred")

    def pooled_features(self, c4_feat: Array, rois: Array) -> Array:
        """c4_feat: (H, W, C) NHWC single image; rois: (R, 4).
        Returns (R, 2048)."""
        chw = c4_feat.transpose(2, 0, 1)
        crops = box_ops.roi_align(chw, rois, spatial_scale=1.0 / 16,
                                  output_size=(14, 14), sampling_ratio=2)
        crops = crops.transpose(0, 2, 3, 1)       # (R, 14, 14, C) NHWC
        return self.c5(crops)

    def predictions(self, enhanced: Array) -> tuple[Array, Array]:
        """enhanced: (R, 1024) MEGA output -> (cls_logits, bbox_deltas)."""
        return self.cls_score(enhanced), self.bbox_pred(enhanced)


class MegaDetector(nn.Module):
    """Full video detector with the reference MEGA head.

    Reference knobs (mega_core/config/defaults.py:394-449 + the vidvrd
    MEGA yaml): stage=3, groups=16, base_num=75 ref proposals/frame,
    advanced (distilled) = base_num*0.2, window=25 (key at slot 12),
    global_size=10, one global residual stage. The long-range-memory
    capacity equals the window length (the reference's deque maxlen is
    ALL_FRAME_INTERVAL; its MEMORY.SIZE knob is never read)."""
    num_classes: int
    resnet_layers: tuple[int, ...] = (3, 4, 23)
    stage: int = 3
    groups: int = 16
    global_res_stage: int = 1
    global_enable: bool = True
    memory_enable: bool = True
    base_num: int = 75
    ratio: float = 0.2
    window: int = 25
    key_loc: int = 12
    global_size: int = 10
    advanced_num_override: int | None = None
    # stride placement in bottlenecks: False = torchvision v1.5+ (the
    # tools/convert_torch_resnet.py checkpoint lineage), True = Caffe2 /
    # reference mega_core (RESNETS.STRIDE_IN_1X1 default True)
    stride_in_1x1: bool = False

    @property
    def advanced_num(self) -> int:
        """Distilled proposals per frame. In GT-extraction mode the box
        slots can be fewer than base_num*ratio; the reference's
        `proposals[:advanced_num]` then degenerates to all boxes
        (generalized_rcnn_mega.py:156), which the override expresses with
        static shapes."""
        if self.advanced_num_override is not None:
            return self.advanced_num_override
        return max(1, int(self.base_num * self.ratio))

    def setup(self):
        from .resnet import ResNetC4
        self.backbone = ResNetC4(self.resnet_layers,
                                 stride_in_1x1=self.stride_in_1x1,
                                 name="backbone")
        self.rpn_head = rpn_lib.RPNHead(name="rpn")
        self.box_head = BoxHead(self.num_classes,
                                stride_in_1x1=self.stride_in_1x1,
                                name="box_head")
        self.mega = make_mega_head(self, name="mega")

    def features(self, images: Array,
                 compute_dtype=jnp.float32) -> Array:
        """images: (N, H, W, 3) raw pixels -> C4 features (N, H/16, W/16,
        C). Mean subtraction happens here (BGR channel order expected).
        uint8 input is fine — serving transfers frames at 1 byte/px over
        the host->device link and casts here. compute_dtype=bfloat16 runs
        the backbone at half the activation bandwidth (serving fast path;
        pass bf16-cast params alongside or the convs promote back)."""
        x = (images.astype(jnp.float32) - PIXEL_MEAN).astype(compute_dtype)
        return self.backbone(x)

    def propose(self, c4_feat: Array, image_hw: Array, *,
                pre_nms_top_n: int = 6000, post_nms_top_n: int = 300
                ) -> tuple[Array, Array, Array]:
        """Single image: c4_feat (H', W', C) -> (boxes, scores, valid)."""
        logits, deltas = self.rpn_head(c4_feat[None])
        hp, wp, a = logits.shape[1], logits.shape[2], logits.shape[3]
        anchors = jnp.asarray(rpn_lib.make_anchors(hp, wp))
        # box decode + NMS always run in fp32: bf16 coordinates on a
        # ~1000px canvas quantize to ~4px, which flips NMS keep decisions
        logits = logits[0].reshape(-1).astype(jnp.float32)
        deltas = deltas[0].reshape(hp * wp * a, 4).astype(jnp.float32)
        return rpn_lib.select_proposals(
            anchors, logits, deltas, image_hw,
            pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n)

    def frame_fc0(self, c4_feat: Array, rois: Array, valid: Array) -> Array:
        """Pool one frame's RoIs and lift to the fc0-level 1024-d features
        stored in the window/global/memory sets (the reference
        `pre_calculate=True` path)."""
        pooled = self.box_head.pooled_features(c4_feat, rois)
        x = self.mega.pre_calculate(pooled)
        return x * valid[:, None].astype(x.dtype)

    def enhance(self, *args, **kw):
        return self.mega.enhance(*args, **kw)

    def enhance_train(self, *args, **kw):
        return self.mega.enhance_train(*args, **kw)

    def predictions(self, enhanced: Array) -> tuple[Array, Array]:
        return self.box_head.predictions(enhanced)


def make_mega_head(det: MegaDetector, name: str | None = None,
                   fused_pe_bias: bool = False,
                   fused_attention: bool = False) -> MEGAHead:
    """The MEGAHead matching a detector's knobs — standalone (unbound)
    construction for the streaming scan. fused_pe_bias switches the
    geometric bias to the pallas kernel; fused_attention fuses the whole
    grouped attention (serving-only; same params either way)."""
    return MEGAHead(
        feat_dim=1024, groups=det.groups, stage=det.stage,
        global_res_stage=det.global_res_stage,
        global_enable=det.global_enable,
        memory_enable=det.memory_enable,
        advanced_num=det.advanced_num, name=name,
        fused_pe_bias=fused_pe_bias,
        fused_attention=fused_attention)


# ---------------------------------------------------------------------------
# Whole-video drivers (host-level orchestration of jitted phases)
# ---------------------------------------------------------------------------

import functools


def _cast_f32_leaves(tree, dtype):
    """Cast fp32 leaves of a param tree to `dtype` (no-op for float32)."""
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree)


@functools.lru_cache(maxsize=None)
def _precompute_jit(det: MegaDetector, key_post_nms: int,
                    compute_dtype: str = "float32"):
    """Jitted per-frame precompute: c4 -> key + ref proposals -> fc0-level
    features. Cached by (det config, key_post_nms, dtype) with params as
    an argument, so repeated detect_video calls — the per-video serving
    loop — reuse one compiled program instead of re-tracing.

    Callers pass params already cast to compute_dtype (_cast_f32_leaves
    OUTSIDE the jit: an in-program cast re-runs per dispatch and measured
    ~14 ms/chunk on-chip)."""
    dt = jnp.dtype(compute_dtype)

    @jax.jit
    def run(cparams, image, image_hw):

        def fwd(m):
            c4 = m.features(image[None], compute_dtype=dt)[0]
            kb, ks, kv = m.propose(c4, image_hw,
                                   post_nms_top_n=key_post_nms)
            key_fc0 = m.frame_fc0(c4, kb, kv).astype(jnp.float32)
            if key_post_nms >= det.base_num:
                # greedy NMS keeps are score-sorted and prefix-stable in
                # max_out, so the ref set (top base_num) is exactly the
                # key set's prefix — skip the duplicate RPN/NMS/RoI pass
                rb, rv = kb[:det.base_num], kv[:det.base_num]
                ref_fc0 = key_fc0[:det.base_num]
            else:
                rb, _, rv = m.propose(c4, image_hw,
                                      post_nms_top_n=det.base_num)
                ref_fc0 = m.frame_fc0(c4, rb, rv).astype(jnp.float32)
            return kb, kv, ks, key_fc0, rb, rv, ref_fc0
        return det.apply(cparams, method=fwd)

    return run


def _precompute_fns(det: MegaDetector, params, *, key_post_nms: int,
                    compute_dtype: str = "float32"):
    """Back-compat shim binding params into the cached jit."""
    run = _precompute_jit(det, key_post_nms, compute_dtype)
    cparams = _cast_f32_leaves(params, jnp.dtype(compute_dtype))
    return lambda image, image_hw: run(cparams, image, image_hw)


@functools.lru_cache(maxsize=None)
def _precompute_chunk_jit(det: MegaDetector, key_post_nms: int, chunk: int,
                          compute_dtype: str = "float32"):
    """Chunked per-frame precompute: `chunk` frames per dispatch.

    The per-frame variant above pays one host->device image transfer and
    one program dispatch per frame; over the remote-TPU link that
    serialized transfer+roundtrip — not device compute — bounded
    detect_video (DEVNOTES serving analysis). Batching frames amortizes
    both, and the backbone/RoI work is embarrassingly parallel across
    frames anyway.

    compute_dtype="bfloat16" runs backbone/C5/fc0 at half the activation
    bandwidth; callers pass params already cast (_cast_f32_leaves outside
    the jit — in-program casting re-ran per dispatch, ~14 ms/chunk). Box
    decode + NMS stay fp32 (MegaDetector.propose) and the fc0 features
    are returned fp32, so the streaming/predict phases are unchanged."""
    dt = jnp.dtype(compute_dtype)

    @jax.jit
    def run(cparams, images, image_hw):

        def fwd(m):
            c4 = m.features(images, compute_dtype=dt)  # (F, H/16, W/16, C)

            def per_frame(c4f):
                kb, ks, kv = m.propose(c4f, image_hw,
                                       post_nms_top_n=key_post_nms)
                key_fc0 = m.frame_fc0(c4f, kb, kv).astype(jnp.float32)
                if key_post_nms >= det.base_num:
                    # greedy NMS keeps are score-sorted and prefix-stable
                    # in max_out, so the ref set (top base_num) is exactly
                    # the key set's prefix
                    rb, rv = kb[:det.base_num], kv[:det.base_num]
                    ref_fc0 = key_fc0[:det.base_num]
                else:
                    rb, _, rv = m.propose(c4f, image_hw,
                                          post_nms_top_n=det.base_num)
                    ref_fc0 = m.frame_fc0(c4f, rb, rv).astype(jnp.float32)
                return kb, kv, ks, key_fc0, rb, rv, ref_fc0

            return jax.vmap(per_frame)(c4)
        return det.apply(cparams, method=fwd)

    return run


@functools.lru_cache(maxsize=None)
def _predict_jit(det: MegaDetector):
    # only the box_head subtree rides the dispatch: handing the full
    # ~500-leaf detector tree to a per-video jit call costs ~25 ms of
    # host-side buffer marshalling over a remote-device tunnel (DEVNOTES
    # "Tunnel degradation") for a program that reads 4 of the leaves.
    # Still goes through the module (flax only resolves the params that
    # predictions() actually touches), so the predictor math has one
    # source of truth.
    @jax.jit
    def predict(bh_params, v):
        return det.apply({"params": {"box_head": bh_params}}, v,
                         method=lambda m, x: m.box_head.predictions(x))

    def run(params, v):
        bh = params["params"]["box_head"]
        # only the two Denses predictions() touches — the c5 subtree
        # would be ~40 more leaves of per-dispatch marshalling
        return predict({"cls_score": bh["cls_score"],
                        "bbox_pred": bh["bbox_pred"]}, v)

    return run


def detect_video(det: MegaDetector, params, images, image_hw, *,
                 key_post_nms: int = 300, seed: int = 0, chunk: int = 4,
                 fused_pe_bias: bool = True,
                 fused_attention: bool | None = None,
                 compute_dtype: str = "float32"):
    """Detect every frame of a video with full MEGA semantics.

    images: (T, H, W, 3) host array or any indexable sequence of (H, W, 3)
    frames — uint8 preferred (4x cheaper host->device transfer; the model
    casts on device). Frames are fed `chunk` at a time to the jitted
    precompute (one transfer + one dispatch per chunk bounds host
    round-trips while capping device memory). compute_dtype="bfloat16"
    runs the backbone/RoI precompute in bf16 (box decode/NMS and the
    streaming attention stay fp32) — the production serving fast path.
    Returns dict of stacked per-frame arrays: proposals (T, Nk, 4),
    proposal_scores, valid, cls_logits (T, Nk, K+1), bbox_deltas,
    visual (T, Nk, 1024).
    """
    if fused_attention is None:
        # default the fused set-attention kernel on for TPU serving
        # (axon = the remote-TPU PJRT plugin); CPU keeps the dense path
        # (the kernel only runs in slow interpret mode there; parity is
        # pinned by tests/test_mega_fused_attention.py) and so does any
        # other backend (the kernel lowers via Mosaic TPU only)
        fused_attention = jax.default_backend() in ("tpu", "axon")
    t_total = len(images)
    chunk = max(1, min(chunk, t_total))
    run = _precompute_chunk_jit(det, key_post_nms, chunk, compute_dtype)
    cparams = _cast_f32_leaves(params, jnp.dtype(compute_dtype))
    hw = jnp.asarray(image_hw)
    outs = []
    for lo in range(0, t_total, chunk):
        hi = min(lo + chunk, t_total)
        imgs = np.stack([np.ascontiguousarray(images[t])
                         for t in range(lo, hi)])
        if hi - lo < chunk:  # pad the tail chunk (sliced off below)
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], chunk - (hi - lo), axis=0)])
        outs.append(run(cparams, jnp.asarray(imgs), hw))
    kb, kv, ks, kf, rb, rv, rf = (
        jnp.concatenate([o[i] for o in outs])[:t_total] for i in range(7))

    glob_idx = None
    if det.global_enable:
        glob_idx = global_indices(t_total, min(det.global_size, t_total),
                                  seed=seed)
    visual = stream_video(
        make_mega_head(det, fused_pe_bias=fused_pe_bias,
                       fused_attention=fused_attention),
        {"params": params["params"]["mega"]},
        key_feat=kf, key_rois=kb, key_valid=kv, key_is_fc0=True,
        ref_feat=rf, ref_rois=rb, ref_valid=rv,
        mem_size=det.window, window=det.window,
        key_loc=det.key_loc, glob_idx=glob_idx,
        compute_dtype=compute_dtype)

    cls_logits, bbox_deltas = _predict_jit(det)(
        params, visual.reshape(-1, 1024))
    nk = kb.shape[1]
    return {"proposals": np.asarray(kb), "proposal_scores": np.asarray(ks),
            "valid": np.asarray(kv),
            "cls_logits": np.asarray(cls_logits).reshape(t_total, nk, -1),
            "bbox_deltas": np.asarray(bbox_deltas).reshape(t_total, nk, -1),
            "visual": np.asarray(visual)}


def extract_video_features(det: MegaDetector, params, images, rois, valid,
                           *, seed: int = 0, batch: int = 8,
                           compute_dtype: str = "float32"):
    """GT-box feature extraction for a whole video (the reference
    FeatureExtractor path, datasets/mega/feature_extractor_vidvrd.py):
    the given boxes serve as key, window, and global proposal sets.

    images: (T, H, W, 3) array, or a callable (lo, hi) -> (hi-lo, H, W, 3)
    that loads frames lazily (long videos don't fit in host RAM as one
    float32 stack); rois: (T, N, 4); valid: (T, N).
    compute_dtype="bfloat16" runs the backbone/RoI pass at half the
    activation bandwidth (fc0 features return fp32; streaming unchanged).
    Returns (T, N, 1024) MEGA-enhanced features.
    """
    t_total = rois.shape[0]
    load = images if callable(images) else (
        lambda lo, hi: images[lo:hi])
    dt = jnp.dtype(compute_dtype)
    cparams = _cast_f32_leaves(params, dt)

    @jax.jit
    def fc0_batch(imgs, rs, vs):
        def fwd(m):
            c4 = m.features(imgs, compute_dtype=dt)
            return jax.vmap(m.frame_fc0)(c4, rs, vs).astype(jnp.float32)
        return det.apply(cparams, method=fwd)

    feats = []
    for lo in range(0, t_total, batch):
        hi = min(lo + batch, t_total)
        pad = batch - (hi - lo)
        imgs = np.asarray(load(lo, hi))
        rs, vs = rois[lo:hi], valid[lo:hi]
        if pad:
            imgs = np.concatenate([imgs, imgs[:1].repeat(pad, 0)])
            rs = np.concatenate([rs, rs[:1].repeat(pad, 0)])
            vs = np.concatenate([vs, vs[:1].repeat(pad, 0)])
        feats.append(np.asarray(fc0_batch(jnp.asarray(imgs),
                                          jnp.asarray(rs),
                                          jnp.asarray(vs)))[:hi - lo])
    fc0 = jnp.asarray(np.concatenate(feats))

    glob_idx = None
    if det.global_enable:
        glob_idx = global_indices(t_total, min(det.global_size, t_total),
                                  seed=seed)
    out = stream_video(
        make_mega_head(det), {"params": params["params"]["mega"]},
        key_feat=fc0, key_rois=jnp.asarray(rois),
        key_valid=jnp.asarray(valid), key_is_fc0=True,
        ref_feat=fc0, ref_rois=jnp.asarray(rois),
        ref_valid=jnp.asarray(valid),
        mem_size=det.window, window=det.window,
        key_loc=det.key_loc, glob_idx=glob_idx,
        compute_dtype=compute_dtype)
    return np.asarray(out)


class _ViewFrames:
    """Lazy augmented view over a frame sequence (host-side resize/flip)."""

    def __init__(self, base, scale: float = 1.0, hflip: bool = False):
        self.base = base
        self.scale = scale
        self.hflip = hflip

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        img = np.asarray(self.base[i])
        if self.scale != 1.0:
            from PIL import Image
            h, w = img.shape[:2]
            # frames are float BGR; PIL resize in uint8 RGB
            im = Image.fromarray(img.astype(np.uint8)[..., ::-1])
            im = im.resize((int(round(w * self.scale)),
                            int(round(h * self.scale))))
            img = np.asarray(im, np.float32)[..., ::-1]
        if self.hflip:
            img = np.ascontiguousarray(img[:, ::-1])
        return img


def detect_video_tta(det: MegaDetector, params, images, image_hw, *,
                     scales=(), hflip: bool = True,
                     key_post_nms: int = 300, seed: int = 0,
                     score_thresh: float = 0.05, nms_thresh: float = 0.5,
                     dets_per_img: int = 100,
                     compute_dtype: str = "float32") -> list[dict]:
    """Test-time-augmented video detection (reference
    mega_core/engine/bbox_aug.py:16-112: the model runs on each augmented
    view — identity, hflip, and resized copies +- their flips — and all
    candidate pools share one per-class NMS).

    Returns one post-processed detection dict per frame.
    """
    h, w = int(image_hw[0]), int(image_hw[1])
    view_specs = [(None, _ViewFrames(images), (h, w))]
    if hflip:
        view_specs.append(("hflip", _ViewFrames(images, hflip=True),
                           (h, w)))
    for s in scales:
        sh, sw = int(round(h * s)), int(round(w * s))
        fx, fy = sw / w, sh / h
        view_specs.append((("scale", fx, fy),
                           _ViewFrames(images, scale=s), (sh, sw)))
        if hflip:
            view_specs.append((("scale_hflip", fx, fy),
                               _ViewFrames(images, scale=s, hflip=True),
                               (sh, sw)))

    outs = []
    for tfm, frames, vhw in view_specs:
        out = detect_video(det, params, frames,
                           np.asarray(vhw, np.float32),
                           key_post_nms=key_post_nms, seed=seed,
                           compute_dtype=compute_dtype)
        outs.append((tfm, out))

    t_total = len(images)
    results = []
    for t in range(t_total):
        views = [(out["proposals"][t], out["cls_logits"][t],
                  out["bbox_deltas"][t], out["valid"][t], tfm)
                 for tfm, out in outs]
        results.append(postprocess_frame_tta(
            views, (h, w), score_thresh=score_thresh,
            nms_thresh=nms_thresh, dets_per_img=dets_per_img))
    return results


# ---------------------------------------------------------------------------
# Host post-processing (decode + NMS + TTA)
# ---------------------------------------------------------------------------

def _decode_candidates(boxes, cls_logits, bbox_deltas, valid, image_hw,
                       score_thresh):
    """Per-class decoded candidate pools: {class: (boxes, scores)}."""
    num_classes = cls_logits.shape[1] - 1
    probs = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    h, w = image_hw
    out = {}
    for c in range(1, num_classes + 1):
        scores_c = probs[:, c]
        keep = (scores_c > score_thresh) & valid
        if not keep.any():
            continue
        deltas_c = bbox_deltas[keep, 4 * c:4 * (c + 1)]
        boxes_c = np.array(rpn_lib.decode_boxes(
            jnp.asarray(boxes[keep]), jnp.asarray(deltas_c),
            weights=(10.0, 10.0, 5.0, 5.0)))
        boxes_c[:, 0::2] = boxes_c[:, 0::2].clip(0, w - 1)
        boxes_c[:, 1::2] = boxes_c[:, 1::2].clip(0, h - 1)
        out[c] = (boxes_c, scores_c[keep])
    return out


def hflip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    """Mirror xyxy boxes around the vertical image axis."""
    out = boxes.copy()
    out[:, 0] = width - 1 - boxes[:, 2]
    out[:, 2] = width - 1 - boxes[:, 0]
    return out


def scale_boxes(boxes: np.ndarray, factor_xy) -> np.ndarray:
    """Rescale xyxy boxes by (fx, fy) — bbox_aug multi-scale mapping
    (reference mega_core/engine/bbox_aug.py + BoxList.resize)."""
    fx, fy = factor_xy
    out = boxes.copy()
    out[:, 0::2] *= fx
    out[:, 1::2] *= fy
    return out


def postprocess_frame(boxes: np.ndarray, cls_logits: np.ndarray,
                      bbox_deltas: np.ndarray, valid: np.ndarray,
                      image_hw, *, score_thresh: float = 0.05,
                      nms_thresh: float = 0.5,
                      dets_per_img: int = 100) -> dict:
    """Per-class decode + NMS (host-side numpy; mirrors maskrcnn-benchmark
    PostProcessor semantics). Returns dict of boxes/scores/labels arrays."""
    return postprocess_frame_tta(
        [(boxes, cls_logits, bbox_deltas, valid, None)], image_hw,
        score_thresh=score_thresh, nms_thresh=nms_thresh,
        dets_per_img=dets_per_img)


def postprocess_frame_tta(views, image_hw, *, score_thresh: float = 0.05,
                          nms_thresh: float = 0.5,
                          dets_per_img: int = 100) -> dict:
    """Decode + NMS over one or more augmented views.

    views: list of (boxes, cls_logits, bbox_deltas, valid, transform) —
    the test-time augmentation of the reference's bbox_aug (reference
    mega_core/engine/bbox_aug.py:16-112): each view is decoded in its own
    frame, mapped back to the original frame by `transform`, and all
    candidate pools share one per-class NMS. transform is None (identity),
    "hflip", ("scale", fx, fy) for a view computed at a resized input, or
    ("scale_hflip", fx, fy).
    """
    h, w = image_hw
    merged: dict[int, list] = {}
    for boxes, cls_logits, bbox_deltas, valid, tfm in views:
        if tfm is None or tfm == "hflip":
            view_hw = image_hw
        else:
            view_hw = (h * tfm[2], w * tfm[1])
        cands = _decode_candidates(boxes, cls_logits, bbox_deltas, valid,
                                   view_hw, score_thresh)
        for c, (bx, sc) in cands.items():
            if tfm == "hflip":
                bx = hflip_boxes(bx, w)
            elif isinstance(tfm, tuple):
                kind, fx, fy = tfm
                if kind == "scale_hflip":
                    bx = hflip_boxes(bx, w * fx)
                bx = scale_boxes(bx, (1.0 / fx, 1.0 / fy))
                bx[:, 0::2] = bx[:, 0::2].clip(0, w - 1)
                bx[:, 1::2] = bx[:, 1::2].clip(0, h - 1)
            merged.setdefault(c, []).append((bx, sc))

    out_boxes, out_scores, out_labels = [], [], []
    for c, pools in merged.items():
        boxes_c = np.concatenate([b for b, _ in pools])
        scores_c = np.concatenate([s for _, s in pools])
        keep_idx, keep_valid = box_ops.nms(
            jnp.asarray(boxes_c), jnp.asarray(scores_c), nms_thresh)
        ki = np.asarray(keep_idx)[np.asarray(keep_valid)]
        out_boxes.append(boxes_c[ki])
        out_scores.append(scores_c[ki])
        out_labels.append(np.full(len(ki), c, np.int64))
    if not out_boxes:
        return {"boxes": np.zeros((0, 4), np.float32),
                "scores": np.zeros((0,), np.float32),
                "labels": np.zeros((0,), np.int64)}
    boxes = np.concatenate(out_boxes)
    scores = np.concatenate(out_scores)
    labels = np.concatenate(out_labels)
    order = np.argsort(-scores)[:dets_per_img]
    return {"boxes": boxes[order], "scores": scores[order],
            "labels": labels[order]}
