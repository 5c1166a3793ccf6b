"""Detector training objective (RPN + box head), static shapes.

Faster-RCNN-style losses mirroring the reference's maskrcnn-benchmark
pipeline (reference mega_core/modeling/rpn/loss.py,
roi_heads/box_head/loss.py, matcher.py, balanced_positive_negative_sampler
.py) reworked without dynamic shapes:

  * IoU matcher with low/high thresholds and force-matching of each GT's
    best anchor,
  * "balanced" pos/neg subsampling as a top-k over random priorities
    (static sample counts; shortfall handled by weight masks),
  * binary objectness + smooth-L1 for the RPN; per-class CE + smooth-L1
    for the box head.

MEGA training composes these with the full reference scheme
(mega_detector_losses): key + local/memory/global reference frames through
a shared backbone (generalized_rcnn_mega.py:80-135), per-frame "ref"
proposals feeding the relation head, box-head losses on the MEGA-enhanced
predictions, and the memory branch under stop_gradient.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.boxes import box_iou
from . import rpn as rpn_lib

Array = jax.Array


class MatchResult(NamedTuple):
    matched_idx: Array   # (N,) index of matched gt (clamped)
    labels: Array        # (N,) 1 pos / 0 neg / -1 ignore


def match_boxes(candidates: Array, gt_boxes: Array, gt_valid: Array, *,
                high: float, low: float,
                force_match: bool = True) -> MatchResult:
    """IoU matcher (reference mega_core/modeling/matcher.py semantics)."""
    iou = box_iou(candidates, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(best_iou >= high, 1, jnp.where(best_iou < low, 0, -1))
    if force_match:
        # each valid gt's highest-IoU candidate becomes positive
        best_cand = jnp.argmax(iou, axis=0)             # (G,)
        force = jnp.zeros(candidates.shape[0], bool).at[best_cand].set(
            gt_valid)
        labels = jnp.where(force, 1, labels)
        best_gt = jnp.where(
            force, jnp.argmax(jnp.where(force[:, None],
                                        iou, -jnp.inf), axis=1), best_gt)
    return MatchResult(best_gt, labels)


def balanced_sample(labels: Array, rng: Array, *, num_samples: int,
                    pos_fraction: float) -> tuple[Array, Array]:
    """Random balanced pos/neg selection with static counts.

    Returns (pos_weight, neg_weight) float arrays over all candidates;
    weights are 1 for selected entries (up to the static quota — when fewer
    positives exist than the quota, only the existing ones get weight)."""
    n = labels.shape[0]
    n_pos = min(int(num_samples * pos_fraction), n)
    n_neg = min(num_samples - n_pos, n)
    prio = jax.random.uniform(rng, (n,))
    pos_p = jnp.where(labels == 1, prio, -1.0)
    neg_p = jnp.where(labels == 0, prio, -1.0)
    pos_thr = jax.lax.top_k(pos_p, n_pos)[0][-1]
    neg_thr = jax.lax.top_k(neg_p, n_neg)[0][-1]
    pos_w = ((labels == 1) & (pos_p >= jnp.maximum(pos_thr, 0.0))
             ).astype(jnp.float32)
    neg_w = ((labels == 0) & (neg_p >= jnp.maximum(neg_thr, 0.0))
             ).astype(jnp.float32)
    return pos_w, neg_w


def smooth_l1(x: Array, beta: float = 1.0 / 9) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def rpn_losses(anchors: Array, objectness: Array, box_deltas: Array,
               gt_boxes: Array, gt_valid: Array, rng: Array, *,
               batch_per_image: int = 256,
               pos_fraction: float = 0.5) -> dict:
    """objectness: (N,), box_deltas: (N, 4)."""
    match = match_boxes(anchors, gt_boxes, gt_valid, high=0.7, low=0.3)
    pos_w, neg_w = balanced_sample(match.labels, rng,
                                   num_samples=batch_per_image,
                                   pos_fraction=pos_fraction)
    w = pos_w + neg_w
    tgt = (match.labels == 1).astype(jnp.float32)
    bce = jnp.maximum(objectness, 0) - objectness * tgt + jnp.log1p(
        jnp.exp(-jnp.abs(objectness)))
    denom = jnp.maximum(jnp.sum(w), 1.0)
    cls_loss = jnp.sum(w * bce) / denom

    reg_tgt = rpn_lib.encode_boxes(gt_boxes[match.matched_idx], anchors)
    diff = jnp.where(pos_w[:, None] > 0, box_deltas - reg_tgt, 0.0)
    reg = jnp.sum(smooth_l1(diff), axis=-1)
    reg_loss = jnp.sum(pos_w * reg) / denom
    return {"loss_rpn_cls": cls_loss, "loss_rpn_reg": reg_loss}


def box_head_losses(proposals: Array, proposals_valid: Array,
                    cls_logits: Array, bbox_deltas: Array, gt_boxes: Array,
                    gt_labels: Array, gt_valid: Array, rng: Array, *,
                    batch_per_image: int = 256, pos_fraction: float = 0.25,
                    reg_weights=(10.0, 10.0, 5.0, 5.0)) -> dict:
    """cls_logits: (P, K+1); bbox_deltas: (P, 4(K+1))."""
    match = match_boxes(proposals, gt_boxes, gt_valid, high=0.5, low=0.5,
                        force_match=False)
    labels = jnp.where(proposals_valid, match.labels, -1)
    pos_w, neg_w = balanced_sample(labels, rng,
                                   num_samples=batch_per_image,
                                   pos_fraction=pos_fraction)
    w = pos_w + neg_w
    cls_tgt = jnp.where(labels == 1, gt_labels[match.matched_idx], 0)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, cls_tgt[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    cls_loss = jnp.sum(w * ce) / denom

    reg_tgt = rpn_lib.encode_boxes(gt_boxes[match.matched_idx], proposals,
                                   weights=reg_weights)
    # gather the deltas of the target class
    p = proposals.shape[0]
    idx = cls_tgt[:, None] * 4 + jnp.arange(4)[None, :]
    deltas_c = jnp.take_along_axis(bbox_deltas, idx, axis=1)
    diff = jnp.where(pos_w[:, None] > 0, deltas_c - reg_tgt, 0.0)
    reg = jnp.sum(smooth_l1(diff), axis=-1)
    reg_loss = jnp.sum(pos_w * reg) / denom
    return {"loss_box_cls": cls_loss, "loss_box_reg": reg_loss}


def mega_detector_losses(det_module, params, key_image: Array,
                         local_images: Array, mem_images: Array | None,
                         glob_images: Array | None, image_hw: Array,
                         gt_boxes: Array, gt_labels: Array, gt_valid: Array,
                         rng: Array, *, post_nms_top_n: int = 128) -> dict:
    """The MEGA training scheme (reference generalized_rcnn_mega.py
    _forward_train, :80-135): key + local + memory + global reference
    frames through the SHARED backbone; RPN losses on the key frame;
    per-frame "ref" proposals (top base_num) feed the relation head; the
    box-head losses are computed on predictions from the MEGA-ENHANCED
    features, so the attention machinery receives gradient. The memory
    branch runs under stop_gradient (reference torch.no_grad,
    roi_box_feature_extractors.py:844,:850).

    key_image: (H, W, 3); local_images: (L, H, W, 3) sampled local ref
    frames (vid_mega.py:_get_train offsets); mem_images: (M, H, W, 3) or
    None; glob_images: (G, H, W, 3) or None. Image-dataset (COCO) training
    passes copies of the key frame, exactly like the reference
    (vid_mega.py:65-73).
    """
    fwd = make_train_forward(det_module, key_image, local_images,
                             mem_images, glob_images, image_hw,
                             post_nms_top_n=post_nms_top_n,
                             gt_boxes=gt_boxes, gt_valid=gt_valid)
    (anchors, obj, dl, proposals, pvalid, cls_logits,
     bbox_deltas) = det_module.apply(params, method=fwd)

    r1, r2 = jax.random.split(rng)
    losses = rpn_losses(anchors, obj, dl, gt_boxes, gt_valid, r1)
    losses.update(box_head_losses(proposals, pvalid, cls_logits,
                                  bbox_deltas, gt_boxes, gt_labels,
                                  gt_valid, r2))
    losses["total_loss"] = sum(losses.values())
    return losses


def make_train_forward(det_module, key_image: Array, local_images: Array,
                       mem_images: Array | None, glob_images: Array | None,
                       image_hw: Array, *, post_nms_top_n: int = 128,
                       gt_boxes: Array | None = None,
                       gt_valid: Array | None = None):
    """The training forward as a bound-module closure — shared between
    mega_detector_losses (apply, with gt appended to the key proposal
    set like the reference rpn's add_gt_proposals,
    mega_core/modeling/rpn/inference.py:149-151) and parameter init
    (without gt — all parameters are shape-independent)."""
    from .mega import BoxSet, flatten_set

    n_l = local_images.shape[0]
    n_m = 0 if mem_images is None else mem_images.shape[0]
    n_g = 0 if glob_images is None else glob_images.shape[0]

    def fwd(m):
        parts = [key_image[None], local_images]
        if n_m:
            parts.append(mem_images)
        if n_g:
            parts.append(glob_images)
        c4_all = m.features(jnp.concatenate(parts, axis=0))
        c4_key = c4_all[0]

        # RPN objective on the key frame
        logits, deltas = m.rpn_head(c4_key[None])
        hp, wp, a = logits.shape[1], logits.shape[2], logits.shape[3]
        anchors = jnp.asarray(rpn_lib.make_anchors(hp, wp))
        obj = logits[0].reshape(-1)
        dl = deltas[0].reshape(-1, 4)
        key_boxes, _, key_valid = rpn_lib.select_proposals(
            anchors, jax.lax.stop_gradient(obj),
            jax.lax.stop_gradient(dl), image_hw,
            pre_nms_top_n=2000, post_nms_top_n=post_nms_top_n)
        if gt_boxes is not None:
            # add_gt_proposals: guarantees positives for the box head
            # even when the RPN is still weak (train only)
            key_boxes = jnp.concatenate([key_boxes, gt_boxes], axis=0)
            key_valid = jnp.concatenate([key_valid, gt_valid], axis=0)

        def ref_set(c4):
            """REF-version proposals + fc0-level features for one frame
            (reference rpn version="ref" + pre_calculate)."""
            b, _, v = m.propose(c4, image_hw,
                                post_nms_top_n=det_module.base_num)
            b = jax.lax.stop_gradient(b)
            return m.frame_fc0(c4, b, v), b, v

        # local window = [key's own ref set, local frames] (reference
        # proposals_l_list ordering, generalized_rcnn_mega.py:103-108)
        win_f, win_b, win_v = jax.vmap(ref_set)(c4_all[:1 + n_l])
        window = BoxSet(win_f, win_b, win_v)

        mem_frames = None
        if n_m:
            mf, mb, mv = jax.vmap(ref_set)(c4_all[1 + n_l:1 + n_l + n_m])
            mem_frames = jax.tree.map(
                jax.lax.stop_gradient, BoxSet(mf, mb, mv))

        glob = None
        if n_g:
            gf, gb, gv = jax.vmap(ref_set)(c4_all[1 + n_l + n_m:])
            glob = flatten_set(BoxSet(gf, gb, gv))

        key_pooled = m.box_head.pooled_features(c4_key, key_boxes)
        x = m.enhance_train(key_pooled, key_boxes, key_valid, window,
                            mem_frames, glob)
        cls_logits, bbox_deltas = m.box_head.predictions(x)
        return (anchors, obj, dl, key_boxes, key_valid, cls_logits,
                bbox_deltas)

    return fwd


# ---------------------------------------------------------------------------
# Non-MEGA method training forwards (reference trains whichever
# MODEL.VID.METHOD the config selects through one train_mega.py; each
# GeneralizedRCNN* variant defines its own _forward_train)
# ---------------------------------------------------------------------------

def _rpn_on_map(m, feat_map: Array):
    """RPN head on a (1, h, w, C) feature map -> (anchors, objectness,
    deltas) flattened over locations x anchors."""
    logits, deltas = m.rpn_head(feat_map)
    hp, wp = logits.shape[1], logits.shape[2]
    anchors = jnp.asarray(rpn_lib.make_anchors(hp, wp))
    return anchors, logits[0].reshape(-1), deltas[0].reshape(-1, 4)


def _train_rois(anchors: Array, obj: Array, dl: Array, image_hw: Array,
                gt_boxes: Array | None, gt_valid: Array | None, *,
                post_nms_top_n: int):
    """Train-time proposal selection: RPN boxes under stop_gradient plus
    the GT boxes appended (reference add_gt_proposals,
    mega_core/modeling/rpn/inference.py:149-151)."""
    boxes, _, valid = rpn_lib.select_proposals(
        anchors, jax.lax.stop_gradient(obj), jax.lax.stop_gradient(dl),
        image_hw, pre_nms_top_n=2000, post_nms_top_n=post_nms_top_n)
    if gt_boxes is not None:
        boxes = jnp.concatenate([boxes, gt_boxes], axis=0)
        valid = jnp.concatenate([valid, gt_valid], axis=0)
    return boxes, valid


def _losses_from_forward(out, gt_boxes, gt_labels, gt_valid, rng):
    (anchors, obj, dl, boxes, valid, cls_logits, bbox_deltas) = out
    r1, r2 = jax.random.split(rng)
    losses = rpn_losses(anchors, obj, dl, gt_boxes, gt_valid, r1)
    losses.update(box_head_losses(boxes, valid, cls_logits, bbox_deltas,
                                  gt_boxes, gt_labels, gt_valid, r2))
    losses["total_loss"] = sum(losses.values())
    return losses


def make_base_train_forward(det_module, key_image: Array, image_hw: Array,
                            *, post_nms_top_n: int = 128,
                            gt_boxes: Array | None = None,
                            gt_valid: Array | None = None):
    """Plain Faster-RCNN training forward (reference
    generalized_rcnn.py:48-65): backbone -> RPN -> pooled head on the key
    frame alone."""
    def fwd(m):
        feat = m.features(key_image[None])
        anchors, obj, dl = _rpn_on_map(m, feat)
        boxes, valid = _train_rois(anchors, obj, dl, image_hw, gt_boxes,
                                   gt_valid, post_nms_top_n=post_nms_top_n)
        pooled = m.pooled(feat[0], boxes)
        cls_logits, bbox_deltas = m.head(pooled)
        return anchors, obj, dl, boxes, valid, cls_logits, bbox_deltas
    return fwd


def make_fgfa_train_forward(det_module, key_image: Array,
                            ref_images: Array, image_hw: Array, *,
                            post_nms_top_n: int = 128,
                            gt_boxes: Array | None = None,
                            gt_valid: Array | None = None):
    """FGFA training forward (reference generalized_rcnn_fgfa.py:107-139):
    backbone over key+refs, flow-warp ref features onto the key frame,
    cosine-softmax aggregate, then RPN AND box head on the AGGREGATED
    map (the reference's rpn/roi_heads both consume `feats`)."""
    def fwd(m):
        feats = m.features(jnp.concatenate([key_image[None], ref_images],
                                           axis=0))
        agg = m.fgfa.aggregate_train(key_image[None], ref_images,
                                     feats[:1], feats[1:])
        anchors, obj, dl = _rpn_on_map(m, agg)
        boxes, valid = _train_rois(anchors, obj, dl, image_hw, gt_boxes,
                                   gt_valid, post_nms_top_n=post_nms_top_n)
        chw = agg[0].transpose(2, 0, 1)
        from ..ops import boxes as box_ops
        crops = box_ops.roi_align(chw, boxes, spatial_scale=1.0 / 16,
                                  output_size=(14, 14), sampling_ratio=2)
        pooled = m.c5(crops.transpose(0, 2, 3, 1))
        cls_logits, bbox_deltas = m.head(pooled)
        return anchors, obj, dl, boxes, valid, cls_logits, bbox_deltas
    return fwd


def make_dff_train_forward(det_module, key_image: Array, ref_image: Array,
                           image_hw: Array, *, post_nms_top_n: int = 128,
                           gt_boxes: Array | None = None,
                           gt_valid: Array | None = None):
    """DFF training forward (reference generalized_rcnn_dff.py:92-115):
    backbone runs on the REF frame only; flow from (cur, ref) warps the
    ref features to the current frame, scaled by the flownet scale map;
    RPN + box head on the propagated map. ref_image: (1, H, W, 3), the
    single DFF ref (vid_dff.py samples one offset in [-9, 0])."""
    def fwd(m):
        feats_ref = m.features(ref_image)
        prop = m.dff.propagate(key_image[None], ref_image, feats_ref)
        anchors, obj, dl = _rpn_on_map(m, prop)
        boxes, valid = _train_rois(anchors, obj, dl, image_hw, gt_boxes,
                                   gt_valid, post_nms_top_n=post_nms_top_n)
        chw = prop[0].transpose(2, 0, 1)
        from ..ops import boxes as box_ops
        crops = box_ops.roi_align(chw, boxes, spatial_scale=1.0 / 16,
                                  output_size=(14, 14), sampling_ratio=2)
        pooled = m.c5(crops.transpose(0, 2, 3, 1))
        cls_logits, bbox_deltas = m.head(pooled)
        return anchors, obj, dl, boxes, valid, cls_logits, bbox_deltas
    return fwd


def make_rdn_train_forward(det_module, key_image: Array, ref_images: Array,
                           image_hw: Array, *, post_nms_top_n: int = 128,
                           gt_boxes: Array | None = None,
                           gt_valid: Array | None = None):
    """RDN training forward (reference generalized_rcnn_rdn.py:75-106 +
    RDNFeatureExtractor._forward_train): shared backbone over key+refs;
    key-version proposals for the RPN objective; ref-version proposals of
    [key, refs...] form the attention reference set; box-head losses on
    the RDN-enhanced predictions."""
    from .mega import BoxSet

    n_r = ref_images.shape[0]

    def fwd(m):
        c4_all = m.features(jnp.concatenate([key_image[None], ref_images],
                                            axis=0))
        c4_key = c4_all[0]
        anchors, obj, dl = _rpn_on_map(m, c4_key[None])
        key_boxes, key_valid = _train_rois(
            anchors, obj, dl, image_hw, gt_boxes, gt_valid,
            post_nms_top_n=post_nms_top_n)

        def ref_set(c4):
            b, _, v = m.propose(c4, image_hw,
                                post_nms_top_n=det_module.base_num)
            b = jax.lax.stop_gradient(b)
            return m.frame_fc0(c4, b, v), b, v

        # frame-major (F, B, ...) window — RDNHead.enhance flattens
        # internally (and needs the per-frame layout for the advanced
        # distillation stage's first-advanced_num-per-frame selection)
        rf, rb, rv = jax.vmap(ref_set)(c4_all[:1 + n_r])
        window = BoxSet(rf, rb, rv)

        key_pooled = m.box_head.pooled_features(c4_key, key_boxes)
        x = m.rdn.enhance(key_pooled, key_boxes, key_valid, window)
        cls_logits, bbox_deltas = m.box_head.predictions(x)
        return anchors, obj, dl, key_boxes, key_valid, cls_logits, \
            bbox_deltas
    return fwd


_METHOD_FORWARDS = {
    "base": lambda det, s, hw, **kw: make_base_train_forward(
        det, s["key"], hw, **kw),
    "fgfa": lambda det, s, hw, **kw: make_fgfa_train_forward(
        det, s["key"], s["ref"], hw, **kw),
    "dff": lambda det, s, hw, **kw: make_dff_train_forward(
        det, s["key"], s["ref"], hw, **kw),
    "rdn": lambda det, s, hw, **kw: make_rdn_train_forward(
        det, s["key"], s["ref"], hw, **kw),
}


def method_detector_losses(method: str, det_module, params, sample: dict,
                           image_hw: Array, gt_boxes: Array,
                           gt_labels: Array, gt_valid: Array, rng: Array,
                           *, post_nms_top_n: int = 128) -> dict:
    """Per-image training losses for the base/rdn/fgfa/dff methods.
    sample: {"key": (H, W, 3)} plus {"ref": (R, H, W, 3)} where the
    method consumes reference frames. (MEGA keeps its dedicated
    mega_detector_losses — its sample carries three reference kinds.)"""
    fwd = _METHOD_FORWARDS[method](det_module, sample, image_hw,
                                   post_nms_top_n=post_nms_top_n,
                                   gt_boxes=gt_boxes, gt_valid=gt_valid)
    out = det_module.apply(params, method=fwd)
    return _losses_from_forward(out, gt_boxes, gt_labels, gt_valid, rng)


def init_method_train_params(method: str, det_module, rng_key,
                             sample: dict, image_hw: Array, *,
                             post_nms_top_n: int = 128):
    """Init all parameters of a base/rdn/fgfa/dff detector by tracing the
    training forward (jitted — eager flax init is pathologically slow on
    a 1-core host)."""
    fwd = _METHOD_FORWARDS[method](det_module, sample, image_hw,
                                   post_nms_top_n=post_nms_top_n)
    return jax.jit(lambda k: det_module.init(k, method=fwd))(rng_key)


def make_method_train_step(method: str, det_module, tx, *, image_hw,
                           post_nms_top_n: int = 128):
    """Jitted dp-mesh train step for the base/rdn/fgfa/dff methods.

    batch dict: key (B,H,W,3), ref (B,R,H,W,3) (absent/ignored for
    base), gt_boxes (B,G,4), gt_labels (B,G), gt_valid (B,G). The batch
    leading axis shards over the mesh "dp" axis; XLA inserts the
    gradient all-reduce (reference: one sample per DDP rank)."""
    import optax

    if method == "mega":
        return make_detector_train_step(det_module, tx, image_hw=image_hw,
                                        post_nms_top_n=post_nms_top_n)
    hw = jnp.asarray(image_hw)

    @jax.jit
    def step(params, opt_state, batch, rng):
        b = batch["key"].shape[0]

        def loss_fn(params):
            def one(key_img, ref, gtb, gtl, gtv, k):
                sample = {"key": key_img, "ref": ref}
                return method_detector_losses(
                    method, det_module, params, sample, hw, gtb, gtl,
                    gtv, k, post_nms_top_n=post_nms_top_n)
            keys = jax.random.split(rng, b)
            ref = batch.get("ref")
            if ref is None:
                ref = jnp.zeros((b, 0) + batch["key"].shape[1:],
                                batch["key"].dtype)
            losses = jax.vmap(one)(batch["key"], ref, batch["gt_boxes"],
                                   batch["gt_labels"], batch["gt_valid"],
                                   keys)
            mean = jax.tree.map(jnp.mean, losses)
            return mean["total_loss"], mean

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return step


def init_train_params(det_module, rng_key, key_image: Array,
                      local_images: Array, mem_images: Array | None,
                      glob_images: Array | None, image_hw: Array, *,
                      post_nms_top_n: int = 128):
    """Initialize all detector parameters by tracing the training forward.

    Jitted: eager flax init dispatches thousands of tiny kernels and is
    pathologically slow on a 1-core host."""
    fwd = make_train_forward(det_module, key_image, local_images,
                             mem_images, glob_images, image_hw,
                             post_nms_top_n=post_nms_top_n)
    return jax.jit(lambda k: det_module.init(k, method=fwd))(rng_key)


def graft_backbone(params, backbone_pkl: dict):
    """Seed the C4 backbone + C5 head from a converted torchvision
    ResNet pickle ({"c4": ..., "c5": ...}, tools/convert_torch_resnet.py)
    — replaces the reference's `catalog://ImageNetPretrained` load
    (train_mega.py:66-69). Structure and shapes are verified leaf-by-leaf
    by the tree map."""
    def transplant(dst, src):
        def leaf(a, b):
            b = np.asarray(b)
            if a.shape != b.shape:
                raise ValueError(
                    f"backbone graft shape mismatch: {a.shape} vs "
                    f"{b.shape} (is the pickle in torch (O,I,H,W) "
                    "layout? run tools/convert_torch_resnet.py)")
            return jnp.asarray(b, a.dtype)
        return jax.tree.map(leaf, dst, src)

    inner = dict(params["params"])
    inner["backbone"] = transplant(inner["backbone"], backbone_pkl["c4"])
    if "box_head" in inner:          # mega / rdn compositions
        box_head = dict(inner["box_head"])
        box_head["c5"] = transplant(box_head["c5"], backbone_pkl["c5"])
        inner["box_head"] = box_head
    elif "c5" in inner:              # base / fgfa / dff compositions
        inner["c5"] = transplant(inner["c5"], backbone_pkl["c5"])
    return {**params, "params": inner}


def load_finetune_params(params, ckpt_path: str):
    """Weights-only restore of a detector checkpoint into a freshly
    initialized tree (reference finetune_mega.py / Checkpointer
    `ignore` flag: weights come from the checkpoint, optimizer and
    schedule start fresh)."""
    import orbax.checkpoint as ocp

    import os
    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(ckpt_path))
    inner = jax.tree.map(lambda a, b: jnp.asarray(b, a.dtype),
                         params["params"], restored["params"])
    return {**params, "params": inner}


def make_detector_train_step(det_module, tx, *, image_hw,
                             post_nms_top_n: int = 128):
    """Jitted data-parallel detector train step over a dp mesh.

    The reference trains MEGA with DDP (one sample per GPU,
    IMS_PER_BATCH=2 over 2 GPUs, train_mega.py:53-58); here the batch
    leading axis is sharded over the mesh "dp" axis (parallel/mesh.py
    shard_batch) and XLA inserts the gradient all-reduce.

    batch dict: key (B,H,W,3), local (B,L,H,W,3), mem (B,M,H,W,3) with
    M=0 to disable, glob (B,G,H,W,3) with G=0 to disable, gt_boxes
    (B,Gt,4), gt_labels (B,Gt), gt_valid (B,Gt).
    """
    import optax

    hw = jnp.asarray(image_hw)

    @jax.jit
    def step(params, opt_state, batch, rng):
        b = batch["key"].shape[0]
        use_mem = batch["mem"].shape[1] > 0
        use_glob = batch["glob"].shape[1] > 0

        def loss_fn(params):
            def one(key_img, loc, mem, glob, gtb, gtl, gtv, k):
                return mega_detector_losses(
                    det_module, params, key_img, loc,
                    mem if use_mem else None,
                    glob if use_glob else None, hw, gtb, gtl, gtv, k,
                    post_nms_top_n=post_nms_top_n)
            keys = jax.random.split(rng, b)
            losses = jax.vmap(one)(batch["key"], batch["local"],
                                   batch["mem"], batch["glob"],
                                   batch["gt_boxes"], batch["gt_labels"],
                                   batch["gt_valid"], keys)
            mean = jax.tree.map(jnp.mean, losses)
            return mean["total_loss"], mean

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return step


METHOD_REF_OFFSETS = {
    # method: (min_offset, max_offset, ref_num) — reference defaults.py
    "rdn": (-18, 18, 2),    # VID.RDN (:419-424)
    "fgfa": (-9, 9, 2),     # VID.FGFA (:453-458)
    "dff": (-9, 0, 1),      # VID.DFF (:462-463, one ref frame)
    "base": (0, 0, 0),
}


def sample_method_refs(rng: np.random.Generator, method: str,
                       frame_id: int, seg_len: int,
                       ref_num: int | None = None) -> np.ndarray:
    """Reference-frame sampling for the non-MEGA methods (reference
    vid_rdn/vid_fgfa/vid_dff.py _get_train: offsets chosen without
    replacement in [MIN_OFFSET, MAX_OFFSET], clamped to the segment)."""
    lo, hi, n = METHOD_REF_OFFSETS[method]
    if ref_num is not None:
        n = ref_num
    if n == 0:
        return np.zeros((0,), np.int64)
    offsets = rng.choice(hi - lo + 1, size=n, replace=False) + lo
    return np.clip(frame_id + offsets, 0, seg_len - 1)


def sample_ref_indices(rng: np.random.Generator, frame_id: int,
                       seg_len: int, *, n_local: int = 2, n_mem: int = 3,
                       n_glob: int = 2, min_offset: int = -12,
                       max_offset: int = 12,
                       all_frame_interval: int = 25) -> dict:
    """Host-side reference-frame sampling for one key frame (reference
    vid_mega.py:_get_train, :30-64): local offsets uniform in
    [min_offset, max_offset]; memory offsets around
    frame_id - ALL_FRAME_INTERVAL; global frames uniform over the video.
    Returns dict of frame-index arrays {"local", "mem", "glob"}."""
    span = max_offset - min_offset + 1

    def clamp(ids):
        return np.clip(ids, 0, seg_len - 1)

    local = clamp(frame_id + rng.choice(span, size=n_local, replace=False)
                  + min_offset)
    center = max(frame_id - all_frame_interval, 0)
    mem = clamp(center + rng.choice(span, size=n_mem, replace=False)
                + min_offset)
    # keep exactly n_glob frames (static shapes under jit) — sample with
    # replacement only when the video is shorter than n_glob
    glob = rng.choice(seg_len, size=n_glob, replace=seg_len < n_glob)
    return {"local": local, "mem": mem, "glob": glob}
