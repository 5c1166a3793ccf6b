"""MEGA global-stage behavior: the global set influences the output and
padded global slots are inert (reference update_lm,
roi_box_feature_extractors.py:691-700)."""

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.models.mega import MEGAHead, BoxSet


def _rois(rng, n):
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    return jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))


def test_global_stage_changes_output_and_masks_invalid():
    d, f, b, nk, g = 32, 3, 4, 3, 6
    head = MEGAHead(feat_dim=d, groups=4, stage=2, global_res_stage=1,
                    advanced_num=2)
    rng = np.random.default_rng(0)
    key_pooled = jnp.asarray(rng.standard_normal((nk, 16)).astype(
        np.float32))
    key_rois = _rois(rng, nk)
    key_valid = jnp.ones(nk, bool)
    win_pooled = jnp.asarray(rng.standard_normal((f, b, 16)).astype(
        np.float32))
    win_rois = _rois(rng, f * b).reshape(f, b, 4)
    win_valid = jnp.ones((f, b), bool)
    gf = jnp.asarray(rng.standard_normal((g, d)).astype(np.float32))
    gb = _rois(rng, g)
    gv = jnp.asarray([True, True, True, False, False, False])

    def run(p, gfeat, gvalid):
        def fwd(m):
            win = BoxSet(m.pre_calculate(win_pooled), win_rois, win_valid)
            glob = BoxSet(gfeat, gb, gvalid)
            return m.enhance(key_pooled, key_rois, key_valid, win, None,
                             glob)
        return head.apply(p, method=fwd)

    def init_fwd(m):
        win = BoxSet(m.pre_calculate(win_pooled), win_rois, win_valid)
        return m.enhance(key_pooled, key_rois, key_valid, win, None,
                         BoxSet(gf, gb, gv))

    params = head.init(jax.random.key(0), method=init_fwd)
    out = np.asarray(run(params, gf, gv))

    # perturbing a VALID global slot changes the output...
    out2 = np.asarray(run(params, gf.at[0].add(5.0), gv))
    assert np.abs(out - out2).max() > 1e-4
    # ...perturbing an INVALID one does not
    out3 = np.asarray(run(params, gf.at[4].add(100.0), gv))
    np.testing.assert_allclose(out, out3, atol=1e-5)
    # disabling the global set entirely gives a different (still finite)
    # result through the same parameters
    def run_noglob(p):
        def fwd(m):
            win = BoxSet(m.pre_calculate(win_pooled), win_rois, win_valid)
            return m.enhance(key_pooled, key_rois, key_valid, win, None,
                             None)
        return head.apply(p, method=fwd)
    out4 = np.asarray(run_noglob(params))
    assert np.isfinite(out4).all()
    assert np.abs(out - out4).max() > 1e-4
