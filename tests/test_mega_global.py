"""MEGA global-memory stage."""

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.models.mega import MegaEnhancer, init_memory


def test_global_stage_changes_output_and_masks_invalid():
    d, n, mem, g = 32, 4, 2, 6
    enh = MegaEnhancer(feat_dim=d, n_head=4, num_stages=1, mem_frames=mem,
                       props_per_frame=n)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    b = jnp.asarray(np.abs(rng.uniform(1, 50, (n, 4))).astype(np.float32))
    b = b.at[:, 2:].add(b[:, :2])
    vl = jnp.ones((n,), bool)
    mm = init_memory(mem, n, d)
    gf = jnp.asarray(rng.standard_normal((g, d)).astype(np.float32))
    gb = jnp.asarray(np.abs(rng.uniform(1, 50, (g, 4))).astype(np.float32))
    gb = gb.at[:, 2:].add(gb[:, :2])
    gv = jnp.asarray([True, True, True, False, False, False])

    params = enh.init(jax.random.key(0), f, b, vl, *mm, gf, gb, gv)
    out = np.asarray(enh.apply(params, f, b, vl, *mm, gf, gb, gv))

    # perturbing a VALID global slot changes the output...
    gf2 = gf.at[0].add(5.0)
    out2 = np.asarray(enh.apply(params, f, b, vl, *mm, gf2, gb, gv))
    assert np.abs(out - out2).max() > 1e-4
    # ...perturbing an INVALID one does not
    gf3 = gf.at[4].add(100.0)
    out3 = np.asarray(enh.apply(params, f, b, vl, *mm, gf3, gb, gv))
    np.testing.assert_allclose(out, out3, atol=1e-5)
