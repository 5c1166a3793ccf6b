"""full_attention_auto kernel selection.

On CPU (this suite) the flash path must never engage — the function has
to be bit-identical to the dense form. Block-size selection logic is
pinned so eval bucket shapes (multiples of max_div_factor, not
necessarily powers of two) route correctly. Chip-side parity + timing of
the flash path itself: DEVNOTES "Flash attention block-size tuning" and
tools/bench_attention.py --tune.
"""

import numpy as np

import jax.numpy as jnp

from vrdone_tpu.ops import masked as mops


def test_cpu_identical_to_dense():
    rng = np.random.RandomState(0)
    b, t, c, h = 3, 512, 64, 4
    q, k, v = (jnp.asarray(rng.randn(b, t, c), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(t)[None, :] < 300)
    mask = jnp.broadcast_to(mask, (b, t))
    o1 = mops.full_attention(q, k, v, mask, n_head=h)
    o2 = mops.full_attention_auto(q, k, v, mask, n_head=h,
                                  allow_flash=True)
    import jax
    if jax.default_backend() == "tpu":  # flash engages: parity, not bits
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=0, atol=2e-3)
    else:
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_flash_block_selection():
    assert mops._flash_block(512) == 512
    assert mops._flash_block(1024) == 512
    assert mops._flash_block(768) == 256
    assert mops._flash_block(640) == 128
    assert mops._flash_block(96) is None      # VidVRD stays dense
    assert mops._flash_block(528) is None     # non-128-multiple pad
