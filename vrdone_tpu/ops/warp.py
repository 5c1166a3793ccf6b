"""Flow-field feature warping (torch F.grid_sample equivalents).

The FGFA/DFF detector variants warp reference-frame C4 features along an
optical-flow field (reference mega_core/modeling/detector/
generalized_rcnn_fgfa.py:46-62 get_grid/resample): the flow (N, 2, h, w)
is converted to a normalized sampling grid and sampled bilinearly with
border padding. Reimplemented here on NHWC arrays with the exact
align_corners=True normalization the reference uses
(grid = (flow + base) / ((size-1)/2) - 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample_bilinear(feats: Array, grid: Array,
                         align_corners: bool = False) -> Array:
    """torch.nn.functional.grid_sample(mode="bilinear",
    padding_mode="border") on NHWC inputs.

    feats: (N, H, W, C); grid: (N, Hg, Wg, 2) normalized [-1, 1] xy.
    Returns (N, Hg, Wg, C).

    NOTE the reference BUILDS its grid with the align_corners=True
    normalization (get_grid divides by (size-1)/2) but SAMPLES with
    torch's default align_corners=False — a half-pixel skew that is part
    of the reference behavior; warp_features reproduces it exactly.
    """
    n, h, w, c = feats.shape

    if align_corners:
        # -1 -> 0, +1 -> size-1
        gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
        gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    else:
        # -1 -> -0.5, +1 -> size-0.5 (pixel-center convention)
        gx = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
        gy = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0

    def clamp_x(v):
        return jnp.clip(v, 0, w - 1).astype(jnp.int32)

    def clamp_y(v):
        return jnp.clip(v, 0, h - 1).astype(jnp.int32)

    x0c, x1c = clamp_x(x0), clamp_x(x0 + 1)
    y0c, y1c = clamp_y(y0), clamp_y(y0 + 1)

    def gather(yi, xi):
        # (N, Hg, Wg) index grids into (N, H, W, C)
        return jax.vmap(lambda f, y, x: f[y, x])(feats, yi, xi)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    # lerp weights cast to the feature dtype so bf16 features stay bf16
    # (coords/fractions above are computed in the grid's own precision)
    fx = fx[..., None].astype(feats.dtype)
    fy = fy[..., None].astype(feats.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def flow_to_grid(flow: Array) -> Array:
    """(N, h, w, 2) pixel-displacement flow -> normalized sampling grid
    (reference get_grid, generalized_rcnn_fgfa.py:46-56):
    grid = (flow + base_xy) / ((size-1)/2) - 1."""
    n, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    base = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h,w,2)
    denom = jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0], flow.dtype)
    return (flow + base[None]) / denom - 1.0


def warp_features(feats: Array, flow: Array) -> Array:
    """resample (reference :58-62): warp NHWC feats by an NHWC flow.

    Sampling coordinates always run fp32 — a bf16 normalized grid has
    ~0.26 px of quantization at C4 resolution — while the gathered
    features keep their own dtype (bf16 fast path stays bf16)."""
    return grid_sample_bilinear(feats, flow_to_grid(
        flow.astype(jnp.float32)))
