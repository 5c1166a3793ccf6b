"""Jittable batched Hungarian assignment.

The reference ships every cost matrix to the CPU each training step and runs
scipy's linear_sum_assignment (reference models/maskvrd.py:489-492) — a
device->host sync in the hot loop. Here the assignment runs *inside* the
jitted step: an O(n^3) shortest-augmenting-path Hungarian (potentials /
Jonker-Volgenant style, the same algorithm family as scipy's) written with
lax control flow and vmapped over the batch. Problem sizes are tiny
(num_queries x max_gt <= ~10x10), so this is microseconds on-device.

Convention: cost is (n, n) square, minimized. Rectangular (Q, G) problems
are padded by the caller with a large constant in the invalid columns; the
resulting assignment restricted to valid columns equals the rectangular
optimum because the padding is column-constant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_INF = jnp.float32(1e18)


def hungarian_square(cost: Array) -> Array:
    """Solve a square assignment problem.

    cost: (n, n) float32. Returns row_for_col: (n,) int32 where
    row_for_col[j] is the row assigned to column j.
    """
    n = cost.shape[0]
    assert cost.shape == (n, n)
    cost = cost.astype(jnp.float32)

    def assign_row(state, i):
        u, v, p = state  # u: (n+1,), v: (n+1,), p: (n+1,) row for col, -1 free
        p = p.at[n].set(i)
        minv = jnp.full((n + 1,), _INF)
        way = jnp.zeros((n + 1,), jnp.int32)
        used = jnp.zeros((n + 1,), bool)
        j0 = jnp.int32(n)

        def cond(carry):
            u, v, p, minv, way, used, j0, first = carry
            return first | (p[j0] != -1)

        def body(carry):
            u, v, p, minv, way, used, j0, _ = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0, :] - u[i0] - v[:n]
            real = jnp.logical_not(used[:n])
            better = (cur < minv[:n]) & real
            minv = minv.at[:n].set(jnp.where(better, cur, minv[:n]))
            way = way.at[:n].set(jnp.where(better, j0, way[:n]))
            masked = jnp.where(used[:n], _INF, minv[:n])
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potential update
            rows = jnp.where(used, p, n)  # used cols all have p != -1
            u = u.at[rows].add(jnp.where(used, delta, 0.0))
            v = v + jnp.where(used, -delta, 0.0)
            minv = minv.at[:n].add(jnp.where(used[:n], 0.0, -delta))
            return u, v, p, minv, way, used, j1, False

        u, v, p, minv, way, used, j0, _ = lax.while_loop(
            cond, body, (u, v, p, minv, way, used, j0, True))

        # augment along the alternating path
        def aug_cond(carry):
            p, j0 = carry
            return j0 != n

        def aug_body(carry):
            p, j0 = carry
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p), None

    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((n + 1,), jnp.float32)
    p0 = jnp.full((n + 1,), -1, jnp.int32)
    (_, _, p), _ = lax.scan(assign_row, (u0, v0, p0),
                            jnp.arange(n, dtype=jnp.int32))
    return p[:n]


def match_padded(cost: Array, col_valid: Array) -> tuple[Array, Array]:
    """Assignment for a (Q, G) cost with a validity mask over columns.

    Pads to square (Q >= G required), solves, and returns
    (row_for_col: (G,) int32, matched: (G,) bool) where matched marks valid
    columns (invalid columns receive arbitrary rows; callers must gate on
    `matched`).
    """
    q, g = cost.shape
    assert q >= g, "num_queries must be >= max ground-truth slots"
    # Pad with a *data-derived* constant just above the real cost range.
    # A huge sentinel (1e6+) would push the dual potentials to that scale
    # and erase small cost differences via f32 cancellation in
    # (cost - u - v); observed as suboptimal assignments.
    cost = jnp.nan_to_num(cost, nan=0.0, posinf=0.0, neginf=0.0)
    finite_max = jnp.max(jnp.where(col_valid[None, :], cost, -jnp.inf))
    finite_max = jnp.where(jnp.isfinite(finite_max), finite_max, 0.0)
    big = finite_max + 1.0
    cost = jnp.where(col_valid[None, :], cost, big)
    if q > g:
        pad = jnp.full((q, q - g), 1.0, cost.dtype) * big
        cost_sq = jnp.concatenate([cost, pad], axis=1)
    else:
        cost_sq = cost
    row_for_col = hungarian_square(cost_sq)[:g]
    return row_for_col, col_valid


batched_match = jax.vmap(match_padded, in_axes=(0, 0))
