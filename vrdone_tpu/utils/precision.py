"""Mixed-precision helpers.

Serving runs the network body in bfloat16 (MXU-native): cast params and
inputs with cast_floating; LayerNorm stats / softmax / heads stay f32
inside the model (see MaskVRD.__call__)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast every floating leaf of a pytree to dtype."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def cast_floating_onedispatch(tree, dtype=jnp.bfloat16):
    """cast_floating fused into ONE jitted program.

    Outside jit, the naive tree.map dispatches one convert_element_type
    per leaf — ~50 compiles x 0.5 s each over the remote (axon) dispatch
    path (measured 2026-08-20, ~25 s per cast_floating call in bench).
    One program = one dispatch.
    """
    return jax.jit(cast_floating, static_argnames="dtype")(tree, dtype=dtype)
