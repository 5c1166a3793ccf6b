"""Reference-checkpoint converter: key-based conversion of a torch
state dict must equal the module-based oracle transplant exactly."""

import numpy as np
import pytest

import jax

from tests.test_model_parity import make_models, small_cfg
from tools.convert_reference_checkpoint import convert_state_dict


@pytest.mark.parametrize("with_clip", [False, True])
def test_converter_matches_oracle(with_clip):
    cfg = small_cfg(with_clip_feature=with_clip,
                    clip_dim=12 if with_clip else None)
    tm, jm, oracle_params = make_models(cfg, seed=7)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    converted = convert_state_dict(sd)

    ref = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(
               oracle_params["params"])[0]}
    got = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(ref) == set(got), (
        sorted(set(ref) ^ set(got))[:6])
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
