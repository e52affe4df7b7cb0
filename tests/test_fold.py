"""LN-affine fold (mint_tpu/models/fold.py): exactness + structure.

The fold is an inference-only weight transform — these tests pin that
the folded (model, params) pair is numerically the same function as the
unfolded one (f32: near machine eps; the decode path's bf16 delta is
covered by the decoder parity tolerances), and that the folded params
tree is EXACTLY the init structure of the ``ln_affine_folded=True``
model, so a structure drift can't silently break ``apply``.
"""

import copy
import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mint_tpu.config import load_pipeline_config
from mint_tpu.models import build, init_params
from mint_tpu.models.fold import fold_for_decode, fold_ln_affines

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


@pytest.fixture(scope="module")
def small_model():
    cfg = copy.deepcopy(load_pipeline_config(CONFIG).multi_modal_model)
    for mod in cfg.fact_model.modality:
        tf = mod.model[0].transformer
        tf.hidden_size = 64
        tf.num_hidden_layers = 2
        tf.num_attention_heads = 4
        tf.intermediate_size = 128
    cm = cfg.fact_model.cross_modal_model.transformer
    cm.hidden_size = 64
    cm.num_hidden_layers = 2
    cm.num_attention_heads = 4
    cm.intermediate_size = 128
    model = build(cfg, is_training=False)
    params = init_params(model, jax.random.PRNGKey(0), batch_size=2)
    # Break the init symmetry: LN scale/bias start at exactly 1/0, where
    # the fold is trivially the identity — perturb them so the test has
    # teeth.
    def perturb(path, leaf):
        name = "/".join(str(p) for p in path)
        if "norm" in name:
            # crc32, not hash(): str hashing is salted per process, and a
            # salt-dependent perturbation would make failures irreproducible.
            key = jax.random.PRNGKey(
                zlib.crc32(name.encode()) % (2 ** 31))
            return leaf + 0.3 * jax.random.normal(key, leaf.shape)
        return leaf
    params = jax.tree_util.tree_map_with_path(perturb, params)
    return model, params


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "motion_input": jnp.asarray(
            rng.standard_normal((2, 120, 225)), jnp.float32),
        "audio_input": jnp.asarray(
            rng.standard_normal((2, 240, 35)), jnp.float32),
    }


def test_folded_structure_matches_folded_init(small_model):
    model, params = small_model
    folded_model, folded_params = fold_for_decode(model, params)
    ref = init_params(folded_model, jax.random.PRNGKey(1), batch_size=2)
    ref_tree = jax.tree_util.tree_structure(ref)
    got_tree = jax.tree_util.tree_structure(folded_params)
    assert ref_tree == got_tree
    shapes_ref = jax.tree_util.tree_map(jnp.shape, ref)
    shapes_got = jax.tree_util.tree_map(jnp.shape, folded_params)
    assert shapes_ref == shapes_got


def test_fold_is_numerically_exact_f32(small_model):
    model, params = small_model
    folded_model, folded_params = fold_for_decode(model, params)
    inputs = _inputs()
    out = model.apply(params, inputs)
    out_folded = folded_model.apply(folded_params, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_folded),
                               rtol=0, atol=2e-4)
    # The delta must be pure rounding, not a bias: relative error small.
    denom = np.maximum(np.abs(np.asarray(out)), 1e-3)
    rel = np.abs(np.asarray(out) - np.asarray(out_folded)) / denom
    assert rel.max() < 5e-4


def test_fold_refuses_double_fold(small_model):
    model, params = small_model
    _, folded_params = fold_for_decode(model, params)
    # A second fold_for_decode on the folded MODEL is a no-op...
    folded_model = model.clone(ln_affine_folded=True)
    m2, p2 = fold_for_decode(folded_model, folded_params)
    assert m2 is folded_model and p2 is folded_params
    # ...but folding already-folded PARAMS directly must fail loudly
    # (no norm entries left -> unchanged; with a synthetic half-folded
    # tree it raises).
    again = fold_ln_affines(folded_params)
    assert (jax.tree_util.tree_structure(again)
            == jax.tree_util.tree_structure(folded_params))


def test_folded_decode_parity(small_model):
    """AR decode: folded bf16 path stays within the decoder's bf16
    tolerance of the unfolded f32 path."""
    from mint_tpu.infer.decoder import infer_auto_regressive

    model, params = small_model
    folded_model, folded_params = fold_for_decode(model, params)
    rng = np.random.default_rng(3)
    motion = jnp.asarray(rng.standard_normal((1, 120, 225)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((1, 260, 35)), jnp.float32)
    inputs = {"motion_input": motion, "audio_input": audio}
    out = infer_auto_regressive(model, params, inputs, steps=8)
    out_f = infer_auto_regressive(folded_model, folded_params, inputs,
                                  steps=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_f),
                               rtol=0, atol=5e-3)
