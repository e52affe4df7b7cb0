"""FACT model shape/semantic tests.

Mirrors reference mint/core/fact_model_test.py:23-54 (shape contract
(2, 360, 225)) plus parity checks the reference lacks: attention scale,
GELU flavor, loss semantics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mint_tpu.config import load_pipeline_config
from mint_tpu.models import FACT, build, init_params, l2_loss
from mint_tpu.models.layers import Transformer, PositionEmbedding, gelu_tanh
from mint_tpu.ops.attention import xla_attention

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


@pytest.fixture(scope="module")
def pipeline():
    return load_pipeline_config(CONFIG)


@pytest.fixture(scope="module")
def small_model(pipeline):
    """Shrink the config for fast tests: hidden 64, 1 layer everywhere."""
    import copy
    cfg = copy.deepcopy(pipeline.multi_modal_model)
    for mod in cfg.fact_model.modality:
        tf = mod.model[0].transformer
        tf.hidden_size = 64
        tf.num_hidden_layers = 1
        tf.num_attention_heads = 4
        tf.intermediate_size = 128
    cm = cfg.fact_model.cross_modal_model.transformer
    cm.hidden_size = 64
    cm.num_hidden_layers = 2
    cm.num_attention_heads = 4
    cm.intermediate_size = 128
    model = build(cfg, is_training=True)
    params = init_params(model, jax.random.PRNGKey(0), batch_size=2)
    return model, params


def test_forward_shape(small_model):
    """Reference fact_model_test asserts output shape (B, 360, 225)."""
    model, params = small_model
    inputs = {
        "motion_input": jnp.ones((2, 120, 225)),
        "audio_input": jnp.ones((2, 240, 35)),
    }
    out = model.apply(params, inputs)
    assert out.shape == (2, 360, 225)
    assert jnp.all(jnp.isfinite(out))


def test_transformer_shape_preserved():
    """Reference base_models_test.py:20-40."""
    tf = Transformer(hidden_size=20, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=40)
    x = jnp.ones((4, 128, 20))
    params = tf.init(jax.random.PRNGKey(0), x)
    out = tf.apply(params, x)
    assert out.shape == (4, 128, 20)


def test_position_embedding_shape_preserved():
    pe = PositionEmbedding(128, 219)
    x = jnp.ones((4, 128, 219))
    params = pe.init(jax.random.PRNGKey(0), x)
    out = pe.apply(params, x)
    assert out.shape == (4, 128, 219)
    # Additive: zero input returns exactly the table.
    table = params["params"]["pos_embedding"]
    np.testing.assert_allclose(pe.apply(params, jnp.zeros((1, 128, 219))),
                               table[None], rtol=1e-6)


def test_gelu_is_tanh_approximation():
    """Must match base_model_util.py:94-107, not erf-GELU."""
    x = jnp.linspace(-4, 4, 101)
    cdf = 0.5 * (1.0 + jnp.tanh(
        jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3)))
    np.testing.assert_allclose(gelu_tanh(x), x * cdf, atol=1e-6)


def test_attention_full_dim_scale():
    """Scores are scaled by hidden_size**-0.5 (base_models.py:63-64)."""
    rng = np.random.RandomState(0)
    b, h, n, d = 2, 2, 8, 4
    dim = h * d
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    out = xla_attention(q, k, v, dim ** -0.5)
    # NumPy reference with the same scale.
    dots = np.einsum("bhid,bhjd->bhij", q, k) * dim ** -0.5
    attn = np.exp(dots - dots.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    expect = np.einsum("bhij,bhjd->bhid", attn, v)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_l2_loss_supervises_first_frames_only():
    """fact_model.py:143-148: loss over pred[:, :target_seq_len]."""
    pred = jnp.ones((2, 360, 225))
    target = jnp.zeros((2, 20, 225))
    assert float(l2_loss(target, pred)) == pytest.approx(1.0)
    # Frames beyond target_seq_len must not contribute.
    pred2 = pred.at[:, 20:].set(1e9)
    assert float(l2_loss(target, pred2)) == pytest.approx(1.0)


def test_cross_modal_width_mismatch_raises(pipeline):
    from mint_tpu.models.layers import CrossModalLayer
    layer = CrossModalLayer(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            out_dim=8)
    a = jnp.ones((1, 4, 16))
    b = jnp.ones((1, 4, 8))
    with pytest.raises(ValueError, match="hidden size"):
        layer.init(jax.random.PRNGKey(0), a, b)


def test_modality_oneof_order_independent():
    """A non-transformer entry before the transformer in the repeated
    `model` list must not break FACT (oneof-scan parity with the
    reference's build_modalities_model)."""
    import copy
    from mint_tpu.config.schema import MLPConfig, ModalityModelConfig
    pipe = load_pipeline_config(CONFIG)
    cfg = copy.deepcopy(pipe.multi_modal_model)
    for mod in cfg.fact_model.modality:
        mod.model.insert(0, ModalityModelConfig(mlp=MLPConfig(out_dim=8)))
    model = build(cfg, is_training=False)
    params = init_params(model, jax.random.PRNGKey(0))
    out = model.apply(params, {
        "motion_input": jnp.zeros((1, 120, 225)),
        "audio_input": jnp.zeros((1, 240, 35))})
    assert out.shape == (1, 360, 225)


def test_first_n_out_truncation_exact(small_model):
    """The decoder's truncated final cross block (first_n_out=1) must be
    EXACT for the rows it computes: identical math to the full forward's
    frame 0, just with the dead query rows dropped."""
    model, params = small_model
    rng = np.random.default_rng(7)
    motion = jnp.asarray(rng.standard_normal((2, 120, 225)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((2, 240, 35)), jnp.float32)

    def full(mdl):
        return mdl.cross(mdl.encode_motion(motion), mdl.encode_audio(audio))

    out_full = model.apply(params, method=full)
    n_tokens = out_full.shape[1]
    # 48 exceeds the small model's token count -> clamps to full width
    # (the flagship decoder uses 48 of 360; see decoder.py).
    for n_out in (1, 3, 48):
        def truncated(mdl):
            return mdl.cross(mdl.encode_motion(motion),
                             mdl.encode_audio(audio), first_n_out=n_out)

        out_trunc = model.apply(params, method=truncated)
        eff = min(n_out, n_tokens)
        assert out_trunc.shape == (2, eff, out_full.shape[-1])
        np.testing.assert_allclose(np.asarray(out_trunc),
                                   np.asarray(out_full[:, :eff]),
                                   rtol=0, atol=1e-6)


def test_abstract_params_matches_init(small_model):
    """abstract_params must return the exact shape/dtype skeleton of
    init_params without materializing anything — it is the restore
    template for the eval and serving CLIs (a stale skeleton would make
    orbax restore into wrong shapes or silently re-materialize)."""
    from mint_tpu.models.fact import abstract_params

    model, params = small_model
    abstract = abstract_params(model, batch_size=2)
    flat_real, tree_real = jax.tree_util.tree_flatten(params)
    flat_abs, tree_abs = jax.tree_util.tree_flatten(abstract)
    assert tree_real == tree_abs
    for r, a in zip(flat_real, flat_abs):
        assert isinstance(a, jax.ShapeDtypeStruct)
        assert a.shape == r.shape and a.dtype == r.dtype
