"""Model helper surface tests (reference base_model_util parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mint_tpu.models import model_utils as mu
from mint_tpu.models.layers import PatchEmbedding

RNG = np.random.default_rng(17)


def test_look_ahead_mask():
    m = np.asarray(mu.create_look_ahead_mask(4))
    # 1 = disallowed (future positions).
    expected = np.triu(np.ones((4, 4)), k=1)
    np.testing.assert_array_equal(m, expected)
    batched = np.asarray(mu.create_look_ahead_mask(4, batch_size=3))
    assert batched.shape == (3, 4, 4)


def test_padding_mask_broadcast():
    from_tensor = jnp.zeros((2, 5, 8))
    to_mask = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    m = np.asarray(mu.create_attention_mask_from_input_mask(from_tensor,
                                                            to_mask))
    assert m.shape == (2, 5, 3)
    np.testing.assert_array_equal(m[0, 0], [1, 1, 0])
    np.testing.assert_array_equal(m[1, 3], [1, 0, 0])


def test_gelu_matches_reference_formula():
    x = jnp.linspace(-3, 3, 101)
    ours = np.asarray(mu.gelu(x))
    ref = np.asarray(jax.nn.gelu(x, approximate=True))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_activation_registry():
    from mint_tpu.models.layers import gelu_tanh
    assert mu.get_activation("linear") is None
    assert mu.get_activation("") is None
    assert mu.get_activation("gelu") is gelu_tanh
    assert mu.get_activation("relu") is jax.nn.relu
    fn = lambda x: x
    assert mu.get_activation(fn) is fn
    with pytest.raises(ValueError):
        mu.get_activation("swish5000")


def test_gather_indexes():
    seq = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    pos = jnp.asarray([[0, 2], [1, 3]])
    out = np.asarray(mu.gather_indexes(seq, pos))
    np.testing.assert_array_equal(out[0, 0], np.asarray(seq[0, 0]))
    np.testing.assert_array_equal(out[0, 1], np.asarray(seq[0, 2]))
    np.testing.assert_array_equal(out[1, 1], np.asarray(seq[1, 3]))


def test_split_heads_3d_and_4d():
    x3 = jnp.zeros((2, 5, 8))
    assert mu.split_heads(x3, 4).shape == (2, 4, 5, 2)
    x4 = jnp.zeros((2, 5, 24, 8))
    assert mu.split_heads(x4, 4).shape == (2, 5, 4, 24, 2)
    with pytest.raises(ValueError):
        mu.split_heads(jnp.zeros((5, 8)), 4)


def test_masked_sdpa_blocks_future():
    q = jnp.asarray(RNG.standard_normal((1, 1, 4, 8)), jnp.float32)
    k = v = jnp.asarray(RNG.standard_normal((1, 1, 4, 8)), jnp.float32)
    mask = mu.create_look_ahead_mask(4)
    out, weights = mu.scaled_dot_product_attention(q, k, v, mask)
    w = np.asarray(weights)[0, 0]
    # Upper triangle (future) must carry ~zero attention.
    assert np.abs(np.triu(w, k=1)).max() < 1e-6
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    # Unmasked path matches softmax(QK/sqrt(d))V.
    out2, _ = mu.scaled_dot_product_attention(q, k, v, None)
    assert np.isfinite(np.asarray(out2)).all()


def test_dropout_semantics():
    x = jnp.ones((100, 100))
    assert np.array_equal(np.asarray(mu.dropout(x, 0.5)), np.asarray(x))
    y = np.asarray(mu.dropout(x, 0.5, rng=jax.random.PRNGKey(0),
                              deterministic=False))
    kept = y > 0
    assert 0.4 < kept.mean() < 0.6
    np.testing.assert_allclose(y[kept], 2.0)  # inverted scaling


def test_patch_embedding_shape():
    model = PatchEmbedding(hidden_size=32, patch_size=4, num_channel=3)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 16, 32)  # (16/4)*(16/4) patches
