"""Attention kernel parity: Pallas (interpret on CPU) vs XLA einsum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mint_tpu.ops.attention import (multi_head_attention, pallas_attention,
                                    xla_attention)

RNG = np.random.default_rng(41)


def _qkv(b=2, h=10, n=360, d=80, dtype=jnp.float32):
    return tuple(jnp.asarray(RNG.standard_normal((b, h, n, d)), dtype)
                 for _ in range(3))


@pytest.mark.parametrize("head_block", [1, 2, 5, 10])
def test_pallas_matches_xla(head_block):
    q, k, v = _qkv()
    a = np.asarray(xla_attention(q, k, v, 0.05))
    b = np.asarray(pallas_attention(q, k, v, 0.05,
                                    head_block=head_block))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_pallas_handles_unpadded_shapes():
    # N=360 pads to 384, D=80 pads to 128; padded keys must not leak.
    q, k, v = _qkv(b=1, h=2, n=37, d=16)
    a = np.asarray(xla_attention(q, k, v, 0.1))
    b = np.asarray(pallas_attention(q, k, v, 0.1, head_block=2))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_dispatch_flag():
    q, k, v = _qkv(b=1, h=2, n=16, d=8)
    a = np.asarray(multi_head_attention(q, k, v, 0.2, use_pallas=False))
    b = np.asarray(multi_head_attention(q, k, v, 0.2, use_pallas=True))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_softmax_rows_normalized():
    q, k, v = _qkv(b=1, h=1, n=8, d=8)
    ones = jnp.ones_like(v)
    out = np.asarray(pallas_attention(q, k, ones, 0.3, head_block=1))
    # With V = 1, attention output is the softmax row-sum = 1 everywhere.
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_pallas_attention_differentiable():
    """use_pallas=True must support backprop (custom VJP routes the
    backward through the equivalent XLA formulation)."""
    q, k, v = _qkv(b=1, h=2, n=24, d=16)

    def loss_p(q, k, v):
        return jnp.sum(pallas_attention(q, k, v, 0.1, 2) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(xla_attention(q, k, v, 0.1) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
