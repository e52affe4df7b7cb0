"""Fused Pallas MLP kernel parity (mint_tpu/ops/mlp.py).

On the CPU test mesh the kernel runs in Pallas interpreter mode (same
arithmetic, no Mosaic), pinned against the plain XLA composition it fuses.
The TPU win itself is measured in docs/BENCHMARKS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mint_tpu.ops import mlp as mlp_lib

RNG = np.random.default_rng(5)


@pytest.fixture(autouse=True)
def _interpret_mode():
    mlp_lib._INTERPRET = True
    yield
    mlp_lib._INTERPRET = False


def _params(h=64, f=256, o=64):
    return (jnp.asarray(RNG.standard_normal((h, f)) * 0.05, jnp.float32),
            jnp.asarray(RNG.standard_normal(f) * 0.01, jnp.float32),
            jnp.asarray(RNG.standard_normal((f, o)) * 0.05, jnp.float32),
            jnp.asarray(RNG.standard_normal(o) * 0.01, jnp.float32))


@pytest.mark.parametrize("shape", [(4, 36, 64), (256, 64), (3, 64)])
def test_forward_matches_xla_composition(shape):
    w1, b1, w2, b2 = _params()
    x = jnp.asarray(RNG.standard_normal(shape), jnp.float32)
    got = mlp_lib.fused_mlp(x, w1, b1, w2, b2)
    want = mlp_lib._reference_mlp(x, w1, b1, w2, b2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_row_padding_is_exact():
    """M not a multiple of the tile: padded rows must not leak into real
    outputs."""
    w1, b1, w2, b2 = _params()
    x = jnp.asarray(RNG.standard_normal((257, 64)), jnp.float32)
    got = mlp_lib.fused_mlp(x, w1, b1, w2, b2)
    want = mlp_lib._reference_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_xla_composition():
    w1, b1, w2, b2 = _params()
    x = jnp.asarray(RNG.standard_normal((8, 12, 64)), jnp.float32)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(mlp_lib.fused_mlp(x, w1, b1, w2, b2) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(mlp_lib._reference_mlp(x, w1, b1, w2, b2) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_matches_model_mlp_module():
    """The op consumes the model MLP's own Dense params unchanged: applying
    it to the module's fc1/fc2 kernels reproduces the module output."""
    from mint_tpu.models.layers import MLP

    x = jnp.asarray(RNG.standard_normal((2, 10, 64)), jnp.float32)
    module = MLP(out_dim=64, hidden_dim=256)
    variables = module.init(jax.random.PRNGKey(0), x)
    want = module.apply(variables, x)
    p = variables["params"]
    got = mlp_lib.fused_mlp(x, p["fc1"]["kernel"], p["fc1"]["bias"],
                            p["fc2"]["kernel"], p["fc2"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
