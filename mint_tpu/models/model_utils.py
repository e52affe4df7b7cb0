"""Model helper functions (reference ``mint/core/base_model_util.py``).

JAX re-implementations of the full helper surface — masks, dropout, gelu,
the activation registry, gather/split utilities, masked scaled-dot-product
attention.  Note: on the shipped FACT path these are capability parity
(the reference never wires the mask/spatial helpers into `Attention`,
base_models.py:75-88); they are exercised by masked/spatial model variants
and tests.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array] = None,
            deterministic: bool = True) -> jax.Array:
    """Inverted dropout (base_model_util.py:21-36)."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def create_look_ahead_mask(seq_length: int,
                           batch_size: int = 0) -> jax.Array:
    """Causal mask: 1 where attention is DISALLOWED
    (base_model_util.py:39-52)."""
    mask = 1.0 - jnp.tril(jnp.ones((seq_length, seq_length)))
    if batch_size > 0:
        mask = jnp.repeat(mask[None], batch_size, axis=0)
    return mask


def create_attention_mask_from_input_mask(from_tensor: jax.Array,
                                          to_mask: jax.Array) -> jax.Array:
    """[B, F, ...] x [B, T] -> [B, F, T] broadcast padding mask
    (base_model_util.py:55-86)."""
    batch_size, from_seq = from_tensor.shape[0], from_tensor.shape[1]
    to_seq = to_mask.shape[1]
    to_mask = to_mask.reshape(batch_size, 1, to_seq).astype(jnp.float32)
    ones = jnp.ones((batch_size, from_seq, 1), jnp.float32)
    return ones * to_mask


def create_initializer(initializer_range: float = 0.02):
    """Truncated-normal initializer (base_model_util.py:89-91)."""
    from flax import linen as nn
    return nn.initializers.truncated_normal(stddev=initializer_range,
                                            lower=-2.0, upper=2.0)


def gelu(x: jax.Array) -> jax.Array:
    """Tanh-approximated GELU (base_model_util.py:94-107) — the single
    implementation lives in :mod:`mint_tpu.models.layers`."""
    from mint_tpu.models.layers import gelu_tanh
    return gelu_tanh(x)


def get_activation(activation_string) -> Optional[Callable]:
    """Activation registry (base_model_util.py:110-144); shares the
    layers.ACTIVATIONS table."""
    from mint_tpu.models.layers import ACTIVATIONS
    if not isinstance(activation_string, str):
        return activation_string
    if not activation_string:
        return None
    act = activation_string.lower()
    if act not in ACTIVATIONS:
        raise ValueError(f"Unsupported activation: {act}")
    return ACTIVATIONS[act]


def get_shape_list(tensor: jax.Array) -> list:
    """Static shape list (base_model_util.py:147-171; JAX shapes are
    always static under jit)."""
    return list(tensor.shape)


def gather_indexes(sequence_tensor: jax.Array,
                   positions: jax.Array) -> jax.Array:
    """Gather vectors at `positions` per batch row
    (base_model_util.py:174-188)."""
    batch_size, seq_length, width = sequence_tensor.shape
    flat_offsets = (jnp.arange(batch_size, dtype=jnp.int32)
                    * seq_length).reshape(-1, 1)
    flat_positions = (positions + flat_offsets).reshape(-1)
    flat = sequence_tensor.reshape(batch_size * seq_length, width)
    return flat[flat_positions].reshape(batch_size, -1, width)


def split_heads(x: jax.Array, num_attention_heads: int) -> jax.Array:
    """Split embedding into heads; supports the 4-D spatial-attention
    layout (base_model_util.py:191-219)."""
    depth = x.shape[-1] // num_attention_heads
    if x.ndim == 4:  # [B, T, J, D] -> [B, T, H, J, d]
        b, t, j, _ = x.shape
        x = x.reshape(b, t, j, num_attention_heads, depth)
        return jnp.transpose(x, (0, 1, 3, 2, 4))
    if x.ndim == 3:  # [B, T, D] -> [B, H, T, d]
        b, t, _ = x.shape
        x = x.reshape(b, t, num_attention_heads, depth)
        return jnp.transpose(x, (0, 2, 1, 3))
    raise ValueError("Unsupported input tensor dimension.")


def scaled_dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                                 mask: Optional[jax.Array] = None
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Masked SDPA, per-head-dim scaling (base_model_util.py:222-253).

    Mask semantics: 1 = disallowed (added as -1e9 to the logits).
    """
    logits = jnp.einsum("...id,...jd->...ij", q, k)
    logits = logits / jnp.sqrt(jnp.asarray(k.shape[-1], jnp.float32))
    if mask is not None:
        logits = logits + mask * -1e9
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...ij,...jd->...id", weights, v), weights
