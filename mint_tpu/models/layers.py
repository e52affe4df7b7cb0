"""Transformer building blocks for the FACT model, in Flax.

Parity contract with the reference (``mint/core/base_models.py``,
``mint/core/base_model_util.py``):

- pre-LN blocks: ``x + Attn(LN(x))`` then ``x + MLP(LN(x))``
  (Residual(Norm(fn)) composition, base_models.py:91-110)
- LayerNorm epsilon 1e-5 (base_models.py:27)
- attention: fused QKV Dense(3*dim, no bias), scores scaled by the FULL
  model dim ** -0.5 (base_models.py:63-64), softmax, output Dense(dim)
- GELU uses the tanh approximation (base_model_util.py:94-107), NOT erf
- additive learned position embedding [seq_len, dim], truncated-normal 0.02
  (base_models.py:141-156)
- no attention masks and no dropout on the shipped FACT config path
  (the reference configures dropout in protos but never applies it in these
  blocks)

Weight layout is chosen so a TF-checkpoint converter is a plain reshape-free
name mapping: every Dense kernel is stored [in_dim, out_dim] like Keras.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from mint_tpu.ops.attention import multi_head_attention

# Keras-compatible initializers: Dense defaults to glorot_uniform + zeros.
_DENSE_KERNEL_INIT = nn.initializers.glorot_uniform()


def trunc_normal(stddev: float = 0.02):
    """Reference `create_initializer` (base_model_util.py:89-91)."""
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0,
                                            upper=2.0)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """Tanh-approximated GELU, matching base_model_util.py:94-107 exactly."""
    return jax.nn.gelu(x, approximate=True)


ACTIVATIONS = {
    "gelu": gelu_tanh,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "linear": None,
}


class Dense(nn.Dense):
    """nn.Dense with Keras-default glorot_uniform kernel init."""

    kernel_init: nn.initializers.Initializer = _DENSE_KERNEL_INIT


class Attention(nn.Module):
    """Unmasked multi-head self-attention (base_models.py:60-88).

    ``qkv_bias`` is off on the reference-parity path; the LN-affine fold
    (mint_tpu/models/fold.py) turns it on to carry the folded pre-LN bias
    term ``beta @ W_qkv``.
    """

    dim: int
    heads: int = 8
    compute_dtype: jnp.dtype = jnp.float32
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, n_queries: int | None = None
                 ) -> jax.Array:
        """Self-attention over x; with ``n_queries=q`` only the first q
        positions attend (keys/values still cover every token), returning
        [b, q, dim].  Exact for those rows — used by the decoder, which
        keeps only output frame 0 of the final block (fact_model.py:128),
        so the other 359 query rows of that block are dead work.
        """
        b, n, _ = x.shape
        scale = self.dim ** -0.5  # full model dim, reference parity
        qkv = Dense(self.dim * 3, use_bias=self.qkv_bias, name="to_qkv",
                    dtype=self.compute_dtype)(x)
        # [b, n, 3*h*d] -> 3 x [b, h, n, d]
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim // self.heads)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        nq = n if n_queries is None else min(n_queries, n)
        if nq != n:
            q = q[:, :, :nq, :]
        out = multi_head_attention(q, k, v, scale)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, nq, self.dim)
        return Dense(self.dim, name="to_out", dtype=self.compute_dtype)(out)


class MLP(nn.Module):
    """GELU feedforward (base_models.py:45-57).

    Always the plain XLA composition: the fused Pallas alternative
    (mint_tpu/ops/mlp.py) wins 26% in isolation but LOSES ~7% embedded in
    the full model at FACT shapes — measured analysis in
    docs/BENCHMARKS.md ("Why the model ships with XLA kernels").
    """

    out_dim: int
    hidden_dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Dense(self.hidden_dim, name="fc1", dtype=self.compute_dtype)(x)
        x = gelu_tanh(x)
        return Dense(self.out_dim, name="fc2", dtype=self.compute_dtype)(x)


class Block(nn.Module):
    """One pre-LN transformer block: Residual(Norm(Attn)) + Residual(Norm(MLP)).

    With ``ln_affine_folded=True`` the two LayerNorms carry no scale/bias
    — the affine is instead pre-multiplied into the adjacent QKV / fc1
    kernels by :func:`mint_tpu.models.fold.fold_ln_affines` (exact: the
    LN output feeds exactly one matmul).  Opt-in only — on TPU v5e the
    folded program measured ~5% SLOWER end-to-end (docs/BENCHMARKS.md,
    round-3 ablations).
    """

    hidden_size: int
    num_heads: int
    intermediate_size: int
    compute_dtype: jnp.dtype = jnp.float32
    ln_affine_folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, n_out: int | None = None) -> jax.Array:
        """With ``n_out=q`` only the first q output tokens are computed
        (the attention keys/values still span all of x) — exact for those
        rows; everything downstream of the attention is row-local.
        """
        affine = not self.ln_affine_folded
        h = nn.LayerNorm(epsilon=1e-5, name="norm_attn",
                         use_scale=affine, use_bias=affine,
                         dtype=self.compute_dtype)(x)
        att = Attention(self.hidden_size, self.num_heads,
                        compute_dtype=self.compute_dtype,
                        qkv_bias=self.ln_affine_folded,
                        name="attn")(h, n_queries=n_out)
        x = (x if n_out is None else x[:, :n_out, :]) + att
        h = nn.LayerNorm(epsilon=1e-5, name="norm_mlp",
                         use_scale=affine, use_bias=affine,
                         dtype=self.compute_dtype)(x)
        x = x + MLP(self.hidden_size, self.intermediate_size,
                    compute_dtype=self.compute_dtype, name="mlp")(h)
        return x


class Transformer(nn.Module):
    """Stack of pre-LN blocks (base_models.py:91-110)."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    initializer_range: float = 0.02
    compute_dtype: jnp.dtype = jnp.float32
    ln_affine_folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, last_n_out: int | None = None
                 ) -> jax.Array:
        """With ``last_n_out=q`` the FINAL block emits only its first q
        tokens (exact; earlier blocks must stay full-width because the
        final block's attention reads every token of their output).
        """
        for i in range(self.num_hidden_layers):
            last = i == self.num_hidden_layers - 1
            x = Block(self.hidden_size, self.num_attention_heads,
                      self.intermediate_size,
                      compute_dtype=self.compute_dtype,
                      ln_affine_folded=self.ln_affine_folded,
                      name=f"block_{i}")(x, n_out=last_n_out if last
                                         else None)
        return x


class PatchEmbedding(nn.Module):
    """Image patch embedding (base_models.py:113-127; unused by FACT but
    part of the modality-model surface): [B, H*p, W*p, C] -> patches ->
    Dense(hidden)."""

    hidden_size: int
    patch_size: int
    num_channel: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hp, wp, c = x.shape
        p = self.patch_size
        assert c == self.num_channel and hp % p == 0 and wp % p == 0
        h, w = hp // p, wp // p
        # b (h p1) (w p2) c -> b (h w) (p1 p2 c)
        x = x.reshape(b, h, p, w, p, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h * w,
                                                         p * p * c)
        return Dense(self.hidden_size, name="patch_embed_layer",
                     dtype=self.compute_dtype)(x)


class LinearEmbedding(nn.Module):
    """Linear input projection (base_models.py:130-138)."""

    dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Dense(self.dim, name="dense", dtype=self.compute_dtype)(x)


class PositionEmbedding(nn.Module):
    """Additive learned position embedding (base_models.py:141-156)."""

    seq_length: int
    dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pos = self.param("pos_embedding", trunc_normal(0.02),
                         (self.seq_length, self.dim), jnp.float32)
        # Reference adds the full [seq_len, dim] table; inputs always have
        # exactly seq_length tokens on the FACT path.
        return x + pos.astype(x.dtype)


class CrossModalLayer(nn.Module):
    """Sequence-wise concat -> transformer -> output head
    (base_models.py:159-202)."""

    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    out_dim: int
    output_initializer_range: float = 0.02
    compute_dtype: jnp.dtype = jnp.float32
    ln_affine_folded: bool = False

    @nn.compact
    def __call__(self, modal_a: jax.Array, modal_b: jax.Array,
                 first_n_out: int | None = None) -> jax.Array:
        """With ``first_n_out=q``, only the first q output frames are
        computed (final transformer block + output head truncated to q
        query rows — exact for those rows).  The AR decoder keeps only
        frame 0 per step (fact_model.py:128), so it passes 1 and skips
        ~an entire layer of dead work per generated frame.
        """
        if modal_a.shape[-1] != modal_b.shape[-1]:
            raise ValueError(
                "The modal_a hidden size (%d) should be the same with the "
                "modal_b hidden size (%d)"
                % (modal_a.shape[-1], modal_b.shape[-1]))
        merged = jnp.concatenate([modal_a, modal_b], axis=1)
        merged = Transformer(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            compute_dtype=self.compute_dtype,
            ln_affine_folded=self.ln_affine_folded,
            name="transformer")(merged, last_n_out=first_n_out)
        logits = nn.Dense(
            self.out_dim,
            kernel_init=trunc_normal(self.output_initializer_range),
            dtype=self.compute_dtype,
            name="cross_output_layer")(merged)
        return logits
