"""The FACT (Full-Attention Cross-modal Transformer) model.

JAX/Flax re-design of the reference ``mint/core/fact_model.py``:

- two single-modal encoders (audio, motion), each
  LinearEmbedding -> PositionEmbedding -> Transformer
  (fact_model.py:49-70, 88-96)
- a cross-modal layer: sequence-wise concat (motion first, then audio) ->
  deeper Transformer -> Dense output head (fact_model.py:99-101,
  base_models.py:182-202)
- L2 training loss over the first ``target_seq_len`` output frames
  (fact_model.py:134-148)

Autoregressive generation lives in :mod:`mint_tpu.infer.decoder` as a
``lax.scan`` (vs. the reference's eager Python loop, fact_model.py:103-132).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from mint_tpu.config.schema import FACTModelConfig
from mint_tpu.models import layers


class FACT(nn.Module):
    """FACT model; construct with a :class:`FACTModelConfig`.

    ``ln_affine_folded=True`` builds the inference variant whose pre-LN
    scale/bias live inside the adjacent QKV/fc1 kernels; pair it with
    params transformed by :func:`mint_tpu.models.fold.fold_ln_affines`
    (or use :func:`mint_tpu.models.fold.fold_for_decode`).
    """

    config: FACTModelConfig
    compute_dtype: jnp.dtype = jnp.float32
    ln_affine_folded: bool = False

    def setup(self):
        from mint_tpu.models.modalities import build_modalities_model

        cfg = self.config
        motion_cfg = cfg.modality_by_name("motion")
        audio_cfg = cfg.modality_by_name("audio")
        # Oneof-aware lookup (reference multi_modal_model_util.py:24-56):
        # the transformer entry is found regardless of its position in
        # the repeated `model` list.
        feature_to_model, _, _ = build_modalities_model(cfg.modality)
        motion_tf = feature_to_model["motion"].get("transformer_layer")
        audio_tf = feature_to_model["audio"].get("transformer_layer")
        if motion_tf is None or audio_tf is None:
            raise ValueError(
                "FACT requires a transformer model for both the motion "
                "and audio modalities")
        cm = cfg.cross_modal_model
        if cm.cross_modal_concat_dim != "SEQUENCE_WISE":
            raise NotImplementedError(
                "cross_modal_concat_dim %s is not supported."
                % cm.cross_modal_concat_dim)

        kw = dict(compute_dtype=self.compute_dtype,
                  ln_affine_folded=self.ln_affine_folded)
        self.motion_linear_embedding = layers.LinearEmbedding(
            motion_tf.hidden_size, compute_dtype=self.compute_dtype)
        self.motion_pos_embedding = layers.PositionEmbedding(
            motion_cfg.sequence_length, motion_tf.hidden_size,
            compute_dtype=self.compute_dtype)
        self.motion_transformer = layers.Transformer(
            hidden_size=motion_tf.hidden_size,
            num_hidden_layers=motion_tf.num_hidden_layers,
            num_attention_heads=motion_tf.num_attention_heads,
            intermediate_size=motion_tf.intermediate_size,
            initializer_range=motion_tf.initializer_range, **kw)

        self.audio_linear_embedding = layers.LinearEmbedding(
            audio_tf.hidden_size, compute_dtype=self.compute_dtype)
        self.audio_pos_embedding = layers.PositionEmbedding(
            audio_cfg.sequence_length, audio_tf.hidden_size,
            compute_dtype=self.compute_dtype)
        self.audio_transformer = layers.Transformer(
            hidden_size=audio_tf.hidden_size,
            num_hidden_layers=audio_tf.num_hidden_layers,
            num_attention_heads=audio_tf.num_attention_heads,
            intermediate_size=audio_tf.intermediate_size,
            initializer_range=audio_tf.initializer_range, **kw)

        self.cross_modal_layer = layers.CrossModalLayer(
            hidden_size=cm.transformer.hidden_size,
            num_hidden_layers=cm.transformer.num_hidden_layers,
            num_attention_heads=cm.transformer.num_attention_heads,
            intermediate_size=cm.transformer.intermediate_size,
            out_dim=cm.output_layer.out_dim,
            output_initializer_range=cm.output_layer.initializer_range, **kw)

    @property
    def motion_seq_length(self) -> int:
        return self.config.modality_by_name("motion").sequence_length

    @property
    def audio_seq_length(self) -> int:
        return self.config.modality_by_name("audio").sequence_length

    def encode_motion(self, motion_input: jax.Array) -> jax.Array:
        """[B, motion_seq, motion_dim] -> [B, motion_seq, hidden]."""
        x = self.motion_linear_embedding(motion_input)
        x = self.motion_pos_embedding(x)
        return self.motion_transformer(x)

    def encode_audio(self, audio_input: jax.Array) -> jax.Array:
        """[B, audio_seq, audio_dim] -> [B, audio_seq, hidden]."""
        x = self.audio_linear_embedding(audio_input)
        x = self.audio_pos_embedding(x)
        return self.audio_transformer(x)

    def cross(self, motion_features: jax.Array,
              audio_features: jax.Array,
              first_n_out: int | None = None) -> jax.Array:
        """Cross-modal transformer over concat(motion, audio) tokens.

        ``first_n_out`` truncates the final block + output head to the
        first N query rows (exact for those rows; see CrossModalLayer).
        """
        return self.cross_modal_layer(motion_features, audio_features,
                                      first_n_out=first_n_out)

    def __call__(self, inputs: Dict[str, jax.Array]) -> jax.Array:
        """Training/eval forward pass (fact_model.py:72-101).

        Args:
          inputs: dict with ``motion_input`` [B, motion_seq, motion_dim] and
            ``audio_input`` [B, audio_seq, audio_dim].

        Returns:
          [B, motion_seq + audio_seq, out_dim]; only the first N frames are
          supervised during training.
        """
        motion_features = self.encode_motion(inputs["motion_input"])
        audio_features = self.encode_audio(inputs["audio_input"])
        return self.cross(motion_features, audio_features)


def l2_loss(target: jax.Array, pred: jax.Array) -> jax.Array:
    """Mean-square loss over the first target_seq_len frames
    (fact_model.py:143-148)."""
    target_seq_len = target.shape[1]
    diff = target - pred[:, :target_seq_len]
    return jnp.mean(jnp.square(diff))


AIST_AUDIO_DIM = 35  # the AIST++ frontend's feature width
                     # (tools/preprocessing.py:115-117)


def init_params(model: FACT, rng: jax.Array, batch_size: int = 1,
                audio_dim: int = 0) -> dict:
    """Initialize parameters with correctly-shaped dummy inputs.

    Input widths come from the config's ``feature_dim``; the shipped
    flagship config leaves the audio width unset, so it defaults to the
    AIST++ frontend's 35 dims — pass `audio_dim` explicitly when using
    a different audio frontend (a mismatch would otherwise only surface
    as a dot_general shape error at first apply).
    """
    cfg = model.config
    motion_cfg = cfg.modality_by_name("motion")
    audio_cfg = cfg.modality_by_name("audio")
    motion_dim = motion_cfg.feature_dim or cfg.cross_modal_model.output_layer.out_dim
    audio_dim = audio_dim or audio_cfg.feature_dim or AIST_AUDIO_DIM
    dummy = {
        "motion_input": jnp.zeros(
            (batch_size, motion_cfg.sequence_length, motion_dim),
            jnp.float32),
        "audio_input": jnp.zeros(
            (batch_size, audio_cfg.sequence_length, audio_dim), jnp.float32),
    }
    return model.init(rng, dummy)


def abstract_params(model: FACT, batch_size: int = 1,
                    audio_dim: int = 0) -> dict:
    """Shape/dtype skeleton of :func:`init_params`' output without
    computing it (``jax.eval_shape`` — no device FLOPs, no transfer).

    For CLIs whose params are immediately overwritten by a checkpoint
    restore (eval, serving): materializing 120M truncated-normal
    weights just to discard them costs a full init compile + compute
    on the device before the restore can even start."""
    return jax.eval_shape(
        lambda rng: init_params(model, rng, batch_size, audio_dim),
        jax.random.PRNGKey(0))
