"""Model registry / builder (reference: mint/core/model_builder.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mint_tpu.config.schema import MultiModalModelConfig
from mint_tpu.models.fact import FACT


def _build_fact_model(model_config: MultiModalModelConfig, is_training: bool,
                      **kwargs) -> FACT:
    del is_training  # dropout is never applied on the FACT path (parity)
    return FACT(config=model_config.fact_model, **kwargs)


MODEL_BUILDER_MAP = {
    "fact_model": _build_fact_model,
}


def build(model_config: MultiModalModelConfig, is_training: bool,
          compute_dtype: jnp.dtype = jnp.float32):
    """Build a model from a MultiModalModel config (dispatch on the oneof)."""
    model_type = model_config.which()
    build_func = MODEL_BUILDER_MAP[model_type]
    return build_func(model_config, is_training, compute_dtype=compute_dtype)
