"""Modality config expansion
(reference ``mint/core/multi_modal_model_util.py:24-56``).

Turns the repeated `Modality` configs into three lookups:

- ``feature_to_model``: per-feature model pieces (transformer config or
  patch-embed settings),
- ``feature_to_params``: sequence_length / feature_dim,
- ``feature_to_preprocessor``: preprocessing layer config (the reference's
  ``build_preprocessing_layer`` is a stub — `pass` — mirrored here as
  None).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from mint_tpu.config.schema import ModalityConfig


def build_modalities_model(modality_configs: List[ModalityConfig]
                           ) -> Tuple[Dict, Dict, Dict]:
    feature_to_model: Dict[str, Dict] = {}
    feature_to_params: Dict[str, Dict] = {}
    feature_to_preprocessor: Dict[str, None] = {}
    for modality in modality_configs:
        name = modality.feature_name
        feature_to_params[name] = {
            "sequence_length": modality.sequence_length,
            "feature_dim": modality.feature_dim,
        }
        feature_to_preprocessor[name] = None  # stubbed in the reference
        models: Dict[str, object] = {}
        for model in modality.model:
            which = model.which()
            if which == "transformer":
                models["transformer_layer"] = model.transformer
            elif which == "mlp":
                models["mlp_layer"] = model.mlp
        feature_to_model[name] = models
    return feature_to_model, feature_to_params, feature_to_preprocessor
