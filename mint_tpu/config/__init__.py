"""Config system: textproto parsing + typed dataclasses."""

from mint_tpu.config.schema import (  # noqa: F401
    CosineDecayLearningRate,
    CrossModalModelConfig,
    DataModalityConfig,
    DatasetConfig,
    EvalConfig,
    FACTModelConfig,
    GeneralModalityConfig,
    LearningRateConfig,
    ManualStepLearningRate,
    ManualStepSchedule,
    MLPConfig,
    ModalityConfig,
    ModalityModelConfig,
    MultiModalModelConfig,
    PipelineConfig,
    TrainConfig,
    TransformerConfig,
    configs_dict,
    load_pipeline_config,
    pipeline_from_msg,
)
from mint_tpu.config.serialize import (  # noqa: F401
    pipeline_to_text,
    save_pipeline_config,
)
from mint_tpu.config import textproto  # noqa: F401
