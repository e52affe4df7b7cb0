from mint_tpu.infer.decoder import (  # noqa: F401
    infer_auto_regressive,
    infer_auto_regressive_reference,
    max_steps,
)
