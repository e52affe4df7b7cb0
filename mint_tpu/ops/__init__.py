from mint_tpu.ops.attention import (  # noqa: F401
    multi_head_attention,
    pallas_attention,
    xla_attention,
)
