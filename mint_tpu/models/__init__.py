from mint_tpu.models.fact import FACT, init_params, l2_loss  # noqa: F401
from mint_tpu.models.builder import build  # noqa: F401
from mint_tpu.models import layers  # noqa: F401
