"""Online serving for dance generation (beyond-reference capability)."""

from mint_tpu.serving.server import GenerationService, serve  # noqa: F401
