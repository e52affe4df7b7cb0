"""Offline evaluation: motion features, FID scoring, beat alignment."""

from mint_tpu.eval.features import (  # noqa: F401
    extract_kinetic_features,
    extract_manual_features,
)
from mint_tpu.eval.fid import (  # noqa: F401
    frechet_distance,
    normalize_by_reference,
)
