from .base import SOURCE_REGISTRY, SourceModel, get_source_model  # noqa: F401
from . import moment_tensor, bilat, circular, point_lp, eikonal  # noqa: F401
