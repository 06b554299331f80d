from .source import Source, source_grid  # noqa: F401
from .gridsearch import MisfitGrid, MisfitGridStats, make_global_misfits  # noqa: F401
from .lm import minimize_lm  # noqa: F401
from .gradient import covariance, minimize_gradient, minimize_multistart  # noqa: F401
