"""Support utilities (errors, warnings, broadcasting, cholesky, indexing).

Mirrors the reference's ``linear_operator.utils`` public surface
(utils/__init__.py:4-41) so ported imports resolve: the numerical kernels
themselves live in ``linear_operator_tpu.solvers`` (the TPU-native homes are
documented in docs/porting_guide.md) and are re-exported here under their
reference names.  ``interpolation`` is an alias of :mod:`.sparse`, which holds
``left_interp`` / ``left_t_interp`` (no COO on TPU); there is no ``cached``
decorator — factorization reuse is explicit (``factored=`` /
``with_factorization``, see docs/functions.md).
"""

from ..solvers import StochasticLQ  # noqa: F401  (reference utils/stochastic_lq.py)
from ..solvers.contour_integral_quad import contour_integral_quad  # noqa: F401
from ..solvers.lanczos import lanczos_tridiag, lanczos_tridiag_to_diag  # noqa: F401
from ..solvers.linear_cg import linear_cg  # noqa: F401
from ..solvers.minres import minres  # noqa: F401
from . import broadcasting, cholesky, errors, getitem, permutation, warnings  # noqa: F401
from . import qr  # noqa: F401
from . import qr as pinverse  # noqa: F401  (reference utils/pinverse.py)
from . import sparse  # noqa: F401
from . import sparse as interpolation  # noqa: F401  (reference utils/interpolation.py)
from .cholesky import blocked_cholesky, psd_safe_cholesky, psd_safe_cholesky_ex
from .errors import CachingError, NanError, NotPSDError
from .qr import stable_pinverse, stable_qr  # noqa: F401
from .toeplitz import (
    sym_toeplitz,
    sym_toeplitz_derivative_quadratic_form,
    sym_toeplitz_getitem,
    sym_toeplitz_matmul,
    toeplitz,
    toeplitz_getitem,
    toeplitz_matmul,
)
from .warnings import NumericalWarning, PerformanceWarning

__all__ = [
    "CachingError",
    "NanError",
    "NotPSDError",
    "NumericalWarning",
    "PerformanceWarning",
    "StochasticLQ",
    "blocked_cholesky",
    "broadcasting",
    "cholesky",
    "contour_integral_quad",
    "errors",
    "getitem",
    "interpolation",
    "lanczos_tridiag",
    "lanczos_tridiag_to_diag",
    "linear_cg",
    "minres",
    "permutation",
    "pinverse",
    "psd_safe_cholesky",
    "qr",
    "psd_safe_cholesky_ex",
    "sparse",
    "stable_pinverse",
    "stable_qr",
    "sym_toeplitz",
    "sym_toeplitz_derivative_quadratic_form",
    "sym_toeplitz_getitem",
    "sym_toeplitz_matmul",
    "toeplitz",
    "toeplitz_getitem",
    "toeplitz_matmul",
    "warnings",
]
