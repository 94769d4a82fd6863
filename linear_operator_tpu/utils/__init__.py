"""Support utilities (errors, warnings, broadcasting, cholesky, indexing)."""

from .cholesky import psd_safe_cholesky, psd_safe_cholesky_ex
from .errors import CachingError, NanError, NotPSDError
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
    "psd_safe_cholesky",
    "psd_safe_cholesky_ex",
    "sym_toeplitz",
    "sym_toeplitz_derivative_quadratic_form",
    "sym_toeplitz_getitem",
    "sym_toeplitz_matmul",
    "toeplitz",
    "toeplitz_getitem",
    "toeplitz_matmul",
]
