"""Support utilities (errors, warnings, broadcasting, cholesky, indexing)."""

from .cholesky import psd_safe_cholesky, psd_safe_cholesky_ex
from .errors import CachingError, NanError, NotPSDError
from .warnings import NumericalWarning, PerformanceWarning

__all__ = [
    "CachingError",
    "NanError",
    "NotPSDError",
    "NumericalWarning",
    "PerformanceWarning",
    "psd_safe_cholesky",
    "psd_safe_cholesky_ex",
]
