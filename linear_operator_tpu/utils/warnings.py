"""Warning taxonomy (reference: linear_operator/utils/warnings.py:5-18)."""


class NumericalWarning(RuntimeWarning):
    """Numerical issue: CG non-convergence, jittered Cholesky, clamped eigenvalues."""


class PerformanceWarning(RuntimeWarning):
    """An operation fell back to a slow path (e.g. densifying a lazy operator)."""
