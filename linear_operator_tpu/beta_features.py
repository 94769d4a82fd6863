"""Beta feature flags (reference: linear_operator/beta_features.py:25).

``default_preconditioner``: when on, operators WITHOUT a specialized
``_preconditioner`` fall back to a randomized low-rank (rangefinder) + diag
preconditioner, consumed by the solve dispatch exactly where the reference
hooks its randomized-SVD fallback (_linear_operator.py:817-846).
"""

from __future__ import annotations

from .settings import _feature_flag


class default_preconditioner(_feature_flag):
    _default = False


def build_default_preconditioner(op, *, rank: int = 15, key=None):
    """Randomized rangefinder preconditioner P = (QQ^T K QQ^T) + diag floor.

    Returns (closure, precond_op, logdet_p) like ``_preconditioner``."""
    import jax
    import jax.numpy as jnp

    from .operators.dense import DenseLinearOperator
    from .operators.low_rank_root_added_diag import woodbury_solve_closure
    from .operators.root import LowRankRootLinearOperator

    if key is None:
        key = jax.random.PRNGKey(0)
    n = op.shape[-1]
    omega = jax.random.normal(key, (*op.batch_shape, n, rank), dtype=op.dtype)
    y = op._matmul(omega)
    q, _ = jnp.linalg.qr(y)
    b = op._matmul(q)  # K Q
    small = jnp.swapaxes(q, -1, -2) @ b  # Q^T K Q
    evals, evecs = jnp.linalg.eigh((small + jnp.swapaxes(small, -1, -2)) / 2)
    evals = jnp.maximum(evals, 0.0)
    root = q @ (evecs * jnp.sqrt(evals)[..., None, :])  # (n, rank)
    diag_floor = jnp.maximum(
        op._diagonal() - jnp.sum(root * root, axis=-1), 1e-6
    )
    closure, logdet_p = woodbury_solve_closure(root, diag_floor)
    precond_op = LowRankRootLinearOperator(DenseLinearOperator(root)).add_diagonal(
        diag_floor
    )
    return closure, precond_op, logdet_p
