"""Functional API — the differentiation layer (L3).

Reference: linear_operator/functions/__init__.py:17-285.  Each reference
``torch.autograd.Function`` maps to a ``jax.custom_vjp`` entry point (solve,
inv_quad_logdet) or to natively-differentiable JAX code (root decompositions
through the fori-loop Lanczos, pivoted Cholesky) — see the module docstrings
for the correspondence.
"""

from __future__ import annotations

import jax
from ._inv_quad_logdet import inv_quad_logdet
from ._root_decomposition import (
    diagonalization,
    root_decomposition,
    root_inv_decomposition,
)
from ._solve import solve, solve_base


def inv_quad(op, rhs: jax.Array, reduce_inv_quad: bool = True, *, key=None):
    """rhs^T K^{-1} rhs (reference functions/__init__.py:100-130,
    _inv_quad.py:23-93)."""
    iq, _ = inv_quad_logdet(
        op, rhs, logdet=False, reduce_inv_quad=reduce_inv_quad, key=key
    )
    return iq


def pivoted_cholesky(op, rank: int, error_tol=None, return_pivots: bool = False):
    """Partial pivoted Cholesky L (*b, n, rank) (reference
    functions/_pivoted_cholesky.py:12-147).

    Honors ``settings.pivoted_cholesky_block_size`` (the TPU-native blocked
    sweep, forward-only) when set and pivots are not requested; otherwise the
    strict sequential greedy (reference pivot order, differentiable)."""
    from .. import settings
    from ..solvers.pivoted_cholesky import (
        pivoted_cholesky as _solver_pivoted_cholesky,
        pivoted_cholesky_with_pivots,
    )

    if not return_pivots and (settings.pivoted_cholesky_block_size.value() or 0) > 1:
        return _solver_pivoted_cholesky(op, rank, error_tol)
    L, pivots = pivoted_cholesky_with_pivots(op, rank, error_tol)
    if return_pivots:
        return L, pivots
    return L


def add_diagonal(op, diag):
    """(reference functions/__init__.py:17-45)"""
    return op.add_diagonal(diag)


def add_jitter(op, jitter_val: float = 1e-3):
    return op.add_jitter(jitter_val)


def sqrt_inv_matmul(op, rhs, lhs=None, *, key=None):
    """K^{-1/2} rhs via contour integral quadrature (reference
    functions/_sqrt_inv_matmul.py:10-126).  ``key`` seeds the Lanczos
    eigenvalue-range probe (stochastic-API convention: ``key=None`` means a
    fixed key)."""
    from ._sqrt_inv_matmul import sqrt_inv_matmul as _impl

    return _impl(op, rhs, lhs, key=key)


def sqrt_matmul_ciq(op, rhs, *, key=None):
    """K^{1/2} rhs via contour integral quadrature (used by CIQ sampling,
    reference _linear_operator.py:2769-2776)."""
    from ._sqrt_inv_matmul import sqrt_matmul as _impl

    return _impl(op, rhs, key=key)


def dsmm(sparse, dense):
    """Batched (structurally-)sparse @ dense (reference functions/_dsmm.py:9-17).

    TPU note: XLA has no COO kernels; interpolation-style sparsity is
    expressed as gather/segment-sum (utils/sparse.py), which this dispatches
    to.
    """
    from ..utils.sparse import bdsmm

    return bdsmm(sparse, dense)


__all__ = [
    "add_diagonal",
    "add_jitter",
    "diagonalization",
    "dsmm",
    "inv_quad",
    "inv_quad_logdet",
    "pivoted_cholesky",
    "root_decomposition",
    "root_inv_decomposition",
    "solve",
    "solve_base",
    "sqrt_inv_matmul",
    "sqrt_matmul_ciq",
]
