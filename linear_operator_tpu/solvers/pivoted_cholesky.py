"""Batched greedy pivoted (partial) Cholesky.

Reference: linear_operator/functions/_pivoted_cholesky.py:14-105.

The reference's scatter/gather pivot-swap loop is rebuilt XLA-first: instead
of physically permuting rows (data-dependent swaps are hostile to TPU tiling)
we keep everything in the ORIGINAL index order and track pivots implicitly —
each step argmaxes the residual diagonal, gathers that column through the
operator's ``_get_indices`` (structure-aware: a kernel operator re-evaluates
k(X, x_pivot) instead of materializing anything), and writes one row of L via
masked updates.  This is the "blocked formulation" anticipated by SURVEY.md
section 7 hard-part (2).

Early termination on trace tolerance (reference :77-85) is per-batch-element:
converged elements write zero rows, so the loop is a static-bound
``fori_loop`` and the factor is exact for ranks beyond convergence.

Gradients flow natively: the loop is reverse-differentiable (static bounds),
and the argmax pivots act as constants — exactly the semantics of the
reference's backward, which recomputes the factor differentiably from saved
pivots (:107-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import settings


def pivoted_cholesky(op, rank: int, error_tol: float | None = None):
    """Return L with shape (*b, n, rank) such that L L^T ~= K (rank-`rank`
    approximation with greedy trace pivoting).  Use
    ``pivoted_cholesky_with_pivots`` for the pivot order."""
    L, _ = pivoted_cholesky_with_pivots(op, rank, error_tol)
    return L


def pivoted_cholesky_with_pivots(op, rank: int, error_tol: float | None = None):
    if error_tol is None:
        error_tol = settings.preconditioner_tolerance.value()
    settings.record_linalg("pivoted_cholesky", op.shape)

    d0 = op._diagonal()  # (*b, n)
    batch = d0.shape[:-1]
    n = d0.shape[-1]
    rank = min(rank, n)
    dtype = jnp.promote_types(d0.dtype, jnp.float32)
    d0 = d0.astype(dtype)

    row_idx = jnp.arange(n)
    # Broadcastable batch index arrays (each shaped to broadcast to (*batch, n)).
    batch_arrs = []
    for i, b in enumerate(batch):
        shape = [1] * (len(batch) + 1)
        shape[i] = b
        batch_arrs.append(jnp.arange(b).reshape(shape))

    tol_total = error_tol * jnp.sum(d0, axis=-1)  # (*b,)

    L0 = jnp.zeros((*batch, rank, n), dtype=dtype)
    piv0 = jnp.zeros((*batch, rank), dtype=jnp.int32)

    def get_column(pivot):
        # K[..., :, pivot] via structure-aware pointwise gather.
        col_idx = jnp.broadcast_to(pivot[..., None], (*batch, n))
        row = jnp.broadcast_to(row_idx, (*batch, n))
        b_arrs = [jnp.broadcast_to(a, (*batch, n)) for a in batch_arrs]
        return op._get_indices(row, col_idx, *b_arrs).astype(dtype)

    def body(i, carry):
        L, d, pivots = carry
        pivot = jnp.argmax(d, axis=-1).astype(jnp.int32)  # (*b,)
        dp = jnp.take_along_axis(d, pivot[..., None], axis=-1)[..., 0]  # (*b,)
        active = jnp.sum(jnp.maximum(d, 0.0), axis=-1) > tol_total  # (*b,)
        active = active & (dp > 1e-12)

        col = get_column(pivot)  # (*b, n)
        Lp = jnp.take_along_axis(L, pivot[..., None, None], axis=-1)[..., 0]  # (*b, rank)
        # HIGHEST precision: the downdate accumulates over `rank` steps, and
        # default bf16 products corrupt the factor at rank >~ 30 on TPU
        row = col - jnp.einsum(
            "...kn,...k->...n", L, Lp, precision=jax.lax.Precision.HIGHEST
        )
        denom = jnp.sqrt(jnp.maximum(dp, 1e-30))
        li = row / denom[..., None]
        li = jnp.where(active[..., None], li, 0.0)

        d = d - li * li
        # Bury the chosen pivot so it is never re-selected.
        d = jnp.where(
            (jnp.arange(n) == pivot[..., None]), -jnp.inf, d
        )

        L = lax.dynamic_update_index_in_dim(L, li, i, axis=-2)
        pivots = lax.dynamic_update_index_in_dim(
            pivots, jnp.where(active, pivot, -1), i, axis=-1
        )
        return L, d, pivots

    L, _, pivots = lax.fori_loop(0, rank, body, (L0, d0, piv0))
    return jnp.swapaxes(L, -1, -2).astype(op.dtype), pivots
