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


def pivoted_cholesky(
    op, rank: int, error_tol: float | None = None, block_size: int | None = None
):
    """Return L with shape (*b, n, rank) such that L L^T ~= K (rank-`rank`
    approximation with greedy trace pivoting).  Use
    ``pivoted_cholesky_with_pivots`` for the pivot order.

    ``block_size``: if given (or set via ``settings.pivoted_cholesky_block_size``),
    use the blocked greedy variant — selects ``block_size`` pivots per sweep
    (top-k of the residual diagonal) and factors them with one panel solve.
    ~``block_size``x fewer sequential steps; each strict-greedy step must
    re-read the whole factor buffer for its downdate, so the sequential loop
    is memory-latency-bound on TPU (measured ~1.2 ms/step at N=1e5 —
    BASELINE.md).  Pivot ORDER differs slightly from strict greedy
    (threshold-approximate choices; see ``_blocked_pivoted_cholesky``),
    approximation quality is equivalent for preconditioning.  The blocked
    path uses ``lax.while_loop`` (adaptive sweep count) and is therefore
    FORWARD-ONLY; it serves the detached preconditioner path
    (operators/added_diag.py:96-121).  The differentiable public API
    (``functions.pivoted_cholesky``) always uses the strict ``fori_loop``
    variant."""
    if block_size is None:
        block_size = settings.pivoted_cholesky_block_size.value()
    if block_size and block_size > 1 and rank > block_size:
        return _forward_only(_blocked_pivoted_cholesky(op, rank, error_tol, block_size))
    L, _ = pivoted_cholesky_with_pivots(op, rank, error_tol)
    return L


@jax.custom_vjp
def _forward_only(L):
    """Identity marker: differentiating through it raises at trace time.

    The blocked sweep uses an adaptive ``lax.while_loop`` and is forward-only
    (it serves the detached preconditioner path); without this marker,
    ``jax.grad`` through the blocked factor would silently return garbage."""
    return L


def _forward_only_fwd(L):
    return L, None


def _forward_only_bwd(_, g):
    raise NotImplementedError(
        "The blocked pivoted Cholesky sweep "
        "(settings.pivoted_cholesky_block_size) is forward-only: its adaptive "
        "while_loop is not reverse-differentiable, and its pivot order differs "
        "from the reference. Unset pivoted_cholesky_block_size (or pass "
        "block_size=None) to differentiate through pivoted_cholesky."
    )


_forward_only.defvjp(_forward_only_fwd, _forward_only_bwd)


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


def _blocked_pivoted_cholesky(
    op, rank: int, error_tol: float | None, bs: int, threshold: float = 0.5
):
    """Adaptive blocked greedy partial Cholesky (TPU-native extension).

    Strict greedy (``pivoted_cholesky_with_pivots``) is memory-latency-bound
    on TPU (~1.2 ms/rank-step at N=1e5: every step re-reads the whole factor
    for its downdate).  Each SWEEP here costs O(1) passes over the factor and
    a candidate panel instead of O(bs):

    1. pool = top-``2*bs`` entries of the residual diagonal; gather their
       columns in ONE structure-aware ``_get_indices`` call and downdate the
       panel against the factor with one matmul;
    2. run the exact greedy recursion on the SMALL (2bs x 2bs) candidate
       Gram only — each mini-step downdates the candidate diagonal, so
       spatially clustered candidates are rejected exactly as strict greedy
       would (naive top-k block pivoting collapses on smooth kernels: a
       near-constant diagonal ties by index and the whole block lands in one
       spatial cluster — measured 1e5x worse trace error at bs=12 on a 1-D
       RBF);
    3. emit all accepted rows at once: a (k x k) triangular solve against
       the panel (left-looking), one ``dynamic_update_slice`` into the
       factor, one pass to downdate the residual diagonal.

    Sweep length is threshold-adaptive: a mini-step accepts a pivot only
    while the best in-pool residual is >= ``threshold`` x the sweep-start
    GLOBAL max residual; when the pool goes stale the sweep ends and the
    next sweep re-selects candidates from the updated diagonal.  The pool
    always contains the global argmax, so every sweep accepts >= 1 pivot:
    worst case (adversarially sorted inputs) degrades to strict greedy
    order with panel-gather overhead; benign inputs take near-full blocks.
    Every accepted pivot is a ``threshold``-approximate greedy choice.

    Batched operators fall back to strict greedy: per-element dynamic sweep
    lengths would force scattered row writes that cancel the blocking win.
    """
    d0 = op._diagonal()
    if d0.ndim > 1:  # batched: strict greedy (see docstring)
        L, _ = pivoted_cholesky_with_pivots(op, rank, error_tol)
        return L
    if error_tol is None:
        error_tol = settings.preconditioner_tolerance.value()
    settings.record_linalg("pivoted_cholesky_blocked", op.shape, (bs,))

    n = d0.shape[-1]
    rank = min(rank, n)
    bs = min(bs, rank)
    nc = min(2 * bs, n)  # candidate pool per sweep
    dtype = jnp.promote_types(d0.dtype, jnp.float32)
    d0 = d0.astype(dtype)

    tol_total = error_tol * jnp.sum(d0)
    # factor padded by one block so the sweep's slice write never clamps
    L0 = jnp.zeros((rank + bs, n), dtype=dtype)
    # HIGH (3-pass), not HIGHEST: the panel downdate is a skinny matmul at
    # the MXU pad rate, so passes cost linearly; 3-pass keeps the residual
    # panel accurate to ~1e-6 relative, ample for pivot selection.
    HI = jax.lax.Precision.HIGH
    row_idx = jnp.arange(n)

    def get_panel(cand):
        # K[:, cand] -> (n, nc) in one structure-aware gather.
        row = jnp.broadcast_to(row_idx[:, None], (n, nc))
        col = jnp.broadcast_to(cand[None, :], (n, nc))
        return op._get_indices(row, col).astype(dtype)

    def sweep_cond(carry):
        L, d, count, sweep = carry
        return (
            (count < rank)
            & (sweep < rank)
            & (jnp.max(d) > 1e-12)
            & (jnp.sum(jnp.maximum(d, 0.0)) > tol_total)
        )

    def sweep_body(carry):
        L, d, count, sweep = carry
        _, cand = lax.top_k(d, nc)
        cand = cand.astype(jnp.int32)

        C = get_panel(cand)  # (n, nc)
        C = C - jnp.einsum("kn,kc->nc", L, L[:, cand], precision=HI)
        S = C[cand, :]  # (nc, nc) residual Gram of the pool
        # In-pool residual diagonal from the FRESH panel, not the tracked d:
        # late sweeps see f32 cancellation push the two apart, and a tracked
        # dp > 0 paired with a fresh near-zero Gram diagonal collapses the
        # triangular solve (M[j, j] = S[c,c]/sqrt(dp) must equal sqrt(dp)).
        dS = jnp.diagonal(S)
        # The sweep scale comes from the FRESH pool too: comparing fresh dp
        # against the max of the stale tracked d can reject every candidate
        # near convergence (fresh ~0 vs tracked ~1e-7), making the sweep a
        # permanent no-op.  Fresh-vs-fresh restores the ">= 1 pivot per
        # sweep" invariant; syncing the tracked diagonal at pool coordinates
        # guarantees sweep_cond's termination test sees real residuals.
        d_global = jnp.max(dS)
        d = d.at[cand].set(dS)

        # In-block greedy selection on the small Gram.  T rows are factor
        # rows restricted to pool coordinates; sel records pivot slots.
        def mini(t, mc):
            T, S, dS, sel, k = mc
            c_rel = jnp.argmax(dS).astype(jnp.int32)
            dp = dS[c_rel]
            accept = (count + k < rank) & (dp > 1e-12) & (dp >= threshold * d_global)
            trow = S[c_rel, :] / jnp.sqrt(jnp.maximum(dp, 1e-30))
            trow = jnp.where(accept, trow, 0.0)
            S = S - trow[:, None] * trow[None, :]
            dS = dS - trow * trow
            dS = jnp.where(accept & (jnp.arange(nc) == c_rel), -jnp.inf, dS)
            # slot k is zeros until accepted, so the masked write is a no-op
            T = lax.dynamic_update_index_in_dim(
                T, trow, jnp.minimum(k, bs - 1), axis=0
            )
            sel = jnp.where(accept & (jnp.arange(bs) == k), c_rel, sel)
            k = k + accept.astype(k.dtype)
            return T, S, dS, sel, k

        T0 = jnp.zeros((bs, nc), dtype=dtype)
        sel0 = jnp.full((bs,), -1, dtype=jnp.int32)
        T, _, _, sel, k = lax.fori_loop(0, bs, mini, (T0, S, dS, sel0, jnp.int32(0)))
        valid = sel >= 0
        sel_c = jnp.where(valid, sel, 0)

        # Left-looking row formation: G[:, j] = sum_{i<=j} P_i M[i, j] with
        # M = triu(T[:, sel]) (M[j, j] = sqrt(dp_j)); unused slots get unit
        # diagonal and zero columns, so their rows solve to zero.
        M = jnp.triu(T[:, sel_c])  # (bs, bs)
        M = jnp.where(valid[None, :], M, 0.0)
        M = M + jnp.diag(jnp.where(valid, 0.0, 1.0).astype(dtype))
        G = jnp.where(valid[None, :], C[:, sel_c], 0.0)  # (n, bs)
        # X M = G  <=>  M^T X^T = G^T: forward substitution gives the rows
        P = jax.scipy.linalg.solve_triangular(M.T, G.T, lower=True)
        # (bs, n) accepted rows (zero rows for unused slots)

        d = d - jnp.sum(P * P, axis=0)
        p_abs = jnp.where(valid, cand[sel_c], n)  # out-of-range -> dropped
        d = d.at[p_abs].set(-jnp.inf, mode="drop")

        L = lax.dynamic_update_slice(L, P, (count, jnp.int32(0)))
        return L, d, count + k, sweep + 1

    L, _, _, _ = lax.while_loop(
        sweep_cond, sweep_body, (L0, d0, jnp.int32(0), jnp.int32(0))
    )
    L = L[:rank]
    return jnp.swapaxes(L, -1, -2).astype(op.dtype)
