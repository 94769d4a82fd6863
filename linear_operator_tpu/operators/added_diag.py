"""K + D for diagonal D — home of the pivoted-Cholesky CG preconditioner.

Reference: linear_operator/operators/added_diag_linear_operator.py:21-209.
The preconditioner machinery (reference :95-184) builds a rank-k pivoted
Cholesky factor L of K and preconditions CG with P = L L^T + D via the
Woodbury identity, with logdet(P) from the matrix determinant lemma.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from .. import settings
from ._linear_operator import LinearOperator
from .diag import DiagLinearOperator
from .sum import SumLinearOperator


def nystrom_factor(op, rank: int) -> jax.Array:
    """Nystrom approximation factor L with L L^T ~= K, from uniformly-strided
    landmark columns: L = K[:, idx] chol(K[idx, idx] + eps I)^{-T}.

    TPU-native alternative to greedy pivoted Cholesky (settings.
    preconditioner_mode): ONE batched kernel evaluation (O(n k) entries) and
    a k x k Cholesky — no sequential pivot loop — so high ranks are cheap.
    The uniform stride is deterministic (probe reproducibility) and adequate
    for CG preconditioning, where coverage matters more than adaptivity.
    """
    import numpy as np

    from ..utils.cholesky import psd_safe_cholesky

    n = op.shape[-1]
    rank = min(rank, n)
    idx = jnp.asarray(
        np.unique(np.linspace(0, n - 1, rank).round().astype(np.int64)), jnp.int32
    )
    k = int(idx.shape[0])
    # Landmark columns through the lazy column-selection operator — one
    # k-column matmul, matrix-free for kernel/structured ops (a pointwise
    # _get_indices gather over n*k pairs would lane-pad the gathered points
    # 42x on TPU).
    cols = op._select_cols(idx)._matmul(jnp.eye(k, dtype=op.dtype))  # (*b, n, k)
    # gather the landmark rows; the index array must match cols' ndim
    # (take_along_axis requires equal ranks — batched operators otherwise
    # crash here)
    kmm = jnp.take_along_axis(
        cols,
        jnp.broadcast_to(idx[:, None], (*cols.shape[:-2], k, k)),
        axis=-2,
    )  # (*b, k, k)
    kmm = 0.5 * (kmm + jnp.swapaxes(kmm, -1, -2))
    eps = 1e-6 * jnp.mean(jnp.diagonal(kmm, axis1=-2, axis2=-1), axis=-1)
    lmm = psd_safe_cholesky(
        kmm + eps[..., None, None] * jnp.eye(kmm.shape[-1], dtype=kmm.dtype)
    )
    # L = cols @ lmm^{-T}: one triangular solve against cols^T
    lt = jax.lax.linalg.triangular_solve(
        lmm, jnp.swapaxes(cols, -1, -2), left_side=True, lower=True
    )  # (*b, k, n) = lmm^{-1} cols^T
    return jnp.swapaxes(lt, -1, -2)


def auto_preconditioner_rank(n: int, k_setting: int = 15) -> int:
    """Rank policy for ``preconditioner_mode("auto")``: ``clip(n // 64, 50,
    400)`` (never below the user's ``max_preconditioner_size``, never above
    n).  400 is the measured iteration-floor rank at N=1e5 (BASELINE.md);
    n//64 tapers construction cost at smaller N where fewer landmarks
    already cover the spectrum."""
    return min(max(min(max(n // 64, 50), 400), k_setting), n)


@operator_class
class AddedDiagLinearOperator(SumLinearOperator):
    """Constructed as SumLinearOperator((op, diag_op)) (reference :21-60).

    ``precond_factor`` (optional pytree child, from
    :meth:`with_preconditioner`) carries a precomputed rank-k preconditioner
    factor L (L L^T ~= K) so repeated solves / inv_quad_logdets on the same
    operator skip the O(n k) factor construction — the functional analog of
    the reference memoizing ``_preconditioner`` per object
    (added_diag_linear_operator.py:95-116 under ``@cached``).

    ``preconditioner_override(self) -> (closure, precond_op, logdet_p)`` is
    the reference's user hook for a custom preconditioner (constructor kwarg,
    added_diag_linear_operator.py:61-93): when set, ``_preconditioner``
    delegates to it unconditionally (no rank/size gating)."""

    precond_factor: jax.Array | None = None
    preconditioner_override: "Callable | None" = static_field(default=None)

    def __post_init__(self):
        if len(self.operators) != 2:
            raise ValueError("AddedDiagLinearOperator takes exactly (op, diag_op)")
        if not isinstance(self.operators[1], DiagLinearOperator):
            raise TypeError("second operand must be a DiagLinearOperator")

    def __init__(self, op=None, diag_op=None, *, operators=None, precond_factor=None, preconditioner_override=None):  # type: ignore[override]
        if operators is None:
            operators = (op, diag_op)
        object.__setattr__(self, "operators", tuple(operators))
        object.__setattr__(self, "precond_factor", precond_factor)
        object.__setattr__(self, "preconditioner_override", preconditioner_override)
        self.__post_init__()

    def with_preconditioner(self, factor: jax.Array | None = None):
        """Return the same operator carrying the rank-k preconditioner
        factor, built once under the CURRENT settings (rank =
        ``settings.max_preconditioner_size``, construction =
        ``settings.preconditioner_mode``).  Subsequent solve /
        inv_quad_logdet / sampling calls on the result reuse the factor
        instead of re-running pivoted Cholesky / Nystrom — the reference's
        per-object memoize semantics made explicit.  ``factor`` overrides
        with a caller-supplied (*b, n, k) root.  No-op (returns self) when
        preconditioning is gated off under the current settings, OR when the
        solve/inv_quad_logdet dispatch would take the Cholesky path anyway
        (n <= max_cholesky_size, or both fast_computations.solves and
        .log_prob off — mirroring functions/_solve.py:_dispatch and
        _inv_quad_logdet's cutoff) so the factor is never built just to be
        ignored.  Callers can therefore apply it unconditionally.

        Staleness contract: the carried factor is valid ONLY for the exact
        operator leaves it was built from.  Rebuilding or remapping leaves
        generically (``jax.tree_util.tree_map`` over the operator, optimizer
        updates of its arrays) silently keeps the stale factor — call
        ``with_preconditioner`` again after any leaf update (the in-repo
        composition paths construct fresh operators, which drops it)."""
        from .._pytree import replace

        if factor is None:
            k = settings.max_preconditioner_size.value()
            n = self.shape[-1]
            if k == 0 or n < settings.min_preconditioning_size.value():
                return self
            if settings.use_cholesky_for_solves(n) and settings.use_cholesky_for_log_prob(n):
                return self
            factor = self._build_precond_factor()
        return replace(self, precond_factor=factor)

    def _build_precond_factor(self) -> jax.Array:
        from ..functions import pivoted_cholesky

        k = settings.max_preconditioner_size.value()
        mode = settings.preconditioner_mode.value()
        if mode == "auto":
            # N-scaled Nystrom (VERDICT r4 #3): rank-15 pivoted is a measured
            # no-op on broad spectra at bench scales (BASELINE.md rounds 1-4);
            # auto picks the policy a TPU user should get without hand-tuning.
            return nystrom_factor(
                self._linear_op, rank=auto_preconditioner_rank(self.shape[-1], k)
            )
        if mode == "nystrom":
            return nystrom_factor(self._linear_op, rank=k)
        return pivoted_cholesky(self._linear_op, rank=k)

    @property
    def _linear_op(self) -> LinearOperator:
        return self.operators[0]

    @property
    def _diag_op(self) -> DiagLinearOperator:
        return self.operators[1]

    def __add__(self, other):
        if isinstance(other, DiagLinearOperator):
            return AddedDiagLinearOperator(
                self._linear_op, self._diag_op + other
            )
        if isinstance(other, LinearOperator):
            # Keep the diagonal on the outside so the preconditioner applies.
            return AddedDiagLinearOperator(self._linear_op + other, self._diag_op)
        return super().__add__(other)

    # ------------------------------------------------------------------
    # Pivoted-Cholesky preconditioner (reference :95-184)
    # ------------------------------------------------------------------

    def _preconditioner(self):
        """Returns (closure, precond_op, logdet_precond) or (None,)*3.

        P = L L^T + D with L the rank-k pivoted Cholesky factor of K
        (k = settings.max_preconditioner_size).  The closure applies P^{-1}
        via Woodbury; logdet via the matrix determinant lemma — both O(n k^2).
        Gated exactly like the reference (:108-116).
        """
        if self.preconditioner_override is not None:
            return self.preconditioner_override(self)
        k = settings.max_preconditioner_size.value()
        n = self.shape[-1]
        if k == 0 or n < settings.min_preconditioning_size.value():
            return None, None, None

        from .low_rank_root_added_diag import woodbury_solve_closure
        from .root import LowRankRootLinearOperator
        from .dense import DenseLinearOperator

        if self.precond_factor is not None:
            L = self.precond_factor  # (*b, n, k), from with_preconditioner()
        else:
            L = self._build_precond_factor()  # (*b, n, k)
        diag = self._diag_op._diagonal()  # (*b, n)

        # NaN bail-out (reference added_diag_linear_operator.py:126-131
        # falls back to no preconditioner when the pivoted-Cholesky factor
        # went NaN).  Trace-safe analog: zero the factor, so P = D exactly —
        # Woodbury reduces to D^{-1}, logdet to logdet(D) — instead of
        # poisoning every CG iteration.
        from ..utils.warnings import debug_nan_check

        debug_nan_check("pivoted_cholesky preconditioner", L)
        L = jnp.where(jnp.isnan(L).any(), jnp.zeros_like(L), L)

        closure, logdet_p = woodbury_solve_closure(L, diag)
        precond_op = LowRankRootLinearOperator(DenseLinearOperator(L)).add_diagonal(
            diag
        )
        return closure, precond_op, logdet_p
