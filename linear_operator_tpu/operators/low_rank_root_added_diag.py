"""C C^T + D with exact O(N r^2) Woodbury solves — the README 10M x 10M path.

Reference: linear_operator/operators/low_rank_root_added_diag_linear_operator.py:20-193.
The cap matrix I + U^T D^{-1} U is Cholesky-factored once; solves and logdets
are then closed-form:

  (U U^T + D)^{-1} b = D^{-1} b - D^{-1} U (I + U^T D^{-1} U)^{-1} U^T D^{-1} b
  log det(U U^T + D) = log det(I + U^T D^{-1} U) + log det(D)

On TPU the two skinny (n x r) matmuls per application dominate and map
straight onto the MXU; nothing n x n is ever formed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .._pytree import operator_class
from ._linear_operator import LinearOperator
from .added_diag import AddedDiagLinearOperator
from .diag import DiagLinearOperator


def _build_cap_chol(U, dinv, precision):
    """chol(I_r + U^T D^{-1} U) — shared by woodbury_solve_closure and
    factorize() so the cap formula and its einsum spelling (see the
    CPU-lowering note in woodbury_solve_closure) live in exactly one place."""
    r = U.shape[-1]
    cap = jnp.eye(r, dtype=U.dtype) + jnp.einsum(
        "...nr,...ns->...rs", dinv[..., :, None] * U, U, precision=precision
    )  # (*b, r, r); the dinv scaling fuses into the operand read
    return jnp.linalg.cholesky(cap)


def woodbury_solve_closure(
    U: jax.Array,
    diag: jax.Array,
    *,
    precision=jax.lax.Precision.HIGHEST,
    cap_chol: jax.Array | None = None,
):
    """Build (closure: v -> (U U^T + D)^{-1} v, logdet(U U^T + D)).

    U: (*b, n, r); diag: (*b, n).  Used both by this operator's exact solves
    and as the AddedDiag preconditioner application (reference
    added_diag_linear_operator.py:135-184).

    D^{-1} is folded into the VECTOR side everywhere (t = U^T (D^{-1} v),
    out = D^{-1}v - D^{-1}(U y)) so no n x r scaled copy of U is ever
    materialized — at N=1e7 rank 20 that copy was a full extra HBM pass
    (write + re-reads of 800 MB; scripts/profile_woodbury.py).

    precision: HIGHEST by default — when this closure is the CG
    preconditioner, default-bf16 products corrupt P^{-1} enough to stall PCG
    at large n (BASELINE.md, TPU-numerics note 3).  The exact
    LowRankRootAddedDiag solve path passes HIGH: measured residual 1.7e-6
    and bit-identical logdet at N=1e7 rank 20, with fewer MXU passes over
    the skinny contractions.

    cap_chol: optionally a PRECOMPUTED Cholesky factor of the cap matrix
    (from ``LowRankRootAddedDiagLinearOperator.factorize()``) — skips the
    O(n r^2) cap build, the dominant cost at large n.  This is the
    functional analog of the reference's memoized ``_cholesky_cap_mat``
    shared across ``solve`` and ``inv_quad_logdet`` on the same operator
    (reference low_rank_root_added_diag_linear_operator.py:37-47 +
    utils/memoize.py:10-125).
    """
    dinv = 1.0 / diag  # (*b, n)
    r = U.shape[-1]
    # All U^T-contractions are written as einsums contracting the long n dim
    # directly ("...nr,...nt->...rt") rather than transpose-then-matmul: XLA
    # CPU lowers the explicit (r, n) @ (n, t) transposed GEMV 7x slower
    # (990 ms vs 140 ms per pass at n=1e7), while TPU lowering is identical.
    if cap_chol is None:
        cap_chol = _build_cap_chol(U, dinv, precision)

    def closure(v: jax.Array) -> jax.Array:
        dv = dinv[..., :, None] * v
        t = jnp.einsum("...nr,...nt->...rt", U, dv, precision=precision)  # (*b, r, t)
        # broadcast rhs batch dims against the (possibly unbatched) factor:
        # triangular_solve requires equal batch ranks, unlike the einsums
        cap = jnp.broadcast_to(
            cap_chol, (*t.shape[:-2], *cap_chol.shape[-2:])
        )
        y = lax.linalg.triangular_solve(cap, t, left_side=True, lower=True)
        y = lax.linalg.triangular_solve(
            cap, y, left_side=True, lower=True, transpose_a=True
        )
        return dv - dinv[..., :, None] * jnp.matmul(U, y, precision=precision)

    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(cap_chol, axis1=-2, axis2=-1)), axis=-1
    ) + jnp.sum(jnp.log(diag), axis=-1)
    return closure, logdet


@operator_class
class LowRankRootAddedDiagLinearOperator(AddedDiagLinearOperator):
    """operators = (LowRankRootLinearOperator, DiagLinearOperator).

    ``cap_chol`` (optional pytree child, from :meth:`factorize`) carries a
    precomputed Cholesky of the cap matrix I + U^T D^{-1} U so that every
    subsequent solve / logdet / inv_quad_logdet on the operator skips the
    O(n r^2) cap build — the functional form of the reference's memoize
    cache sharing ``_cholesky_cap_mat`` across calls (reference
    low_rank_root_added_diag_linear_operator.py:37-47)."""

    cap_chol: jax.Array | None = None

    def __init__(self, op=None, diag_op=None, *, operators=None, cap_chol=None):  # type: ignore[override]
        if operators is None:
            operators = (op, diag_op)
        object.__setattr__(self, "operators", tuple(operators))
        # inherited AddedDiag field; unused here (solves are exact, no
        # preconditioner), but flatten/replace iterate all dataclass fields
        object.__setattr__(self, "precond_factor", None)
        object.__setattr__(self, "cap_chol", cap_chol)
        self.__post_init__()

    def with_preconditioner(self, factor=None):
        """No-op: solves here are exact Woodbury (``_preconditioner`` is
        (None,)*3), so a preconditioner factor could never be consumed —
        building one would be pure waste plus a dead pytree leaf.  Use
        :meth:`factorize` for the cap-matrix reuse instead."""
        return self

    def factorize(self) -> "LowRankRootAddedDiagLinearOperator":
        """Return the same operator carrying the cap-matrix Cholesky, so
        solve + inv_quad_logdet + logdet on the result cost ONE O(n r^2)
        factorization between them.  Pass the result to further calls (or
        as ``factored=`` / ``with_factorization``) exactly where the
        reference relies on its per-object memoize cache.

        Staleness contract: ``cap_chol`` is valid ONLY for the exact
        ``operators`` leaves it was built from.  A generic leaf update
        (``jax.tree_util.tree_map`` over the operator, an optimizer step on
        U or D) keeps the stale factor silently — re-``factorize()`` after
        any leaf update (in-repo paths construct fresh operators, which
        drops the factor correctly)."""
        from .._pytree import replace

        U = self._root
        dinv = 1.0 / self._diag_op._diagonal()
        return replace(
            self,
            cap_chol=_build_cap_chol(U, dinv, self._exact_precision),
        )

    def __post_init__(self):
        from .root import RootLinearOperator

        if len(self.operators) != 2:
            raise ValueError("takes exactly (root_op, diag_op)")
        if not isinstance(self.operators[0], RootLinearOperator):
            raise TypeError("first operand must be a RootLinearOperator")
        if not isinstance(self.operators[1], DiagLinearOperator):
            raise TypeError("second operand must be a DiagLinearOperator")

    @property
    def _root(self) -> jax.Array:
        return self.operators[0].root.to_dense()

    # -- exact Woodbury machinery (reference :37-47, 62-87) ----------------
    # HIGH (f32-faithful 3-pass) products: measured equivalent to HIGHEST on
    # the exact path (scripts/profile_woodbury.py) at fewer MXU passes.
    _exact_precision = jax.lax.Precision.HIGH

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        closure, _ = woodbury_solve_closure(
            self._root,
            self._diag_op._diagonal(),
            precision=self._exact_precision,
            cap_chol=self.cap_chol,
        )
        return closure(rhs)

    def _logdet_structure(self) -> jax.Array:
        """Matrix determinant lemma (reference :95-101)."""
        _, logdet = woodbury_solve_closure(
            self._root,
            self._diag_op._diagonal(),
            precision=self._exact_precision,
            cap_chol=self.cap_chol,
        )
        return logdet

    def _inv_quad_logdet_structure(self, rhs, logdet):
        """Exact (deterministic) inv_quad_logdet (reference :114-160)."""
        closure, ld = woodbury_solve_closure(
            self._root,
            self._diag_op._diagonal(),
            precision=self._exact_precision,
            cap_chol=self.cap_chol,
        )
        if rhs is None:
            iq = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            iq = jnp.sum(closure(rhs) * rhs, axis=-2)
        if not logdet:
            ld = jnp.zeros(self.batch_shape, dtype=self.dtype)
        return iq, ld

    def _preconditioner(self):
        """The operator IS its own exact preconditioner — CG never runs
        (reference :103-112 returns None since solves are exact)."""
        return None, None, None

    def __add__(self, other):
        if isinstance(other, DiagLinearOperator):
            return LowRankRootAddedDiagLinearOperator(
                self.operators[0], self._diag_op + other
            )
        return super().__add__(other)

    def zero_mean_mvn_samples(self, num_samples, *, key=None):
        """Exact O(n r) sampling: U eps1 + sqrt(D) eps2 (the reference draws
        preconditioner probes the same way, added_diag:95-110 + psd_sum
        sampling).  Critically this is full-rank — a truncated Lanczos root
        here would bias the SLQ probes."""
        from ._linear_operator import _fallback_key

        key = _fallback_key(key)
        k1, k2 = jax.random.split(key)
        U = self._root  # (*b, n, r)
        d = self._diag_op._diagonal()  # (*b, n)
        n, r = U.shape[-2], U.shape[-1]
        batch = self.batch_shape
        eps1 = jax.random.normal(k1, (num_samples, *batch, r), dtype=self.dtype)
        eps2 = jax.random.normal(k2, (num_samples, *batch, n), dtype=self.dtype)
        low_rank = jnp.einsum("...nr,s...r->s...n", U, eps1)
        return low_rank + jnp.sqrt(d) * eps2
