"""Root operators: K = R R^T given the (possibly rectangular) root R.

Reference: linear_operator/operators/root_linear_operator.py:16-130 and
low_rank_root_linear_operator.py:11-64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ._linear_operator import LinearOperator


@operator_class
class RootLinearOperator(LinearOperator):
    root: LinearOperator  # (*b, n, k)

    def __post_init__(self):
        # Accept a raw array root like the reference constructor
        # (root_linear_operator.py:16-24); unflatten bypasses this, so the
        # wrapped operator's own leaves remain the pytree children.
        if not isinstance(self.root, LinearOperator):
            from ._linear_operator import to_linear_operator

            object.__setattr__(self, "root", to_linear_operator(self.root))

    @property
    def _symmetric_hint(self) -> bool:
        return True

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        # Two skinny matmuls instead of forming R R^T (reference :69-74).
        return self.root._matmul(self.root._t_matmul(rhs))

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._matmul(rhs)

    def _shape(self) -> tuple[int, ...]:
        rs = self.root.shape
        return (*rs[:-1], rs[-2])

    def _transpose(self) -> "RootLinearOperator":
        return self

    def _diagonal(self) -> jax.Array:
        root = self.root.to_dense()
        return jnp.sum(root * root, axis=-1)

    def to_dense(self) -> jax.Array:
        root = self.root.to_dense()
        return jnp.matmul(root, jnp.swapaxes(root, -1, -2))

    def _root_structure(self) -> LinearOperator:
        return self.root

    def root_decomposition(self, method=None, *, key=None):
        return self

    def _expand_batch(self, batch_shape):
        return type(self)(self.root._expand_batch(batch_shape))

    def _getitem(self, row_index, col_index, *batch_indices):
        # Factor slicing (reference :52-67): K[i, j] = R[i, :] R[j, :]^T.
        from .matmul import MatmulLinearOperator

        left = self.root._getitem(row_index, slice(None), *batch_indices)
        right = self.root._getitem(col_index, slice(None), *batch_indices)
        if (
            isinstance(row_index, slice)
            and isinstance(col_index, slice)
            and row_index == col_index
        ):
            # Subclasses with constructor invariants on the root (Chol
            # requires a TRIANGULAR root; a principal-submatrix slice of L
            # is lower-trapezoidal (k, n)) degrade to a plain Root — the
            # sliced factor is still an exact root of the submatrix
            # (reference root_linear_operator.py:52-67).
            cls = (
                type(self)
                if type(self) in (RootLinearOperator, LowRankRootLinearOperator)
                else RootLinearOperator
            )
            return cls(left)
        return MatmulLinearOperator(left, right._transpose())

    def _get_indices(self, row_index, col_index, *batch_indices):
        root = self.root.to_dense()
        left = root[(*batch_indices, row_index, slice(None))]
        right = root[(*batch_indices, col_index, slice(None))]
        return jnp.sum(left * right, axis=-1)


@operator_class
class LowRankRootLinearOperator(RootLinearOperator):
    """Marker subclass for genuinely low-rank roots (reference
    low_rank_root_linear_operator.py:11-64): adding a diagonal produces the
    Woodbury-structured ``LowRankRootAddedDiagLinearOperator``."""

    def __add__(self, other):
        from .diag import DiagLinearOperator
        from .low_rank_root_added_diag import LowRankRootAddedDiagLinearOperator

        if isinstance(other, DiagLinearOperator):
            return LowRankRootAddedDiagLinearOperator(self, other)
        return super().__add__(other)

    def add_diagonal(self, diag: jax.Array) -> LinearOperator:
        from .diag import ConstantDiagLinearOperator, DiagLinearOperator
        from .low_rank_root_added_diag import LowRankRootAddedDiagLinearOperator

        diag = jnp.asarray(diag, dtype=self.dtype)
        n = self.shape[-1]
        if diag.ndim == 0:
            diag_op = ConstantDiagLinearOperator(diag[None], diag_shape=n)
        elif diag.shape[-1] == 1:
            diag_op = ConstantDiagLinearOperator(diag, diag_shape=n)
        else:
            diag_op = DiagLinearOperator(jnp.broadcast_to(diag, diag.shape[:-1] + (n,)))
        return LowRankRootAddedDiagLinearOperator(self, diag_op)
