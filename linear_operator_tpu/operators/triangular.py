"""Triangular operator with direct triangular solves.

Reference: linear_operator/operators/triangular_linear_operator.py:25-260.
Solves map to ``jax.lax.linalg.triangular_solve`` (batched, XLA-native — the
TPU analog of ``torch.linalg.solve_triangular``, reference :217-242).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .._pytree import operator_class, static_field
from ._linear_operator import LinearOperator
from ..utils.errors import NotPSDError


def _broadcast_factor_rhs(dense: jax.Array, rhs: jax.Array):
    """Broadcast factor and rhs to joint batch dims: unlike jnp.matmul,
    ``lax.linalg.triangular_solve`` requires equal batch ranks, but the
    reference's torch.linalg.solve_triangular broadcasts (e.g. a batched rhs
    against an unbatched Cholesky factor — the batched-targets GP posterior
    path)."""
    batch = jnp.broadcast_shapes(dense.shape[:-2], rhs.shape[:-2])
    return (
        jnp.broadcast_to(dense, (*batch, *dense.shape[-2:])),
        jnp.broadcast_to(rhs, (*batch, *rhs.shape[-2:])),
    )


@operator_class
class TriangularLinearOperator(LinearOperator):
    _tensor: LinearOperator
    upper: bool = static_field(default=False)

    def __post_init__(self):
        # Accept a raw array like the reference constructor
        # (triangular_linear_operator.py:40-49); unflatten bypasses this.
        if not isinstance(self._tensor, LinearOperator):
            from ._linear_operator import to_linear_operator

            object.__setattr__(self, "_tensor", to_linear_operator(self._tensor))

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        # Mask to the triangle so values AND gradients ignore the dead half
        # (the reference trusts callers to pass triangular tensors; masking
        # here is free — XLA fuses the select into the matmul).  Inherently
        # triangular inner operators (Diag etc.) keep their O(n) paths.
        if self._tensor._inherently_triangular:
            return self._tensor._matmul(rhs)
        return jnp.matmul(self.to_dense(), rhs)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        if self._tensor._inherently_triangular:
            return self._tensor._t_matmul(rhs)
        return jnp.matmul(jnp.swapaxes(self.to_dense(), -1, -2), rhs)

    def _shape(self) -> tuple[int, ...]:
        return self._tensor.shape

    def _transpose(self) -> "TriangularLinearOperator":
        return TriangularLinearOperator(
            self._tensor._transpose(), upper=not self.upper
        )

    def _diagonal(self) -> jax.Array:
        return self._tensor._diagonal()

    def to_dense(self) -> jax.Array:
        dense = self._tensor.to_dense()
        return jnp.triu(dense) if self.upper else jnp.tril(dense)

    # -- solves (reference :217-242) --------------------------------------

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        if self._tensor._inherently_triangular:
            inner = self._tensor._solve_structure(rhs)
            if inner is not None:
                return inner
        dense, rhs = _broadcast_factor_rhs(self.to_dense(), rhs)
        return lax.linalg.triangular_solve(
            dense, rhs, left_side=True, lower=not self.upper
        )

    def solve_triangular(
        self,
        rhs: jax.Array,
        *,
        upper: bool,
        left: bool = True,
        unitriangular: bool = False,
    ) -> jax.Array:
        """Validates ``upper`` against the operator's own orientation, like
        the reference (triangular_linear_operator.py:244-258)."""
        if upper != self.upper:
            raise RuntimeError(
                f"solve_triangular called with upper={upper}, but the "
                f"operator is {'upper' if self.upper else 'lower'} triangular"
            )
        if unitriangular:
            raise NotImplementedError(
                "unitriangular=True is not supported (matches reference)"
            )
        if not left:
            return jnp.swapaxes(
                self._transpose()._solve_structure(jnp.swapaxes(rhs, -1, -2)),
                -1,
                -2,
            )
        return self._solve_structure(rhs)

    def _cholesky_solve(self, rhs: jax.Array) -> jax.Array:
        """Solve (R R^T) x = rhs via two triangular solves, where R = self is
        the (lower or upper) root factor (reference :74-92)."""
        dense, rhs = _broadcast_factor_rhs(self.to_dense(), rhs)
        lower = not self.upper
        y = lax.linalg.triangular_solve(dense, rhs, left_side=True, lower=lower)
        return lax.linalg.triangular_solve(
            dense, y, left_side=True, lower=lower, transpose_a=True
        )

    def _logdet_structure(self) -> jax.Array:
        return jnp.sum(jnp.log(jnp.abs(self._diagonal())), axis=-1)

    def _inv_quad_logdet_structure(self, rhs, logdet):
        if rhs is None:
            iq = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            solves = self._solve_structure(rhs)
            iq = jnp.sum(solves * rhs, axis=-2)
        ld = (
            self._logdet_structure()
            if logdet
            else jnp.zeros(self.batch_shape, dtype=self.dtype)
        )
        return iq, ld

    def _cholesky_impl(self, upper: bool = False):
        raise NotPSDError("TriangularLinearOperator is not PSD (reference :69)")

    def _root_structure(self):
        raise NotPSDError(
            "root decomposition of a triangular operator (reference :118-130)"
        )

    def inverse(self) -> "TriangularLinearOperator":
        """L^{-1} via solve against identity (reference :~205)."""
        from .dense import DenseLinearOperator

        eye = jnp.broadcast_to(
            jnp.eye(self.shape[-1], dtype=self.dtype),
            (*self.batch_shape, self.shape[-1], self.shape[-1]),
        )
        return TriangularLinearOperator(
            DenseLinearOperator(self._solve_structure(eye)), upper=self.upper
        )

    def _expand_batch(self, batch_shape):
        return TriangularLinearOperator(
            self._tensor._expand_batch(batch_shape), upper=self.upper
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        inner = self._tensor._getitem(row_index, col_index, *batch_indices)
        if (
            isinstance(row_index, slice)
            and isinstance(col_index, slice)
            and row_index == col_index
            # only forward-step principal submatrices stay triangular: a
            # negative step reverses rows AND columns, flipping the triangle
            # (re-wrapping with the same `upper` would silently mask the
            # surviving half)
            and (row_index.step is None or row_index.step > 0)
        ):
            # Principal submatrix of a triangular matrix stays triangular.
            return TriangularLinearOperator(inner, upper=self.upper)
        # General slices lose triangularity: mask first, then slice.
        from .dense import DenseLinearOperator

        dense = self.to_dense()
        return DenseLinearOperator(dense[(*batch_indices, row_index, col_index)])

    def _get_indices(self, row_index, col_index, *batch_indices):
        vals = self._tensor._get_indices(row_index, col_index, *batch_indices)
        keep = (
            (row_index <= col_index) if self.upper else (row_index >= col_index)
        )
        return jnp.where(keep, vals, jnp.zeros_like(vals))

    def __add__(self, other):
        if isinstance(other, TriangularLinearOperator) and other.upper == self.upper:
            from .dense import DenseLinearOperator

            return TriangularLinearOperator(
                DenseLinearOperator(self.to_dense() + other.to_dense()),
                upper=self.upper,
            )
        return super().__add__(other)
