"""Lazy sum of operators.

Reference: linear_operator/operators/sum_linear_operator.py:16-116 and
psd_sum_linear_operator.py:10-18.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ..utils.broadcasting import broadcast_shapes
from ._linear_operator import LinearOperator


@operator_class
class SumLinearOperator(LinearOperator):
    operators: tuple  # tuple[LinearOperator, ...]

    @property
    def _symmetric_hint(self) -> bool:
        return all(op._symmetric_hint for op in self.operators)

    def __post_init__(self):
        if len(self.operators) < 1:
            raise ValueError("SumLinearOperator needs at least one term")

    def _term_mm(self, op, rhs: jax.Array, transpose: bool) -> jax.Array:
        # A term whose matrix dims are broadcast against the sum's (e.g. a
        # (n, 1) column operator in a (n, m) sum) multiplies as its dense
        # broadcast — the degenerate case the reference supports only through
        # to_dense (sum_linear_operator.py:20-25 broadcast shapes).
        if tuple(op.matrix_shape) == tuple(self.matrix_shape):
            return op._t_matmul(rhs) if transpose else op._matmul(rhs)
        d = jnp.broadcast_to(
            op.to_dense(), (*op.batch_shape, *self.matrix_shape)
        )
        return jnp.matmul(
            jnp.swapaxes(d, -1, -2) if transpose else d,
            rhs,
            precision=jax.lax.Precision.HIGH,
        )

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        out = self._term_mm(self.operators[0], rhs, False)
        for op in self.operators[1:]:
            out = out + self._term_mm(op, rhs, False)
        return out

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        out = self._term_mm(self.operators[0], rhs, True)
        for op in self.operators[1:]:
            out = out + self._term_mm(op, rhs, True)
        return out

    def _has_broadcast_terms(self) -> bool:
        return any(
            tuple(op.matrix_shape) != tuple(self.matrix_shape)
            for op in self.operators
        )

    def _matmul_closure(self):
        # Compose term closures so per-solve setup (e.g. kernel K-caching)
        # survives wrapping in K + noise*I etc.
        if self._has_broadcast_terms():
            # degenerate broadcast terms route through the aware _matmul
            return self._matmul
        closures = [op._matmul_closure() for op in self.operators]

        def mm(rhs: jax.Array) -> jax.Array:
            out = closures[0](rhs)
            for c in closures[1:]:
                out = out + c(rhs)
            return out

        return mm

    def _bilinear_derivative(self, left_vecs, right_vecs):
        """Distribute over terms (reference sum_linear_operator.py:84-90):
        d sum(left^T (ΣA_i) right) splits term-wise, so structured terms keep
        their fused/analytic backwards (e.g. KernelLinearOperator's blocked
        one-sweep backward) instead of everything routing through one
        ``jax.grad`` of the summed ``_matmul``."""
        from .._pytree import replace, tree_map_leaves

        if self._has_broadcast_terms():
            # per-term bilinear derivatives assume matching matrix dims;
            # the base jax.grad of the broadcast-aware _matmul is exact
            return super()._bilinear_derivative(left_vecs, right_vecs)
        terms = tuple(
            op._bilinear_derivative(left_vecs, right_vecs) for op in self.operators
        )
        # zero cotangents for any extra non-operator children carried by
        # subclasses (AddedDiag.precond_factor, LowRankRootAddedDiag.cap_chol)
        zeros = tree_map_leaves(jnp.zeros_like, self)
        return replace(zeros, operators=terms)

    def _shape(self) -> tuple[int, ...]:
        # matrix dims broadcast too: (n, 1) + (n, m) -> (n, m) (reference
        # sum_linear_operator.py:20-25 broadcasts all shapes).
        batch = broadcast_shapes(*(op.batch_shape for op in self.operators))
        matrix = broadcast_shapes(*(op.matrix_shape for op in self.operators))
        return (*batch, *matrix)

    def _transpose(self) -> "SumLinearOperator":
        return SumLinearOperator(tuple(op._transpose() for op in self.operators))

    def _diagonal(self) -> jax.Array:
        def term_diag(op):
            if tuple(op.matrix_shape) == tuple(self.matrix_shape):
                return op._diagonal()
            d = jnp.broadcast_to(op.to_dense(), (*op.batch_shape, *self.matrix_shape))
            return jnp.diagonal(d, axis1=-2, axis2=-1)

        out = term_diag(self.operators[0])
        for op in self.operators[1:]:
            out = out + term_diag(op)
        return out

    def to_dense(self) -> jax.Array:
        out = self.operators[0].to_dense()
        for op in self.operators[1:]:
            out = out + op.to_dense()
        return out

    def __add__(self, other):
        from .diag import DiagLinearOperator
        from .added_diag import AddedDiagLinearOperator
        from .dense import DenseLinearOperator
        from .zero import ZeroLinearOperator

        if isinstance(other, ZeroLinearOperator):
            return self
        if isinstance(other, DiagLinearOperator):
            return AddedDiagLinearOperator(self, other)
        if isinstance(other, SumLinearOperator):
            return SumLinearOperator((*self.operators, *other.operators))
        if isinstance(other, LinearOperator):
            return SumLinearOperator((*self.operators, other))
        return SumLinearOperator(
            (*self.operators, DenseLinearOperator(jnp.asarray(other)))
        )

    def _expand_batch(self, batch_shape):
        return SumLinearOperator(
            tuple(op._expand_batch(batch_shape) for op in self.operators)
        )

    def _batch_expanded_terms(self):
        """Terms expanded to the sum's batch shape (index-safe: a term with
        fewer/broadcast batch dims cannot absorb the sum's batch indices)."""
        return tuple(op._expanded_to(self.batch_shape) for op in self.operators)

    def _getitem(self, row_index, col_index, *batch_indices):
        if self._has_broadcast_terms():
            # indexing a size-1 broadcast dim term-wise would mis-slice it;
            # take the dense fallback (LinearOperator._getitem)
            return LinearOperator._getitem(
                self, row_index, col_index, *batch_indices
            )
        return SumLinearOperator(
            tuple(
                op._getitem(row_index, col_index, *batch_indices)
                for op in self._batch_expanded_terms()
            )
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        if self._has_broadcast_terms():
            return LinearOperator._get_indices(
                self, row_index, col_index, *batch_indices
            )
        terms = self._batch_expanded_terms()
        out = terms[0]._get_indices(row_index, col_index, *batch_indices)
        for op in terms[1:]:
            out = out + op._get_indices(row_index, col_index, *batch_indices)
        return out

@operator_class
class PsdSumLinearOperator(SumLinearOperator):
    """Sum of PSD terms: sample by summing per-term samples (reference
    psd_sum_linear_operator.py:15-18)."""

    def zero_mean_mvn_samples(self, num_samples, *, key=None):
        from ._linear_operator import _fallback_key

        key = _fallback_key(key)
        keys = jax.random.split(key, len(self.operators))
        out = None
        for op, k in zip(self.operators, keys):
            s = op.zero_mean_mvn_samples(num_samples, key=k)
            out = s if out is None else out + s
        return out
