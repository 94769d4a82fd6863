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

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        out = self.operators[0]._matmul(rhs)
        for op in self.operators[1:]:
            out = out + op._matmul(rhs)
        return out

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        out = self.operators[0]._t_matmul(rhs)
        for op in self.operators[1:]:
            out = out + op._t_matmul(rhs)
        return out

    def _matmul_closure(self):
        # Compose term closures so per-solve setup (e.g. kernel K-caching)
        # survives wrapping in K + noise*I etc.
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

        terms = tuple(
            op._bilinear_derivative(left_vecs, right_vecs) for op in self.operators
        )
        # zero cotangents for any extra non-operator children carried by
        # subclasses (AddedDiag.precond_factor, LowRankRootAddedDiag.cap_chol)
        zeros = tree_map_leaves(jnp.zeros_like, self)
        return replace(zeros, operators=terms)

    def _shape(self) -> tuple[int, ...]:
        batch = broadcast_shapes(*(op.batch_shape for op in self.operators))
        return (*batch, *self.operators[0].matrix_shape)

    def _transpose(self) -> "SumLinearOperator":
        return SumLinearOperator(tuple(op._transpose() for op in self.operators))

    def _diagonal(self) -> jax.Array:
        out = self.operators[0]._diagonal()
        for op in self.operators[1:]:
            out = out + op._diagonal()
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

    def _getitem(self, row_index, col_index, *batch_indices):
        return SumLinearOperator(
            tuple(
                op._getitem(row_index, col_index, *batch_indices)
                for op in self.operators
            )
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        out = self.operators[0]._get_indices(row_index, col_index, *batch_indices)
        for op in self.operators[1:]:
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
