"""Identity operator — no-op matmuls and solves.

Reference: linear_operator/operators/identity_linear_operator.py:17-295.
Carries dtype and batch shape explicitly as static metadata (the reference
carries dtype/device the same way, :30-60); it has zero array leaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ._linear_operator import LinearOperator
from .diag import ConstantDiagLinearOperator, DiagLinearOperator


@operator_class
class IdentityLinearOperator(LinearOperator):
    diag_shape: int = static_field()
    batch_shape_: tuple = static_field(default=())
    dtype_: str = static_field(default="float32")

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_)

    @property
    def _symmetric_hint(self) -> bool:
        return True

    @property
    def _inherently_triangular(self) -> bool:
        return True

    def _shape(self) -> tuple[int, ...]:
        return (*self.batch_shape_, self.diag_shape, self.diag_shape)

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return jnp.broadcast_to(
            rhs, (*jnp.broadcast_shapes(self.batch_shape_, rhs.shape[:-2]), *rhs.shape[-2:])
        )

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._matmul(rhs)

    def _transpose(self) -> "IdentityLinearOperator":
        return self

    def _diagonal(self) -> jax.Array:
        return jnp.ones((*self.batch_shape_, self.diag_shape), dtype=self.dtype)

    def to_dense(self) -> jax.Array:
        return jnp.broadcast_to(
            jnp.eye(self.diag_shape, dtype=self.dtype),
            (*self.batch_shape_, self.diag_shape, self.diag_shape),
        )

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        return self._matmul(rhs)

    def _logdet_structure(self) -> jax.Array:
        return jnp.zeros(self.batch_shape_, dtype=self.dtype)

    def _inv_quad_logdet_structure(self, rhs, logdet):
        if rhs is None:
            iq = jnp.zeros(self.batch_shape_, dtype=self.dtype)
        else:
            iq = jnp.sum(rhs * rhs, axis=-2)
        return iq, self._logdet_structure()

    def _cholesky_impl(self, upper: bool = False):
        from .triangular import TriangularLinearOperator

        return TriangularLinearOperator(self, upper=upper)

    def _root_structure(self):
        return self

    def _root_inv_structure(self):
        return self

    def inverse(self) -> "IdentityLinearOperator":
        return self

    def sqrt(self) -> "IdentityLinearOperator":
        return self

    def abs(self) -> "IdentityLinearOperator":
        return self

    def exp(self) -> LinearOperator:
        """Elementwise exp of the diagonal: e * I.  Deliberate deviation from
        the reference (identity_linear_operator.py:175-178 returns ``self``),
        which is inconsistent with ``DiagLinearOperator.exp`` — exp(1) = e."""
        from .diag import ConstantDiagLinearOperator

        c = jnp.full((*self.batch_shape_, 1), jnp.e, dtype=self.dtype)
        return ConstantDiagLinearOperator(c, diag_shape=self.diag_shape)

    def log(self) -> LinearOperator:
        """log(1) = 0 on the diagonal: the zero operator (reference
        identity_linear_operator.py:210-215)."""
        from .zero import ZeroLinearOperator

        return ZeroLinearOperator(
            (*self.batch_shape_, self.diag_shape, self.diag_shape),
            dtype_=self.dtype_,
        )

    def solve_triangular(
        self,
        rhs: jax.Array,
        *,
        upper: bool,
        left: bool = True,
        unitriangular: bool = False,
    ) -> jax.Array:
        """I is triangular either way; the solve is a no-op (reference
        identity_linear_operator.py:243-251)."""
        return rhs

    def matmul(self, other):
        if isinstance(other, LinearOperator):
            return other
        return super().matmul(other)

    def __add__(self, other):
        if isinstance(other, IdentityLinearOperator):
            return ConstantDiagLinearOperator(
                jnp.full((*self.batch_shape_, 1), 2.0, dtype=self.dtype),
                diag_shape=self.diag_shape,
            )
        if isinstance(other, LinearOperator):
            return other.add_jitter(1.0)
        return super().__add__(other)

    def mul(self, other):
        other_arr = jnp.asarray(other) if not isinstance(other, LinearOperator) else None
        if other_arr is not None and other_arr.ndim == 0:
            return ConstantDiagLinearOperator(
                jnp.broadcast_to(other_arr[None], (*self.batch_shape_, 1)).astype(self.dtype),
                diag_shape=self.diag_shape,
            )
        return super().mul(other)

    def astype(self, dtype):
        return IdentityLinearOperator(
            diag_shape=self.diag_shape,
            batch_shape_=self.batch_shape_,
            dtype_=jnp.dtype(dtype).name,
        )

    def _expand_batch(self, batch_shape):
        return IdentityLinearOperator(
            diag_shape=self.diag_shape,
            batch_shape_=tuple(batch_shape),
            dtype_=self.dtype_,
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        if (
            isinstance(row_index, slice)
            and isinstance(col_index, slice)
            and row_index == col_index
            and not batch_indices
        ):
            new_n = len(range(*row_index.indices(self.diag_shape)))
            return IdentityLinearOperator(
                diag_shape=new_n, batch_shape_=self.batch_shape_, dtype_=self.dtype_
            )
        return DiagLinearOperator(self._diagonal())._getitem(
            row_index, col_index, *batch_indices
        )

    def zero_mean_mvn_samples(self, num_samples, *, key=None):
        from ._linear_operator import _fallback_key

        key = _fallback_key(key)
        return jax.random.normal(
            key,
            (num_samples, *self.batch_shape_, self.diag_shape),
            dtype=self.dtype,
        )
