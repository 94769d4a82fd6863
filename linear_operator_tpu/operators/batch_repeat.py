"""Lazy ``.repeat`` (tiling) of batch dimensions.

Reference: linear_operator/operators/batch_repeat_linear_operator.py:15-339.
The reference folds repeats into extra rhs columns to reuse base ops
(:111-150).  Here the rhs is reshaped to split each repeated batch dim into
(repeat, base) pairs, the repeat dims are moved to the front where they
broadcast against the base operator's batch dims, and the result is folded
back — pure layout changes that XLA compiles to views, so the base operator's
structured mat-vec runs once per base batch element regardless of repeats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ._linear_operator import LinearOperator


@operator_class
class BatchRepeatLinearOperator(LinearOperator):
    base: LinearOperator
    batch_repeat: tuple = static_field(default=(1,))

    def _padded(self) -> tuple[tuple[int, ...], tuple[int, ...]]:
        bb = self.base.batch_shape
        reps = tuple(self.batch_repeat)
        width = max(len(bb), len(reps))
        return (1,) * (width - len(reps)) + reps, (1,) * (width - len(bb)) + bb

    def _shape(self) -> tuple[int, ...]:
        reps, bb = self._padded()
        return (*(r * b for r, b in zip(reps, bb)), *self.base.matrix_shape)

    def _through_base(self, rhs: jax.Array, base_fn) -> jax.Array:
        """Split (rep*base) batch dims, apply base_fn broadcasting over the
        leading repeat dims, fold back."""
        reps, bb = self._padded()
        width = len(reps)
        n, t = rhs.shape[-2:]
        extra = rhs.ndim - 2 - width
        if extra > 0:
            # Extra leading rhs batch dims: vmap them over the same path.
            lead = rhs.shape[:extra]
            flat = jnp.broadcast_to(
                rhs, (*lead, *self.batch_shape, n, t)
            ).reshape(-1, *self.batch_shape, n, t)
            out = jax.vmap(lambda r: self._through_base(r, base_fn))(flat)
            return out.reshape(*lead, *out.shape[1:])
        rhs = jnp.broadcast_to(rhs, (*self.batch_shape, n, t))
        inter = []
        for r, b in zip(reps, bb):
            inter += [r, b]
        x = rhs.reshape(*inter, n, t)
        perm = [2 * i for i in range(width)] + [2 * i + 1 for i in range(width)]
        x = jnp.transpose(x, (*perm, 2 * width, 2 * width + 1))
        out = base_fn(x)  # (*reps, *bb, m, t)
        m = out.shape[-2]
        inv = []
        for i in range(width):
            inv += [i, width + i]
        out = jnp.transpose(out, (*inv, 2 * width, 2 * width + 1))
        return out.reshape(*self.batch_shape, m, t)

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return self._through_base(rhs, self.base._matmul)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._through_base(rhs, self.base._t_matmul)

    def _transpose(self) -> "BatchRepeatLinearOperator":
        return BatchRepeatLinearOperator(
            self.base._transpose(), batch_repeat=self.batch_repeat
        )

    def _diagonal(self) -> jax.Array:
        reps, _ = self._padded()
        return jnp.tile(self.base._diagonal(), (*reps, 1))

    def to_dense(self) -> jax.Array:
        reps, _ = self._padded()
        return jnp.tile(self.base.to_dense(), (*reps, 1, 1))

    def _cholesky_impl(self, upper: bool = False):
        """Delegate to base then re-wrap (reference :40, 257)."""
        from .triangular import TriangularLinearOperator

        inner = self.base._cholesky_impl(upper=upper)
        return TriangularLinearOperator(
            BatchRepeatLinearOperator(inner._tensor, batch_repeat=self.batch_repeat)
            if isinstance(inner, TriangularLinearOperator)
            else BatchRepeatLinearOperator(inner, batch_repeat=self.batch_repeat),
            upper=upper,
        )

    def _solve_structure(self, rhs: jax.Array):
        if type(self.base)._solve_structure is LinearOperator._solve_structure:
            return None

        # The base may OVERRIDE _solve_structure yet still return None at
        # runtime (e.g. ConstantMul over a dense base, mismatched
        # KroneckerProductAddedDiag) — propagate that as "no fast path"
        # instead of crashing in the reshape math.  Trace-time structure
        # dispatch, not data-dependent control flow.
        class _NoFastPath(Exception):
            pass

        def fn(x):
            out = self.base._solve_structure(x)
            if out is None:
                raise _NoFastPath
            return out

        try:
            return self._through_base(rhs, fn)
        except _NoFastPath:
            return None

    def repeat(self, *sizes):
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        reps = sizes[:-2]
        width = max(len(reps), len(self.batch_repeat))
        old = (1,) * (width - len(self.batch_repeat)) + tuple(self.batch_repeat)
        new = (1,) * (width - len(reps)) + tuple(reps)
        return BatchRepeatLinearOperator(
            self.base, batch_repeat=tuple(r * o for r, o in zip(new, old))
        )

    def _expand_batch(self, batch_shape):
        from .dense import DenseLinearOperator

        return DenseLinearOperator(
            jnp.broadcast_to(self.to_dense(), (*batch_shape, *self.matrix_shape))
        )
