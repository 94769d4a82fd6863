"""Symmetric Toeplitz operator with O(N log N) FFT mat-vec.

Reference: linear_operator/operators/toeplitz_linear_operator.py:12-81 and
linear_operator/utils/toeplitz.py:10-204 (circulant-embedding matmul :98-149).

The reference hand-codes the derivative quadratic form
(utils/toeplitz.py:164-204); here the FFT pipeline is jnp ops, so JAX
differentiates the mat-vec natively — the cotangent reaching ``column`` is
exactly that quadratic form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from .._pytree import operator_class
from ._linear_operator import LinearOperator


def toeplitz_matmul(column: jax.Array, rhs: jax.Array) -> jax.Array:
    """Symmetric-Toeplitz mat-mat via circulant embedding (reference
    utils/toeplitz.py:98-149).

    column: (*b, n) first column; rhs: (*b, n, t).
    Embeds T into a 2n-circulant, multiplies in Fourier space.
    """
    n = column.shape[-1]
    # circulant first column: [c_0..c_{n-1}, 0, c_{n-1}..c_1]
    zero = jnp.zeros((*column.shape[:-1], 1), dtype=column.dtype)
    circ = jnp.concatenate([column, zero, jnp.flip(column[..., 1:], axis=-1)], axis=-1)
    f_circ = jnp.fft.rfft(circ, axis=-1)  # (*b, n+1)
    pad = jnp.zeros((*rhs.shape[:-2], n, rhs.shape[-1]), dtype=rhs.dtype)
    x = jnp.concatenate([rhs, pad], axis=-2)  # (*b, 2n, t)
    f_x = jnp.fft.rfft(x, axis=-2)
    prod = f_x * f_circ[..., :, None]
    out = jnp.fft.irfft(prod, n=2 * n, axis=-2)
    return out[..., :n, :].astype(rhs.dtype)


@operator_class
class ToeplitzLinearOperator(LinearOperator):
    column: jax.Array  # (*b, n) first column (symmetric Toeplitz)

    @property
    def _symmetric_hint(self) -> bool:
        return True

    def _shape(self) -> tuple[int, ...]:
        return (*self.column.shape, self.column.shape[-1])

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        n = self.column.shape[-1]
        if settings.use_toeplitz.on() and n >= settings.toeplitz_fft_min_size.value():
            return toeplitz_matmul(self.column, rhs)
        # Dense path: small Toeplitz matrices ride the MXU far faster than
        # the FFT pipeline (settings.toeplitz_fft_min_size).  HIGH precision:
        # this mat-vec feeds CG (see BASELINE.md bf16 footgun #2).
        return jnp.matmul(self.to_dense(), rhs, precision=jax.lax.Precision.HIGH)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._matmul(rhs)

    def _transpose(self) -> "ToeplitzLinearOperator":
        return self

    def _diagonal(self) -> jax.Array:
        """O(1) storage diagonal (reference :25-31)."""
        n = self.column.shape[-1]
        return jnp.broadcast_to(self.column[..., :1], (*self.column.shape[:-1], n))

    def to_dense(self) -> jax.Array:
        n = self.column.shape[-1]
        i = jnp.arange(n)
        idx = jnp.abs(i[:, None] - i[None, :])
        return self.column[..., idx]

    def _get_indices(self, row_index, col_index, *batch_indices):
        dist = jnp.abs(row_index - col_index)
        return self.column[(*batch_indices, dist)]

    def _getitem(self, row_index, col_index, *batch_indices):
        if (
            isinstance(row_index, slice)
            and isinstance(col_index, slice)
            and row_index == col_index
            and row_index.step in (None, 1)
        ):
            n = self.column.shape[-1]
            start, stop, _ = row_index.indices(n)
            new_n = stop - start
            # principal contiguous submatrix of a Toeplitz is Toeplitz
            return ToeplitzLinearOperator(
                self.column[(*batch_indices, slice(0, new_n))]
            )
        return super()._getitem(row_index, col_index, *batch_indices)

    def _expand_batch(self, batch_shape):
        return ToeplitzLinearOperator(
            jnp.broadcast_to(self.column, (*batch_shape, self.column.shape[-1]))
        )
