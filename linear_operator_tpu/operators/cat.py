"""Lazy concatenation of operators along a row/column/batch dimension.

Reference: linear_operator/operators/cat_linear_operator.py:36-454.

The reference's multi-GPU story lives here (``output_device`` block scatter,
:306-350): each block sits on a device, matmuls copy the rhs to each device
and gather/sum.  The TPU-native equivalent is NOT per-device Python loops —
block operators are jitted together and the user shards their leaves over the
mesh (see ``parallel/``); a row-concat matmul is then local compute + an
implicit all-gather, a column-concat is local compute + psum, both inserted
by GSPMD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ._linear_operator import LinearOperator


@operator_class
class CatLinearOperator(LinearOperator):
    operators: tuple
    cat_dim: int = static_field(default=-2)  # -2 (rows), -1 (cols), or batch dim

    def __post_init__(self):
        if self.cat_dim not in (-1, -2) and self.cat_dim >= 0:
            raise ValueError("cat_dim must be negative (-1, -2, or batch)")

    def _shape(self) -> tuple[int, ...]:
        shapes = [op.shape for op in self.operators]
        cat_total = sum(s[self.cat_dim] for s in shapes)
        ref = list(shapes[0])
        ref[self.cat_dim] = cat_total
        return tuple(ref)

    def _block_sizes(self):
        return [op.shape[self.cat_dim] for op in self.operators]

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        if self.cat_dim == -2:
            # rows concatenated: each block multiplies the full rhs
            return jnp.concatenate(
                [op._matmul(rhs) for op in self.operators], axis=-2
            )
        if self.cat_dim == -1:
            # columns concatenated: split rhs rows per block, sum results
            sizes = self._block_sizes()
            out = None
            offset = 0
            for op, sz in zip(self.operators, sizes):
                piece = op._matmul(rhs[..., offset : offset + sz, :])
                out = piece if out is None else out + piece
                offset += sz
            return out
        # batch concat: stack along the batch dim
        axis = self.cat_dim - 2  # relative to full shape with matrix dims
        return jnp.concatenate(
            [
                op._matmul(_slice_batch(rhs, self.cat_dim, off, sz))
                for op, off, sz in _batch_pieces(self.operators, self.cat_dim)
            ],
            axis=self.cat_dim,
        )

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._transpose()._matmul(rhs)

    def _transpose(self) -> "CatLinearOperator":
        if self.cat_dim == -2:
            new_dim = -1
        elif self.cat_dim == -1:
            new_dim = -2
        else:
            new_dim = self.cat_dim
        return CatLinearOperator(
            tuple(op._transpose() for op in self.operators), cat_dim=new_dim
        )

    def _diagonal(self) -> jax.Array:
        # only well-defined per-block for batch concat; rows/cols need gather
        if self.cat_dim not in (-1, -2):
            return jnp.concatenate(
                [op._diagonal() for op in self.operators], axis=self.cat_dim + 1
            )
        return super()._diagonal()

    def to_dense(self) -> jax.Array:
        return jnp.concatenate(
            [op.to_dense() for op in self.operators], axis=self.cat_dim
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        """Slice-splitting index math (reference :107-135): a contiguous
        slice along the cat dim is routed to the covered blocks."""
        if self.cat_dim == -2 and isinstance(row_index, slice) and row_index.step in (None, 1):
            start, stop, _ = row_index.indices(self.shape[-2])
            pieces = []
            offset = 0
            for op in self.operators:
                sz = op.shape[-2]
                lo, hi = max(start - offset, 0), min(stop - offset, sz)
                if lo < hi:
                    pieces.append(
                        op._getitem(slice(lo, hi), col_index, *batch_indices)
                    )
                offset += sz
            if len(pieces) == 1:
                return pieces[0]
            return CatLinearOperator(tuple(pieces), cat_dim=-2)
        if self.cat_dim == -1 and isinstance(col_index, slice) and col_index.step in (None, 1):
            start, stop, _ = col_index.indices(self.shape[-1])
            pieces = []
            offset = 0
            for op in self.operators:
                sz = op.shape[-1]
                lo, hi = max(start - offset, 0), min(stop - offset, sz)
                if lo < hi:
                    pieces.append(
                        op._getitem(row_index, slice(lo, hi), *batch_indices)
                    )
                offset += sz
            if len(pieces) == 1:
                return pieces[0]
            return CatLinearOperator(tuple(pieces), cat_dim=-1)
        return super()._getitem(row_index, col_index, *batch_indices)


def _batch_pieces(operators, dim):
    out = []
    off = 0
    for op in operators:
        sz = op.shape[dim]
        out.append((op, off, sz))
        off += sz
    return out


def _slice_batch(rhs, dim, off, sz):
    idx = [slice(None)] * rhs.ndim
    idx[dim] = slice(off, off + sz)
    return rhs[tuple(idx)]


def cat(operators, dim=0):
    """Module-level cat (reference :18-33)."""
    ndim = operators[0].ndim
    if dim >= 0:
        dim = dim - ndim
    return CatLinearOperator(tuple(operators), cat_dim=dim)
