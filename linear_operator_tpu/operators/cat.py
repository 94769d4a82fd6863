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
        # batch concat: stack along the batch dim.  An rhs missing the
        # concatenated batch dim, or carrying it at size 1 (broadcast rhs —
        # valid against every other operator), is broadcast to the joint
        # batch before per-block slicing.
        joint = jnp.broadcast_shapes(self.batch_shape, rhs.shape[:-2])
        if rhs.shape[:-2] != joint:
            rhs = jnp.broadcast_to(rhs, (*joint, *rhs.shape[-2:]))
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
        if self.cat_dim not in (-1, -2):
            return jnp.concatenate(
                [op._diagonal() for op in self.operators], axis=self.cat_dim + 1
            )
        # Row/col concat: per-block pointwise gathers along the diagonal —
        # no densification (reference cat_linear_operator.py ``_diagonal``).
        # _get_indices takes EXPLICIT batch index arrays (batch dims are
        # indexed first) — build broadcastable grids for batched blocks,
        # else the row/col arrays would index the batch dims.
        pieces = []
        offset = 0
        for op in self.operators:
            sz = op.shape[self.cat_dim]
            local = jnp.arange(sz)
            if self.cat_dim == -2:
                rows, cols = local, local + offset
            else:
                rows, cols = local + offset, local
            nb = len(op.batch_shape)
            if nb == 0:
                vals = op._get_indices(rows, cols)
            else:
                b_arrs = []
                for k, s in enumerate(op.batch_shape):
                    shp = [1] * (nb + 1)
                    shp[k] = s
                    b_arrs.append(jnp.arange(s).reshape(shp))
                shp_r = (1,) * nb + (sz,)
                vals = op._get_indices(
                    rows.reshape(shp_r), cols.reshape(shp_r), *b_arrs
                )
            pieces.append(jnp.broadcast_to(vals, (*self.batch_shape, sz)))
            offset += sz
        return jnp.concatenate(pieces, axis=-1)

    def _get_indices(self, row_index, col_index, *batch_indices) -> jax.Array:
        """Pointwise gather: route each index to its covering block via
        masked per-block gathers (reference cat_linear_operator.py:~200;
        trace-safe — no data-dependent control flow)."""
        if self.cat_dim not in (-1, -2):
            return super()._get_indices(row_index, col_index, *batch_indices)
        cat_idx = row_index if self.cat_dim == -2 else col_index
        cat_idx = jnp.asarray(cat_idx)
        out = None
        offset = 0
        for op in self.operators:
            sz = op.shape[self.cat_dim]
            mask = (cat_idx >= offset) & (cat_idx < offset + sz)
            local = jnp.clip(cat_idx - offset, 0, sz - 1)
            if self.cat_dim == -2:
                vals = op._get_indices(local, col_index, *batch_indices)
            else:
                vals = op._get_indices(row_index, local, *batch_indices)
            out = jnp.where(mask, vals, 0.0) if out is None else jnp.where(mask, vals, out)
            offset += sz
        return out

    def to_dense(self) -> jax.Array:
        return jnp.concatenate(
            [op.to_dense() for op in self.operators], axis=self.cat_dim
        )

    def _split_cat_slice(self, sl: slice):
        """Per-block local slices covering a (possibly strided) slice along
        the cat dim (reference slice-splitting index math, :107-135).  Slices
        are static python objects, so this runs at trace time.  Returns
        [(block_index, local_slice), ...] in output order, or None when the
        slice cannot be split (negative step)."""
        n = self.shape[self.cat_dim]
        start, stop, step = sl.indices(n)
        if step <= 0:
            return None
        out = []
        offset = 0
        for bi, op in enumerate(self.operators):
            sz = op.shape[self.cat_dim]
            # smallest t with start + t*step >= offset
            t_lo = max(0, -(-(offset - start) // step))
            # smallest t with start + t*step >= min(stop, offset+sz)
            bound = min(stop, offset + sz)
            t_hi = max(0, -(-(bound - start) // step))
            if t_hi > t_lo:
                lo = start + t_lo * step - offset
                hi = start + (t_hi - 1) * step - offset + 1
                out.append((bi, slice(lo, hi, step)))
            offset += sz
        return out

    def _getitem(self, row_index, col_index, *batch_indices):
        """Slice-splitting index math (reference :107-135): a slice along
        the cat dim is routed to the covered blocks (any positive stride)."""
        if self.cat_dim == -2 and isinstance(row_index, slice):
            split = self._split_cat_slice(row_index)
            if split:
                pieces = [
                    self.operators[bi]._getitem(local, col_index, *batch_indices)
                    for bi, local in split
                ]
                if len(pieces) == 1:
                    return pieces[0]
                return CatLinearOperator(tuple(pieces), cat_dim=-2)
        if self.cat_dim == -1 and isinstance(col_index, slice):
            split = self._split_cat_slice(col_index)
            if split:
                pieces = [
                    self.operators[bi]._getitem(row_index, local, *batch_indices)
                    for bi, local in split
                ]
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
