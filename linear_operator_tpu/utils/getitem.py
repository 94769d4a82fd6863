"""Tensor-style indexing calculus for lazy operators.

Rebuild of reference linear_operator/utils/getitem.py:19-207 plus the
``__getitem__`` normalization in _linear_operator.py:2829-2926.

Semantics (matching the reference):
* slices on both matrix dims  -> lazy operator (``op._getitem``)
* an int or index array on a matrix dim -> dense values (the reference routes
  these through ``_get_indices`` / interpolated selection; we gather through
  the operator's ``_get_indices``)
* batch dims accept ints / slices / index arrays, staying lazy when matrix
  dims stay lazy.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _is_array_index(ix: Any) -> bool:
    return isinstance(ix, (jax.Array, np.ndarray, list)) or (
        hasattr(ix, "ndim") and not isinstance(ix, (int, np.integer))
    )


def _as_index_array(ix, dim_size: int) -> jax.Array:
    if isinstance(ix, slice):
        return jnp.arange(*ix.indices(dim_size))
    arr = jnp.asarray(ix)
    return jnp.where(arr < 0, arr + dim_size, arr)


def sliced_shape(shape, *indices):
    """Result shape of basic indexing (ints drop dims, slices resize).

    The jit-safe analog of reference ``_compute_getitem_size``
    (utils/getitem.py:19-80)."""
    out = []
    for ix, size in zip(indices, shape):
        if isinstance(ix, slice):
            out.append(len(range(*ix.indices(size))))
        elif isinstance(ix, (int, np.integer)):
            pass  # dim dropped
        else:
            out.extend(int(s) for s in jnp.shape(ix))
    return tuple(out)


def normalize_getitem_index(op, index):
    """Implements ``LinearOperator.__getitem__`` (see docstring above)."""
    if not isinstance(index, tuple):
        index = (index,)

    # None / newaxis: strip, index, then unsqueeze at the None positions
    # (only valid in batch positions, like the reference).
    if any(ix is None for ix in index):
        positions = [i for i, ix in enumerate(index) if ix is None]
        stripped = tuple(ix for ix in index if ix is not None)
        result = normalize_getitem_index(op, stripped)
        for pos in positions:
            if hasattr(result, "unsqueeze"):
                result = result.unsqueeze(pos)
            else:
                result = jnp.expand_dims(result, pos)
        return result

    # Expand Ellipsis.
    if any(ix is Ellipsis for ix in index):
        pos = index.index(Ellipsis)
        if index.count(Ellipsis) > 1:
            raise IndexError("only one Ellipsis allowed")
        fill = op.ndim - (len(index) - 1)
        index = index[:pos] + (slice(None),) * fill + index[pos + 1 :]
    if len(index) > op.ndim:
        raise IndexError(
            f"too many indices ({len(index)}) for operator of dim {op.ndim}"
        )
    index = index + (slice(None),) * (op.ndim - len(index))

    batch_indices = index[:-2]
    row_index, col_index = index[-2], index[-1]
    num_batch = op.ndim - 2

    row_simple = isinstance(row_index, slice)
    col_simple = isinstance(col_index, slice)

    if row_simple and col_simple:
        # Stay lazy.  Squeeze int batch dims afterwards like numpy.
        result = op._getitem(row_index, col_index, *batch_indices)
        return result

    # At least one matrix dim is killed or fancy-indexed -> dense values.
    shape = op.shape
    row_arr = _as_index_array(row_index, shape[-2])
    col_arr = _as_index_array(col_index, shape[-1])
    row_scalar = row_arr.ndim == 0
    col_scalar = col_arr.ndim == 0

    batch_arrs = []
    any_batch_array = any(_is_array_index(b) for b in batch_indices)
    for b, b_size in zip(batch_indices, shape[:-2]):
        batch_arrs.append(_as_index_array(b, b_size))

    if any_batch_array:
        # Full advanced indexing: broadcast all index arrays jointly
        # (reference _linear_operator.py:2882-2902).
        arrs = [a for a in batch_arrs + [row_arr, col_arr]]
        shapes = [a.shape for a in arrs]
        bshape = np.broadcast_shapes(*shapes)
        arrs = [jnp.broadcast_to(a, bshape) for a in arrs]
        return op._get_indices(arrs[-2], arrs[-1], *arrs[:-2])

    # Mixed basic+advanced indexing, advanced block adjacent at the end:
    # result = (batch slice dims ...) + broadcast(row, col).shape
    # (numpy semantics; reference _linear_operator.py:2882-2902).
    adv_shape = np.broadcast_shapes(row_arr.shape, col_arr.shape)
    row_b = jnp.broadcast_to(row_arr, adv_shape)
    col_b = jnp.broadcast_to(col_arr, adv_shape)

    slice_dims = [a.shape[0] for a, ix in zip(batch_arrs, batch_indices)
                  if not isinstance(ix, (int, np.integer))]
    out_shape = tuple(slice_dims) + tuple(adv_shape)
    n_slice = len(slice_dims)

    expanded_batch = []
    pos = 0
    for a, ix in zip(batch_arrs, batch_indices):
        if isinstance(ix, (int, np.integer)):
            expanded_batch.append(jnp.broadcast_to(a, out_shape))
        else:
            shape = [1] * len(out_shape)
            shape[pos] = a.shape[0]
            expanded_batch.append(jnp.broadcast_to(a.reshape(shape), out_shape))
            pos += 1

    adv_full = (1,) * n_slice + tuple(adv_shape)
    row_full = jnp.broadcast_to(row_b.reshape(adv_full), out_shape)
    col_full = jnp.broadcast_to(col_b.reshape(adv_full), out_shape)
    return op._get_indices(row_full, col_full, *expanded_batch)
