"""Interpolation-sparsity kernels as gather / scatter-add.

Reference: linear_operator/utils/sparse.py:9-258 and interpolation.py:9-81.

The reference builds COO sparse tensors and runs ``bdsmm`` (batched
sparse-dense matmul, sparse.py:70-128).  XLA/TPU has no sparse kernels; the
interpolation matrices here have fixed k nonzeros per row, which maps exactly
onto dense gathers (apply W) and scatter-adds (apply W^T) — both native TPU
ops that vectorize over batch and fuse into surrounding compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def left_interp(indices: jax.Array, values: jax.Array, rhs: jax.Array) -> jax.Array:
    """(W @ rhs) where W is (*b, n, M)-sparse with k nnz/row.

    indices/values: (*b, n, k); rhs: (*b, M, t) -> (*b, n, t)
    (reference interpolation.py:9-45: gather-multiply-sum).
    """
    batch = jnp.broadcast_shapes(
        indices.shape[:-2], values.shape[:-2], rhs.shape[:-2]
    )
    indices = jnp.broadcast_to(indices, (*batch, *indices.shape[-2:]))
    rhs = jnp.broadcast_to(rhs, (*batch, *rhs.shape[-2:]))
    gathered = jnp.take_along_axis(
        rhs[..., None, :, :],  # (*b, 1, M, t)
        indices[..., :, :, None],  # (*b, n, k, 1)
        axis=-2,
    )  # (*b, n, k, t)
    return jnp.sum(gathered * values[..., :, :, None], axis=-2)


def left_t_interp(
    indices: jax.Array, values: jax.Array, rhs: jax.Array, output_dim: int
) -> jax.Array:
    """(W^T @ rhs): scatter-add of weighted rhs rows into the output grid.

    indices/values: (*b, n, k); rhs: (*b, n, t) -> (*b, output_dim, t)
    (reference interpolation.py:48-81 builds a sparse summing matrix + dsmm;
    here it is one scatter-add)."""
    # broadcast to the joint batch like left_interp (a probe-batched rhs may
    # carry extra leading dims over batched indices)
    batch = jnp.broadcast_shapes(
        indices.shape[:-2], values.shape[:-2], rhs.shape[:-2]
    )
    indices = jnp.broadcast_to(indices, (*batch, *indices.shape[-2:]))
    values = jnp.broadcast_to(values, (*batch, *values.shape[-2:]))
    rhs = jnp.broadcast_to(rhs, (*batch, *rhs.shape[-2:]))
    contrib = values[..., :, :, None] * rhs[..., :, None, :]  # (*b, n, k, t)
    flat_idx = indices.reshape(*indices.shape[:-2], -1)  # (*b, n*k)
    flat_contrib = contrib.reshape(*contrib.shape[:-3], -1, contrib.shape[-1])
    out = jnp.zeros(
        (*flat_contrib.shape[:-2], output_dim, flat_contrib.shape[-1]),
        dtype=rhs.dtype,
    )
    return out.at[..., flat_idx, :].add(flat_contrib) if flat_idx.ndim == 1 else _batched_scatter(out, flat_idx, flat_contrib)


def _batched_scatter(out, idx, contrib):
    """Scatter-add with leading batch dims via vmap."""
    batch_ndim = idx.ndim - 1
    fn = lambda o, i, c: o.at[i, :].add(c)
    for _ in range(batch_ndim):
        fn = jax.vmap(fn)
    return fn(
        jnp.broadcast_to(out, (*idx.shape[:-1], *out.shape[-2:])),
        idx,
        jnp.broadcast_to(contrib, (*idx.shape[:-1], *contrib.shape[-2:])),
    )


def bdsmm(sparse_op, dense: jax.Array) -> jax.Array:
    """Batched (interpolation-)sparse @ dense (reference sparse.py:70-128).

    ``sparse_op`` is an InterpolationMatrix (indices, values, shape) — the
    functional stand-in for the reference's torch.sparse COO tensors."""
    from ..operators.interpolated import InterpolationMatrix

    if isinstance(sparse_op, InterpolationMatrix):
        return left_interp(sparse_op.indices, sparse_op.values, dense)
    return jnp.matmul(jnp.asarray(sparse_op), dense)
