"""Gather/scatter-free grid interpolation via one-hot MXU matmuls.

TPU-native engine for SKI-style interpolation matrices whose rows are
Kronecker products of small per-dimension stencils (reference builds these in
linear_operator/utils/interpolation.py:9-81 and applies them as sparse
gathers/scatter-adds, sparse.py:70-128).

On this hardware both sparse directions are dynamic-index bound: at
n=200k/grid=256^2/t=11 the scatter (W^T v) costs ~43 ms and the gather (W g)
~31 ms — each sits at the per-row DMA floor (~200-220 GiB/s effective HBM
stream, BASELINE.md).  But W is row-wise structured: W[i] = kron_d(W_d[i])
with W_d[i] holding k_d interpolation weights.  Densifying each per-dim block
to a (block, m_d) one-hot panel (a VPU iota comparison — no memory traffic)
turns both directions into large dense MXU contractions:

    W^T v:  out = sum_blocks  W_0^T @ (W_1 *expand* ... *expand* v)
    W g:    out_i = reduce_d  W_d[i] . (W_0 @ g-panel)

The dimension with the largest grid is placed on the MXU contraction; the
remaining (small) dims are VPU weighted reductions.  Cost per block is one
(m_big, B) x (B, rest*t) matmul — for the 256^2 SKI benchmark this replaces
43 ms of scatter with ~2 GFLOP of MXU work per direction.

Weights enter linearly (one-hot masks are constant), so JAX AD through these
kernels matches the sparse formulation's gradients exactly.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# Expansion budget (elements) for the blocked panel (block * rest * t).
_PANEL_ELEMENTS = 8 * 1024 * 1024


def _plan(sizes: Sequence[int], t: int, n: int, block: int | None):
    """Dim permutation (largest first) + block size under the panel budget."""
    order = sorted(range(len(sizes)), key=lambda d: -sizes[d])
    rest = 1
    for d in order[1:]:
        rest *= sizes[d]
    if block is None:
        block = max(256, min(16384, _PANEL_ELEMENTS // max(rest * t, 1)))
        block = (block // 256) * 256
        block = min(block, max(256, ((n + 255) // 256) * 256))
    return order, rest, block


def grid_interp_feasible(sizes: Sequence[int], t: int) -> bool:
    """Whether the one-hot panel path fits the memory budget at the minimum
    block size (shares _plan's ordering/rest computation so the feasibility
    test can never drift from the actual plan)."""
    _, rest, _ = _plan(sizes, t, n=256, block=None)
    return 256 * rest * max(t, 1) <= _PANEL_ELEMENTS


def _onehot_panel(idx: jax.Array, w: jax.Array, m: int, dtype) -> jax.Array:
    """(B, k) indices/weights -> dense (B, m) interpolation panel (VPU)."""
    oh = (idx[..., None] == jnp.arange(m, dtype=idx.dtype)).astype(dtype)
    return jnp.sum(oh * w[..., None].astype(dtype), axis=-2)


def _pad_block(arrs, n, block):
    pad = (-n) % block
    if pad:
        arrs = [jnp.pad(a, ((0, pad), (0, 0))) for a in arrs]
    nb = (n + pad) // block
    return _maybe_shard_blocks([a.reshape(nb, block, a.shape[-1]) for a in arrs])


def _maybe_shard_blocks(arrs):
    """Row-shard each (nb, block, k) blocked array over the ambient mesh's
    ``model`` axis (the matrix-N axis, parallel/sharding.py).

    The point dimension is the O(n) part of SKI: sharding the within-block
    rows makes every one-hot panel and the (m0, block) x (block, cols)
    contraction SPMD — GSPMD turns the block matmul into per-device partial
    products + one psum per scan step (W^T v) and leaves W g fully local.
    No-op outside a mesh context (single-chip and CPU tests).
    """
    from ..parallel.sharding import _current_physical_mesh

    mesh = _current_physical_mesh()
    if mesh is None or "model" not in mesh.axis_names:
        return arrs
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec(None, "model", None))
    return [jax.lax.with_sharding_constraint(a, sh) for a in arrs]


def grid_t_matmul(
    dim_indices: Sequence[jax.Array],
    dim_values: Sequence[jax.Array],
    rhs: jax.Array,
    sizes: Sequence[int],
    *,
    block: int | None = None,
    precision=lax.Precision.HIGH,
) -> jax.Array:
    """W^T @ rhs without scatter: (n, t) -> (prod(sizes), t).

    dim_indices/dim_values: per-dim (n, k_d) stencils; W row i is the
    Kronecker product of the per-dim rows (row-major mixed radix).
    """
    sizes = tuple(int(s) for s in sizes)
    n, t = rhs.shape
    D = len(sizes)
    order, rest, block = _plan(sizes, t, n, block)

    xs = _pad_block([*dim_indices, *dim_values, rhs], n, block)
    idx_bl, val_bl, rhs_bl = xs[:D], xs[D : 2 * D], xs[-1]

    m0 = sizes[order[0]]

    def body(acc, args):
        idxs, vals, v = args[:D], args[D : 2 * D], args[-1]
        # expand the small dims into the column space, largest dim on the MXU
        q = v  # (B, cols)
        for d in reversed(order[1:]):
            wd = _onehot_panel(idxs[d], vals[d], sizes[d], v.dtype)  # (B, m_d)
            q = (wd[:, :, None] * q[:, None, :]).reshape(block, -1)
        w0 = _onehot_panel(idxs[order[0]], vals[order[0]], m0, v.dtype)
        acc = acc + jnp.matmul(w0.T, q, precision=precision)
        return acc, None

    acc0 = jnp.zeros((m0, rest * t), rhs.dtype)
    acc, _ = lax.scan(body, acc0, tuple([*idx_bl, *val_bl, rhs_bl]))

    # acc axes: (m_{order[0]}, m_{order[1]}, ..., m_{order[-1]}, t) -> original
    out = acc.reshape(*(sizes[d] for d in order), t)
    inv = [0] * D
    for pos, d in enumerate(order):
        inv[d] = pos
    out = jnp.transpose(out, (*inv, D))
    return out.reshape(math.prod(sizes), t)


def grid_matmul(
    dim_indices: Sequence[jax.Array],
    dim_values: Sequence[jax.Array],
    rhs: jax.Array,
    sizes: Sequence[int],
    *,
    block: int | None = None,
    precision=lax.Precision.HIGH,
) -> jax.Array:
    """W @ rhs without gather: (prod(sizes), t) -> (n, t)."""
    sizes = tuple(int(s) for s in sizes)
    t = rhs.shape[-1]
    n = dim_indices[0].shape[0]
    D = len(sizes)
    order, rest, block = _plan(sizes, t, n, block)

    xs = _pad_block(list(dim_indices) + list(dim_values), n, block)
    idx_bl, val_bl = xs[:D], xs[D:]

    # reshape rhs to (m_order0, rest*t) in permuted dim order
    g = rhs.reshape(*sizes, t)
    g = jnp.transpose(g, (*order, D)).reshape(sizes[order[0]], rest * t)

    def body(_, args):
        idxs, vals = args[:D], args[D:]
        w0 = _onehot_panel(idxs[order[0]], vals[order[0]], sizes[order[0]], rhs.dtype)
        c = jnp.matmul(w0, g, precision=precision)  # (B, rest*t)
        for d in order[1:]:
            wd = _onehot_panel(idxs[d], vals[d], sizes[d], rhs.dtype)  # (B, m_d)
            c = jnp.sum(c.reshape(block, sizes[d], -1) * wd[:, :, None], axis=1)
        return None, c

    _, outs = lax.scan(body, None, tuple([*idx_bl, *val_bl]))
    return outs.reshape(-1, t)[:n]


def flatten_grid_interp(
    dim_indices: Sequence[jax.Array], dim_values: Sequence[jax.Array], sizes: Sequence[int]
):
    """Per-dim stencils -> flat (indices, values) over the row-major grid.

    Matches models/ski.py:linear_interp_weights' mixed-radix fold; used for
    paths that need pointwise access (reference utils/interpolation.py:9-45).
    """
    sizes = tuple(int(s) for s in sizes)
    flat_idx = dim_indices[0]
    flat_w = dim_values[0]
    for d in range(1, len(sizes)):
        m = sizes[d]
        fi = flat_idx[..., :, None] * m + dim_indices[d][..., None, :]
        flat_idx = fi.reshape(*fi.shape[:-2], -1)
        fw = flat_w[..., :, None] * dim_values[d][..., None, :]
        flat_w = fw.reshape(*fw.shape[:-2], -1)
    return flat_idx, flat_w
