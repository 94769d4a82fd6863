"""Fused RBF kernel-matrix mat-vec as a Pallas TPU kernel.

Computes y = K v with K[i,j] = exp(-0.5 ||x1_i - x2_j||^2) WITHOUT
materializing K: each (TILE_I, TILE_J) tile is formed in VMEM from the
expanded quadratic (one MXU matmul), exponentiated on the VPU, and contracted
against the v tile (second MXU matmul).  HBM traffic is O(n d + n t) instead
of O(n^2) — this is the speed-of-light formulation for kernel mat-vecs and
the engine of the N=1e5 CG benchmark (BASELINE.json config 3).

Lengthscale/outputscale handling: callers pass PRE-SCALED inputs
(x / lengthscale) and scale the output by outputscale — that keeps this
kernel generic and lets JAX autodiff the hyperparameters through the
wrapping jnp ops, while the custom VJP below handles d/dx1, d/dx2, d/dv with
three more fused passes (no K materialization in the backward either).

Zero-padding correctness: inputs are padded to tile multiples with zeros;
padded v rows are zero so spurious kernel values against padded x2 rows
contribute nothing, and padded output rows are sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pltpu is only importable with the TPU plugin present
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover - CPU-only environments
    pltpu = None
    _VMEM = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis(a: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _tile_sq_dist(x1, x2, d: int):
    """Exact-f32 pairwise squared distances inside a tile: unrolled VPU
    broadcast-differences for small d (avoids the MXU's bf16 rounding of
    distances), MXU quadratic otherwise."""
    if d <= 8:
        d2 = jnp.zeros((x1.shape[0], x2.shape[0]), jnp.float32)
        for k in range(d):
            diff = x1[:, k][:, None] - x2[:, k][None, :]
            d2 = d2 + diff * diff
        return d2
    sq1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    sq2 = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    inner = jnp.dot(x1, x2.T, preferred_element_type=jnp.float32)
    return jnp.maximum(sq1 + sq2.T - 2.0 * inner, 0.0)


def _make_matvec_kernel(d: int):
    def _matvec_kernel(x1_ref, x2_ref, v_ref, out_ref):
        j = pl.program_id(1)
        x1 = x1_ref[:]
        x2 = x2_ref[:]
        v = v_ref[:]
        d2 = _tile_sq_dist(x1, x2, d)
        k = jnp.exp(-0.5 * d2)
        # HIGH precision: single-pass bf16 products inject ~1e-2 mat-vec
        # noise, stalling CG (see operators/kernel.py)
        contrib = jax.lax.dot_general(
            k, v, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == 0)
        def _():
            out_ref[:] = contrib

        @pl.when(j > 0)
        def _():
            out_ref[:] = out_ref[:] + contrib

    return _matvec_kernel


def _make_weighted_kernel(d: int):
    def _weighted_kernel(x1_ref, x2_ref, g_ref, v_ref, wx_ref, ws_ref):
        """Per (i, j) tile: W = K o (g v^T); accumulate W @ x2, rowsum(W)."""
        j = pl.program_id(1)
        x1 = x1_ref[:]
        x2 = x2_ref[:]
        g = g_ref[:]
        v = v_ref[:]
        d2 = _tile_sq_dist(x1, x2, d)
        k = jnp.exp(-0.5 * d2)
        w = k * jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        wx = jnp.dot(w, x2, preferred_element_type=jnp.float32)
        # lane-width (128) broadcast: the caller reads column 0
        ws = jnp.broadcast_to(
            jnp.sum(w, axis=-1, keepdims=True), (w.shape[0], 128)
        )

        @pl.when(j == 0)
        def _():
            wx_ref[:] = wx
            ws_ref[:] = ws

        @pl.when(j > 0)
        def _():
            wx_ref[:] = wx_ref[:] + wx
            ws_ref[:] = ws_ref[:] + ws

    return _weighted_kernel


def _use_interpret() -> bool:
    """Pallas TPU kernels need a real TPU backend; elsewhere (CPU tests) run
    the interpreter."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return True
    return platform not in ("tpu", "axon")


def _pallas_matvec(x1: jax.Array, x2: jax.Array, v: jax.Array, tile: int) -> jax.Array:
    n, d = x1.shape
    m, t = v.shape[0], v.shape[1]
    np_, mp = _round_up(n, tile), _round_up(m, tile)
    dp = _round_up(d, 128)
    tp = _round_up(t, 128)
    x1p = _pad_axis(_pad_axis(x1, 0, np_), 1, dp)
    x2p = _pad_axis(_pad_axis(x2, 0, mp), 1, dp)
    vp = _pad_axis(_pad_axis(v, 0, mp), 1, tp)

    grid = (np_ // tile, mp // tile)
    out = pl.pallas_call(
        _make_matvec_kernel(d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, dp), lambda i, j: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((tile, dp), lambda i, j: (j, 0), memory_space=_VMEM),
            pl.BlockSpec((tile, tp), lambda i, j: (j, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tp), lambda i, j: (i, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, tp), jnp.float32),
        interpret=_use_interpret(),
    )(x1p, x2p, vp)
    return out[:n, :t]


def _pallas_weighted(x1, x2, g, v, tile: int):
    n, d = x1.shape
    m = x2.shape[0]
    t = v.shape[1]
    np_, mp = _round_up(n, tile), _round_up(m, tile)
    dp = _round_up(d, 128)
    tp = _round_up(t, 128)
    x1p = _pad_axis(_pad_axis(x1, 0, np_), 1, dp)
    x2p = _pad_axis(_pad_axis(x2, 0, mp), 1, dp)
    gp = _pad_axis(_pad_axis(g, 0, np_), 1, tp)
    vp = _pad_axis(_pad_axis(v, 0, mp), 1, tp)

    grid = (np_ // tile, mp // tile)
    wx, ws = pl.pallas_call(
        _make_weighted_kernel(d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, dp), lambda i, j: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((tile, dp), lambda i, j: (j, 0), memory_space=_VMEM),
            pl.BlockSpec((tile, tp), lambda i, j: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((tile, tp), lambda i, j: (j, 0), memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, dp), lambda i, j: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((tile, 128), lambda i, j: (i, 0), memory_space=_VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, dp), jnp.float32),
            jax.ShapeDtypeStruct((np_, 128), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(x1p, x2p, gp, vp)
    return wx[:n, :d], ws[:n, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rbf_matvec(x1: jax.Array, x2: jax.Array, v: jax.Array, tile: int = 512):
    """y = exp(-0.5 ||x1_i - x2_j||^2) @ v, fused (never materializes K).

    x1: (n, d); x2: (m, d); v: (m, t) -> (n, t), float32.
    """
    return _pallas_matvec(x1, x2, v, tile)


def _rbf_matvec_fwd(x1, x2, v, tile):
    return _pallas_matvec(x1, x2, v, tile), (x1, x2, v)


def _rbf_matvec_bwd(tile, res, g):
    x1, x2, v = res
    dv = _pallas_matvec(x2, x1, g, tile)  # K^T g
    wx1, ws1 = _pallas_weighted(x1, x2, g, v, tile)  # W @ x2, rowsum(W)
    dx1 = wx1 - ws1[:, None] * x1
    wx2, ws2 = _pallas_weighted(x2, x1, v, g, tile)  # W^T @ x1, colsum(W)
    dx2 = wx2 - ws2[:, None] * x2
    return dx1, dx2, dv


rbf_matvec.defvjp(_rbf_matvec_fwd, _rbf_matvec_bwd)
