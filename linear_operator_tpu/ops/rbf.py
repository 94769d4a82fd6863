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


def _dot_acc3(a: jax.Array, b: jax.Array, dims) -> jax.Array:
    """f32 dot as 3 explicit bf16 MXU passes: a_hi@b_hi + a_hi@b_lo + a_lo@b_hi.

    Equivalent to ``Precision.HIGH`` (the 3-pass bf16 product CG stability
    requires — single-pass bf16 injects ~1e-2 mat-vec noise that stalls CG),
    which mosaic does not lower directly inside Pallas kernels (only DEFAULT
    and HIGHEST are supported); HIGHEST costs 6 passes for accuracy CG does
    not need.
    """
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims, preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


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
    # HIGHEST: a DEFAULT (single-pass bf16) inner product rounds distances
    # ~1e-3, the exact footgun _sq_dist exists to avoid (TPU-numerics note 1,
    # BASELINE.md) — and bf16-rounded K makes K+D indefinite at large n.
    inner = jnp.dot(
        x1,
        x2.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(sq1 + sq2.T - 2.0 * inner, 0.0)


# ---------------------------------------------------------------------------
# Stationary covariance registry: name -> (k(d2), dk/d(d2)) tile functions.
#
# The engine is generic over any isotropic kernel k(||x1-x2||^2) evaluated on
# PRE-SCALED inputs (x / lengthscale): the forward tiles need k(d2) and the
# x1/x2 backward tiles need k'(d2) (dx1_i = 2 sum_j [G o k'(d2)]_ij (x1_i -
# x2_j), the chain rule through d2) — this is the TPU analog of KeOps'
# symbolic formula engine (reference keops_linear_operator.py:14).
# ---------------------------------------------------------------------------

_SQRT5 = 5.0**0.5
_SQRT3 = 3.0**0.5


def _covar_rbf(d2):
    return jnp.exp(-0.5 * d2)


def _dcovar_rbf(d2):
    return -0.5 * jnp.exp(-0.5 * d2)


def _covar_matern52(d2):
    d = jnp.sqrt(d2 + 1e-30)
    sd = _SQRT5 * d
    return (1.0 + sd + (5.0 / 3.0) * d2) * jnp.exp(-sd)


def _dcovar_matern52(d2):
    # d/d(d2) [(1+sqrt5 d+5/3 d^2) e^{-sqrt5 d}] = -(5/6)(1+sqrt5 d) e^{-sqrt5 d}
    d = jnp.sqrt(d2 + 1e-30)
    sd = _SQRT5 * d
    return -(5.0 / 6.0) * (1.0 + sd) * jnp.exp(-sd)


def _covar_matern32(d2):
    d = jnp.sqrt(d2 + 1e-30)
    sd = _SQRT3 * d
    return (1.0 + sd) * jnp.exp(-sd)


def _dcovar_matern32(d2):
    # d/d(d2) [(1+sqrt3 d) e^{-sqrt3 d}] = -(3/2) e^{-sqrt3 d}
    d = jnp.sqrt(d2 + 1e-30)
    return -1.5 * jnp.exp(-_SQRT3 * d)


def _covar_matern12(d2):
    # exponential / Ornstein-Uhlenbeck kernel
    return jnp.exp(-jnp.sqrt(d2 + 1e-30))


def _dcovar_matern12(d2):
    # d/d(d2) e^{-d} = -e^{-d} / (2d) is singular at d = 0.  The analytic
    # x-gradient contribution of a coincident pair is the bounded-magnitude,
    # direction-undefined limit -e^{-d} (x1-x2)/d; we take the standard 0
    # convention by zeroing the weight on (near-)coincident pairs — otherwise
    # the huge diagonal weight swamps the f32 accumulation of the off-diagonal
    # terms in the W @ x2 / rowsum(W) tiles.
    d = jnp.sqrt(d2 + 1e-30)
    return jnp.where(d2 > 1e-12, -jnp.exp(-d) / (2.0 * d), 0.0)


TILE_COVARS = {
    "rbf": (_covar_rbf, _dcovar_rbf),
    "matern52": (_covar_matern52, _dcovar_matern52),
    "matern32": (_covar_matern32, _dcovar_matern32),
    "matern12": (_covar_matern12, _dcovar_matern12),
}


def register_tile_covar(name: str, covar_fn, dcovar_fn) -> str:
    """Register a custom stationary covariance ``k(d2)`` with the tile engine.

    ``covar_fn(d2) -> k`` and ``dcovar_fn(d2) -> dk/d(d2)`` must be jnp-level
    elementwise functions of the squared distance of PRE-SCALED inputs; the
    name becomes a valid ``covar=`` key for every kernel in this module (the
    TPU analog of handing KeOps a new symbolic formula, reference
    keops_linear_operator.py:14).  Returns ``name`` for convenience.
    """
    TILE_COVARS[name] = (covar_fn, dcovar_fn)
    return name


def rq_tile_covar(alpha: float) -> str:
    """Register (idempotently) a rational-quadratic covariance
    ``(1 + d2/(2 alpha))^-alpha`` with static ``alpha``; returns its key.

    ``alpha`` is baked into the tile program (Pallas kernels trace python
    closures), so no ``alpha`` gradient flows through the fused path —
    lengthscale/outputscale gradients still flow via input prescaling.
    """
    alpha = float(alpha)
    # key by the full repr: %g truncates to 6 significant digits, which
    # would silently alias nearby alphas onto the first registration
    name = f"rq_{alpha!r}"
    if name not in TILE_COVARS:

        def _covar_rq(d2, _a=alpha):
            return (1.0 + d2 / (2.0 * _a)) ** (-_a)

        def _dcovar_rq(d2, _a=alpha):
            return -0.5 * (1.0 + d2 / (2.0 * _a)) ** (-_a - 1.0)

        register_tile_covar(name, _covar_rq, _dcovar_rq)
    return name


def _make_matvec_kernel(d: int, covar: str = "rbf"):
    covar_fn = TILE_COVARS[covar][0]

    def _matvec_kernel(x1_ref, x2_ref, v_ref, out_ref):
        j = pl.program_id(1)
        x1 = x1_ref[:]
        x2 = x2_ref[:]
        v = v_ref[:]
        d2 = _tile_sq_dist(x1, x2, d)
        k = covar_fn(d2)
        # 3-pass bf16 product (== Precision.HIGH): single-pass bf16 injects
        # ~1e-2 mat-vec noise, stalling CG (see operators/kernel.py)
        contrib = _dot_acc3(k, v, (((1,), (0,)), ((), ())))

        @pl.when(j == 0)
        def _():
            out_ref[:] = contrib

        @pl.when(j > 0)
        def _():
            out_ref[:] = out_ref[:] + contrib

    return _matvec_kernel


def _make_weighted_kernel(d: int, covar: str = "rbf"):
    dcovar_fn = TILE_COVARS[covar][1]

    def _weighted_kernel(x1_ref, x2_ref, g_ref, v_ref, wx_ref, ws_ref):
        """Per (i, j) tile: W = k'(d2) o (g v^T); accumulate W @ x2, rowsum(W).

        The caller assembles dx1 = 2 (rowsum(W) * x1 - W @ x2) — the chain
        rule through d2 for ANY stationary covariance."""
        j = pl.program_id(1)
        x1 = x1_ref[:]
        x2 = x2_ref[:]
        g = g_ref[:]
        v = v_ref[:]
        d2 = _tile_sq_dist(x1, x2, d)
        k = dcovar_fn(d2)
        # same 3-pass precision as the forward matvec: default single-pass
        # bf16 here would feed ~1e-2-noisy products into every x1/x2 (and
        # hence lengthscale) gradient through the fused path
        w = k * _dot_acc3(g, v.T, (((1,), (0,)), ((), ())))
        wx = _dot_acc3(w, x2, (((1,), (0,)), ((), ())))
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


def _pallas_matvec(
    x1: jax.Array, x2: jax.Array, v: jax.Array, tile: int, covar: str = "rbf"
) -> jax.Array:
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
        _make_matvec_kernel(d, covar),
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


def _pallas_weighted(x1, x2, g, v, tile: int, covar: str = "rbf"):
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
        _make_weighted_kernel(d, covar),
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


# ---------------------------------------------------------------------------
# Symmetric fused mat-vec: y = K v with K = K^T (x1 == x2)
# ---------------------------------------------------------------------------
#
# Exploits symmetry to form each kernel tile ONCE: a 1-D grid enumerates the
# upper-triangle tile pairs (i, j >= i) via scalar-prefetch index maps, and
# each tile contributes both K_ij @ v_j (row accumulation, a normal blocked
# output revisited consecutively within a row) and K_ij^T @ v_i (column
# accumulation, into a full-width VMEM-resident second output with a constant
# index map — Pallas only guarantees output-buffer persistence across
# *consecutive* revisits, so scattered column writes must live in one block).
#
# The RHS is carried TRANSPOSED, (t, n): the kernel mat-vec is VPU-exp-bound
# and t is tiny (GP solves: probes + rhs ~ 11 columns), so padding t to the
# 128-lane width — as the rectangular kernel must for its (n, t) layout —
# wastes 10x output/RHS traffic; padding t to the 8-sublane width costs 1.5x.
# Halving the exp work (the VPU bound) makes this kernel ~2x the rectangular
# one; see BASELINE.md for measured roofline accounting.


def _make_sym_matvec_kernel(d: int, tile: int, mode: str = "acc3", covar: str = "rbf"):
    covar_fn = TILE_COVARS[covar][0]
    # Contraction modes (measured on v5e, see BASELINE.md):
    #   acc3      — 3-pass bf16 split (== Precision.HIGH), f32-exact operator
    #   bf16v2    — K rounded to bf16 (still exactly symmetric!), v split in
    #               2 bf16 passes: ~2/3 the MXU passes; operator = bf16(K)
    #   nodot     — no contraction (rowsum only): VPU exp/dist floor probe
    def _contract(vt, k, trans_k):
        dims = (((1,), (1 if trans_k else 0,)), ((), ()))
        if mode == "acc3":
            return _dot_acc3(vt, k, dims)
        if mode == "bf16v2":
            kh = k.astype(jnp.bfloat16)
            vh = vt.astype(jnp.bfloat16)
            vl = (vt - vh.astype(jnp.float32)).astype(jnp.bfloat16)

            def dd(a, b):
                return jax.lax.dot_general(
                    a, b, dims, preferred_element_type=jnp.float32
                )

            return dd(vh, kh) + dd(vl, kh)
        if mode == "nodot":
            s = jnp.sum(k, axis=1 if trans_k else 0)
            return jnp.broadcast_to(s[None, :], (vt.shape[0], s.shape[0]))
        raise ValueError(mode)

    def _kernel(i_ref, j_ref, x1_ref, x2_ref, vtj_ref, vti_ref, orow_ref, ocol_ref):
        s = pl.program_id(0)
        i = i_ref[s]
        j = j_ref[s]
        d2 = _tile_sq_dist(x1_ref[:], x2_ref[:], d)
        k = covar_fn(d2)  # (tile_i, tile_j)
        crow = _contract(vtj_ref[:], k, trans_k=True)  # (t, tile_i)

        @pl.when(j == i)
        def _():
            orow_ref[:] = crow

        @pl.when(j > i)
        def _():
            orow_ref[:] = orow_ref[:] + crow

        @pl.when(s == 0)
        def _():
            ocol_ref[:] = jnp.zeros(ocol_ref.shape, ocol_ref.dtype)

        @pl.when(j > i)
        def _():
            ccol = _contract(vti_ref[:], k, trans_k=False)  # (t, tile_j)
            sl = pl.dslice(j * tile, tile)
            ocol_ref[:, sl] = ocol_ref[:, sl] + ccol

    return _kernel


# Column-accumulator VMEM budget: the (t_pad, n_pad) second output must stay
# resident for the whole grid.
_SYM_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def sym_matvec_supported(n: int, t: int, batch_ndim: int, tile: int = 1024) -> bool:
    # The accumulator is (t_pad, npad) with npad = round_up(n, TILE) — the
    # gate must budget with the same tile the mat-vec will run with, or it
    # under-accounts by up to t_pad * (tile - 1) * 4 bytes near the boundary.
    t_pad = _round_up(max(t, 1), 8)
    return (
        batch_ndim == 0
        and t_pad * _round_up(n, tile) * 4 <= _SYM_VMEM_BUDGET_BYTES
    )


def _pallas_matvec_sym(
    x: jax.Array, v: jax.Array, tile: int, mode: str = "acc3", covar: str = "rbf"
) -> jax.Array:
    n, d = x.shape
    t = v.shape[1]
    nblk = -(-n // tile)
    npad = nblk * tile
    dp = _round_up(d, 128)
    tp = _round_up(t, 8)
    xp = _pad_axis(_pad_axis(x, 0, npad), 1, dp)
    vt = _pad_axis(_pad_axis(v.T, 0, tp), 1, npad)  # (tp, npad)

    if pltpu is None or _use_interpret():
        # CPU/test fallback: same math, dense (the kernel needs real VMEM
        # semantics; the interpreter supports it but at no speed benefit).
        k = TILE_COVARS[covar][0](_tile_sq_dist(x, x, d))
        return jnp.dot(k, v, precision=jax.lax.Precision.HIGHEST)

    imap, jmap = _triangle_maps(nblk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(int(imap.shape[0]),),
        in_specs=[
            pl.BlockSpec((tile, dp), lambda s, im, jm: (im[s], 0)),
            pl.BlockSpec((tile, dp), lambda s, im, jm: (jm[s], 0)),
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, jm[s])),
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, im[s])),
        ],
        out_specs=[
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, im[s])),
            pl.BlockSpec((tp, npad), lambda s, im, jm: (0, 0)),
        ],
    )
    orow, ocol = pl.pallas_call(
        _make_sym_matvec_kernel(d, tile, mode, covar),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tp, npad), jnp.float32),
            jax.ShapeDtypeStruct((tp, npad), jnp.float32),
        ),
    )(imap, jmap, xp, xp, vt, vt)
    return (orow + ocol).T[:n, :t]


# ---------------------------------------------------------------------------
# Cached bf16 upper-triangle tile engine
# ---------------------------------------------------------------------------
#
# For iterative solvers the same K is applied ~25 times per solve; at
# N=1e5 the f32 matrix (40 GB) cannot be cached, but the bf16 UPPER TRIANGLE
# (~n^2 bytes: 9.7 GB at tile 1024) fits HBM.  Build the triangle tiles ONCE
# per solve (one exp sweep), then every mat-vec streams stored tiles at HBM
# bandwidth instead of recomputing ~1e10 exp() calls: measured ~3x per
# mat-vec on v5e (see BASELINE.md roofline table).
#
# Accuracy: the cached operator is exactly bf16(K) — elementwise rounding of
# a symmetric matrix is symmetric, and both the row and column contributions
# of a tile contract the SAME stored block, so CG sees a fixed symmetric PSD
# perturbation (~4e-3 relative on kernel entries, well under the noise
# diagonal) rather than per-iteration noise.  The v operand is split into
# two bf16 passes (v_hi + v_lo), making the product exact in v to ~1e-7.


def _make_sym_build_kernel(d: int, covar: str = "rbf"):
    covar_fn = TILE_COVARS[covar][0]

    def _kernel(i_ref, j_ref, x1_ref, x2_ref, out_ref):
        d2 = _tile_sq_dist(x1_ref[:], x2_ref[:], d)
        out_ref[0] = covar_fn(d2).astype(jnp.bfloat16)

    return _kernel


def _triangle_maps(nblk: int):
    import numpy as np

    ii, jj = np.triu_indices(nblk)  # row-major: i outer, j inner ascending
    return jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32)


def rbf_build_sym_tiles(x: jax.Array, tile: int = 1024, covar: str = "rbf") -> jax.Array:
    """Upper-triangle kernel tiles of k(||x_i-x_j||^2) (``covar`` from
    ``TILE_COVARS``, default RBF) as (npairs, tile, tile) bf16, in the
    row-major triangle order of ``_triangle_maps`` (tile (i,j) with j >= i at
    linear index s)."""
    n, d = x.shape
    nblk = -(-n // tile)
    npad = nblk * tile
    dp = _round_up(d, 128)
    xp = _pad_axis(_pad_axis(x, 0, npad), 1, dp)
    imap, jmap = _triangle_maps(nblk)
    npairs = int(imap.shape[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npairs,),
        in_specs=[
            pl.BlockSpec((tile, dp), lambda s, im, jm: (im[s], 0)),
            pl.BlockSpec((tile, dp), lambda s, im, jm: (jm[s], 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, tile), lambda s, im, jm: (s, 0, 0)),
    )
    return pl.pallas_call(
        _make_sym_build_kernel(d, covar),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npairs, tile, tile), jnp.bfloat16),
    )(imap, jmap, xp, xp)


def _make_cached_matvec_kernel(tile: int, passes: int):
    def _contract(vt, k, trans_k):
        dims = (((1,), (1 if trans_k else 0,)), ((), ()))

        def dd(a, b):
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32
            )

        vh = vt.astype(jnp.bfloat16)
        if passes == 1:
            return dd(vh, k)
        vl = (vt - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dd(vh, k) + dd(vl, k)

    def _kernel(i_ref, j_ref, k_ref, vtj_ref, vti_ref, orow_ref, ocol_ref):
        s = pl.program_id(0)
        i = i_ref[s]
        j = j_ref[s]
        k = k_ref[0]  # (tile, tile) bf16
        crow = _contract(vtj_ref[:], k, trans_k=True)  # (t, tile_i)

        @pl.when(j == i)
        def _():
            orow_ref[:] = crow

        @pl.when(j > i)
        def _():
            orow_ref[:] = orow_ref[:] + crow

        @pl.when(s == 0)
        def _():
            ocol_ref[:] = jnp.zeros(ocol_ref.shape, ocol_ref.dtype)

        @pl.when(j > i)
        def _():
            ccol = _contract(vti_ref[:], k, trans_k=False)  # (t, tile_j)
            sl = pl.dslice(j * tile, tile)
            ocol_ref[:, sl] = ocol_ref[:, sl] + ccol

    return _kernel


def rbf_matvec_sym_cached(
    tiles: jax.Array, v: jax.Array, n: int, tile: int = 1024, passes: int = 2
) -> jax.Array:
    """y = K v from tiles built by ``rbf_build_sym_tiles``; v (n, t) f32."""
    t = v.shape[1]
    nblk = -(-n // tile)
    npad = nblk * tile
    tp = _round_up(max(t, 1), 8)
    vt = _pad_axis(_pad_axis(v.T, 0, tp), 1, npad)  # (tp, npad)
    imap, jmap = _triangle_maps(nblk)
    npairs = int(imap.shape[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npairs,),
        in_specs=[
            pl.BlockSpec((1, tile, tile), lambda s, im, jm: (s, 0, 0)),
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, jm[s])),
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, im[s])),
        ],
        out_specs=[
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, im[s])),
            pl.BlockSpec((tp, npad), lambda s, im, jm: (0, 0)),
        ],
    )
    orow, ocol = pl.pallas_call(
        _make_cached_matvec_kernel(tile, passes),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tp, npad), jnp.float32),
            jax.ShapeDtypeStruct((tp, npad), jnp.float32),
        ),
    )(imap, jmap, tiles, vt, vt)
    return (orow + ocol).T[:n, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def kernel_matvec_sym(x: jax.Array, v: jax.Array, tile: int = 1024, covar: str = "rbf"):
    """y = k(||x_i - x_j||^2) @ v for the SYMMETRIC kernel matrix, forming
    each tile once (upper triangle only); ``covar`` names a ``TILE_COVARS``
    entry (inputs pre-scaled by lengthscale).

    x: (n, d); v: (n, t) -> (n, t), float32.  Use ``sym_matvec_supported``
    to check the (n, t) column-accumulator VMEM gate first.
    """
    return _pallas_matvec_sym(x, v, tile, covar=covar)


def _kernel_matvec_sym_fwd(x, v, tile, covar):
    return _pallas_matvec_sym(x, v, tile, covar=covar), (x, v)


def _kernel_matvec_sym_bwd(tile, covar, res, g):
    x, v = res
    dv = _pallas_matvec_sym(x, g, tile, covar=covar)  # K^T g = K g
    # x appears as both arguments of K(x, x): sum both partials (same
    # weighted-tile passes as the rectangular kernel's backward).
    # dx_i = 2 sum_j [k'(d2) o (g v^T)]_ij (x_i - x_j)  (chain rule via d2)
    wtile = min(tile, 512)
    wx1, ws1 = _pallas_weighted(x, x, g, v, wtile, covar)
    wx2, ws2 = _pallas_weighted(x, x, v, g, wtile, covar)
    dx = 2.0 * ((ws1[:, None] * x - wx1) + (ws2[:, None] * x - wx2))
    return dx, dv


kernel_matvec_sym.defvjp(_kernel_matvec_sym_fwd, _kernel_matvec_sym_bwd)


def rbf_matvec_sym(x: jax.Array, v: jax.Array, tile: int = 1024):
    """RBF alias of :func:`kernel_matvec_sym`."""
    return kernel_matvec_sym(x, v, tile, "rbf")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def kernel_matvec(
    x1: jax.Array, x2: jax.Array, v: jax.Array, tile: int = 512, covar: str = "rbf"
):
    """y = k(||x1_i - x2_j||^2) @ v, fused (never materializes K); ``covar``
    names a ``TILE_COVARS`` entry (inputs pre-scaled by lengthscale).

    x1: (n, d); x2: (m, d); v: (m, t) -> (n, t), float32.
    """
    return _pallas_matvec(x1, x2, v, tile, covar)


def _kernel_matvec_fwd(x1, x2, v, tile, covar):
    return _pallas_matvec(x1, x2, v, tile, covar), (x1, x2, v)


def _kernel_matvec_bwd(tile, covar, res, g):
    x1, x2, v = res
    dv = _pallas_matvec(x2, x1, g, tile, covar)  # K^T g
    # dx1_i = 2 sum_j W_ij (x1_i - x2_j),  W = k'(d2) o (g v^T)
    wx1, ws1 = _pallas_weighted(x1, x2, g, v, tile, covar)  # W @ x2, rowsum(W)
    dx1 = 2.0 * (ws1[:, None] * x1 - wx1)
    wx2, ws2 = _pallas_weighted(x2, x1, v, g, tile, covar)  # W^T @ x1, colsum(W)
    dx2 = 2.0 * (ws2[:, None] * x2 - wx2)
    return dx1, dx2, dv


kernel_matvec.defvjp(_kernel_matvec_fwd, _kernel_matvec_bwd)


def rbf_matvec(x1: jax.Array, x2: jax.Array, v: jax.Array, tile: int = 512):
    """RBF alias of :func:`kernel_matvec`."""
    return kernel_matvec(x1, x2, v, tile, "rbf")
