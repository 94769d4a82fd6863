"""SKI / KISS-GP: structured kernel interpolation onto a regular grid.

The downstream pattern the reference's InterpolatedLinearOperator exists for
(interpolated_linear_operator.py:20, SKI/KISS-GP; Wilson & Nickisch 2015):

    K_SKI = W K_grid W^T,   K_grid = (x)_d Toeplitz_d  (product kernels)

W holds 2^D linear-interpolation weights per point (gather/scatter-add),
K_grid mat-vecs are Kronecker sweeps of FFT Toeplitz multiplies — an
O(n 2^D + M log M) mat-vec, so CG/SLQ scale to millions of points.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .gp import _softplus

from ..operators import (
    GridInterpolatedLinearOperator,
    InterpolatedLinearOperator,
    KroneckerProductLinearOperator,
    ToeplitzLinearOperator,
)
from ..functions import inv_quad_logdet, solve
from ..utils.grid_interp import flatten_grid_interp, grid_interp_feasible


class GridSpec(NamedTuple):
    mins: jax.Array  # (D,)
    maxs: jax.Array  # (D,)
    sizes: tuple  # (D,) static ints


def make_grid(x: jax.Array, sizes: Sequence[int], pad: float = 0.1) -> GridSpec:
    mins = jnp.min(x, axis=0)
    maxs = jnp.max(x, axis=0)
    span = jnp.maximum(maxs - mins, 1e-6)
    return GridSpec(mins - pad * span, maxs + pad * span, tuple(int(s) for s in sizes))


def linear_interp_weights_per_dim(x: jax.Array, grid: GridSpec):
    """Per-dim linear interpolation stencils: tuples of (n, 2) indices/weights."""
    D = x.shape[-1]
    idx_list, w_list = [], []
    for d in range(D):
        m = grid.sizes[d]
        h = (grid.maxs[d] - grid.mins[d]) / (m - 1)
        pos = jnp.clip((x[:, d] - grid.mins[d]) / h, 0.0, m - 1 - 1e-6)
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0
        idx_list.append(jnp.stack([i0, i0 + 1], axis=-1))  # (n, 2)
        w_list.append(jnp.stack([1.0 - frac, frac], axis=-1))  # (n, 2)
    return tuple(idx_list), tuple(w_list)


def cubic_interp_weights_per_dim(x: jax.Array, grid: GridSpec):
    """Per-dim cubic-convolution stencils (Keys 1981, a=-0.5): (n, 4) each.

    The 4-point stencil is what makes KISS-GP accurate on coarse grids
    (Wilson & Nickisch 2015 use cubic interpolation); interior weights sum
    to 1 and reproduce cubics exactly.  Boundary stencil points clamp to the
    grid, which merges duplicate indices additively — both the scatter and
    the one-hot engines accumulate them exactly.
    """

    def keys(s):
        s = jnp.abs(s)
        near = (1.5 * s - 2.5) * s * s + 1.0
        far = ((-0.5 * s + 2.5) * s - 4.0) * s + 2.0
        return jnp.where(s <= 1.0, near, jnp.where(s < 2.0, far, 0.0))

    D = x.shape[-1]
    idx_list, w_list = [], []
    offsets = jnp.arange(-1, 3)  # floor-1 .. floor+2
    for d in range(D):
        m = grid.sizes[d]
        h = (grid.maxs[d] - grid.mins[d]) / (m - 1)
        pos = jnp.clip((x[:, d] - grid.mins[d]) / h, 0.0, m - 1 - 1e-6)
        i0 = jnp.floor(pos).astype(jnp.int32)
        pts = i0[:, None] + offsets[None, :]  # (n, 4) unclamped stencil
        # Keys weights on the unclamped stencil sum to 1 exactly (partition
        # of unity for |s| < 2); only the INDICES clamp at the boundary, so
        # boundary stencils become clamp-extrapolation with merged entries.
        w = keys(pos[:, None] - pts)  # (n, 4)
        idx_list.append(jnp.clip(pts, 0, m - 1).astype(jnp.int32))
        w_list.append(w)
    return tuple(idx_list), tuple(w_list)


def linear_interp_weights(x: jax.Array, grid: GridSpec):
    """Per-point 2^D linear interpolation (indices, values) onto the flat grid.

    x: (n, D) -> indices/values (n, 2^D); flat index uses row-major mixed
    radix over the per-dim grids (one shared implementation:
    utils/grid_interp.flatten_grid_interp).
    """
    idx_list, w_list = linear_interp_weights_per_dim(x, grid)
    return flatten_grid_interp(idx_list, w_list, grid.sizes)


def rbf_toeplitz_column(m: int, h, lengthscale, dtype=jnp.float32) -> jax.Array:
    """First column of the 1D RBF kernel on a regular grid with spacing h."""
    dist = jnp.arange(m, dtype=dtype) * h
    return jnp.exp(-0.5 * (dist / lengthscale) ** 2)


class SKIParams(NamedTuple):
    raw_lengthscale: jax.Array  # (D,)
    raw_outputscale: jax.Array
    raw_noise: jax.Array



class SKIGPRegression:
    """KISS-GP regression with an RBF product kernel on a regular grid.

    ``interp``: "linear" (2-point stencil) or "cubic" (4-point Keys stencil,
    the Wilson & Nickisch 2015 choice — much lower interpolation error on
    coarse grids for ~2x the W-application cost).
    """

    def __init__(self, grid: GridSpec, interp: str = "linear"):
        if interp not in ("linear", "cubic"):
            raise ValueError(f"unknown interp {interp!r}")
        self.grid = grid
        self.interp = interp

    def _interp_weights_per_dim(self, x):
        if self.interp == "cubic":
            return cubic_interp_weights_per_dim(x, self.grid)
        return linear_interp_weights_per_dim(x, self.grid)

    def init_params(self, d: int, dtype=jnp.float32) -> SKIParams:
        return SKIParams(
            raw_lengthscale=jnp.zeros((d,), dtype=dtype),
            raw_outputscale=jnp.zeros((), dtype=dtype),
            raw_noise=jnp.asarray(-2.0, dtype=dtype),
        )

    def grid_operator(self, params: SKIParams):
        ls = _softplus(params.raw_lengthscale)
        os_ = _softplus(params.raw_outputscale)
        factors = []
        D = len(self.grid.sizes)
        for d in range(D):
            m = self.grid.sizes[d]
            h = (self.grid.maxs[d] - self.grid.mins[d]) / (m - 1)
            col = rbf_toeplitz_column(m, h, ls[d], dtype=params.raw_outputscale.dtype)
            # fold the outputscale into the first factor
            if d == 0:
                col = col * os_
            factors.append(ToeplitzLinearOperator(col))
        if D == 1:
            return factors[0]
        return KroneckerProductLinearOperator(tuple(factors))

    def covariance(self, params: SKIParams, x1, x2=None):
        k_grid = self.grid_operator(params)
        # one-hot MXU interpolation engine when the panel fits (D <= 2 or
        # small grids); flat gather/scatter otherwise (utils/grid_interp.py)
        li, lv = self._interp_weights_per_dim(x1)
        if x2 is None:
            ri, rv = li, lv
        else:
            ri, rv = self._interp_weights_per_dim(x2)
        lv = tuple(v.astype(k_grid.dtype) for v in lv)
        rv = tuple(v.astype(k_grid.dtype) for v in rv)
        if grid_interp_feasible(self.grid.sizes, 16):
            return GridInterpolatedLinearOperator(
                k_grid, li, lv, ri, rv, self.grid.sizes
            )
        fli, flv = flatten_grid_interp(li, lv, self.grid.sizes)
        fri, frv = flatten_grid_interp(ri, rv, self.grid.sizes)
        return InterpolatedLinearOperator(k_grid, fli, flv, fri, frv)

    def train_operator(self, params: SKIParams, x):
        return self.covariance(params, x).add_diagonal(_softplus(params.raw_noise))

    def neg_mll(self, params: SKIParams, x, y, *, key=None) -> jax.Array:
        n = y.shape[-1]
        K = self.train_operator(params, x)
        iq, ld = inv_quad_logdet(K, y[..., None], logdet=True, key=key)
        return 0.5 * jnp.mean(iq + ld + n * jnp.log(2.0 * jnp.pi)) / n

    def posterior_mean(self, params: SKIParams, x, y, x_star):
        K = self.train_operator(params, x)
        alpha = solve(K, y[..., None])
        k_star = self.covariance(params, x_star, x)
        return (k_star @ alpha)[..., 0]

    def posterior(self, params: SKIParams, x, y, x_star, *, key=None):
        """Predictive mean and latent variance at ``x_star`` via the shared
        LOVE helper (models/gp.py:love_posterior) — O(n k) once,
        O(m 2^D k) per query block, never an m x n dense block."""
        from .gp import love_posterior

        K = self.train_operator(params, x)
        k_star = self.covariance(params, x_star, x)
        k_ss_diag = self.covariance(params, x_star).diagonal()
        return love_posterior(K, k_star, y, k_ss_diag, key=key)
