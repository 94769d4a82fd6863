"""Lazy kernel matrices K[i,j] = k(x1_i, x2_j; params) — never materialized.

Reference: linear_operator/operators/kernel_linear_operator.py:46-437 (and the
deprecated KeOps offload, keops_linear_operator.py:14 — the TPU equivalent of
KeOps tiles is the blocked/Pallas mat-vec here).

Design:
* ``covar_func(x1, x2, **params) -> kernel block`` is a static (hashable)
  field; data ``x1``/``x2`` and the hyperparameter dict are differentiable
  pytree children, so gradients reach kernel hyperparameters through every
  solve/logdet path for free (the reference needs per-param non-batch-dim
  bookkeeping, :138-230 — pytrees make that moot).
* ``_matmul`` evaluates K in row blocks of ``block_rows`` via ``lax.map``:
  O(block * m) memory, dense MXU matmuls per block.  For RBF-style kernels
  ``ops.rbf_matvec`` provides a fused Pallas kernel used by RBFKernel below.
* ``_get_indices`` re-invokes the kernel on gathered points (reference
  :263-378), which makes pivoted Cholesky preconditioning O(n k) kernel
  evaluations instead of O(n^2) memory.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .. import _pytree
from .._pytree import operator_class, static_field
from ..utils.broadcasting import broadcast_shapes
from ._linear_operator import LinearOperator


def _covar_matmul(kb, rhs: jax.Array) -> jax.Array:
    """K-block @ rhs where the covar closure may return a dense array or a
    LinearOperator (reference allows both — kernel_linear_operator.py:55-56).

    Both branches contract at >= HIGH precision: the TPU default single-pass
    bf16 product injects ~1e-2 mat-vec noise that stalls CG (see
    ``KernelLinearOperator._matmul``); the operator branch gets the same
    guarantee via the scoped default-matmul-precision config, since its
    internal dots use the ambient default."""
    if isinstance(kb, LinearOperator):
        with jax.default_matmul_precision("high"):
            return kb.matmul(rhs)
    return jnp.matmul(kb, rhs, precision=jax.lax.Precision.HIGH)


def _covar_dense(kb) -> jax.Array:
    return kb.to_dense() if isinstance(kb, LinearOperator) else kb


@operator_class
class KernelLinearOperator(LinearOperator):
    x1: jax.Array  # (*b, n, d)
    x2: jax.Array  # (*b, m, d)
    params: dict  # str -> differentiable hyperparameter arrays
    covar_func: Callable = static_field()
    block_rows: int = static_field(default=4096)
    symmetric: bool = static_field(default=False)
    matvec_impl: Callable | None = static_field(default=None)
    # matvec_impl(x1, x2, rhs, params, symmetric=...) -> K @ rhs: a fused
    # (Pallas) kernel mat-vec that never materializes kernel blocks; used
    # when set, with the blocked covar_func path as the generic fallback.
    materialize_threshold: int | None = static_field(default=2**30)
    # Byte budget for per-solve K caching (``_matmul_closure``): when the
    # full f32 kernel matrix fits, iterative solvers materialize K ONCE per
    # solve instead of re-evaluating it every CG/Lanczos iteration — a
    # ~(num iterations)x cut in kernel evaluations.  The default 1 GiB
    # budget (n*m <= ~16k^2 unbatched) leaves HBM room for solver state;
    # None disables caching.  The reference materializes the covar block in
    # every ``_matmul`` (kernel_linear_operator.py:379) — here streaming is
    # the fallback, caching the per-solve optimization.
    matvec_closure_impl: Callable | None = static_field(default=None)
    # matvec_closure_impl(x1, x2, params, symmetric) -> (closure | None):
    # a per-SOLVE closure builder (hoisted setup, e.g. building the bf16
    # upper-triangle tile cache once and streaming it every CG iteration);
    # returning None falls back to the f32-dense cache / streaming paths.
    num_outputs_per_input: tuple = static_field(default=(1, 1))
    # (t1, t2): each x1 row produces t1 kernel rows, each x2 row t2 columns
    # (multitask / LMC / gradient kernels — reference
    # kernel_linear_operator.py:130-134, 402-410).
    nonbatch_dims: tuple | None = static_field(default=None)
    # Per-hyperparameter non-batch dimension counts, encoded as a hashable
    # (("name", k), ...) tuple; unnamed params default to 2 (reference
    # ``num_nonbatch_dimensions``, kernel_linear_operator.py:144-172).  A
    # param's leading ``ndim - k`` dims are BATCH dims that broadcast into
    # the operator's batch shape (see ``_shape``).
    static_params: tuple = static_field(default=())
    # Non-array covar_func kwargs as a hashable (("name", value), ...) tuple
    # (reference ``nontensor_params``, kernel_linear_operator.py:153-160).

    @property
    def _symmetric_hint(self) -> bool:
        return self.symmetric

    @property
    def tensor_params(self) -> dict:
        """Differentiable hyperparameters (reference ``tensor_params``)."""
        return self.params

    @property
    def nontensor_params(self) -> dict:
        """Non-array covar kwargs (reference ``nontensor_params``)."""
        return dict(self.static_params)

    def _all_params(self) -> dict:
        return {**self.params, **dict(self.static_params)}

    def _nonbatch(self, name: str) -> int:
        for key, k in self.nonbatch_dims or ():
            if key == name:
                return k
        return 2

    def _param_batch_shapes(self) -> list[tuple[int, ...]]:
        shapes = []
        for name, val in self.params.items():
            k = self._nonbatch(name)
            shape = jnp.shape(val)
            shapes.append(shape[: max(0, len(shape) - k)] if k else shape)
        return shapes

    def _batch_shape(self) -> tuple[int, ...]:
        return broadcast_shapes(
            self.x1.shape[:-2], self.x2.shape[:-2], *self._param_batch_shapes()
        )

    def _shape(self) -> tuple[int, ...]:
        t1, t2 = self.num_outputs_per_input
        return (
            *self._batch_shape(),
            self.x1.shape[-2] * t1,
            self.x2.shape[-2] * t2,
        )

    @property
    def covar_mat(self):
        """``covar_func(x1, x2, **params)`` — a dense array or a
        LinearOperator (reference ``covar_mat``, :256-261)."""
        return self.covar_func(self.x1, self.x2, **self._all_params())

    def _transpose(self) -> "KernelLinearOperator":
        t1, t2 = self.num_outputs_per_input
        return _pytree.replace(
            self,
            x1=self.x2,
            x2=self.x1,
            num_outputs_per_input=(t2, t1),
        )

    def _matmul_closure(self):
        """Per-solve K caching: materialize the kernel matrix once when it
        fits ``materialize_threshold`` bytes in f32 (see field docs).  When
        a ``matvec_closure_impl`` is registered (e.g. the RBF bf16
        upper-triangle tile cache for large symmetric kernels), it takes
        precedence — it self-gates on shape/platform and returns None when
        not applicable.

        ``settings.memory_efficient`` (the reference's cache-vs-recompute
        trade, functions/_matmul.py:26 et al.) disables BOTH caches here:
        every solver iteration recomputes kernel blocks, trading FLOPs for
        the cache's HBM footprint — its exact reference meaning, applied at
        the one place this engine chooses between caching and recompute."""
        import math

        from .. import settings

        if settings.memory_efficient.on():
            return self._matmul
        if self.matvec_closure_impl is not None:
            closure = self.matvec_closure_impl(
                self.x1, self.x2, self.params, self.symmetric
            )
            if closure is not None:
                return closure
        thr = self.materialize_threshold
        if thr is not None and math.prod(self.shape) * 4 <= thr:
            kd = self.to_dense().astype(jnp.float32)

            def cached_mm(rhs: jax.Array) -> jax.Array:
                return jnp.matmul(
                    kd,
                    rhs.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGH,
                ).astype(rhs.dtype)

            return cached_mm
        return self._matmul

    def _kernel_block(self, x1_block: jax.Array) -> jax.Array:
        return self.covar_func(x1_block, self.x2, **self._all_params())

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        # The K-block @ rhs contraction needs >= 3-pass-bf16 (HIGH) products:
        # the TPU default single-pass-bf16 matmul injects ~1e-2 relative noise
        # into the mat-vec, which stalls CG above tolerance (residuals even
        # grow — the effective operator stops being symmetric to that order).
        # HIGH converges identically to HIGHEST here at ~3/6 the passes.
        if self.matvec_impl is not None:
            return self.matvec_impl(
                self.x1, self.x2, rhs, self.params, symmetric=self.symmetric
            )
        t1, _ = self.num_outputs_per_input
        n = self.x1.shape[-2]
        if n <= self.block_rows:
            return _covar_matmul(self._kernel_block(self.x1), rhs)
        nblocks = -(-n // self.block_rows)
        pad = nblocks * self.block_rows - n
        x1p = jnp.pad(self.x1, [(0, 0)] * (self.x1.ndim - 2) + [(0, pad), (0, 0)])
        x1b = jnp.moveaxis(
            x1p.reshape(*x1p.shape[:-2], nblocks, self.block_rows, x1p.shape[-1]),
            -3,
            0,
        )  # (nblocks, *b, block, d)

        # jax.checkpoint: without it, differentiating through the lax.map
        # stacks each block's matmul residual — i.e. the ENTIRE kernel matrix
        # (nblocks, block, m) — into one allocation (40+ GB at n=m=1e5).
        # With remat the only stacked residual is x1_block itself; the
        # backward re-forms each kernel block (one extra formation sweep per
        # bwd pass — the same recompute-don't-store design as the forward).
        @jax.checkpoint
        def one_block(x1_block, x2, rhs, params):
            return _covar_matmul(
                self.covar_func(x1_block, x2, **params, **dict(self.static_params)),
                rhs,
            )

        out = jax.lax.map(
            lambda xb: one_block(xb, self.x2, rhs, self.params), x1b
        )  # (nblocks, *bb, block*t1, t)
        out = jnp.moveaxis(out, 0, -3)
        out = out.reshape(
            *out.shape[:-3], nblocks * self.block_rows * t1, out.shape[-1]
        )
        return out[..., : n * t1, :]

    def _bilinear_derivative(self, left_vecs, right_vecs):
        """Fused blocked backward (one formation sweep).

        The default path — ``jax.grad`` through the ``jax.checkpoint``ed
        blocked ``_matmul`` — runs the forward mat-vec (one kernel-block
        formation sweep) and then REMATERIALIZES every block a second time
        inside the VJP.  Taking the gradient PER BLOCK inside the sweep
        instead keeps each block's residuals alive only for that block, so
        the whole bilinear derivative costs ONE formation sweep plus the
        narrow cotangent contractions (the reference's analytic
        ``_bilinear_derivative`` overrides exist for the same reason,
        _linear_operator.py:336-393).
        """
        t1, _ = self.num_outputs_per_input
        n = self.x1.shape[-2]
        if self.matvec_impl is not None or n <= self.block_rows:
            # small (single-block: residuals fit, default stores them once)
            # or fused-Pallas mat-vec (its own VJP wiring applies)
            return super()._bilinear_derivative(left_vecs, right_vecs)

        nblocks = -(-n // self.block_rows)
        pad = nblocks * self.block_rows - n
        x1p = jnp.pad(self.x1, [(0, 0)] * (self.x1.ndim - 2) + [(0, pad), (0, 0)])
        x1b = jnp.moveaxis(
            x1p.reshape(*x1p.shape[:-2], nblocks, self.block_rows, x1p.shape[-1]),
            -3,
            0,
        )  # (nblocks, *b1, block, d)
        # zero-pad left along n*t1: pad rows contribute zero cotangent
        lp = jnp.pad(
            left_vecs, [(0, 0)] * (left_vecs.ndim - 2) + [(0, pad * t1), (0, 0)]
        )
        lb = jnp.moveaxis(
            lp.reshape(
                *lp.shape[:-2], nblocks, self.block_rows * t1, lp.shape[-1]
            ),
            -3,
            0,
        )  # (nblocks, *bl, block*t1, t)

        def block_grad(x1_block, left_block):
            def g(x1_block, x2, params):
                kb = self.covar_func(
                    x1_block, x2, **params, **dict(self.static_params)
                )
                return jnp.sum(left_block * _covar_matmul(kb, right_vecs))

            return jax.grad(g, argnums=(0, 1, 2), allow_int=True)(
                x1_block, self.x2, self.params
            )

        dx1b, dx2b, dparamsb = jax.lax.map(
            lambda ab: block_grad(*ab), (x1b, lb)
        )
        dx1 = jnp.moveaxis(dx1b, 0, -3)
        dx1 = dx1.reshape(*dx1.shape[:-3], nblocks * self.block_rows, dx1.shape[-1])
        dx1 = dx1[..., :n, :]
        dx2 = jnp.sum(dx2b, axis=0)
        def _sum_blocks(a):
            # Int param leaves produce float0 cotangents (symbolic zeros;
            # grad ran with allow_int, matching the base path) — drop the
            # stacked block dim instead of summing, since float0 has no sum.
            if a.dtype == jax.dtypes.float0:
                return a[0]
            return jnp.sum(a, axis=0)

        dparams = jax.tree_util.tree_map(_sum_blocks, dparamsb)
        return _pytree.replace(self, x1=dx1, x2=dx2, params=dparams)

    def _per_point_blocks(self) -> jax.Array:
        """(*b, n, t1, t2) per-point kernel blocks: n shoved into a batch dim
        and the covar closure re-invoked on singleton data (reference
        ``_diagonal``, :230-254)."""
        # Batched params gain the n singleton just before their non-batch
        # dims; params with no batch dims broadcast as-is.
        params = {}
        for name, val in self.params.items():
            k = self._nonbatch(name)
            if jnp.ndim(val) > k:  # has batch dims: align them before n
                val = jnp.expand_dims(val, -(k + 1))
            params[name] = val
        vals = self.covar_func(
            self.x1[..., :, None, :],
            self.x2[..., :, None, :],
            **params,
            **dict(self.static_params),
        )  # (*b, n, t1, t2)
        return _covar_dense(vals)

    def _diagonal(self) -> jax.Array:
        vals = self._per_point_blocks()
        if self.num_outputs_per_input == (1, 1):
            return vals[..., 0, 0]
        # (*b, n, t, t) -> per-point block diagonals, flattened to (*b, n*t)
        d = jnp.diagonal(vals, axis1=-2, axis2=-1)  # (*b, n, t)
        return d.reshape(*d.shape[:-2], -1)

    def to_dense(self) -> jax.Array:
        return _covar_dense(self.covar_mat)

    def _covar_mat_operator(self) -> LinearOperator:
        from .dense import DenseLinearOperator

        mat = self.covar_mat
        return mat if isinstance(mat, LinearOperator) else DenseLinearOperator(mat)

    def _broadcast_data(self) -> tuple[jax.Array, jax.Array]:
        """x1/x2 broadcast to the operator's full batch shape (the reference
        expands them in __init__, :202-208); needed before batch indexing."""
        bshape = self._batch_shape()
        return (
            jnp.broadcast_to(self.x1, (*bshape, *self.x1.shape[-2:])),
            jnp.broadcast_to(self.x2, (*bshape, *self.x2.shape[-2:])),
        )

    def _index_param(self, name, val, batch_indices):
        """params[*batch_indices, (nonbatch...)] with the param broadcast to
        the operator batch shape first (the reference expands every param to
        ``batch_broadcast_shape`` in __init__, :202-208)."""
        if not batch_indices:
            return val
        k = self._nonbatch(name)
        nonbatch = jnp.shape(val)[max(0, jnp.ndim(val) - k) :] if k else ()
        val = jnp.broadcast_to(val, (*self._batch_shape(), *nonbatch))
        return val[(*batch_indices, *([slice(None)] * len(nonbatch)))]

    def _getitem(self, row_index, col_index, *batch_indices) -> LinearOperator:
        if self.num_outputs_per_input != (1, 1):
            # Multi-output rows/cols don't correspond 1:1 to data points;
            # delegate to the materialized covar operator (the reference
            # falls back to ``covar_mat._getitem`` here, :300-355).
            return self._covar_mat_operator()._getitem(
                row_index, col_index, *batch_indices
            )
        x1, x2 = self._broadcast_data() if batch_indices else (self.x1, self.x2)
        x1 = x1[(*batch_indices, row_index, slice(None))]
        x2 = x2[(*batch_indices, col_index, slice(None))]
        params = {
            k: self._index_param(k, v, batch_indices)
            for k, v in self.params.items()
        }
        return _pytree.replace(
            self,
            x1=x1,
            x2=x2,
            params=params,
            symmetric=self.symmetric
            and isinstance(row_index, slice)
            and isinstance(col_index, slice)
            and row_index == col_index,
            matvec_impl=None,  # fused engines may not handle sub-shapes
        )

    def _get_indices(self, row_index, col_index, *batch_indices) -> jax.Array:
        """Pointwise kernel evaluation on gathered inputs (reference
        :263-378): k(x1[i], x2[j]) elementwise over broadcast index arrays."""
        t1, t2 = self.num_outputs_per_input
        data_row = row_index // t1 if t1 != 1 else row_index
        data_col = col_index // t2 if t2 != 1 else col_index
        x1, x2 = self._broadcast_data() if batch_indices else (self.x1, self.x2)
        x1 = x1[(*batch_indices, data_row, slice(None))]  # (*idx, d)
        x2 = x2[(*batch_indices, data_col, slice(None))]
        # pointwise indexing keeps the param's non-batch dims whole, so the
        # trailing no-op slices of _index_param are exactly right here too
        params = {
            name: self._index_param(name, val, batch_indices)
            for name, val in self.params.items()
        }
        vals = _covar_dense(
            self.covar_func(
                x1[..., None, :],
                x2[..., None, :],
                **params,
                **dict(self.static_params),
            )
        )  # (*idx, t1, t2)
        if (t1, t2) == (1, 1):
            return vals[..., 0, 0]
        return jnp.take_along_axis(
            jnp.take_along_axis(
                vals, (row_index % t1)[..., None, None], axis=-2
            ),
            (col_index % t2)[..., None, None],
            axis=-1,
        )[..., 0, 0]

    def _select_rows(self, idx) -> LinearOperator:
        """K[idx, :] stays a lazy kernel operator on gathered points
        (reference :263-378 re-invokes the covar closure on sub-data)."""
        if self.num_outputs_per_input != (1, 1):
            return super()._select_rows(idx)
        # matvec_impl/_closure_impl dropped: fused engines may carry shape
        # assumptions a gathered subset breaks; blocked path is the fallback.
        return _pytree.replace(
            self,
            x1=self.x1[..., idx, :],
            symmetric=False,
            matvec_impl=None,
            matvec_closure_impl=None,
        )

    def _select_cols(self, idx) -> LinearOperator:
        if self.num_outputs_per_input != (1, 1):
            return super()._select_cols(idx)
        return _pytree.replace(
            self,
            x2=self.x2[..., idx, :],
            symmetric=False,
            matvec_impl=None,
            matvec_closure_impl=None,
        )


# ---------------------------------------------------------------------------
# Standard kernels
# ---------------------------------------------------------------------------


def _sq_dist(x1s: jax.Array, x2s: jax.Array) -> jax.Array:
    """Pairwise squared distances, exact in f32.

    For small d (the common GP case) an unrolled broadcast-difference sum on
    the VPU is both exact and faster than the expanded-quadratic matmul: the
    TPU MXU's bf16-based f32 emulation either perturbs distances by ~1e-3
    (default precision — enough to shift solves near the noise floor) or
    costs 6 passes (HIGHEST).  For larger d, fall back to the MXU quadratic
    at HIGHEST precision.
    """
    d = x1s.shape[-1]
    if d <= 8:
        batch = jnp.broadcast_shapes(x1s.shape[:-2], x2s.shape[:-2])
        d2 = jnp.zeros(
            (*batch, x1s.shape[-2], x2s.shape[-2]), dtype=x1s.dtype
        )
        for k in range(d):
            diff = x1s[..., :, None, k] - x2s[..., None, :, k]
            d2 = d2 + diff * diff
        return d2
    sq1 = jnp.sum(x1s * x1s, axis=-1)[..., :, None]
    sq2 = jnp.sum(x2s * x2s, axis=-1)[..., None, :]
    inner = jnp.matmul(
        x1s, jnp.swapaxes(x2s, -1, -2), precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(sq1 + sq2 - 2.0 * inner, 0.0)


def rbf_covar(x1: jax.Array, x2: jax.Array, lengthscale, outputscale) -> jax.Array:
    """outputscale * exp(-||x1-x2||^2 / (2 l^2))."""
    d2 = _sq_dist(x1 / lengthscale, x2 / lengthscale)
    return outputscale * jnp.exp(-0.5 * d2)


def matern52_covar(x1, x2, lengthscale, outputscale):
    d2 = _sq_dist(x1 / lengthscale, x2 / lengthscale)
    d = jnp.sqrt(d2 + 1e-30)
    s5d = jnp.sqrt(5.0) * d
    return outputscale * (1.0 + s5d + 5.0 / 3.0 * d2) * jnp.exp(-s5d)


def matern32_covar(x1, x2, lengthscale, outputscale):
    d2 = _sq_dist(x1 / lengthscale, x2 / lengthscale)
    d = jnp.sqrt(d2 + 1e-30)
    s3d = jnp.sqrt(3.0) * d
    return outputscale * (1.0 + s3d) * jnp.exp(-s3d)


def matern12_covar(x1, x2, lengthscale, outputscale):
    """Exponential / Ornstein-Uhlenbeck kernel (Matern nu=1/2):
    outputscale * exp(-||x1-x2|| / l)."""
    d2 = _sq_dist(x1 / lengthscale, x2 / lengthscale)
    return outputscale * jnp.exp(-jnp.sqrt(d2 + 1e-30))


def rq_covar(x1, x2, lengthscale, outputscale, alpha):
    """Rational quadratic: outputscale * (1 + d2 / (2 alpha))^-alpha — a scale
    mixture of RBF kernels; all four hyperparameters are differentiable."""
    d2 = _sq_dist(x1 / lengthscale, x2 / lengthscale)
    return outputscale * (1.0 + d2 / (2.0 * alpha)) ** (-alpha)


def periodic_covar(x1, x2, lengthscale, outputscale, period):
    """Periodic (MacKay) kernel:
    outputscale * exp(-2 sum_k sin^2(pi (x1_k - x2_k) / p) / l^2).

    ``lengthscale`` / ``period`` may be scalars or per-dimension ``(d,)``
    arrays.  Accumulated per input dimension like ``_sq_dist`` so no
    (n, m, d) intermediate is formed (exact VPU arithmetic, no MXU)."""
    d = x1.shape[-1]
    ls, pd = jnp.asarray(lengthscale), jnp.asarray(period)
    batch = jnp.broadcast_shapes(x1.shape[:-2], x2.shape[:-2])
    s2 = jnp.zeros((*batch, x1.shape[-2], x2.shape[-2]), dtype=x1.dtype)
    for k in range(d):
        p_k = pd[..., k] if pd.ndim else pd
        l_k = ls[..., k] if ls.ndim else ls
        s = jnp.sin(jnp.pi * (x1[..., :, None, k] - x2[..., None, :, k]) / p_k)
        s2 = s2 + (s * s) / (l_k * l_k)
    return outputscale * jnp.exp(-2.0 * s2)


def spectral_mixture_covar(x1, x2, weights, means, scales):
    """Spectral mixture kernel (Wilson & Adams 2013, eq. 12):

        k(tau) = sum_q w_q  prod_d exp(-2 pi^2 tau_d^2 s_qd^2) cos(2 pi mu_qd tau_d)

    with tau = x1 - x2, mixture ``weights`` (Q,), spectral ``means`` (Q, d)
    and ``scales`` (Q, d) — all differentiable.  The GPyTorch counterpart is
    ``SpectralMixtureKernel`` (a consumer of the reference stack); here it is
    a plain covar closure for ``KernelLinearOperator``'s blocked engine.

    Accumulated per (q, d) on the VPU like ``_sq_dist`` — the (n, m)
    pairwise difference per dimension is formed once and reused across the Q
    static mixture components; no (n, m, d) or (n, m, Q) intermediate."""
    weights = jnp.asarray(weights)
    means = jnp.atleast_2d(jnp.asarray(means))
    scales = jnp.atleast_2d(jnp.asarray(scales))
    num_mix = means.shape[0]
    d = x1.shape[-1]
    two_pi = 2.0 * jnp.pi
    acc = None  # per-component running products over dimensions
    for dim in range(d):
        tau = x1[..., :, None, dim] - x2[..., None, :, dim]
        tau2 = tau * tau
        terms = [
            jnp.exp(-2.0 * jnp.pi**2 * tau2 * scales[q, dim] ** 2)
            * jnp.cos(two_pi * means[q, dim] * tau)
            for q in range(num_mix)
        ]
        if acc is None:
            acc = [weights[q] * terms[q] for q in range(num_mix)]
        else:
            acc = [acc[q] * terms[q] for q in range(num_mix)]
    return sum(acc)


def spectral_mixture_kernel_operator(
    x1: jax.Array,
    x2: jax.Array | None = None,
    *,
    weights,
    means,
    scales,
    block_rows: int = 4096,
    materialize_threshold: int | None = 2**30,
) -> KernelLinearOperator:
    """Spectral mixture kernel operator on the blocked lazy engine.

    Not a function of ||x1-x2||^2 alone, so no fused stationary-tile path;
    the blocked ``lax.map`` engine (and per-solve K caching) applies."""
    symmetric = x2 is None
    if x2 is None:
        x2 = x1
    return KernelLinearOperator(
        x1,
        x2,
        {
            "weights": jnp.asarray(weights),
            "means": jnp.atleast_2d(jnp.asarray(means)),
            "scales": jnp.atleast_2d(jnp.asarray(scales)),
        },
        covar_func=spectral_mixture_covar,
        block_rows=block_rows,
        symmetric=symmetric,
        materialize_threshold=materialize_threshold,
    )


def matern_kernel_operator(
    x1: jax.Array,
    x2: jax.Array | None = None,
    *,
    lengthscale,
    outputscale,
    nu: float = 2.5,
    block_rows: int = 4096,
    use_pallas: bool = False,
    materialize_threshold: int | None = 2**30,
) -> KernelLinearOperator:
    """Matern kernel operator (nu in {0.5, 1.5, 2.5}), same lazy engine as RBF.

    ``use_pallas`` switches the mat-vec to the fused Pallas stationary-kernel
    tiles (ops/rbf.py), the TPU analog of the reference's KeOps offload for
    Matern covariances (reference keops_linear_operator.py:14)."""
    if nu == 2.5:
        covar, pallas_impl = matern52_covar, matern52_pallas_matvec
    elif nu == 1.5:
        covar, pallas_impl = matern32_covar, matern32_pallas_matvec
    elif nu == 0.5:
        covar, pallas_impl = matern12_covar, matern12_pallas_matvec
    else:
        raise ValueError(f"nu must be 0.5, 1.5 or 2.5, got {nu}")
    symmetric = x2 is None
    if x2 is None:
        x2 = x1
    return KernelLinearOperator(
        x1,
        x2,
        {"lengthscale": jnp.asarray(lengthscale), "outputscale": jnp.asarray(outputscale)},
        covar_func=covar,
        block_rows=block_rows,
        symmetric=symmetric,
        matvec_impl=pallas_impl if use_pallas else None,
        materialize_threshold=materialize_threshold,
    )


def _pallas_covar_matvec(
    covar: str, x1, x2, rhs, params, *, symmetric: bool = False, tile: int = 512
):
    """Fused Pallas stationary-kernel mat-vec (ops/rbf.py): prescaling keeps
    hyperparameter gradients in jnp-land while the tiles never materialize K.

    When the operator is symmetric (x1 == x2, unbatched, few columns) the
    symmetric upper-triangle kernel is used — each kernel tile is formed once,
    halving the VPU transcendental work that bounds this mat-vec."""
    from ..ops.rbf import kernel_matvec, kernel_matvec_sym, sym_matvec_supported

    ls = params["lengthscale"]
    os_ = params["outputscale"]
    x1s = (x1 / ls).astype(jnp.float32)
    x2s = (x2 / ls).astype(jnp.float32)
    if (
        symmetric
        and x1.ndim == 2
        and rhs.ndim == 2
        and sym_matvec_supported(x1.shape[-2], rhs.shape[-1], 0)
    ):
        out = kernel_matvec_sym(x1s, rhs.astype(jnp.float32), 1024, covar)
    elif x1.ndim == 2 and rhs.ndim == 2:
        out = kernel_matvec(x1s, x2s, rhs.astype(jnp.float32), tile, covar)
    else:
        # Batched (possibly rectangular, x1 n-points != x2 m-points):
        # broadcast each argument to the joint batch with its OWN point count.
        batch = jnp.broadcast_shapes(
            x1s.shape[:-2], x2s.shape[:-2], rhs.shape[:-2]
        )
        f1 = jnp.broadcast_to(x1s, (*batch, *x1s.shape[-2:])).reshape(
            -1, *x1s.shape[-2:]
        )
        rb = (
            jnp.broadcast_to(rhs, (*batch, *rhs.shape[-2:]))
            .reshape(-1, *rhs.shape[-2:])
            .astype(jnp.float32)
        )
        if (
            symmetric
            and x1s.shape[-2] == x2s.shape[-2]
            and sym_matvec_supported(x1s.shape[-2], rhs.shape[-1], 0)
        ):
            # Batched GPs get the halved-transcendental symmetric engine too
            # (vmap adds a leading grid dim to the tile program; the
            # column-accumulator VMEM budget is per program instance).
            out = jax.vmap(
                lambda a, v: kernel_matvec_sym(a, v, 1024, covar)
            )(f1, rb)
        else:
            f2 = jnp.broadcast_to(x2s, (*batch, *x2s.shape[-2:])).reshape(
                -1, *x2s.shape[-2:]
            )
            out = jax.vmap(lambda a, b, v: kernel_matvec(a, b, v, tile, covar))(
                f1, f2, rb
            )
        out = out.reshape(*batch, *out.shape[-2:])
    return (os_ * out).astype(rhs.dtype)


def rbf_pallas_matvec(x1, x2, rhs, params, *, symmetric: bool = False, tile: int = 512):
    return _pallas_covar_matvec(
        "rbf", x1, x2, rhs, params, symmetric=symmetric, tile=tile
    )


def matern52_pallas_matvec(
    x1, x2, rhs, params, *, symmetric: bool = False, tile: int = 512
):
    return _pallas_covar_matvec(
        "matern52", x1, x2, rhs, params, symmetric=symmetric, tile=tile
    )


def matern32_pallas_matvec(
    x1, x2, rhs, params, *, symmetric: bool = False, tile: int = 512
):
    return _pallas_covar_matvec(
        "matern32", x1, x2, rhs, params, symmetric=symmetric, tile=tile
    )


def matern12_pallas_matvec(
    x1, x2, rhs, params, *, symmetric: bool = False, tile: int = 512
):
    return _pallas_covar_matvec(
        "matern12", x1, x2, rhs, params, symmetric=symmetric, tile=tile
    )


# One matvec_impl instance per static alpha so equal-alpha RQ operators share
# a treedef (static fields compare by equality -> shared jit cache entries).
_RQ_PALLAS_IMPLS: dict = {}


def _rq_pallas_matvec(alpha: float):
    from ..ops.rbf import rq_tile_covar

    alpha = float(alpha)
    if alpha not in _RQ_PALLAS_IMPLS:
        name = rq_tile_covar(alpha)

        def impl(x1, x2, rhs, params, *, symmetric=False, tile=512, _name=name):
            return _pallas_covar_matvec(
                _name, x1, x2, rhs, params, symmetric=symmetric, tile=tile
            )

        _RQ_PALLAS_IMPLS[alpha] = impl
    return _RQ_PALLAS_IMPLS[alpha]


# HBM budget for the bf16 upper-triangle tile cache (~11 GiB leaves room for
# solver state on a 16 GiB chip); tiles are (tile, tile) bf16.
RBF_TILE_CACHE_BUDGET = 11 * 2**30
_RBF_TILE = 1024
_RBF_CACHE_MIN_N = 24_576  # below this the f32-dense cache path is better


def rbf_pallas_closure(x1, x2, params, symmetric):
    """Per-solve closure builder for large symmetric RBF kernels: build the
    bf16 upper-triangle tile cache ONCE (one exp sweep over n^2/2 entries),
    then every CG/Lanczos iteration streams stored tiles (ops/rbf.py;
    BASELINE.md roofline).

    NOT WIRED BY DEFAULT — measured negative result at N=1e5 (BASELINE.md):
    elementwise bf16 rounding of K has spectral norm ~2*2^-9*rms(K)*sqrt(n),
    which EXCEEDS a typical noise diagonal (~0.13), making bf16(K)+D
    indefinite — CG diverges.  Streaming at >= f32 fidelity needs 4 B/entry
    (~20 GB at N=1e5, over HBM), so kernel recomputation is the correct
    large-N design on this hardware; this cache remains available for
    regimes with a large noise floor (sigma^2 >> 2^-8 * rms(K) * sqrt(n)).

    Returns None (-> caller falls back) when: not symmetric/unbatched, n too
    small, cache exceeds the HBM budget, not on TPU, or running under a mesh
    (pallas_call does not GSPMD-partition; sharded solves use the XLA path).
    """
    from ..ops.rbf import (
        _round_up,
        rbf_build_sym_tiles,
        rbf_matvec_sym_cached,
        _use_interpret,
    )
    from ..parallel.sharding import _current_physical_mesh

    n = x1.shape[-2]
    if not symmetric or x1.ndim != 2 or n < _RBF_CACHE_MIN_N:
        return None
    if _use_interpret() or _current_physical_mesh() is not None:
        return None
    nblk = -(-n // _RBF_TILE)
    cache_bytes = nblk * (nblk + 1) // 2 * _RBF_TILE * _RBF_TILE * 2
    if cache_bytes > RBF_TILE_CACHE_BUDGET:
        return None

    ls = params["lengthscale"]
    os_ = params["outputscale"]
    xs = jax.lax.stop_gradient((x1 / ls).astype(jnp.float32))
    tiles = rbf_build_sym_tiles(xs, _RBF_TILE)

    def closure(rhs: jax.Array) -> jax.Array:
        if rhs.ndim != 2 or _round_up(rhs.shape[-1], 8) > 16:
            # wide/batched rhs: stream without the cache
            return rbf_pallas_matvec(x1, x2, rhs, params, symmetric=symmetric)
        out = rbf_matvec_sym_cached(
            tiles, rhs.astype(jnp.float32), n, _RBF_TILE, passes=2
        )
        return (os_ * out).astype(rhs.dtype)

    return closure


def rbf_kernel_operator(
    x1: jax.Array,
    x2: jax.Array | None = None,
    *,
    lengthscale,
    outputscale,
    block_rows: int = 4096,
    use_pallas: bool = False,
    materialize_threshold: int | None = 2**30,
) -> KernelLinearOperator:
    """Convenience constructor for the RBF kernel operator.

    ``use_pallas`` switches the mat-vec to the fused Pallas tile kernel
    (ops/rbf.py) — same math, kernel tiles live only in VMEM."""
    symmetric = x2 is None
    if x2 is None:
        x2 = x1
    return KernelLinearOperator(
        x1,
        x2,
        {"lengthscale": jnp.asarray(lengthscale), "outputscale": jnp.asarray(outputscale)},
        covar_func=rbf_covar,
        block_rows=block_rows,
        symmetric=symmetric,
        matvec_impl=rbf_pallas_matvec if use_pallas else None,
        materialize_threshold=materialize_threshold,
    )


def rq_kernel_operator(
    x1: jax.Array,
    x2: jax.Array | None = None,
    *,
    lengthscale,
    outputscale,
    alpha=2.0,
    block_rows: int = 4096,
    use_pallas: bool = False,
    materialize_threshold: int | None = 2**30,
) -> KernelLinearOperator:
    """Rational-quadratic kernel operator, same lazy engine as RBF.

    ``alpha`` is a differentiable hyperparameter on the blocked path; with
    ``use_pallas=True`` it is baked statically into the tile program
    (``ops.rbf.rq_tile_covar``) — no ``alpha`` gradient through the fused
    mat-vec, lengthscale/outputscale gradients still flow via prescaling."""
    symmetric = x2 is None
    if x2 is None:
        x2 = x1
    return KernelLinearOperator(
        x1,
        x2,
        {
            "lengthscale": jnp.asarray(lengthscale),
            "outputscale": jnp.asarray(outputscale),
            "alpha": jnp.asarray(alpha),
        },
        covar_func=rq_covar,
        block_rows=block_rows,
        symmetric=symmetric,
        matvec_impl=_rq_pallas_matvec(alpha) if use_pallas else None,
        materialize_threshold=materialize_threshold,
    )


def periodic_kernel_operator(
    x1: jax.Array,
    x2: jax.Array | None = None,
    *,
    lengthscale,
    outputscale,
    period,
    block_rows: int = 4096,
    materialize_threshold: int | None = 2**30,
) -> KernelLinearOperator:
    """Periodic (MacKay) kernel operator on the blocked lazy engine.

    Not a function of ||x1-x2||^2, so it has no fused stationary-tile path;
    the blocked ``lax.map`` engine (and per-solve K caching) applies."""
    symmetric = x2 is None
    if x2 is None:
        x2 = x1
    return KernelLinearOperator(
        x1,
        x2,
        {
            "lengthscale": jnp.asarray(lengthscale),
            "outputscale": jnp.asarray(outputscale),
            "period": jnp.asarray(period),
        },
        covar_func=periodic_covar,
        block_rows=block_rows,
        symmetric=symmetric,
        materialize_threshold=materialize_threshold,
    )
