"""Batched preconditioned conjugate gradients with Lanczos tridiag extraction.

TPU-native rebuild of the reference hot loop (reference:
linear_operator/utils/linear_cg.py:98-359).  Differences forced by XLA/TPU:

* The reference iterates in Python with in-place buffer mutation and
  ``@torch.jit.script`` update steps (:16-95); here the whole solve is ONE
  ``lax.while_loop`` over an immutable state tuple — trace-safe, fully fused
  by XLA, and compatible with ``vmap``/``pjit``/sharding (all reductions are
  ``jnp.sum`` over the -2 axis, which GSPMD turns into ``psum`` collectives
  when N is sharded over the mesh).
* Per-column convergence masking (reference ``has_converged``, :277-295) is a
  boolean mask on the step sizes: converged columns get alpha=beta=0 and stop
  moving, exactly like the reference's masked updates.
* Tridiagonal extraction for the first ``n_tridiag`` columns (reference
  :224-236, 311-332) writes per-iteration diagonal/off-diagonal entries into
  fixed-size buffers via ``dynamic_update_index_in_dim``.  Unused trailing
  entries are left as an identity pad (diag 1, offdiag 0) so downstream SLQ
  eigendecompositions see eigenvalue 1 with zero quadrature weight — the
  jit-safe analog of the reference's dynamic ``t_mat[:k]`` slice.

The mat-vec closure is the structure-dispatch point: each operator supplies
its own ``_matmul``, so the CG body stays generic while Toeplitz runs FFTs,
low-rank runs skinny matmuls, kernels run Pallas tiles, etc.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import settings


class CGState(NamedTuple):
    k: jax.Array  # iteration counter (int32)
    x: jax.Array  # (*b, n, t) current solution
    r: jax.Array  # (*b, n, t) residual
    p: jax.Array  # (*b, n, t) search direction
    rz: jax.Array  # (*b, 1, t) <r, z> inner products
    has_converged: jax.Array  # (*b, 1, t) bool per-column freeze mask
    mean_resid: jax.Array  # (*b,) mean relative residual per batch element
    prev_alpha: jax.Array  # (*b, 1, nt) previous step size (tridiag)
    prev_beta: jax.Array  # (*b, 1, nt) previous CG beta (tridiag)
    t_diag: jax.Array  # (tmax, *b, nt) tridiag main diagonal entries
    t_off: jax.Array  # (tmax, *b, nt) tridiag off-diagonal entries


class CGResult(NamedTuple):
    solution: jax.Array  # (*b, n, t)
    t_mats: jax.Array | None  # (nt, *b, tmax, tmax) or None
    residual_norm: jax.Array  # (*b, t) final relative residual per column
    num_iters: jax.Array  # scalar int32


def _safe_div(num: jax.Array, den: jax.Array, tiny: float = 1e-35) -> jax.Array:
    """num/den with the denominator clamped away from 0 (reference's eps-mask
    updates :52-60).  The clamp must be far below any legitimate denominator:
    pAp ~ resid^2 once CG converges, so an absolute cutoff anywhere near eps
    would freeze the iteration mid-convergence."""
    den = jnp.where(jnp.abs(den) < tiny, jnp.where(den < 0, -tiny, tiny), den)
    return num / den


def linear_cg(
    matmul_closure: Callable[[jax.Array], jax.Array],
    rhs: jax.Array,
    *,
    tolerance: float | None = None,
    eps: float = 1e-10,
    stop_updating_after: float = 1e-10,
    max_iter: int | None = None,
    max_tridiag_iter: int | None = None,
    initial_guess: jax.Array | None = None,
    preconditioner: Callable[[jax.Array], jax.Array] | None = None,
    n_tridiag: int = 0,
) -> CGResult:
    """Solve ``K x = rhs`` for PSD ``K`` given only a mat-vec closure.

    Args mirror reference linear_cg.py:98-140.  ``rhs`` is (*batch, n, t);
    all ``t`` columns are solved simultaneously in one loop; the first
    ``n_tridiag`` columns additionally produce Lanczos tridiagonal matrices
    (used for SLQ log-determinants, reference :224-236).

    Internally promotes half precisions to float32: Krylov recurrences are
    unstable in bf16, while the mat-vec closure may still use bf16/MXU freely.
    """
    if tolerance is None:
        tolerance = settings.cg_tolerance.value()
    if max_iter is None:
        max_iter = settings.max_cg_iterations.value()
    if max_tridiag_iter is None:
        max_tridiag_iter = settings.max_lanczos_quadrature_iterations.value()

    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]

    n, t = rhs.shape[-2], rhs.shape[-1]
    batch = rhs.shape[:-2]
    if settings.terminate_cg_by_size.on():
        max_iter = n
        max_tridiag_iter = min(max_tridiag_iter, n)
    max_iter = min(max_iter, 10 * n + 10)
    n_tridiag_iter = min(max_tridiag_iter, max_iter)
    min_iter = min(10, max_iter)
    settings.record_linalg("linear_cg", rhs.shape)
    # debug-gated NaN input guard (reference utils/linear_cg.py:199-200)
    from ..utils.warnings import debug_nan_check

    debug_nan_check("linear_cg", rhs)

    orig_dtype = rhs.dtype
    compute_dtype = jnp.promote_types(orig_dtype, jnp.float32)
    rhs = rhs.astype(compute_dtype)

    if preconditioner is None:
        precond = lambda v: v
    else:
        precond = preconditioner

    # Normalize rhs columns (reference :165-174) for scale-free tolerances.
    rhs_norm = jnp.linalg.norm(rhs, axis=-2, keepdims=True)  # (*b, 1, t)
    rhs_is_zero = rhs_norm < eps
    rhs_norm = jnp.where(rhs_is_zero, 1.0, rhs_norm)
    rhs = rhs / rhs_norm

    def mm(v):
        return matmul_closure(v.astype(orig_dtype)).astype(compute_dtype)

    if initial_guess is None:
        x0 = jnp.zeros_like(rhs)
        r0 = rhs
    else:
        x0 = jnp.broadcast_to(initial_guess.astype(compute_dtype) / rhs_norm, rhs.shape)
        r0 = rhs - mm(x0)

    z0 = precond(r0)
    rz0 = jnp.sum(r0 * z0, axis=-2, keepdims=True)
    resid0 = jnp.linalg.norm(r0, axis=-2, keepdims=True)
    conv0 = resid0 < stop_updating_after

    tmax = max(n_tridiag_iter, 1)
    t_diag0 = jnp.ones((tmax, *batch, max(n_tridiag, 1)), dtype=compute_dtype)
    t_off0 = jnp.zeros((tmax, *batch, max(n_tridiag, 1)), dtype=compute_dtype)
    prev_ab = jnp.zeros((*batch, 1, max(n_tridiag, 1)), dtype=compute_dtype)

    state0 = CGState(
        k=jnp.zeros((), jnp.int32),
        x=x0,
        r=r0,
        p=z0,
        rz=rz0,
        has_converged=conv0,
        mean_resid=jnp.mean(resid0, axis=(-2, -1)),
        prev_alpha=prev_ab,
        prev_beta=prev_ab,
        t_diag=t_diag0,
        t_off=t_off0,
    )

    def cond(state: CGState) -> jax.Array:
        # Residual reduced over COLUMNS per batch element; the loop runs
        # while ANY batch element is unconverged (reference
        # utils/linear_cg.py:277-295 — a single global mean would let one
        # easy batch element terminate the loop for all of them).
        # When EVERY column of every batch element is already below
        # stop_updating_after, all alphas are masked to zero and further
        # iterations are pure wasted mat-vecs — exit regardless of min_iter
        # (the reference skips the loop outright for this case at entry,
        # linear_cg.py:205-207; we also allow the mid-loop exit).
        all_frozen = jnp.all(state.has_converged)
        unconverged = (
            jnp.any(state.mean_resid >= tolerance) | (state.k < min_iter)
        ) & ~all_frozen
        tridiag_active = (n_tridiag > 0) & (state.k < n_tridiag_iter)
        return (state.k < max_iter) & (unconverged | tridiag_active)

    def body(state: CGState) -> CGState:
        Ap = mm(state.p)
        pAp = jnp.sum(state.p * Ap, axis=-2, keepdims=True)
        alpha = _safe_div(state.rz, pAp)
        alpha = jnp.where(state.has_converged, 0.0, alpha)

        x = state.x + alpha * state.p
        r = state.r - alpha * Ap
        resid = jnp.linalg.norm(r, axis=-2, keepdims=True)
        has_converged = state.has_converged | (resid < stop_updating_after)

        z = precond(r)
        rz_new = jnp.sum(r * z, axis=-2, keepdims=True)
        beta = _safe_div(rz_new, state.rz)
        beta = jnp.where(has_converged, 0.0, beta)
        p = z + beta * state.p

        t_diag, t_off, prev_alpha, prev_beta = state.t_diag, state.t_off, state.prev_alpha, state.prev_beta
        if n_tridiag > 0:
            # T[k,k] = 1/alpha_k + beta_{k-1}/alpha_{k-1};  T[k,k+1] = sqrt(beta_k)/alpha_k
            # (reference linear_cg.py:311-332). Masked (converged) columns pad
            # with identity so SLQ weights vanish.
            a_t = alpha[..., 0, :n_tridiag]
            b_t = beta[..., 0, :n_tridiag]
            pa = state.prev_alpha[..., 0, :]
            pb = state.prev_beta[..., 0, :]
            a_zero = a_t == 0.0
            a_safe = jnp.where(a_zero, 1.0, a_t)
            pa_zero = pa == 0.0
            diag_entry = 1.0 / a_safe + jnp.where(
                pa_zero, 0.0, pb / jnp.where(pa_zero, 1.0, pa)
            )
            diag_entry = jnp.where(a_zero, 1.0, diag_entry)
            off_entry = jnp.sqrt(jnp.maximum(b_t, 0.0)) / a_safe
            off_entry = jnp.where(a_zero, 0.0, off_entry)

            write_idx = jnp.minimum(state.k, n_tridiag_iter - 1)
            active = state.k < n_tridiag_iter
            t_diag = lax.dynamic_update_index_in_dim(
                t_diag,
                jnp.where(active, diag_entry, t_diag[write_idx]),
                write_idx,
                axis=0,
            )
            t_off = lax.dynamic_update_index_in_dim(
                t_off,
                jnp.where(active, off_entry, t_off[write_idx]),
                write_idx,
                axis=0,
            )
            prev_alpha = jnp.where(active, alpha[..., :, :n_tridiag], state.prev_alpha)
            prev_beta = jnp.where(active, beta[..., :, :n_tridiag], state.prev_beta)

        return CGState(
            k=state.k + 1,
            x=x,
            r=r,
            p=p,
            rz=rz_new,
            has_converged=has_converged,
            mean_resid=jnp.mean(resid, axis=(-2, -1)),
            prev_alpha=prev_alpha,
            prev_beta=prev_beta,
            t_diag=t_diag,
            t_off=t_off,
        )

    final = lax.while_loop(cond, body, state0)

    from ..utils.warnings import host_callbacks_supported

    if host_callbacks_supported():
        # Default-on non-convergence NumericalWarning, matching the reference
        # (utils/linear_cg.py:337-347 warns unconditionally when CG exits
        # unconverged); verbose_linalg additionally logs the iteration report.
        # Axon-gated: the tunneled-TPU backend aborts on host callbacks.
        jax.debug.callback(
            _report_convergence,
            final.k,
            jnp.max(final.mean_resid),
            tolerance,
            settings.verbose_linalg.on(),
        )

    solution = final.x * rhs_norm
    solution = jnp.where(rhs_is_zero, 0.0, solution).astype(orig_dtype)
    residual_norm = jnp.where(rhs_is_zero, 0.0, jnp.linalg.norm(final.r, axis=-2, keepdims=True))[..., 0, :]

    t_mats = None
    if n_tridiag > 0:
        # Assemble (nt, *b, tmax, tmax) symmetric tridiagonal matrices.
        # The final off-diagonal entry couples the live block to the identity
        # pad; zero the entry at the last live position by construction: the
        # off entry written at step k couples (k, k+1) — entries past the exit
        # iteration were never written (remain 0), and the entry at the exit
        # boundary is harmless for SLQ because quadrature weights concentrate
        # on the live block. Move axes: buffers are (tmax, *b, nt).
        diag = jnp.moveaxis(final.t_diag, 0, -1)  # (*b, nt, tmax)
        off = jnp.moveaxis(final.t_off, 0, -1)
        off = off[..., : tmax - 1] if tmax > 1 else off[..., :0]
        T = _tridiag_to_dense(diag, off)  # (*b, nt, tmax, tmax)
        t_mats = jnp.moveaxis(T, -3, 0)  # (nt, *b, tmax, tmax)

    if squeeze:
        solution = solution[..., 0]

    return CGResult(solution, t_mats, residual_norm.astype(orig_dtype), final.k)


def _report_convergence(num_iters, mean_resid, tolerance, verbose=True):
    import warnings

    from ..utils.warnings import NumericalWarning

    if verbose:
        settings.logger.debug(
            "linear_cg finished in %d iterations, mean residual %.3e",
            int(num_iters),
            float(mean_resid),
        )
    if float(mean_resid) >= tolerance:
        warnings.warn(
            f"CG terminated in {int(num_iters)} iterations with mean residual "
            f"{float(mean_resid):.3e} >= tolerance {tolerance}. "
            "If performance is affected, consider raising max_cg_iterations "
            "or using a preconditioner.",
            NumericalWarning,
        )


def _tridiag_to_dense(diag: jax.Array, off: jax.Array) -> jax.Array:
    """Build dense symmetric tridiagonal matrices from diagonals.

    diag: (..., m); off: (..., m-1)  ->  (..., m, m)
    (shared with the Lanczos T assembly — one implementation)
    """
    from .lanczos import _build_tridiag

    return _build_tridiag(diag, off)
