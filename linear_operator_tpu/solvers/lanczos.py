"""Batched Lanczos tridiagonalization with full reorthogonalization.

TPU-native rebuild of reference linear_operator/utils/lanczos.py:9-223.
The reference's Python loop with in-place Q-buffer writes becomes a
``lax.fori_loop`` over fixed-size buffers; full reorthogonalization
(reference :117-148, two classical Gram-Schmidt passes against all previous
vectors) is a pair of skinny matmuls that map straight onto the MXU.

Breakdown handling: when beta collapses (invariant subspace found, reference
early-termination :150-155) the recurrence would divide by ~0; we freeze the
iteration via masking.  The breakdown test is SCALE-RELATIVE (beta <=
tol * running max(|alpha|, beta) — an absolute threshold would kill the
recurrence after two steps on a well-conditioned operator scaled by 1e-5),
and dead steps pad the tridiagonal diagonal with the last live alpha (off 0):
the padded block decouples with ZERO first-component eigenvector weight, so
SLQ quadrature ignores it exactly, while its eigenvalues stay inside the
true spectral hull — eigenvalue-RANGE consumers (CIQ shift selection) are
not polluted the way an identity pad (eigenvalue 1) would at small scales.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import settings


class LanczosResult(NamedTuple):
    q_mat: jax.Array  # (*b, n, k) orthonormal Lanczos basis
    t_mat: jax.Array  # (*b, k, k) symmetric tridiagonal


def lanczos_tridiag(
    matmul_closure: Callable[[jax.Array], jax.Array],
    num_iter: int,
    *,
    init_vecs: jax.Array,
    tol: float = 1e-6,
) -> LanczosResult:
    """Run ``num_iter`` Lanczos steps of the operator given by the mat-vec
    closure, started from ``init_vecs`` (*b, n, 1-or-more columns handled by
    caller via batching; here a single start vector per batch element:
    (*b, n)).

    Returns Q (*b, n, k) and T (*b, k, k) with K ~= Q T Q^T.
    """
    settings.record_linalg("lanczos_tridiag", init_vecs.shape)
    v = init_vecs
    batch = v.shape[:-1]
    n = v.shape[-1]
    k = min(num_iter, n)

    compute_dtype = jnp.promote_types(v.dtype, jnp.float32)
    v = v.astype(compute_dtype)

    def mm(x):
        # x: (*b, n) -> (*b, n)
        return matmul_closure(x[..., None])[..., 0].astype(compute_dtype)

    v0 = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    Q0 = jnp.zeros((*batch, n, k), dtype=compute_dtype)
    Q0 = Q0.at[..., :, 0].set(v0)
    alphas0 = jnp.zeros((*batch, k), dtype=compute_dtype)
    betas0 = jnp.zeros((*batch, k), dtype=compute_dtype)
    alive0 = jnp.ones(batch, dtype=bool)
    scale0 = jnp.zeros(batch, dtype=compute_dtype)  # running max(|alpha|, beta)
    pad0 = jnp.zeros(batch, dtype=compute_dtype)  # last live alpha (dead pad)

    def reorth(Q, w, upto_mask):
        # Subtract projections onto the first columns of Q (mask selects the
        # valid columns). Two passes of classical Gram-Schmidt
        # (reference lanczos.py:117-148).  HIGHEST precision: default TPU
        # matmuls are single-pass bf16, which would leave ~1e-3 residual
        # non-orthogonality — defeating the reorthogonalization (same rule
        # as pivoted_cholesky's downdates).
        for _ in range(2):
            coeffs = (
                jnp.einsum(
                    "...nk,...n->...k", Q, w,
                    precision=jax.lax.Precision.HIGHEST,
                )
                * upto_mask
            )
            w = w - jnp.einsum(
                "...nk,...k->...n", Q, coeffs,
                precision=jax.lax.Precision.HIGHEST,
            )
        return w

    def body(i, carry):
        Q, alphas, betas, alive, scale, pad_alpha = carry
        qi = Q[..., :, i]
        w = mm(qi)
        alpha = jnp.sum(qi * w, axis=-1)
        w = w - alpha[..., None] * qi
        col_mask = (jnp.arange(k) <= i).astype(compute_dtype)
        w = reorth(Q, w, col_mask)
        beta = jnp.linalg.norm(w, axis=-1)

        pad_alpha = jnp.where(alive, alpha, pad_alpha)
        alphas = alphas.at[..., i].set(pad_alpha)

        # scale-relative breakdown: an invariant subspace shows as beta
        # vanishing RELATIVE to the recurrence's magnitude, not absolutely
        scale = jnp.maximum(scale, jnp.maximum(jnp.abs(alpha), beta))
        next_alive = alive & (beta > tol * scale)
        safe_beta = jnp.where(next_alive, beta, 1.0)
        q_next = jnp.where(next_alive[..., None], w / safe_beta[..., None], 0.0)

        def write_next(Q, betas):
            betas = betas.at[..., i].set(jnp.where(next_alive, beta, 0.0))
            Q = Q.at[..., :, i + 1].set(q_next)
            return Q, betas

        if_last = i >= k - 1
        Q, betas = lax.cond(if_last, lambda Q, b: (Q, b), write_next, Q, betas)
        return Q, alphas, betas, next_alive, scale, pad_alpha

    Q, alphas, betas, _, _, _ = lax.fori_loop(
        0, k, body, (Q0, alphas0, betas0, alive0, scale0, pad0)
    )

    T = _build_tridiag(alphas, betas[..., : k - 1] if k > 1 else betas[..., :0])
    return LanczosResult(Q, T)


def _build_tridiag(diag: jax.Array, off: jax.Array) -> jax.Array:
    m = diag.shape[-1]
    T = jnp.zeros((*diag.shape, m), dtype=diag.dtype)
    idx = jnp.arange(m)
    T = T.at[..., idx, idx].set(diag)
    if m > 1:
        i = jnp.arange(m - 1)
        T = T.at[..., i, i + 1].set(off)
        T = T.at[..., i + 1, i].set(off)
    return T


def lanczos_tridiag_to_diag(t_mat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigendecompose small tridiagonal matrices (reference lanczos.py:167-189).

    Clamps negative eigenvalues to zero like the reference (:185-187).
    Returns (evals (*b, k), evecs (*b, k, k)).
    """
    settings.record_linalg("symeig", t_mat.shape)
    dtype = t_mat.dtype
    # Internal eigensolve dtype (reference settings._linalg_dtype_symeig,
    # settings.py:186-191, applied at lanczos.py:179-182).  The default is
    # float64 like the reference; without jax x64 enabled the cast is a
    # silent no-op, which keeps TPU runs in f32 (f64 there is emulated).
    eig_dtype = settings._linalg_dtype_symeig.value()
    if eig_dtype == jnp.float64 and not jax.config.jax_enable_x64:
        eig_dtype = dtype  # avoid jax's truncation warning; same result
    evals, evecs = jnp.linalg.eigh(t_mat.astype(eig_dtype))
    mask = evals >= 0
    evals = jnp.where(mask, evals, 0.0)
    evecs = jnp.where(mask[..., None, :], evecs, 0.0)
    return evals.astype(dtype), evecs.astype(dtype)
