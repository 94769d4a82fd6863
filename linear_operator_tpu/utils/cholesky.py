"""PSD-safe Cholesky with escalating jitter (reference: linear_operator/utils/cholesky.py:13-74).

The reference loops in Python, retrying ``torch.linalg.cholesky_ex`` with
jitter scaled x10 per attempt, applying jitter per-batch-element via the info
mask.  Under XLA everything must be trace-safe, so the retry loop is a
``lax.while_loop`` whose body recomputes the Cholesky with the escalated
jitter only for batch elements that failed (NaN factor), selecting per-element
with ``jnp.where``.  On TPU this compiles to a data-dependent loop that runs
zero extra iterations in the common (already-PSD) case.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import settings


def blocked_cholesky(A: jax.Array, block: int = 256) -> jax.Array:
    """Lower Cholesky via a right-looking blocked sweep (TPU fast path).

    XLA's native Cholesky expansion runs panel-at-a-time with small matmuls
    and is far from the MXU roofline for large ``n`` (measured ~0.5% MFU at
    64x1024x1024 — BASELINE.md).  This formulation does ``n/block``
    sequential steps whose trailing updates are large batched matmuls at
    ``Precision.HIGHEST`` (f32-true on TPU):

        for each block column i:   L_ii  = chol(A_ii - L_i: L_i:^T)
                                   L_j,i = (A_j,i - L_j: L_i:^T) L_ii^{-T}

    Same contract as ``jnp.linalg.cholesky``: NaNs propagate from any
    non-PSD diagonal block, so ``psd_safe_cholesky``'s retry logic works
    unchanged.  Differentiable; the cotangent-on-A convention weights the
    (unused) upper triangle differently from XLA's native VJP, but pulls
    back identically through any symmetric construction of ``A`` — which is
    the only way PSD operators reach this function.  ``n`` not divisible by ``block`` is handled by padding with
    an identity tail (factor of a block-diagonal extension, then sliced).
    Unrolled at trace time — block count is static.
    """
    n = A.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(A)
    nb = -(-n // block)
    npad = nb * block - n
    if npad:
        A = jnp.pad(A, [(0, 0)] * (A.ndim - 2) + [(0, npad), (0, npad)])
        eye_tail = jnp.zeros((n + npad,), dtype=A.dtype).at[n:].set(1.0)
        A = A + jnp.diag(eye_tail)
    HIGHEST = lax.Precision.HIGHEST
    out = jnp.zeros_like(A)
    for i in range(nb):
        s = i * block
        li = out[..., s : s + block, :s]
        aii = A[..., s : s + block, s : s + block]
        aii = aii - jnp.matmul(li, jnp.swapaxes(li, -1, -2), precision=HIGHEST)
        lii = jnp.linalg.cholesky(aii)
        out = out.at[..., s : s + block, s : s + block].set(lii)
        if i + 1 < nb:
            lj = out[..., s + block :, :s]
            aji = A[..., s + block :, s : s + block]
            aji = aji - jnp.matmul(lj, jnp.swapaxes(li, -1, -2), precision=HIGHEST)
            panel = lax.linalg.triangular_solve(
                lii, aji, left_side=False, lower=True, transpose_a=True
            )
            out = out.at[..., s + block :, s : s + block].set(panel)
    if npad:
        out = out[..., :n, :n]
    return out


class CholeskyResult(NamedTuple):
    factor: jax.Array  # lower-triangular (or NaN where factorization failed)
    ok: jax.Array  # bool (*batch,): factorization succeeded
    jitter: jax.Array  # (*batch,): jitter that was finally applied


def _batch_ok(L: jax.Array) -> jax.Array:
    return ~jnp.any(jnp.isnan(L), axis=(-2, -1))


def psd_safe_cholesky_ex(
    A: jax.Array,
    jitter: float | None = None,
    max_tries: int | None = None,
) -> CholeskyResult:
    """Cholesky of ``A`` (*batch, n, n) with per-batch-element jitter retries.

    Mirrors reference utils/cholesky.py:25-50: attempt plain Cholesky; on
    failure add ``jitter * 10**try`` to the diagonal of failed elements only.
    Unlike the reference it cannot raise ``NotPSDError`` at runtime (XLA has no
    exceptions): inspect ``result.ok`` — failed elements hold NaNs.
    """
    if jitter is None:
        jitter = settings.cholesky_jitter.value(A.dtype)
    if max_tries is None:
        max_tries = settings.cholesky_max_tries.value()
    settings.record_linalg("psd_safe_cholesky", A.shape)

    L0 = jnp.linalg.cholesky(A)
    ok0 = _batch_ok(L0)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    applied0 = jnp.zeros(A.shape[:-2], dtype=A.dtype)

    def cond(state):
        k, _, ok, _ = state
        return (k < max_tries) & ~jnp.all(ok)

    def body(state):
        k, L, ok, applied = state
        jitter_k = jnp.asarray(jitter * (10.0**k), dtype=A.dtype)
        L_new = jnp.linalg.cholesky(A + jitter_k * eye)
        ok_new = _batch_ok(L_new)
        take_new = (~ok) & ok_new
        sel = take_new[..., None, None]
        L = jnp.where(sel, L_new, L)
        applied = jnp.where(take_new, jitter_k, applied)
        return k + 1, L, ok | ok_new, applied

    _, L, ok, applied = lax.while_loop(cond, body, (0, L0, ok0, applied0))
    return CholeskyResult(L, ok, applied)


def psd_safe_cholesky(
    A: jax.Array,
    jitter: float | None = None,
    max_tries: int | None = None,
) -> jax.Array:
    """Lower Cholesky factor with jitter retries; NaN where not factorizable.

    Differentiable: the retry ``while_loop`` itself has no reverse rule, so a
    custom VJP treats the finally-applied jitter as a constant and
    backpropagates through ``cholesky(A + jitter I)`` — the same semantics as
    the reference, where the retry loop runs outside autograd's view.
    """

    @jax.custom_vjp
    def inner(A):
        return psd_safe_cholesky_ex(A, jitter=jitter, max_tries=max_tries).factor

    def fwd(A):
        res = psd_safe_cholesky_ex(A, jitter=jitter, max_tries=max_tries)
        return res.factor, (A, jax.lax.stop_gradient(res.jitter))

    def bwd(residuals, L_bar):
        A, applied = residuals
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        Aj = A + applied[..., None, None] * eye
        _, vjp = jax.vjp(jnp.linalg.cholesky, Aj)
        return vjp(L_bar)

    inner.defvjp(fwd, bwd)
    return inner(A)
