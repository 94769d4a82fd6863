"""Batched shifted MINRES: solve (K + shift_i I) x = b for many shifts at once.

Reference: linear_operator/utils/minres.py:10-282.

All shifts share one Lanczos recurrence (same Krylov space); only the
Givens-rotation QR of the shifted tridiagonal differs per shift (reference
:222-283), so the per-iteration cost is ONE mat-vec plus O(shifts) vector
updates.  The whole iteration is a single ``lax.while_loop``; the solution
carries a leading shift dimension like the reference (:69-70).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import settings


class MinresState(NamedTuple):
    k: jax.Array
    z_prev: jax.Array  # (*b, n, t) unpreconditioned Lanczos z_{k-1}
    z_cur: jax.Array  # (*b, n, t) unpreconditioned Lanczos z_k
    q_cur: jax.Array  # (*b, n, t) preconditioned basis q_k = P^{-1} z_k (q == z when unpreconditioned)
    beta: jax.Array  # (*b, 1, t) current beta_k
    x: jax.Array  # (s, *b, n, t) per-shift solutions
    w0: jax.Array  # (s, *b, n, t) search direction k-1
    w1: jax.Array  # (s, *b, n, t) search direction k-2
    c0: jax.Array  # (s, *b, 1, t) Givens cosines (two steps back)
    s0: jax.Array
    c1: jax.Array  # (s, *b, 1, t) Givens cosines (previous)
    s1: jax.Array
    eta: jax.Array  # (s, *b, 1, t) residual-norm proxy
    mean_rel: jax.Array  # scalar


def minres(
    matmul_closure: Callable[[jax.Array], jax.Array],
    rhs: jax.Array,
    *,
    shifts: jax.Array | None = None,
    max_iter: int | None = None,
    tolerance: float | None = None,
    preconditioner: Callable[[jax.Array], jax.Array] | None = None,
) -> jax.Array:
    """Returns solutions with shape (num_shifts, *b, n, t) (or (*b, n, t) when
    ``shifts`` is None -> single zero shift, squeezed).

    ``preconditioner`` (z -> P^{-1} z, SPD) runs the reference's
    preconditioned Lanczos recurrence (utils/minres.py:38-39, 75, 144-150):
    the basis pair (z, q = P^{-1} z) with beta = sqrt(z . q), so each shifted
    system solved is (K + shift P) x = b — exactly the reference semantics
    (and the CIQ paper's preconditioned msMINRES).  With P = I this reduces
    to the plain recurrence bit-for-bit."""
    if tolerance is None:
        tolerance = settings.minres_tolerance.value()
    if max_iter is None:
        max_iter = settings.max_cg_iterations.value()
    settings.record_linalg("minres", rhs.shape)
    # debug-gated NaN input guard (reference analog: linear_cg.py:199-200)
    from ..utils.warnings import debug_nan_check

    debug_nan_check("minres", rhs)

    squeeze_rhs = rhs.ndim == 1
    if squeeze_rhs:
        rhs = rhs[:, None]
    squeeze_shift = shifts is None
    if shifts is None:
        shifts = jnp.zeros((1,), dtype=rhs.dtype)
    s = shifts.shape[0]

    compute_dtype = jnp.promote_types(rhs.dtype, jnp.float32)
    b = rhs.astype(compute_dtype)
    n, t = b.shape[-2], b.shape[-1]
    batch = b.shape[:-2]
    max_iter = min(max_iter, 2 * n + 10)

    def mm(v):
        return matmul_closure(v.astype(rhs.dtype)).astype(compute_dtype)

    b_norm = jnp.linalg.norm(b, axis=-2, keepdims=True)
    b_is_zero = b_norm < 1e-10
    b_norm = jnp.where(b_is_zero, 1.0, b_norm)
    b_hat = b / b_norm

    if preconditioner is None:
        prec = lambda x: x
    else:
        prec = lambda x: preconditioner(x.astype(rhs.dtype)).astype(compute_dtype)

    # generalized-Lanczos init: beta0 = sqrt(z . P^{-1} z); the rhs enters
    # the Krylov recursion with weight beta0 (reference minres.py:75-85,
    # scale_prev = beta_prev) — 1 exactly in the unpreconditioned case
    q0_raw = prec(b_hat)
    beta0 = jnp.sqrt(
        jnp.clip(jnp.sum(b_hat * q0_raw, axis=-2, keepdims=True), 1e-30, None)
    )
    z0 = b_hat / beta0
    q0 = q0_raw / beta0

    ones = jnp.ones((s, *batch, 1, t), dtype=compute_dtype)
    zeros_v = jnp.zeros((s, *batch, n, t), dtype=compute_dtype)

    state0 = MinresState(
        k=jnp.zeros((), jnp.int32),
        z_prev=jnp.zeros_like(b_hat),
        z_cur=z0,
        q_cur=q0,
        beta=jnp.zeros((*batch, 1, t), dtype=compute_dtype),
        x=zeros_v,
        w0=zeros_v,
        w1=zeros_v,
        c0=ones,
        s0=ones * 0.0,
        c1=ones,
        s1=ones * 0.0,
        eta=jnp.broadcast_to(beta0, (s, *batch, 1, t)),
        mean_rel=jnp.asarray(1.0, compute_dtype),
    )

    shifts_exp = shifts.reshape(s, *([1] * (len(batch) + 2))).astype(compute_dtype)

    def cond(st: MinresState):
        return (st.k < max_iter) & (st.mean_rel >= tolerance)

    def body(st: MinresState):
        # --- shared (preconditioned) Lanczos step on K --------------------
        # (shift added per-shift in QR; P = I gives the plain recurrence)
        p = mm(st.q_cur)
        alpha = jnp.sum(st.q_cur * p, axis=-2, keepdims=True)  # (*b,1,t)
        p = p - alpha * st.z_cur - st.beta * st.z_prev
        q_raw = prec(p)
        beta_next = jnp.sqrt(
            jnp.clip(jnp.sum(p * q_raw, axis=-2, keepdims=True), 0.0, None)
        )
        safe_beta = jnp.where(beta_next < 1e-30, 1.0, beta_next)
        dead = beta_next < 1e-30
        z_next = jnp.where(dead, 0.0, p / safe_beta)
        q_next = jnp.where(dead, 0.0, q_raw / safe_beta)

        # --- per-shift Givens QR of the shifted tridiagonal ----------------
        alpha_s = alpha[None] + shifts_exp  # (s,*b,1,t)
        beta_k = st.beta[None]
        delta = st.c1 * alpha_s - st.c0 * st.s1 * beta_k
        rho1 = jnp.sqrt(delta * delta + beta_next[None] ** 2)
        rho2 = st.s1 * alpha_s + st.c0 * st.c1 * beta_k
        rho3 = st.s0 * beta_k
        safe_rho1 = jnp.where(rho1 < 1e-30, 1.0, rho1)
        c_new = delta / safe_rho1
        s_new = beta_next[None] / safe_rho1

        w = (st.q_cur[None] - rho3 * st.w1 - rho2 * st.w0) / safe_rho1
        x = st.x + c_new * st.eta * w
        eta = -s_new * st.eta

        # eta starts at beta0 (the P-norm scale); normalize the residual
        # proxy so `tolerance` stays a RELATIVE threshold either way
        rel = jnp.mean(jnp.abs(eta) / beta0)
        return MinresState(
            k=st.k + 1,
            z_prev=st.z_cur,
            z_cur=z_next,
            q_cur=q_next,
            beta=beta_next,
            x=x,
            w0=w,
            w1=st.w0,
            c0=st.c1,
            s0=st.s1,
            c1=c_new,
            s1=s_new,
            eta=eta,
            mean_rel=rel,
        )

    final = lax.while_loop(cond, body, state0)
    x = final.x * b_norm[None]
    x = jnp.where(b_is_zero[None], 0.0, x).astype(rhs.dtype)
    if squeeze_rhs:
        x = x[..., 0]
    if squeeze_shift:
        x = x[0]
    return x
