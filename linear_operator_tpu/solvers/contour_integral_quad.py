"""Contour-integral quadrature for K^{±1/2} b (Hale-Higham-Trefethen).

Reference: linear_operator/utils/contour_integral_quad.py:14-156.

K^{-1/2} b = const * sum_j w_j (K + sigma_j I)^{-1} b, with shifts/weights
from an elliptic-integral quadrature over the spectrum range [lmin, lmax]
(estimated by Lanczos).  The reference computes shifts/weights on the host
with ``scipy.special.ellipk/ellipj`` (:105-133, its only scipy dependency) —
which would force a host sync under jit.  Here the elliptic functions are
implemented in jnp (AGM for K(m), descending Gauss/Landen transformation for
sn/cn/dn with fixed iteration count), so the whole pipeline stays traced and
fused; the quadrature parameters are wrapped in stop_gradient like the
reference's host-side constants.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .. import settings
from .lanczos import lanczos_tridiag
from .minres import minres

_AGM_ITERS = 14


def ellipk_agm(m: jax.Array) -> jax.Array:
    """Complete elliptic integral K(m) via AGM: K = pi / (2 agm(1, sqrt(1-m)))."""
    a = jnp.ones_like(m)
    b = jnp.sqrt(jnp.maximum(1.0 - m, 1e-30))
    for _ in range(_AGM_ITERS):
        a, b = (a + b) / 2.0, jnp.sqrt(jnp.maximum(a * b, 0.0))
    return jnp.pi / (2.0 * a)


def ellipj(u: jax.Array, m: jax.Array):
    """Jacobi elliptic sn, cn, dn via the descending AGM algorithm
    (Abramowitz & Stegun 16.4, fixed iteration count for jit)."""
    a_list, c_list = [], []
    a = jnp.ones_like(u) * 1.0 + 0.0 * m
    b = jnp.sqrt(jnp.maximum(1.0 - m, 1e-30)) * jnp.ones_like(a)
    c = jnp.sqrt(jnp.maximum(m, 0.0)) * jnp.ones_like(a)
    for _ in range(_AGM_ITERS):
        a_list.append(a)
        c_list.append(c)
        a, b, c = (a + b) / 2.0, jnp.sqrt(jnp.maximum(a * b, 0.0)), (a - b) / 2.0
    a_list.append(a)
    c_list.append(c)
    phi = (2.0**_AGM_ITERS) * a * u
    for i in range(_AGM_ITERS, 0, -1):
        ratio = jnp.clip(c_list[i] / a_list[i], -1.0, 1.0)
        phi = (phi + jnp.arcsin(ratio * jnp.sin(phi))) / 2.0
    sn = jnp.sin(phi)
    cn = jnp.cos(phi)
    dn = jnp.sqrt(jnp.maximum(1.0 - m * sn * sn, 1e-30))
    return sn, cn, dn


def ciq_shifts_weights(min_eig: jax.Array, max_eig: jax.Array, num_quad: int):
    """Quadrature shifts/weights (reference :105-133).  Returns
    (shifts (q,...), weights (q,...), constant) such that

        K^{-1/2} b ~= constant * sum_j weights_j (K + shifts_j I)^{-1} b
    """
    min_eig = jax.lax.stop_gradient(jnp.maximum(min_eig, 1e-10))
    max_eig = jax.lax.stop_gradient(jnp.maximum(max_eig, min_eig * (1 + 1e-6)))
    k2 = min_eig / max_eig  # modulus^2
    Kp = ellipk_agm(1.0 - k2)  # K'(k)
    q = num_quad
    u = (jnp.arange(q, dtype=min_eig.dtype) + 0.5) * Kp / q  # real arg of i*t
    # Jacobi imaginary transformation: for t = i*u,
    #   sn(t, k) = i sn(u, k') / cn(u, k'),  cn(t,k) = 1/cn(u,k'),
    #   dn(t, k) = dn(u, k') / cn(u, k')
    sn_u, cn_u, dn_u = ellipj(u, 1.0 - k2)
    cn_t_inv = cn_u  # 1/cn(t) = cn_u
    sn_t_im = sn_u / cn_u  # Im(sn(i u, k))
    dn_t = dn_u / cn_u
    cn_t = 1.0 / cn_u
    # w = sqrt(min_eig) * sn(t): purely imaginary; w^2 = -min_eig*sn_t_im^2
    w2 = -min_eig * sn_t_im * sn_t_im  # negative reals (the poles)
    shifts = -w2  # (K - w^2 I) = (K + shifts I), shifts > 0
    # dzdt = cn(t) dn(t): real
    dzdt = cn_t * dn_t
    constant = -2.0 * Kp * jnp.sqrt(min_eig) / (jnp.pi * q)
    weights = -dzdt * constant  # fold sign so the sum is plainly positive
    return shifts, weights


def contour_integral_quad(
    matmul_closure: Callable[[jax.Array], jax.Array],
    rhs: jax.Array,
    *,
    num_quad: int | None = None,
    max_lanczos_iter: int = 20,
    key: jax.Array | None = None,
    inverse: bool = True,
    preconditioner: Callable[[jax.Array], jax.Array] | None = None,
    sqrt_premultiply: Callable[[jax.Array], jax.Array] | None = None,
):
    """K^{±1/2} rhs via shifted MINRES x quadrature (reference :14-156).

    Returns (solves (q, *b, n, t), weights (q,)): K^{-1/2} rhs =
    sum_j weights_j * solves_j.  With ``inverse=False`` each solve gets one
    extra K-matmul so the weighted sum is K^{+1/2} rhs instead (reference
    :153-154: ``if not inverse: solves = linear_op._matmul(solves)``).

    Preconditioning (reference :44-48, :141-150): with ``preconditioner``
    (z -> P^{-1} z) and ``sqrt_premultiply`` (r -> P^{1/2} r, typically a
    nested CIQ on the preconditioner operator), the quadrature runs over the
    WHITENED spectrum of P^{-1/2} K P^{-1/2} and each solve is
    (K + s_j P)^{-1} P^{1/2} rhs.  The weighted sum is then the
    non-symmetric root application M rhs with M M^T = K^{-1} exactly
    (P^{-1/2} Ktilde^{-1/2}), which is what sampling/whitening need — a far
    better-conditioned quadrature when P ~= K.
    """
    if num_quad is None:
        num_quad = settings.num_contour_quadrature.value()
    settings.record_linalg("contour_integral_quad", rhs.shape)

    if key is None:
        key = jax.random.PRNGKey(0)

    if sqrt_premultiply is not None:
        rhs = sqrt_premultiply(rhs)

    # --- eigenvalue range estimate (reference :56-101) --------------------
    n = rhs.shape[-2]
    batch = rhs.shape[:-2]
    k_lanczos = min(max_lanczos_iter, n)
    init = jax.random.normal(key, (*batch, n), dtype=rhs.dtype)
    if preconditioner is None:
        _, T = lanczos_tridiag(matmul_closure, k_lanczos, init_vecs=init)
        ritz = jnp.linalg.eigvalsh(T)
    else:
        # preconditioned range: Ritz values of the whitened pencil from the
        # preconditioned-CG tridiagonal (reference :68-78 passes the
        # preconditioner into the linear_cg eigenvalue estimate)
        from .linear_cg import linear_cg

        cg_res = linear_cg(
            matmul_closure,
            init[..., None],
            n_tridiag=1,
            max_iter=k_lanczos,
            max_tridiag_iter=k_lanczos,
            tolerance=1e-5,
            preconditioner=preconditioner,
        )
        # t_mats is (nt, *batch, tmax, tmax): index the LEADING tridiag dim so
        # every batch element contributes its own Ritz values (indexing
        # [..., 0, :, :] would silently select batch element 0 instead).
        ritz = jnp.linalg.eigvalsh(cg_res.t_mats[0])
    # dead-iteration pads carry the last live Ritz scale (solvers/lanczos.py
    # breakdown convention), so they sit inside the hull; the safety factors
    # absorb residual estimation error
    max_eig = jnp.max(ritz, axis=-1) * 1.2
    min_eig = jnp.maximum(jnp.min(ritz, axis=-1), 1e-7 * jnp.max(ritz, axis=-1)) / 1.2
    # global (batch-reduced) range keeps shifts shared across the batch like
    # the reference's flattened quadrature
    max_eig = jnp.max(max_eig)
    min_eig = jnp.min(min_eig)

    shifts, weights = ciq_shifts_weights(min_eig, max_eig, num_quad)

    solves = minres(
        matmul_closure,
        rhs,
        shifts=shifts.astype(rhs.dtype),
        max_iter=settings.max_cg_iterations.value(),
        tolerance=settings.minres_tolerance.value(),
        preconditioner=preconditioner,
    )
    if not inverse:
        # one extra matmul per shift: sum_j w_j K (K + s_j)^{-1} rhs = K^{1/2} rhs
        solves = jax.vmap(matmul_closure)(solves)
    return solves, weights.astype(rhs.dtype)
