"""K^{±1/2} @ rhs via contour integral quadrature.

Reference: linear_operator/functions/_sqrt_inv_matmul.py:10-126 and
utils/contour_integral_quad.py:14-156.

Forward: K^{-1/2} rhs = sum_j w_j (K + s_j I)^{-1} rhs (shifted MINRES
solves, shared Lanczos).  Backward (reference :52-126 reuses the saved
shifts/weights): from d(K+s)^{-1} = -(K+s)^{-1} dK (K+s)^{-1},

    rhs_bar = K^{-1/2} g              (same quadrature on the cotangent)
    K_bar   = -sum_j w_j ((K+s_j)^{-1} g) ((K+s_j)^{-1} rhs)^T

pushed through ONE ``_bilinear_derivative`` over the stacked shifted solves
(exact per-leaf VJP; equals the reference's symmetrized half-pairs form for
symmetric-in-leaves parameterizations — see functions/_solve.py).

Preconditioned quadrature (active when the operator's ``_preconditioner``
is): solves become (K + s_j P)^{-1} P^{1/2} rhs and the weighted sum is the
non-symmetric root M rhs with M M^T = K^{-1} exactly.  The VJP treats P as a
CONSTANT (verified exact against finite differences with P frozen, 3e-9
relative): gradients do not flow through the preconditioner's construction —
the same semantics as the reference, whose CIQ/MINRES solves run under
``torch.no_grad`` (utils/contour_integral_quad.py:141-150).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..solvers.contour_integral_quad import contour_integral_quad
from ..solvers.minres import minres
from ._solve import _unbroadcast


def _precond_pieces(op, key, num_quad, max_lanczos):
    """(P^{-1} closure, P^{1/2} premultiply) from the operator's
    preconditioner, built on DETACHED leaves — the quadrature treats P as a
    constant exactly like the reference runs its solves under no_grad
    (utils/contour_integral_quad.py:44-48, 141-150).  The premultiply is the
    reference's nested CIQ on the preconditioner operator (:46-48)."""
    closure, precond_op, _ = op.detach()._preconditioner()
    if closure is None or precond_op is None:
        return None, None

    def sqrt_pre(r):
        s_, w_ = contour_integral_quad(
            precond_op._matmul,
            r,
            key=key,
            num_quad=num_quad,
            max_lanczos_iter=max_lanczos,
            inverse=False,
        )
        w = w_.reshape(-1, *([1] * (s_.ndim - 1)))
        return jnp.sum(w * s_, axis=0)

    return closure, sqrt_pre


def _ciq_apply(
    op, rhs, key, num_quad=None, max_lanczos=None, precond=None, sqrt_pre=None
):
    if max_lanczos is None:
        max_lanczos = settings.max_lanczos_quadrature_iterations.value()
    solves, weights = contour_integral_quad(
        op._matmul,
        rhs,
        key=key,
        num_quad=num_quad,
        max_lanczos_iter=max_lanczos,
        preconditioner=precond,
        sqrt_premultiply=sqrt_pre,
    )
    w = weights.reshape(-1, *([1] * (solves.ndim - 1)))
    return jnp.sum(w * solves, axis=0), solves, weights


def sqrt_inv_matmul(op, rhs, lhs=None, *, key=None):
    """K^{-1/2} rhs; with ``lhs``, returns the pair
    (lhs @ K^{-1/2} rhs, row-wise lhs K^{-1} lhs^T) exactly like the
    reference (_linear_operator.py:2422-2466, functions/_sqrt_inv_matmul.py:
    18-50 — there the inv_quad term falls out of the CIQ zero-shift solves;
    here it routes through the standard inv_quad dispatch)."""
    # NOTE (parity): when the operator carries an active preconditioner P,
    # the result is the preconditioned-CIQ root application M rhs with
    # M M^T = K^{-1} exactly (not the symmetric K^{-1/2} rhs) — identical to
    # the reference's behavior (utils/contour_integral_quad.py:44-48), and
    # exactly what whitening/sampling consume.  Without a preconditioner
    # (the default below settings.min_preconditioning_size) this IS
    # K^{-1/2} rhs.
    rhs = jnp.asarray(rhs)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    # broadcast an unbatched rhs up to the operator batch (the CIQ Lanczos
    # init derives its batch from the rhs; the bwd's _unbroadcast reduces
    # the cotangent back to the caller's shape)
    rhs = jnp.broadcast_to(
        rhs,
        (*jnp.broadcast_shapes(op.batch_shape, rhs.shape[:-2]), *rhs.shape[-2:]),
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    out = _sqrt_inv_core(op, rhs, key)
    if squeeze:
        out = out[..., 0]
    if lhs is not None:
        from . import inv_quad

        lhs = jnp.asarray(lhs)
        iq = inv_quad(op, jnp.swapaxes(lhs, -1, -2), reduce_inv_quad=False)
        return lhs @ out, iq
    return out


def sqrt_matmul(op, rhs, *, key=None):
    """K^{1/2} rhs = K @ (K^{-1/2} rhs) (reference zero_mean_mvn_samples CIQ
    path, _linear_operator.py:2769-2776)."""
    rhs = jnp.asarray(rhs)
    rhs = jnp.broadcast_to(
        rhs,
        (*jnp.broadcast_shapes(op.batch_shape, rhs.shape[:-2]), *rhs.shape[-2:]),
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    half_inv = _sqrt_inv_core(op, rhs, key)
    return op._matmul(half_inv)


def _sqrt_inv_core(op, rhs, key):
    # Capture quadrature settings ONCE at entry: custom_vjp backwards are
    # traced lazily by jax.grad, often after the caller's settings context
    # has exited — re-reading the flags there would desynchronize the
    # cotangent quadrature from the saved forward solves/weights.
    num_quad = settings.num_contour_quadrature.value()
    max_lanczos = settings.max_lanczos_quadrature_iterations.value()
    # Preconditioned quadrature (reference utils/contour_integral_quad.py:
    # 44-48): with P ~= K the whitened spectrum collapses and MINRES
    # converges in a few iterations.  The weighted sum becomes the
    # non-symmetric root application M rhs with M M^T = K^{-1} EXACTLY
    # (M = P^{-1/2} (P^{-1/2} K P^{-1/2})^{-1/2}) — the property sampling
    # and whitening consume; P's own leaves are detached constants (the
    # reference runs these solves under no_grad the same way).
    precond, sqrt_pre = _precond_pieces(op, key, num_quad, max_lanczos)

    @jax.custom_vjp
    def inner(op, rhs):
        out, _, _ = _ciq_apply(
            op, rhs, key, num_quad, max_lanczos, precond, sqrt_pre
        )
        return out

    def fwd(op, rhs):
        out, solves, weights = _ciq_apply(
            op, rhs, key, num_quad, max_lanczos, precond, sqrt_pre
        )
        return out, (op, solves, weights, rhs.shape)

    def bwd(res, g):
        op, rhs_solves, weights, rhs_shape = res
        # shifted solves of the cotangent reuse the same quadrature (the
        # shifts derive from stop_gradient'd eigenvalue estimates, so
        # recomputing them inside the bwd trace yields identical values).
        # With preconditioning, out = sum_j w_j S_j P^{1/2} rhs where
        # S_j = (K + s_j P)^{-1} is SYMMETRIC, so the exact cotangents are
        #   rhs_bar = P^{1/2} sum_j w_j S_j g   (premultiply AFTER the solves)
        #   K_bar   = -sum_j w_j (S_j g)(S_j P^{1/2} rhs)^T  (saved solves)
        # i.e. the cotangent runs WITHOUT the premultiply.
        g_out, g_solves, _ = _ciq_apply(
            op, g, key, num_quad, max_lanczos, precond, None
        )
        rhs_bar = sqrt_pre(g_out) if sqrt_pre is not None else g_out
        rhs_bar = _unbroadcast(rhs_bar, rhs_shape)
        w = weights.reshape(-1, *([1] * (rhs_solves.ndim - 1)))
        # K_bar = -sum_j w_j ((K+s_j)^{-T} g)((K+s_j)^{-1} rhs)^T — the exact
        # VJP, stacked over shifts into ONE bilinear derivative.  (CIQ only
        # applies to symmetric-valued K, so the MINRES g-solves serve as the
        # transposed solves.)  The reference's symmetrized half-pairs form
        # (functions/_sqrt_inv_matmul.py:52-126) computes the same gradient
        # for symmetric-in-leaves parameterizations at twice the columns;
        # the exact form is additionally per-leaf correct for asymmetric leaf
        # roles (see functions/_solve.py:_solve_bwd).
        left = jnp.moveaxis(-w * g_solves, 0, -1).reshape(*g_solves.shape[1:-1], -1)
        right = jnp.moveaxis(rhs_solves, 0, -1).reshape(*rhs_solves.shape[1:-1], -1)
        op_bar = op._bilinear_derivative(left, right)
        return op_bar, rhs_bar

    inner.defvjp(fwd, bwd)
    return inner(op, rhs)
