"""``solve`` with custom VJP.

Reference: linear_operator/functions/_solve.py:10-131.  The forward carries
the reference's dispatch policy (:10-22): structural solve if the operator has
one (Cholesky/Triangular/Diag/Woodbury...), dense Cholesky below the size
cutoff or when fast solves are disabled, preconditioned CG otherwise.

Backward (reference :70-131): with x = K^{-1} rhs and cotangent g,

    rhs_bar = K^{-T} g
    K_bar   = -rhs_bar x^T   (exact for any leaf parameterization; equals the
                              reference's symmetrized stacked form :96-131
                              whenever leaves enter K symmetrically — see
                              ``_solve_bwd``)

expressed through ``_bilinear_derivative`` so gradients reach the defining
leaves of arbitrarily nested operators.  The backward calls ``solve`` again,
so higher-order derivatives recurse correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings


def _dispatch_solve(op, rhs: jax.Array) -> jax.Array:
    s = op._solve_structure(rhs)
    if s is not None:
        return s
    n = op.shape[-1]
    if settings.use_cholesky_for_solves(n):
        chol = op._cholesky_impl(upper=False)
        return chol._cholesky_solve(rhs)
    closure, _, _ = op._preconditioner()
    return op._solve_via_cg(rhs, preconditioner=closure).solution


@jax.custom_vjp
def solve_base(op, rhs: jax.Array) -> jax.Array:
    return _dispatch_solve(op, rhs)


def _solve_fwd(op, rhs):
    x = _dispatch_solve(op, rhs)
    return x, (op, x, rhs.shape)


def _unbroadcast(g: jax.Array, shape: tuple) -> jax.Array:
    """Reduce a cotangent back to the (possibly broadcast) primal shape."""
    if g.shape == tuple(shape):
        return g
    extra = g.ndim - len(shape)
    if extra > 0:
        g = jnp.sum(g, axis=tuple(range(extra)))
    axes = tuple(i for i, (gs, ps) in enumerate(zip(g.shape, shape)) if ps == 1 and gs != 1)
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return g


def _solve_bwd(res, g):
    op, x, rhs_shape = res
    w = solve_base(op._transpose(), g)
    # K_bar = -w x^T: the exact VJP for ANY leaf parameterization.  The
    # reference's symmetrized stacked form -1/2(w x^T + x w^T)
    # (functions/_solve.py:96-131) computes the identical gradient whenever
    # the leaves enter K symmetrically (roots, diags, shared kernel inputs —
    # every PSD composition), but silently redistributes the cotangent
    # between asymmetric leaf roles (e.g. KernelLinearOperator's x1 vs x2,
    # which torch never observes because both roles are one shared tensor).
    # The exact form is per-leaf correct in all cases and contracts half the
    # bilinear columns.
    op_bar = op._bilinear_derivative(-w, x)
    return op_bar, _unbroadcast(w, rhs_shape)


solve_base.defvjp(_solve_fwd, _solve_bwd)


def solve(
    op, rhs: jax.Array, lhs: jax.Array | None = None, *, factored=None
) -> jax.Array:
    """Public solve (reference functions/__init__.py:201-230).

    rhs may be a vector (N,) or matrix (*b, N, T); with ``lhs`` returns
    ``lhs @ K^{-1} rhs``.

    ``factored`` is the functional analog of the reference's memoize cache
    (utils/memoize.py:10-125): pass a factor-carrying operator previously
    obtained from ``op.cholesky()`` / ``op.root_decomposition().root_op`` and
    the solve routes through its structural fast path instead of
    refactorizing.  Gradients flow to ``op``'s leaves THROUGH the
    factorization's VJP, exactly as if the factorization had been computed
    inline.
    """
    if factored is not None:
        op = op.with_factorization(factored)
    rhs = jnp.asarray(rhs)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    if settings.debug.on():
        if not op.is_square:
            raise RuntimeError("solve requires a square operator")
        if rhs.shape[-2] != op.shape[-1]:
            raise RuntimeError(
                f"rhs shape {rhs.shape} incompatible with operator {op.shape}"
            )
    x = solve_base(op, rhs)
    if squeeze:
        x = x[..., 0]
    if lhs is not None:
        return jnp.asarray(lhs) @ x
    return x
