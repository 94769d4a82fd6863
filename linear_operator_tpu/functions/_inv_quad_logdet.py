"""``inv_quad_logdet`` — the flagship GP marginal-likelihood kernel.

Reference: linear_operator/functions/_inv_quad_logdet.py:14-226 and the
dispatch in operators/_linear_operator.py:1688-1804.

Forward (stochastic path, reference :28-161): draw m probe vectors from the
preconditioner distribution N(0, P) (or N(0, I) without one), run ONE batched
preconditioned CG over the stacked columns [probes | rhs] with tridiagonal
extraction on the probe columns, then

    logdet ~= SLQ estimate of log det(P^{-1} K) + log det P
    inv_quad = sum(solves[..., m:] * rhs)

This is the variance-reduced estimator of Wenger et al. 2021
(arXiv:2107.00243).  Backward (reference :163-226): stochastic
trace-estimator gradients,

    d logdet ~= 1/m sum_j ||z_j||^2 <K^{-1} z^_j, dK P^{-1} z^_j>
    d inv_quad = -<K^{-1} rhs, dK K^{-1} rhs>;   d/d rhs = 2 K^{-1} rhs

(z^ = unit-normalized probes; the ||z||^2 factor makes the Hutchinson trace
estimator exactly unbiased) expressed as ONE ``_bilinear_derivative`` over
stacked left/right vectors.  The P-dependent gradient terms cancel in
expectation (d[logdet(P^{-1}K) + logdet P] = tr(K^{-1} dK)), so the
preconditioner is built on the detached operator — the same net estimator as
the reference (which also computes preconditioner-argument grads only through
the logdet-P term).

Dispatch: structural closed forms first (Diag/Chol/Triangular/Woodbury),
dense Cholesky below ``max_cholesky_size`` or with fast_computations.log_prob
off, stochastic CG+SLQ above it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..solvers.lanczos import lanczos_tridiag_to_diag
from ..solvers.stochastic_lq import slq_quadrature
from ._solve import _unbroadcast


def inv_quad_logdet(
    op,
    inv_quad_rhs: jax.Array | None = None,
    logdet: bool = False,
    reduce_inv_quad: bool = True,
    *,
    key: jax.Array | None = None,
    num_probes: int | None = None,
    factored=None,
):
    """Returns (inv_quad, logdet); each is zeros(batch) when not requested.

    ``factored``: optional factor-carrying operator (from ``op.cholesky()``
    etc.) whose structural closed forms are used instead of refactorizing —
    the functional analog of the reference's memoize cache (see
    functions._solve.solve).
    """
    if factored is not None:
        op = op.with_factorization(factored)
    if settings.debug.on() and not op.is_square:
        raise RuntimeError("inv_quad_logdet requires a square operator")

    squeeze = inv_quad_rhs is not None and inv_quad_rhs.ndim == 1
    rhs = inv_quad_rhs[:, None] if squeeze else inv_quad_rhs

    def _out(iq, ld):
        iq, ld = _finish(op, iq, ld, rhs, reduce_inv_quad)
        if squeeze and not reduce_inv_quad:
            # 1-D rhs: drop the synthetic trailing column (beyond-reference:
            # the reference's Cholesky path crashes on vector rhs outright)
            iq = iq[..., 0]
        return iq, ld
    if settings.debug.on() and rhs is not None and rhs.shape[-2] != op.shape[-1]:
        raise RuntimeError(
            f"rhs shape {rhs.shape} incompatible with operator {op.shape}"
        )

    structural = op._inv_quad_logdet_structure(rhs, logdet)
    if structural is not None:
        iq, ld = structural
        return _out(iq, ld)

    n = op.shape[-1]
    if settings.use_cholesky_for_log_prob(n):
        chol = op._cholesky_impl(upper=False)
        iq, ld = chol_iqld(chol, rhs, logdet, op.batch_shape, op.dtype)
        return _out(iq, ld)

    # ---- stochastic CG + SLQ path ---------------------------------------
    if num_probes is None:
        num_probes = settings.num_trace_samples.value() if logdet else 0
    if key is None:
        # ``deterministic_probes`` gate (reference settings.py:245-262): with
        # the flag ON the reference reuses cached probe vectors across calls;
        # the jit-compatible analog is a fixed PRNG key.  With the flag OFF
        # the reference draws FRESH probes every call — a caller who passes no
        # key here still gets the fixed key (stochastic-API convention), so
        # warn once that successive calls share probes unless ``key=`` is
        # supplied (or the flag is turned on to declare this intentional).
        if num_probes > 0 and settings.deterministic_probes.off():
            import warnings

            warnings.warn(
                "inv_quad_logdet called without key=: probe vectors are "
                "deterministic and shared across calls. Pass key= for fresh "
                "probes (reference deterministic_probes=False semantics), or "
                "enable settings.deterministic_probes to silence this.",
                UserWarning,
                stacklevel=3,
            )
        key = jax.random.PRNGKey(0)

    if num_probes > 0:
        closure, precond_op, logdet_p = op.detach()._preconditioner()
        if precond_op is not None:
            probes = jnp.moveaxis(
                precond_op.zero_mean_mvn_samples(num_probes, key=key), 0, -1
            )  # (*b, n, m)
            precond_probes = closure(probes)
        else:
            probes = jax.random.normal(
                key, (*op.batch_shape, n, num_probes), dtype=op.dtype
            )
            precond_probes = probes
            logdet_p = jnp.zeros(op.batch_shape, dtype=op.dtype)
        norms = jnp.linalg.norm(probes, axis=-2, keepdims=True)  # (*b, 1, m)
        probes = jax.lax.stop_gradient(probes / norms)
        precond_probes = jax.lax.stop_gradient(precond_probes / norms)
        norms = jax.lax.stop_gradient(norms)
    else:
        probes = jnp.zeros((*op.batch_shape, n, 0), dtype=op.dtype)
        precond_probes = probes
        norms = jnp.zeros((*op.batch_shape, 1, 0), dtype=op.dtype)
        logdet_p = jnp.zeros(op.batch_shape, dtype=op.dtype)

    iq, ld_est = _stochastic_iqld(op, rhs, probes, precond_probes, norms)
    if logdet:
        # Under skip_logdet_forward the SLQ term's forward value is zero (the
        # quadrature is never computed — see _stochastic_forward) but its
        # gradient is preserved, and the preconditioner logdet is still
        # returned, matching the reference (settings.py:506-531;
        # _linear_operator.py:1799-1800 adds logdet_p unconditionally).
        ld = ld_est + logdet_p
    else:
        ld = jnp.zeros(op.batch_shape, dtype=op.dtype)
    return _out(iq, ld)


def chol_iqld(chol, rhs, logdet, batch_shape, dtype):
    """Cholesky-path inv_quad_logdet (reference :1713-1731), natively
    differentiable (JAX has a Cholesky VJP)."""
    if rhs is None:
        iq = jnp.zeros(batch_shape, dtype=dtype)
    else:
        y = chol._solve_structure(rhs)
        iq = jnp.sum(y * y, axis=-2)
    if logdet:
        ld = 2.0 * jnp.sum(jnp.log(jnp.abs(chol._diagonal())), axis=-1)
    else:
        ld = jnp.zeros(batch_shape, dtype=dtype)
    return iq, ld


def _finish(op, iq, ld, rhs, reduce_inv_quad):
    if rhs is None:
        iq = jnp.zeros(op.batch_shape, dtype=op.dtype)
    elif reduce_inv_quad:
        iq = jnp.sum(iq, axis=-1)
    # ld carries the JOINT batch when the rhs batch is broader than the
    # operator's (the solves run at the joint batch); never shrink it
    ld = jnp.broadcast_to(ld, jnp.broadcast_shapes(op.batch_shape, jnp.shape(ld)))
    return iq, ld


# ---------------------------------------------------------------------------
# Stochastic CG + SLQ core with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _stochastic_iqld(op, rhs, probes, precond_probes, norms):
    iq, ld, _, _ = _stochastic_forward(op, rhs, probes)
    return iq, ld


def _stochastic_forward(op, rhs, probes):
    # mesh sharding (SURVEY.md section 2g): batch over "data", matrix dim
    # over "model", stacked [probes | rhs] columns over "probe" (no-op
    # outside a mesh).  Constrain BOTH concat operands and the result so the
    # concatenate is born in the target layout — an unconstrained operand
    # layout forces an involuntary full rematerialization (see
    # parallel/sharding.py:maybe_shard_probes).
    from ..parallel import maybe_shard_probes

    n = op.shape[-1]
    m = probes.shape[-1]
    if rhs is not None and m > 0:
        joint = jnp.broadcast_shapes(
            op.batch_shape, rhs.shape[:-2], probes.shape[:-2]
        )
        rhs_b = jnp.broadcast_to(rhs, (*joint, *rhs.shape[-2:]))
        # probes carry the OPERATOR batch; an rhs with broader batch dims
        # (valid everywhere else) must broadcast the probes up too
        probes_b = jnp.broadcast_to(probes, (*joint, *probes.shape[-2:]))
        stacked = jnp.concatenate(
            [maybe_shard_probes(probes_b), maybe_shard_probes(rhs_b)], axis=-1
        )
    elif rhs is not None:
        stacked = rhs
    else:
        stacked = probes

    stacked = maybe_shard_probes(stacked)
    # the caller's probe draw built the same preconditioner; under jit the
    # two _preconditioner() subgraphs are identical and XLA CSE merges them
    # (rebuilding here keeps the custom_vjp signature to pure arrays)
    closure, _, _ = op.detach()._preconditioner()
    result = op._solve_via_cg(stacked, preconditioner=closure, n_tridiag=m)
    solves = result.solution

    if m > 0 and settings.skip_logdet_forward.on():
        # Reference :140-148 guards the whole SLQ forward (including the NaN
        # probe) behind skip_logdet_forward.off(): with the flag on the
        # quadrature is never computed and the forward SLQ term is zero.  The
        # custom VJP below still produces the unbiased logdet gradient from
        # the probe solves, so SGD on the MLL is unaffected.
        ld = jnp.zeros(op.batch_shape, dtype=op.dtype)
        probe_solves = solves[..., :m]
    elif m > 0:
        # NaN-probe propagation (reference functions/_inv_quad_logdet.py:
        # 141-142): a NaN anywhere in the tridiagonals means the solve
        # failed — return NaN logdet rather than quadrature garbage.
        t_mats = result.t_mats
        bad = jnp.isnan(t_mats).any()
        evals, evecs = lanczos_tridiag_to_diag(
            jnp.where(bad, jnp.eye(t_mats.shape[-1], dtype=t_mats.dtype), t_mats)
        )
        (ld,) = slq_quadrature(n, evals, evecs, [jnp.log])
        ld = jnp.where(bad, jnp.nan, ld)
        probe_solves = solves[..., :m]
    else:
        ld = jnp.zeros(op.batch_shape, dtype=op.dtype)
        probe_solves = solves[..., :0]

    if rhs is not None:
        rhs_solves = solves[..., m:]
        iq = jnp.sum(rhs_solves * stacked[..., m:], axis=-2)
    else:
        rhs_solves = None
        iq = jnp.zeros(op.batch_shape, dtype=op.dtype)

    return iq, ld, probe_solves, rhs_solves


def _stochastic_fwd(op, rhs, probes, precond_probes, norms):
    iq, ld, probe_solves, rhs_solves = _stochastic_forward(op, rhs, probes)
    res = (
        op,
        probes,
        precond_probes,
        norms,
        probe_solves,
        rhs_solves,
        None if rhs is None else rhs.shape,
    )
    return (iq, ld), res


def _stochastic_bwd(res, cotangents):
    op, probes, precond_probes, norms, probe_solves, rhs_solves, rhs_shape = res
    iq_bar, ld_bar = cotangents
    m = probes.shape[-1]

    lefts, rights = [], []
    if m > 0:
        # probe_solves may carry a JOINT batch broader than the probes (rhs
        # batch > operator batch); broadcast the op-batch pieces up so the
        # left/right stacks concatenate
        joint = probe_solves.shape[:-2]
        coef = ld_bar[..., None, None] * (norms**2) / m  # (*b, 1, m)
        lefts.append(probe_solves * coef)
        rights.append(
            jnp.broadcast_to(precond_probes, (*joint, *precond_probes.shape[-2:]))
        )
    if rhs_solves is not None and rhs_solves.shape[-1] > 0:
        w = iq_bar[..., None, :]  # (*b, 1, t)
        lefts.append(-rhs_solves * w)
        rights.append(rhs_solves)

    if lefts:
        left = jnp.concatenate(lefts, axis=-1)
        right = jnp.concatenate(rights, axis=-1)
        op_bar = op._bilinear_derivative(left, right)
    else:
        op_bar = jax.tree_util.tree_map(jnp.zeros_like, op)

    if rhs_shape is not None:
        w = iq_bar[..., None, :]
        rhs_bar = _unbroadcast(2.0 * rhs_solves * w, rhs_shape)
    else:
        rhs_bar = None

    return (
        op_bar,
        rhs_bar,
        jnp.zeros_like(probes),
        jnp.zeros_like(precond_probes),
        jnp.zeros_like(norms),
    )


_stochastic_iqld.defvjp(_stochastic_fwd, _stochastic_bwd)
