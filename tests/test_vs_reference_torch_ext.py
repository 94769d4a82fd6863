"""Cross-library oracle, round-5 breadth extension (NEXT_STEPS round-6 #3).

Extends ``test_vs_reference_torch.py`` (same conventions: identical leaf
values both sides, reference driven through its PUBLIC API, nothing copied)
to three surfaces the base suite does not cover:

* ``KernelLinearOperator``-built covariances — the flagship GP call stack:
  K = k(X,X) + noise·I built from raw inputs in BOTH libraries (the RBF
  formula written independently in torch and jax), values AND gradients
  w.r.t. the inputs X and the kernel hyperparameters asserted for solve and
  inv_quad_logdet, exact and CG regimes (reference
  kernel_linear_operator.py:138-420).
* ``diagonalization`` — Lanczos-regime reconstruction residuals and
  symeig-regime eigenvalues (reference _linear_operator.py:1439-1482).
* ``zero_mean_mvn_samples`` — moment-matched: empirical covariance of both
  libraries' samplers vs the SAME dense K, root path and CIQ path
  (reference _linear_operator.py:2746-2793).

Gradient conventions need no projection here: every leaf (inputs, scalars,
noise vectors) parameterizes K through a map whose differential images are
symmetric matrices, so torch's symmetrized Cholesky cotangent and our free
cotangent act identically as linear functionals.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

torch.set_default_dtype(torch.float64)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import linear_operator.operators as R  # noqa: E402  (the torch reference)
from linear_operator import settings as rs  # noqa: E402

import linear_operator_tpu.operators as O  # noqa: E402
from linear_operator_tpu import settings as js  # noqa: E402


def tj(x):
    return jnp.asarray(x, jnp.float64)


def tt(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def _psd(rng, n, scale=1.0):
    a = rng.standard_normal((n, n))
    return scale * (a @ a.T + n * np.eye(n))


class _Ctx:
    def __init__(self, *ctxs):
        self.ctxs = ctxs

    def __enter__(self):
        for c in self.ctxs:
            c.__enter__()

    def __exit__(self, *a):
        for c in reversed(self.ctxs):
            c.__exit__(*a)


# ---------------------------------------------------------------------------
# KernelLinearOperator-built covariances
# ---------------------------------------------------------------------------

_rng = np.random.default_rng(20250820)
_N, _D = 40, 3
_X = _rng.standard_normal((_N, _D))
_LS = np.asarray(1.3)
_OS = np.asarray(2.1)
_NOISE = _rng.uniform(0.3, 0.8, _N)
_RHS = _rng.standard_normal((_N, 2))
_WEIGHT = _rng.standard_normal((_N, 2))


def _rbf_torch(x1, x2, lengthscale, outputscale):
    # independent torch implementation of outputscale*exp(-||dx||^2/(2 l^2))
    x1s, x2s = x1 / lengthscale, x2 / lengthscale
    d2 = (x1s.unsqueeze(-2) - x2s.unsqueeze(-3)).pow(2).sum(-1)
    return outputscale * torch.exp(-0.5 * d2)


def _rbf_jax(x1, x2, lengthscale, outputscale):
    x1s, x2s = x1 / lengthscale, x2 / lengthscale
    d2 = jnp.sum((x1s[..., :, None, :] - x2s[..., None, :, :]) ** 2, axis=-1)
    return outputscale * jnp.exp(-0.5 * d2)


def _build_torch_kernel(x, ls, os_, noise):
    k = R.KernelLinearOperator(
        x, x, covar_func=_rbf_torch, lengthscale=ls, outputscale=os_
    )
    return R.AddedDiagLinearOperator(k, R.DiagLinearOperator(noise))


def _build_jax_kernel(x, ls, os_, noise):
    k = O.KernelLinearOperator(
        x, x, {"lengthscale": ls, "outputscale": os_},
        covar_func=_rbf_jax, symmetric=True,
    )
    return O.AddedDiagLinearOperator(k, O.DiagLinearOperator(noise))


def _torch_kernel_grads(loss_fn):
    leaves = [tt(v).requires_grad_(True) for v in (_X, _LS, _OS, _NOISE)]
    loss = loss_fn(_build_torch_kernel(*leaves))
    grads = torch.autograd.grad(loss, leaves)
    return float(loss.detach()), [np.asarray(g.detach()) for g in grads]


def _jax_kernel_grads(loss_fn):
    def f(*leaves):
        return loss_fn(_build_jax_kernel(*leaves))

    leaves = [tj(v) for v in (_X, _LS, _OS, _NOISE)]
    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(*leaves)
    return float(val), [np.asarray(g) for g in grads]


def _exact_ctx():
    return _Ctx(rs.max_cholesky_size(800), js.max_cholesky_size(800))


def _cg_ctx():
    return _Ctx(
        rs.max_cholesky_size(0),
        rs.cg_tolerance(1e-12),
        rs.max_cg_iterations(400),
        rs.min_preconditioning_size(10**9),
        js.max_cholesky_size(0),
        js.cg_tolerance(1e-12),
        js.max_cg_iterations(400),
        js.min_preconditioning_size(10**9),
    )


LEAF_NAMES = ["x", "lengthscale", "outputscale", "noise"]


def _assert_leaf_grads(gj, gt, rtol, atol, ctx):
    for name, a, b in zip(LEAF_NAMES, gj, gt):
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol, err_msg=f"{ctx} leaf {name}"
        )


@pytest.mark.parametrize("regime", ["exact", "cg"])
def test_kernel_op_solve_values_and_grads(regime):
    """solve on a covariance built FROM RAW INPUTS in both libraries:
    gradients flow through the kernel formula to X and hyperparameters."""
    ctx = _exact_ctx() if regime == "exact" else _cg_ctx()
    with ctx:
        vt, gt = _torch_kernel_grads(
            lambda op: (op.solve(tt(_RHS)) * tt(_WEIGHT)).sum()
        )
        vj, gj = _jax_kernel_grads(
            lambda op: jnp.sum(op.solve(tj(_RHS)) * tj(_WEIGHT))
        )
    if regime == "exact":
        np.testing.assert_allclose(vj, vt, rtol=1e-8, atol=1e-9)
        _assert_leaf_grads(gj, gt, 1e-6, 1e-8, "kernel-solve-exact")
    else:
        np.testing.assert_allclose(vj, vt, rtol=2e-5, atol=1e-6)
        _assert_leaf_grads(gj, gt, 5e-4, 1e-5, "kernel-solve-cg")


@pytest.mark.parametrize("regime", ["exact", "cg"])
def test_kernel_op_inv_quad_logdet_values_and_grads(regime):
    def t_loss(op):
        iq, ld = op.inv_quad_logdet(tt(_RHS), logdet=True)
        return iq + 0.7 * ld

    def j_loss(op):
        iq, ld = op.inv_quad_logdet(tj(_RHS), logdet=True)
        return jnp.sum(iq) + 0.7 * ld

    if regime == "exact":
        with _exact_ctx():
            vt, gt = _torch_kernel_grads(t_loss)
            vj, gj = _jax_kernel_grads(j_loss)
        np.testing.assert_allclose(vj, vt, rtol=1e-8, atol=1e-8)
        _assert_leaf_grads(gj, gt, 1e-6, 1e-8, "kernel-iqld-exact")
    else:
        # stochastic-trace regime: inject IDENTICAL probes on both sides
        # (same mechanism as the base suite's stochastic test)
        probes_raw = np.random.default_rng(11).standard_normal((_N, 8))
        norms = np.linalg.norm(probes_raw, axis=0, keepdims=True)
        probes = probes_raw / norms

        orig = R.LinearOperator._probe_vectors_and_norms

        def patched(self):
            return tt(probes), tt(norms)

        R.LinearOperator._probe_vectors_and_norms = patched
        try:
            with _cg_ctx(), _Ctx(rs.max_lanczos_quadrature_iterations(32)):
                vt, gt = _torch_kernel_grads(t_loss)
        finally:
            R.LinearOperator._probe_vectors_and_norms = orig

        from linear_operator_tpu.functions._inv_quad_logdet import _stochastic_iqld

        def j_loss_stoch(op):
            iq, ld = _stochastic_iqld(
                op, tj(_RHS), tj(probes), tj(probes), tj(norms)
            )
            return jnp.sum(iq) + 0.7 * ld

        with _cg_ctx(), _Ctx(js.max_lanczos_quadrature_iterations(32)):
            vj, gj = _jax_kernel_grads(j_loss_stoch)
        np.testing.assert_allclose(vj, vt, rtol=5e-4, atol=5e-4)
        _assert_leaf_grads(gj, gt, 1e-3, 1e-4, "kernel-iqld-stoch")


def test_kernel_op_batched_values_and_grads():
    """BATCHED inputs x (2, n, d) through KernelLinearOperator on both
    sides: the per-batch blocked covar path vs the reference's batched
    broadcast (reference kernel_linear_operator.py:174-230)."""
    rng = np.random.default_rng(9)
    xb = rng.standard_normal((2, 24, 3))
    noise_b = rng.uniform(0.3, 0.8, (2, 24))
    rhs = rng.standard_normal((2, 24, 2))
    # (1, 1)-shaped hyperparameters: the reference batch-expands params over
    # their leading (ndim - num_nonbatch==2) dims, so 0-d params cannot ride
    # a batched operator (kernel_linear_operator.py:162-172)
    ls2, os2 = _LS.reshape(1, 1), _OS.reshape(1, 1)

    def t_loss(leaves):
        x, ls, os_, noise = leaves
        k = R.KernelLinearOperator(
            x, x, covar_func=_rbf_torch, lengthscale=ls, outputscale=os_
        )
        op = R.AddedDiagLinearOperator(k, R.DiagLinearOperator(noise))
        iq, ld = op.inv_quad_logdet(tt(rhs), logdet=True)
        return (iq + 0.7 * ld).sum()

    def j_loss(x, ls, os_, noise):
        k = O.KernelLinearOperator(
            x, x, {"lengthscale": ls, "outputscale": os_},
            covar_func=_rbf_jax, symmetric=True,
        )
        op = O.AddedDiagLinearOperator(k, O.DiagLinearOperator(noise))
        iq, ld = op.inv_quad_logdet(tj(rhs), logdet=True)
        return jnp.sum(iq + 0.7 * ld)

    with _Ctx(rs.max_cholesky_size(800), js.max_cholesky_size(800)):
        leaves_t = [tt(v).requires_grad_(True) for v in (xb, ls2, os2, noise_b)]
        lt = t_loss(leaves_t)
        gt = [np.asarray(g.detach()) for g in torch.autograd.grad(lt, leaves_t)]
        leaves_j = [tj(v) for v in (xb, ls2, os2, noise_b)]
        lj, gj = jax.value_and_grad(j_loss, argnums=(0, 1, 2, 3))(*leaves_j)

    np.testing.assert_allclose(float(lj), float(lt.detach()), rtol=1e-8, atol=1e-8)
    for name, a, b in zip(LEAF_NAMES, gj, gt):
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-6, atol=1e-8,
            err_msg=f"kernel-batched leaf {name}",
        )


def test_kernel_op_multi_output_layout():
    """num_outputs_per_input=(2, 2): the multi-output (LMC-style) row/column
    interleaving must match the reference's layout exactly — to_dense,
    matmul, solve, diagonal (reference kernel_linear_operator.py:130-134,
    402-410).  (The reference's own __getitem__ crashes on this path with a
    dense covar_mat — ours slices fine, so only the common surface is
    compared.)"""
    rng = np.random.default_rng(31)
    n, t = 6, 2
    x = rng.standard_normal((n, 3))
    B = np.array([[1.0, 0.4], [0.4, 0.8]])

    def covar_t(x1, x2, lengthscale):
        d2 = ((x1.unsqueeze(-2) - x2.unsqueeze(-3)) / lengthscale).pow(2).sum(-1)
        return torch.kron(torch.exp(-0.5 * d2), tt(B))

    def covar_j(x1, x2, lengthscale):
        d2 = jnp.sum(
            ((x1[..., :, None, :] - x2[..., None, :, :]) / lengthscale) ** 2, -1
        )
        return jnp.kron(jnp.exp(-0.5 * d2), tj(B))

    ls = np.asarray(1.1)
    ot = R.KernelLinearOperator(
        tt(x), tt(x), covar_func=covar_t, lengthscale=tt(ls),
        num_outputs_per_input=(t, t),
    )
    oj = O.KernelLinearOperator(
        tj(x), tj(x), {"lengthscale": tj(ls)},
        covar_func=covar_j, symmetric=True, num_outputs_per_input=(t, t),
    )
    np.testing.assert_allclose(
        np.asarray(oj.to_dense()), np.asarray(ot.to_dense().detach()),
        rtol=1e-12, atol=1e-14,
    )
    rhs = rng.standard_normal((n * t, 3))
    np.testing.assert_allclose(
        np.asarray(oj @ tj(rhs)), np.asarray((ot @ tt(rhs)).detach()),
        rtol=1e-12, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(oj.diagonal()), np.asarray(ot.diagonal().detach()),
        rtol=1e-12, atol=1e-14,
    )
    noise = rng.uniform(0.5, 1.0, n * t)
    st = R.AddedDiagLinearOperator(ot, R.DiagLinearOperator(tt(noise)))
    sj = O.AddedDiagLinearOperator(oj, O.DiagLinearOperator(tj(noise)))
    with _Ctx(rs.max_cholesky_size(800), js.max_cholesky_size(800)):
        np.testing.assert_allclose(
            np.asarray(sj.solve(tj(rhs))), np.asarray(st.solve(tt(rhs)).detach()),
            rtol=1e-9, atol=1e-11,
        )


# ---------------------------------------------------------------------------
# diagonalization
# ---------------------------------------------------------------------------


def _diag_specs():
    rng = np.random.default_rng(7)
    n = 48
    K = _psd(rng, n)
    d = rng.uniform(0.5, 2.5, n)
    col = 3.0 * np.exp(-0.35 * np.arange(n))
    col[0] = 5.0
    return {
        "dense": (
            lambda: O.DenseLinearOperator(tj(K)),
            lambda: R.DenseLinearOperator(tt(K)),
        ),
        "added_diag": (
            lambda: O.AddedDiagLinearOperator(
                O.DenseLinearOperator(tj(K)), O.DiagLinearOperator(tj(d))
            ),
            lambda: R.AddedDiagLinearOperator(
                R.DenseLinearOperator(tt(K)), R.DiagLinearOperator(tt(d))
            ),
        ),
        "toeplitz": (
            lambda: O.ToeplitzLinearOperator(tj(col)),
            lambda: R.ToeplitzLinearOperator(tt(col)),
        ),
    }


DIAG_SPECS = _diag_specs()


@pytest.mark.parametrize("name", list(DIAG_SPECS))
def test_diagonalization_lanczos_reconstruction(name):
    """Forced-Lanczos diagonalization: both libraries' Q diag(e) Q^T must
    reconstruct the SAME dense K to the harness tolerance."""
    bj, bt = DIAG_SPECS[name]
    Kd = np.asarray(bj().to_dense())
    scale = np.linalg.norm(Kd)

    with _Ctx(
        rs.max_cholesky_size(0),
        rs.max_root_decomposition_size(100),
        js.max_cholesky_size(0),
        js.max_root_decomposition_size(100),
    ):
        et, vt = bt().diagonalization(method="lanczos")
        evt = np.asarray(vt.to_dense().detach())
        recon_t = (evt * np.asarray(et.detach())) @ evt.T
        ej, vj = bj().diagonalization(method="lanczos")
        evj = np.asarray(vj.to_dense())
        recon_j = (evj * np.asarray(ej)) @ evj.T

    assert np.linalg.norm(recon_t - Kd) / scale < 1e-5
    assert np.linalg.norm(recon_j - Kd) / scale < 1e-5


@pytest.mark.parametrize("name", list(DIAG_SPECS))
def test_diagonalization_symeig_eigenvalues(name):
    bj, bt = DIAG_SPECS[name]
    et, _ = bt().diagonalization(method="symeig")
    ej, _ = bj().diagonalization(method="symeig")
    et = np.sort(np.asarray(et.detach()), axis=-1)
    ej = np.sort(np.asarray(ej), axis=-1)
    scale = np.max(np.abs(et))
    np.testing.assert_allclose(ej / scale, et / scale, rtol=1e-8, atol=1e-8)


# ---------------------------------------------------------------------------
# zero_mean_mvn_samples (moment-matched)
# ---------------------------------------------------------------------------


def _mvn_specs():
    rng = np.random.default_rng(13)
    n = 24
    K = _psd(rng, n)
    K2 = _psd(rng, n, 0.5)
    d = rng.uniform(0.5, 2.5, n)
    A, B = _psd(rng, 4), _psd(rng, 6)
    return {
        "dense": (
            lambda: O.DenseLinearOperator(tj(K)),
            lambda: R.DenseLinearOperator(tt(K)),
        ),
        "added_diag": (
            lambda: O.AddedDiagLinearOperator(
                O.DenseLinearOperator(tj(K)), O.DiagLinearOperator(tj(d))
            ),
            lambda: R.AddedDiagLinearOperator(
                R.DenseLinearOperator(tt(K)), R.DiagLinearOperator(tt(d))
            ),
        ),
        # structured samplers: per-term (PsdSum) and factor-root (Kronecker)
        "psd_sum": (
            lambda: O.PsdSumLinearOperator(
                (O.DenseLinearOperator(tj(K)), O.DenseLinearOperator(tj(K2)))
            ),
            lambda: R.PsdSumLinearOperator(
                R.DenseLinearOperator(tt(K)), R.DenseLinearOperator(tt(K2))
            ),
        ),
        "kronecker": (
            lambda: O.KroneckerProductLinearOperator(
                O.DenseLinearOperator(tj(A)), O.DenseLinearOperator(tj(B))
            ),
            lambda: R.KroneckerProductLinearOperator(
                R.DenseLinearOperator(tt(A)), R.DenseLinearOperator(tt(B))
            ),
        ),
    }


MVN_SPECS = _mvn_specs()


def _check_moments(samples, Kd, tol):
    """Empirical mean ~ 0 and covariance ~ K within the MC tolerance."""
    s = np.asarray(samples)
    n = Kd.shape[0]
    assert s.shape[-1] == n
    mean = s.mean(axis=0)
    cov = (s.T @ s) / s.shape[0]
    kscale = np.linalg.norm(Kd)
    assert np.linalg.norm(mean) / np.sqrt(np.trace(Kd) / n) < tol * np.sqrt(n)
    assert np.linalg.norm(cov - Kd) / kscale < tol


@pytest.mark.parametrize("name", list(DIAG_SPECS))
def test_dunder_semantics(name):
    """Vector/dunder conventions match the reference elementwise: 1-D
    ``op @ v`` (squeezed), 1-D ``v @ op`` (rmatmul), ``diagonal()``."""
    bj, bt = DIAG_SPECS[name]
    v = np.random.default_rng(3).standard_normal(48)
    np.testing.assert_allclose(
        np.asarray(bj() @ tj(v)), np.asarray((bt() @ tt(v)).detach()),
        rtol=1e-9, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(tj(v) @ bj()), np.asarray((tt(v) @ bt()).detach()),
        rtol=1e-9, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(bj().diagonal()), np.asarray(bt().diagonal().detach()),
        rtol=1e-10, atol=1e-11,
    )


def test_two_arg_solve_and_sqrt_inv_matmul():
    """The two-argument forms: solve(rhs, lhs) = lhs K^{-1} rhs and
    sqrt_inv_matmul(rhs, lhs) -> (lhs K^{-1/2} rhs, inv_quad diag) match the
    reference elementwise (reference _linear_operator.py:2325-2381,
    2422-2471)."""
    rng = np.random.default_rng(17)
    K = _psd(rng, 12)
    rhs, lhs = rng.standard_normal((12, 3)), rng.standard_normal((2, 12))
    ot, oj = R.DenseLinearOperator(tt(K)), O.DenseLinearOperator(tj(K))

    with _Ctx(rs.max_cholesky_size(800), js.max_cholesky_size(800)):
        st = np.asarray(ot.solve(tt(rhs), tt(lhs)).detach())
        sj = np.asarray(oj.solve(tj(rhs), tj(lhs)))
    np.testing.assert_allclose(sj, st, rtol=1e-10, atol=1e-12)

    with _Ctx(rs.minres_tolerance(1e-10), js.minres_tolerance(1e-10)):
        qt, it_ = ot.sqrt_inv_matmul(tt(rhs), tt(lhs))
        qj, ij = oj.sqrt_inv_matmul(tj(rhs), tj(lhs))
    np.testing.assert_allclose(np.asarray(qj), np.asarray(qt.detach()),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ij), np.asarray(it_.detach()),
                               rtol=1e-7, atol=1e-9)


def test_batch_reductions_prod_sum():
    """prod/sum over a batch dim and sum over a matrix dim match the
    reference (reference _linear_operator.py:2011-2043, 2510-2546)."""
    rng = np.random.default_rng(18)
    K = _psd(rng, 8)
    Kb = np.stack([K, 1.1 * K, 0.7 * K])
    bt, bj = R.DenseLinearOperator(tt(Kb)), O.DenseLinearOperator(tj(Kb))

    pt, pj = bt.prod(dim=-3), bj.prod(-3)
    pt = pt.to_dense().detach() if hasattr(pt, "to_dense") else pt.detach()
    pj = pj.to_dense() if hasattr(pj, "to_dense") else pj
    np.testing.assert_allclose(np.asarray(pj), np.asarray(pt), rtol=1e-10, atol=1e-10)

    st, sj = bt.sum(dim=-3), bj.sum(-3)
    st = st.to_dense().detach() if hasattr(st, "to_dense") else st.detach()
    sj = sj.to_dense() if hasattr(sj, "to_dense") else sj
    np.testing.assert_allclose(np.asarray(sj), np.asarray(st), rtol=1e-12, atol=1e-12)

    np.testing.assert_allclose(
        np.asarray(bj.sum(-1)), np.asarray(bt.sum(dim=-1).detach()),
        rtol=1e-12, atol=1e-12,
    )


@pytest.mark.parametrize("name", list(MVN_SPECS))
def test_zero_mean_mvn_samples_root_path_moments(name):
    """Both libraries' default (root-decomposition) samplers draw from the
    SAME N(0, K): empirical covariance vs the shared dense K.  Expected MC
    Frobenius error ~ sqrt(2/S) ≈ 0.01 at S=2e4; bound 0.06."""
    bj, bt = MVN_SPECS[name]
    S = 20_000
    Kd = np.asarray(bj().to_dense())

    torch.manual_seed(0)
    st = bt().zero_mean_mvn_samples(S).detach()
    _check_moments(st, Kd, 0.06)

    sj = bj().zero_mean_mvn_samples(S, key=jax.random.PRNGKey(3))
    _check_moments(sj, Kd, 0.06)


# ---------------------------------------------------------------------------
# svd / broadcast-rhs solve / cat_rows / add_low_rank
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", list(DIAG_SPECS))
def test_svd_singular_values(name):
    """Sorted singular values agree (U/V only defined up to rotation)."""
    bj, bt = DIAG_SPECS[name]
    _, st, _ = bt().svd()
    _, sj, _ = bj().svd()
    st = np.sort(np.asarray(st.detach()), axis=-1)
    sj = np.sort(np.asarray(sj), axis=-1)
    scale = np.max(st)
    np.testing.assert_allclose(sj / scale, st / scale, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("name", list(DIAG_SPECS))
def test_solve_broadcast_rhs(name):
    """rhs with a LEADING batch dim over a non-batched operator: the
    reference broadcasts the solve over the rhs batch (torch semantics);
    ours must match elementwise."""
    bj, bt = DIAG_SPECS[name]
    rhs = np.random.default_rng(5).standard_normal((4, 48, 2))
    with _Ctx(rs.max_cholesky_size(800), js.max_cholesky_size(800)):
        vt = np.asarray(bt().solve(tt(rhs)).detach())
        vj = np.asarray(bj().solve(tj(rhs)))
    assert vt.shape == vj.shape == (4, 48, 2)
    np.testing.assert_allclose(vj, vt, rtol=1e-7, atol=1e-8)


def test_cat_rows_matches():
    """cat_rows (fantasy update): the catted operator's to_dense AND solve
    agree cross-library under the exact regime (reference
    _linear_operator.py:1152-1308)."""
    rng = np.random.default_rng(21)
    K = _psd(rng, 48)
    A, B, D = K[:40, :40], K[40:, :40], K[40:, 40:]
    rhs = rng.standard_normal((48, 2))

    with _Ctx(rs.max_cholesky_size(800), js.max_cholesky_size(800)):
        ct = R.to_linear_operator(tt(A)).cat_rows(tt(B), tt(D))
        cj = O.to_linear_operator(tj(A)).cat_rows(tj(B), tj(D))
        np.testing.assert_allclose(
            np.asarray(cj.to_dense()), np.asarray(ct.to_dense().detach()),
            rtol=1e-9, atol=1e-10,
        )
        vt = np.asarray(ct.solve(tt(rhs)).detach())
        vj = np.asarray(cj.solve(tj(rhs)))
    np.testing.assert_allclose(vj, vt, rtol=1e-5, atol=1e-7)


def test_add_low_rank_matches():
    """A + V V^T via add_low_rank: to_dense and solve agree cross-library
    (reference _linear_operator.py:1019-1142)."""
    rng = np.random.default_rng(22)
    A = _psd(rng, 48)
    V = rng.standard_normal((48, 4))
    rhs = rng.standard_normal((48, 2))

    with _Ctx(rs.max_cholesky_size(800), js.max_cholesky_size(800)):
        ut = R.to_linear_operator(tt(A)).add_low_rank(tt(V))
        uj = O.to_linear_operator(tj(A)).add_low_rank(tj(V))
        np.testing.assert_allclose(
            np.asarray(uj.to_dense()), np.asarray(ut.to_dense().detach()),
            rtol=1e-9, atol=1e-10,
        )
        vt = np.asarray(ut.solve(tt(rhs)).detach())
        vj = np.asarray(uj.solve(tj(rhs)))
    np.testing.assert_allclose(vj, vt, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("name", list(MVN_SPECS))
def test_zero_mean_mvn_samples_ciq_path_moments(name):
    """CIQ sampling path (settings.ciq_samples): K^{1/2} via contour-integral
    quadrature + shifted MINRES on both sides (reference
    _linear_operator.py:2757-2776)."""
    bj, bt = MVN_SPECS[name]
    S = 8_000
    Kd = np.asarray(bj().to_dense())

    torch.manual_seed(0)
    with _Ctx(rs.ciq_samples(True), rs.minres_tolerance(1e-8)):
        st = bt().zero_mean_mvn_samples(S).detach()
    _check_moments(st, Kd, 0.08)

    with _Ctx(js.ciq_samples(True), js.minres_tolerance(1e-8)):
        sj = bj().zero_mean_mvn_samples(S, key=jax.random.PRNGKey(3))
    _check_moments(sj, Kd, 0.08)
