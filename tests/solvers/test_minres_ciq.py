"""Unit tests for shifted MINRES and contour-integral quadrature (reference:
test/utils/test_minres.py, test_contour_integral_quad.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.operators import DenseLinearOperator
from linear_operator_tpu.solvers.contour_integral_quad import (
    ciq_shifts_weights,
    contour_integral_quad,
    ellipj,
    ellipk_agm,
)
from linear_operator_tpu.solvers.minres import minres
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=40, cond=50.0):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    q, _ = jnp.linalg.qr(a)
    evals = jnp.logspace(0, np.log10(cond), n, dtype=jnp.float64)
    return (q * evals) @ jnp.swapaxes(q, -1, -2)


class TestMinres(BaseTestCase):
    def test_unshifted(self):
        K = _psd(self.key)
        b = jax.random.normal(self.key, (40, 3), dtype=jnp.float64)
        x = jax.jit(
            lambda K, b: minres(lambda v: K @ v, b, max_iter=300, tolerance=1e-12)
        )(K, b)
        self.assertAllClose(x, jnp.linalg.solve(K, b), rtol=1e-6, atol=1e-6)

    def test_shifted_batch_of_shifts(self):
        K = _psd(self.key, n=30)
        b = jax.random.normal(self.key, (30, 2), dtype=jnp.float64)
        shifts = jnp.asarray([0.0, 0.5, 3.0], dtype=jnp.float64)
        xs = jax.jit(
            lambda K, b: minres(
                lambda v: K @ v, b, shifts=shifts, max_iter=300, tolerance=1e-12
            )
        )(K, b)
        self.assertEqual(xs.shape, (3, 30, 2))
        for i, s in enumerate(shifts):
            expected = jnp.linalg.solve(K + s * jnp.eye(30), b)
            self.assertAllClose(xs[i], expected, rtol=1e-6, atol=1e-6)

    def test_vector_rhs(self):
        K = _psd(self.key, n=20)
        b = jax.random.normal(self.key, (20,), dtype=jnp.float64)
        x = jax.jit(
            lambda K, b: minres(lambda v: K @ v, b, max_iter=200, tolerance=1e-12)
        )(K, b)
        self.assertEqual(x.shape, (20,))
        self.assertAllClose(x, jnp.linalg.solve(K, b), rtol=1e-6, atol=1e-6)


class TestEllipticFunctions(BaseTestCase):
    def test_against_scipy(self):
        from scipy import special

        for m in (0.01, 0.3, 0.9):
            self.assertAllClose(
                ellipk_agm(jnp.asarray(m, jnp.float64)),
                special.ellipk(m),
                rtol=1e-12,
                atol=1e-12,
            )
            for u in (0.2, 0.9, 1.7):
                sn, cn, dn = ellipj(
                    jnp.asarray(u, jnp.float64), jnp.asarray(m, jnp.float64)
                )
                ssn, scn, sdn, _ = special.ellipj(u, m)
                self.assertAllClose(sn, ssn, rtol=1e-10, atol=1e-10)
                self.assertAllClose(cn, scn, rtol=1e-10, atol=1e-10)
                self.assertAllClose(dn, sdn, rtol=1e-10, atol=1e-10)


class TestCIQ(BaseTestCase):
    def test_quadrature_identity(self):
        K = np.asarray(_psd(self.key, n=30, cond=100.0))
        evals, evecs = np.linalg.eigh(K)
        b = np.asarray(jax.random.normal(self.key, (30,), dtype=jnp.float64))
        target = evecs @ ((evecs.T @ b) / np.sqrt(evals))
        shifts, weights = ciq_shifts_weights(
            jnp.asarray(evals.min()), jnp.asarray(evals.max()), 15
        )
        approx = sum(
            float(w) * np.linalg.solve(K + float(s) * np.eye(30), b)
            for s, w in zip(shifts, weights)
        )
        self.assertAllClose(approx, target, rtol=1e-8, atol=1e-8)

    def test_sqrt_inv_matmul_end_to_end(self):
        from linear_operator_tpu import settings

        K = _psd(self.key, n=32, cond=30.0)
        b = jax.random.normal(self.key, (32, 2), dtype=jnp.float64)
        # default minres_tolerance (1e-4) bounds accuracy; tighten for test
        with settings.minres_tolerance(1e-12), settings.num_contour_quadrature(20):
            out = jax.jit(lambda K, b: DenseLinearOperator(K).sqrt_inv_matmul(b))(K, b)
        evals, evecs = jnp.linalg.eigh(K)
        target = evecs @ ((evecs.T @ b) / jnp.sqrt(evals)[:, None])
        self.assertAllClose(out, target, rtol=1e-5, atol=1e-6)

    def test_sqrt_inv_matmul_grad(self):
        K = _psd(self.key, n=16, cond=10.0)
        b = jax.random.normal(self.key, (16, 1), dtype=jnp.float64)

        def f_lazy(s):
            return jnp.sum(DenseLinearOperator(K * s).sqrt_inv_matmul(b) ** 2)

        def f_dense(s):
            evals, evecs = jnp.linalg.eigh(K * s)
            t = evecs @ ((evecs.T @ b) / jnp.sqrt(evals)[:, None])
            return jnp.sum(t**2)

        ga = jax.grad(f_lazy)(1.1)
        ge = jax.grad(f_dense)(1.1)
        self.assertAllClose(ga, ge, rtol=1e-3, atol=1e-3)

    def test_ciq_sampling(self):
        from linear_operator_tpu import settings

        K = _psd(self.key, n=24, cond=10.0)
        op = DenseLinearOperator(K)
        with settings.ciq_samples(True):
            samples = op.zero_mean_mvn_samples(30000, key=self.key)
        emp = jnp.einsum("si,sj->ij", samples, samples) / samples.shape[0]
        scale = jnp.max(jnp.abs(K))
        self.assertAllClose(emp / scale, K / scale, rtol=0.3, atol=0.1)
