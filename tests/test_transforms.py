"""Transform robustness: operators as pytrees under jit / vmap / grad-of-vmap.

This is the architectural payoff of pytree operators — the reference cannot
do any of these (torch modules aren't functorch-transparent for its Functions).
"""

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    DenseLinearOperator,
    DiagLinearOperator,
    LowRankRootLinearOperator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=10):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


class TestTransforms(BaseTestCase):
    def test_operator_as_jit_argument(self):
        op = DenseLinearOperator(_psd(self.key))
        b = jax.random.normal(self.key, (10, 2), dtype=jnp.float64)

        @jax.jit
        def f(op, b):
            return op.solve(b)

        x = f(op, b)
        self.assertAllClose(op.to_dense() @ x, b, rtol=1e-7, atol=1e-7)

    def test_operator_as_jit_return(self):
        @jax.jit
        def build(d):
            return DiagLinearOperator(d).add_jitter(0.5)

        d = jnp.abs(jax.random.normal(self.key, (6,), dtype=jnp.float64)) + 1
        op = build(d)
        self.assertAllClose(op.diagonal(), d + 0.5, rtol=1e-12, atol=1e-12)

    def test_vmap_over_operator_leaves(self):
        Ks = _psd(self.key, 4)  # (4, 10, 10)
        bs = jax.random.normal(self.key, (4, 10), dtype=jnp.float64)

        def solve_one(K, b):
            return DenseLinearOperator(K).solve(b)

        xs = jax.vmap(solve_one)(Ks, bs)
        self.assertAllClose(
            xs, jnp.linalg.solve(Ks, bs[..., None])[..., 0], rtol=1e-7, atol=1e-7
        )

    def test_grad_of_vmap_logdet(self):
        Ks = _psd(self.key, 3, n=8)

        def total_logdet(Ks):
            def one(K):
                with settings.fast_computations(log_prob=False):
                    return DenseLinearOperator(K).logdet()

            return jnp.sum(jax.vmap(one)(Ks))

        g = jax.grad(total_logdet)(Ks)
        g_true = jax.grad(lambda Ks: jnp.sum(jnp.linalg.slogdet(Ks)[1]))(Ks)
        self.assertAllClose(g, g_true, rtol=1e-7, atol=1e-7)

    def test_vmap_woodbury(self):
        U = jax.random.normal(self.key, (5, 20, 3), dtype=jnp.float64)
        b = jax.random.normal(self.key, (5, 20), dtype=jnp.float64)

        def solve_one(U, b):
            op = LowRankRootLinearOperator(DenseLinearOperator(U)).add_diagonal(
                jnp.asarray(0.5, dtype=jnp.float64)
            )
            return op.solve(b)

        xs = jax.vmap(solve_one)(U, b)
        Ks = jnp.einsum("bik,bjk->bij", U, U) + 0.5 * jnp.eye(20)
        self.assertAllClose(
            xs, jnp.linalg.solve(Ks, b[..., None])[..., 0], rtol=1e-8, atol=1e-8
        )

    def test_jit_cg_path(self):
        K = _psd(self.key, n=40)
        b = jax.random.normal(self.key, (40, 2), dtype=jnp.float64)

        @jax.jit
        def f(K, b):
            op = DenseLinearOperator(K)
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
                 settings.max_cg_iterations(200):
                return op.solve(b)

        x = f(K, b)
        self.assertAllClose(x, jnp.linalg.solve(K, b), rtol=1e-7, atol=1e-7)
