"""Toeplitz function family vs dense ground truth (reference:
test/utils/test_toeplitz.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.test.base_test_case import BaseTestCase
from linear_operator_tpu.utils.toeplitz import (
    sym_toeplitz,
    sym_toeplitz_derivative_quadratic_form,
    sym_toeplitz_getitem,
    sym_toeplitz_matmul,
    toeplitz,
    toeplitz_getitem,
    toeplitz_matmul,
)


def _dense_toeplitz(c, r):
    n = c.shape[-1]
    out = np.empty((*c.shape[:-1], n, n), dtype=np.asarray(c).dtype)
    cn, rn = np.asarray(c), np.asarray(r)
    for i in range(n):
        for j in range(n):
            out[..., i, j] = cn[..., i - j] if i >= j else rn[..., j - i]
    return out


class TestToeplitz(BaseTestCase):
    def _cr(self, key, n=7, batch=()):
        kc, kr = jax.random.split(key)
        c = jax.random.normal(kc, (*batch, n), dtype=jnp.float64)
        r = jax.random.normal(kr, (*batch, n), dtype=jnp.float64)
        r = r.at[..., 0].set(c[..., 0])  # T[0,0] consistency
        return c, r

    def test_toeplitz_dense(self):
        c, r = self._cr(self.key)
        self.assertAllClose(toeplitz(c, r), jnp.asarray(_dense_toeplitz(c, r)))
        self.assertAllClose(sym_toeplitz(c), jnp.asarray(_dense_toeplitz(c, c)))

    def test_toeplitz_dense_batched(self):
        c, r = self._cr(self.key, n=5, batch=(3,))
        self.assertAllClose(toeplitz(c, r), jnp.asarray(_dense_toeplitz(c, r)))

    def test_getitem(self):
        c, r = self._cr(self.key)
        T = _dense_toeplitz(c, r)
        for i, j in [(0, 0), (3, 1), (1, 4), (6, 6), (0, 6)]:
            self.assertAllClose(toeplitz_getitem(c, r, i, j), jnp.asarray(T[i, j]))
            self.assertAllClose(
                sym_toeplitz_getitem(c, i, j), jnp.asarray(_dense_toeplitz(c, c)[i, j])
            )

    def test_matmul_matches_dense(self):
        c, r = self._cr(self.key, n=9)
        v = jax.random.normal(jax.random.PRNGKey(7), (9, 3), dtype=jnp.float64)
        self.assertAllClose(
            toeplitz_matmul(c, r, v),
            jnp.asarray(_dense_toeplitz(c, r)) @ v,
            rtol=1e-10,
            atol=1e-10,
        )
        # vector rhs
        self.assertAllClose(
            toeplitz_matmul(c, r, v[:, 0]),
            jnp.asarray(_dense_toeplitz(c, r)) @ v[:, 0],
            rtol=1e-10,
            atol=1e-10,
        )
        self.assertAllClose(
            sym_toeplitz_matmul(c, v),
            jnp.asarray(_dense_toeplitz(c, c)) @ v,
            rtol=1e-10,
            atol=1e-10,
        )

    def test_matmul_batched_matches_dense(self):
        c, r = self._cr(self.key, n=6, batch=(2,))
        v = jax.random.normal(jax.random.PRNGKey(8), (2, 6, 2), dtype=jnp.float64)
        self.assertAllClose(
            toeplitz_matmul(c, r, v),
            jnp.einsum("bij,bjt->bit", jnp.asarray(_dense_toeplitz(c, r)), v),
            rtol=1e-10,
            atol=1e-10,
        )

    def test_derivative_quadratic_form(self):
        """res[i] = sum_j u[j]^T (dT/dc_i) v[j] vs an explicit loop over the
        ones-on-the-i-th-diagonals derivative matrices (reference
        utils/toeplitz.py:164-204)."""
        n, s = 6, 3
        ku, kv = jax.random.split(self.key)
        u = jax.random.normal(ku, (n, s), dtype=jnp.float64)
        v = jax.random.normal(kv, (n, s), dtype=jnp.float64)
        expected = np.zeros(n)
        for i in range(n):
            dT = np.zeros((n, n))
            idx = np.arange(n - i)
            dT[idx + i, idx] = 1.0
            dT[idx, idx + i] = 1.0
            if i == 0:
                dT = np.eye(n)
            expected[i] = np.sum(np.asarray(u) * (dT @ np.asarray(v)))
        res = sym_toeplitz_derivative_quadratic_form(u, v)
        self.assertAllClose(res, jnp.asarray(expected), rtol=1e-9, atol=1e-9)

    def test_derivative_quadratic_form_vector(self):
        n = 5
        ku, kv = jax.random.split(self.key)
        u = jax.random.normal(ku, (n,), dtype=jnp.float64)
        v = jax.random.normal(kv, (n,), dtype=jnp.float64)

        def qform(c):
            return jnp.sum(u * sym_toeplitz_matmul(c, v[:, None])[:, 0])

        c0 = jax.random.normal(jax.random.PRNGKey(3), (n,), dtype=jnp.float64)
        self.assertAllClose(
            sym_toeplitz_derivative_quadratic_form(u, v),
            jax.grad(qform)(c0),  # linear in c: gradient is constant
            rtol=1e-9,
            atol=1e-9,
        )

    def test_shape_mismatch_raises(self):
        c = jnp.zeros(4)
        r = jnp.zeros(5)
        with self.assertRaises(ValueError):
            toeplitz(c, r)
        with self.assertRaises(ValueError):
            toeplitz_matmul(c, r, jnp.zeros((4, 1)))
