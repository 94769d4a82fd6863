"""GridInterpolatedLinearOperator and the one-hot grid-interp kernels.

The grid engine must match the flat gather/scatter formulation exactly
(same W, reference utils/interpolation.py:9-81) while using only dense
one-hot MXU contractions (utils/grid_interp.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.operators import (
    DenseLinearOperator,
    GridInterpolatedLinearOperator,
    InterpolatedLinearOperator,
    KroneckerProductLinearOperator,
    ToeplitzLinearOperator,
)
from linear_operator_tpu.models.ski import (
    SKIGPRegression,
    linear_interp_weights,
    linear_interp_weights_per_dim,
    make_grid,
)
from linear_operator_tpu.test import BaseTestCase, LinearOperatorTestCase
from linear_operator_tpu.utils.grid_interp import (
    flatten_grid_interp,
    grid_matmul,
    grid_t_matmul,
)
from linear_operator_tpu.utils.sparse import left_interp, left_t_interp


def _random_stencils(key, sizes, n, dtype=jnp.float64):
    ks = jax.random.split(key, 2 * len(sizes))
    idx = tuple(
        jax.random.randint(ks[2 * d], (n, 2), 0, sizes[d]) for d in range(len(sizes))
    )
    val = tuple(
        jax.random.normal(ks[2 * d + 1], (n, 2), dtype=dtype)
        for d in range(len(sizes))
    )
    return idx, val


class TestGridInterpKernels(BaseTestCase):
    def test_matches_flat_all_dims(self):
        for seed, sizes in ((0, (7,)), (1, (6, 5)), (2, (4, 3, 5))):
            key = jax.random.PRNGKey(seed)
            n, t, M = 23, 4, int(np.prod(sizes))
            idx, val = _random_stencils(key, sizes, n)
            fi, fv = flatten_grid_interp(idx, val, sizes)
            g = jax.random.normal(jax.random.PRNGKey(seed + 10), (M, t), jnp.float64)
            v = jax.random.normal(jax.random.PRNGKey(seed + 20), (n, t), jnp.float64)
            self.assertAllClose(
                grid_matmul(idx, val, g, sizes), left_interp(fi, fv, g), atol=1e-12
            )
            self.assertAllClose(
                grid_t_matmul(idx, val, v, sizes),
                left_t_interp(fi, fv, v, M),
                atol=1e-12,
            )

    def test_blocking_pads_correctly(self):
        sizes = (5, 4)
        key = jax.random.PRNGKey(3)
        n, t, M = 37, 3, 20
        idx, val = _random_stencils(key, sizes, n)
        fi, fv = flatten_grid_interp(idx, val, sizes)
        g = jax.random.normal(jax.random.PRNGKey(13), (M, t), jnp.float64)
        v = jax.random.normal(jax.random.PRNGKey(23), (n, t), jnp.float64)
        for block in (256, 512):  # block > n exercises the pad path
            self.assertAllClose(
                grid_matmul(idx, val, g, sizes, block=block),
                left_interp(fi, fv, g),
                atol=1e-12,
            )
            self.assertAllClose(
                grid_t_matmul(idx, val, v, sizes, block=block),
                left_t_interp(fi, fv, v, M),
                atol=1e-12,
            )

    def test_gradients_match_flat(self):
        sizes = (6, 5)
        key = jax.random.PRNGKey(4)
        n, t, M = 11, 2, 30
        idx, val = _random_stencils(key, sizes, n)
        g = jax.random.normal(jax.random.PRNGKey(14), (M, t), jnp.float64)

        def loss_grid(val):
            return jnp.sum(grid_matmul(idx, val, g, sizes) ** 2)

        def loss_flat(val):
            fi, fv = flatten_grid_interp(idx, val, sizes)
            return jnp.sum(left_interp(fi, fv, g) ** 2)

        g1 = jax.grad(loss_grid)(val)
        g2 = jax.grad(loss_flat)(val)
        for a, b in zip(g1, g2):
            self.assertAllClose(a, b, atol=1e-10)


class TestGridInterpolatedOperator(BaseTestCase):
    def _make(self, sizes, n_l, n_r, seed=0):
        key = jax.random.PRNGKey(seed)
        M = int(np.prod(sizes))
        li, lv = _random_stencils(jax.random.fold_in(key, 0), sizes, n_l)
        ri, rv = _random_stencils(jax.random.fold_in(key, 1), sizes, n_r)
        a = jax.random.normal(jax.random.fold_in(key, 2), (M, M), jnp.float64)
        base = DenseLinearOperator(a @ a.T + M * jnp.eye(M, dtype=jnp.float64))
        return GridInterpolatedLinearOperator(base, li, lv, ri, rv, sizes)

    def test_matmul_matches_flat(self):
        op = self._make((6, 5), 13, 9)
        flat = op.flat()
        rhs = jax.random.normal(jax.random.PRNGKey(5), (9, 3), jnp.float64)
        self.assertAllClose(op._matmul(rhs), flat._matmul(rhs), atol=1e-12)
        lhs = jax.random.normal(jax.random.PRNGKey(6), (13, 2), jnp.float64)
        self.assertAllClose(op._t_matmul(lhs), flat._t_matmul(lhs), atol=1e-12)
        self.assertAllClose(op.to_dense(), flat.to_dense(), atol=1e-12)

    def test_batched_rhs_folds(self):
        op = self._make((4, 3, 5), 11, 8, seed=1)
        rhs = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 8, 4), jnp.float64)
        self.assertAllClose(op._matmul(rhs), op.flat()._matmul(rhs), atol=1e-12)

    def test_getitem_stays_lazy(self):
        op = self._make((6, 5), 13, 13)
        sub = op[2:9, 3:11]
        assert isinstance(sub, GridInterpolatedLinearOperator)
        self.assertAllClose(sub.to_dense(), op.to_dense()[2:9, 3:11], atol=1e-12)
        idx = jnp.asarray([5, 1, 2])
        self.assertAllClose(
            op[idx, :].to_dense(), op.to_dense()[idx, :], atol=1e-12
        )

    def test_ski_model_uses_grid_operator(self):
        x = jax.random.uniform(jax.random.PRNGKey(8), (40, 2), jnp.float64)
        y = jnp.sin(3 * x[:, 0])
        grid = make_grid(x, (8, 9))
        model = SKIGPRegression(grid)
        params = model.init_params(2, dtype=jnp.float64)
        K = model.covariance(params, x)
        assert isinstance(K, GridInterpolatedLinearOperator)
        li, lv = linear_interp_weights(x, grid)
        flat = InterpolatedLinearOperator(model.grid_operator(params), li, lv, li, lv)
        self.assertAllClose(K.to_dense(), flat.to_dense(), atol=1e-12)
        # MLL + gradient run end-to-end through the one-hot engine
        val, grads = jax.value_and_grad(lambda p: model.neg_mll(p, x, y))(params)
        assert np.isfinite(float(val))
        assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)

    def test_per_dim_weights_match_flat_fold(self):
        x = jax.random.uniform(jax.random.PRNGKey(9), (17, 3), jnp.float64)
        grid = make_grid(x, (5, 6, 7))
        di, dv = linear_interp_weights_per_dim(x, grid)
        fi, fv = flatten_grid_interp(di, dv, grid.sizes)
        ri, rv = linear_interp_weights(x, grid)
        self.assertAllClose(fi, ri)
        self.assertAllClose(fv, rv, atol=1e-14)


class TestGridInterpolatedHarness(LinearOperatorTestCase):
    """Full property harness (PSD W K W^T + jitter, 2-D grid)."""

    seed = 0
    should_call_lanczos = True

    def create_linear_op(self):
        sizes, n = (4, 5), 6
        M = 20
        a = jax.random.normal(jax.random.PRNGKey(30), (M, M), dtype=jnp.float64)
        base = DenseLinearOperator(a @ a.T + M * jnp.eye(M, dtype=jnp.float64))
        li = (
            jnp.asarray([[0, 1], [1, 2], [2, 3], [0, 2], [1, 3], [2, 0]], jnp.int32),
            jnp.asarray([[0, 1], [1, 2], [2, 3], [3, 4], [0, 3], [4, 1]], jnp.int32),
        )
        lv = tuple(
            jnp.abs(jax.random.normal(jax.random.PRNGKey(31 + d), (n, 2), dtype=jnp.float64))
            + 0.5
            for d in range(2)
        )
        return GridInterpolatedLinearOperator(base, li, lv, li, lv, sizes).add_jitter(
            1.0
        )

    def evaluate_linear_op(self, op):
        interp = op.operators[0] if hasattr(op, "operators") else op
        base = interp.base.to_dense()

        def w_dense(indices, values):
            fi, fv = flatten_grid_interp(indices, values, interp.sizes)
            w = jnp.zeros((6, 20), fv.dtype)
            row_ids = jnp.broadcast_to(jnp.arange(6)[:, None], fi.shape)
            return w.at[row_ids, fi].add(fv)

        wl = w_dense(interp.left_indices, interp.left_values)
        wr = w_dense(interp.right_indices, interp.right_values)
        dense = wl @ base @ wr.T
        return dense + jnp.diag(op.operators[1]._diagonal())


class TestSKIGridToeplitzBase(BaseTestCase):
    def test_kron_toeplitz_base_end_to_end(self):
        # the actual SKI composition: W kron(Toeplitz) W^T matvec vs dense
        x = jax.random.uniform(jax.random.PRNGKey(40), (25, 2), jnp.float64)
        grid = make_grid(x, (6, 5))
        model = SKIGPRegression(grid)
        params = model.init_params(2, dtype=jnp.float64)
        K = model.covariance(params, x)
        kg = model.grid_operator(params)
        assert isinstance(kg, KroneckerProductLinearOperator)
        assert isinstance(kg.operators[0], ToeplitzLinearOperator)
        rhs = jax.random.normal(jax.random.PRNGKey(41), (25, 3), jnp.float64)
        self.assertAllClose(
            K._matmul(rhs), K.to_dense() @ rhs, atol=1e-10
        )


class TestCubicInterp(BaseTestCase):
    def test_weights_sum_to_one_and_clamp(self):
        from linear_operator_tpu.models.ski import cubic_interp_weights_per_dim

        x = jax.random.uniform(jax.random.PRNGKey(50), (200, 2), jnp.float64)
        grid = make_grid(x, (9, 7))
        di, dv = cubic_interp_weights_per_dim(x, grid)
        for d in range(2):
            assert di[d].shape == (200, 4)
            self.assertAllClose(
                jnp.sum(dv[d], axis=-1), jnp.ones(200, jnp.float64), atol=1e-12
            )
            assert int(jnp.min(di[d])) >= 0
            assert int(jnp.max(di[d])) < grid.sizes[d]

    def test_cubic_reproduces_quadratics_interior(self):
        # Keys a=-0.5 interpolation reproduces quadratics exactly (interior)
        # and is third-order accurate in general (Keys 1981, Thm 2)
        from linear_operator_tpu.models.ski import (
            GridSpec,
            cubic_interp_weights_per_dim,
        )

        m = 33
        grid = GridSpec(
            mins=jnp.zeros((1,), jnp.float64),
            maxs=jnp.ones((1,), jnp.float64),
            sizes=(m,),
        )
        xs = jnp.linspace(0.15, 0.85, 41)[:, None]
        (idx,), (w,) = cubic_interp_weights_per_dim(xs, grid)
        g = jnp.linspace(0.0, 1.0, m)
        f = lambda t: 2.0 * t**2 - t + 0.3
        interp = jnp.sum(w * f(g)[idx], axis=-1)
        self.assertAllClose(interp, f(xs[:, 0]), atol=1e-12)
        fc = lambda t: 2.0 * t**3 - t**2 + 0.5 * t - 0.3
        interp_c = jnp.sum(w * fc(g)[idx], axis=-1)
        self.assertAllClose(interp_c, fc(xs[:, 0]), atol=1e-4)  # O(h^3)

    def test_cubic_beats_linear_on_smooth_function(self):
        x = jax.random.uniform(jax.random.PRNGKey(51), (300, 1), jnp.float64)
        grid = make_grid(x, (16,))
        f = lambda t: jnp.sin(4.0 * t)
        g = jnp.linspace(float(grid.mins[0]), float(grid.maxs[0]), 16)
        fg = f(g)

        from linear_operator_tpu.models.ski import cubic_interp_weights_per_dim

        (li,), (lw,) = linear_interp_weights_per_dim(x, grid)
        (ci,), (cw,) = cubic_interp_weights_per_dim(x, grid)
        err_lin = jnp.max(jnp.abs(jnp.sum(lw * fg[li], -1) - f(x[:, 0])))
        err_cub = jnp.max(jnp.abs(jnp.sum(cw * fg[ci], -1) - f(x[:, 0])))
        assert float(err_cub) < 0.2 * float(err_lin), (err_lin, err_cub)

    def test_ski_cubic_end_to_end(self):
        x = jax.random.uniform(jax.random.PRNGKey(52), (40, 2), jnp.float64)
        y = jnp.sin(3 * x[:, 0])
        grid = make_grid(x, (8, 9))
        model = SKIGPRegression(grid, interp="cubic")
        params = model.init_params(2, dtype=jnp.float64)
        K = model.covariance(params, x)
        assert isinstance(K, GridInterpolatedLinearOperator)
        dense = K.to_dense()
        self.assertAllClose(dense, dense.T, atol=1e-12)
        val, grads = jax.value_and_grad(lambda p: model.neg_mll(p, x, y))(params)
        assert np.isfinite(float(val))

        # cubic SKI approximates the exact RBF kernel better than linear
        ls = jax.nn.softplus(params.raw_lengthscale) + 1e-6
        os_ = jax.nn.softplus(params.raw_outputscale) + 1e-6
        diff = (x[:, None, :] - x[None, :, :]) / ls
        K_exact = os_ * jnp.exp(-0.5 * jnp.sum(diff**2, axis=-1))
        lin = SKIGPRegression(grid, interp="linear")
        K_lin = lin.covariance(params, x).to_dense()
        err_cub = float(jnp.max(jnp.abs(dense - K_exact)))
        err_lin = float(jnp.max(jnp.abs(K_lin - K_exact)))
        # coarse 8x9 grid: cubic ~1.8x better; the gap widens with grid size
        assert err_cub < 0.7 * err_lin, (err_lin, err_cub)
