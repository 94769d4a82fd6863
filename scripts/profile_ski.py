"""Decompose bench config 4b (SKI n=200k on 256x256 grid): where do 433 ms go?

Components per CG iteration: left_t_interp scatter-add (n x 16 -> M),
Kronecker-Toeplitz FFT mat-vec on the grid (M=65k), left_interp gather.

Run: timeout 900 python scripts/profile_ski.py > /tmp/prof_ski.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, runs=5):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(jnp.asarray(out).astype(jnp.float32)))
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s (sum {s:.3e})", flush=True)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
        s = float(jnp.sum(jnp.asarray(out).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / runs
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    from linear_operator_tpu import settings
    from linear_operator_tpu.models.ski import SKIGPRegression, make_grid

    n, gs = 200_000, 256
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_data():
        x = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
        y = jnp.sin(6.0 * x[:, 0]) * jnp.cos(4.0 * x[:, 1])
        return x, y

    x, y = make_data()
    x.block_until_ready()
    grid = make_grid(x, (gs, gs))
    model = SKIGPRegression(grid)
    params = model.init_params(2)

    # 1. full MLL (bench workload)
    def loss_fn(params, x, y):
        with settings.max_cholesky_size(0), settings.num_trace_samples(10), \
             settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.min_preconditioning_size(10**9), \
             settings.max_lanczos_quadrature_iterations(20):
            return model.neg_mll(params, x, y, key=jax.random.PRNGKey(1))

    timed("full_mll", jax.jit(loss_fn), params, x, y, runs=3)

    # 2. how many CG iterations does the solve take?
    from linear_operator_tpu.solvers.linear_cg import linear_cg

    K = model.train_operator(params, x)

    def cg_iters(x, y):
        K = model.train_operator(params, x)
        with settings.max_cg_iterations(100), settings.cg_tolerance(1.0):
            out = linear_cg(K._matmul, y[..., None], max_iter=100)
        return out

    res = jax.jit(lambda x, y: cg_iters(x, y))(x, y)
    print(
        f"cg num_iters={int(res.num_iters)} "
        f"max_resid={float(jnp.max(res.residual_norm)):.3e}",
        flush=True,
    )

    # 3. isolated mat-vec on 11 columns
    v11 = jax.random.normal(jax.random.PRNGKey(2), (n, 11), dtype=jnp.float32)

    def matvec(x, v):
        K = model.train_operator(params, x)
        return K._matmul(v)

    timed("ski_matvec_11col", jax.jit(matvec), x, v11, runs=10)

    # 4. pieces: interp gather / scatter / grid FFT apply
    from linear_operator_tpu.models.ski import linear_interp_weights

    li, lv = linear_interp_weights(x, grid)
    kg = model.grid_operator(params)
    M = kg.shape[-1]
    vg = jax.random.normal(jax.random.PRNGKey(3), (M, 11), dtype=jnp.float32)

    from linear_operator_tpu.utils.sparse import left_interp, left_t_interp

    timed(
        "left_t_interp(scatter n->M)",
        jax.jit(lambda lv, v: left_t_interp(li, lv, v, M)),
        lv,
        v11,
        runs=10,
    )
    timed(
        "grid_kron_fft_matvec",
        jax.jit(lambda vg: kg._matmul(vg)),
        vg,
        runs=10,
    )
    timed(
        "left_interp(gather M->n)",
        jax.jit(lambda lv, vg: left_interp(li, lv, vg)),
        lv,
        vg,
        runs=10,
    )
    print("exit-ok", flush=True)


if __name__ == "__main__":
    main()
