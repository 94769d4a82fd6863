"""Measure the Toeplitz FFT-vs-dense crossover on TPU and its effect on the
SKI (config 4b) and Kronecker-Toeplitz (config 4) benchmarks.

Run: timeout 900 python scripts/profile_toeplitz_cutoff.py > /tmp/prof_tcut.log 2>&1
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


def crossover():
    from linear_operator_tpu import settings
    from linear_operator_tpu.operators import ToeplitzLinearOperator

    for n in (1024, 4096, 16384, 65536):
        col = (2.0 ** (-jnp.arange(n, dtype=jnp.float32))).at[0].add(1.0)
        op = ToeplitzLinearOperator(col)
        rhs = jax.random.normal(jax.random.PRNGKey(1), (n, 11), dtype=jnp.float32)

        def run_fft(col, rhs):
            with settings.toeplitz_fft_min_size(0):
                return ToeplitzLinearOperator(col)._matmul(rhs)

        def run_dense(col, rhs):
            with settings.use_toeplitz(False):
                return ToeplitzLinearOperator(col)._matmul(rhs)

        timed(f"toeplitz_fft(n={n})", jax.jit(run_fft), col, rhs)
        if n <= 16384:
            timed(f"toeplitz_dense(n={n})", jax.jit(run_dense), col, rhs)


def ski_mll():
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

    def loss_fn(params, x, y):
        with settings.max_cholesky_size(0), settings.num_trace_samples(10), \
             settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.min_preconditioning_size(10**9), \
             settings.max_lanczos_quadrature_iterations(20):
            return model.neg_mll(params, x, y, key=jax.random.PRNGKey(1))

    timed("ski_mll_densetoeplitz", jax.jit(loss_fn), params, x, y, runs=3)


def kron_toeplitz():
    import bench

    t0 = time.perf_counter()
    bench.bench_kron_toeplitz()
    print(f"bench_kron_toeplitz total {time.perf_counter()-t0:.1f}s", flush=True)


def main():
    crossover()
    ski_mll()
    kron_toeplitz()
    print("exit-ok", flush=True)


if __name__ == "__main__":
    main()
