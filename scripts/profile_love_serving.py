"""Cached (LOVE) prediction throughput at N=1e5 on TPU.

Measures the steady-state serving rate of `posterior_from_cache` — the
constant-time-per-query LOVE contract — vs the uncached one-batched-CG
`posterior` (bench config 3c).  Query batches of m=64 and m=1024.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.models import ExactGPRegression


def main(n=100_000, d=3):
    model = ExactGPRegression(block_rows=8192)
    kx, ky, ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    def build_cache(params, x, y):
        with settings.max_cholesky_size(0), settings.max_cg_iterations(100), \
             settings.cg_tolerance(1.0), settings.preconditioner_mode("nystrom"), \
             settings.max_preconditioner_size(400), \
             settings.min_preconditioning_size(2000), \
             settings.max_root_decomposition_size(100):
            return model.posterior_cache(params, x, y, key=jax.random.PRNGKey(2))

    t0 = time.perf_counter()
    cache = jax.jit(build_cache)(params, x, y)
    float(jnp.sum(cache.alpha))
    t_cache = time.perf_counter() - t0
    print(f"cache build (incl. compile): {t_cache:.2f} s; root_inv k={cache.root_inv.shape[-1]}")

    def predict(params, x, cache, x_star):
        mean, var = model.posterior_from_cache(params, x, cache, x_star)
        return jnp.sum(mean) + jnp.sum(var)

    fn = jax.jit(predict)
    for m in (64, 1024):
        x_star = jax.random.normal(ks, (m, d), dtype=jnp.float32)
        float(fn(params, x, cache, x_star))  # compile + warm
        n_runs = 5
        t0 = time.perf_counter()
        for _ in range(n_runs):
            float(fn(params, x, cache, x_star))
        dt = (time.perf_counter() - t0) / n_runs
        print(
            f"m={m}: {dt*1e3:.1f} ms/batch = {m/dt:.0f} points/s "
            f"({1.0/dt:.2f} batches/s)"
        )


if __name__ == "__main__":
    main()
