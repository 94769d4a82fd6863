"""End-to-end MLL timing with the cached bf16-tile engine + rank sweep.

Run:  timeout 1500 python scripts/profile_mll.py > /tmp/prof_mll.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from linear_operator_tpu import settings
    from linear_operator_tpu.models import ExactGPRegression

    n, d, num_probes = 100_000, 3, 10
    model = ExactGPRegression(block_rows=8192)
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    def make_loss(rank):
        def loss_fn(params, x, y):
            with settings.max_cholesky_size(0), settings.num_trace_samples(num_probes), \
                 settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
                 settings.max_preconditioner_size(rank), \
                 settings.min_preconditioning_size(2000), \
                 settings.max_lanczos_quadrature_iterations(20):
                return model.neg_mll(params, x, y, key=jax.random.PRNGKey(1))

        return jax.jit(loss_fn)

    for rank in (200, 400, 300):
        fn = make_loss(rank)
        t0 = time.perf_counter()
        out = float(fn(params, x, y))
        print(f"rank {rank}: compile+run {time.perf_counter()-t0:.1f}s out={out:.6f}", flush=True)
        t0 = time.perf_counter()
        runs = 3
        for _ in range(runs):
            out = float(fn(params, x, y))
        dt = (time.perf_counter() - t0) / runs
        print(f"rank {rank}: {dt*1e3:.1f} ms/solve = {1/dt:.3f} solves/s (out={out:.6f})", flush=True)


if __name__ == "__main__":
    main()
