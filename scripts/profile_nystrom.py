"""CG iterations + wall-clock with Nystrom vs pivoted preconditioning at
N=1e5 on TPU.

Run:  timeout 1800 python scripts/profile_nystrom.py > /tmp/prof_nys.log 2>&1
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

    n, d, m = 100_000, 3, 10
    model = ExactGPRegression(block_rows=8192)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)
    v = jax.random.normal(jax.random.PRNGKey(2), (n, m + 1), jnp.float32)

    def cg_with(mode, rank):
        def f(params, x, v):
            K = model.train_operator(params, x)
            with settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
                 settings.preconditioner_mode(mode), \
                 settings.max_preconditioner_size(rank), \
                 settings.min_preconditioning_size(2000), \
                 settings.max_lanczos_quadrature_iterations(20):
                closure, _, _ = K.detach()._preconditioner()
                res = K._solve_via_cg(v, preconditioner=closure, n_tridiag=m)
            return res.solution, res.num_iters

        return jax.jit(f)

    for mode, rank in [("nystrom", 400), ("nystrom", 1000), ("nystrom", 2000), ("nystrom", 4000)]:
        f = cg_with(mode, rank)
        t0 = time.perf_counter()
        sol, iters = f(params, x, v)
        print(f"{mode}-{rank}: compile+run {time.perf_counter()-t0:.1f}s iters={int(iters)}", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            sol, iters = f(params, x, v)
            _ = float(jnp.sum(sol)), int(iters)
        print(f"{mode}-{rank}: {(time.perf_counter()-t0)/3*1e3:.1f} ms  iters={int(iters)}", flush=True)


if __name__ == "__main__":
    main()
