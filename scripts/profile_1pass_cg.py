"""Does a 1-pass bf16 contraction (v rounded once per mat-vec) break CG?

Compares preconditioned CG iterations and solutions with the cached tile
engine at passes=1 vs passes=2, N=1e5.

Run:  timeout 1800 python scripts/profile_1pass_cg.py > /tmp/prof_1p.log 2>&1
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
    from linear_operator_tpu.ops.rbf import rbf_build_sym_tiles, rbf_matvec_sym_cached
    from linear_operator_tpu.solvers.linear_cg import linear_cg

    n, d, m = 100_000, 3, 10
    model = ExactGPRegression(block_rows=8192)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    params = model.init_params(d)
    v = jax.random.normal(jax.random.PRNGKey(2), (n, m + 1), jnp.float32)

    def cg(params, x, v, passes):
        K = model.train_operator(params, x)
        kern = K.operators[0]
        ls = jax.nn.softplus(params.raw_lengthscale) + 1e-6
        os_ = jax.nn.softplus(params.raw_outputscale) + 1e-6
        noise = jax.nn.softplus(params.raw_noise) + 1e-6
        xs = (x / ls).astype(jnp.float32)
        tiles = rbf_build_sym_tiles(xs, 1024)

        def mm(rhs):
            return os_ * rbf_matvec_sym_cached(tiles, rhs, n, 1024, passes) + noise * rhs

        with settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.preconditioner_mode("nystrom"), \
             settings.max_preconditioner_size(400), \
             settings.min_preconditioning_size(2000), \
             settings.max_lanczos_quadrature_iterations(20):
            closure, _, _ = K.detach()._preconditioner()
            res = linear_cg(mm, v, preconditioner=closure, n_tridiag=m)
        return res.solution, res.num_iters, res.residual_norm

    sols = {}
    for passes in (2, 1):
        f = jax.jit(lambda p_, x_, v_, ps=passes: cg(p_, x_, v_, ps))
        t0 = time.perf_counter()
        sol, iters, resid = f(params, x, v)
        print(f"p{passes}: compile+run {time.perf_counter()-t0:.1f}s "
              f"iters={int(iters)} max_resid={float(jnp.max(resid)):.3e}", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            sol, iters, resid = f(params, x, v)
            _ = float(jnp.sum(sol))
        print(f"p{passes}: {(time.perf_counter()-t0)/3*1e3:.1f} ms  iters={int(iters)}",
              flush=True)
        sols[passes] = sol
    diff = float(
        jnp.linalg.norm(sols[1] - sols[2]) / jnp.linalg.norm(sols[2])
    )
    print(f"solution rel diff p1 vs p2: {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
