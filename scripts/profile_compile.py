"""Attribute the bench graph's compile time to subgraphs (lower+compile
timings, no execution).

Run:  timeout 1700 python scripts/profile_compile.py > /tmp/prof_compile.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def ctime(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"{name}: compile {time.perf_counter()-t0:.1f}s", flush=True)


def main():
    from linear_operator_tpu import settings
    from linear_operator_tpu.models import ExactGPRegression
    from linear_operator_tpu.operators.added_diag import nystrom_factor
    from linear_operator_tpu.solvers.lanczos import lanczos_tridiag_to_diag
    from linear_operator_tpu.solvers.stochastic_lq import slq_quadrature

    n, d, m = 100_000, 3, 10
    model = ExactGPRegression(block_rows=8192)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)
    v = jax.random.normal(jax.random.PRNGKey(2), (n, m + 1), jnp.float32)

    ctx = lambda: settings.max_cholesky_size(0)

    def nys(params, x):
        K = model.train_operator(params, x)
        with settings.max_preconditioner_size(400):
            return nystrom_factor(K.operators[0], rank=400)

    ctime("nystrom_factor(400)", nys, params, x)

    def probes_fn(params, x):
        K = model.train_operator(params, x)
        with settings.preconditioner_mode("nystrom"), \
             settings.max_preconditioner_size(400), \
             settings.min_preconditioning_size(2000):
            _, pop, _ = K.detach()._preconditioner()
            return pop.zero_mean_mvn_samples(m, key=jax.random.PRNGKey(1))

    ctime("probes", probes_fn, params, x)

    def cg_fn(params, x, v):
        K = model.train_operator(params, x)
        with settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.preconditioner_mode("nystrom"), \
             settings.max_preconditioner_size(400), \
             settings.min_preconditioning_size(2000), \
             settings.max_lanczos_quadrature_iterations(20):
            closure, _, _ = K.detach()._preconditioner()
            res = K._solve_via_cg(v, preconditioner=closure, n_tridiag=m)
        return res.solution, res.t_mats

    ctime("cg_with_tridiag", cg_fn, params, x, v)

    def slq_fn(t_mats):
        evals, evecs = lanczos_tridiag_to_diag(t_mats)
        (ld,) = slq_quadrature(n, evals, evecs, [jnp.log])
        return ld

    tm = jnp.eye(20, dtype=jnp.float32)[None].repeat(m, 0)
    ctime("slq_eigh20", slq_fn, tm)

    def full(params, x, y):
        with settings.max_cholesky_size(0), settings.num_trace_samples(m), \
             settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.preconditioner_mode("nystrom"), \
             settings.max_preconditioner_size(400), \
             settings.min_preconditioning_size(2000), \
             settings.max_lanczos_quadrature_iterations(20):
            return model.neg_mll(params, x, y, key=jax.random.PRNGKey(1))

    ctime("full_mll", full, params, x, y)


if __name__ == "__main__":
    main()
