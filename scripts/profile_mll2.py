"""Decompose the N=1e5 MLL: preconditioner construction, probe draw, CG
solve (with iteration count), SLQ eigh.

Run:  timeout 1800 python scripts/profile_mll2.py > /tmp/prof_mll2.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, runs=3):
    t0 = time.perf_counter()
    out = fn(*args)
    out = jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(runs):
        out2 = fn(*args)
        out2 = jax.tree_util.tree_map(
            lambda a: float(jnp.sum(a.astype(jnp.float32))), out2
        )
    dt = (time.perf_counter() - t0) / runs
    print(f"{name}: {dt*1e3:.1f} ms  (out={out2})", flush=True)
    return dt


def main():
    from linear_operator_tpu import settings
    from linear_operator_tpu.models import ExactGPRegression
    from linear_operator_tpu.functions import pivoted_cholesky

    n, d, m = 100_000, 3, 10
    model = ExactGPRegression(block_rows=8192)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    rank = 200

    # (a) pivoted cholesky construction
    def pc(params, x):
        K = model.train_operator(params, x)
        return pivoted_cholesky(K.operators[0], rank=rank)

    timed("pivoted_cholesky(200)", jax.jit(pc), params, x)

    # (b) one cached-engine mat-vec through the operator closure
    def one_matvec(params, x, v):
        K = model.train_operator(params, x)
        return K._matmul_closure()(v)

    v = jax.random.normal(jax.random.PRNGKey(2), (n, m + 1), jnp.float32)
    timed("matvec_closure(11col)", jax.jit(one_matvec), params, x, v)

    # (c) full preconditioned CG with tridiag, iteration count
    def cg_full(params, x, v):
        K = model.train_operator(params, x)
        with settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.max_preconditioner_size(rank), \
             settings.min_preconditioning_size(2000), \
             settings.max_lanczos_quadrature_iterations(20):
            closure, _, _ = K.detach()._preconditioner()
            res = K._solve_via_cg(v, preconditioner=closure, n_tridiag=m)
        return res.solution, res.num_iters

    t0 = time.perf_counter()
    f = jax.jit(cg_full)
    sol, iters = f(params, x, v)
    print(f"cg_full: compile+run {time.perf_counter()-t0:.1f}s iters={int(iters)}", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        sol, iters = f(params, x, v)
        _ = float(jnp.sum(sol)), int(iters)
    print(f"cg_full: {(time.perf_counter()-t0)/3*1e3:.1f} ms  iters={int(iters)}", flush=True)

    # (d) unpreconditioned CG for comparison
    def cg_plain(params, x, v):
        K = model.train_operator(params, x)
        with settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.max_lanczos_quadrature_iterations(20):
            res = K._solve_via_cg(v, n_tridiag=m)
        return res.solution, res.num_iters

    t0 = time.perf_counter()
    g = jax.jit(cg_plain)
    sol, iters = g(params, x, v)
    print(f"cg_plain: compile+run {time.perf_counter()-t0:.1f}s iters={int(iters)}", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        sol, iters = g(params, x, v)
        _ = float(jnp.sum(sol)), int(iters)
    print(f"cg_plain: {(time.perf_counter()-t0)/3*1e3:.1f} ms  iters={int(iters)}", flush=True)


if __name__ == "__main__":
    main()
