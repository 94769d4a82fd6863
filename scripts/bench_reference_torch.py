"""Measure the REFERENCE library (torch CPU) vs this rebuild (JAX CPU) on the
same host, same tasks — the reference publishes no numbers (BASELINE.md), so
this is the only direct apples-to-apples comparison available: both libraries
on the 4-core host CPU, plus this repo's TPU numbers from ``bench.py --all``.

Usage:  python scripts/bench_reference_torch.py
Emits one JSON line per (config, library) pair.

The reference is driven through its public API only (no code copied); sizes
follow BASELINE.json configs, with config 3 scaled to N=8192 because the
reference's KernelLinearOperator materializes the full covar block in every
``_matmul`` (reference kernel_linear_operator.py:379) — at the bench's
N=1e5 that is a 40 GB dense block per CG iteration on CPU.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(config: str, library: str, value: float, unit: str) -> None:
    print(
        json.dumps(
            {"config": config, "library": library, "value": round(value, 4), "unit": unit}
        ),
        flush=True,
    )


def timeit(fn, runs=3, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(runs):
        fn()
    return (time.perf_counter() - t0) / runs


# ---------------------------------------------------------------------------
# Reference (torch CPU)
# ---------------------------------------------------------------------------


def ref_config1(n=10_000_000, r=20):
    import torch
    from linear_operator.operators import LowRankRootLinearOperator

    torch.manual_seed(0)
    u = torch.randn(n, r) / math.sqrt(n)
    noise = torch.full((n,), 0.5)
    y = torch.randn(n, 1)

    def step():
        # rebuild the operator each run: its memoize cache would otherwise
        # make later runs pure cache hits (this matches the rebuild's jitted
        # step, which also refactorizes the cap matrix every call)
        op = LowRankRootLinearOperator(u).add_diagonal(noise)
        x = op.solve(y)
        iq, ld = op.inv_quad_logdet(inv_quad_rhs=y, logdet=True)
        return float(x.sum() + iq + ld)

    dt = timeit(step, runs=5)
    emit("1_woodbury_10m", "reference_torch_cpu", 1.0 / dt, "solves/s")


def ref_config2(b=64, n=1024):
    import torch
    from linear_operator import to_linear_operator

    torch.manual_seed(0)
    a = torch.randn(b, n, n) / math.sqrt(n)
    mats = a @ a.transpose(-1, -2) + 2.0 * torch.eye(n)
    rhs = torch.randn(b, n, 3)

    def step():
        op = to_linear_operator(mats.clone())
        iq, ld = op.inv_quad_logdet(inv_quad_rhs=rhs, logdet=True)
        root = op.root_decomposition().root.to_dense()
        return float(iq.sum() + ld.sum() + root.sum())

    dt = timeit(step, runs=3)
    emit("2_batched_dense_64x1k", "reference_torch_cpu", b / dt, "matrices/s")


def _torch_rbf(x1, x2, lengthscale, outputscale):
    x1 = x1.div(lengthscale)
    x2 = x2.div(lengthscale)
    sq = (x1.unsqueeze(-2) - x2.unsqueeze(-3)).square().sum(dim=-1)
    return sq.div(-2.0).exp().mul(outputscale[..., None, None])


def ref_config3(n=8192, d=3, probes=10):
    import torch
    from linear_operator import settings as ref_settings
    from linear_operator.operators import KernelLinearOperator

    torch.manual_seed(0)
    x = torch.randn(n, d)
    y = (torch.sin(3.0 * x[:, 0]) + 0.1 * torch.randn(n)).unsqueeze(-1)
    ls = torch.full((1, d), 0.7)
    os_ = torch.tensor(1.0)
    noise = torch.full((n,), 0.1)

    def step():
        k = KernelLinearOperator(
            x,
            x,
            lengthscale=ls,
            outputscale=os_,
            covar_func=_torch_rbf,
            num_nonbatch_dimensions={"outputscale": 0},
        )
        op = k.add_diagonal(noise)
        with ref_settings.max_cholesky_size(1), ref_settings.num_trace_samples(
            probes
        ), ref_settings.max_cg_iterations(100), ref_settings.cg_tolerance(
            1.0
        ), ref_settings.max_lanczos_quadrature_iterations(20):
            iq, ld = op.inv_quad_logdet(inv_quad_rhs=y, logdet=True)
        return float(iq + ld)

    dt = timeit(step, runs=2)
    emit("3_rbf_mll_n8192", "reference_torch_cpu", 1.0 / dt, "solves/s")


# ---------------------------------------------------------------------------
# Rebuild (JAX CPU) — same tasks, same host
# ---------------------------------------------------------------------------


def ours_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from linear_operator_tpu import settings
    from linear_operator_tpu.functions import inv_quad_logdet, solve
    from linear_operator_tpu.operators import (
        DenseLinearOperator,
        LowRankRootLinearOperator,
    )
    from linear_operator_tpu.operators.kernel import rbf_kernel_operator

    # config 1
    n, r = 10_000_000, 20
    u = jax.random.normal(jax.random.PRNGKey(0), (n, r), jnp.float32) / math.sqrt(n)
    noise = jnp.full((n,), 0.5, jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)

    def step1(u, noise, y):
        op = LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(noise)
        # factorize(): one cap Cholesky shared across solve + iqld — the
        # reference side gets the same sharing from its memoize cache.
        op = op.factorize()
        x = solve(op, y)
        iq, ld = inv_quad_logdet(op, y, logdet=True)
        return jnp.sum(x) + iq + ld

    f1 = jax.jit(step1)
    dt = timeit(lambda: float(f1(u, noise, y)), runs=5)
    emit("1_woodbury_10m", "rebuild_jax_cpu", 1.0 / dt, "solves/s")

    # config 2
    b, m = 64, 1024
    a = jax.random.normal(jax.random.PRNGKey(0), (b, m, m), jnp.float32) / math.sqrt(m)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (b, m, 3), jnp.float32)

    def step2(a, rhs):
        mats = a @ jnp.swapaxes(a, -1, -2) + 2.0 * jnp.eye(m, dtype=jnp.float32)
        op = DenseLinearOperator(mats)
        iq, ld = inv_quad_logdet(op, rhs, logdet=True)
        root = op.root_decomposition().root.to_dense()
        return jnp.sum(iq) + jnp.sum(ld) + jnp.sum(root)

    f2 = jax.jit(step2)
    dt = timeit(lambda: float(f2(a, rhs)), runs=3)
    emit("2_batched_dense_64x1k", "rebuild_jax_cpu", b / dt, "matrices/s")

    # config 3 (N=8192, same task as ref_config3)
    n3, d = 8192, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (n3, d), jnp.float32)
    y3 = (
        jnp.sin(3.0 * x[:, 0])
        + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (n3,), jnp.float32)
    )[:, None]

    def step3(x, y3):
        op = rbf_kernel_operator(
            x, lengthscale=jnp.float32(0.7), outputscale=jnp.float32(1.0)
        ).add_diagonal(jnp.full((n3,), 0.1, jnp.float32))
        with settings.max_cholesky_size(0), settings.num_trace_samples(10), \
             settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.max_lanczos_quadrature_iterations(20):
            iq, ld = inv_quad_logdet(op, y3, logdet=True, key=jax.random.PRNGKey(2))
        return jnp.sum(iq) + ld

    f3 = jax.jit(step3)
    dt = timeit(lambda: float(f3(x, y3)), runs=2)
    emit("3_rbf_mll_n8192", "rebuild_jax_cpu", 1.0 / dt, "solves/s")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ours"):
        # run JAX first (torch sets thread pools that are fine either way)
        ours_cpu()
    if which in ("all", "ref"):
        ref_config1()
        ref_config2()
        ref_config3()


if __name__ == "__main__":
    main()
