"""Benchmark: CG solve + SLQ logdet wall-clock at N=1e5 on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The BASELINE.json north-star metric is "CG solve + SLQ logdet wall-clock/chip
at N=1e5".  The reference publishes no numbers (BASELINE.md), so vs_baseline
compares against a measured PyTorch-CPU-equivalent estimate is not possible
in this container; instead vs_baseline reports speedup vs. the first recorded
run of this same benchmark (stored in .bench_baseline.json), i.e. progress
across rounds.  value = solves/s (higher is better): one "solve" = one full
marginal-likelihood evaluation (PCG solve of K^{-1}y + SLQ logdet, 10 probes)
on an RBF kernel operator, N=100_000, d=3.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def build_benchmark(n=100_000, d=3, num_probes=10, block_rows=8192):
    from linear_operator_tpu import settings
    from linear_operator_tpu.models import ExactGPRegression

    model = ExactGPRegression(block_rows=block_rows)
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    def loss_fn(params, x, y):
        # pivoted-Cholesky preconditioning (BASELINE.json config 3 names rank
        # 100; rank 200 is the measured sweet spot: 24 CG iterations vs 41 at
        # rank 100 and 47 unpreconditioned, at negligible construction cost)
        with settings.max_cholesky_size(0), settings.num_trace_samples(num_probes), \
             settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.max_preconditioner_size(200), \
             settings.min_preconditioning_size(2000), \
             settings.max_lanczos_quadrature_iterations(20):
            return model.neg_mll(params, x, y, key=jax.random.PRNGKey(1))

    return jax.jit(loss_fn), (params, x, y)


def main():
    fn, args = build_benchmark()
    # compile + warm up.  NOTE: on the axon (tunneled-TPU) backend
    # block_until_ready() does not reliably synchronize; a host transfer
    # (float()) is the only trustworthy fence, so every timed run fetches
    # its scalar result.
    float(fn(*args))
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = float(fn(*args))
    dt = (time.perf_counter() - t0) / n_runs
    solves_per_s = 1.0 / dt

    baseline_path = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["value"]
    else:
        base = solves_per_s
        with open(baseline_path, "w") as f:
            json.dump({"value": base}, f)

    print(
        json.dumps(
            {
                "metric": "gp_mll_n100k_cg_slq",
                "value": round(solves_per_s, 4),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / base, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
