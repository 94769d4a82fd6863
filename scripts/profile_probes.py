"""Iso-time probe-count sweep (VERDICT r2 item 3).

The N=1e5 MLL mat-vec pads its 11 rhs columns to the MXU's 128 lanes, so
~90% of every contraction pass is padding — extra Hutchinson probes should
be nearly free.  Measure wall-clock and logdet MC spread at 10/32/64/117
probes.

Usage: timeout 560 python scripts/profile_probes.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from linear_operator_tpu import settings  # noqa: E402
from linear_operator_tpu.models import ExactGPRegression  # noqa: E402
from linear_operator_tpu.functions import inv_quad_logdet  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = 3
    model = ExactGPRegression(block_rows=8192)
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    results = {}
    for m in (10, 32, 64, 117):

        def ld_fn(params, key, m=m):
            with settings.max_cholesky_size(0), settings.num_trace_samples(m), \
                 settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
                 settings.preconditioner_mode("nystrom"), \
                 settings.max_preconditioner_size(400), \
                 settings.min_preconditioning_size(2000), \
                 settings.max_lanczos_quadrature_iterations(20):
                K = model.train_operator(params, x)
                iq, ld = inv_quad_logdet(K, y[..., None], logdet=True, key=key)
                return ld

        f = jax.jit(ld_fn)
        float(f(params, jax.random.PRNGKey(1)))  # compile
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            float(f(params, jax.random.PRNGKey(1)))
        dt = (time.perf_counter() - t0) / reps
        lds = [float(f(params, jax.random.PRNGKey(100 + s))) for s in range(6)]
        mean = sum(lds) / len(lds)
        std = (sum((v - mean) ** 2 for v in lds) / (len(lds) - 1)) ** 0.5
        results[m] = (dt, mean, std)
        print(
            f"m={m:4d}: {dt*1e3:7.1f} ms/MLL   logdet mean {mean:12.1f}"
            f"   MC std {std:9.1f}",
            flush=True,
        )

    base_dt, _, base_std = results[10]
    for m, (dt, _, std) in results.items():
        print(
            f"m={m:4d}: time x{dt/base_dt:4.2f}  std x{std/base_std if base_std else 0:4.2f}"
        )


if __name__ == "__main__":
    main()
