"""CIQ sample-count scaling: MINRES cost is ~flat up to 128 rhs columns.

profile_ciq.py split the N=32k CIQ step into 85 ms Lanczos range estimation
plus ~15 MINRES iterations whose mat-vec pads the sample columns to 128 MXU
lanes — so samples 17..128 should ride the same contraction nearly free
(the probe-sweep result, BASELINE.md, applied to sampling).

Usage: timeout 1200 python -u scripts/profile_ciq2.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from linear_operator_tpu import settings  # noqa: E402
from linear_operator_tpu.models import ExactGPRegression  # noqa: E402


def main():
    n, d = 32_768, 3
    model = ExactGPRegression(block_rows=8192)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    params = model.init_params(d)

    for num_samples in (16, 64, 128):

        def step(params, x, key):
            K = model.train_operator(params, x)
            with settings.ciq_samples(True), settings.minres_tolerance(1e-3), \
                 settings.num_contour_quadrature(15), \
                 settings.min_preconditioning_size(10**9):
                s = K.zero_mean_mvn_samples(num_samples, key=key)
            return jnp.sum(s * s)

        f = jax.jit(step)
        float(f(params, x, jax.random.PRNGKey(1)))
        t0 = time.perf_counter()
        runs = 3
        for _ in range(runs):
            float(f(params, x, jax.random.PRNGKey(1)))
        dt = (time.perf_counter() - t0) / runs
        print(
            f"samples={num_samples:4d}: {dt*1e3:7.1f} ms/step = "
            f"{num_samples/dt:7.1f} samples/s"
        )


if __name__ == "__main__":
    main()
