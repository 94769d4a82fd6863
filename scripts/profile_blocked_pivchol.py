"""Measure blocked vs strict pivoted-Cholesky preconditioner build at the
bench scale (RBF kernel, N=1e5, d=3, rank 200) and quality via CG iteration
count.

Run: timeout 900 python scripts/profile_blocked_pivchol.py > /tmp/prof_bpc.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from linear_operator_tpu.operators.kernel import rbf_kernel_operator
    from linear_operator_tpu.solvers.pivoted_cholesky import pivoted_cholesky

    n, d, rank = 100_000, 3, 200
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_data():
        return jax.random.uniform(key, (n, d), dtype=jnp.float32)

    x = make_data()
    _ = float(jnp.sum(x))

    def build(x, bs):
        K = rbf_kernel_operator(x, lengthscale=0.5, outputscale=1.0)
        L = pivoted_cholesky(K, rank, block_size=bs)
        return jnp.sum(L * L)  # scalar fence

    for bs in (0, 16, 64, 128):
        fn = jax.jit(lambda x, _bs=bs: build(x, _bs))
        t0 = time.perf_counter()
        s = float(fn(x))
        print(f"bs={bs}: compile+run {time.perf_counter()-t0:.1f}s "
              f"(trace {s:.4e})", flush=True)
        t0 = time.perf_counter()
        runs = 3
        for _ in range(runs):
            s = float(fn(x))
        dt = (time.perf_counter() - t0) / runs * 1e3
        print(f"bs={bs}: {dt:.1f} ms (trace {s:.4e})", flush=True)

    print("exit-ok", flush=True)


if __name__ == "__main__":
    main()
