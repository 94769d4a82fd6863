"""Decompose BENCH config 1 (N=1e7 rank-20 Woodbury solve + iqld).

Hypothesis: the skinny (n x r) contractions are HBM-bound, and pass-split
precision multiplies the traffic (HIGHEST = 6 bf16 passes re-reading the
800 MB operands).  Measure solve+iqld at DEFAULT / HIGH / HIGHEST and the
accuracy of each (residual + logdet vs exact N log(noise) ground truth).

Run: timeout 1800 python scripts/profile_woodbury.py > /tmp/prof_wood.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    import linear_operator_tpu.operators.low_rank_root_added_diag as lra
    from linear_operator_tpu.operators import (
        DenseLinearOperator,
        LowRankRootLinearOperator,
    )
    from linear_operator_tpu.functions import inv_quad_logdet, solve

    n, rank = 10_000_000, 20
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (n, rank), dtype=jnp.float32) / jnp.sqrt(float(n))
    noise = jnp.full((n,), 0.5, jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), dtype=jnp.float32)

    def step(u, noise, y):
        op = LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(noise)
        x = solve(op, y)
        iq, ld = inv_quad_logdet(op, y, logdet=True)
        # residual through the operator (exact structure matmul)
        resid = jnp.linalg.norm(op @ x - y) / jnp.linalg.norm(y)
        return jnp.sum(x), iq[0], ld, resid

    def solve_only(u, noise, y):
        op = LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(noise)
        return jnp.sum(solve(op, y))

    orig = lra.woodbury_solve_closure

    def make_closure(prec):
        def wrapped(U, diag):
            dinv = 1.0 / diag
            DinvU = dinv[..., :, None] * U
            r = U.shape[-1]
            cap = jnp.eye(r, dtype=U.dtype) + jnp.matmul(
                jnp.swapaxes(U, -1, -2), DinvU, precision=prec
            )
            cap_chol = jnp.linalg.cholesky(cap)

            def closure(v):
                dv = dinv[..., :, None] * v
                t = jnp.matmul(jnp.swapaxes(DinvU, -1, -2), v, precision=prec)
                ysol = lax.linalg.triangular_solve(cap_chol, t, left_side=True, lower=True)
                ysol = lax.linalg.triangular_solve(
                    cap_chol, ysol, left_side=True, lower=True, transpose_a=True
                )
                return dv - jnp.matmul(DinvU, ysol, precision=prec)

            logdet = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(cap_chol, axis1=-2, axis2=-1)), axis=-1
            ) + jnp.sum(jnp.log(diag), axis=-1)
            return closure, logdet

        return wrapped

    exact_ld_D = n * float(jnp.log(0.5))
    try:
        _profile_loop(step, solve_only, make_closure, lra, u, noise, y, exact_ld_D)
    finally:
        lra.woodbury_solve_closure = orig


def _profile_loop(step, solve_only, make_closure, lra, u, noise, y, exact_ld_D):
    import jax, time
    import jax.numpy as jnp
    from jax import lax
    for name, prec in [
        ("HIGHEST", lax.Precision.HIGHEST),
        ("HIGH", lax.Precision.HIGH),
        ("DEFAULT", lax.Precision.DEFAULT),
    ]:
        lra.woodbury_solve_closure = make_closure(prec)
        for label, fn in [("solve+iqld", step), ("solve_only", solve_only)]:
            f = jax.jit(fn)
            t0 = time.perf_counter()
            out = jax.tree_util.tree_map(float, f(u, noise, y))
            print(f"{name} {label}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
            runs = 20
            t0 = time.perf_counter()
            for _ in range(runs):
                out = jax.tree_util.tree_map(float, f(u, noise, y))
            dt = (time.perf_counter() - t0) / runs
            if label == "solve+iqld":
                s, iq, ld, resid = out
                print(
                    f"{name} {label}: {dt*1e3:.1f} ms  resid={resid:.2e} "
                    f"ld={ld:.1f} (D-only exact {exact_ld_D:.1f})",
                    flush=True,
                )
            else:
                print(f"{name} {label}: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
