"""Decompose BENCH config 1 (N=1e7 rank-20 Woodbury solve + iqld).

Hypothesis: the skinny (n x r) contractions are HBM-bound, and pass-split
precision multiplies the traffic (HIGHEST = 6 bf16 passes re-reading the
800 MB operands).  Measure solve+iqld at DEFAULT / HIGH / HIGHEST and the
accuracy of each (residual + logdet vs exact N log(noise) ground truth).

NOTE: functions must be DISTINCT Python objects per precision — jax.jit's
C++ cache is keyed on function identity, so re-jitting the same `step`
after a monkeypatch silently reuses the first executable.

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


def make_closure(prec):
    def wb_closure(U, diag):
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

    return wb_closure


def make_steps(prec):
    """Fresh function objects per precision (see module NOTE)."""
    wb = make_closure(prec)

    def solve_iqld(u, noise, y):
        # the BENCH config-1 computation, inlined on the parametrized closure
        closure, ld = wb(u, noise)
        x = closure(y)
        iq = jnp.sum(closure(y) * y)
        return jnp.sum(x) + iq + ld

    def accuracy(u, noise, y):
        closure, ld = wb(u, noise)
        x = closure(y)
        # residual through an exact f32 structure matmul (fixed HIGHEST so the
        # measurement itself doesn't depend on the probe precision)
        hi = lax.Precision.HIGHEST
        kx = jnp.matmul(u, jnp.matmul(u.T, x, precision=hi), precision=hi)
        resid = jnp.linalg.norm(kx + noise[:, None] * x - y) / jnp.linalg.norm(y)
        return resid, ld

    return solve_iqld, accuracy


def main():
    n, rank = 10_000_000, 20
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (n, rank), dtype=jnp.float32) / jnp.sqrt(float(n))
    noise = jnp.full((n,), 0.5, jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), dtype=jnp.float32)
    exact_ld_D = n * float(jnp.log(0.5))

    for name, prec in [
        ("HIGHEST", lax.Precision.HIGHEST),
        ("HIGH", lax.Precision.HIGH),
        ("DEFAULT", lax.Precision.DEFAULT),
    ]:
        solve_iqld, accuracy = make_steps(prec)
        resid, ld = jax.tree_util.tree_map(float, jax.jit(accuracy)(u, noise, y))
        print(
            f"{name} accuracy: resid={resid:.2e} ld={ld:.1f} "
            f"(D-only exact {exact_ld_D:.1f})",
            flush=True,
        )
        f = jax.jit(solve_iqld)
        t0 = time.perf_counter()
        out = float(f(u, noise, y))
        print(f"{name} solve+iqld: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        runs = 20
        t0 = time.perf_counter()
        for _ in range(runs):
            out = float(f(u, noise, y))
        dt = (time.perf_counter() - t0) / runs
        print(f"{name} solve+iqld: {dt*1e3:.1f} ms ({1.0/dt:.1f} solves/s)", flush=True)


if __name__ == "__main__":
    main()
