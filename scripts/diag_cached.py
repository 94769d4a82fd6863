"""Diagnose the cached-tile mat-vec: padded-n correctness, symmetry, and
CG behavior with/without preconditioning.

Run:  timeout 1700 python scripts/diag_cached.py > /tmp/diag_cached.log 2>&1
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
    from linear_operator_tpu.ops.rbf import rbf_build_sym_tiles, rbf_matvec_sym_cached
    from linear_operator_tpu.solvers.linear_cg import linear_cg

    # 1. padded-n correctness: n NOT a multiple of the tile
    n1 = 9000
    x1 = jax.random.normal(jax.random.PRNGKey(0), (n1, 3), jnp.float32)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (n1, 5), jnp.float32)

    def check_pad(x, v):
        tiles = rbf_build_sym_tiles(x, 1024)
        got = rbf_matvec_sym_cached(tiles, v, n1, 1024, 2)
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        k = jnp.exp(-0.5 * d2).astype(jnp.bfloat16).astype(jnp.float32)
        want = jnp.dot(k, v, precision=jax.lax.Precision.HIGHEST)
        return jnp.linalg.norm(got - want) / jnp.linalg.norm(want)

    print("pad n=9000 rel err vs dense-bf16:", float(jax.jit(check_pad)(x1, v1)),
          flush=True)

    # 2. symmetry at n=1e5: u^T M v == v^T M u
    n, d, m = 100_000, 3, 10
    x = jax.random.normal(jax.random.PRNGKey(2), (n, d), jnp.float32)

    def sym_check(x, u, v):
        tiles = rbf_build_sym_tiles(x, 1024)
        mu = rbf_matvec_sym_cached(tiles, u, n, 1024, 2)
        mv = rbf_matvec_sym_cached(tiles, v, n, 1024, 2)
        a = jnp.sum(v * mu)
        b = jnp.sum(u * mv)
        return a, b, jnp.abs(a - b) / jnp.abs(a)

    u = jax.random.normal(jax.random.PRNGKey(3), (n, 1), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(4), (n, 1), jnp.float32)
    a, b, rel = jax.jit(sym_check)(x, u, v)
    print(f"symmetry: vMu={float(a):.6e} uMv={float(b):.6e} rel={float(rel):.2e}",
          flush=True)

    # 3. plain (unpreconditioned) CG on K_bf16 + noise I
    noise = 0.12693
    rhs = jax.random.normal(jax.random.PRNGKey(5), (n, m + 1), jnp.float32)

    def plain_cg(x, rhs):
        xs = (x / 0.6931).astype(jnp.float32)
        tiles = rbf_build_sym_tiles(xs, 1024)

        def mm(w):
            return 0.6931 * rbf_matvec_sym_cached(tiles, w, n, 1024, 2) + noise * w

        with settings.max_cg_iterations(60), settings.cg_tolerance(1.0):
            res = linear_cg(mm, rhs, n_tridiag=m)
        return res.num_iters, res.residual_norm

    t0 = time.perf_counter()
    iters, resid = jax.jit(plain_cg)(x, rhs)
    print(f"plain CG (cached mm): iters={int(iters)} "
          f"max_resid={float(jnp.max(resid)):.3e} ({time.perf_counter()-t0:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
