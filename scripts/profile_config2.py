"""Decompose bench config 2 (batched dense 64 x 1k): where do 146 ms go?

Run: timeout 900 python scripts/profile_config2.py > /tmp/prof_c2.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, runs=5):
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
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    from linear_operator_tpu import settings
    from linear_operator_tpu.functions import inv_quad_logdet
    from linear_operator_tpu.operators import DenseLinearOperator

    b, n = 64, 1024
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (b, n, n), dtype=jnp.float32) / jnp.sqrt(float(n))
    rhs = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3), dtype=jnp.float32)

    def form(a):
        return a @ jnp.swapaxes(a, -1, -2) + 2.0 * jnp.eye(n, dtype=jnp.float32)

    timed("form_mats", jax.jit(form), a)

    def chol(a):
        return jnp.linalg.cholesky(form(a))

    timed("xla_cholesky(64x1k)", jax.jit(chol), a)

    def eigh(a):
        return jnp.linalg.eigh(form(a))[0]

    timed("xla_eigh(64x1k)", jax.jit(eigh), a)

    def iqld_stoch(a, rhs):
        op = DenseLinearOperator(form(a))
        iq, ld = inv_quad_logdet(op, rhs, logdet=True)
        return iq, ld

    timed("iqld_default(CG+SLQ)", jax.jit(iqld_stoch), a, rhs)

    def iqld_chol(a, rhs):
        with settings.max_cholesky_size(2048):
            op = DenseLinearOperator(form(a))
            iq, ld = inv_quad_logdet(op, rhs, logdet=True)
        return iq, ld

    timed("iqld_cholesky_path", jax.jit(iqld_chol), a, rhs)

    def root_lanczos(a):
        op = DenseLinearOperator(form(a))
        return op.root_decomposition().root.to_dense()

    timed("root_lanczos(k=100)", jax.jit(root_lanczos), a)

    def root_chol(a):
        with settings.max_cholesky_size(2048):
            op = DenseLinearOperator(form(a))
            return op.root_decomposition().root.to_dense()

    timed("root_cholesky", jax.jit(root_chol), a)


if __name__ == "__main__":
    main()
