"""Where does the 30 ms Kronecker-Toeplitz solve+logdet step (bench config
4) go?  Splits: factor eigh alone, solve alone, iqld alone, fused step —
if step ~= solve + iqld, XLA is NOT CSE-ing the two eigh custom calls and
a shared-factorization API is a ~2x lever on this config.

Usage: timeout 900 python -u scripts/profile_kron.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from linear_operator_tpu.models.ski import rbf_toeplitz_column  # noqa: E402
from linear_operator_tpu.operators import (  # noqa: E402
    KroneckerProductLinearOperator,
    ToeplitzLinearOperator,
)
from linear_operator_tpu.functions import inv_quad_logdet, solve  # noqa: E402

M = 180


def _op(ls):
    col1 = rbf_toeplitz_column(M, 0.05, ls)
    col2 = rbf_toeplitz_column(M, 0.05, ls * 1.3)
    kron = KroneckerProductLinearOperator(
        (ToeplitzLinearOperator(col1), ToeplitzLinearOperator(col2))
    )
    return kron.add_diagonal(jnp.asarray(0.1, jnp.float32))


def timed(f, *args, runs=5):
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(runs):
        float(f(*args))
    return (time.perf_counter() - t0) / runs


def main():
    n = M * M
    y = jax.random.normal(jax.random.PRNGKey(0), (n, 1), dtype=jnp.float32)
    ls = jnp.asarray(0.3, jnp.float32)

    t_eigh = timed(jax.jit(lambda ls: jnp.sum(_op(ls)._eigen()[0])), ls)
    print(f"factor eigh only:   {t_eigh*1e3:7.2f} ms")

    t_solve = timed(jax.jit(lambda ls, y: jnp.sum(solve(_op(ls), y))), ls, y)
    print(f"solve only:         {t_solve*1e3:7.2f} ms")

    def iqld(ls, y):
        iq, ld = inv_quad_logdet(_op(ls), y, logdet=True)
        return jnp.sum(iq) + jnp.sum(ld)

    t_iqld = timed(jax.jit(iqld), ls, y)
    print(f"iqld only:          {t_iqld*1e3:7.2f} ms")

    def step(ls, y):
        op = _op(ls)
        x = solve(op, y)
        iq, ld = inv_quad_logdet(op, y, logdet=True)
        return jnp.sum(x) + jnp.sum(iq) + jnp.sum(ld)

    t_step = timed(jax.jit(step), ls, y)
    print(f"solve+iqld step:    {t_step*1e3:7.2f} ms "
          f"(sum of parts: {(t_solve+t_iqld)*1e3:.2f})")


if __name__ == "__main__":
    main()
