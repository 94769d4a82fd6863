"""Decompose the N=1e5 training-step cost (VERDICT r2 item 4).

Times, on the real TPU:
  1. jit forward MLL (bench config 3)
  2. jit value_and_grad (bench config 3b)
  3. the isolated _bilinear_derivative (11 columns) — fused blocked path
     (KernelLinearOperator override) vs the default jax.grad-through-
     checkpointed-_matmul path
All timings fenced with host transfers (axon block_until_ready is a no-op).

Usage: timeout 560 python scripts/profile_backward.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import build_benchmark  # noqa: E402
from linear_operator_tpu.operators._linear_operator import LinearOperator  # noqa: E402


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        r = fn(*args)
        float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), r, 0.0))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), r, 0.0))
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    fn, (params, x, y) = build_benchmark(n=n)

    t_fwd = timeit(fn, params, x, y)
    print(f"forward MLL:          {t_fwd*1e3:8.1f} ms")

    grad_fn = jax.jit(jax.value_and_grad(fn))
    t_vg = timeit(lambda p: grad_fn(p, x, y), params)
    print(f"value_and_grad:       {t_vg*1e3:8.1f} ms  (bwd ~= {(t_vg-t_fwd)*1e3:.1f} ms)")

    # isolated bilinear derivative, 11 columns, on the AddedDiag operator
    from linear_operator_tpu.models import ExactGPRegression

    model = ExactGPRegression(block_rows=8192)
    t = 11
    left = jax.random.normal(jax.random.PRNGKey(3), (n, t), dtype=jnp.float32)
    right = jax.random.normal(jax.random.PRNGKey(4), (n, t), dtype=jnp.float32)

    @jax.jit
    def blin_fused(params, x, left, right):
        op = model.train_operator(params, x)
        return jax.tree_util.tree_leaves(op._bilinear_derivative(left, right))

    @jax.jit
    def blin_default(params, x, left, right):
        op = model.train_operator(params, x)
        return jax.tree_util.tree_leaves(
            LinearOperator._bilinear_derivative(op, left, right)
        )

    t_fused = timeit(blin_fused, params, x, left, right)
    print(f"bilinear fused:       {t_fused*1e3:8.1f} ms")
    t_def = timeit(blin_default, params, x, left, right)
    print(f"bilinear default:     {t_def*1e3:8.1f} ms")

    # plain blocked mat-vec for scale
    @jax.jit
    def mv(params, x, right):
        op = model.train_operator(params, x)
        return op._matmul(right)

    t_mv = timeit(mv, params, x, right)
    print(f"blocked mat-vec (11c):{t_mv*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
