"""Bisect the 881 ms vs 2518 ms value_and_grad discrepancy.

A: jit(value_and_grad(jit(loss)))(params, x, y)   — bench.py's pattern
B: jit(value_and_grad(loss))(params, x, y)        — no inner jit
C: jit(value_and_grad(closure_loss))(params)      — x, y captured
D: like B but argnums=(0,) explicit and x,y marked stop_gradient inside

Usage: timeout 560 python scripts/profile_backward3.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import build_benchmark  # noqa: E402


def timeit(fn, *args, reps=2, warmup=1):
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
    jit_loss, (params, x, y) = build_benchmark(n=n)
    plain_loss = jit_loss.__wrapped__

    a = jax.jit(jax.value_and_grad(jit_loss))
    t = timeit(lambda p: a(p, x, y), params)
    print(f"A jit(vag(jit(loss)))(p,x,y):  {t*1e3:8.1f} ms")

    b = jax.jit(jax.value_and_grad(plain_loss))
    t = timeit(lambda p: b(p, x, y), params)
    print(f"B jit(vag(loss))(p,x,y):       {t*1e3:8.1f} ms")

    c = jax.jit(jax.value_and_grad(lambda p: plain_loss(p, x, y)))
    t = timeit(c, params)
    print(f"C jit(vag(closure))(p):        {t*1e3:8.1f} ms")

    d = jax.jit(
        jax.value_and_grad(
            lambda p, xx, yy: plain_loss(
                p, jax.lax.stop_gradient(xx), jax.lax.stop_gradient(yy)
            )
        )
    )
    t = timeit(lambda p: d(p, x, y), params)
    print(f"D jit(vag(loss+stopgrad x,y)): {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
