"""Profile sym-kernel contraction variants on the real TPU.

Run:  timeout 560 python scripts/profile_matvec2.py > /tmp/prof3.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_fn(name, fn, *args, runs=5):
    try:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = float(f(*args))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(runs):
            out = float(f(*args))
        dt = (time.perf_counter() - t0) / runs
        print(f"{name}: {dt*1e3:.2f} ms  (compile {t_compile:.1f}s, out={out:.6g})", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    n, d, t = 100_000, 3, 11
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (n, t), dtype=jnp.float32)

    from linear_operator_tpu.ops.rbf import _pallas_matvec_sym

    import sys

    modes = sys.argv[1:] or ["bf16v2"]
    results = {}
    for mode in modes:
        for tile in [1024, 1536]:
            key = f"sym_{mode}_{tile}"
            results[key] = bench_fn(
                key, lambda vv, m=mode, tl=tile: jnp.sum(_pallas_matvec_sym(x, vv, tl, m)), v
            )

    # accuracy cross-check at n=8192 vs dense HIGHEST
    ns = 8192
    xs, vs = x[:ns], v[:ns]
    dense = jax.jit(
        lambda: jnp.sum(
            jnp.dot(
                jnp.exp(-0.5 * ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)),
                vs,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    )
    ref = float(dense())
    for mode in modes:
        if mode == "nodot":
            continue
        got = float(jax.jit(lambda m=mode: jnp.sum(_pallas_matvec_sym(xs, vs, 1024, m)))())
        print(f"check {mode}: rel={abs(got-ref)/abs(ref):.2e}", flush=True)

    entries = n * n
    for k_, dt in results.items():
        if dt:
            print(f"{k_}: {entries/dt/1e9:.1f} G kernel-entries/s", flush=True)


if __name__ == "__main__":
    main()
