"""Profile the N=1e5 RBF kernel mat-vec engines on the real TPU.

Run:  timeout 560 python scripts/profile_matvec.py > /tmp/prof_matvec.log 2>&1

Timing is fenced with host transfers (block_until_ready does not synchronize
on the axon backend).
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
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        return None


def main():
    n, d, t = 100_000, 3, 11
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (n, t), dtype=jnp.float32)
    print(f"devices: {jax.devices()}", flush=True)

    from linear_operator_tpu.operators.kernel import rbf_kernel_operator
    from linear_operator_tpu.ops.rbf import rbf_matvec, _pallas_matvec_sym

    which = sys.argv[1:] if len(sys.argv) > 1 else ["xla", "pallas", "sym", "sym512", "sym2048"]

    results = {}
    if "xla" in which:
        K = rbf_kernel_operator(x, lengthscale=1.0, outputscale=1.0, block_rows=8192)
        results["xla_blocked_8192"] = bench_fn(
            "xla_blocked_8192", lambda vv: jnp.sum(K._matmul(vv)), v
        )
    if "pallas" in which:
        results["pallas_rect_512"] = bench_fn(
            "pallas_rect_512", lambda vv: jnp.sum(rbf_matvec(x, x, vv, 512)), v
        )
    if "pallas1024" in which:
        results["pallas_rect_1024"] = bench_fn(
            "pallas_rect_1024", lambda vv: jnp.sum(rbf_matvec(x, x, vv, 1024)), v
        )
    if "sym512" in which:
        results["pallas_sym_512"] = bench_fn(
            "pallas_sym_512", lambda vv: jnp.sum(_pallas_matvec_sym(x, vv, 512)), v
        )
    if "sym" in which:
        results["pallas_sym_1024"] = bench_fn(
            "pallas_sym_1024", lambda vv: jnp.sum(_pallas_matvec_sym(x, vv, 1024)), v
        )
    if "sym2048" in which:
        results["pallas_sym_2048"] = bench_fn(
            "pallas_sym_2048", lambda vv: jnp.sum(_pallas_matvec_sym(x, vv, 2048)), v
        )

    # correctness cross-check on a subsample (dense ground truth at 8k)
    if "check" in which or "sym" in which:
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
        got = float(jax.jit(lambda: jnp.sum(_pallas_matvec_sym(xs, vs, 1024)))())
        rect = float(jax.jit(lambda: jnp.sum(rbf_matvec(xs, xs, vs, 512)))())
        print(f"check n=8192: dense={ref:.6f} sym={got:.6f} rect={rect:.6f} "
              f"rel_sym={abs(got-ref)/abs(ref):.2e} rel_rect={abs(rect-ref)/abs(ref):.2e}",
              flush=True)

    entries = n * n
    for k_, dt in results.items():
        if dt:
            print(f"{k_}: {entries/dt/1e9:.1f} G kernel-entries/s", flush=True)


if __name__ == "__main__":
    main()
