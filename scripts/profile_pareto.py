"""Quad-iters x probes Pareto sweep at N=1e5 (VERDICT r4 #2).

Every earlier probe sweep held SLQ quadrature at 20 iterations; the
20-iteration floor IS the flagship wall-clock (20 x ~39 ms mat-vec passes).
This sweep measures the missing second axis: quadrature iterations
{10, 15, 20} x probes {10, 32, 64}, each at measured wall-clock for the full
MLL *training step* (value_and_grad), with

* loss error  = |loss - ref| averaged over 6 probe keys (iq is
  deterministic, so this is 0.5 x the logdet error: MC + quadrature), and
* grad error  = relative RMS error of the hyperparameter gradient vs ref,

where ref = converged operating point (117 probes, 30 quad iters) averaged
over 8 keys.

Usage: timeout 1800 python scripts/profile_pareto.py [n]  (TPU, serial)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from linear_operator_tpu import settings  # noqa: E402
from linear_operator_tpu.models import ExactGPRegression  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = 3
    model = ExactGPRegression(block_rows=8192)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    def make_fn(m, q):
        def loss(params, key):
            with settings.max_cholesky_size(0), settings.num_trace_samples(m), \
                 settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
                 settings.preconditioner_mode("auto"), \
                 settings.max_lanczos_quadrature_iterations(q):
                return model.neg_mll(params, x, y, key=key)

        return jax.jit(jax.value_and_grad(loss))

    def run(fn, key):
        v, g = fn(params, key)
        leaves = jax.tree_util.tree_leaves(g)
        flat = jnp.concatenate([jnp.ravel(l) for l in leaves])
        return float(v), jax.device_get(flat)

    # ---- converged reference: 117 probes x 30 quad iters, 8 keys ---------
    ref_fn = make_fn(117, 30)
    vals, grads = [], []
    for s in range(8):
        v, g = run(ref_fn, jax.random.PRNGKey(1000 + s))
        vals.append(v)
        grads.append(g)
    ref_loss = sum(vals) / len(vals)
    import numpy as np

    ref_grad = np.mean(np.stack(grads), axis=0)
    ref_gnorm = float(np.linalg.norm(ref_grad))
    print(f"ref (m=117,q=30): loss {ref_loss:.2f}, |grad| {ref_gnorm:.4g}", flush=True)

    rows = []
    for q in (10, 15, 20):
        for m in (10, 32, 64):
            fn = make_fn(m, q)
            t0 = time.perf_counter()
            run(fn, jax.random.PRNGKey(1))  # compile
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                run(fn, jax.random.PRNGKey(1))
            dt = (time.perf_counter() - t0) / reps

            lerrs, gerrs = [], []
            for s in range(6):
                v, g = run(fn, jax.random.PRNGKey(100 + s))
                lerrs.append(abs(v - ref_loss))
                gerrs.append(float(np.linalg.norm(g - ref_grad)) / ref_gnorm)
            row = {
                "quad_iters": q,
                "probes": m,
                "ms_per_step": round(dt * 1e3, 1),
                "loss_err_mean": float(f"{sum(lerrs) / len(lerrs):.4g}"),
                "grad_relerr_mean": float(f"{sum(gerrs) / len(gerrs):.4g}"),
                "compile_s": round(compile_s, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Pareto summary: does any cheaper config dominate the (20, 10) default?
    base = next(r for r in rows if r["quad_iters"] == 20 and r["probes"] == 10)
    print("\nvs default (q=20, m=10):", flush=True)
    for r in rows:
        dom = (
            r["ms_per_step"] <= base["ms_per_step"] * 1.02
            and r["loss_err_mean"] <= base["loss_err_mean"]
            and r["grad_relerr_mean"] <= base["grad_relerr_mean"]
            and r is not base
        )
        print(
            f"  q={r['quad_iters']:2d} m={r['probes']:3d}: "
            f"time x{r['ms_per_step']/base['ms_per_step']:4.2f}  "
            f"loss_err x{r['loss_err_mean']/max(base['loss_err_mean'],1e-9):5.2f}  "
            f"grad_err x{r['grad_relerr_mean']/max(base['grad_relerr_mean'],1e-9):5.2f}"
            + ("   <-- dominates default" if dom else ""),
            flush=True,
        )


if __name__ == "__main__":
    main()
