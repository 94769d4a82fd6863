"""Preconditioner-closure precision: HIGH (3-pass) vs HIGHEST (6-pass).

BASELINE.md numerics note 3 established that DEFAULT-bf16 products corrupt
the Woodbury preconditioner closure; HIGH was never separately tested for
the CLOSURE (the exact-solve path already runs HIGH safely).  The closure
costs ~2.4 ms/iter at rank 400 — halving its passes is worth ~24 ms/MLL if
CG converges identically.

Usage: timeout 560 python scripts/profile_precond_precision.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from linear_operator_tpu import settings  # noqa: E402
from linear_operator_tpu.models import ExactGPRegression  # noqa: E402
from linear_operator_tpu.functions import inv_quad_logdet  # noqa: E402
import linear_operator_tpu.operators.added_diag as ad  # noqa: E402
from linear_operator_tpu.operators.low_rank_root_added_diag import (  # noqa: E402
    woodbury_solve_closure,
)


def run(model, params, x, y, n, precision):
    orig = ad.AddedDiagLinearOperator._preconditioner

    def patched(self):
        k = settings.max_preconditioner_size.value()
        if k == 0 or self.shape[-1] < settings.min_preconditioning_size.value():
            return None, None, None
        from linear_operator_tpu.operators.root import LowRankRootLinearOperator
        from linear_operator_tpu.operators.dense import DenseLinearOperator

        L = self._build_precond_factor()
        diag = self._diag_op._diagonal()
        closure, logdet_p = woodbury_solve_closure(L, diag, precision=precision)
        precond_op = LowRankRootLinearOperator(DenseLinearOperator(L)).add_diagonal(diag)
        return closure, precond_op, logdet_p

    ad.AddedDiagLinearOperator._preconditioner = patched
    try:

        def loss_fn(params):
            with settings.max_cholesky_size(0), settings.num_trace_samples(10), \
                 settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
                 settings.preconditioner_mode("nystrom"), \
                 settings.max_preconditioner_size(400), \
                 settings.min_preconditioning_size(2000), \
                 settings.max_lanczos_quadrature_iterations(20):
                K = model.train_operator(params, x)
                iq, ld = inv_quad_logdet(K, y[..., None], logdet=True,
                                         key=jax.random.PRNGKey(1))
                return iq + ld

        f = jax.jit(loss_fn)
        v = float(f(params))
        t0 = time.perf_counter()
        for _ in range(3):
            float(f(params))
        dt = (time.perf_counter() - t0) / 3
        return v, dt
    finally:
        ad.AddedDiagLinearOperator._preconditioner = orig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = 3
    model = ExactGPRegression(block_rows=8192)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    v_hi, t_hi = run(model, params, x, y, n, jax.lax.Precision.HIGHEST)
    print(f"HIGHEST: {t_hi*1e3:7.1f} ms   value {v_hi:.4f}")
    v_h, t_h = run(model, params, x, y, n, jax.lax.Precision.HIGH)
    print(f"HIGH:    {t_h*1e3:7.1f} ms   value {v_h:.4f}")
    print(f"value diff {abs(v_h - v_hi):.6g}  speedup x{t_hi/t_h:.3f}")


if __name__ == "__main__":
    main()
