"""XLA blocked mat-vec with k-split 2-pass contraction (operator exact f32,
rhs rounded to bf16 once per apply) vs Precision.HIGH 3-pass: CG iterations,
solution agreement, wall-clock.

Run:  timeout 1700 python scripts/profile_2pass_xla.py > /tmp/prof_2p.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def kv_2pass(k, v):
    """K @ v with K split across two bf16 passes and v rounded once:
    K_hi v_h + K_lo v_h.  K is represented EXACTLY (k_hi + k_lo covers f32);
    only v carries a one-time ~2^-9 rounding."""
    kh = k.astype(jnp.bfloat16)
    kl = (k - kh.astype(jnp.float32)).astype(jnp.bfloat16)
    vh = v.astype(jnp.bfloat16)

    def dd(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    return dd(kh, vh) + dd(kl, vh)


def main():
    from linear_operator_tpu import settings
    from linear_operator_tpu.models import ExactGPRegression
    from linear_operator_tpu.operators.kernel import rbf_covar
    from linear_operator_tpu.solvers.linear_cg import linear_cg

    n, d, m = 100_000, 3, 10
    block = 8192
    model = ExactGPRegression(block_rows=block)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    params = model.init_params(d)
    v = jax.random.normal(jax.random.PRNGKey(2), (n, m + 1), jnp.float32)

    def blocked_mm(x, rhs, params, mode):
        ls = jax.nn.softplus(params.raw_lengthscale) + 1e-6
        os_ = jax.nn.softplus(params.raw_outputscale) + 1e-6
        noise = jax.nn.softplus(params.raw_noise) + 1e-6
        nblocks = -(-n // block)
        pad = nblocks * block - n
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        xb = xp.reshape(nblocks, block, d)

        def one(xi):
            kb = rbf_covar(xi, x, lengthscale=ls, outputscale=os_)
            if mode == "high3":
                return jnp.matmul(kb, rhs, precision=jax.lax.Precision.HIGH)
            return kv_2pass(kb, rhs)

        out = jax.lax.map(one, xb).reshape(nblocks * block, rhs.shape[-1])[:n]
        return out + noise * rhs

    def cg(x, v, params, mode):
        K = model.train_operator(params, x)
        with settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.preconditioner_mode("nystrom"), \
             settings.max_preconditioner_size(400), \
             settings.min_preconditioning_size(2000), \
             settings.max_lanczos_quadrature_iterations(20):
            closure, _, _ = K.detach()._preconditioner()
            res = linear_cg(
                lambda w: blocked_mm(x, w, params, mode),
                v,
                preconditioner=closure,
                n_tridiag=m,
            )
        return res.solution, res.num_iters, res.residual_norm

    sols = {}
    for mode in ("high3", "2pass"):
        f = jax.jit(lambda x_, v_, p_, md=mode: cg(x_, v_, p_, md))
        t0 = time.perf_counter()
        sol, iters, resid = f(x, v, params)
        print(f"{mode}: compile+run {time.perf_counter()-t0:.1f}s "
              f"iters={int(iters)} max_resid={float(jnp.max(resid)):.3e}", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            sol, iters, resid = f(x, v, params)
            _ = float(jnp.sum(sol))
        print(f"{mode}: {(time.perf_counter()-t0)/3*1e3:.1f} ms iters={int(iters)}",
              flush=True)
        sols[mode] = sol
    diff = float(
        jnp.linalg.norm(sols["2pass"] - sols["high3"])
        / jnp.linalg.norm(sols["high3"])
    )
    print(f"solution rel diff: {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
