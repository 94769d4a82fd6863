"""Locate the missing ~1.6 s in the N=1e5 training-step backward.

profile_backward.py showed: forward 785 ms, value_and_grad 2518 ms, but the
isolated _bilinear_derivative (the entire intended backward) only 125 ms.
This script bisects the gap.

Usage: timeout 560 python scripts/profile_backward2.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from linear_operator_tpu import settings  # noqa: E402
from linear_operator_tpu.models import ExactGPRegression  # noqa: E402


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
    d = 3
    model = ExactGPRegression(block_rows=8192)
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    def make_loss(num_probes=10, precond=True, logdet=True):
        def loss_fn(params):
            ctx = [
                settings.max_cholesky_size(0),
                settings.num_trace_samples(num_probes),
                settings.max_cg_iterations(100),
                settings.cg_tolerance(1.0),
                settings.max_lanczos_quadrature_iterations(20),
            ]
            if precond:
                ctx += [
                    settings.preconditioner_mode("nystrom"),
                    settings.max_preconditioner_size(400),
                    settings.min_preconditioning_size(2000),
                ]
            else:
                ctx += [settings.min_preconditioning_size(10**9)]
            import contextlib

            with contextlib.ExitStack() as st:
                for c in ctx:
                    st.enter_context(c)
                from linear_operator_tpu.functions import inv_quad_logdet

                K = model.train_operator(params, x)
                iq, ld = inv_quad_logdet(
                    K, y[..., None], logdet=logdet, key=jax.random.PRNGKey(1)
                )
                return 0.5 * jnp.mean(iq + (ld if logdet else 0.0)) / n

        return loss_fn

    full = make_loss()
    t_fwd = timeit(jax.jit(full), params)
    print(f"fwd full:                    {t_fwd*1e3:8.1f} ms")

    t_vg = timeit(jax.jit(jax.value_and_grad(full)), params)
    print(f"vag full:                    {t_vg*1e3:8.1f} ms")

    # grads cut at entry: same graph shape, trivial bwd -> is fwd-under-vjp
    # itself inflated?
    def frozen(params):
        return full(jax.tree_util.tree_map(jax.lax.stop_gradient, params))

    t_frozen = timeit(jax.jit(jax.value_and_grad(frozen)), params)
    print(f"vag stop_gradient(params):   {t_frozen*1e3:8.1f} ms")

    # logdet-only and iq-only cotangents
    def ld_only(params):
        return full(params) - iq_only_raw(params)

    def iq_only_raw(params):
        l2 = make_loss(logdet=False)
        return l2(params)

    t_iq = timeit(jax.jit(jax.value_and_grad(make_loss(logdet=False))), params)
    print(f"vag iq-only (no probes):     {t_iq*1e3:8.1f} ms")

    t_np = timeit(jax.jit(jax.value_and_grad(make_loss(precond=False))), params)
    print(f"vag full, no preconditioner: {t_np*1e3:8.1f} ms")
    t_np_f = timeit(jax.jit(make_loss(precond=False)), params)
    print(f"fwd  full, no preconditioner:{t_np_f*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
