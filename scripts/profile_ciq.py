"""Where does the CIQ sampling step spend its time?  (bench config 6)

Splits the N=32k zero_mean_mvn_samples step into: (a) Lanczos eig-range
estimation (20 single-column mat-vecs), (b) shifted MINRES to tolerance,
and counts MINRES iterations.  The mat-vec pads columns to 128 MXU lanes,
so the 1-column Lanczos pass costs ~as much per mat-vec as the 16-sample
MINRES pass — if Lanczos is a big slice, shrinking its iteration count (or
batching the probe into the MINRES rhs) is the lever.

Usage: timeout 560 python scripts/profile_ciq.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from linear_operator_tpu import settings  # noqa: E402
from linear_operator_tpu.models import ExactGPRegression  # noqa: E402
from linear_operator_tpu.solvers.lanczos import lanczos_tridiag  # noqa: E402
from linear_operator_tpu.solvers.minres import minres  # noqa: E402
from linear_operator_tpu.solvers.contour_integral_quad import (  # noqa: E402
    ciq_shifts_weights,
)


def timed(f, *args, runs=3):
    v = f(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a).real), v)
    t0 = time.perf_counter()
    for _ in range(runs):
        v = f(*args)
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a).real), v)
    return v, (time.perf_counter() - t0) / runs


def main():
    n, d, num_samples = 32_768, 3, 16
    model = ExactGPRegression(block_rows=8192)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    params = model.init_params(d)
    key = jax.random.PRNGKey(1)

    def full(params, x, key):
        K = model.train_operator(params, x)
        with settings.ciq_samples(True), settings.minres_tolerance(1e-3), \
             settings.num_contour_quadrature(15), \
             settings.min_preconditioning_size(10**9):
            s = K.zero_mean_mvn_samples(num_samples, key=key)
        return jnp.sum(s * s)

    _, t_full = timed(jax.jit(full), params, x, key)
    print(f"full step:            {t_full*1e3:7.1f} ms")

    def lanczos_only(params, x, key):
        K = model.train_operator(params, x)
        init = jax.random.normal(key, (n,), dtype=jnp.float32)
        _, T = lanczos_tridiag(K._matmul, 20, init_vecs=init)
        return jnp.sum(T)

    _, t_lz = timed(jax.jit(lanczos_only), params, x, key)
    print(f"lanczos range (20it): {t_lz*1e3:7.1f} ms")

    def one_matvec(params, x, key):
        K = model.train_operator(params, x)
        v = jax.random.normal(key, (n, num_samples), dtype=jnp.float32)
        return jnp.sum(K._matmul(v))

    _, t_mv = timed(jax.jit(one_matvec), params, x, key)
    print(f"one 16-col mat-vec:   {t_mv*1e3:7.1f} ms")

    # MINRES alone at the real shifts, and its iteration count
    def minres_only(params, x, key):
        K = model.train_operator(params, x)
        kl, ks = jax.random.split(key)
        init = jax.random.normal(kl, (n,), dtype=jnp.float32)
        _, T = lanczos_tridiag(K._matmul, 20, init_vecs=init)
        ritz = jnp.linalg.eigvalsh(T)
        max_eig = jnp.max(ritz) * 1.2
        min_eig = jnp.maximum(jnp.min(ritz), 1e-7 * jnp.max(ritz)) / 1.2
        shifts, weights = ciq_shifts_weights(min_eig, max_eig, 15)
        rhs = jax.random.normal(ks, (n, num_samples), dtype=jnp.float32)
        with settings.minres_tolerance(1e-3):
            sol = minres(K._matmul, rhs, shifts=shifts.astype(jnp.float32))
        return jnp.sum(sol)

    _, t_mr = timed(jax.jit(minres_only), params, x, key)
    print(f"lanczos+minres:       {t_mr*1e3:7.1f} ms")
    print(f"-> minres alone:      {(t_mr-t_lz)*1e3:7.1f} ms "
          f"(~{(t_mr-t_lz)/t_mv:.0f} mat-vec equivalents)")


if __name__ == "__main__":
    main()
