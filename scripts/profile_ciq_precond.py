"""Preconditioned vs plain CIQ sampling at the bench config (N=32k RBF+noise).

Round 4 added the reference's preconditioned msMINRES-CIQ (exact sampling
covariance).  This measures whether a strong Nystrom preconditioner buys
wall-clock at the tracked `ciq_sampling_n32k` shape, and what the default
rank-15 pivoted preconditioner does there.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.models import ExactGPRegression


def run(tag, extra_settings, n=32_768, d=3, num_samples=16):
    model = ExactGPRegression(block_rows=8192)
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    params = model.init_params(d)

    def step(params, x, key):
        with settings.ciq_samples(True), settings.minres_tolerance(1e-3), \
             settings.num_contour_quadrature(15), settings.max_cg_iterations(100), \
             extra_settings():
            K = model.train_operator(params, x)
            s = K.zero_mean_mvn_samples(num_samples, key=key)
        return jnp.sum(s * s) / num_samples

    fn = jax.jit(step)
    key = jax.random.PRNGKey(1)
    v = float(fn(params, x, key))  # compile + warm
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        float(fn(params, x, key))
    dt = (time.perf_counter() - t0) / n_runs
    # E[s^T s]/num_samples = tr(K)/n... sanity: should be ~ n * prior variance
    import sys as _s
    print(f"{tag}: {dt*1e3:.1f} ms/step = {num_samples/dt:.1f} samples/s  (E||s||^2={v:.0f})", flush=True)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def main():
    run("no preconditioner      ", lambda: settings.max_preconditioner_size(0))
    run("pivoted rank 15 (deflt)", lambda: settings.max_preconditioner_size(15))
    run("nystrom rank 100       ", lambda: _stack(
        settings.preconditioner_mode("nystrom"), settings.max_preconditioner_size(100)))
    run("nystrom rank 400       ", lambda: _stack(
        settings.preconditioner_mode("nystrom"), settings.max_preconditioner_size(400)))


class _stack:
    def __init__(self, *cms):
        self.cms = cms

    def __enter__(self):
        for c in self.cms:
            c.__enter__()
        return self

    def __exit__(self, *a):
        for c in reversed(self.cms):
            c.__exit__(*a)
        return False


if __name__ == "__main__":
    main()
