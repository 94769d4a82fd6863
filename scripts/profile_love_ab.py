"""Controlled A/B: LOVE serving rate, bench-config path vs round-4 profile
path, interleaved in ONE process on the same chip (NEXT_STEPS round-6 #2:
bench recorded 27.3k points/s where scripts/profile_love_serving.py recorded
37k — same predict code, so the delta should be chip/tunnel variance; this
script proves it either way).

Both arms call the identical ``posterior_from_cache``; the only historical
difference was the cache-build settings (auto vs explicit Nystrom-400),
which cannot change the predict graph (k is pinned by
max_root_decomposition_size on both).  We build BOTH caches, then interleave
timed predict batches A/B/A/B... and report per-arm distributions.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.models import ExactGPRegression


def main(n=100_000, d=3, m=1024):
    model = ExactGPRegression(block_rows=8192)
    kx, ky, ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    x_star = jax.random.normal(ks, (m, d), dtype=jnp.float32)
    params = model.init_params(d)

    def build_auto(params, x, y):  # bench config settings
        with settings.max_cholesky_size(0), settings.max_cg_iterations(100), \
             settings.cg_tolerance(1.0), settings.preconditioner_mode("auto"), \
             settings.max_root_decomposition_size(100):
            return model.posterior_cache(params, x, y, key=jax.random.PRNGKey(2))

    def build_nystrom(params, x, y):  # round-4 profile script settings
        with settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.preconditioner_mode("nystrom"), \
             settings.max_preconditioner_size(400), \
             settings.min_preconditioning_size(2000), \
             settings.max_root_decomposition_size(100):
            return model.posterior_cache(params, x, y, key=jax.random.PRNGKey(2))

    cache_a = jax.jit(build_auto)(params, x, y)
    float(jnp.sum(cache_a.alpha))
    cache_b = jax.jit(build_nystrom)(params, x, y)
    float(jnp.sum(cache_b.alpha))
    print(f"k(auto)={cache_a.root_inv.shape[-1]} k(nystrom)={cache_b.root_inv.shape[-1]}",
          flush=True)

    def predict(params, x, cache, x_star):
        mean, var = model.posterior_from_cache(params, x, cache, x_star)
        return jnp.sum(mean) + jnp.sum(var)

    fn = jax.jit(predict)
    float(fn(params, x, cache_a, x_star))  # warm both cache shapes
    float(fn(params, x, cache_b, x_star))

    times = {"auto": [], "nystrom": []}
    for rep in range(6):
        for name, cache in (("auto", cache_a), ("nystrom", cache_b)):
            t0 = time.perf_counter()
            for _ in range(5):
                float(fn(params, x, cache, x_star))
            dt = (time.perf_counter() - t0) / 5
            times[name].append(dt)
    for name, ts in times.items():
        rates = sorted(m / t for t in ts)
        print(f"{name}: points/s min={rates[0]:.0f} med={rates[len(rates)//2]:.0f} "
              f"max={rates[-1]:.0f}  (ms/batch: "
              f"{', '.join(f'{t*1e3:.1f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
