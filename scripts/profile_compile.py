"""Compile-time profile of the bench configs (VERDICT r4 #4).

Splits the cold cost of each jitted bench computation into
* trace+lower (host-side: Python tracing -> StableHLO), and
* backend compile (XLA; remote over the axon tunnel on TPU),
and reports HLO module size as a duplication proxy.

Usage:
    python scripts/profile_compile.py          # CPU (local XLA compile)
    python scripts/profile_compile.py --tpu    # axon backend (remote compile)

On CPU the backend-compile seconds are NOT the TPU numbers, but the
trace/lower split and module sizes are backend-independent, and relative
changes (e.g. deduping a repeated solve subgraph) show up identically.
"""

import sys
import time

if "--tpu" not in sys.argv[1:]:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")


def profile(name, jitted, args):
    t0 = time.perf_counter()
    lowered = jitted.lower(*args)
    t_lower = time.perf_counter() - t0
    text = lowered.as_text()
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(
        f"{name:28s} lower {t_lower:6.2f} s   compile {t_compile:7.2f} s   "
        f"stablehlo {len(text)/1e6:6.2f} MB  ({text.count(chr(10))} lines)",
        flush=True,
    )


def main():
    import bench

    fn, (params, x, y) = bench.build_benchmark()
    profile("mll_n100k fwd", fn, (params, x, y))

    grad_fn = jax.jit(jax.value_and_grad(fn.__wrapped__))
    profile("mll_n100k value_and_grad", grad_fn, (params, x, y))

    # LOVE cache build — the measured 138 s cold-compile worst case
    from linear_operator_tpu import settings
    from linear_operator_tpu.models import ExactGPRegression

    model = ExactGPRegression(block_rows=8192)
    n, d = 100_000, 3
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)
    params = model.init_params(d)

    def build_cache(params, x, y):
        with settings.max_cholesky_size(0), settings.max_cg_iterations(100), \
             settings.cg_tolerance(1.0), settings.preconditioner_mode("auto"), \
             settings.max_root_decomposition_size(100):
            return model.posterior_cache(params, x, y, key=jax.random.PRNGKey(2))

    profile("love_cache_build", jax.jit(build_cache), (params, x, y))

    m = 64
    x_star = jax.random.normal(jax.random.PRNGKey(3), (m, d), dtype=jnp.float32)

    def predict(params, x, y, x_star):
        with settings.max_cholesky_size(0), settings.max_cg_iterations(100), \
             settings.cg_tolerance(1.0), settings.preconditioner_mode("auto"):
            mean, var = model.posterior(params, x, y, x_star)
        return jnp.sum(mean) + jnp.sum(var)

    profile("posterior_m64", jax.jit(predict), (params, x, y, x_star))


if __name__ == "__main__":
    main()
