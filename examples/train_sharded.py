"""Multi-chip GP training over a (data, model, probe) device mesh.

The north-star workflow (SURVEY.md section 2g / docs/parallel.md): a batch
of GP systems data-parallel over ``data``, each system's matrix dimension N
row-sharded over ``model`` (kernel mat-vecs inside CG become per-device
partial products + psum), and the Hutchinson probe columns over ``probe``.
GSPMD inserts every collective; the model code is the ordinary
``ExactGPRegression``.

Runs anywhere — on a multi-chip TPU host it uses the real chips; on CPU,
fake a mesh first:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_sharded.py

(On this repo's tunneled single-TPU dev box, run the CPU form above; the
jitted step is identical on real chips.)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

# python puts the SCRIPT's dir (examples/) on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linear_operator_tpu import settings  # noqa: E402
from linear_operator_tpu.models import ExactGPRegression  # noqa: E402
from linear_operator_tpu.parallel import (  # noqa: E402
    make_mesh,
    shard_gp_batch,
    sharded_train_step,
)


def main():
    n_dev = len(jax.devices())
    model_axis = 2 if n_dev % 2 == 0 else 1
    probe_axis = 2 if n_dev % 4 == 0 else None
    mesh = make_mesh(n_dev, model=model_axis, probe=probe_axis)
    print(f"devices: {n_dev}, mesh axes: {dict(mesh.shape)}")

    # a batch of B independent GP systems (the data-parallel axis)
    B, n, d = mesh.shape["data"] * 2, 1024 * model_axis, 3
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[..., 0]) + 0.1 * jax.random.normal(
        ky, (B, n), dtype=jnp.float32
    )
    xs, ys = shard_gp_batch(mesh, x, y)  # device_put with NamedShardings

    model = ExactGPRegression(block_rows=min(n, 4096))
    params = model.init_params(d)
    optimizer = optax.adam(5e-2)
    opt_state = optimizer.init(params)
    step = sharded_train_step(model, optimizer, mesh)

    with mesh, settings.max_cholesky_size(0), settings.num_trace_samples(8), \
         settings.max_cg_iterations(60), settings.cg_tolerance(1e-4), \
         settings.min_preconditioning_size(10**9):
        t0 = time.perf_counter()
        for it in range(20):
            params, opt_state, loss = step(
                params, opt_state, xs, ys, jax.random.PRNGKey(it)
            )
            if it % 5 == 0 or it == 19:
                print(f"step {it:3d}  loss {float(loss):.5f}")
        dt = time.perf_counter() - t0
    print(f"20 sharded steps in {dt:.1f}s ({20 * B / dt:.1f} GP-systems-steps/s)")


if __name__ == "__main__":
    main()
