"""Scaling-efficiency harness (BASELINE config 5 / north-star metric).

Measures solves/s of the sharded GP marginal-likelihood step at increasing
device counts over a (data, model) mesh and reports efficiency relative to
linear scaling.  On real multi-chip hardware this measures ICI collectives;
under ``--xla_force_host_platform_device_count`` it validates the collective
LAYOUT (that the sharded program compiles and the reductions are placed) —
the reference has no analog (its multi-device story is CatLinearOperator's
per-GPU python loop, cat_linear_operator.py:306-350).
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import settings
from ..models import ExactGPRegression
from .sharding import make_mesh, shard_gp_batch


def mll_throughput(
    mesh,
    *,
    batch_per_device: int = 1,
    n: int = 16384,
    d: int = 3,
    num_probes: int = 10,
    block_rows: int = 4096,
    reps: int = 3,
) -> float:
    # default n=16384: large enough that the row-sharded kernel mat-vec
    # (not CG epilogue overhead) dominates, so the report is sensitive to a
    # collectives/layout regression (VERDICT r2 item 5)
    """solves/s of the forward+backward sharded neg-MLL on this mesh.

    The kernel engine always STREAMS blocks here (materialize_threshold
    None): the per-solve K cache gates on total bytes, so it would flip
    between caching at B=1 and streaming at larger device counts —
    different engines across the efficiency curve would make the scaling
    numbers meaningless."""
    model = ExactGPRegression(block_rows=block_rows, materialize_threshold=None)
    B = mesh.shape["data"] * batch_per_device
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, n, d), dtype=jnp.float32)
    y = jnp.sin(3.0 * x[..., 0])
    params = model.init_params(d)
    xs, ys = shard_gp_batch(mesh, x, y)

    def loss(params, x, y):
        with settings.max_cholesky_size(0), settings.num_trace_samples(num_probes), \
             settings.max_cg_iterations(100), settings.cg_tolerance(1.0), \
             settings.min_preconditioning_size(10**9):
            return model.neg_mll(params, x, y, key=jax.random.PRNGKey(1))

    grad_fn = jax.jit(jax.grad(loss))
    with mesh:
        g = grad_fn(params, xs, ys)
        float(g.raw_noise)  # fence (block_until_ready is unreliable on axon)
        t0 = time.perf_counter()
        for _ in range(reps):
            g = grad_fn(params, xs, ys)
            float(g.raw_noise)
        dt = (time.perf_counter() - t0) / reps
    return B / dt  # independent GP systems per second


def scaling_report(
    device_counts: Sequence[int] | None = None,
    *,
    model_axis: int = 1,
    probe_axis: int | None = None,
    **kwargs,
) -> dict:
    """Throughput + efficiency vs the smallest device count.

    ``model_axis`` / ``probe_axis`` split each device count across the
    matrix-dim and trace-probe mesh axes (SURVEY.md section 2g); the default
    is pure data parallelism.
    """
    if device_counts is None:
        n_dev = len(jax.devices())
        device_counts = [c for c in (1, 2, 4, 8) if c <= n_dev]
    results = {}
    base = None
    for c in device_counts:
        divisor = model_axis * (probe_axis or 1)
        if c % divisor:
            continue
        mesh = make_mesh(
            c,
            model=model_axis,
            probe=probe_axis if (probe_axis or 1) > 1 else None,
        )
        thr = mll_throughput(mesh, **kwargs)
        if base is None:
            base = thr / c
        results[c] = {
            "solves_per_s": thr,
            "efficiency": thr / (base * c),
            "mesh": dict(mesh.shape),
        }
    return results
