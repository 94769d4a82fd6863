"""Mesh + sharding helpers for the operator engine.

TPU-native replacement for the reference's multi-device story
(CatLinearOperator ``output_device`` block scatter,
cat_linear_operator.py:306-350; ``.to/.cuda`` moves, _linear_operator.py:
2606-2631).  Instead of explicit per-device loops, operators' leaves carry
``NamedSharding``s and the jit'd solves run SPMD:

* ``data`` axis: batches of independent systems (the reference's broadcast
  batch dims) — embarrassingly parallel, no collectives except convergence
  reductions.
* ``model`` axis: the matrix dimension N — row-sharded mat-vecs whose inner
  products become ``psum`` over ICI (the engine's whole communication
  surface, SURVEY.md section 5).

Everything is GSPMD: we annotate shardings with ``jax.device_put`` /
``jax.lax.with_sharding_constraint`` and let XLA insert collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int | None = None, model: int | None = None
) -> Mesh:
    """Build a (data, model) mesh over available devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None and model is None:
        data, model = n_devices, 1
    elif data is None:
        data = n_devices // model
    elif model is None:
        model = n_devices // data
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def shard_gp_batch(mesh: Mesh, x: jax.Array, y: jax.Array):
    """Shard a batch of GP datasets: batch over ``data``, N over ``model``."""
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model", None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "model")))
    return xs, ys


def sharded_train_step(model, optimizer, mesh: Mesh):
    """Build a jitted sharded training step for ExactGPRegression.

    The returned function maps (params, opt_state, x, y, key) -> (params,
    opt_state, loss) with x: (B, n, d) sharded (data, model, None) and y:
    (B, n) sharded (data, model).  Kernel mat-vecs inside CG are row-sharded
    over ``model``; CG inner products and the loss mean reduce with psum —
    all inserted by GSPMD.
    """

    def step(params, opt_state, x, y, key):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", "model", None))
        )
        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(mesh, P("data", "model"))
        )
        loss, grads = jax.value_and_grad(
            lambda p: model.neg_mll(p, x, y, key=key)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step)
