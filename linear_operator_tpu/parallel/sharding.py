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
    n_devices: int | None = None,
    data: int | None = None,
    model: int | None = None,
    probe: int | None = None,
) -> Mesh:
    """Build a (data, model[, probe]) mesh over available devices.

    The ``probe`` axis shards the Hutchinson trace-probe dimension of
    ``inv_quad_logdet`` (SURVEY.md section 2g: the probe dim is
    embarrassingly parallel — probe averaging becomes a psum).  Omitted ->
    the classic 2-axis (data, model) mesh.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    axes = n_devices
    if probe is not None:
        axes //= probe
    if data is None and model is None:
        data, model = axes, 1
    elif data is None:
        data = axes // model
    elif model is None:
        model = axes // data
    # when the requested axes don't tile n_devices evenly (e.g. data=2,
    # model=2 on an 8-device host, or probe=3 on 8), use the first
    # data*model*probe devices instead of crashing in reshape
    used = data * model * (probe if probe is not None else 1)
    if used == 0 or used > len(devices):
        axes_txt = f"data={data}, model={model}" + (
            f", probe={probe}" if probe is not None else ""
        )
        raise ValueError(
            f"mesh ({axes_txt}) does not fit {len(devices)} devices"
            + (
                " (a requested axis exceeds the device count)"
                if used == 0
                else f" (needs {used})"
            )
        )
    if used < len(devices):
        import warnings

        warnings.warn(
            f"make_mesh uses only {used} of {len(devices)} available devices "
            f"(data={data} x model={model}"
            + (f" x probe={probe}" if probe is not None else "")
            + " does not tile the device count); the rest idle. Pick axes "
            "whose product equals the device count to use all chips.",
            UserWarning,
            stacklevel=2,
        )
    devices = devices[:used]
    if probe is None:
        dev_array = np.asarray(devices).reshape(data, model)
        return Mesh(dev_array, axis_names=("data", "model"))
    dev_array = np.asarray(devices).reshape(data, model, probe)
    return Mesh(dev_array, axis_names=("data", "model", "probe"))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Multi-host initialization: one call per host BEFORE any device use,
    then ``jax.devices()`` spans all hosts and ``make_mesh`` can lay axes
    over ICI within a host and DCN across hosts.

    Thin wrapper over ``jax.distributed.initialize`` (the reference has no
    multi-node runtime at all — SURVEY.md section 2g; this is the TPU-native
    entry point for it).  With TPU pods all arguments are auto-detected from
    the environment; on CPU/GPU clusters pass coordinator/process counts.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def _current_physical_mesh() -> Mesh | None:
    try:
        from jax._src.mesh import thread_resources

        mesh = thread_resources.env.physical_mesh
        # the empty Mesh() has a 0-d devices array whose .size is 1 — test
        # for axes, not elements
        return mesh if mesh.axis_names else None
    except Exception:  # pragma: no cover
        return None


def maybe_shard_probes(arr: jax.Array) -> jax.Array:
    """Constrain a (batch of) stacked-probes/rhs array to the ambient mesh:
    trailing (probe/column) dim over ``probe``, the -2 dim (matrix N) over
    ``model``, and the leading batch dim over ``data``.  No-op outside a
    mesh — callers can apply it unconditionally.

    Constraining the FULL spec (including batch) matters: callers apply this
    to both operands of the [probes | rhs] concatenate AND to its result, so
    the concatenate is born in the target layout.  Leaving the batch dim
    unconstrained lets GSPMD propagate a conflicting batch-sharded layout
    into the concatenate and then resolve the mismatch by involuntary full
    rematerialization (replicate-then-reshard) every training step — the
    round-2 defect recorded in MULTICHIP_r02.json."""
    mesh = _current_physical_mesh()
    if mesh is None:
        return arr
    # Under jit, GSPMD pads non-divisible dims transparently; EAGER
    # with_sharding_constraint is an immediate reshard that requires exact
    # divisibility — skip the offending axis there (e.g. the default
    # 10-probes + 1-rhs = 11 columns on a probe=2 mesh) instead of crashing.
    eager = not isinstance(arr, jax.core.Tracer)

    def _ok(dim: int, axis: str) -> bool:
        return not (eager and arr.shape[dim] % mesh.shape[axis] != 0)

    spec = [None] * arr.ndim
    if "probe" in mesh.axis_names and _ok(-1, "probe"):
        spec[-1] = "probe"
    if "model" in mesh.axis_names and arr.ndim >= 2 and _ok(-2, "model"):
        spec[-2] = "model"
    if "data" in mesh.axis_names and arr.ndim >= 3 and _ok(0, "data"):
        spec[0] = "data"
    if all(s is None for s in spec):
        return arr
    return jax.lax.with_sharding_constraint(arr, NamedSharding(mesh, P(*spec)))


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
    import optax

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
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)
