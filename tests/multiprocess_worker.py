"""Worker for tests/test_multiprocess.py — one JAX process in a 2-process
CPU cluster (``jax.distributed`` over gRPC/Gloo, the DCN analog).

Not collected by pytest (no ``test_`` prefix); spawned as a subprocess with
argv = (process_id, num_processes, coordinator_port).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "2axis"

    from linear_operator_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from linear_operator_tpu import settings
    from linear_operator_tpu.models import ExactGPRegression

    assert len(jax.devices()) == 4 * nproc, "cluster did not form"

    # A mesh spanning ALL processes: the model-axis psum inside CG crosses
    # the process boundary — the communication surface a real multi-host DCN
    # deployment exercises.  "3axis" adds a probe axis (Hutchinson probes
    # sharded across processes via maybe_shard_probes' ambient-mesh hook).
    if mode == "3axis":
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(nproc, 2, 2),
            axis_names=("data", "model", "probe"),
        )
    else:
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(nproc * 2, 2),
            axis_names=("data", "model"),
        )
    B, n, d = 8, 32, 2
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((B, n, d)).astype(np.float32)
    y_np = np.sin(3 * x_np[..., 0]).astype(np.float32)

    x = jax.make_array_from_callback(
        x_np.shape, NamedSharding(mesh, P("data", "model", None)), lambda i: x_np[i]
    )
    y = jax.make_array_from_callback(
        y_np.shape, NamedSharding(mesh, P("data", "model")), lambda i: y_np[i]
    )

    model = ExactGPRegression(block_rows=16)
    params = model.init_params(d)

    def loss_fn(p, xx, yy):
        with settings.max_cholesky_size(0), settings.num_trace_samples(4), \
             settings.max_cg_iterations(25), settings.cg_tolerance(1e-6), \
             settings.min_preconditioning_size(10**9):
            return model.neg_mll(p, xx, yy, key=jax.random.PRNGKey(7))

    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, x, y)
    loss_v = float(loss)

    # single-process reference on this process's local devices
    ref, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        params, jnp.asarray(x_np), jnp.asarray(y_np)
    )
    np.testing.assert_allclose(loss_v, float(ref), rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(ref_grads)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    print(f"[{pid}] MULTIPROCESS_PARITY_OK loss={loss_v:.6f}", flush=True)


if __name__ == "__main__":
    main()
