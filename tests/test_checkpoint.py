"""Checkpoint / resume story (SURVEY.md section 5).

The reference has NO checkpointing — its only persistence is pickling
operators (reference test/linear_operator_test_case.py:973-981; pickle parity
lives in the shipped harness's test_pickle).  Here operators and model
parameters are pytrees, so the TPU-native checkpoint story is standard JAX:
orbax for on-disk training state, pickle for ad-hoc object persistence.
These tests pin both: a GP training run checkpointed mid-way resumes to the
exact same losses, and a structured operator round-trips through orbax with
its treedef intact.
"""

import pickle
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp

from linear_operator_tpu.models.gp import ExactGPRegression
from linear_operator_tpu.operators import (
    AddedDiagLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    KroneckerProductLinearOperator,
    ToeplitzLinearOperator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _sgd_step(model, params, x, y, lr=0.05):
    loss, g = jax.value_and_grad(model.neg_mll)(params, x, y)
    params = jax.tree_util.tree_map(lambda p, gi: p - lr * gi, params, g)
    return params, loss


class TestOrbaxCheckpoint(BaseTestCase):
    def test_train_checkpoint_resume(self):
        import orbax.checkpoint as ocp

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (64, 2), dtype=jnp.float32)
        y = jnp.sin(x[:, 0]) + 0.1 * jax.random.normal(key, (64,), dtype=jnp.float32)
        model = ExactGPRegression()
        params = model.init_params(2)

        # run 4 steps, checkpoint after step 2, resume, and compare losses
        losses_straight = []
        p = params
        for _ in range(4):
            p, loss = _sgd_step(model, p, x, y)
            losses_straight.append(float(loss))

        p2 = params
        for _ in range(2):
            p2, _ = _sgd_step(model, p2, x, y)

        with tempfile.TemporaryDirectory() as tmp:
            path = Path(tmp) / "ckpt"
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, p2)
            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(path, p2)

        # restored state is bit-identical
        for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(restored)):
            self.assertAllClose(a, b, rtol=0, atol=0)

        p3 = restored
        resumed = []
        for _ in range(2):
            p3, loss = _sgd_step(model, p3, x, y)
            resumed.append(float(loss))
        self.assertAllClose(
            jnp.asarray(resumed), jnp.asarray(losses_straight[2:]), rtol=1e-6, atol=1e-7
        )

    def test_operator_pytree_roundtrip_orbax(self):
        # a nested structured operator: orbax stores the LEAVES; the treedef
        # (= the reference's representation tree) rebuilds the operator.
        import orbax.checkpoint as ocp

        col = 0.5 ** jnp.arange(6.0)
        a = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
        op = AddedDiagLinearOperator(
            KroneckerProductLinearOperator(
                (DenseLinearOperator(a @ a.T + 3 * jnp.eye(3)), ToeplitzLinearOperator(col))
            ),
            DiagLinearOperator(jnp.full((18,), 0.25)),
        )
        leaves, treedef = jax.tree_util.tree_flatten(op)
        with tempfile.TemporaryDirectory() as tmp:
            path = Path(tmp) / "op"
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, leaves)
            with ocp.StandardCheckpointer() as ckptr:
                restored_leaves = ckptr.restore(path, leaves)
        restored = jax.tree_util.tree_unflatten(treedef, restored_leaves)
        self.assertIsInstance(restored, AddedDiagLinearOperator)
        self.assertAllClose(restored.to_dense(), op.to_dense(), rtol=0, atol=0)

    def test_model_params_pickle(self):
        # ad-hoc persistence parity: params NamedTuple pickles losslessly
        model = ExactGPRegression()
        params = model.init_params(3)
        restored = pickle.loads(pickle.dumps(params))
        for a, b in zip(params, restored):
            self.assertAllClose(a, b, rtol=0, atol=0)
