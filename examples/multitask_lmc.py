"""LMC multitask GP via a multi-output KernelLinearOperator.

Demonstrates the round-4 kernel capabilities (reference
kernel_linear_operator.py:130-134): a covariance closure that RETURNS a lazy
LinearOperator — here the LMC/ICM structure K_xx (x) (B B^T) as a
KroneckerProductLinearOperator — wrapped in a KernelLinearOperator with
``num_outputs_per_input=(T, T)``, trained end-to-end with jax.grad through
the CG+SLQ marginal likelihood.

Run: python examples/multitask_lmc.py   (CPU or TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    KroneckerProductLinearOperator,
    RootLinearOperator,
)
from linear_operator_tpu.operators.kernel import KernelLinearOperator, rbf_covar
from linear_operator_tpu.functions import inv_quad_logdet

T = 2  # tasks


def lmc_covar(x1, x2, lengthscale, outputscale, lmc_coeffs):
    """k((x,i),(x',j)) = k_rbf(x,x') * (B B^T)_ij, returned lazily."""
    K_xx = rbf_covar(x1, x2, lengthscale, outputscale)
    return KroneckerProductLinearOperator(K_xx, RootLinearOperator(lmc_coeffs))


def make_operator(params, x):
    op = KernelLinearOperator(
        x,
        x,
        {
            "lengthscale": jax.nn.softplus(params["raw_ls"]),
            "outputscale": jax.nn.softplus(params["raw_os"]),
            "lmc_coeffs": params["lmc"],
        },
        covar_func=lmc_covar,
        num_outputs_per_input=(T, T),
        nonbatch_dims=(("lengthscale", 0), ("outputscale", 0), ("lmc_coeffs", 2)),
        symmetric=True,
    )
    noise = jax.nn.softplus(params["raw_noise"]) + 1e-4
    return op.add_diagonal(noise)


def neg_mll(params, x, y_flat, key):
    K = make_operator(params, x)  # (n*T, n*T)
    with settings.max_cholesky_size(0), settings.cg_tolerance(1e-2), \
         settings.num_trace_samples(16), settings.max_cg_iterations(200):
        iq, ld = inv_quad_logdet(K, y_flat[:, None], logdet=True, key=key)
    n_total = y_flat.shape[0]
    return 0.5 * (iq + ld + n_total * jnp.log(2 * jnp.pi)) / n_total


def main():
    n, d = 256, 2
    kx, ke = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    # two correlated tasks of a shared latent function
    f = jnp.sin(2.0 * x[:, 0]) * jnp.cos(x[:, 1])
    y = jnp.stack([f, 0.7 * f + 0.2 * x[:, 0]], axis=-1)
    y = y + 0.05 * jax.random.normal(ke, y.shape, dtype=jnp.float32)
    y_flat = y.reshape(-1)  # interleaved (point-major) layout = Kron(K, B)

    params = {
        "raw_ls": jnp.asarray(0.5, jnp.float32),
        "raw_os": jnp.asarray(0.5, jnp.float32),
        "raw_noise": jnp.asarray(-2.0, jnp.float32),
        "lmc": jnp.eye(T, dtype=jnp.float32) + 0.1,
    }

    loss_grad = jax.jit(jax.value_and_grad(neg_mll))
    lr = 0.1
    for step in range(100):
        val, g = loss_grad(params, x, y_flat, jax.random.PRNGKey(step))
        params = jax.tree_util.tree_map(lambda p, gi: p - lr * gi, params, g)
        if step % 20 == 0 or step == 99:
            print(f"step {step:3d}  -MLL/n = {float(val):.4f}")

    B = params["lmc"]
    task_cov = B @ B.T
    corr = task_cov[0, 1] / jnp.sqrt(task_cov[0, 0] * task_cov[1, 1])
    print(f"learned task correlation: {float(corr):.3f} (generator: strongly positive)")
    assert float(corr) > 0.5, "expected positive inter-task correlation"
    print("multitask LMC demo done.")


if __name__ == "__main__":
    main()
