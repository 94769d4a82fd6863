"""Training the model families end-to-end with optax.

The reference leaves models to GPyTorch; this package ships the downstream
consumers (models/) so the operator engine is exercised the way GPyTorch
exercises the reference: hyperparameter optimization of the exact GP, the
SKI/KISS-GP structured approximation, and the SGPR inducing-point bound.

    python examples/train_gp.py [--steps 50] [--n 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

# python puts the SCRIPT's dir (examples/) on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linear_operator_tpu.models import (  # noqa: E402
    ExactGPRegression,
    SGPRRegression,
    SKIGPRegression,
    SVGPRegression,
    make_grid,
)


def make_data(key, n: int, d: int = 1):
    kx, kn = jax.random.split(key)
    x = 4.0 * jax.random.uniform(kx, (n, d)) - 2.0
    y = (
        jnp.sin(3.0 * x[:, 0])
        + 0.5 * x[:, 0] ** 2
        + 0.1 * jax.random.normal(kn, (n,))
    )
    return x, y - y.mean()


def train(loss_fn, params, steps: int, lr: float = 0.05, **loss_kwargs):
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        val, grads = jax.value_and_grad(loss_fn)(params, **loss_kwargs)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, val

    val0 = None
    t0 = time.perf_counter()
    for i in range(steps):
        params, state, val = step(params, state)
        if val0 is None:
            val0 = float(val)
    final = float(val)  # host-transfer fence BEFORE reading the clock
    dt = time.perf_counter() - t0
    print(f"  {steps} steps in {dt:.2f}s: loss {val0:.3f} -> {final:.3f}")
    return params


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--n", type=int, default=2000)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    x, y = make_data(key, args.n)
    x_star = jnp.linspace(-2.0, 2.0, 200)[:, None]

    print(f"== Exact GP (n={args.n}): CG/SLQ marginal likelihood")
    gp = ExactGPRegression()
    params = gp.init_params(d=1)
    params = train(
        lambda p_, key=key: gp.neg_mll(p_, x, y, key=key), params, args.steps
    )
    mean, var = gp.posterior(params, x, y, x_star)
    print(f"  posterior mean range [{float(mean.min()):.2f}, {float(mean.max()):.2f}],"
          f" mean predictive sd {float(jnp.sqrt(var).mean()):.3f}")

    print("== SKI / KISS-GP: interpolation onto a Toeplitz grid")
    ski = SKIGPRegression(make_grid(x, [256]))
    params = ski.init_params(d=1)
    params = train(
        lambda p_, key=key: ski.neg_mll(p_, x, y, key=key), params, args.steps
    )
    mean = ski.posterior_mean(params, x, y, x_star)
    print(f"  posterior mean range [{float(mean.min()):.2f}, {float(mean.max()):.2f}]")

    print("== DKL: GP on learned MLP features (end-to-end grads)")
    from linear_operator_tpu.models import DeepKernelGPRegression

    dkl = DeepKernelGPRegression(hidden=(32, 16, 2))
    params = dkl.init_params(d_in=1, key=jax.random.PRNGKey(7))
    params = train(
        lambda p_, key=key: dkl.neg_mll(p_, x, y, key=key), params, args.steps
    )
    mean, var = dkl.posterior(params, x, y, x_star)
    print(f"  posterior mean range [{float(mean.min()):.2f}, {float(mean.max()):.2f}]")

    print("== SGPR: collapsed variational bound, m=64 inducing points")
    sgpr = SGPRRegression()
    params = sgpr.init_params(x, num_inducing=64)
    params = train(lambda p_: sgpr.neg_elbo(p_, x, y), params, args.steps)
    mean, var = sgpr.posterior(params, x, y, x_star)
    print(f"  posterior mean range [{float(mean.min()):.2f}, {float(mean.max()):.2f}]")

    print("== SVGP: minibatch variational bound (batch 256), m=64")
    svgp = SVGPRegression()
    params = svgp.init_params(x, num_inducing=64)
    key_mb = jax.random.PRNGKey(42)
    import optax

    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def svgp_step(params, state, xb, yb):
        val, grads = jax.value_and_grad(svgp.neg_elbo)(
            params, xb, yb, num_data=args.n
        )
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, val

    t0 = time.perf_counter()
    for i in range(args.steps * 4):
        key_mb, k = jax.random.split(key_mb)
        idx = jax.random.choice(k, args.n, (min(256, args.n),), replace=False)
        params, state, val = svgp_step(params, state, x[idx], y[idx])
    float(val)  # host-transfer fence BEFORE reading the clock
    dt = time.perf_counter() - t0
    print(
        f"  {args.steps * 4} minibatch steps in {dt:.2f}s: "
        f"full-data ELBO {float(svgp.elbo(params, x, y)):.1f}"
    )
    mean, var = svgp.posterior(params, x_star)
    print(f"  posterior mean range [{float(mean.min()):.2f}, {float(mean.max()):.2f}]")

    print("\nDone.")


if __name__ == "__main__":
    main()
