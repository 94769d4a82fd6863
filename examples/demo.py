"""Tour of linear_operator_tpu — the reference README's demos, TPU-native.

Mirrors the use cases in the reference README.md:40-260 and
examples/LinearOperator_demo.ipynb (structured solves, composition, custom
operators, sampling) on the JAX/TPU engine.  Runs on CPU or a TPU chip:

    python examples/demo.py            # moderate sizes (CPU-friendly)
    python examples/demo.py --big      # the 10M x 10M Woodbury demo

Everything is jitted — on TPU the first call of each section pays one
compile, after which steady-state timings are printed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

# python puts the SCRIPT's dir (examples/) on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import linear_operator_tpu as lo  # noqa: E402
from linear_operator_tpu.operators import (
    DiagLinearOperator,
    KroneckerProductLinearOperator,
    LowRankRootLinearOperator,
    RootLinearOperator,
    ToeplitzLinearOperator,
)


def _fence(x) -> float:
    """Host-transfer fence (block_until_ready is not reliable on all
    backends; a scalar fetch is)."""
    return float(jnp.sum(x))


def section(title: str) -> None:
    print(f"\n=== {title} " + "=" * max(0, 60 - len(title)))


def demo_woodbury(n: int, rank: int = 20) -> None:
    """A = C C^T + diag(d) solved in O(n r^2) — never materialized.

    Reference README.md:55-134: the 10M x 10M low-rank-plus-diagonal solve.
    """
    section(f"Woodbury solve: N={n:,}, rank={rank}")
    key = jax.random.PRNGKey(0)
    kc, kd, kb = jax.random.split(key, 3)
    c = jax.random.normal(kc, (n, rank), dtype=jnp.float32) / jnp.sqrt(rank)
    d = jax.random.uniform(kd, (n,), dtype=jnp.float32) + 0.5
    b = jax.random.normal(kb, (n,), dtype=jnp.float32)

    a = LowRankRootLinearOperator(c) + DiagLinearOperator(d)
    print(f"operator: {type(a).__name__}, shape {a.shape}")

    @jax.jit
    def solve(a, b):
        return a.solve(b[:, None])[:, 0]

    x = solve(a, b)
    _fence(x)
    t0 = time.perf_counter()
    x = solve(a, b)
    _fence(x)
    dt = time.perf_counter() - t0

    # Normwise backward error eta = ||Ax-b|| / (||A|| ||x|| + ||b||).  The
    # PLAIN relative residual ||Ax-b||/||b|| is the wrong metric here:
    # ||A||_2 ~ n/rank (top eigenvalues of the Gaussian rank-20 factor grow
    # linearly with n), so kappa(A)*eps_f32 floors it at ~6e-3 for n=1e6 —
    # just ROUNDING the exact solution to f32 produces that.  eta ~ 1e-7
    # certifies a backward-stable solve at any n.  HIGHEST precision keeps
    # the bf16 MXU out of the measurement itself.
    @jax.jit
    def backward_error(c, d, x, b):
        hp = jax.lax.Precision.HIGHEST
        ct_x = jnp.einsum("nr,n->r", c, x, precision=hp)
        ax = jnp.einsum("nr,r->n", c, ct_x, precision=hp) + d * x
        gram = jnp.einsum("nr,ns->rs", c, c, precision=hp)
        a_norm = jnp.linalg.eigvalsh(gram)[-1] + jnp.max(d)
        return jnp.linalg.norm(ax - b) / (
            a_norm * jnp.linalg.norm(x) + jnp.linalg.norm(b)
        )

    eta = backward_error(c, d, x, b)
    print(
        f"solve: {dt*1e3:.2f} ms steady-state, "
        f"normwise backward error {float(eta):.2e}"
    )


def demo_custom_operator() -> None:
    """Defining a new operator takes a dataclass + 3 primitives.

    Reference README.md:146-185 defines DiagLinearOperator from scratch; here
    the same operator is a frozen pytree dataclass — gradients, jit, and all
    ~90 derived methods come from the base class.
    """
    section("Custom operator in ~15 lines")
    from linear_operator_tpu._pytree import operator_class
    from linear_operator_tpu.operators import LinearOperator

    @operator_class
    class MyDiag(LinearOperator):
        diag: jax.Array

        def _shape(self):
            return (*self.diag.shape, self.diag.shape[-1])

        def _matmul(self, rhs):
            return self.diag[..., :, None] * rhs

        def _transpose(self):
            return self

        def logdet(self):  # optional structure-exploiting override
            return jnp.sum(jnp.log(self.diag), axis=-1)

    d = MyDiag(jnp.array([1.0, 2.0, 3.0]))
    print("matmul:", d @ jnp.array([4.0, 5.0, 6.0]))
    print("logdet:", float(d.logdet()))
    print("grad of logdet wrt diag:", jax.grad(lambda x: MyDiag(x).logdet())(d.diag))


def demo_composite(n1: int = 200, n2: int = 100) -> None:
    """Kronecker + Root(Toeplitz): a 20,000 x 20,000 sub-O(N^3) solve.

    Reference README.md:240-258 — composition keeps track of structure; the
    solve routes through matrix-free CG with structured mat-vecs (Kronecker
    factor contractions + FFT Toeplitz products).
    """
    n = n1 * n2
    section(f"Composite Kronecker + Toeplitz-root solve: N={n:,}")
    key = jax.random.PRNGKey(1)
    k1, k2, k3, kb = jax.random.split(key, 4)
    m1 = jax.random.normal(k1, (n1, n1))
    m1 = m1 @ m1.T / n1 + jnp.eye(n1)
    m2 = jax.random.normal(k2, (n2, n2))
    m2 = m2 @ m2.T / n2 + jnp.eye(n2)
    col = jnp.concatenate([jnp.array([2.0]), 0.5 ** jnp.arange(1, n)])
    b = jax.random.normal(kb, (n,))

    a = KroneckerProductLinearOperator((m1, m2)) + RootLinearOperator(
        ToeplitzLinearOperator(col)
    )
    print(f"operator: {a.shape} {type(a).__name__}")

    @jax.jit
    def solve(a, b):
        with lo.settings.max_cholesky_size(1):  # force the iterative path
            return a.solve(b[:, None])[:, 0]

    x = solve(a, b)
    _fence(x)
    t0 = time.perf_counter()
    x = solve(a, b)
    _fence(x)
    dt = time.perf_counter() - t0
    resid = jnp.linalg.norm(a @ x[:, None] - b[:, None]) / jnp.linalg.norm(b)
    print(f"CG solve: {dt*1e3:.1f} ms steady-state, relative residual {float(resid):.2e}")


def demo_gp_mll(n: int = 4096, d: int = 3) -> None:
    """The BBMM workflow: kernel operator -> CG solve + SLQ logdet -> grads.

    The marginal log likelihood of a GP and its hyperparameter gradients,
    computed matrix-free (reference functions/_inv_quad_logdet.py) — the
    N=100k version of this is bench.py's headline metric.
    """
    section(f"GP marginal likelihood + gradients: n={n:,}")
    key = jax.random.PRNGKey(2)
    kx, ky, kp = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, d))
    y = jnp.sin(x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))

    def neg_mll(params):
        k = lo.rbf_kernel_operator(
            x,
            lengthscale=params["ls"],
            outputscale=params["os"],
        ).add_diagonal(params["noise"])
        with lo.settings.max_cholesky_size(1):
            inv_quad, logdet = k.inv_quad_logdet(y[:, None], logdet=True, key=kp)
        return 0.5 * (inv_quad + logdet)

    params = {"ls": jnp.float32(0.9), "os": jnp.float32(1.0), "noise": jnp.float32(0.1)}
    val_and_grad = jax.jit(jax.value_and_grad(neg_mll))
    v, g = val_and_grad(params)
    _fence(v)
    t0 = time.perf_counter()
    v, g = val_and_grad(params)
    _fence(v)
    dt = time.perf_counter() - t0
    print(f"-MLL = {float(v):.1f}  ({dt*1e3:.1f} ms steady-state)")
    print("grads:", {k_: float(v_) for k_, v_ in g.items()})


def demo_sampling(n1: int = 64, n2: int = 64) -> None:
    """Sampling a structured MVN without ever forming the covariance.

    Reference README.md:210-235: cov = Kronecker product; rsample draws route
    through the structure-exploiting root decomposition (factor-wise here —
    no Lanczos needed for a Kronecker operator).
    """
    n = n1 * n2
    section(f"Structured MVN sampling: N={n:,} (Kronecker covariance)")
    key = jax.random.PRNGKey(3)
    k1, k2, ks = jax.random.split(key, 3)
    m1 = jax.random.normal(k1, (n1, n1))
    m1 = m1 @ m1.T / n1 + 0.1 * jnp.eye(n1)
    m2 = jax.random.normal(k2, (n2, n2))
    m2 = m2 @ m2.T / n2 + 0.1 * jnp.eye(n2)
    cov = KroneckerProductLinearOperator((m1, m2))

    @jax.jit
    def draw(cov, key):
        return cov.zero_mean_mvn_samples(8, key=key)

    samples = draw(cov, ks)
    print(f"samples: {samples.shape}")
    # rowvar=False: coordinates are the variables, the 8 draws are the
    # observations — emp[0, 0] is the across-sample variance of coordinate 0
    emp = jnp.cov(samples.reshape(8, n), rowvar=False)
    print(
        "empirical 8-sample variance of first coordinate "
        f"{float(emp[0, 0]):.3f} vs exact {float(cov.diagonal()[0]):.3f}"
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true", help="run the 10M Woodbury demo")
    args = p.parse_args()

    print(f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}")
    demo_woodbury(10_000_000 if args.big else 1_000_000)
    demo_custom_operator()
    demo_composite()
    demo_gp_mll()
    demo_sampling()
    print("\nAll demos done.")


if __name__ == "__main__":
    main()
