"""Stochastic Lanczos Quadrature (reference: linear_operator/utils/stochastic_lq.py:9-82).

tr(f(K)) ~= (n / m) * sum_j (e1^T V_j)^2 f(lambda_j) summed over the Ritz
pairs of each probe's Lanczos tridiagonal matrix, for unit-norm start probes.
Evaluates several functions ``f`` in one pass over the shared eigenpairs,
exactly like the reference.

The identity-padded tridiagonal convention (see solvers/linear_cg.py) is
honored here: padded Ritz pairs have eigenvalue 1 and first-eigenvector
component 0, so their quadrature weight vanishes; eigenvalues clamped to 0 by
``lanczos_tridiag_to_diag`` are masked out of the weights before applying
``f`` so that ``log`` never sees 0.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def slq_quadrature(
    matrix_size: int,
    evals: jax.Array,  # (nt, *b, k) Ritz values per probe
    evecs: jax.Array,  # (nt, *b, k, k) Ritz vectors per probe
    funcs: Sequence[Callable[[jax.Array], jax.Array]],
) -> list[jax.Array]:
    """Return [tr_est(f) for f in funcs], each of shape (*b,).

    Mirrors reference ``StochasticLQ.to_dense`` (stochastic_lq.py:45-82):
    weights are the squared first components of the Ritz vectors; probes are
    averaged; the estimate is scaled by ``matrix_size``.
    """
    weights = evecs[..., 0, :] ** 2  # (nt, *b, k)
    valid = evals > 0
    safe_evals = jnp.where(valid, evals, 1.0)
    weights = jnp.where(valid, weights, 0.0)

    results = []
    for f in funcs:
        per_probe = jnp.sum(weights * f(safe_evals), axis=-1)  # (nt, *b)
        results.append(matrix_size * jnp.mean(per_probe, axis=0))  # (*b,)
    return results


class StochasticLQ:
    """Porting shim matching the reference class API (stochastic_lq.py:9-82).

    The native entry point here is :func:`slq_quadrature` (plus
    ``solvers.lanczos_tridiag`` for the tridiagonalization); this class adapts
    the reference's object-style workflow —
    ``lanczos_batch(matmul_closure, rhs_vectors)`` then
    ``to_dense(matrix_shape, evals, evecs, funcs)`` — onto those functions so
    ported code runs unchanged.
    """

    def __init__(self, max_iter: int = 15, num_random_probes: int = 10):
        self.max_iter = max_iter
        self.num_random_probes = num_random_probes

    def lanczos_batch(
        self, matmul_closure: Callable[[jax.Array], jax.Array], rhs_vectors: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """``rhs_vectors`` (*b, n, p) -> (Q (p, *b, n, k), T (p, *b, k, k)).

        Probes move to a leading axis (the reference's ``num_init_vecs`` dim,
        lanczos.py:62-66); ``matmul_closure`` must broadcast over batch dims,
        which every ``LinearOperator.matmul`` here does.
        """
        from .lanczos import lanczos_tridiag

        init = jnp.moveaxis(rhs_vectors, -1, 0)  # (p, *b, n)
        res = lanczos_tridiag(matmul_closure, self.max_iter, init_vecs=init)
        return res.q_mat, res.t_mat

    def to_dense(
        self,
        matrix_shape: Sequence[int],
        eigenvalues: jax.Array,
        eigenvectors: jax.Array,
        funcs: Sequence[Callable[[jax.Array], jax.Array]],
    ) -> list[jax.Array]:
        """tr(f(A)) estimates from per-probe Ritz pairs (reference :45-82)."""
        return slq_quadrature(matrix_shape[-1], eigenvalues, eigenvectors, funcs)
