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
