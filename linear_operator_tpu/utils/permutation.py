"""Permutation utilities (reference: linear_operator/utils/permutation.py:9-102)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_permutation(
    matrix, left_permutation: jax.Array | None = None,
    right_permutation: jax.Array | None = None,
):
    """Compute P_left @ M @ P_right^T by row/column gathers, supporting
    *partial* left permutations (fewer rows out than in) like the reference.
    ``matrix`` may be a LinearOperator or array."""
    from ..operators._linear_operator import LinearOperator

    dense = matrix.to_dense() if isinstance(matrix, LinearOperator) else jnp.asarray(matrix)
    if left_permutation is not None:
        dense = jnp.take_along_axis(
            dense,
            jnp.broadcast_to(
                left_permutation[..., :, None],
                (*dense.shape[:-2], left_permutation.shape[-1], dense.shape[-1]),
            ),
            axis=-2,
        )
    if right_permutation is not None:
        dense = jnp.take_along_axis(
            dense,
            jnp.broadcast_to(
                right_permutation[..., None, :],
                (*dense.shape[:-1], right_permutation.shape[-1]),
            ),
            axis=-1,
        )
    return dense


def inverse_permutation(permutation: jax.Array) -> jax.Array:
    """argsort of a permutation is its inverse (reference :~90)."""
    return jnp.argsort(permutation, axis=-1)
