"""Numerically stable QR (reference: linear_operator/utils/qr.py:9-37).

The reference dispatches small problems to CPU (``stable_qr_cpu_threshold``)
and jitters near-singular R; on TPU we stay on-device (the setting is kept
for API parity) and apply the same diagonal regularization when R is
near-singular — trace-safely with ``jnp.where`` instead of a Python branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stable_qr(mat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """QR with regularization of a near-singular R (*b, m, n) -> Q, R."""
    q, r = jnp.linalg.qr(mat)
    diag = jnp.diagonal(r, axis1=-2, axis2=-1)
    max_diag = jnp.max(jnp.abs(diag), axis=-1, keepdims=True)
    bad = jnp.abs(diag) < 1e-10 * jnp.maximum(max_diag, 1e-30)
    # bump dead diagonal entries so downstream triangular solves stay finite
    bump = jnp.where(bad, jnp.sign(diag) + (diag == 0), 0.0) * 1e-8 * jnp.maximum(
        max_diag, 1.0
    )
    n = r.shape[-1]
    idx = jnp.arange(n)
    r = r.at[..., idx, idx].add(bump)
    return q, r


def stable_pinverse(mat: jax.Array) -> jax.Array:
    """Pseudo-inverse via QR + triangular solve (reference
    utils/pinverse.py:10-19): pinv(A) = R^{-1} Q^T for tall full-rank A."""
    if mat.shape[-2] >= mat.shape[-1]:
        q, r = stable_qr(mat)
        eye = jnp.broadcast_to(
            jnp.eye(r.shape[-1], dtype=mat.dtype), r.shape[:-2] + r.shape[-2:]
        )
        rinv = jax.lax.linalg.triangular_solve(r, eye, left_side=True, lower=False)
        return rinv @ jnp.swapaxes(q, -1, -2)
    return jnp.swapaxes(stable_pinverse(jnp.swapaxes(mat, -1, -2)), -1, -2)
