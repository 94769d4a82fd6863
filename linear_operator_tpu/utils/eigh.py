"""Degeneracy-safe differentiable symmetric eigendecomposition.

``jnp.linalg.eigh``'s JVP contains 1/(lambda_j - lambda_i) factors that go
NaN for (near-)repeated eigenvalues — e.g. a Kronecker task kernel at its
isotropic initialization.  For downstream functions that are invariant to
rotations within a degenerate eigenspace (solves, logdets, quadratic forms —
everything this library builds from eigh), the within-block rotation
component of the eigenvector derivative is pure gauge: zeroing it yields the
correct total derivative instead of NaN.

(The reference dodges this by running such paths under torch.symeig's
float64 with distinct-eigenvalue luck, settings.py:186-191; zeroing the
gauge term is the principled fix.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def eigh_safe(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Like ``jnp.linalg.eigh`` (ascending eigenvalues) with a JVP that is
    finite under degenerate eigenvalues (gauge term zeroed)."""
    return jnp.linalg.eigh(a)


@eigh_safe.defjvp
def _eigh_safe_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    w, v = jnp.linalg.eigh(a)
    da_sym = 0.5 * (da + jnp.swapaxes(da, -1, -2))
    vt_da_v = jnp.swapaxes(v, -1, -2) @ da_sym @ v
    dw = jnp.diagonal(vt_da_v, axis1=-2, axis2=-1)
    diff = w[..., None, :] - w[..., :, None]  # lambda_j - lambda_i
    scale = jnp.max(jnp.abs(w), axis=-1, keepdims=True)[..., None]
    safe = jnp.abs(diff) > 1e-12 * (scale + 1e-30)
    f = jnp.where(safe, 1.0 / jnp.where(safe, diff, 1.0), 0.0)
    dv = v @ (f * vt_da_v)
    return (w, v), (dw, dv)
