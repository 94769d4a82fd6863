"""Toeplitz function family: construction, indexing, FFT matmul, derivative.

TPU-native rebuild of reference linear_operator/utils/toeplitz.py:10-204.
Differences from the reference:

* Construction is a vectorized index gather (``column[|i-j|]``-style) instead
  of Python loops over entries (reference :40-53) — one XLA gather, jit-safe.
* The circulant-embedding matmul (reference :98-149) uses the real-input FFT
  (``rfft``/``irfft``) of length 2n-1 when the data is real — half the
  transform work of the reference's complex ``fft``.
* ``sym_toeplitz_derivative_quadratic_form`` (reference :164-204 hand-codes
  the ones-on-the-k-th-diagonals quadratic form with two auxiliary Toeplitz
  matmuls) is the VJP of the (linear) map ``c -> T(c) @ v`` evaluated via
  ``jax.vjp`` — identical math, and the FFT-based cotangent XLA derives is
  the same O(n log n) computation.

The symmetric ``ToeplitzLinearOperator`` lives in ``operators/toeplitz.py``;
these are the standalone functional equivalents of the reference's public
utils (including the general non-symmetric column/row form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def toeplitz(toeplitz_column: jax.Array, toeplitz_row: jax.Array) -> jax.Array:
    """Dense Toeplitz matrix from its first column and first row (reference
    utils/toeplitz.py:10-53).  ``T[i, j] = column[i-j]`` for ``i >= j`` else
    ``row[j-i]``; ``column[..., 0]`` must equal ``row[..., 0]`` (T[0, 0]
    would otherwise be ambiguous; not value-checked under jit)."""
    if toeplitz_column.shape != toeplitz_row.shape:
        raise ValueError(
            "column and row must have the same shape (Toeplitz matrices are "
            f"necessarily square); got {toeplitz_column.shape} vs {toeplitz_row.shape}"
        )
    n = toeplitz_column.shape[-1]
    i = jnp.arange(n)
    delta = i[:, None] - i[None, :]  # (n, n), >0 below the diagonal
    from_col = jnp.take_along_axis(
        toeplitz_column[..., None, :],
        jnp.broadcast_to(jnp.abs(delta), (*toeplitz_column.shape[:-1], n, n)),
        axis=-1,
    )
    from_row = jnp.take_along_axis(
        toeplitz_row[..., None, :],
        jnp.broadcast_to(jnp.abs(delta), (*toeplitz_row.shape[:-1], n, n)),
        axis=-1,
    )
    return jnp.where(delta >= 0, from_col, from_row)


def sym_toeplitz(toeplitz_column: jax.Array) -> jax.Array:
    """Dense symmetric Toeplitz matrix (reference :56-64)."""
    return toeplitz(toeplitz_column, toeplitz_column)


def toeplitz_getitem(toeplitz_column, toeplitz_row, i, j) -> jax.Array:
    """``T[i, j]`` of the Toeplitz matrix defined by (column, row)
    (reference :67-81); i/j may be traced index arrays."""
    delta = jnp.asarray(i) - jnp.asarray(j)
    return jnp.where(
        delta >= 0,
        toeplitz_column[..., jnp.abs(delta)],
        toeplitz_row[..., jnp.abs(delta)],
    )


def sym_toeplitz_getitem(toeplitz_column, i, j) -> jax.Array:
    """``T[i, j]`` of the symmetric Toeplitz matrix (reference :84-95)."""
    return toeplitz_getitem(toeplitz_column, toeplitz_column, i, j)


def toeplitz_matmul(
    toeplitz_column: jax.Array, toeplitz_row: jax.Array, tensor: jax.Array
) -> jax.Array:
    """``T @ tensor`` in O(n log n) via circulant embedding (reference
    :98-149): embed T in the (2n-1)-circulant with first column
    ``[c_0..c_{n-1}, r_{n-1}..r_1]`` and multiply in Fourier space.

    column/row: (*b, n); tensor: (*b, n, t) or (n,).  Batch dims broadcast.
    """
    if toeplitz_column.shape != toeplitz_row.shape:
        raise ValueError(
            "column and row must have the same shape; got "
            f"{toeplitz_column.shape} vs {toeplitz_row.shape}"
        )
    is_vector = tensor.ndim == 1
    if is_vector:
        tensor = tensor[:, None]
    n = toeplitz_column.shape[-1]
    m = 2 * n - 1
    c_r_rev = jnp.concatenate(
        [toeplitz_column, jnp.flip(toeplitz_row[..., 1:], axis=-1)], axis=-1
    )  # (*b, 2n-1)
    pad = [(0, 0)] * (tensor.ndim - 2) + [(0, n - 1), (0, 0)]
    x = jnp.pad(tensor, pad)  # (*b, 2n-1, t)
    if jnp.iscomplexobj(tensor) or jnp.iscomplexobj(toeplitz_column):
        # if EITHER operand is complex, T @ x is genuinely complex — keep it
        # (dropping .real for mixed real/complex inputs discards the true
        # imaginary part; the result dtype is the complex promotion)
        out = jnp.fft.ifft(
            jnp.fft.fft(x, axis=-2) * jnp.fft.fft(c_r_rev, axis=-1)[..., :, None],
            axis=-2,
        )
    else:
        f_x = jnp.fft.rfft(x, axis=-2)
        f_c = jnp.fft.rfft(c_r_rev, axis=-1)[..., :, None]
        out = jnp.fft.irfft(f_x * f_c, n=m, axis=-2)
        out = out.astype(jnp.result_type(tensor, toeplitz_column))
    out = out[..., :n, :]
    return out[..., 0] if is_vector else out


def sym_toeplitz_matmul(toeplitz_column: jax.Array, tensor: jax.Array) -> jax.Array:
    """``T @ tensor`` for symmetric Toeplitz T (reference :152-161)."""
    return toeplitz_matmul(toeplitz_column, toeplitz_column, tensor)


def sym_toeplitz_derivative_quadratic_form(
    left_vectors: jax.Array, right_vectors: jax.Array
) -> jax.Array:
    r"""``res[i] = sum_j u[j]^T (dT/dc_i) v[j]`` for symmetric Toeplitz T
    (reference :164-204): the gradient of ``sum_j u[j]^T T(c) v[j]`` with
    respect to the first column ``c``.

    ``T(c)`` is linear in ``c``, so the quadratic form is the (constant)
    cotangent of ``c -> T(c) @ V`` with cotangent ``U`` — computed here by
    ``jax.vjp`` through the FFT matmul instead of the reference's hand-built
    auxiliary-Toeplitz products.

    left_vectors/right_vectors: (*b, m) single vectors or (*b, m, s) stacks
    (vectors in columns).  Returns (*b, m).
    """
    if left_vectors.ndim == 1:
        left_vectors = left_vectors[:, None]
        right_vectors = right_vectors[:, None]
    m = left_vectors.shape[-2]
    c0 = jnp.zeros((*left_vectors.shape[:-2], m), dtype=left_vectors.dtype)
    _, vjp = jax.vjp(lambda c: sym_toeplitz_matmul(c, right_vectors), c0)
    (grad_c,) = vjp(left_vectors)
    return grad_c
