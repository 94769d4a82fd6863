"""Root decompositions: K = R R^T (and K^{-1} = S S^T).

Reference: linear_operator/functions/_root_decomposition.py:11-173 and the
dispatch in operators/_linear_operator.py:2157-2307, :543-561.

Backward: differentiating natively through the Lanczos ``fori_loop`` is
possible but numerically unstable (the reorthogonalization chain amplifies
roundoff in reverse mode), so the Lanczos path uses a Murray (2016)-style
custom VJP exactly like the reference (functions/_root_decomposition.py:
104-173): with K = R R^T and pseudo-inverse root S (S^T = R^+),

    K_bar =  1/2 sym(R_bar S^T)                      (root cotangent)
          -  1/2 sym((S S^T S) S_bar^T)              (inverse-root cotangent)

pushed to the operator leaves through ONE ``_bilinear_derivative`` over
stacked left/right factors, so gradients reach arbitrarily nested operators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..solvers import lanczos as _lanczos_module


def _lanczos_root_impl(
    op, key, k: int, init: jax.Array | None = None, want_inverse: bool = True
):
    n = op.shape[-1]
    if init is None:
        init = jax.random.normal(key, (*op.batch_shape, n), dtype=op.dtype)
    # ``init`` may carry a leading probe dim (p, *b, n): every step of the
    # Lanczos fori_loop broadcasts through op._matmul, so a probe batch costs
    # one fused loop (reference lanczos.py:9-164 runs num_init_vecs probes).
    Q, T = _lanczos_module.lanczos_tridiag(op._matmul, k, init_vecs=init)
    kk = T.shape[-1]
    jitter = settings.tridiagonal_jitter.value()
    T = T + jitter * jnp.eye(kk, dtype=T.dtype)
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 0.0)
    sqrt_evals = jnp.sqrt(evals)
    root = Q @ (evecs * sqrt_evals[..., None, :])
    if not want_inverse:
        return root, None
    inv_sqrt = jnp.where(evals > 1e-12, 1.0 / jnp.maximum(sqrt_evals, 1e-12), 0.0)
    inv_root = Q @ (evecs * inv_sqrt[..., None, :])
    return root, inv_root


def _lanczos_root(op, key, need_inverse: bool, init: jax.Array | None = None):
    k = min(settings.max_root_decomposition_size.value(), op.shape[-1])

    # NOTE: custom_vjp cotangents are ZERO ARRAYS, never None, so the branch
    # structure must be decided statically by ``need_inverse`` — a runtime
    # "is not None" check would always take both branches, computing the
    # S S^T S correction and doubling the bilinear columns for a provably
    # zero contribution when the inverse root is unused.
    if need_inverse:

        @jax.custom_vjp
        def inner(op):
            return _lanczos_root_impl(op, key, k, init)

        def fwd(op):
            root, inv_root = _lanczos_root_impl(op, key, k, init)
            return (root, inv_root), (op, root, inv_root)

        def bwd(res, cotangents):
            op, root, inv_root = res
            root_bar, inv_bar = cotangents
            # K_bar = 1/4 (R_bar S^T + S R_bar^T) - 1/4 (P S_bar^T + S_bar P^T)
            # with P = S S^T S (scalar check: k = r^2 -> k_bar = r_bar/(2r)).
            p = inv_root @ (jnp.swapaxes(inv_root, -1, -2) @ inv_root)
            left = jnp.concatenate(
                [0.25 * root_bar, 0.25 * inv_root, -0.25 * p, -0.25 * inv_bar],
                axis=-1,
            )
            right = jnp.concatenate(
                [inv_root, root_bar, inv_bar, p], axis=-1
            )
            return (op._bilinear_derivative(left, right),)

        inner.defvjp(fwd, bwd)
        return inner(op)

    @jax.custom_vjp
    def inner_root(op):
        root, _ = _lanczos_root_impl(op, key, k, init, want_inverse=False)
        return root

    def fwd_root(op):
        # the root cotangent formula needs the inverse root, so the FWD
        # residuals still compute it — but the primal (no-grad) path and the
        # backward's bilinear width skip the inverse-branch entirely
        root, inv_root = _lanczos_root_impl(op, key, k, init)
        return root, (op, inv_root)

    def bwd_root(res, root_bar):
        op, inv_root = res
        left = jnp.concatenate([0.25 * root_bar, 0.25 * inv_root], axis=-1)
        right = jnp.concatenate([inv_root, root_bar], axis=-1)
        return (op._bilinear_derivative(left, right),)

    inner_root.defvjp(fwd_root, bwd_root)
    return inner_root(op), None


def root_decomposition(op, method: str | None = None, *, key: jax.Array | None = None):
    """Operator equal to ``op`` carrying a root (reference :2157-2218)."""
    from ..operators._linear_operator import LinearOperator, _fallback_key
    from ..operators.chol import CholLinearOperator
    from ..operators.dense import DenseLinearOperator
    from ..operators.root import RootLinearOperator
    from ..operators.triangular import TriangularLinearOperator

    if settings.debug.on() and not op.is_square:
        raise RuntimeError("root_decomposition requires a square operator")

    structural = op._root_structure()
    if structural is not None and method is None:
        if isinstance(structural, TriangularLinearOperator):
            return CholLinearOperator(structural)
        return RootLinearOperator(structural)

    if method is None:
        method = op._choose_root_method()
    if method == "cholesky":
        return CholLinearOperator(op._cholesky_impl(upper=False))
    if method in ("lanczos", "symeig", "diagonalization"):
        if method in ("symeig", "diagonalization"):
            evals, evecs = jnp.linalg.eigh(op.to_dense())
            evals = jnp.maximum(evals, 0.0)
            root = evecs * jnp.sqrt(evals)[..., None, :]
            return RootLinearOperator(DenseLinearOperator(root))
        root, _ = _lanczos_root(op, _fallback_key(key), need_inverse=False)
        return RootLinearOperator(DenseLinearOperator(root))
    raise ValueError(f"unknown root_decomposition method {method!r}")


def _postprocess_lanczos_root_inv_decomp(
    op, inv_roots: jax.Array, test_vectors: jax.Array
) -> jax.Array:
    """Pick the best-of-probes inverse root by residual test (reference
    utils/lanczos.py:192-223).

    inv_roots: (p, *b, n, k) candidate roots of K^{-1};
    test_vectors: (*b, n, t).  Chooses argmin_p sum ||K R_p R_p^T t - t||.
    Trace-safe: the selection is a gather, so gradients flow only through
    the winning probe's root.
    """
    solves = inv_roots @ (jnp.swapaxes(inv_roots, -1, -2) @ test_vectors)
    mat_solves = op._matmul(solves)  # broadcasts over the probe dim
    resid = jnp.linalg.norm(mat_solves - test_vectors, axis=-2)  # (p, *b, t)
    resid = jnp.sum(resid.reshape(resid.shape[0], -1), axis=-1)  # (p,)
    best = jnp.argmin(resid)
    return jnp.take(inv_roots, best, axis=0)


def root_inv_decomposition(
    op,
    method: str | None = None,
    *,
    key: jax.Array | None = None,
    initial_vectors: jax.Array | None = None,
    test_vectors: jax.Array | None = None,
):
    """Operator equal to ``op^{-1}`` carrying a root (reference :2220-2307).

    ``initial_vectors`` (*b, n, p): Lanczos start vectors; with p > 1 every
    probe is tridiagonalized (one broadcasted loop) and the best inverse
    root is selected by the ``test_vectors`` residual test (reference
    :2265-2290 + utils/lanczos.py:192-223).  ``test_vectors`` defaults to
    ``initial_vectors``.
    """
    from ..operators._linear_operator import _fallback_key
    from ..operators.dense import DenseLinearOperator
    from ..operators.root import RootLinearOperator

    if settings.debug.on() and not op.is_square:
        raise RuntimeError("root_inv_decomposition requires a square operator")
    if settings.debug.on() and initial_vectors is not None:
        if initial_vectors.ndim == 1:
            raise RuntimeError("initial_vectors must be (*b, n, p)")
        if initial_vectors.shape[-2] != op.shape[-1]:
            raise RuntimeError(
                f"initial_vectors shape {initial_vectors.shape} incompatible "
                f"with operator {op.shape}"
            )

    structural = op._root_inv_structure()
    if structural is not None and method is None:
        return RootLinearOperator(structural)

    if method is None:
        method = op._choose_root_method()
    if method == "cholesky":
        chol = op._cholesky_impl(upper=False)  # L (triangular)
        inv_root = chol.inverse()._transpose()  # L^{-T}
        return RootLinearOperator(inv_root)
    if method in ("lanczos", "symeig", "diagonalization"):
        if method in ("symeig", "diagonalization"):
            evals, evecs = jnp.linalg.eigh(op.to_dense())
            inv_sqrt = jnp.where(evals > 1e-12, jax.lax.rsqrt(jnp.maximum(evals, 1e-12)), 0.0)
            return RootLinearOperator(
                DenseLinearOperator(evecs * inv_sqrt[..., None, :])
            )
        init = None
        if initial_vectors is not None:
            init = jnp.moveaxis(initial_vectors, -1, 0)  # (p, *b, n)
            if init.shape[0] == 1:
                init = init[0]
        _, inv_root = _lanczos_root(
            op, _fallback_key(key), need_inverse=True, init=init
        )
        if initial_vectors is not None and initial_vectors.shape[-1] > 1:
            tv = test_vectors if test_vectors is not None else initial_vectors
            inv_root = _postprocess_lanczos_root_inv_decomp(op, inv_root, tv)
        return RootLinearOperator(DenseLinearOperator(inv_root))
    raise ValueError(f"unknown root_inv_decomposition method {method!r}")


def diagonalization(op, method: str | None = None, *, key: jax.Array | None = None):
    """(evals, evecs) with K ~= Q diag(evals) Q^T (reference
    _linear_operator.py:1438-1482, functions/_diagonalization.py:11-94)."""
    from ..operators._linear_operator import _fallback_key
    from ..operators.dense import DenseLinearOperator

    if settings.debug.on() and not op.is_square:
        raise RuntimeError("diagonalization requires a square operator")
    if method is None:
        n = op.shape[-1]
        method = (
            "symeig"
            if n <= settings.max_cholesky_size.value()
            or settings.fast_computations.covar_root_decomposition.off()
            else "lanczos"
        )
    if method == "symeig":
        evals, evecs = jnp.linalg.eigh(op.to_dense())
        return evals, DenseLinearOperator(evecs)
    if method == "lanczos":
        n = op.shape[-1]
        k = min(settings.max_root_decomposition_size.value(), n)
        init = jax.random.normal(
            _fallback_key(key), (*op.batch_shape, n), dtype=op.dtype
        )
        Q, T = _lanczos_module.lanczos_tridiag(op._matmul, k, init_vecs=init)
        evals, evecs = jnp.linalg.eigh(T)
        evals = jnp.maximum(evals, 0.0)
        return evals, DenseLinearOperator(Q @ evecs)
    raise ValueError(f"unknown diagonalization method {method!r}")
