"""Kronecker product plus diagonal: (x)_i K_i + D.

Reference: linear_operator/operators/kronecker_product_added_diag_linear_operator.py:49-316.

For constant D = c I the solve is exact via the spectral shift of the
Kronecker eigendecomposition (reference :152-162): with K_i = Q_i L_i Q_i^T,

    (K + cI)^{-1} = ((x) Q_i) diag(kron(L_i) + c)^{-1} ((x) Q_i)^T
    log det(K + cI) = sum log(kron(L_i) + c)

The eigenvector applications are Kronecker sweeps (fast); only the O(N)
eigenvalue vector is materialized.  For Kronecker-structured D (a
KroneckerProductDiagLinearOperator) the Rakitsch-2013 symmetrized whitening
solve (reference :164-221) is implemented below (`_solve_structure`, second
branch).  For unstructured non-constant D, solves fall back to
preconditioned CG through the (fast) Kronecker mat-vec, like the reference's
generic path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ._linear_operator import LinearOperator
from .added_diag import AddedDiagLinearOperator
from .diag import ConstantDiagLinearOperator, DiagLinearOperator
from .kronecker import KroneckerProductLinearOperator, _kron_vector


@operator_class
class KroneckerProductAddedDiagLinearOperator(AddedDiagLinearOperator):
    """operators = (KroneckerProductLinearOperator, DiagLinearOperator)."""

    def __init__(self, op=None, diag_op=None, *, operators=None):  # type: ignore[override]
        if operators is None:
            operators = (op, diag_op)
        object.__setattr__(self, "operators", tuple(operators))
        # inherited AddedDiag field; unused here (spectral solves are exact),
        # but flatten/replace iterate all dataclass fields
        object.__setattr__(self, "precond_factor", None)
        self.__post_init__()

    def __post_init__(self):
        from .kronecker import KroneckerProductDiagLinearOperator

        if len(self.operators) != 2:
            raise ValueError("takes exactly (kron_op, diag_op)")
        if not isinstance(self.operators[0], KroneckerProductLinearOperator):
            raise TypeError("first operand must be a KroneckerProductLinearOperator")
        if not isinstance(
            self.operators[1],
            (DiagLinearOperator, KroneckerProductDiagLinearOperator),
        ):
            raise TypeError(
                "second operand must be a Diag or Kronecker-diag operator"
            )

    @property
    def _kron(self) -> KroneckerProductLinearOperator:
        return self.operators[0]

    def with_preconditioner(self, factor=None):
        """No-op when an exact spectral path applies (constant diag ->
        eigenvalue shift; Kronecker diag with matching factors -> Rakitsch
        whitening): CG never runs there, so a preconditioner factor could
        never be consumed.  Falls back to the AddedDiag machinery only for
        the genuinely iterative case (mismatched Kronecker diag)."""
        if self._is_constant_diag or (
            self._is_kron_diag and self._whitening_shapes_match
        ):
            return self
        return super().with_preconditioner(factor)

    @property
    def _whitening_shapes_match(self) -> bool:
        """Cheap structural predicate for whether ``_whitened_eigen`` will
        apply (same factor count, matching per-factor sizes) — no eigh."""
        d_factors = self.operators[1].operators
        k_factors = self._kron.operators
        return len(d_factors) == len(k_factors) and all(
            kf.shape[-1] == df.shape[-1]
            for kf, df in zip(k_factors, d_factors)
        )

    @property
    def _is_constant_diag(self) -> bool:
        return isinstance(self.operators[1], ConstantDiagLinearOperator)

    @property
    def _is_kron_diag(self) -> bool:
        from .kronecker import KroneckerProductDiagLinearOperator

        return isinstance(self.operators[1], KroneckerProductDiagLinearOperator)

    def _eigen(self):
        """Factor eigendecompositions -> (kron evals (*b, N), evecs kron op).

        Forced through float32+ (reference forces float64 via
        settings._linalg_dtype_symeig, :150; on TPU we stay in f32)."""
        evals, evecs = self._kron.eigh()
        return evals, evecs

    def _whitened_eigen(self):
        """Rakitsch-2013 symmetrized whitening for Kronecker-structured D
        (reference :164-221): with D = (x) D_d,

            K + D = D^{1/2} ( (x)_d D_d^{-1/2} K_d D_d^{-1/2} + I ) D^{1/2}

        and the whitened middle is again Kronecker -> factor eigh gives
        exact solves/logdets."""
        from .dense import DenseLinearOperator
        from .kronecker import KroneckerProductLinearOperator

        d_factors = self.operators[1].operators
        k_factors = self._kron.operators
        if len(d_factors) != len(k_factors):
            return None
        whitened = []
        d_invsqrt = []
        for kf, df in zip(k_factors, d_factors):
            if kf.shape[-1] != df.shape[-1]:
                return None
            dd = df._diagonal()
            inv_sqrt = jax.lax.rsqrt(jnp.maximum(dd, 1e-30))
            d_invsqrt.append(inv_sqrt)
            kw = inv_sqrt[..., :, None] * kf.to_dense() * inv_sqrt[..., None, :]
            whitened.append(
                DenseLinearOperator((kw + jnp.swapaxes(kw, -1, -2)) / 2)
            )
        evals, evecs = KroneckerProductLinearOperator(tuple(whitened)).eigh()
        from .kronecker import _kron_vector

        dinvs = _kron_vector(d_invsqrt)  # (*b, N) = diag(D^{-1/2})
        return evals, evecs, dinvs

    def _solve_structure(self, rhs: jax.Array):
        if self._is_constant_diag:
            c = self.operators[1].diag[..., :1]  # (*b, 1)
            evals, evecs = self._eigen()
            shifted = evals + c  # (*b, N)
            y = evecs._t_matmul(rhs)
            y = y / shifted[..., :, None]
            return evecs._matmul(y)
        if self._is_kron_diag:
            w = self._whitened_eigen()
            if w is not None:
                evals, evecs, dinvs = w
                y = evecs._t_matmul(dinvs[..., :, None] * rhs)
                y = y / (evals + 1.0)[..., :, None]
                return dinvs[..., :, None] * evecs._matmul(y)
        return None

    def _logdet_structure(self):
        if self._is_constant_diag:
            c = self.operators[1].diag[..., :1]
            evals, _ = self._eigen()
            return jnp.sum(jnp.log(jnp.maximum(evals + c, 1e-30)), axis=-1)
        if self._is_kron_diag:
            w = self._whitened_eigen()
            if w is not None:
                evals, _, dinvs = w
                return jnp.sum(
                    jnp.log(jnp.maximum(evals + 1.0, 1e-30)), axis=-1
                ) - 2.0 * jnp.sum(jnp.log(jnp.maximum(dinvs, 1e-30)), axis=-1)
        return None

    def _inv_quad_logdet_structure(self, rhs, logdet):
        if (
            self._is_kron_diag
            and not self._is_constant_diag
            and not self._whitening_shapes_match
        ):
            # Mismatched Kronecker diag: no whitened eigen fast path —
            # return None so the generic CG machinery (which
            # with_preconditioner prepared for exactly this case) runs.
            return None
        if self._is_kron_diag and not self._is_constant_diag:
            s = self._solve_structure(rhs) if rhs is not None else None
            iq = (
                jnp.sum(s * rhs, axis=-2)
                if rhs is not None
                else jnp.zeros(self.batch_shape, dtype=self.dtype)
            )
            if logdet:
                ld = jnp.broadcast_to(self._logdet_structure(), self.batch_shape)
            else:
                ld = jnp.zeros(self.batch_shape, dtype=self.dtype)
            return iq, ld
        if not self._is_constant_diag:
            return None
        c = self.operators[1].diag[..., :1]
        evals, evecs = self._eigen()
        shifted = evals + c
        if rhs is None:
            iq = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            y = evecs._t_matmul(rhs)
            iq = jnp.sum(y * y / shifted[..., :, None], axis=-2)
        if logdet:
            ld = jnp.broadcast_to(
                jnp.sum(jnp.log(jnp.maximum(shifted, 1e-30)), axis=-1),
                self.batch_shape,
            )
        else:
            ld = jnp.zeros(self.batch_shape, dtype=self.dtype)
        return iq, ld

    def _root_structure(self):
        """(K + cI)^{1/2} = Q diag(sqrt(evals + c)) Q^T root (reference
        :226-292)."""
        if not self._is_constant_diag:
            return None
        from .matmul import MatmulLinearOperator

        c = self.operators[1].diag[..., :1]
        evals, evecs = self._eigen()
        sqrt_d = DiagLinearOperator(jnp.sqrt(jnp.maximum(evals + c, 0.0)))
        return MatmulLinearOperator(evecs, sqrt_d)

    def _root_inv_structure(self):
        if not self._is_constant_diag:
            return None
        from .matmul import MatmulLinearOperator

        c = self.operators[1].diag[..., :1]
        evals, evecs = self._eigen()
        inv_sqrt = DiagLinearOperator(
            jax.lax.rsqrt(jnp.maximum(evals + c, 1e-30))
        )
        return MatmulLinearOperator(evecs, inv_sqrt)

    def __add__(self, other):
        if isinstance(other, DiagLinearOperator) and isinstance(
            self.operators[1], DiagLinearOperator
        ):
            return KroneckerProductAddedDiagLinearOperator(
                self._kron, self.operators[1] + other
            )
        if isinstance(other, DiagLinearOperator):
            # Kronecker-structured diag + plain diag: no closed form; stack
            # as a generic AddedDiag so CG/preconditioning still applies.
            return AddedDiagLinearOperator(self, other)
        return super().__add__(other)
