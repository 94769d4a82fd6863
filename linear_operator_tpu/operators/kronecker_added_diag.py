"""Kronecker product plus diagonal: (x)_i K_i + D.

Reference: linear_operator/operators/kronecker_product_added_diag_linear_operator.py:49-316.

For constant D = c I the solve is exact via the spectral shift of the
Kronecker eigendecomposition (reference :152-162): with K_i = Q_i L_i Q_i^T,

    (K + cI)^{-1} = ((x) Q_i) diag(kron(L_i) + c)^{-1} ((x) Q_i)^T
    log det(K + cI) = sum log(kron(L_i) + c)

The eigenvector applications are Kronecker sweeps (fast); only the O(N)
eigenvalue vector is materialized.  For non-constant D, solves fall back to
preconditioned CG through the (fast) Kronecker mat-vec, like the reference's
generic path; the Rakitsch-2013 symmetrized Woodbury for Kronecker-structured
D is future work.
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
        self.__post_init__()

    def __post_init__(self):
        if len(self.operators) != 2:
            raise ValueError("takes exactly (kron_op, diag_op)")
        if not isinstance(self.operators[0], KroneckerProductLinearOperator):
            raise TypeError("first operand must be a KroneckerProductLinearOperator")
        if not isinstance(self.operators[1], DiagLinearOperator):
            raise TypeError("second operand must be a DiagLinearOperator")

    @property
    def _kron(self) -> KroneckerProductLinearOperator:
        return self.operators[0]

    @property
    def _is_constant_diag(self) -> bool:
        return isinstance(self.operators[1], ConstantDiagLinearOperator)

    def _eigen(self):
        """Factor eigendecompositions -> (kron evals (*b, N), evecs kron op).

        Forced through float32+ (reference forces float64 via
        settings._linalg_dtype_symeig, :150; on TPU we stay in f32)."""
        evals, evecs = self._kron.eigh()
        return evals, evecs

    def _solve_structure(self, rhs: jax.Array):
        if not self._is_constant_diag:
            return None
        c = self.operators[1].diag[..., :1]  # (*b, 1)
        evals, evecs = self._eigen()
        shifted = evals + c  # (*b, N)
        y = evecs._t_matmul(rhs)
        y = y / shifted[..., :, None]
        return evecs._matmul(y)

    def _logdet_structure(self):
        if not self._is_constant_diag:
            return None
        c = self.operators[1].diag[..., :1]
        evals, _ = self._eigen()
        return jnp.sum(jnp.log(jnp.maximum(evals + c, 1e-30)), axis=-1)

    def _inv_quad_logdet_structure(self, rhs, logdet):
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
        if isinstance(other, DiagLinearOperator):
            return KroneckerProductAddedDiagLinearOperator(
                self._kron, self.operators[1] + other
            )
        return super().__add__(other)
