"""Sum of two Kronecker products: A (x) B + C (x) D.

Reference: linear_operator/operators/sum_kronecker_linear_operator.py:14-119.

Solves/logdets use the right-factor whitening formulation (reference :31-66):
with S = C^{-1/2} A C^{-T/2} (x) D^{-1/2} B D^{-T/2} and its Kronecker
eigendecomposition S = Q L Q^T,

    (A(x)B + C(x)D)^{-1} = W^{-T} Q (L + I)^{-1} Q^T W^{-1},  W = C^{1/2}(x)D^{1/2}
    log det = sum log(L_kron + 1) + log det(C (x) D)

Every application is a Kronecker sweep; only the O(N) eigenvalue vector is
materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ._linear_operator import LinearOperator
from .dense import DenseLinearOperator
from .kronecker import KroneckerProductLinearOperator, _kron_vector
from .sum import SumLinearOperator


@operator_class
class SumKroneckerLinearOperator(SumLinearOperator):
    """operators = (KP(A, B), KP(C, D)) — both two-factor products."""

    def __post_init__(self):
        if len(self.operators) != 2 or not all(
            isinstance(o, KroneckerProductLinearOperator) and len(o.operators) == 2
            for o in self.operators
        ):
            raise ValueError(
                "SumKroneckerLinearOperator takes two 2-factor Kronecker products"
            )

    def _whitened(self):
        """Compute the whitening pieces once per trace."""
        kp1, kp2 = self.operators
        A, B = kp1.operators
        C, D = kp2.operators

        # inverse roots of the right-hand factors
        c_ir = C._root_inv_structure()
        if c_ir is None:
            from ..functions import root_inv_decomposition

            c_ir = root_inv_decomposition(C).root
        d_ir = D._root_inv_structure()
        if d_ir is None:
            from ..functions import root_inv_decomposition

            d_ir = root_inv_decomposition(D).root

        cir = c_ir.to_dense()
        dir_ = d_ir.to_dense()
        a_w = jnp.swapaxes(cir, -1, -2) @ A.to_dense() @ cir
        b_w = jnp.swapaxes(dir_, -1, -2) @ B.to_dense() @ dir_
        la, qa = jnp.linalg.eigh((a_w + jnp.swapaxes(a_w, -1, -2)) / 2)
        lb, qb = jnp.linalg.eigh((b_w + jnp.swapaxes(b_w, -1, -2)) / 2)
        evals = _kron_vector([la, lb])  # (*b, N)
        q_kron = KroneckerProductLinearOperator(
            (DenseLinearOperator(qa), DenseLinearOperator(qb))
        )
        w_inv = KroneckerProductLinearOperator(
            (DenseLinearOperator(cir), DenseLinearOperator(dir_))
        )  # W^{-T} columns: note c_ir has K^{-1} = c_ir c_ir^T
        return evals, q_kron, w_inv, C, D

    def _solve_structure(self, rhs: jax.Array):
        evals, q, w_inv, _, _ = self._whitened()
        y = w_inv._t_matmul(rhs)
        y = q._t_matmul(y)
        y = y / (evals + 1.0)[..., :, None]
        y = q._matmul(y)
        return w_inv._matmul(y)

    def _logdet_structure(self):
        from ..functions import inv_quad_logdet

        evals, _, _, C, D = self._whitened()
        n_c, n_d = C.shape[-1], D.shape[-1]
        _, ld_c = inv_quad_logdet(C, None, logdet=True)
        _, ld_d = inv_quad_logdet(D, None, logdet=True)
        return (
            jnp.sum(jnp.log(jnp.maximum(evals + 1.0, 1e-30)), axis=-1)
            + n_d * ld_c
            + n_c * ld_d
        )

    def _inv_quad_logdet_structure(self, rhs, logdet):
        if rhs is None:
            iq = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            iq = jnp.sum(self._solve_structure(rhs) * rhs, axis=-2)
        if logdet:
            ld = jnp.broadcast_to(self._logdet_structure(), self.batch_shape)
        else:
            ld = jnp.zeros(self.batch_shape, dtype=self.dtype)
        return iq, ld

    def _root_structure(self):
        """(A(x)B + C(x)D)^{1/2} = W Q (L+I)^{1/2} (reference :68-96)."""
        from .diag import DiagLinearOperator
        from .matmul import MatmulLinearOperator

        evals, q, w_inv, C, D = self._whitened()
        c_r = C._root_structure()
        d_r = D._root_structure()
        if c_r is None or d_r is None:
            from ..functions import root_decomposition

            c_r = c_r or root_decomposition(C).root
            d_r = d_r or root_decomposition(D).root
        w = KroneckerProductLinearOperator((c_r, d_r))
        sqrt_l = DiagLinearOperator(jnp.sqrt(jnp.maximum(evals + 1.0, 0.0)))
        return MatmulLinearOperator(MatmulLinearOperator(w, q), sqrt_l)
