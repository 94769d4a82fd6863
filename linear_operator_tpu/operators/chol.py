"""PSD operator represented by its Cholesky factor.

Reference: linear_operator/operators/chol_linear_operator.py:18-189.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ._linear_operator import LinearOperator
from .root import RootLinearOperator
from .triangular import TriangularLinearOperator


@operator_class
class CholLinearOperator(RootLinearOperator):
    """K = L L^T where ``root`` is a (lower) TriangularLinearOperator."""

    def __post_init__(self):
        if not isinstance(self.root, TriangularLinearOperator):
            # Accept a raw triangular array like the reference (with a
            # DeprecationWarning, chol_linear_operator.py:32-44); concrete
            # arrays only — a tracer's triangularity is data-dependent.  The
            # check runs HOST-side (one bulk transfer, numpy reductions): an
            # eager tril/all + scalar fetch over the tunneled TPU backend
            # can stall (see CLAUDE.md environment notes).
            import numpy as np

            root = self.root
            if (
                isinstance(root, (jax.Array, np.ndarray))
                and not isinstance(root, jax.core.Tracer)
            ):
                import warnings

                warnings.warn(
                    "chol argument to CholLinearOperator should be a "
                    "TriangularLinearOperator; pass one explicitly.",
                    DeprecationWarning,
                )
                host = np.asarray(root)
                if np.all(np.tril(host) == host):
                    upper = False
                elif np.all(np.triu(host) == host):
                    upper = True
                else:
                    raise ValueError(
                        "chol must be either lower or upper triangular"
                    )
                object.__setattr__(
                    self,
                    "root",
                    TriangularLinearOperator(jnp.asarray(root), upper=upper),
                )
                return
            raise TypeError("CholLinearOperator requires a TriangularLinearOperator root")

    # -- direct solves (reference :70-88) ----------------------------------

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        return self.root._cholesky_solve(rhs)

    def _logdet_structure(self) -> jax.Array:
        """2 sum(log diag L) (reference :121-168)."""
        return 2.0 * jnp.sum(jnp.log(jnp.abs(self.root._diagonal())), axis=-1)

    def _inv_quad_logdet_structure(self, rhs, logdet):
        """inv_quad via one triangular solve (reference :107-119)."""
        if rhs is None:
            iq = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            y = self.root._solve_structure(rhs)  # R^{-1} rhs; iq = ||y||^2
            iq = jnp.sum(y * y, axis=-2)
        ld = (
            self._logdet_structure()
            if logdet
            else jnp.zeros(self.batch_shape, dtype=self.dtype)
        )
        return iq, ld

    def _cholesky_impl(self, upper: bool = False) -> LinearOperator:
        if upper == self.root.upper:
            return self.root
        return self.root._transpose()

    def _root_structure(self) -> LinearOperator:
        return self.root

    def _root_inv_structure(self) -> LinearOperator:
        """K^{-1/2}-root via L^{-T} (reference root_inv_decomposition :170-176)."""
        return self.root.inverse()._transpose()

    def inverse(self) -> LinearOperator:
        """(reference :98-105)"""
        inv_root = self.root.inverse()  # L^{-1}, triangular
        return CholLinearOperator(inv_root._transpose())
