"""K^{±1/2} @ rhs via contour integral quadrature — implemented with the
shifted-MINRES solver in stage 5 of the build plan (SURVEY.md section 7).

Reference: linear_operator/functions/_sqrt_inv_matmul.py:10-126,
linear_operator/utils/contour_integral_quad.py:14-156.
"""

from __future__ import annotations


def sqrt_inv_matmul(op, rhs, lhs=None):
    from ..solvers.contour_integral_quad import ciq_sqrt_inv_matmul

    return ciq_sqrt_inv_matmul(op, rhs, lhs)


def sqrt_matmul(op, rhs):
    from ..solvers.contour_integral_quad import ciq_sqrt_matmul

    return ciq_sqrt_matmul(op, rhs)
