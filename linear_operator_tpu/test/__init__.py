"""Shipped golden-model test harness.

Like the reference (linear_operator/test/), this module is part of the public
package so downstream libraries can define operators and inherit the full
property-test suite: subclass ``LinearOperatorTestCase`` (square PSD) or
``RectangularLinearOperatorTestCase`` and implement ``create_linear_op`` /
``evaluate_linear_op``.
"""

from .base_test_case import BaseTestCase
from .linear_operator_test_case import (
    LinearOperatorTestCase,
    RectangularLinearOperatorTestCase,
)

__all__ = [
    "BaseTestCase",
    "LinearOperatorTestCase",
    "RectangularLinearOperatorTestCase",
]
