"""Operator algebra (L4) — structured lazy operators.

Reference: linear_operator/operators/__init__.py.
"""

from ._linear_operator import LinearOperator, to_dense, to_linear_operator
from .added_diag import AddedDiagLinearOperator
from .batch_repeat import BatchRepeatLinearOperator
from .chol import CholLinearOperator
from .constant_mul import ConstantMulLinearOperator
from .dense import DenseLinearOperator
from .diag import ConstantDiagLinearOperator, DiagLinearOperator
from .identity import IdentityLinearOperator
from .low_rank_root_added_diag import LowRankRootAddedDiagLinearOperator
from .matmul import MatmulLinearOperator
from .mul import MulLinearOperator
from .root import LowRankRootLinearOperator, RootLinearOperator
from .sum import PsdSumLinearOperator, SumLinearOperator
from .sum_batch import SumBatchLinearOperator
from .triangular import TriangularLinearOperator
from .zero import ZeroLinearOperator

__all__ = [
    "AddedDiagLinearOperator",
    "BatchRepeatLinearOperator",
    "CholLinearOperator",
    "ConstantDiagLinearOperator",
    "ConstantMulLinearOperator",
    "DenseLinearOperator",
    "DiagLinearOperator",
    "IdentityLinearOperator",
    "LinearOperator",
    "LowRankRootAddedDiagLinearOperator",
    "LowRankRootLinearOperator",
    "MatmulLinearOperator",
    "MulLinearOperator",
    "PsdSumLinearOperator",
    "RootLinearOperator",
    "SumBatchLinearOperator",
    "SumLinearOperator",
    "TriangularLinearOperator",
    "ZeroLinearOperator",
    "to_dense",
    "to_linear_operator",
]
