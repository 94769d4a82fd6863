"""linear_operator_tpu — a TPU-native structured linear-operator engine.

Built from scratch with the capabilities of cornellius-gp/linear_operator
(reference mounted at /root/reference; see SURVEY.md for the layer map), but
designed for JAX/XLA/Pallas on TPU:

* operators are pytree dataclasses (flattening = ``representation()``),
* autodiff of solve/inv_quad_logdet flows through ``jax.custom_vjp``,
* Krylov solvers are trace-safe ``lax`` loops that fuse under ``jit``,
* stochastic estimators take explicit PRNG keys,
* batch/probe/N axes shard over a ``jax.sharding.Mesh`` (see ``parallel``).
"""

from . import operators, settings
from .functions import (
    add_diagonal,
    add_jitter,
    diagonalization,
    dsmm,
    inv_quad,
    inv_quad_logdet,
    pivoted_cholesky,
    root_decomposition,
    root_inv_decomposition,
    solve,
    sqrt_inv_matmul,
)
from .operators import (
    AddedDiagLinearOperator,
    BatchRepeatLinearOperator,
    CholLinearOperator,
    ConstantDiagLinearOperator,
    ConstantMulLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    IdentityLinearOperator,
    LinearOperator,
    LowRankRootAddedDiagLinearOperator,
    LowRankRootLinearOperator,
    MatmulLinearOperator,
    MulLinearOperator,
    PsdSumLinearOperator,
    RootLinearOperator,
    SumBatchLinearOperator,
    SumLinearOperator,
    TriangularLinearOperator,
    ZeroLinearOperator,
    to_dense,
    to_linear_operator,
)

__version__ = "0.1.0"

__all__ = [
    "operators",
    "settings",
    "add_diagonal",
    "add_jitter",
    "diagonalization",
    "dsmm",
    "inv_quad",
    "inv_quad_logdet",
    "pivoted_cholesky",
    "root_decomposition",
    "root_inv_decomposition",
    "solve",
    "sqrt_inv_matmul",
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
