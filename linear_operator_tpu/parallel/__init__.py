"""Multi-chip scale-out: mesh construction and sharded solves.

The reference's entire parallelism story (SURVEY.md section 2g) maps to:
batch dims -> data axis, Hutchinson probes -> probe axis, matrix dim N ->
model axis (row-sharded mat-vec).  All CG/Lanczos global scalars (inner
products, residual norms, convergence flags) are psum-reductions inserted by
GSPMD when the solvers run under jit with sharded operands.
"""

from .scaling import mll_throughput, scaling_report
from .sharding import (
    initialize_distributed,
    make_mesh,
    maybe_shard_probes,
    shard_gp_batch,
    sharded_train_step,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "maybe_shard_probes",
    "mll_throughput",
    "scaling_report",
    "shard_gp_batch",
    "sharded_train_step",
]
