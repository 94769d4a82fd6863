"""Pallas TPU kernels for the hot mat-vecs.

The TPU equivalent of the reference's KeOps offload
(keops_linear_operator.py:14): kernel-matrix tiles are computed in VMEM and
contracted immediately — the N x N matrix never reaches HBM, so the mat-vec
runs at MXU compute speed instead of HBM bandwidth.
"""

from .rbf import (
    TILE_COVARS,
    kernel_matvec,
    kernel_matvec_sym,
    rbf_matvec,
    rbf_matvec_sym,
    sym_matvec_supported,
)

__all__ = [
    "TILE_COVARS",
    "kernel_matvec",
    "kernel_matvec_sym",
    "rbf_matvec",
    "rbf_matvec_sym",
    "sym_matvec_supported",
]
