"""Model layer: exact GP regression built on the operator algebra.

The reference library is the compute core under GPyTorch (README.md:14-16);
this module provides the flagship downstream model — exact GP regression with
CG/SLQ marginal likelihood — so the engine has an end-to-end consumer, a
training step for multi-chip sharding, and a benchmark target.
"""

from .classification import (
    SVGPClassification,
    SVGPPoissonRegression,
    gauss_hermite_expectation,
)
from .dkl import DeepKernelGPRegression, DKLParams, MLPParams, init_mlp, mlp_features
from .gp import ExactGPRegression, GPParams
from .multitask import MultitaskGPParams, MultitaskGPRegression
from .sgpr import SGPRParams, SGPRRegression
from .ski import GridSpec, SKIGPRegression, SKIParams, make_grid
from .svgp import SVGPParams, SVGPRegression

__all__ = [
    "DKLParams",
    "DeepKernelGPRegression",
    "ExactGPRegression",
    "GPParams",
    "GridSpec",
    "MLPParams",
    "MultitaskGPParams",
    "MultitaskGPRegression",
    "SGPRParams",
    "SGPRRegression",
    "SKIGPRegression",
    "SKIParams",
    "SVGPClassification",
    "SVGPPoissonRegression",
    "SVGPParams",
    "SVGPRegression",
    "gauss_hermite_expectation",
    "init_mlp",
    "make_grid",
    "mlp_features",
]
