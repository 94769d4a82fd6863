"""Kronecker-product operators: K = K_1 (x) K_2 (x) ... (x) K_f.

Reference: linear_operator/operators/kronecker_product_linear_operator.py
(:63 KroneckerProductLinearOperator, :382 Triangular, :436 Diag) and
kronecker_product_added_diag_linear_operator.py:49, sum_kronecker_linear_operator.py:14.

The mat-vec is the reshape-multiply-permute sweep (reference :34-60): the rhs
is viewed as a tensor over the factor dimensions and each factor's OWN
``_matmul`` is applied along its axis — so factors keep their structure
(diagonal factors multiply in O(n), Toeplitz factors run FFTs, ...) and every
factor contraction is a batched MXU matmul of shape (n_i, m_i) x (m_i, rest).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ..utils.broadcasting import broadcast_shapes
from ._linear_operator import LinearOperator


def _kron_mm(factors, rhs, transpose=False):
    """Apply (x)_i K_i to rhs (*b, prod(m_i), t) via the factor sweep."""
    m_sizes = [f.shape[-1] if not transpose else f.shape[-2] for f in factors]
    batch = jnp.broadcast_shapes(
        rhs.shape[:-2], *[f.batch_shape for f in factors]
    )
    t = rhs.shape[-1]
    x = jnp.broadcast_to(rhs, (*batch, rhs.shape[-2], t))
    x = x.reshape(*batch, *m_sizes, t)
    nb = len(batch)
    for i, f in enumerate(factors):
        # bring factor-i axis to -2, flatten all other non-batch dims into
        # the column dimension, run the factor's own matmul, restore layout
        x = jnp.moveaxis(x, nb + i, -2)
        inner_shape = x.shape
        mids = inner_shape[nb:-2]
        x = x.reshape(*batch, int(np_prod(mids)), inner_shape[-2], t)
        x = jnp.moveaxis(x, -3, -1)  # (*batch, m_i, t, mid)
        x = x.reshape(*batch, inner_shape[-2], -1)
        y = f._t_matmul(x) if transpose else f._matmul(x)  # (*batch, n_i, t*mid)
        n_i = y.shape[-2]
        y = y.reshape(*batch, n_i, t, -1)
        y = jnp.moveaxis(y, -1, -3)  # (*batch, mid, n_i, t)
        y = y.reshape(*batch, *mids, n_i, t)
        x = jnp.moveaxis(y, -2, nb + i)
    out_sizes = [f.shape[-2] if not transpose else f.shape[-1] for f in factors]
    return x.reshape(*batch, int(np_prod(tuple(out_sizes))), t)


def np_prod(xs) -> int:
    return int(math.prod(xs))


def _kron_vector(vectors):
    """Kronecker product of per-factor vectors (*b, n_i) -> (*b, prod n_i)."""
    out = vectors[0]
    for v in vectors[1:]:
        out = (out[..., :, None] * v[..., None, :]).reshape(
            *jnp.broadcast_shapes(out.shape[:-1], v.shape[:-1]), -1
        )
    return out


def _kron_init(self, *operators):
    """Variadic constructor like the reference's ``*linear_ops``
    (kronecker_product_linear_operator.py:63-76); also accepts a single
    tuple/list of factors (this package's dataclass form)."""
    if len(operators) == 1 and isinstance(operators[0], (tuple, list)):
        operators = tuple(operators[0])
    object.__setattr__(self, "operators", tuple(operators))
    self.__post_init__()


@operator_class
class KroneckerProductLinearOperator(LinearOperator):
    operators: tuple  # the factors

    __init__ = _kron_init

    @property
    def _symmetric_hint(self) -> bool:
        return all(f._symmetric_hint for f in self.operators)

    def __post_init__(self):
        if len(self.operators) < 1:
            raise ValueError("needs at least one factor")
        # Accept raw array factors / a list like the reference constructor
        # (kronecker_product_linear_operator.py:52-58); unflatten bypasses
        # this path.
        if not isinstance(self.operators, tuple) or any(
            not isinstance(f, LinearOperator) for f in self.operators
        ):
            from ._linear_operator import to_linear_operator

            object.__setattr__(
                self,
                "operators",
                tuple(to_linear_operator(f) for f in self.operators),
            )

    def _shape(self) -> tuple[int, ...]:
        batch = broadcast_shapes(*(f.batch_shape for f in self.operators))
        n = np_prod([f.shape[-2] for f in self.operators])
        m = np_prod([f.shape[-1] for f in self.operators])
        return (*batch, n, m)

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return _kron_mm(self.operators, rhs)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return _kron_mm(self.operators, rhs, transpose=True)

    def _transpose(self) -> "KroneckerProductLinearOperator":
        return type(self)(tuple(f._transpose() for f in self.operators))

    def _diagonal(self) -> jax.Array:
        return _kron_vector([f._diagonal() for f in self.operators])

    def to_dense(self) -> jax.Array:
        out = self.operators[0].to_dense()
        for f in self.operators[1:]:
            d = f.to_dense()
            out = (
                out[..., :, None, :, None] * d[..., None, :, None, :]
            ).reshape(
                *jnp.broadcast_shapes(out.shape[:-2], d.shape[:-2]),
                out.shape[-2] * d.shape[-2],
                out.shape[-1] * d.shape[-1],
            )
        return out

    # -- structure-aware math (reference :218-270) -------------------------

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        """K^{-1} = (x) K_i^{-1}: apply factor solves in the same sweep
        (reference :218-255)."""
        from ..functions import solve

        class _SolveAdapter:
            def __init__(self, f):
                self.f = f
                self.shape = f.shape
                self.batch_shape = f.batch_shape

            def _matmul(self, x):
                return solve(self.f, x)

            def _t_matmul(self, x):
                return solve(self.f._transpose(), x)

        return _kron_mm([_SolveAdapter(f) for f in self.operators], rhs)

    def _logdet_structure(self) -> jax.Array:
        """log|K| = sum_i (N / n_i) log|K_i| (reference :265-270)."""
        from ..functions import inv_quad_logdet

        n = self.shape[-1]
        total = None
        for f in self.operators:
            _, ld = inv_quad_logdet(f, None, logdet=True)
            term = (n // f.shape[-1]) * ld
            total = term if total is None else total + term
        return total

    def inverse(self) -> "KroneckerProductLinearOperator":
        """(reference :154-161)"""
        return KroneckerProductLinearOperator(
            tuple(_factor_inverse(f) for f in self.operators)
        )

    def _cholesky_impl(self, upper: bool = False):
        """chol(K) = (x) chol(K_i) (reference :181-186)."""
        from .triangular import TriangularLinearOperator

        factors = tuple(f._cholesky_impl(upper=upper) for f in self.operators)
        return TriangularLinearOperator(
            KroneckerProductTriangularLinearOperator(factors, upper=upper),
            upper=upper,
        )

    def _root_structure(self):
        roots = []
        for f in self.operators:
            r = f._root_structure()
            if r is None:
                from ..functions import root_decomposition

                r = root_decomposition(f).root
            roots.append(r)
        return KroneckerProductLinearOperator(tuple(roots))

    def _root_inv_structure(self):
        inv_roots = []
        for f in self.operators:
            r = f._root_inv_structure()
            if r is None:
                from ..functions import root_inv_decomposition

                r = root_inv_decomposition(f).root
            inv_roots.append(r)
        return KroneckerProductLinearOperator(tuple(inv_roots))

    def eigh(self):
        """Factor-wise symmetric eigendecomposition (reference :286-360):
        evals = kron of factor evals, evecs = kron of factor evecs.

        Same-shape factors on the generic dense path are STACKED into one
        batched eigh: TPU eigh (QDWH) is iteration-latency bound, so k
        sequential m x m calls cost ~k x one batched (k, m, m) call — the
        two 180^2 factor eighs dominate the whole Kronecker-Toeplitz
        solve+logdet benchmark (scripts/profile_kron.py)."""
        from collections import defaultdict

        from ..utils.eigh import eigh_safe
        from .dense import DenseLinearOperator
        from ._linear_operator import LinearOperator as _LO

        results: list = [None] * len(self.operators)
        groups = defaultdict(list)
        for i, f in enumerate(self.operators):
            if type(f).eigh is _LO.eigh:  # generic dense path only
                groups[f.shape].append(i)
        for idxs in groups.values():
            if len(idxs) < 2:
                continue
            stacked = jnp.stack([self.operators[i].to_dense() for i in idxs])
            ev, evec = eigh_safe(stacked)
            for k, i in enumerate(idxs):
                results[i] = (ev[k], DenseLinearOperator(evec[k]))
        for i, f in enumerate(self.operators):
            if results[i] is None:
                results[i] = f.eigh()
        evals = _kron_vector([r[0] for r in results])
        return evals, KroneckerProductLinearOperator(
            tuple(r[1] for r in results)
        )

    def eigvalsh(self) -> jax.Array:
        return jnp.sort(
            _kron_vector([f.eigvalsh() for f in self.operators]), axis=-1
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

    def __add__(self, other):
        from .diag import ConstantDiagLinearOperator, DiagLinearOperator
        from .kronecker_added_diag import KroneckerProductAddedDiagLinearOperator

        if isinstance(other, KroneckerProductDiagLinearOperator):
            return KroneckerProductAddedDiagLinearOperator(self, other)
        if isinstance(other, (DiagLinearOperator, ConstantDiagLinearOperator)):
            return KroneckerProductAddedDiagLinearOperator(self, other)
        if isinstance(other, KroneckerProductLinearOperator) and len(
            other.operators
        ) == len(self.operators) == 2:
            from .sum_kronecker import SumKroneckerLinearOperator

            return SumKroneckerLinearOperator((self, other))
        return super().__add__(other)

    def _expand_batch(self, batch_shape):
        # replace() keeps subclass static fields (Triangular's ``upper``)
        from .._pytree import replace

        return replace(
            self,
            operators=tuple(f._expand_batch(batch_shape) for f in self.operators),
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        # index (i, j) factors as mixed-radix digits over (n_i, m_i)
        out = None
        row_rem, col_rem = row_index, col_index
        # expand factors with fewer/broadcast batch dims to the product's
        # batch before applying batch indices (the reference expands factor
        # batches at construction; mixed-batch Kronecker = unbatched task
        # kernel x batched data kernel is the common multitask layout)
        batch = self.batch_shape
        factors = [f._expanded_to(batch) for f in self.operators]
        sizes = [(f.shape[-2], f.shape[-1]) for f in factors]
        # compute strides
        for idx, f in enumerate(factors):
            n_i, m_i = sizes[idx]
            row_stride = np_prod([s[0] for s in sizes[idx + 1:]])
            col_stride = np_prod([s[1] for s in sizes[idx + 1:]])
            ri = (row_rem // row_stride) % n_i
            ci = (col_rem // col_stride) % m_i
            vals = f._get_indices(ri, ci, *batch_indices)
            out = vals if out is None else out * vals
        return out


def _factor_inverse(f: LinearOperator) -> LinearOperator:
    if hasattr(f, "inverse"):
        try:
            return f.inverse()
        except (NotImplementedError, AttributeError):
            pass
    from .dense import DenseLinearOperator

    return DenseLinearOperator(jnp.linalg.inv(f.to_dense()))


def _kron_init_triangular(self, *operators, upper=False):
    if len(operators) == 1 and isinstance(operators[0], (tuple, list)):
        operators = tuple(operators[0])
    object.__setattr__(self, "operators", tuple(operators))
    object.__setattr__(self, "upper", upper)
    self.__post_init__()


@operator_class
class KroneckerProductTriangularLinearOperator(KroneckerProductLinearOperator):
    """Kronecker product of triangular factors (reference :382-433)."""

    upper: bool = static_field(default=False)

    __init__ = _kron_init_triangular

    @property
    def _inherently_triangular(self) -> bool:
        return True

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        # factor-wise triangular solves in the sweep (reference :405-433)
        class _SolveAdapter:
            def __init__(self, f):
                self.f = f
                self.shape = f.shape
                self.batch_shape = f.batch_shape

            def _matmul(self, x):
                s = self.f._solve_structure(x)
                if s is None:
                    from ..functions import solve

                    s = solve(self.f, x)
                return s

            def _t_matmul(self, x):
                return self._matmul(x)

        return _kron_mm([_SolveAdapter(f) for f in self.operators], rhs)

    def _cholesky_impl(self, upper: bool = False):
        from ..utils.errors import NotPSDError

        raise NotPSDError("triangular Kronecker product is not PSD")

    def _transpose(self):
        return KroneckerProductTriangularLinearOperator(
            tuple(f._transpose() for f in self.operators), upper=not self.upper
        )


@operator_class
class KroneckerProductDiagLinearOperator(KroneckerProductLinearOperator):
    """Kronecker product of diagonal factors (reference :436-543)."""

    __init__ = _kron_init

    @property
    def _inherently_triangular(self) -> bool:
        return True

    @property
    def _symmetric_hint(self) -> bool:
        return True

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        return rhs / self._diagonal()[..., :, None]

    def _logdet_structure(self) -> jax.Array:
        n = self.shape[-1]
        total = None
        for f in self.operators:
            term = (n // f.shape[-1]) * jnp.sum(jnp.log(f._diagonal()), axis=-1)
            total = term if total is None else total + term
        return total

    def abs(self) -> "KroneckerProductDiagLinearOperator":
        # |kron(d_1, ..., d_f)| = kron(|d_1|, ..., |d_f|) (reference :510-514)
        from .diag import DiagLinearOperator

        return KroneckerProductDiagLinearOperator(
            tuple(DiagLinearOperator(jnp.abs(f._diagonal())) for f in self.operators)
        )

    def inverse(self) -> "KroneckerProductDiagLinearOperator":
        from .diag import DiagLinearOperator

        return KroneckerProductDiagLinearOperator(
            tuple(DiagLinearOperator(1.0 / f._diagonal()) for f in self.operators)
        )

    def sqrt(self) -> "KroneckerProductDiagLinearOperator":
        from .diag import DiagLinearOperator

        return KroneckerProductDiagLinearOperator(
            tuple(DiagLinearOperator(jnp.sqrt(f._diagonal())) for f in self.operators)
        )

    def _root_structure(self):
        return self.sqrt()

    def _root_inv_structure(self):
        return self.inverse().sqrt()

    def _cholesky_impl(self, upper: bool = False):
        from .triangular import TriangularLinearOperator

        return TriangularLinearOperator(self.sqrt(), upper=upper)
