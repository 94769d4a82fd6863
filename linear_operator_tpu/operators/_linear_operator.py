"""Abstract base class for lazy (batched) linear operators.

TPU-native rebuild of the reference base class (reference:
linear_operator/operators/_linear_operator.py:114-3013).  An operator
represents a (batch of) M x N matrix implicitly through three primitives —
``_matmul`` (reference :169-190), ``_shape`` (:192-204) and ``_transpose``
(:206-221) — and ~90 public methods are built on top of them.

Architectural departures from the reference (deliberate, TPU-first):

* Operators are **frozen dataclasses registered as pytrees**
  (``linear_operator_tpu._pytree.operator_class``).  Pytree flattening IS the
  reference's ``representation()`` (:2076-2101); the treedef IS its
  ``LinearOperatorRepresentationTree``.  ``jax.custom_vjp`` then provides the
  whole L3 autograd layer with no reconstruction machinery.
* The ``__torch_function__`` dispatch registry (:56-111, 2981-3009) is
  replaced by a plain functional namespace (``linear_operator_tpu.solve`` etc.)
  plus operator dunders — idiomatic JAX instead of monkey-dispatch.
* All stochastic methods take explicit PRNG ``key`` arguments (replaces global
  torch RNG + the ``deterministic_probes`` cache, reference settings.py:245).
* There are no ``.to/.cuda/.cpu`` device methods: placement is controlled by
  ``jax.device_put`` / shardings on the leaves, and ``astype`` handles dtype.
* The per-object memoize cache (reference utils/memoize.py) has no functional
  analog under jit; instead factorizations RETURN operators that carry their
  factors (``CholLinearOperator``, ``RootLinearOperator``) and XLA's common
  subexpression elimination dedupes repeated pure subgraphs within a trace.
"""

from __future__ import annotations

import warnings
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from .._pytree import tree_map_leaves
from ..utils.broadcasting import broadcast_shapes, matmul_broadcast_shape
from ..utils.warnings import PerformanceWarning

IndexType = Any


def _fallback_key(key: jax.Array | None) -> jax.Array:
    """Explicit key if given, else a fixed key (the functional analog of the
    reference's ``deterministic_probes`` global probe cache)."""
    if key is None:
        return jax.random.PRNGKey(0)
    return key


class LinearOperator:
    """A (batch of) M x N linear operator(s), defined implicitly.

    Subclasses are created with the ``@operator_class`` decorator and must
    implement ``_matmul``, ``_shape`` and (for rectangular use)
    ``_transpose``.  Everything else has a generic default here, overridden
    where structure admits something faster.
    """

    # ------------------------------------------------------------------
    # Required primitives
    # ------------------------------------------------------------------

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        """(*b, M, N) @ (*b2, N, T) -> (broadcast(b, b2), M, T).

        Reference _linear_operator.py:169-190.
        """
        raise NotImplementedError

    def _shape(self) -> tuple[int, ...]:
        """Full shape, including batch dims (reference :192-204)."""
        raise NotImplementedError

    def _transpose(self) -> "LinearOperator":
        """Transpose of the matrix dims (reference ``_transpose_nonbatch``,
        :206-221)."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Shape & dtype
    # ------------------------------------------------------------------

    @property
    def shape(self) -> tuple[int, ...]:
        return self._shape()

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.shape[:-2]

    @property
    def matrix_shape(self) -> tuple[int, int]:
        return self.shape[-2:]

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def size(self, dim: int | None = None):
        return self.shape if dim is None else self.shape[dim]

    def dim(self) -> int:
        """Alias of ``ndim`` (reference ``dim``/``ndimension``, :1389-1400)."""
        return self.ndim

    def ndimension(self) -> int:
        """Alias of ``ndim`` (reference ``ndimension``, :1966-1970)."""
        return self.ndim

    @property
    def batch_dim(self) -> int:
        """Number of batch dimensions (reference ``batch_dim``, :1346-1350)."""
        return len(self.batch_shape)

    def numel(self) -> int:
        """Number of elements of the dense equivalent (reference ``numel``,
        :1972-1976)."""
        import math

        return math.prod(self.shape)

    @property
    def is_square(self) -> bool:
        return self.shape[-1] == self.shape[-2]

    @property
    def _symmetric_hint(self) -> bool:
        """True when the operator is self-adjoint by construction; enables
        the symmetrized solve backward (reference functions/_solve.py:96-131)
        and PSD-only code paths."""
        return False

    @property
    def _inherently_triangular(self) -> bool:
        """True when the operator is triangular by construction (diagonal,
        identity, zero) so TriangularLinearOperator wrappers can keep its
        structured fast paths instead of masking densely."""
        return False

    @property
    def dtype(self):
        # Stop at nested operators and use THEIR dtype: operators whose only
        # array leaves are indices (Permutation, ...) report a float dtype
        # via an override, and raw index leaves must not make a composite
        # integer-typed (add_diagonal etc. cast to self.dtype).
        sub = jax.tree_util.tree_flatten(
            self, is_leaf=lambda x: x is not self and isinstance(x, LinearOperator)
        )[0]
        dtypes = [leaf.dtype for leaf in sub]
        if not dtypes:
            return jnp.float32
        return jnp.result_type(*dtypes)

    @property
    def T(self) -> "LinearOperator":
        if self.ndim != 2:
            raise RuntimeError("Use .mT for batched operators")
        return self._transpose()

    @property
    def mT(self) -> "LinearOperator":
        return self._transpose()

    def __repr__(self) -> str:
        return f"{type(self).__name__}(shape={tuple(self.shape)}, dtype={self.dtype})"

    def __len__(self) -> int:
        if self.ndim <= 2:
            raise TypeError("len() of unbatched operator")
        return self.shape[0]

    # ------------------------------------------------------------------
    # Representation (pytree) helpers
    # ------------------------------------------------------------------

    def representation(self) -> tuple[jax.Array, ...]:
        """Flat defining arrays (reference :2076-2086)."""
        return tuple(jax.tree_util.tree_leaves(self))

    def detach(self) -> "LinearOperator":
        """Stop gradients on every leaf (reference ``detach``, :1382-1408)."""
        return tree_map_leaves(jax.lax.stop_gradient, self)

    def detach_(self) -> "LinearOperator":
        """Deprecated in-place spelling (reference ``detach_``, :1410-1418).

        JAX operators are immutable; returns a detached copy like
        :meth:`detach`.
        """
        return self.detach()

    def clone(self) -> "LinearOperator":
        """Copy with freshly-copied leaves (reference ``clone``, :1325-1334).

        JAX arrays are immutable, so this is a structural no-op kept for API
        parity; the returned operator shares leaf buffers safely.
        """
        return tree_map_leaves(lambda leaf: leaf, self)

    def astype(self, dtype) -> "LinearOperator":
        """Cast every floating leaf (reference ``to``/``float``/..., :2606-2631)."""
        def cast(leaf):
            if jnp.issubdtype(leaf.dtype, jnp.floating) or jnp.issubdtype(
                leaf.dtype, jnp.complexfloating
            ):
                return leaf.astype(dtype)
            return leaf
        return tree_map_leaves(cast, self)

    def float(self) -> "LinearOperator":
        """(reference ``float``, :1336-1346)"""
        return self.astype(jnp.float32)

    def double(self) -> "LinearOperator":
        return self.astype(jnp.float64)

    def half(self) -> "LinearOperator":
        return self.astype(jnp.float16)

    def bfloat16(self) -> "LinearOperator":
        """TPU-native half precision (no reference analog)."""
        return self.astype(jnp.bfloat16)

    def type(self, dtype=None):
        """Reference ``type`` (:2692-2725): with an argument, cast (alias of
        ``astype``); without, return the operator's dtype."""
        if dtype is None:
            return self.dtype
        return self.astype(dtype)

    def to(self, dtype_or_device) -> "LinearOperator":
        """Reference ``to`` (:2606-2631): a dtype casts every floating leaf;
        a ``jax.Device`` or ``jax.sharding.Sharding`` moves the whole pytree
        via ``jax.device_put`` (the TPU-native device story — shardings ARE
        the multi-device placement API here)."""
        if isinstance(dtype_or_device, (jax.Device, jax.sharding.Sharding)):
            return jax.device_put(self, dtype_or_device)
        return self.astype(dtype_or_device)

    @property
    def device(self):
        """Device of the first array leaf (reference ``device``); None for
        leafless operators (Identity/Zero carry only static metadata)."""
        leaves = jax.tree_util.tree_leaves(self)
        if not leaves:
            return None
        devs = getattr(leaves[0], "devices", None)
        return next(iter(devs())) if devs else None

    def cpu(self) -> "LinearOperator":
        """Move all leaves to host CPU (reference ``cpu``, :2606-2631)."""
        return jax.device_put(self, jax.devices("cpu")[0])

    def cuda(self, device=None) -> "LinearOperator":
        """Reference ``cuda`` compatibility shim: places the operator on the
        default accelerator (``jax.devices()[0]`` — a TPU here, a GPU under a
        CUDA jaxlib).  Prefer ``to(device_or_sharding)``."""
        return jax.device_put(
            self, jax.devices()[device] if isinstance(device, int) else jax.devices()[0]
        )

    def requires_grad_(self, value: bool = True) -> "LinearOperator":
        """Reference API shim (:2117-2126): JAX differentiates functionally
        (``jax.grad`` w.r.t. whichever leaves you choose), so there is no
        per-tensor grad flag to set; returns self unchanged.  Use ``detach``
        to stop gradients through an operator."""
        return self

    # ------------------------------------------------------------------
    # Default derived primitives
    # ------------------------------------------------------------------

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        """Transposed mat-mat (reference :223-236)."""
        return self._transpose()._matmul(rhs)

    def _diagonal(self) -> jax.Array:
        """Main diagonal (*b, min(M,N)).  Dense fallback; subclasses override
        with O(N) versions (reference ``_diagonal``, :~870)."""
        d = jnp.diagonal(self.to_dense(), axis1=-2, axis2=-1)
        return d

    def to_dense(self) -> jax.Array:
        """Materialize (reference ``to_dense``, :2633-2651)."""
        n = self.shape[-1]
        eye = jnp.eye(n, dtype=self.dtype)
        return self._matmul(jnp.broadcast_to(eye, (*self.batch_shape, n, n)))

    def numpy(self) -> np.ndarray:
        """(reference ``numpy``, :1936)"""
        return np.asarray(self.to_dense())

    def _bilinear_derivative(
        self, left_vecs: jax.Array, right_vecs: jax.Array
    ) -> "LinearOperator":
        """Gradient of ``sum(left * (K @ right))`` w.r.t. the operator leaves,
        returned as an operator-shaped pytree of cotangents.

        This is the reference's default backward (``_bilinear_derivative``,
        :336-393 — re-running ``_matmul`` under autograd); in JAX it is one
        ``jax.grad`` of the mat-mul.  Subclasses with analytic forms (Diag,
        Toeplitz, Mul) override.
        """
        leaves, treedef = jax.tree_util.tree_flatten(self)

        def f(leaves_):
            op = jax.tree_util.tree_unflatten(treedef, leaves_)
            return jnp.sum(left_vecs * op._matmul(right_vecs))

        # allow_int: integer leaves (interpolation indices, permutations) get
        # float0 cotangents, which custom_vjp accepts for int primals
        grads = jax.grad(f, allow_int=True)(list(leaves))
        return jax.tree_util.tree_unflatten(treedef, grads)

    # ------------------------------------------------------------------
    # Structure hooks (subclasses override; ``None`` = no fast path)
    # ------------------------------------------------------------------

    def _solve_structure(self, rhs: jax.Array) -> jax.Array | None:
        """Structure-aware exact solve, or None (e.g. Diag: rhs / d)."""
        return None

    def _logdet_structure(self) -> jax.Array | None:
        """Structure-aware exact logdet, or None."""
        return None

    def _inv_quad_logdet_structure(
        self, rhs: jax.Array | None, logdet: bool
    ) -> tuple[jax.Array, jax.Array] | None:
        return None

    def _cholesky_impl(self, upper: bool = False) -> "LinearOperator":
        """Lower/upper Cholesky factor as a TriangularLinearOperator.

        Dense fallback via psd_safe_cholesky (reference ``_cholesky``,
        :517-541)."""
        from .dense import DenseLinearOperator
        from .triangular import TriangularLinearOperator
        from ..utils.cholesky import psd_safe_cholesky

        L = psd_safe_cholesky(self.to_dense())
        if upper:
            return TriangularLinearOperator(
                DenseLinearOperator(jnp.swapaxes(L, -1, -2)), upper=True
            )
        return TriangularLinearOperator(DenseLinearOperator(L), upper=False)

    def _root_structure(self) -> "LinearOperator | None":
        """Closed-form root R with K = R R^T, or None (e.g. Diag: sqrt)."""
        return None

    def _root_inv_structure(self) -> "LinearOperator | None":
        """Closed-form root of K^{-1}, or None."""
        return None

    def _preconditioner(self):
        """(closure, preconditioner_operator, logdet_of_preconditioner) or
        (None, None, None) — reference ``_preconditioner`` / AddedDiag
        override (added_diag_linear_operator.py:95-184).  With
        ``beta_features.default_preconditioner`` on, falls back to a
        randomized rangefinder preconditioner (reference
        _linear_operator.py:817-846)."""
        from .. import beta_features

        if (
            beta_features.default_preconditioner.on()
            and self.is_square
            and self.shape[-1] >= settings.min_preconditioning_size.value()
        ):
            return beta_features.build_default_preconditioner(
                self.detach(), rank=settings.max_preconditioner_size.value()
            )
        return None, None, None

    def _matmul_closure(self) -> Callable[[jax.Array], jax.Array]:
        """Mat-vec closure for iterative solvers.  Called ONCE per solve,
        OUTSIDE the solver's ``while_loop`` — operators that benefit from
        hoisted per-solve setup override this (KernelLinearOperator caches a
        materialized K when it fits the memory budget, cutting kernel
        re-evaluation ~(CG iterations)x; Sum/ConstantMul compose term
        closures so the caching survives wrapping, e.g. K + noise*I).
        Default: ``self._matmul``."""
        return self._matmul

    def _solve_via_cg(
        self,
        rhs: jax.Array,
        preconditioner: Callable[[jax.Array], jax.Array] | None = None,
        n_tridiag: int = 0,
    ):
        """Matrix-free preconditioned CG on this operator (reference
        ``_solve``, :781-803)."""
        from ..solvers.linear_cg import linear_cg

        return linear_cg(
            self._matmul_closure(),
            rhs,
            preconditioner=preconditioner,
            n_tridiag=n_tridiag,
        )

    # ------------------------------------------------------------------
    # Matmul & arithmetic
    # ------------------------------------------------------------------

    def matmul(self, other):
        """K @ other.  Array -> array result; operator -> lazy product
        (reference ``matmul``, :1844-1866)."""
        from .matmul import MatmulLinearOperator

        if isinstance(other, LinearOperator):
            return MatmulLinearOperator(self, other)
        other = jnp.asarray(other)
        if other.ndim == 1:
            return self._matmul(other[..., None])[..., 0]
        if settings.debug.on():
            matmul_broadcast_shape(self.shape, other.shape)
        return self._matmul(other)

    def rmatmul(self, other):
        """other @ K (reference ``rmatmul``, :2138-2155)."""
        if isinstance(other, LinearOperator):
            return other.matmul(self)
        other = jnp.asarray(other)
        if other.ndim == 1:
            return self._t_matmul(other[..., None])[..., 0]
        return jnp.swapaxes(
            self._t_matmul(jnp.swapaxes(other, -1, -2)), -1, -2
        )

    def __matmul__(self, other):
        return self.matmul(other)

    def __rmatmul__(self, other):
        return self.rmatmul(other)

    def __add__(self, other):
        """Structure-dispatching add (reference ``__add__``, :2801-2827)."""
        from .dense import DenseLinearOperator
        from .diag import DiagLinearOperator
        from .added_diag import AddedDiagLinearOperator
        from .root import RootLinearOperator
        from .sum import SumLinearOperator
        from .zero import ZeroLinearOperator

        if isinstance(other, ZeroLinearOperator):
            return self
        if isinstance(other, DiagLinearOperator):
            return AddedDiagLinearOperator(self, other)
        if isinstance(other, RootLinearOperator):
            # pass the root operator itself (reference :2816-2817) — lazily,
            # so a structured (even full-rank) root keeps its fast mat-vec
            return self.add_low_rank(other.root)
        if isinstance(other, LinearOperator):
            return SumLinearOperator((self, other))
        other = jnp.asarray(other)
        if other.ndim == 0:
            # scalar: pointwise add of a constant — densify (rare path).
            return DenseLinearOperator(self.to_dense() + other)
        return SumLinearOperator((self, DenseLinearOperator(other)))

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        return self.__add__(other * -1)

    def __rsub__(self, other):
        return (self * -1).__add__(other)

    def __neg__(self):
        return self * -1

    def add(self, other, alpha: float | None = None) -> "LinearOperator":
        """``self + alpha * other`` (reference ``add``, :999-1017)."""
        if alpha is None:
            return self + other
        return self + other * alpha

    def sub(self, other, alpha: float | None = None) -> "LinearOperator":
        """``self - alpha * other`` (torch API counterpart of :meth:`add`)."""
        if alpha is None:
            return self - other
        return self - other * alpha

    def div(self, other) -> "LinearOperator":
        """``self * (1 / other)`` (reference ``div``, :1402-1418)."""
        from .zero import ZeroLinearOperator

        if isinstance(other, ZeroLinearOperator):
            raise RuntimeError("Attempted to divide by a ZeroLinearOperator")
        return self.mul(1.0 / jnp.asarray(other))

    def t(self) -> "LinearOperator":
        """2-D transpose alias (reference ``t``, :2485-2494)."""
        if self.ndim != 2:
            raise RuntimeError("Cannot call t for more than 2 dimensions")
        return self._transpose()

    def evaluate_kernel(self) -> "LinearOperator":
        """Reference ``evaluate_kernel`` (:1430-1436) rebuilds the operator
        from its representation so lazily-evaluated kernel wrappers
        materialize their covar blocks; here operators ARE their pytrees, so
        a rebuilt operator is this operator."""
        leaves, treedef = jax.tree_util.tree_flatten(self)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # Elementwise spectrum/entry functions: only structure-aware subclasses
    # (e.g. Diag) implement these, matching the reference's base-class
    # contract (reference abs/exp/log/sqrt/inverse, :981-997, :1420-1428,
    # :1860-1879, :2450-2466, :1692-1703).
    def abs(self) -> "LinearOperator":
        raise NotImplementedError(
            f"abs({type(self).__name__}) is not implemented."
        )

    def exp(self) -> "LinearOperator":
        raise NotImplementedError(
            f"exp({type(self).__name__}) is not implemented."
        )

    def log(self) -> "LinearOperator":
        raise NotImplementedError(
            f"log({type(self).__name__}) is not implemented."
        )

    def sqrt(self) -> "LinearOperator":
        raise NotImplementedError(
            f"sqrt({type(self).__name__}) is not implemented."
        )

    def inverse(self) -> "LinearOperator":
        raise NotImplementedError(
            f"inverse({type(self).__name__}) is not implemented; "
            "use solve(rhs) for matrix-free application of the inverse."
        )

    def mul(self, other):
        """Elementwise multiply (reference ``mul``, :1881-1917)."""
        from .constant_mul import ConstantMulLinearOperator
        from .mul import MulLinearOperator

        if isinstance(other, LinearOperator):
            return MulLinearOperator.from_operators(self, other)
        other = jnp.asarray(other)
        if other.ndim == 0 or other.shape[-2:] == (1, 1) or other.ndim <= self.ndim - 2:
            const = jnp.asarray(other, dtype=self.dtype)
            if const.ndim >= 2 and const.shape[-2:] == (1, 1):
                # strip the trailing (1, 1) matrix dims: ConstantMul carries
                # a BATCH-shaped constant and re-appends (1, 1) itself —
                # keeping them would misalign per-batch constants against
                # the batch dims (reference mul, :1881-1917, squeezes too)
                const = const[..., 0, 0]
            return ConstantMulLinearOperator(self, const)
        from .dense import DenseLinearOperator

        return MulLinearOperator.from_operators(self, DenseLinearOperator(other))

    def __mul__(self, other):
        return self.mul(other)

    def __rmul__(self, other):
        return self.mul(other)

    def __truediv__(self, other):
        other = jnp.asarray(other)
        return self.mul(1.0 / other)

    # ------------------------------------------------------------------
    # Diagonal modification & composition helpers
    # ------------------------------------------------------------------

    def add_diagonal(self, diag: jax.Array) -> "LinearOperator":
        """K + diag(d) (reference ``add_diagonal``, :953-1008)."""
        from .added_diag import AddedDiagLinearOperator
        from .diag import ConstantDiagLinearOperator, DiagLinearOperator

        if not self.is_square:
            raise RuntimeError("add_diagonal requires a square operator")
        diag = jnp.asarray(diag, dtype=self.dtype)
        n = self.shape[-1]
        if diag.ndim == 0 or (diag.ndim >= 1 and diag.shape[-1] == 1):
            diag_op = ConstantDiagLinearOperator(
                jnp.reshape(diag, diag.shape + (1,) * (0 if diag.ndim else 1))
                if diag.ndim
                else diag[None],
                diag_shape=n,
            )
        else:
            diag_op = DiagLinearOperator(jnp.broadcast_to(diag, diag.shape[:-1] + (n,)))
        # Route through __add__ so subclass dispatch applies (the reference
        # overrides add_diagonal per class, e.g. Kronecker ->
        # KroneckerProductAddedDiag, kronecker_product_linear_operator.py:116;
        # here the + dispatch IS that registry).
        return self + diag_op

    def add_jitter(self, jitter_val: float = 1e-3) -> "LinearOperator":
        """(reference ``add_jitter``, :1010-1017)"""
        return self.add_diagonal(jnp.asarray(jitter_val, dtype=self.dtype))

    def add_low_rank(
        self, low_rank_mat: jax.Array, generate_roots: bool = True
    ) -> "LinearOperator":
        """K + V V^T (reference ``add_low_rank``, :1019-1142, Stanton et al.
        2021).

        With ``generate_roots`` (the reference default) and a
        structurally-rooted K = R R^T — the functional analog of the
        reference's "has cached roots" gate (:1079-1080) — the result is
        returned AS a RootLinearOperator with root [R | V]: the root
        "update" is exact column concatenation, so downstream
        root/solve/logdet reuse it for free.  When K carries no root the
        result is a lazy sum and NO root is speculatively computed
        (reference regression: roots are only updated, never created here —
        test_dense_linear_operator.py::test_no_root_computation_when_no_cached_roots).
        """
        from .root import RootLinearOperator
        from .dense import DenseLinearOperator
        from .sum import SumLinearOperator

        if isinstance(low_rank_mat, LinearOperator):
            # keep a structured root lazy (a full-rank Toeplitz/structured
            # root must NOT densify — its mat-vec carries the structure)
            v_op = low_rank_mat
        else:
            v = jnp.asarray(low_rank_mat, dtype=self.dtype)
            if v.ndim == 1:
                v = v[:, None]
            v_op = DenseLinearOperator(v)
        root = self._carried_root() if generate_roots else None
        if root is not None:
            joined = jnp.concatenate([root.to_dense(), v_op.to_dense()], axis=-1)
            return RootLinearOperator(DenseLinearOperator(joined))
        return SumLinearOperator((self, RootLinearOperator(v_op)))

    def cat_rows(
        self,
        cross_mat: jax.Array,
        new_mat: jax.Array,
        generate_roots: bool = True,
    ) -> "LinearOperator":
        """Append rows/columns to a PSD operator (reference ``cat_rows``,
        :1152-1308, Pleiss et al. 2018 "fantasy updates").  ``cross_mat`` is
        the NEW ROWS block of shape (*b, m, n) — the reference's convention
        (:1154-1165, cross-checked by tests/test_vs_reference_torch_ext.py):

            K' = [[K,   B],
                  [B^T, C]]   with B = cross_mat^T (n, m), C = new_mat (m, m).

        With ``generate_roots`` AND a structurally-rooted K (the functional
        analog of the reference's "has cached roots" gate, :1265-1272) the
        result carries an (approximately) exact block-triangular root

            L' = [[R,         0],
                  [B^T R^{-T}, S]],   S S^T = C - B^T K^{-1} B  (Schur),

        (the reference's cache seeding, :1300-1306) so posterior updates
        after adding points cost O(n m) instead of a fresh factorization.
        Otherwise a lazy Cat-of-Cat block operator is returned — roots are
        only updated here, never speculatively created.
        """
        from .cat import CatLinearOperator
        from .dense import DenseLinearOperator
        from .root import RootLinearOperator
        from ..utils.cholesky import psd_safe_cholesky

        B = jnp.swapaxes(jnp.asarray(cross_mat, dtype=self.dtype), -1, -2)
        C = jnp.asarray(new_mat, dtype=self.dtype)
        root_op = self._carried_root() if generate_roots else None
        if root_op is None:
            top = CatLinearOperator(
                (self, DenseLinearOperator(B)), cat_dim=-1
            )
            bottom = CatLinearOperator(
                (
                    DenseLinearOperator(jnp.swapaxes(B, -1, -2)),
                    DenseLinearOperator(C),
                ),
                cat_dim=-1,
            )
            return CatLinearOperator((top, bottom), cat_dim=-2)

        R = root_op.to_dense()  # (*b, n, k)
        n, k = R.shape[-2], R.shape[-1]
        m = C.shape[-1]
        # lower-left block: B^T R^{-T}; with rectangular R use pinv via solve
        from ..functions import solve

        KinvB = solve(self, B)  # (*b, n, m)
        lower_left = jnp.swapaxes(KinvB, -1, -2) @ R  # B^T K^{-1} R = B^T R^{-T}
        schur = C - jnp.swapaxes(B, -1, -2) @ KinvB
        S = psd_safe_cholesky(
            (schur + jnp.swapaxes(schur, -1, -2)) / 2.0
        )
        top = jnp.concatenate(
            [R, jnp.zeros((*R.shape[:-1], m), dtype=R.dtype)], axis=-1
        )
        bottom = jnp.concatenate([lower_left, S], axis=-1)
        joined_root = jnp.concatenate([top, bottom], axis=-2)
        return RootLinearOperator(DenseLinearOperator(joined_root))

    def diagonal(self) -> jax.Array:
        """(reference ``diagonal``, :1410-1436)"""
        return self._diagonal()

    def trace(self) -> jax.Array:
        return jnp.sum(self._diagonal(), axis=-1)

    # ------------------------------------------------------------------
    # Solves, quadratic forms, log-determinants
    # ------------------------------------------------------------------

    def solve(
        self, rhs: jax.Array, lhs: jax.Array | None = None, *, factored=None
    ) -> jax.Array:
        """K^{-1} rhs, optionally lhs @ K^{-1} rhs (reference ``solve``,
        :2324-2379).  ``factored``: reuse a factorization (see
        ``with_factorization``)."""
        from ..functions import solve

        return solve(self, rhs, lhs, factored=factored)

    def with_factorization(self, factor: "LinearOperator") -> "LinearOperator":
        """Functional analog of the reference's memoize cache seeding
        (utils/memoize.py:10-125, add_low_rank :1139-1140, cat_rows
        :1300-1306): given a factor-carrying operator previously computed
        for this operator (``self.cholesky()``, a root decomposition, ...),
        returns the operator through which all subsequent solves / logdets /
        samples should be routed.  Since factor-carrying operators represent
        the SAME matrix with structural fast paths — and their VJPs carry
        gradients back to the original leaves — the result is the factor
        wrapped as the matrix it factorizes (a triangular L becomes
        CholLinearOperator(L) = L L^T); matrix-shaped factor carriers pass
        through validated.
        """
        factor = self._wrap_factor(factor)
        if settings.debug.on() and factor.shape != self.shape:
            raise RuntimeError(
                f"factorization shape {factor.shape} != operator shape {self.shape}"
            )
        return factor

    @staticmethod
    def _wrap_factor(factor: "LinearOperator") -> "LinearOperator":
        """Normalize a factorization into the operator it represents: a
        triangular Cholesky factor L becomes CholLinearOperator(L) = L L^T
        (upper factors R become R^T R via transposition); factor-carrying
        matrix operators (Chol/Root/...) pass through."""
        from .chol import CholLinearOperator
        from .triangular import TriangularLinearOperator

        if isinstance(factor, TriangularLinearOperator):
            if factor.upper:
                factor = factor._transpose()
            return CholLinearOperator(factor)
        return factor

    def _carried_root(self) -> "LinearOperator | None":
        """The root this operator CARRIES as its own representation (Root /
        LowRankRoot / Chol — i.e. the factor is already data), or None.

        This is the functional analog of the reference's "has cached roots"
        gate (_linear_operator.py:1079-1080, 1265-1272): ``add_low_rank`` /
        ``cat_rows`` update a root that already exists but never compute one
        — a merely *computable* structural root (Kronecker factor roots, a
        Diag's sqrt) does not count, both because the reference would not
        have it cached and because materializing it would destroy laziness
        (e.g. K + RootLinearOperator(Toeplitz) must keep the O(n) column
        representation).
        """
        from .chol import CholLinearOperator
        from .root import RootLinearOperator

        if isinstance(self, (RootLinearOperator, CholLinearOperator)):
            return self._root_structure()
        return None

    def solve_triangular(self, rhs: jax.Array, *, upper: bool, left: bool = True):
        """Only defined for triangular operators — the base class cannot
        honor ``upper`` without densifying, so it refuses like the reference
        (_linear_operator.py:2411-2412); TriangularLinearOperator overrides
        and validates ``upper`` against its own orientation."""
        raise NotImplementedError(
            f"solve_triangular({type(self).__name__}) is not implemented; "
            "only triangular operators support it."
        )

    def inv_quad(self, rhs: jax.Array, reduce_inv_quad: bool = True) -> jax.Array:
        """rhs^T K^{-1} rhs (reference ``inv_quad``, :1637-1686)."""
        from ..functions import inv_quad

        return inv_quad(self, rhs, reduce_inv_quad=reduce_inv_quad)

    def inv_quad_logdet(
        self,
        inv_quad_rhs: jax.Array | None = None,
        logdet: bool = False,
        reduce_inv_quad: bool = True,
        *,
        key: jax.Array | None = None,
        factored=None,
    ) -> tuple[jax.Array, jax.Array]:
        """(rhs^T K^{-1} rhs, log|K|) sharing one batched solve (reference
        ``inv_quad_logdet``, :1688-1804).  ``factored``: reuse a
        factorization (see ``with_factorization``)."""
        from ..functions import inv_quad_logdet

        return inv_quad_logdet(
            self,
            inv_quad_rhs,
            logdet=logdet,
            reduce_inv_quad=reduce_inv_quad,
            key=key,
            factored=factored,
        )

    def logdet(self, *, key: jax.Array | None = None) -> jax.Array:
        """(reference ``logdet``, :1834-1842)"""
        _, ld = self.inv_quad_logdet(None, logdet=True, key=key)
        return ld

    def log_det(self, *, key: jax.Array | None = None) -> jax.Array:
        """Deprecated alias for :meth:`logdet` (reference ``log_det``,
        :1844-1852)."""
        warnings.warn(
            "log_det is deprecated; use logdet", DeprecationWarning, stacklevel=2
        )
        return self.logdet(key=key)

    def inv_quad_log_det(
        self,
        inv_quad_rhs: jax.Array | None = None,
        logdet: bool = False,
        reduce_inv_quad: bool = True,
        *,
        key: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Deprecated alias for :meth:`inv_quad_logdet` (reference
        ``inv_quad_log_det``, :1806-1832)."""
        warnings.warn(
            "inv_quad_log_det is deprecated; use inv_quad_logdet",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.inv_quad_logdet(
            inv_quad_rhs, logdet=logdet, reduce_inv_quad=reduce_inv_quad, key=key
        )

    # ------------------------------------------------------------------
    # Factorizations
    # ------------------------------------------------------------------

    def cholesky(self, upper: bool = False) -> "LinearOperator":
        """Lower (or upper) Cholesky factor as a TriangularLinearOperator
        (reference ``cholesky``, :1310-1323)."""
        return self._cholesky_impl(upper=upper)

    def _choose_root_method(self) -> str:
        """Size-cutoff policy (reference ``_choose_root_method``, :543-561 —
        minus the cache-awareness, which has no functional analog)."""
        if (
            settings.fast_computations.covar_root_decomposition.off()
            or self.shape[-1] <= settings.max_cholesky_size.value()
        ):
            return "cholesky"
        return "lanczos"

    def root_decomposition(
        self, method: str | None = None, *, key: jax.Array | None = None
    ) -> "LinearOperator":
        """Operator equal to self, carrying a root R with K = R R^T
        (reference ``root_decomposition``, :2157-2218)."""
        from ..functions import root_decomposition

        return root_decomposition(self, method=method, key=key)

    def root_inv_decomposition(
        self,
        initial_vectors: jax.Array | None = None,
        test_vectors: jax.Array | None = None,
        method: str | None = None,
        *,
        key: jax.Array | None = None,
    ) -> "LinearOperator":
        """Operator equal to self^{-1}, carrying a root (reference
        ``root_inv_decomposition``, :2220-2307).  With multiple
        ``initial_vectors`` the best probe is chosen by the ``test_vectors``
        residual test (reference utils/lanczos.py:192-223)."""
        from ..functions import root_inv_decomposition

        return root_inv_decomposition(
            self,
            method=method,
            key=key,
            initial_vectors=initial_vectors,
            test_vectors=test_vectors,
        )

    def diagonalization(
        self, method: str | None = None, *, key: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array]:
        """(evals, evecs) with K ~= Q diag(evals) Q^T (reference
        ``diagonalization``, :1438-1482)."""
        from ..functions import diagonalization

        return diagonalization(self, method=method, key=key)

    def eigh(self) -> tuple[jax.Array, "LinearOperator"]:
        """(reference ``eigh``, :1520-1539)"""
        from .dense import DenseLinearOperator

        if settings.debug.on() and not self.is_square:
            raise RuntimeError("eigh requires a square (symmetric) operator")
        from ..utils.eigh import eigh_safe

        # degeneracy-safe JVP: repeated eigenvalues (isotropic task kernels,
        # identical batch elements) must not turn gradients NaN
        evals, evecs = eigh_safe(self.to_dense())
        return evals, DenseLinearOperator(evecs)

    def eigvalsh(self) -> jax.Array:
        """(reference ``eigvalsh``, :1541-1562)"""
        return jnp.linalg.eigvalsh(self.to_dense())

    def svd(self) -> tuple["LinearOperator", jax.Array, "LinearOperator"]:
        """(U, S, V) (reference ``svd``, :2552-2584; ``_svd`` default via
        symeig for PSD, :866-889)."""
        from .dense import DenseLinearOperator

        U, S, Vt = jnp.linalg.svd(self.to_dense(), full_matrices=False)
        return (
            DenseLinearOperator(U),
            S,
            DenseLinearOperator(jnp.swapaxes(Vt, -1, -2)),
        )

    def pivoted_cholesky(
        self, rank: int, error_tol: float | None = None, return_pivots: bool = False
    ):
        """Partial pivoted Cholesky factor (reference ``pivoted_cholesky``,
        :1975-2007; functions/_pivoted_cholesky.py:14-105)."""
        from ..functions import pivoted_cholesky

        return pivoted_cholesky(
            self, rank, error_tol=error_tol, return_pivots=return_pivots
        )

    def sqrt_inv_matmul(
        self,
        rhs: jax.Array,
        lhs: jax.Array | None = None,
        *,
        key: jax.Array | None = None,
    ):
        """K^{-1/2} rhs via contour integral quadrature (reference
        ``sqrt_inv_matmul``, :2422-2466).  ``key`` seeds the Lanczos
        eigenvalue-range probe (``key=None`` = fixed key)."""
        from ..functions import sqrt_inv_matmul

        return sqrt_inv_matmul(self, rhs, lhs, key=key)

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------

    def zero_mean_mvn_samples(
        self, num_samples: int, *, key: jax.Array | None = None
    ) -> jax.Array:
        """Draw N(0, K) samples, shape (num_samples, *b, N) (reference
        ``zero_mean_mvn_samples``, :2746-2793)."""
        key = _fallback_key(key)
        # split: one stream for the decomposition's probe/init vectors, one
        # for the sample draw — reusing a key would correlate the noise with
        # the directions a truncated (Lanczos/CIQ) root resolves best
        key_decomp, key_base = jax.random.split(key)
        if settings.ciq_samples.on():
            from ..functions import sqrt_matmul_ciq

            base = jax.random.normal(
                key_base,
                (*self.batch_shape, self.shape[-1], num_samples),
                dtype=self.dtype,
            )
            samples = sqrt_matmul_ciq(self, base, key=key_decomp)
            return jnp.moveaxis(samples, -1, 0)
        root = self.root_decomposition(key=key_decomp).root
        k = root.shape[-1]
        base = jax.random.normal(
            key_base, (*self.batch_shape, k, num_samples), dtype=self.dtype
        )
        samples = root.matmul(base)  # (*b, N, s)
        return jnp.moveaxis(samples, -1, 0)

    # ------------------------------------------------------------------
    # Batch-dim manipulation
    # ------------------------------------------------------------------

    def _expand_batch(self, batch_shape: tuple[int, ...]) -> "LinearOperator":
        """Dense fallback; subclasses override to broadcast leaves lazily."""
        from .dense import DenseLinearOperator

        warnings.warn(
            f"{type(self).__name__} fell back to dense materialization in "
            f"_expand_batch.",
            PerformanceWarning,
        )
        dense = jnp.broadcast_to(self.to_dense(), (*batch_shape, *self.matrix_shape))
        return DenseLinearOperator(dense)

    def _expanded_to(self, batch_shape: tuple[int, ...]) -> "LinearOperator":
        """Self expanded to ``batch_shape`` when its own batch is narrower
        (identity otherwise).  Composite operators call this on their
        children before applying batch indices — a child with fewer or
        singleton batch dims cannot absorb the parent's batch indices."""
        if tuple(self.batch_shape) == tuple(batch_shape):
            return self
        return self._expand_batch(tuple(batch_shape))

    def expand(self, *sizes) -> "LinearOperator":
        """(reference ``expand``, :1580-1615)"""
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        if sizes[-2:] != self.matrix_shape:
            raise RuntimeError(
                f"expand cannot change matrix shape {self.matrix_shape}"
            )
        batch_shape = tuple(
            self_s if new_s == -1 else new_s
            for new_s, self_s in zip(
                sizes[:-2], (1,) * (len(sizes) - 2 - len(self.batch_shape)) + self.batch_shape
            )
        )
        return self._expand_batch(broadcast_shapes(batch_shape, self.batch_shape))

    def reshape(self, *sizes) -> "LinearOperator":
        """Alias for :meth:`expand` (reference ``reshape``, :2419-2428),
        accepting the leading -1 convention reshape allows."""
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        if len(sizes) == self.ndim + 1 and sizes[0] == -1:
            sizes = (1,) + tuple(sizes[1:])
        return self.expand(*sizes)

    def repeat(self, *sizes) -> "LinearOperator":
        """(reference ``repeat``, :2042-2073) — lazy batch repeat."""
        from .batch_repeat import BatchRepeatLinearOperator

        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        if len(sizes) < 2 or sizes[-1] != 1 or sizes[-2] != 1:
            raise RuntimeError(
                "repeat on an operator requires trailing (1, 1) for matrix dims"
            )
        return BatchRepeatLinearOperator(self, batch_repeat=tuple(sizes[:-2]))

    def _unsqueeze_batch(self, dim: int) -> "LinearOperator":
        # dense fallback (broadcast cannot INSERT a middle dim); subclasses
        # override with leaf reshapes
        from .dense import DenseLinearOperator

        return DenseLinearOperator(jnp.expand_dims(self.to_dense(), dim))

    def unsqueeze(self, dim: int) -> "LinearOperator":
        """(reference ``unsqueeze``, :2727-2743)"""
        ndim = self.ndim
        if dim < 0:
            dim = dim + ndim + 1
        if dim > ndim - 2:
            raise RuntimeError("cannot unsqueeze into matrix dims")
        return self._unsqueeze_batch(dim)

    def squeeze(self, dim: int) -> "LinearOperator":
        """(reference ``squeeze``, :2468-2483)"""
        if self.shape[dim] != 1:
            return self
        index = [slice(None)] * self.ndim
        index[dim] = 0
        return self[tuple(index)]

    def _permute_batch(self, *dims: int) -> "LinearOperator":
        from .dense import DenseLinearOperator

        dense = self.to_dense()
        return DenseLinearOperator(
            jnp.transpose(dense, (*dims, self.ndim - 2, self.ndim - 1))
        )

    def permute(self, *dims: int) -> "LinearOperator":
        """(reference ``permute``, :1942-1973) — batch dims only."""
        if len(dims) == 1 and isinstance(dims[0], (tuple, list)):
            dims = tuple(dims[0])
        num_batch = self.ndim - 2
        # negative dims normalize over the FULL ndim (reference :1955:
        # dim + num_dims) — a full-length permutation like (1, 0, -2, -1)
        # must map -2/-1 onto the matrix positions, not into the batch
        offset = self.ndim if len(dims) == self.ndim else num_batch
        dims = tuple(d + offset if d < 0 and d >= -self.ndim else d for d in dims)
        if len(dims) == self.ndim:
            if dims[-2:] != (self.ndim - 2, self.ndim - 1):
                raise RuntimeError("permute cannot move matrix dims")
            dims = dims[:-2]
        if sorted(dims) != list(range(num_batch)):
            raise RuntimeError(f"invalid batch permutation {dims}")
        return self._permute_batch(*dims)

    def transpose(self, dim0: int, dim1: int) -> "LinearOperator":
        """(reference ``transpose``, :2653-2690)"""
        ndim = self.ndim
        dim0, dim1 = dim0 % ndim, dim1 % ndim
        if dim0 == dim1:
            return self
        matrix_dims = {ndim - 2, ndim - 1}
        if {dim0, dim1} == matrix_dims:
            return self._transpose()
        if dim0 in matrix_dims or dim1 in matrix_dims:
            raise RuntimeError("cannot transpose a batch dim with a matrix dim")
        perm = list(range(ndim - 2))
        perm[dim0], perm[dim1] = perm[dim1], perm[dim0]
        return self._permute_batch(*perm)

    def sum(self, dim: int | None = None):
        """Sum over a batch dim -> operator; over all -> scalar array
        (reference ``sum``, :2509-2550)."""
        if dim is None:
            return jnp.sum(self.to_dense())
        ndim = self.ndim
        dim = dim % ndim
        if dim >= ndim - 2:
            return jnp.sum(self.to_dense(), axis=dim - ndim)
        from .sum_batch import SumBatchLinearOperator

        num_batch = ndim - 2
        perm = [d for d in range(num_batch) if d != dim] + [dim]
        moved = self._permute_batch(*perm) if perm != list(range(num_batch)) else self
        return SumBatchLinearOperator(moved, block_dim=-3)

    def prod(self, dim: int, *, lazy: bool = False):
        """Elementwise product over a batch dim (reference ``prod``,
        :2010-2040).

        Default: exact dense reduction (valid for any operator).  With
        ``lazy=True``, the reference's root-based divide-and-conquer
        (``_prod_batch``) runs instead and the result STAYS a lazy
        (Khatri-Rao root) operator — only valid for batches of PSD
        operators, where ``root_decomposition`` is exact."""
        ndim = self.ndim
        dim = dim % ndim
        if dim >= ndim - 2:
            raise RuntimeError("prod over matrix dims is not defined")
        if lazy:
            return self._prod_batch(dim)
        from .dense import DenseLinearOperator

        return DenseLinearOperator(jnp.prod(self.to_dense(), axis=dim))

    def _prod_batch(self, dim: int) -> "LinearOperator":
        """Hadamard-reduce a batch dim by divide-and-conquer on root
        decompositions (reference ``_prod_batch``, :635-688): pairs of
        roots combine through ``MulLinearOperator``'s row-wise Khatri-Rao.
        PSD batches only.  Odd counts pad with the exact rank-1 all-ones
        root (the Hadamard identity; the reference pads an approximate
        constant-filled root, :655-663)."""
        from .dense import DenseLinearOperator
        from .mul import MulLinearOperator

        if self.shape[dim] == 1:
            return self.squeeze(dim)
        roots = self.root_decomposition().root.to_dense()
        num_batch = roots.shape[dim]
        while True:
            if num_batch % 2:
                pad_shape = list(roots.shape)
                pad_shape[dim] = 1
                ones_root = jnp.zeros(pad_shape, roots.dtype)
                # rank-1 ones column (zero columns leave R R^T unchanged)
                ones_root = ones_root.at[..., 0].set(1.0)
                roots = jnp.concatenate([roots, ones_root], axis=dim)
                num_batch += 1
            half = num_batch // 2
            idx1 = [slice(None)] * roots.ndim
            idx1[dim] = slice(None, half)
            idx2 = [slice(None)] * roots.ndim
            idx2[dim] = slice(half, None)
            part1, part2 = roots[tuple(idx1)], roots[tuple(idx2)]
            if half == 1:
                part1 = jnp.squeeze(part1, axis=dim)
                part2 = jnp.squeeze(part2, axis=dim)
                return MulLinearOperator(
                    DenseLinearOperator(part1), DenseLinearOperator(part2)
                )
            res = MulLinearOperator(
                DenseLinearOperator(part1), DenseLinearOperator(part2)
            )
            roots = res._root_structure().to_dense()
            num_batch = half

    # ------------------------------------------------------------------
    # Indexing
    # ------------------------------------------------------------------

    def _getitem(
        self, row_index: IndexType, col_index: IndexType, *batch_indices: IndexType
    ) -> "LinearOperator":
        """Index with slices/arrays on row/col/batch dims.  Dense fallback;
        structured subclasses override (reference ``_getitem``, :254-313)."""
        from .dense import DenseLinearOperator

        dense = self.to_dense()
        return DenseLinearOperator(
            dense[(*batch_indices, row_index, col_index)]
            if not any(isinstance(i, jax.Array) for i in (row_index, col_index))
            else _dense_fancy_index(dense, batch_indices, row_index, col_index)
        )

    def _get_indices(
        self, row_index: jax.Array, col_index: jax.Array, *batch_indices: jax.Array
    ) -> jax.Array:
        """Pointwise gather K[..., i, j] -> dense values (reference
        ``_get_indices``, :412-461).  Default: one-hot mat-vec per column,
        O(N) per index set — overridden by structured subclasses."""
        dense = self.to_dense()
        return dense[(*batch_indices, row_index, col_index)]

    def _select_rows(self, idx: jax.Array) -> "LinearOperator":
        """Lazy K[..., idx, :] for a 1-D index array: wrap in one-hot
        Interpolated selection matrices (reference _linear_operator.py:303-313)
        so matrix-free operators stay matrix-free under tensor indexing.
        Structured subclasses override with direct fast paths."""
        from .interpolated import InterpolatedLinearOperator

        m = self.shape[-1]
        li = jnp.asarray(idx, jnp.int32)[:, None]
        lv = jnp.ones(li.shape, self.dtype)
        ri = jnp.arange(m, dtype=jnp.int32)[:, None]
        rv = jnp.ones((m, 1), self.dtype)
        return InterpolatedLinearOperator(self, li, lv, ri, rv)

    def _select_cols(self, idx: jax.Array) -> "LinearOperator":
        """Lazy K[..., :, idx] (see ``_select_rows``)."""
        return self._transpose()._select_rows(idx)._transpose()

    def __getitem__(self, index) -> "LinearOperator | jax.Array":
        """Tensor-style indexing (reference ``__getitem__``, :2829-2926).

        Integer/slice/ellipsis indices return lazy operators (matrix dims
        sliced); advanced (array) indexing on both matrix dims returns dense
        values like the reference.
        """
        from ..utils.getitem import normalize_getitem_index

        return normalize_getitem_index(self, index)

    # ------------------------------------------------------------------
    # Comparisons
    # ------------------------------------------------------------------

    def isclose(self, other, rtol: float = 1e-5, atol: float = 1e-8) -> jax.Array:
        """(reference ``isclose``, :1822, 2928-2938)"""
        other_dense = other.to_dense() if isinstance(other, LinearOperator) else other
        return jnp.isclose(self.to_dense(), other_dense, rtol=rtol, atol=atol)


def _dense_fancy_index(dense, batch_indices, row_index, col_index):
    return dense[(*batch_indices, row_index, col_index)]


def to_dense(obj) -> jax.Array:
    """Module-level densify (reference ``to_dense``, :3023-3034)."""
    if isinstance(obj, LinearOperator):
        return obj.to_dense()
    return jnp.asarray(obj)


def to_linear_operator(obj) -> LinearOperator:
    """(reference dense_linear_operator.py:110-123)"""
    from .dense import DenseLinearOperator

    if isinstance(obj, LinearOperator):
        return obj
    return DenseLinearOperator(jnp.asarray(obj))
