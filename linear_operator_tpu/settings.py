"""Context-manager settings that select algorithms and tolerances.

TPU-native rebuild of the reference flag system (reference:
linear_operator/settings.py:1-615).  Three base classes mirror the reference's
``_feature_flag`` (:58-93), ``_value_context`` (:96-118) and
``_dtype_value_context`` (:9-55).

jit-compatibility: values are read at **trace time** as ordinary Python
scalars, so they become compile-time constants of the traced computation
(loop bounds, size cutoffs, sample counts).  If you wrap library calls in your
own ``jax.jit``, a later settings change will NOT retrigger a retrace of that
cached function — snapshot the relevant values with ``solver_defaults()`` and
pass them as static arguments instead, or re-``jit``.  The reference has the
same trace-time semantics under ``torch.jit.trace`` (settings.py:544-559
``trace_mode``); here jit-by-default makes it the only mode.
"""

from __future__ import annotations

import logging
from typing import Any

import jax.numpy as jnp

logger = logging.getLogger("linear_operator_tpu")


class _feature_flag:
    """Boolean context-manager flag (reference settings.py:58-93)."""

    _default: bool = False
    _state: bool | None = None

    def __init__(self, state: bool = True):
        self.state = state

    @classmethod
    def is_default(cls) -> bool:
        return cls._state is None

    @classmethod
    def on(cls) -> bool:
        return cls._default if cls._state is None else cls._state

    @classmethod
    def off(cls) -> bool:
        return not cls.on()

    @classmethod
    def _set_state(cls, state: bool | None) -> None:
        cls._state = state

    def __enter__(self):
        self.prev = type(self)._state
        self._set_state(self.state)
        return self

    def __exit__(self, *exc):
        self._set_state(self.prev)
        return False


class _value_context:
    """Scalar-valued context manager (reference settings.py:96-118)."""

    _global_value: Any = None

    def __init__(self, value: Any):
        self._value = value

    @classmethod
    def value(cls) -> Any:
        return cls._global_value

    @classmethod
    def _set_value(cls, value: Any) -> None:
        cls._global_value = value

    def __enter__(self):
        self._prev = type(self)._global_value
        self._set_value(self._value)
        return self

    def __exit__(self, *exc):
        self._set_value(self._prev)
        return False


class _dtype_value_context:
    """Per-dtype scalar values (reference settings.py:9-55)."""

    _global_float16_value: float | None = None
    _global_bfloat16_value: float | None = None
    _global_float32_value: float | None = None
    _global_float64_value: float | None = None

    def __init__(self, float16=None, bfloat16=None, float32=None, float64=None):
        self._values = (float16, bfloat16, float32, float64)

    @classmethod
    def value(cls, dtype=None) -> float:
        if dtype is None:
            dtype = jnp.float32
        dtype = jnp.dtype(dtype)
        if dtype == jnp.float16:
            return cls._global_float16_value
        if dtype == jnp.bfloat16:
            return cls._global_bfloat16_value
        if dtype == jnp.float32:
            return cls._global_float32_value
        if dtype == jnp.float64:
            return cls._global_float64_value
        raise RuntimeError(f"Unsupported dtype for {cls.__name__}: {dtype}")

    def __enter__(self):
        cls = type(self)
        self._prev = (
            cls._global_float16_value,
            cls._global_bfloat16_value,
            cls._global_float32_value,
            cls._global_float64_value,
        )
        new = tuple(
            v if v is not None else p for v, p in zip(self._values, self._prev)
        )
        (
            cls._global_float16_value,
            cls._global_bfloat16_value,
            cls._global_float32_value,
            cls._global_float64_value,
        ) = new
        return self

    def __exit__(self, *exc):
        cls = type(self)
        (
            cls._global_float16_value,
            cls._global_bfloat16_value,
            cls._global_float32_value,
            cls._global_float64_value,
        ) = self._prev
        return False


# ---------------------------------------------------------------------------
# Flag inventory — defaults match reference settings.py (line refs inline).
# ---------------------------------------------------------------------------


class cg_tolerance(_value_context):
    """Relative residual to stop CG (reference settings.py:216-223)."""

    _global_value = 1.0


class cholesky_jitter(_dtype_value_context):
    """Jitter added on Cholesky retry (reference settings.py:194-203)."""

    _global_float16_value = 1e-3
    _global_bfloat16_value = 1e-3
    _global_float32_value = 1e-6
    _global_float64_value = 1e-8


class cholesky_max_tries(_value_context):
    """Escalating-jitter attempts (reference settings.py:206-213)."""

    _global_value = 3


class ciq_samples(_feature_flag):
    """Sample MVNs via contour integral quadrature (reference settings.py:226-242)."""

    _default = False


class debug(_feature_flag):
    """Extra argument validation & shape checks (reference settings.py:265-275)."""

    _default = True


class deterministic_probes(_feature_flag):
    """Reuse probe vectors across calls (reference settings.py:245-262).

    In the rebuild probes are driven by explicit PRNG keys; this flag makes
    API entry points fall back to a fixed key when the caller passes none.
    """

    _default = False
    probe_vectors = None  # functional analog of the reference's global cache


class _fast_covar_root_decomposition(_feature_flag):
    _default = True


class _fast_log_prob(_feature_flag):
    _default = True


class _fast_solves(_feature_flag):
    _default = True


class fast_computations:
    """Composite flag (reference settings.py:278-354).

    ``covar_root_decomposition``: Lanczos vs Cholesky/symeig roots.
    ``log_prob``: SLQ/stochastic logdet vs exact Cholesky logdet.
    ``solves``: preconditioned CG vs Cholesky solves.
    """

    covar_root_decomposition = _fast_covar_root_decomposition
    log_prob = _fast_log_prob
    solves = _fast_solves

    def __init__(self, covar_root_decomposition=True, log_prob=True, solves=True):
        self._ctxs = (
            _fast_covar_root_decomposition(covar_root_decomposition),
            _fast_log_prob(log_prob),
            _fast_solves(solves),
        )

    def __enter__(self):
        for ctx in self._ctxs:
            ctx.__enter__()
        return self

    def __exit__(self, *exc):
        for ctx in self._ctxs:
            ctx.__exit__(*exc)
        return False


class _linalg_dtype_symeig(_value_context):
    """Internal dtype for small symmetric eigensolves (reference settings.py:186-191).

    Consulted by ``solvers.lanczos.lanczos_tridiag_to_diag`` (the SLQ/Lanczos
    tridiagonal eigensolves).  Default float64 matches the reference; without
    jax x64 enabled the cast is a silent no-op, so TPU runs stay in f32
    (f64 there is emulated and slow).  The matrices are tiny (quadrature
    size), so promotion is cheap wherever x64 is on.
    """

    _global_value = jnp.float64


class _linalg_dtype_cholesky(_value_context):
    _global_value = jnp.float64


class linalg_dtypes:
    """Context manager over both internal linalg dtypes (reference settings.py:357-380)."""

    symeig = _linalg_dtype_symeig
    cholesky = _linalg_dtype_cholesky

    def __init__(self, default=jnp.float64, symeig=None, cholesky=None):
        self._ctxs = (
            _linalg_dtype_symeig(symeig if symeig is not None else default),
            _linalg_dtype_cholesky(cholesky if cholesky is not None else default),
        )

    def __enter__(self):
        for ctx in self._ctxs:
            ctx.__enter__()
        return self

    def __exit__(self, *exc):
        for ctx in self._ctxs:
            ctx.__exit__(*exc)
        return False


class max_cg_iterations(_value_context):
    """(reference settings.py:383-391)"""

    _global_value = 1000


class max_cholesky_size(_value_context):
    """Below this N, solve/logdet use Cholesky not CG (reference settings.py:394-402)."""

    _global_value = 800


class max_lanczos_quadrature_iterations(_value_context):
    """Tridiag size for SLQ quadrature (reference settings.py:405-414)."""

    _global_value = 20


class max_preconditioner_size(_value_context):
    """Pivoted-Cholesky preconditioner rank (reference settings.py:417-425)."""

    _global_value = 15


class preconditioner_mode(_value_context):
    """CG preconditioner construction for AddedDiag operators.

    "pivoted" (default, reference parity): greedy pivoted Cholesky — rank-k
    adaptive pivots, but k SEQUENTIAL steps (~1.2 ms/step at N=1e5 on v5e).
    "nystrom" (TPU-native extension): uniformly-strided Nystrom factor — ONE
    batched kernel evaluation + a k x k Cholesky, so rank 500-2000 costs
    milliseconds where pivoted rank 200 costs ~0.25 s; higher affordable
    rank usually beats pivot adaptivity on CG iteration count.
    "auto" (recommended on TPU): Nystrom with rank scaled to N —
    ``clip(n // 64, 50, 400)``, never below ``max_preconditioner_size`` —
    the measured sweet spot from BASELINE.md: the reference's default
    pivoted-rank-15 is algorithmically insufficient (a no-op) on broad
    spectra at N >= 1e4, while Nystrom-400 costs ~20 ms at N=1e5 and reaches
    the CG/SLQ iteration floor.  Still gated by
    ``min_preconditioning_size``/``max_preconditioner_size(0)`` like the
    reference (added_diag_linear_operator.py:108-116).
    """

    _global_value = "pivoted"


class max_root_decomposition_size(_value_context):
    """Lanczos iterations for root decompositions (reference settings.py:428-438)."""

    _global_value = 100


class memory_efficient(_feature_flag):
    """Prefer recomputation over caching (reference settings.py:441-450).

    Consumed by ``KernelLinearOperator._matmul_closure``: when on, iterative
    solvers recompute kernel blocks every iteration instead of materializing
    a per-solve K cache (or the bf16 tile cache) — the reference's
    saved-tensor-vs-recompute trade (functions/_matmul.py:26, _solve.py:65)
    applied at this engine's one cache-vs-recompute choice point.  Elsewhere
    the engine already recomputes by design (``jax.checkpoint`` in the
    blocked mat-vec)."""

    _default = False


class min_preconditioning_size(_value_context):
    """Only precondition above this N (reference settings.py:453-461)."""

    _global_value = 2000


class minres_tolerance(_value_context):
    """(reference settings.py:464-471)"""

    _global_value = 1e-4


class num_contour_quadrature(_value_context):
    """Quadrature sites for CIQ (reference settings.py:474-481)."""

    _global_value = 15


class num_trace_samples(_value_context):
    """Hutchinson probe count for SLQ (reference settings.py:484-493)."""

    _global_value = 10


class preconditioner_tolerance(_value_context):
    """Pivoted-Cholesky early-stop tolerance (reference settings.py:496-503)."""

    _global_value = 1e-3


class skip_logdet_forward(_feature_flag):
    """Return 0 logdet forward but keep its gradient (reference settings.py:506-531)."""

    _default = False


class terminate_cg_by_size(_feature_flag):
    """Run CG exactly N iterations (reference settings.py:534-541)."""

    _default = False


class trace_mode(_feature_flag):
    """INERT — kept for API parity (reference settings.py:544-559).

    The reference uses it to make code ``torch.jit.trace``-able by skipping
    data-dependent branches; the rebuild is trace-safe by construction (all
    solver loops are ``lax.while_loop``s with masked convergence, no
    data-dependent Python control flow), so every path already behaves as
    the reference does under trace_mode=True.  Setting it has no effect —
    asserted by tests/test_settings.py.
    """

    _default = False


class tridiagonal_jitter(_value_context):
    """Jitter for tridiag eigensolves (reference settings.py:562-572)."""

    _global_value = 1e-6


class use_toeplitz(_feature_flag):
    """FFT-based Toeplitz matmuls (reference settings.py:575-584)."""

    _default = True


class pivoted_cholesky_block_size(_value_context):
    """Pivots selected per sweep in the blocked greedy pivoted Cholesky
    (TPU-native extension; solvers/pivoted_cholesky.py).  0/1 = strict
    sequential greedy (reference-parity pivot order,
    functions/_pivoted_cholesky.py:14-105), which is the default and the
    measured-fastest choice on the v5e benchmark scale.

    Measured negative result (BASELINE.md, N=1e5 RBF rank 200): although the
    strict loop is latency-bound (~1.2 ms/rank-step), the blocked variant
    does NOT beat it there — smooth kernels accept only ~12-19 pivots per
    sweep before the candidate pool goes stale (greedy selection on a smooth
    residual landscape is inherently sequential), and each sweep's panel
    downdate is a skinny matmul paying the MXU 128-lane pad rate.  The
    blocked path remains useful for rougher spectra / smaller n where full
    blocks get accepted, and is quality-equivalent (within ~10% trace error
    of strict greedy; tests/solvers/test_lanczos_slq.py)."""

    _global_value = 0


class toeplitz_fft_min_size(_value_context):
    """Below this Toeplitz size, mat-vecs use a dense HIGH-precision MXU
    matmul instead of the circulant-embedding FFT (TPU-native extension:
    measured on v5e, a 256x256 dense factor matmul costs ~0.1 ms of MXU time
    while the equivalent FFT pipeline costs ~28 ms inside the SKI mat-vec —
    FFT only wins for long columns).  Set to 0 to always use FFT (when
    ``use_toeplitz`` is on)."""

    _global_value = 4096


class verbose_linalg(_feature_flag):
    """Debug-log every expensive linalg call (reference settings.py:587-605)."""

    _default = False

    @classmethod
    def logger(cls):
        return logger


class stable_qr_host_threshold(_value_context):
    """INERT — retained for API parity only (reference settings.py:608-615,
    ``stable_qr_cpu_threshold``).  The reference dispatches small QRs to CPU
    to dodge slow/fragile CUDA QR at tiny sizes; on TPU `utils/qr.py` keeps
    QR on-device unconditionally (XLA's QR is fine at small sizes, and a
    host round-trip inside a jitted solve would stall the pipeline), so this
    value is read by nothing.  Setting it has no effect — asserted by
    tests/test_settings.py."""

    _global_value = 128


#: Deprecated reference spelling (reference settings.py:608-615); same context.
stable_qr_cpu_threshold = stable_qr_host_threshold


class tpu_profile:
    """Recommended TPU operating point for stochastic MLL work (round-5
    quad-iters x probes Pareto sweep, BASELINE.md): at the SAME wall-clock as
    the reference defaults (20 SLQ quadrature iterations x 10 probes), 15
    iterations x 64 probes gives a 2.8x tighter logdet (loss error 2.8e-5 vs
    7.8e-5 at N=1e5) and a 1.8x tighter MLL gradient (8.6e-4 vs 1.5e-3
    relative RMS) — the extra probe columns ride the 128-lane MXU pad nearly
    free, while the MC probe noise (not quadrature bias) dominates the
    default's error.  Combines::

        max_lanczos_quadrature_iterations(15)
        num_trace_samples(64)
        preconditioner_mode("auto")

    Reference defaults stay untouched for parity; opt in with::

        with lo.settings.tpu_profile():
            loss = model.neg_mll(params, x, y, key=key)
    """

    def __init__(self):
        self._ctxs = (
            max_lanczos_quadrature_iterations(15),
            num_trace_samples(64),
            preconditioner_mode("auto"),
        )

    def __enter__(self):
        for c in self._ctxs:
            c.__enter__()
        return self

    def __exit__(self, *exc):
        for c in reversed(self._ctxs):
            c.__exit__(*exc)
        return False


def use_cholesky_for_solves(n: int) -> bool:
    """THE solve-dispatch predicate (reference functions/_solve.py:10-22):
    True when ``solve`` takes the direct Cholesky path instead of
    preconditioned CG.  Single source of truth consumed by
    ``functions/_solve._dispatch_solve`` and
    ``AddedDiagLinearOperator.with_preconditioner`` — keep any change here so
    the preconditioner gate cannot desync from the solver dispatch."""
    return n <= max_cholesky_size.value() or fast_computations.solves.off()


def use_cholesky_for_log_prob(n: int) -> bool:
    """The inv_quad_logdet-dispatch predicate (reference
    _linear_operator.py:1713-1731): True when ``inv_quad_logdet`` takes the
    exact Cholesky path instead of stochastic CG+SLQ.  Shared by
    ``functions/_inv_quad_logdet`` and the preconditioner gate (see
    :func:`use_cholesky_for_solves`)."""
    return n <= max_cholesky_size.value() or fast_computations.log_prob.off()


def record_linalg(name: str, *shapes) -> None:
    """Hook used by solvers when ``verbose_linalg`` is on (reference
    linear_cg.py:193-196, lanczos.py:60-63, minres.py:124-128)."""
    if verbose_linalg.on():
        logger.debug("Running %s on shapes %s", name, tuple(tuple(s) for s in shapes))
