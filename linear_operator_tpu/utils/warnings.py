"""Warning taxonomy (reference: linear_operator/utils/warnings.py:5-18)."""


class NumericalWarning(RuntimeWarning):
    """Numerical issue: CG non-convergence, jittered Cholesky, clamped eigenvalues."""


class PerformanceWarning(RuntimeWarning):
    """An operation fell back to a slow path (e.g. densifying a lazy operator)."""


def host_callbacks_supported() -> bool:
    """The axon (tunneled-TPU) PJRT backend does not implement host
    send/recv callbacks (jax.debug.callback et al.) — emitting one aborts
    the whole computation, so diagnostic callbacks must be skipped there."""
    import jax

    try:
        client = jax.devices()[0].client
        version = getattr(client, "platform_version", "") or ""
    except Exception:  # pragma: no cover
        return False
    # The axon backend reports platform "tpu"; its identity only shows in
    # the platform_version string.
    return "axon" not in version


def debug_nan_check(name: str, arr) -> None:
    """``settings.debug``-gated NaN detector for solver inputs.

    The reference RAISES NanError eagerly (utils/linear_cg.py:199-200,
    minres.py); under jit a functional computation cannot raise on data, so
    the trace-safe analog emits a NumericalWarning through a host callback
    when NaNs are present (NaNs still propagate to the outputs — this guard
    is the diagnostic that tells you WHY a 1000-iteration while_loop returned
    garbage).
    """
    import jax
    import jax.numpy as jnp

    from .. import settings

    if not settings.debug.on() or not host_callbacks_supported():
        return

    def _report(has_nan):
        if bool(has_nan):
            import warnings

            warnings.warn(
                f"NaN encountered in the input of {name}; results will be "
                "NaN. (The reference raises NanError here.)",
                NumericalWarning,
            )

    jax.debug.callback(_report, jnp.isnan(arr).any())
