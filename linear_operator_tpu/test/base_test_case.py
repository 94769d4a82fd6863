"""Base test case: deterministic PRNG keys + rich allclose diagnostics.

Reference: linear_operator/test/base_test_case.py:11-65.  The reference seeds
global torch RNG per test (UNLOCK_SEED env override); in JAX randomness is
explicit, so each test gets deterministic keys from ``self.key`` /
``self.keys(n)`` derived from a class-level seed.
"""

from __future__ import annotations

import os
import unittest

import jax
import numpy as np


class BaseTestCase(unittest.TestCase):
    seed = 0

    def setUp(self):
        super().setUp()
        seed = self.seed
        if os.environ.get("UNLOCK_SEED", "").lower() in ("true", "1"):
            seed = np.random.randint(0, 2**31 - 1)
        self._key = jax.random.PRNGKey(seed)
        self._key_counter = 0

    @property
    def key(self) -> jax.Array:
        self._key_counter += 1
        return jax.random.fold_in(self._key, self._key_counter)

    def keys(self, n: int):
        return [self.key for _ in range(n)]

    def assertAllClose(self, actual, expected, rtol=1e-4, atol=1e-5, msg=None):
        """Elementwise closeness with max-violation diagnostics (reference
        base_test_case.py:27-65)."""
        actual = np.asarray(actual)
        expected = np.asarray(expected)
        self.assertEqual(
            actual.shape, expected.shape,
            msg or f"shape mismatch: {actual.shape} vs {expected.shape}",
        )
        # equal_nan=False (like the torch reference): NaN == NaN passing
        # would let the same broken math on the lazy AND dense sides count
        # as agreement across the whole golden-model harness.
        if np.allclose(actual, expected, rtol=rtol, atol=atol):
            return
        abs_diff = np.abs(actual - expected)
        tol = atol + rtol * np.abs(expected)
        # NaN diffs must count as violations or the report reads "0/N
        # elements violate" for a NaN-poisoned result
        bad = (abs_diff > tol) | ~np.isfinite(abs_diff)
        base = msg or "assertAllClose failed"
        raise AssertionError(
            f"{base}: {bad.sum()}/{bad.size} elements violate "
            f"rtol={rtol}, atol={atol}. "
            f"max abs diff {abs_diff.max():.3e} "
            f"(rtol would need {np.nanmax(abs_diff / np.maximum(np.abs(expected), 1e-30)):.3e}, "
            f"atol would need {abs_diff.max():.3e})"
        )
