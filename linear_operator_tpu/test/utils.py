"""Shared test helpers (reference: linear_operator/test/utils.py:11-43).

``least_used_cuda_device`` has no TPU analog (placement is sharding-driven);
``local_device_mesh`` is the multi-device affordance instead.
"""

from __future__ import annotations

import contextlib

import numpy as np


def approx_equal(a, b, epsilon: float = 1e-4) -> bool:
    """(reference test/utils.py:11-20)"""
    return bool(np.max(np.abs(np.asarray(a) - np.asarray(b))) <= epsilon)


@contextlib.contextmanager
def local_device_mesh(n_devices: int | None = None, model: int = 1):
    """Context manager yielding a (data, model) mesh over local devices —
    the TPU-native replacement for ``least_used_cuda_device``."""
    from ..parallel import make_mesh

    mesh = make_mesh(n_devices, model=model)
    with mesh:
        yield mesh
