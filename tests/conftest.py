"""Test configuration: force CPU with a virtual 8-device mesh.

The distributed test story from SURVEY.md section 4: multi-host collective
layouts are unit-testable without TPUs by faking devices on CPU.

NOTE: the axon sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon, so the env var alone is too late here — we must override
through jax.config as well (backends initialize lazily, so this works as long
as no array op ran yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()}"
)

# The cross-library oracle (tests/test_vs_reference_torch.py) imports the
# torch reference from /root/reference.  Its warning CLASSES (e.g.
# linear_operator.utils.warnings.NumericalWarning) travel inside pytest-xdist
# report messages, and the receiving process rebuilds them by importing their
# module — every pytest process therefore needs the reference importable, or
# the node crashes with ModuleNotFoundError mid-run.  Appended (not
# prepended): nothing in this repo shares the reference's module name.
import sys  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")
