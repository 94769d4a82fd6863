"""Automated API-parity audit vs the reference (read-only at /root/reference).

Introspects the reference ``linear_operator`` package (public classes,
LinearOperator methods, functional API, settings flags) and checks each name
against ``linear_operator_tpu``, applying the documented intentional renames
(PARITY.md).  Prints anything missing.

Run: JAX_PLATFORMS=cpu python scripts/api_audit.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

# Intentional differences (rationale in PARITY.md / docstrings).
METHOD_RENAMES = {
    # torch-specific device/dtype plumbing -> jax equivalents
    "cuda": "device_put (jax.device_put / parallel.sharding)",
    "cpu": "device_put",
    "to": "astype",
    "type": "astype",
    "float": "astype",
    "double": "astype",
    "half": "astype",
    "byte": None,  # int8 matrices: not part of the numeric surface
    "char": None,
    "requires_grad_": "detach / jax functional grads",
    "requires_grad": "detach / jax functional grads",
    "grad_fn": None,
    "is_cuda": None,
    "device": None,  # jax arrays carry shardings, exposed via .devices
    "rsub": None,  # python reflected dunders cover it
    "representation": "pytree flatten (jax.tree_util.tree_flatten)",
    "representation_tree": "pytree unflatten",
}

SKIP_PRIVATE_OK = True


def public_methods(cls):
    out = []
    for name, member in inspect.getmembers(cls):
        if name.startswith("_"):
            continue
        if callable(member) or isinstance(member, property):
            out.append(name)
    return sorted(set(out))


def main():
    import linear_operator as ref
    import linear_operator.operators as ref_ops
    import linear_operator.settings as ref_settings
    from linear_operator.operators import LinearOperator as RefLO

    import linear_operator_tpu as tpu
    import linear_operator_tpu.operators as tpu_ops
    from linear_operator_tpu import settings as tpu_settings
    from linear_operator_tpu.operators import LinearOperator as TpuLO

    missing = []

    # --- operator classes -------------------------------------------------
    ref_classes = [
        n for n in dir(ref_ops) if n[0].isupper() and not n.startswith("_")
    ]
    class_renames = {
        "KeOpsLinearOperator": "KernelLinearOperator + ops.rbf pallas tiles",
        "LinearOperatorRepresentationTree": "pytree treedef",
    }
    for name in sorted(ref_classes):
        if hasattr(tpu_ops, name) or hasattr(tpu, name):
            continue
        if name in class_renames:
            print(f"  class  {name:45s} -> eq: {class_renames[name]}")
            continue
        missing.append(("class", name))

    # --- base-class methods ------------------------------------------------
    ref_methods = public_methods(RefLO)
    tpu_methods = set(public_methods(TpuLO))
    tpu_functional = set(dir(tpu)) | set(dir(tpu.functions))
    for name in ref_methods:
        if name in tpu_methods or name in tpu_functional:
            continue
        if name in METHOD_RENAMES:
            eq = METHOD_RENAMES[name]
            if eq is not None:
                print(f"  method {name:45s} -> eq: {eq}")
            continue
        missing.append(("method", name))

    # --- functional API ----------------------------------------------------
    import linear_operator.functions as ref_fns

    ref_fn_names = [
        n
        for n in dir(ref_fns)
        if not n.startswith("_") and callable(getattr(ref_fns, n))
        and not n[0].isupper()
    ]
    for name in sorted(ref_fn_names):
        if hasattr(tpu.functions, name) or hasattr(tpu, name):
            continue
        missing.append(("function", name))

    # --- top-level exports ---------------------------------------------------
    for name in getattr(ref, "__all__", []):
        if name.startswith("_"):
            continue
        if hasattr(tpu, name) or hasattr(tpu_ops, name):
            continue
        missing.append(("toplevel", name))

    # --- settings flags ------------------------------------------------------
    ref_flags = [
        n
        for n in dir(ref_settings)
        if not n.startswith("_") and inspect.isclass(getattr(ref_settings, n))
    ]
    flag_renames = {
        "trace_mode": "jit-by-default (all control flow trace-safe)",
        "lazily_evaluate_kernels": None,  # gpytorch-facing shim, no kernel obj here
    }
    for name in sorted(ref_flags):
        if hasattr(tpu_settings, name):
            continue
        if name in flag_renames:
            eq = flag_renames[name]
            if eq is not None:
                print(f"  flag   {name:45s} -> eq: {eq}")
            continue
        missing.append(("flag", name))

    # --- utils modules ------------------------------------------------------
    import linear_operator.utils as ref_utils

    ref_util_names = [
        n for n in getattr(ref_utils, "__all__", dir(ref_utils))
        if not n.startswith("_")
    ]
    import linear_operator_tpu.utils as tpu_utils
    import linear_operator_tpu.solvers as tpu_solvers

    util_renames = {
        "cached": "factored= / with_factorization (functional memoize)",
        "pop_from_cache": "factored=",
        "pop_from_cache_ignore_args": "factored=",
        "prod": "jnp math",
    }
    for name in sorted(set(ref_util_names)):
        if (
            hasattr(tpu_utils, name)
            or hasattr(tpu_solvers, name)
            or hasattr(tpu, name)
        ):
            continue
        if name in util_renames:
            eq = util_renames[name]
            if eq is not None:
                print(f"  util   {name:45s} -> eq: {eq}")
            continue
        missing.append(("util", name))

    print()
    if missing:
        print(f"MISSING ({len(missing)}):")
        for kind, name in missing:
            print(f"  {kind:9s} {name}")
        sys.exit(1)
    print("MISSING (0) — full public-surface parity.")


if __name__ == "__main__":
    main()
