"""Pytree registration machinery for operator dataclasses.

TPU-native replacement for the reference's ``representation()`` /
``representation_tree()`` protocol (reference:
linear_operator/operators/_linear_operator.py:2076-2101 and
linear_operator/operators/linear_operator_representation_tree.py:7-44).

In the reference, every autograd ``Function`` receives an operator flattened to
its defining tensors plus a "representation tree" that can rebuild the operator
from those flat tensors — that is how gradients reach the leaves of arbitrarily
nested operators.  In JAX this is exactly the pytree contract: we register every
operator class as a pytree node whose *children* are its defining arrays (and
nested operators) and whose *aux data* are its static fields.  ``jax.tree_util
.tree_flatten(op)`` is the reference's ``representation()``; the treedef is the
representation tree; ``custom_vjp`` then differentiates with respect to the
leaves for free.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax

T = TypeVar("T")

_STATIC_KEY = "linop_static"


def static_field(**kwargs: Any) -> Any:
    """Declare a dataclass field as static (pytree aux data, not a child).

    Static fields must be hashable; they become part of the treedef and hence
    of jit cache keys.
    """
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def operator_class(cls: type[T]) -> type[T]:
    """Class decorator: make ``cls`` a frozen dataclass registered as a pytree.

    Children = non-static dataclass fields (arrays or nested operators).
    Aux data = static fields (python scalars, shapes, flags).

    Unflattening bypasses ``__init__``/``__post_init__`` entirely so that
    (a) validation never runs on tracer-shaped placeholders and (b) rebuild is
    O(1).  This mirrors the reference's ``LinearOperatorRepresentationTree``
    reconstruction contract.
    """
    cls = dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)
    all_fields = dataclasses.fields(cls)
    child_names = tuple(f.name for f in all_fields if not f.metadata.get(_STATIC_KEY))
    static_names = tuple(f.name for f in all_fields if f.metadata.get(_STATIC_KEY))

    def flatten_with_keys(obj):
        children = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in child_names
        )
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def flatten(obj):
        return (
            tuple(getattr(obj, n) for n in child_names),
            tuple(getattr(obj, n) for n in static_names),
        )

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for name, value in zip(child_names, children):
            object.__setattr__(obj, name, value)
        for name, value in zip(static_names, aux):
            object.__setattr__(obj, name, value)
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    cls._child_fields = child_names  # type: ignore[attr-defined]
    cls._static_fields = static_names  # type: ignore[attr-defined]
    return cls


def replace(obj: T, **changes: Any) -> T:
    """``dataclasses.replace`` that bypasses ``__init__`` (tracer-safe)."""
    new = object.__new__(type(obj))
    for f in dataclasses.fields(obj):
        object.__setattr__(new, f.name, changes.pop(f.name, getattr(obj, f.name)))
    if changes:
        raise TypeError(f"unknown fields {sorted(changes)} for {type(obj).__name__}")
    return new


def tree_map_leaves(fn: Callable[[jax.Array], jax.Array], obj: T) -> T:
    """Map ``fn`` over every array leaf of an operator pytree."""
    leaves, treedef = jax.tree_util.tree_flatten(obj)
    return jax.tree_util.tree_unflatten(treedef, [fn(leaf) for leaf in leaves])
