"""Bounded compiled-solver cache with GC-safe keys.

solve_ivp / solve_ivp_ensemble keep compiled solvers keyed by the user's
callables and constant matrices.  Keying unhashable objects by ``id()`` is
unsound: after the object is garbage-collected a *different* object can
reuse the address and silently fetch a solver compiled for the old one
(wrong constant Jacobian => silently wrong results).  Two fixes here:

* array-likes (constant ``jac``, etc.) are keyed by **content digest**, so
  aliased ids are irrelevant and mutated arrays miss the cache instead of
  hitting a stale entry;
* any other unhashable object is wrapped in an identity token that holds a
  **strong reference**, so its id cannot be reused while the cache entry is
  alive; the LRU bound is what eventually drops the reference together with
  the entry.
"""
from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Any, Callable

import numpy as np


class IdToken:
    """Identity-keyed token that pins its object (prevents id reuse)."""

    __slots__ = ("obj",)

    def __init__(self, obj):
        self.obj = obj

    def __hash__(self):
        return id(self.obj)

    def __eq__(self, other):
        return isinstance(other, IdToken) and other.obj is self.obj

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"IdToken({type(self.obj).__name__}@{id(self.obj):#x})"


def _array_token(a: np.ndarray):
    a = np.ascontiguousarray(a)
    digest = hashlib.sha1(a.view(np.uint8) if a.dtype == object else a).hexdigest()
    return ("ndarray", a.shape, str(a.dtype), digest)


def cache_token(obj: Any):
    """A hashable, GC-safe cache key component for an arbitrary object."""
    if obj is None:
        return None
    if isinstance(obj, np.ndarray):
        if obj.dtype == object:  # can't digest; fall through to identity
            return IdToken(obj)
        return _array_token(obj)
    # jax.Array without importing jax eagerly
    if type(obj).__module__.startswith("jax") and hasattr(obj, "__array__"):
        return _array_token(np.asarray(obj))
    try:
        hash(obj)
        return obj
    except TypeError:
        return IdToken(obj)


class LRUCache:
    """Tiny LRU: bounds compiled-solver memory and the lifetime of the
    strong references held inside IdToken keys."""

    def __init__(self, maxsize: int = 64):
        self.maxsize = int(maxsize)
        self._data: OrderedDict = OrderedDict()

    def get_or_build(self, key, builder: Callable[[], Any]):
        entry = self._data.get(key, _MISSING)
        if entry is not _MISSING:
            self._data.move_to_end(key)
            return entry
        entry = builder()
        self._data[key] = entry
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)
        return entry

    def __len__(self):
        return len(self._data)

    def clear(self):
        self._data.clear()


_MISSING = object()
