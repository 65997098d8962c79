"""Debug-mode guards (SURVEY.md §5: sanitizers).

The reference relies on rustc's borrow checker and debug_assert shape checks;
the JAX-native equivalents are runtime NaN/Inf trapping and shape/type checks
enabled through jax's debug flags.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def strict_checks(nans: bool = True, infs: bool = False):
    """Enable jax_debug_nans / jax_debug_infs inside the context.

    Any NaN produced by a solve inside the context raises immediately with a
    traceback into the producing op — useful when a user RHS misbehaves.
    Note: branchless solver internals legitimately produce transient NaNs on
    rejected/masked paths in rare regimes; prefer enabling this while
    debugging a specific problem rather than globally.
    """
    prev_nans = jax.config.jax_debug_nans
    prev_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_debug_infs", prev_infs)
