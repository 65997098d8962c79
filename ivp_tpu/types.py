"""Shared types: status codes, event configuration, method registry metadata.

Mirrors the contracts of the reference library (status codes:
reference src/status.rs:3-26; event config: reference src/solve/event.rs:5-77)
as plain ints / frozen dataclasses so they can live inside jit-traced state.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


class Status:
    """Integration status codes carried as int32 inside the solver state.

    ``RUNNING`` is internal; the public codes match the reference's Status enum
    (reference src/status.rs:3-19).  The SciPy-facing mapping is
    SUCCESS -> 0, USER_INTERRUPT (terminal event) -> 1, everything else -> -1
    (reference src/python/solve.rs:404-427).
    """

    RUNNING = -1
    SUCCESS = 0
    USER_INTERRUPT = 1  # terminal event fired
    NEED_LARGER_NMAX = 2
    STEP_SIZE_TOO_SMALL = 3
    PROBABLY_STIFF = 4
    SINGULAR_MATRIX = 5
    POOR_CONVERGENCE = 6

    MESSAGES = {
        SUCCESS: "The solver successfully reached the end of the integration interval.",
        USER_INTERRUPT: "A termination event occurred.",
        NEED_LARGER_NMAX: "Maximum number of steps exceeded.",
        STEP_SIZE_TOO_SMALL: "Step size became too small.",
        PROBABLY_STIFF: "The problem appears to be stiff.",
        SINGULAR_MATRIX: "Repeatedly singular iteration matrix.",
        POOR_CONVERGENCE: "Newton iteration failed to converge.",
    }

    @staticmethod
    def to_scipy(code: int) -> int:
        if code == Status.SUCCESS:
            return 0
        if code == Status.USER_INTERRUPT:
            return 1
        return -1


@dataclasses.dataclass(frozen=True)
class EventConfig:
    """Static per-event configuration (hashable; baked into the compiled program).

    direction: -1 (negative-going), 0 (all), +1 (positive-going)
    terminal_count: terminate after this many occurrences; 0 = never.
    (reference src/solve/event.rs:5-77)
    """

    direction: int = 0
    terminal_count: int = 0


# Method registry: canonical name -> (module key, dense coeff rows)
# coeff rows per state (reference src/solve/options.rs:34-43; BDF uses 7:
# D0..D5 + order marker).
METHOD_ALIASES = {
    "RK23": "RK23",
    "RK45": "DOPRI5",
    "DOPRI5": "DOPRI5",
    "DOP853": "DOP853",
    "RK4": "RK4",
    "RADAU": "RADAU",
    "RADAU5": "RADAU",
    "BDF": "BDF",
    "BDF15": "BDF",
}

NCOEFF = {
    "RK4": 4,
    "RK23": 4,
    "DOPRI5": 5,
    "DOP853": 8,
    "RADAU": 4,
    "BDF": 7,
}


# When True, unknown method names raise instead of falling back to DOPRI5.
# Toggle via ivp_tpu.strict_methods(True).
_STRICT_METHODS = False


def strict_methods(enabled: bool = True) -> None:
    """Make unknown method names raise a ValueError instead of silently
    falling back to DOPRI5 (the reference's fallback,
    src/solve/options.rs:61-73, converts typos into wrong solvers)."""
    global _STRICT_METHODS
    _STRICT_METHODS = bool(enabled)


def canonical_method(method) -> str:
    """Resolve a method name/alias to its canonical key.

    Unknown strings fall back to DOPRI5, matching the reference
    (src/solve/options.rs:61-73) — but emit a UserWarning, and raise when
    ``strict_methods(True)`` is set (a typo like "Rdau" otherwise runs a
    silently-wrong solver).
    """
    if method is None:
        return "DOPRI5"
    key = str(method).upper()
    if key not in METHOD_ALIASES:
        known = ", ".join(sorted(METHOD_ALIASES))
        if _STRICT_METHODS:
            raise ValueError(
                f"unknown method {method!r}; known methods: {known}")
        import warnings
        warnings.warn(
            f"unknown method {method!r}: falling back to DOPRI5 "
            f"(reference options.rs:61-73 semantics); known methods: "
            f"{known}.  Call ivp_tpu.strict_methods(True) to raise instead.",
            UserWarning, stacklevel=3)
    return METHOD_ALIASES.get(key, "DOPRI5")


def scipy_message(status: int) -> str:
    return Status.MESSAGES.get(int(status), "Unknown solver status.")


Optional  # silence unused-import linters while keeping typing available
