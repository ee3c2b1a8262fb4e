"""Error types (ref: src/akari/core/error.hpp Expected<T>/Error + panic.h).

The reference threads Expected<T> through resource loading and uses
AKR_PANIC/CHECK device-side. In Python, exceptions carry the Error role;
``expected()`` provides the monadic variant for call sites that prefer
values; ``check``/``panic`` mirror the assert macros (host side — device
code is pure functions where invalid lanes are masked, not asserted).
"""

from __future__ import annotations


class AkariError(Exception):
    """Base error (ref: core/error.hpp Error)."""


class ResourceError(AkariError):
    """Failed to load a scene resource (ref: core/resource.h load paths)."""


class RenderError(AkariError):
    """Renderer-level failure."""


def expected(fn, *args, **kwargs):
    """Run fn, returning (value, None) or (None, error) — Expected<T>."""
    try:
        return fn(*args, **kwargs), None
    except AkariError as e:
        return None, e


def check(cond, msg="check failed"):
    """ref: AKR_CHECK — warn-but-continue."""
    if not cond:
        from .logger import get_logger

        get_logger().warning(msg)
    return cond


def panic(msg):
    """ref: AKR_PANIC — unrecoverable."""
    raise AkariError(msg)
