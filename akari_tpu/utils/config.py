"""Global options + dtype policy.

Capability parity with the reference's three config tiers (SURVEY.md §5.6):
CLI flags live in cli/, scene-level parameters in the SDL / PathConfig, and
this module replaces the *build-time variant system* (ref:
resources/akari.conf + tools/configure.cpp generating Config<Float,
Spectrum> instantiations): on TPU a "variant" is just the dtype the arrays
carry — JAX retraces automatically, so variants are runtime values.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class DtypePolicy:
    """Numeric policy for the render pipeline.

    spectrum: dtype radiance/throughput are carried in (bf16 halves HBM
    traffic for the wavefront state at some noise cost — an experiment the
    reference's float/double variants gesture at).
    geometry: dtype for vertices / traversal (keep f32).
    """

    spectrum: object = np.float32
    geometry: object = np.float32
    accum: object = np.float32  # film accumulation


RGB = DtypePolicy()


def variant_string(policy=RGB):
    """ref: get_variant_string (generated config.h)."""
    import numpy as _np

    def name(dt):
        return _np.dtype(dt).name

    return f"rgb-{name(policy.spectrum)}-{name(policy.geometry)}"


@dataclass
class GlobalOptions:
    """ref: core/options.h GlobalOptions{enable_profile} — extended."""

    enable_profile: bool = False
    log_verbose: bool = False
    default_intersector: str = "bvh"


_options = GlobalOptions()


def options():
    return _options
