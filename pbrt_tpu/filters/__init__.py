"""Reconstruction filters (reference: src/filters/, 593 LoC).

All five pbrt filters are closed-form `Evaluate(p)` functions over the filter
radius (filter.h:62).  The film discretizes them into a 16x16 LUT exactly as
pbrt does (film.cpp:66-76) — reproducing the LUT, not the analytic filter, is
what image-level parity requires.
"""
from .filters import (
    Filter,
    box_filter,
    triangle_filter,
    gaussian_filter,
    mitchell_filter,
    sinc_filter,
    make_filter,
)

__all__ = [
    "Filter",
    "box_filter",
    "triangle_filter",
    "gaussian_filter",
    "mitchell_filter",
    "sinc_filter",
    "make_filter",
]
