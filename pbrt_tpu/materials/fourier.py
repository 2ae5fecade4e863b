"""FourierBSDF (tabulated measured BSDFs, core/reflection.h FourierBSDF +
materials/fourier.cpp).

Status: the .bsdf table loader + device evaluation land with the measured-
material milestone; until then the scene compiler maps "fourier" materials to
matte (with a warning), so MAT_FOURIER never reaches the dispatch.  These
entry points exist so the dispatch in bsdf.py stays total.
"""
from __future__ import annotations


def fourier_eval(mat, wo, wi):
    raise NotImplementedError(
        "FourierBSDF tables not wired yet (fourier material is mapped to "
        "matte by the scene compiler)"
    )


def fourier_sample(mat, wo, u):
    raise NotImplementedError(
        "FourierBSDF tables not wired yet (fourier material is mapped to "
        "matte by the scene compiler)"
    )
