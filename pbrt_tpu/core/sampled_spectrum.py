"""SampledSpectrum: pbrt's full spectral machinery (spectrum.h:100-515,
spectrum.cpp:26-180), host-side numpy for scene compilation plus device
helpers for spectral rendering.

pbrt's `CoefficientSpectrum<N>` template becomes the trailing axis of an
array; `PBRT_SAMPLED_SPECTRUM` (CMakeLists.txt:20) becomes the `n_samples`
argument of `SpectrumTables` (default 60 over 400-700nm, spectrum.h:82-84).
The scene compiler uses this module to resolve "spectrum"/"blackbody" .pbrt
parameters and SPD files exactly as pbrt does (FromSampled -> XYZ -> RGB in
the default RGB build); the spectral render mode (integrators/spectral.py)
uses the N-sample tables directly.

Data: pbrt_tpu/data/spectra.npz — CIE 1931 matching curves (471 samples),
Smits RGB->spectrum basis (32 samples), measured copper eta/k — extracted
verbatim from spectrum.cpp:190-1172 / metal.cpp:82-115 by
tools/extract_spectra.py (category-(b) physical-constant tables).
"""
from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

SAMPLED_LAMBDA_START = 400.0
SAMPLED_LAMBDA_END = 700.0
N_SPECTRAL_SAMPLES = 60  # spectrum.h:82 nSpectralSamples
CIE_Y_INTEGRAL = 106.856895  # spectrum.h:95


@functools.cache
def _tables():
    return dict(
        np.load(Path(__file__).resolve().parent.parent / "data" / "spectra.npz")
    )


def average_spectrum_samples(lam, vals, l0, l1):
    """AverageSpectrumSamples (spectrum.cpp:65-98): mean of the
    piecewise-linear SPD (lam sorted ascending) over [l0, l1].

    lam, vals: [S]; l0, l1 scalars or arrays broadcastable together.
    Vectorized numpy; used at scene-compile time.
    """
    lam = np.asarray(lam, np.float64)
    vals = np.asarray(vals, np.float64)
    l0 = np.asarray(l0, np.float64)
    l1 = np.asarray(l1, np.float64)
    out = np.zeros(np.broadcast_shapes(l0.shape, l1.shape), np.float64)

    # Edge clamps (spectrum.cpp:74-79).
    out += vals[0] * np.maximum(0.0, np.minimum(l1, lam[0]) - l0)
    out += vals[-1] * np.maximum(0.0, l1 - np.maximum(l0, lam[-1]))

    # Interior segments.
    for i in range(len(lam) - 1):
        sl0 = np.maximum(l0, lam[i])
        sl1 = np.minimum(l1, lam[i + 1])
        seg = np.maximum(0.0, sl1 - sl0)

        def interp(w):
            t = (w - lam[i]) / (lam[i + 1] - lam[i])
            return (1.0 - t) * vals[i] + t * vals[i + 1]

        out += 0.5 * (interp(sl0) + interp(sl1)) * seg
    return out / np.maximum(l1 - l0, 1e-30)


def sample_bin_edges(n=N_SPECTRAL_SAMPLES):
    i = np.arange(n + 1, dtype=np.float64)
    return SAMPLED_LAMBDA_START + (
        SAMPLED_LAMBDA_END - SAMPLED_LAMBDA_START
    ) * i / n


def from_sampled(lam, vals, n=N_SPECTRAL_SAMPLES):
    """SampledSpectrum::FromSampled (spectrum.h:230-247): resample an
    arbitrary (lam, vals) SPD to the n uniform bins, sorting first."""
    order = np.argsort(np.asarray(lam, np.float64))
    lam = np.asarray(lam, np.float64)[order]
    vals = np.asarray(vals, np.float64)[order]
    edges = sample_bin_edges(n)
    return average_spectrum_samples(lam, vals, edges[:-1], edges[1:])


@functools.cache
def cie_xyz_bins(n=N_SPECTRAL_SAMPLES):
    """X/Y/Z matching curves averaged into the n bins (SampledSpectrum::Init,
    spectrum.h:260-280).  Returns [3, n] float64."""
    t = _tables()
    return np.stack(
        [from_sampled(t["CIE_lambda"], t[f"CIE_{c}"], n) for c in "XYZ"]
    )


@functools.cache
def rgb_basis_bins(n=N_SPECTRAL_SAMPLES):
    """The 14 Smits basis spectra resampled to n bins (spectrum.h:284-340).
    Returns dict name -> [n] float64."""
    t = _tables()
    lam = t["RGB2SpectLambda"]
    out = {}
    for kind in ("Refl", "Illum"):
        for c in ("White", "Cyan", "Magenta", "Yellow", "Red", "Green", "Blue"):
            key = f"RGB{kind}2Spect{c}"
            out[key] = from_sampled(lam, t[key], n)
    return out


def to_xyz(s, n=None):
    """SampledSpectrum::ToXYZ (spectrum.h:249-259).  s: [..., n]."""
    s = np.asarray(s, np.float64)
    n = n or s.shape[-1]
    xyz_t = cie_xyz_bins(n)
    scale = (SAMPLED_LAMBDA_END - SAMPLED_LAMBDA_START) / (
        CIE_Y_INTEGRAL * n
    )
    return np.einsum("...s,cs->...c", s, xyz_t) * scale


def y_luminance(s, n=None):
    return to_xyz(s, n)[..., 1]


# sRGB/D65 matrices (spectrum.h:56-66) — shared with core/spectrum.py.
_XYZ2RGB = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ]
)
_RGB2XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)


def to_rgb(s, n=None):
    return np.einsum("rc,...c->...r", _XYZ2RGB, to_xyz(s, n))


def from_rgb(rgb, kind="reflectance", n=N_SPECTRAL_SAMPLES):
    """SampledSpectrum::FromRGB (spectrum.cpp:26-123): Smits-style smooth
    spectrum whose projection back to RGB approximates `rgb`.

    rgb: [..., 3]; kind: "reflectance" | "illuminant".  Returns [..., n].
    """
    rgb = np.asarray(rgb, np.float64)
    b = rgb_basis_bins(n)
    k = "Refl" if kind.startswith("refl") else "Illum"
    w = b[f"RGB{k}2SpectWhite"]
    cy, mg, ye = (b[f"RGB{k}2Spect{c}"] for c in ("Cyan", "Magenta", "Yellow"))
    re_, gr, bl = (b[f"RGB{k}2Spect{c}"] for c in ("Red", "Green", "Blue"))
    r, g, bb = rgb[..., 0:1], rgb[..., 1:2], rgb[..., 2:3]
    out = np.zeros(rgb.shape[:-1] + w.shape, np.float64)

    def case(c1, c2, c3, s_w, s_a, s_b):
        """c1 <= c2 <= c3 branch: c1*white + (c2-c1)*A + (c3-c2)*B."""
        return c1 * s_w + (c2 - c1) * s_a + (c3 - c2) * s_b

    m_r = (r <= g) & (r <= bb)
    m_g = (g <= r) & (g <= bb) & ~m_r
    m_b = ~m_r & ~m_g
    # r smallest: g<=b ? (r,g,b: white,cyan,blue) : (r,b,g: white,cyan,green)
    out = np.where(
        m_r & (g <= bb), case(r, g, bb, w, cy, bl),
        np.where(
            m_r, case(r, bb, g, w, cy, gr),
            np.where(
                m_g & (r <= bb), case(g, r, bb, w, mg, bl),
                np.where(
                    m_g, case(g, bb, r, w, mg, re_),
                    np.where(
                        m_b & (r <= g), case(bb, r, g, w, ye, gr),
                        case(bb, g, r, w, ye, re_),
                    ),
                ),
            ),
        ),
    )
    scale = 0.94 if k == "Refl" else 0.86445
    return np.clip(out * scale, 0.0, None)


def blackbody(lam_nm, temp_k):
    """Blackbody (spectrum.cpp:135-148): Planck's law, W/(m^2 sr m)."""
    lam = np.asarray(lam_nm, np.float64) * 1e-9
    t = float(temp_k)
    if t <= 0:
        return np.zeros_like(lam)
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    l5 = lam**5
    return (2.0 * h * c * c) / (
        l5 * (np.expm1(h * c / (lam * kb * t)))
    )


def blackbody_normalized(lam_nm, temp_k):
    """BlackbodyNormalized (spectrum.cpp:150-158): scaled so the Wien-peak
    emission is 1."""
    le = blackbody(lam_nm, temp_k)
    lambda_max = 2.8977721e-3 / max(float(temp_k), 1e-6) * 1e9
    max_l = blackbody(np.asarray([lambda_max]), temp_k)[0]
    return le / max_l


def spd_to_rgb(lam, vals, kind="reflectance"):
    """The RGB build's handling of a sampled SPD parameter
    (paramset.cpp:378-402 via Spectrum::FromSampled): resample to the
    spectral bins, convert XYZ -> RGB."""
    return to_rgb(from_sampled(lam, vals)).astype(np.float32)


def blackbody_rgb_normalized(temp_k):
    """ParamSet blackbody parameter -> RGB (paramset.cpp:404-417)."""
    t = _tables()
    lam = t["CIE_lambda"]
    vals = blackbody_normalized(lam, temp_k)
    return to_rgb(from_sampled(lam, vals)).astype(np.float32)


@functools.cache
def copper_eta_k_rgb():
    """Metal material Cu defaults computed from the measured samples exactly
    as metal.cpp:115-121 does (FromSampled -> RGB in the RGB build)."""
    t = _tables()
    eta = spd_to_rgb(t["CopperWavelengths"], t["CopperN"])
    k = spd_to_rgb(t["CopperWavelengths"], t["CopperK"])
    return eta, k


def read_spd_file(path):
    """.spd text files: whitespace-separated (lambda, value) pairs
    (floatfile.cpp ReadFloatFile + paramset.cpp:378-388)."""
    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0]
            vals += [float(x) for x in line.split()]
    arr = np.asarray(vals, np.float64).reshape(-1, 2)
    return arr[:, 0], arr[:, 1]
