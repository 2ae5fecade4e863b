"""ParamSet: typed key/value parameter bags from .pbrt files.

Host-side re-expression of core/paramset.{h,cpp}: typed lookups with
defaults (`FindOne*`, paramset.h:95), used-flag tracking and `ReportUnused`
(paramset.h:118), and TextureParams-style layering (geometry params override
material params, paramset.h:162-215).
"""
from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("pbrt_tpu")

_TYPES = {
    "float", "integer", "string", "bool", "point", "point3", "point2",
    "vector", "vector2", "normal", "rgb", "color", "xyz", "spectrum",
    "texture", "blackbody",
}


class ParamSet:
    def __init__(self, items: dict | None = None):
        # name -> (ptype, values list)
        self._items: dict = dict(items or {})
        self._used: set = set()

    @staticmethod
    def from_decls(decls) -> "ParamSet":
        """decls: list of (decl_string, values) from the parser."""
        items = {}
        for decl, vals in decls:
            parts = decl.split()
            if len(parts) != 2 or parts[0] not in _TYPES:
                raise ValueError(f"bad parameter declaration {decl!r}")
            ptype, name = parts
            items[name] = (ptype, vals)
        return ParamSet(items)

    def keys(self):
        return self._items.keys()

    def has(self, name):
        return name in self._items

    def _get(self, name):
        self._used.add(name)
        return self._items.get(name)

    def find_one_float(self, name, default):
        v = self._get(name)
        return float(v[1][0]) if v else float(default)

    def find_one_int(self, name, default):
        v = self._get(name)
        return int(v[1][0]) if v else int(default)

    def find_one_bool(self, name, default):
        v = self._get(name)
        if not v:
            return bool(default)
        x = v[1][0]
        if isinstance(x, str):
            return x == "true"
        return bool(x)

    def find_one_string(self, name, default):
        v = self._get(name)
        return str(v[1][0]) if v else default

    def find_one_point(self, name, default):
        v = self._get(name)
        return np.asarray(v[1][:3] if v else default, np.float32)

    def find_one_spectrum(self, name, default):
        """RGB / color / spectrum / blackbody parameter -> rgb triple.

        "spectrum" values are (lambda, value) SPD pairs or an .spd filename
        (paramset.cpp:378-402) resolved through the full SampledSpectrum
        machinery (core/sampled_spectrum.py: FromSampled -> XYZ -> RGB),
        exactly as pbrt's RGB build converts them; "blackbody" is
        BlackbodyNormalized over the CIE range (paramset.cpp:404-417)."""
        v = self._get(name)
        if not v:
            if default is None:
                return None
            d = np.asarray(default, np.float32)
            if d.shape == (3,):
                return d
            return np.full(3, float(default), np.float32)
        ptype, vals = v
        from ..core import sampled_spectrum as ss

        if ptype == "blackbody":
            return ss.blackbody_rgb_normalized(float(vals[0])) * (
                float(vals[1]) if len(vals) > 1 else 1.0
            )
        if ptype == "spectrum":
            if vals and isinstance(vals[0], str):
                path = vals[0]
                if getattr(self, "cwd", None):
                    import os

                    cand = os.path.join(self.cwd, path)
                    if os.path.exists(cand):
                        path = cand
                lam, sv = ss.read_spd_file(path)
            else:
                arr = np.asarray(vals, np.float64).reshape(-1, 2)
                lam, sv = arr[:, 0], arr[:, 1]
            return ss.spd_to_rgb(lam, sv)
        arr = np.asarray(vals, np.float32)
        if arr.size == 1:
            return np.full(3, float(arr), np.float32)
        return arr[:3]

    def find_texture(self, name):
        v = self._get(name)
        if v and v[0] == "texture":
            return str(v[1][0])
        return None

    def find_floats(self, name):
        v = self._get(name)
        return np.asarray(v[1], np.float32) if v else None

    def find_ints(self, name):
        v = self._get(name)
        return np.asarray(v[1], np.int64).astype(np.int32) if v else None

    def find_points(self, name):
        v = self._get(name)
        return np.asarray(v[1], np.float32).reshape(-1, 3) if v else None

    def find_point2s(self, name):
        v = self._get(name)
        return np.asarray(v[1], np.float32).reshape(-1, 2) if v else None

    def find_strings(self, name):
        v = self._get(name)
        return [str(x) for x in v[1]] if v else None

    def report_unused(self, where=""):
        for name in self._items:
            if name not in self._used:
                log.warning("Parameter %r (%s) not used", name, where)


class TextureParams:
    """Layers shape params over material params (paramset.h:162-215)."""

    def __init__(self, geom: ParamSet, material: ParamSet, float_textures=None,
                 spectrum_textures=None):
        self.geom = geom
        self.material = material
        self.float_textures = float_textures or {}
        self.spectrum_textures = spectrum_textures or {}

    def find_float(self, name, default):
        return self.geom.find_one_float(
            name, self.material.find_one_float(name, default)
        )

    def find_string(self, name, default=""):
        return self.geom.find_one_string(
            name, self.material.find_one_string(name, default)
        )

    def find_bool(self, name, default):
        return self.geom.find_one_bool(
            name, self.material.find_one_bool(name, default)
        )

    def find_spectrum(self, name, default):
        return self.geom.find_one_spectrum(
            name, self.material.find_one_spectrum(name, default)
        )

    def get_texture_name(self, name):
        return self.geom.find_texture(name) or self.material.find_texture(name)
