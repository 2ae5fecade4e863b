"""Static (compile-time) scene specialization sets.

The wavefront kernels specialize on which material / light / quadric /
texture types actually occur in the scene — masked branches for absent types
are dropped at trace time.  These sets are host-side Python values derived
once per scene and passed through every jit boundary as static args
(they're hashable and stable, so they're part of the jit cache key).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SceneStatics:
    mat_types: tuple
    light_types: tuple
    quadric_types: tuple
    tex_ids: tuple  # texture ids referenced by materials ((), if none)
    tex_meta: tuple = ()  # per-row (tex_type, child1, child2) — static
    # control flow for the single-pass texture evaluation
    medium_types: tuple = ()  # medium types present (volpath specialization)
    has_media: bool = False

    @property
    def has_textures(self) -> bool:
        return len(self.tex_ids) > 0


def scene_statics(scene) -> SceneStatics:
    from . import scene as sc

    mat_types = tuple(
        sorted(np.unique(np.asarray(scene.materials.mat_type)).tolist())
    )
    light_types = tuple(
        sorted(np.unique(np.asarray(scene.lights.light_type)).tolist())
    )
    prim_types = set(np.unique(np.asarray(scene.prim_type)).tolist())
    quadric_types = tuple(sorted(t for t in prim_types if t != sc.SHAPE_TRIANGLE))
    tex_ids = set()
    for col in ("kd_tex", "ks_tex", "sigma_tex", "rough_tex", "bump_tex"):
        ids = np.asarray(getattr(scene.materials, col))
        tex_ids.update(int(i) for i in ids[ids >= 0])
    tex_meta = ()
    if scene.textures is not None:
        tex_meta = tuple(
            zip(
                np.asarray(scene.textures.tex_type).tolist(),
                np.asarray(scene.textures.child1).tolist(),
                np.asarray(scene.textures.child2).tolist(),
                [tuple(f) for f in np.asarray(scene.textures.fparams).tolist()],
                np.asarray(scene.textures.n_levels).tolist(),
            )
        )
    medium_types = ()
    has_media = False
    if scene.media is not None and scene.prim_medium_inside is not None:
        used = set()
        for col in (scene.prim_medium_inside, scene.prim_medium_outside):
            ids = np.asarray(col)
            used.update(int(i) for i in ids[ids >= 0])
        cm = int(np.asarray(scene.camera_medium))
        if cm >= 0:
            used.add(cm)
        med_types = np.asarray(scene.media.med_type)
        medium_types = tuple(sorted({int(med_types[i]) for i in used}))
        has_media = len(used) > 0
    return SceneStatics(
        mat_types=mat_types,
        light_types=light_types,
        quadric_types=quadric_types,
        tex_ids=tuple(sorted(tex_ids)),
        tex_meta=tex_meta,
        medium_types=medium_types,
        has_media=has_media,
    )
