"""Top-level render driver: RenderSetup -> image.

Re-expression of pbrtWorldEnd's render kickoff (api.cpp:1590-1649) +
RenderOptions::MakeIntegrator dispatch (api.cpp:1662-1697).
"""
from __future__ import annotations

import logging
import time

import numpy as np

from .sceneio import RenderSetup

log = logging.getLogger("pbrt_tpu")


def render_setup(setup: RenderSetup, spp_override=None, res_override=None,
                 crop=None):
    """Build the scene + run the configured integrator.  Returns (img, stats).

    stats carries wall_s/resolution/spp always; for the path engines also
    "counters" (device stats vector), "report" (pbrt-style Statistics block,
    stats.cpp:79-187) and "profile" (coarse host phase table)."""
    from .utils.profiling import Timer
    from .utils.progress import ProgressReporter

    timer = Timer()
    with timer("Scene construction"):
        scene = setup.build_scene()
    film_cfg, filt = setup.make_film_config()
    sampler_cfg = setup.make_sampler_config()
    if crop is not None:
        import dataclasses

        film_cfg = dataclasses.replace(film_cfg, crop_window=tuple(crop))
    if res_override is not None:
        import dataclasses

        film_cfg = dataclasses.replace(film_cfg, full_resolution=tuple(res_override))
        sampler_cfg = dataclasses.replace(
            sampler_cfg, resolution=tuple(res_override)
        )
        setup.film_params._items["xresolution"] = ("integer", [res_override[0]])
        setup.film_params._items["yresolution"] = ("integer", [res_override[1]])
    if spp_override is not None:
        import dataclasses

        sampler_cfg = dataclasses.replace(sampler_cfg, spp=spp_override)

    camera = setup.make_camera()
    name = setup.integrator_name
    counters = None
    t0 = time.time()
    if name == "volpath":
        from .integrators import volpath as vp

        cfg = setup.make_integrator_config()
        img = vp.render(scene, camera, film_cfg, sampler_cfg, cfg, filt)
    elif name == "path":
        # Two engines, identical sample streams on non-subsurface scenes:
        #   lockstep  — per-spp batch, bounce loop (integrators/path.py)
        #   wavefront — persistent lane pool + refill (integrators/wavefront.py)
        # Default = lockstep: the measured-faster engine on TPU (round-5
        # warm-cache bench: lockstep 1.04 vs wavefront 0.68 Mrays/s on
        # killeroo — the wavefront's per-lane dyn sampler draws still pay
        # the per-digit gather cost the lockstep table avoids).  Opt into
        # wavefront with PBRT_TPU_ENGINE=wavefront.
        import os as _os

        cfg = setup.make_integrator_config()
        engine = _os.environ.get("PBRT_TPU_ENGINE", "lockstep")
        w, h = film_cfg.full_resolution
        if engine == "wavefront":
            from .integrators import wavefront as wf

            prog = ProgressReporter(w * h * sampler_cfg.spp, "Rendering")
            with timer("Rendering"):
                img, counters = wf.render(
                    scene, camera, film_cfg, sampler_cfg, cfg, filt,
                    stats_out=True, progress=prog,
                )
        else:
            from .integrators import path as pt

            prog = ProgressReporter(sampler_cfg.spp, "Rendering")
            with timer("Rendering"):
                img, counters = pt.render(
                    scene, camera, film_cfg, sampler_cfg, cfg, filt,
                    stats_out=True, progress=prog,
                )
        prog.finish()
    elif name == "directlighting":
        from .integrators import direct as dl
        from .sceneio.paramset import ParamSet

        p = setup.integrator_params or ParamSet()
        cfg = dl.DirectLightingConfig(
            max_depth=p.find_one_int("maxdepth", 5),
            strategy=p.find_one_string("strategy", "all"),
        )
        img = dl.render(scene, camera, film_cfg, sampler_cfg, cfg, filt)
    elif name == "ao":
        from .integrators import ao
        from .sceneio.paramset import ParamSet

        p = setup.integrator_params or ParamSet()
        cfg = ao.AOConfig(
            cos_sample=p.find_one_bool("cossample", True),
            n_samples=p.find_one_int("nsamples", 64),
        )
        img = ao.render(scene, camera, film_cfg, sampler_cfg, cfg, filt)
    elif name == "whitted":
        from .integrators import whitted as wh
        from .integrators.direct import DirectLightingConfig
        from .sceneio.paramset import ParamSet

        p = setup.integrator_params or ParamSet()
        cfg = DirectLightingConfig(max_depth=p.find_one_int("maxdepth", 5))
        img = wh.render(scene, camera, film_cfg, sampler_cfg, cfg, filt)
    elif name == "bdpt":
        from .integrators import bdpt as bd
        from .sceneio.paramset import ParamSet

        p = setup.integrator_params or ParamSet()
        cfg = bd.BDPTConfig(max_depth=p.find_one_int("maxdepth", 5))
        img = bd.render(scene, camera, film_cfg, sampler_cfg, cfg, filt)
    elif name == "mlt":
        from .integrators import mlt as ml
        from .sceneio.paramset import ParamSet

        p = setup.integrator_params or ParamSet()
        cfg = ml.MLTConfig(
            max_depth=p.find_one_int("maxdepth", 5),
            n_bootstrap=p.find_one_int("bootstrapsamples", 4096),
            n_chains=p.find_one_int("chains", 1024),
            mutations_per_pixel=p.find_one_int("mutationsperpixel", 4),
            sigma=p.find_one_float("sigma", 0.01),
            large_step_prob=p.find_one_float("largestepprobability", 0.3),
        )
        img = ml.render(scene, camera, film_cfg, cfg, filt)
    elif name == "sppm":
        from .integrators import sppm as sp
        from .sceneio.paramset import ParamSet

        p = setup.integrator_params or ParamSet()
        cfg = sp.SPPMConfig(
            max_depth=p.find_one_int("maxdepth", 5),
            n_iterations=p.find_one_int("numiterations",
                                        p.find_one_int("iterations", 16)),
            photons_per_iteration=p.find_one_int("photonsperiteration", -1),
            initial_radius=p.find_one_float("radius", 1.0),
        )
        img = sp.render(scene, camera, film_cfg, cfg, filt)
    else:
        raise ValueError(f"integrator {name!r} not supported yet")
    img = np.asarray(img)
    wall = time.time() - t0
    w, h = film_cfg.full_resolution
    n_rays = w * h * sampler_cfg.spp
    stats = {
        "wall_s": wall,
        "camera_rays": n_rays,
        "spp": sampler_cfg.spp,
        "resolution": film_cfg.full_resolution,
        "profile": timer.report(),
    }
    if counters is not None:
        from .utils import stats as st

        stats["counters"] = np.asarray(counters)
        stats["report"] = st.report(counters)
        stats["rays_traced"] = float(st.ray_total(stats["counters"]))
    return img, stats


def render_file(path: str, out: str | None = None, spp=None, res=None,
                crop=None):
    from .sceneio import parse_pbrt_file
    from .utils.imageio import write_image

    setup = parse_pbrt_file(path)
    img, stats = render_setup(setup, spp_override=spp, res_override=res,
                              crop=crop)
    if out is None:
        from .sceneio.paramset import ParamSet

        p = setup.film_params or ParamSet()
        out = p.find_one_string("filename", "pbrt.pfm")
        if out.endswith(".exr"):
            out = out[:-4] + ".pfm"
    write_image(out, img)
    log.info("wrote %s (%.1fs)", out, stats["wall_s"])
    return img, stats
