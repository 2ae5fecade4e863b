"""bsdftest: numeric BxDF sampling sanity harness (tools/bsdftest.cpp
parity): for each material, estimate hemispherical-directional reflectance
with (a) uniform-sphere sampling of eval and (b) importance sampling of
Sample_f, print both, and flag disagreements.

Usage: python -m pbrt_tpu.tools.bsdftest [--n 200000]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="bsdftest")
    p.add_argument("--n", type=int, default=200_000)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from .. import scene as sc
    from ..materials import bsdf as bx

    b = sc.SceneBuilder()
    mats = {
        "matte": b.add_material(sc.MAT_MATTE, kd=(0.6, 0.6, 0.6)),
        "oren-nayar": b.add_material(sc.MAT_MATTE, kd=(0.6, 0.6, 0.6), sigma=20.0),
        "plastic": b.add_material(sc.MAT_PLASTIC, kd=(0.4, 0.4, 0.4), ks=(0.3, 0.3, 0.3), roughness=0.1),
        "metal": b.add_material(sc.MAT_METAL, roughness=0.05),
        "substrate": b.add_material(sc.MAT_SUBSTRATE, kd=(0.4, 0.4, 0.4), ks=(0.2, 0.2, 0.2), roughness=0.1),
        "translucent": b.add_material(sc.MAT_TRANSLUCENT, kd=(0.4, 0.4, 0.4), ks=(0.1, 0.1, 0.1), kr=(0.5, 0.5, 0.5), kt=(0.5, 0.5, 0.5)),
        "rough-glass": b.add_material(sc.MAT_GLASS, urough=0.2, vrough=0.2, roughness=0.2, remap_roughness=False),
        "disney": b.add_material(sc.MAT_DISNEY, kd=(0.6, 0.3, 0.2), roughness=0.4, disney=(0.3, 0, 0, 0.5, 0.5, 0.5, 1.0, 0, 0, 1.0, 0, 0), remap_roughness=False),
        "hair": b.add_material(sc.MAT_HAIR),
    }
    b.add_triangle_mesh([[0, 1, 2]], [[0, 0, 0], [1, 0, 0], [0, 1, 0]], material=0)
    table = b.build().materials

    n = args.n
    rs = np.random.RandomState(0)
    wo = np.array([0.3, -0.2, 0.85], np.float32)
    wo /= np.linalg.norm(wo)
    wo_b = jnp.broadcast_to(jnp.asarray(wo), (n, 3))
    u_sph = rs.rand(n, 2)
    z = 1 - 2 * u_sph[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    ph = 2 * np.pi * u_sph[:, 1]
    wi_u = jnp.asarray(
        np.stack([r * np.cos(ph), r * np.sin(ph), z], -1), jnp.float32
    )
    u_s = jnp.asarray(rs.rand(n, 2), jnp.float32)

    print(f"{'material':14s} {'rho(uniform)':>14s} {'rho(sampled)':>14s}  status")
    status = 0
    for name, mid in mats.items():
        t = int(np.asarray(table.mat_type)[mid])
        ids = jnp.full((n,), mid, jnp.int32)
        mat = bx.gather_material(table, ids, None, (t,), uv=jnp.full((n, 2), 0.3))
        f_u, _ = bx.eval_material(mat, wo_b, wi_u, (t,))
        rho_u = float(jnp.mean(f_u[:, 0] * jnp.abs(wi_u[:, 2])) * 4 * np.pi)
        s = bx.sample_material(mat, wo_b, u_s, (t,))
        w = jnp.where(
            (s["pdf"] > 1e-9) & ~s["is_specular"],
            s["f"][:, 0] * jnp.abs(s["wi"][:, 2]) / jnp.maximum(s["pdf"], 1e-9),
            0.0,
        )
        rho_s = float(jnp.mean(w))
        ok = abs(rho_s - rho_u) < max(0.05, 0.15 * max(rho_u, rho_s))
        if not ok:
            status = 1
        print(f"{name:14s} {rho_u:14.4f} {rho_s:14.4f}  "
              f"{'ok' if ok else 'MISMATCH'}")
    return status


if __name__ == "__main__":
    sys.exit(main())
