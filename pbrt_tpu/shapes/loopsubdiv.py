"""Loop subdivision surfaces -> limit-surface triangle mesh.

Host-side re-expression of shapes/loopsubdiv.cpp:137-467 (LoopSubdivide):
same weights (beta/loopGamma, one-ring and boundary rules, 3/8-1/8 edge
rule), same limit-surface push and tangent-based normals — but array/dict
based instead of pointer-based half-edge structures.  Pure preprocessing:
runs once at scene compile.
"""
from __future__ import annotations

import numpy as np


def _beta(valence: int) -> float:
    return 3.0 / 16.0 if valence == 3 else 3.0 / (8.0 * valence)


def _loop_gamma(valence: int) -> float:
    return 1.0 / (valence + 3.0 / (8.0 * _beta(valence)))


def _build_adjacency(faces: np.ndarray, n_verts: int):
    """Returns (edge_faces, neighbors, boundary_flags, ordered ring builder).

    edge_faces: dict (a,b) sorted -> [face ids]
    """
    edge_faces: dict = {}
    for fi, (a, b, c) in enumerate(faces):
        for u, v in ((a, b), (b, c), (c, a)):
            key = (u, v) if u < v else (v, u)
            edge_faces.setdefault(key, []).append(fi)
    return edge_faces


def _vertex_rings(faces: np.ndarray, n_verts: int, edge_faces):
    """Ordered one-rings per vertex (winding order), + boundary flags.

    Mirrors SDVertex::oneRing (loopsubdiv.cpp:437-455): interior rings walk
    next-face around the vertex; boundary rings start at the boundary face
    reached by walking forward and then collect prevVerts backward.
    """
    # For each (vertex, face): position of vertex in face.
    # next_face_map[(v, f)] = face across edge starting at v in f.
    vert_faces: list[list[int]] = [[] for _ in range(n_verts)]
    for fi, tri in enumerate(faces):
        for k in range(3):
            vert_faces[tri[k]].append(fi)

    def other_face(edge_key, fi):
        lst = edge_faces[edge_key]
        if len(lst) < 2:
            return -1
        return lst[1] if lst[0] == fi else lst[0]

    rings = []
    boundary = np.zeros(n_verts, bool)
    for v in range(n_verts):
        if not vert_faces[v]:
            rings.append([])
            continue
        start = vert_faces[v][0]

        def vnum(fi):
            tri = faces[fi]
            return int(np.where(tri == v)[0][0])

        def next_face(fi):
            i = vnum(fi)
            a, b = faces[fi][i], faces[fi][(i + 1) % 3]
            return other_face((min(a, b), max(a, b)), fi)

        def prev_face(fi):
            i = vnum(fi)
            a, b = faces[fi][(i + 2) % 3], faces[fi][i]
            return other_face((min(a, b), max(a, b)), fi)

        def next_vert(fi):
            return int(faces[fi][(vnum(fi) + 1) % 3])

        def prev_vert(fi):
            return int(faces[fi][(vnum(fi) + 2) % 3])

        # Walk forward to detect boundary.
        f = start
        steps = 0
        is_boundary = False
        while True:
            nf = next_face(f)
            if nf == -1:
                is_boundary = True
                break
            f = nf
            steps += 1
            if f == start or steps > len(vert_faces[v]) + 1:
                break
        boundary[v] = is_boundary

        ring = []
        if not is_boundary:
            face = start
            while True:
                ring.append(next_vert(face))
                face = next_face(face)
                if face == start:
                    break
        else:
            # f is now the last face forward (next_face == -1).
            face = f
            ring.append(next_vert(face))
            while face != -1:
                ring.append(prev_vert(face))
                face = prev_face(face)
        rings.append(ring)
    return rings, boundary


def _subdivide_once(faces: np.ndarray, p: np.ndarray):
    n_verts = p.shape[0]
    edge_faces = _build_adjacency(faces, n_verts)
    rings, boundary = _vertex_rings(faces, n_verts, edge_faces)

    # ---- even vertices (loopsubdiv.cpp:243-252) ----
    new_p_even = np.zeros_like(p)
    for v in range(n_verts):
        ring = rings[v]
        val = len(ring)
        if val == 0:
            new_p_even[v] = p[v]
            continue
        if not boundary[v]:
            b = 1.0 / 16.0 if val == 6 else _beta(val)
            new_p_even[v] = (1 - val * b) * p[v] + b * p[ring].sum(0)
        else:
            b = 1.0 / 8.0
            new_p_even[v] = (1 - 2 * b) * p[v] + b * (p[ring[0]] + p[ring[-1]])

    # ---- odd (edge) vertices (loopsubdiv.cpp:255-286) ----
    edge_ids = {}
    odd_pts = []
    for (a, b), flist in edge_faces.items():
        if len(flist) == 1:
            pt = 0.5 * (p[a] + p[b])
        else:
            f0, f1 = flist[0], flist[1]
            o0 = int(sum(faces[f0]) - a - b)
            o1 = int(sum(faces[f1]) - a - b)
            pt = (3.0 / 8.0) * (p[a] + p[b]) + (1.0 / 8.0) * (p[o0] + p[o1])
        edge_ids[(a, b)] = n_verts + len(odd_pts)
        odd_pts.append(pt)
    new_p = np.concatenate([new_p_even, np.asarray(odd_pts, p.dtype)])

    # ---- new faces (loopsubdiv.cpp:317-330) ----
    new_faces = np.zeros((faces.shape[0] * 4, 3), faces.dtype)
    for fi, (a, b, c) in enumerate(faces):
        e0 = edge_ids[(a, b) if a < b else (b, a)]
        e1 = edge_ids[(b, c) if b < c else (c, b)]
        e2 = edge_ids[(c, a) if c < a else (a, c)]
        new_faces[4 * fi + 0] = (a, e0, e2)
        new_faces[4 * fi + 1] = (e0, b, e1)
        new_faces[4 * fi + 2] = (e2, e1, c)
        new_faces[4 * fi + 3] = (e0, e1, e2)
    return new_faces, new_p


def loop_subdivide(indices: np.ndarray, p: np.ndarray, n_levels: int):
    """Returns (indices', p_limit, normals) — LoopSubdivide's output mesh."""
    faces = np.asarray(indices, np.int64).reshape(-1, 3)
    p = np.asarray(p, np.float64).reshape(-1, 3)
    for _ in range(max(n_levels, 0)):
        faces, p = _subdivide_once(faces, p)

    # ---- limit surface + tangents (loopsubdiv.cpp:333-380) ----
    n_verts = p.shape[0]
    edge_faces = _build_adjacency(faces, n_verts)
    rings, boundary = _vertex_rings(faces, n_verts, edge_faces)

    # Pass 1: push EVERY vertex to the limit surface (loopsubdiv.cpp:333-341
    # assigns v->p = pLimit BEFORE the tangent loop)...
    p_limit = np.zeros_like(p)
    for v in range(n_verts):
        ring = rings[v]
        val = len(ring)
        if val == 0:
            p_limit[v] = p[v]
            continue
        pr = p[ring]
        if not boundary[v]:
            g = _loop_gamma(val)
            p_limit[v] = (1 - val * g) * p[v] + g * pr.sum(0)
        else:
            b = 1.0 / 5.0
            p_limit[v] = (1 - 2 * b) * p[v] + b * (pr[0] + pr[-1])

    # Pass 2: tangents from the LIMIT-position one-rings (oneRing reads the
    # already-pushed v->p, loopsubdiv.cpp:344-378).  Using the pre-limit
    # positions here skewed every limit normal by up to ~24 degrees on
    # killeroo — the dominant path-decoherence source vs the reference
    # (round-4 subdiv dump comparison: P exact, N wrong on 99.8% of verts).
    normals = np.zeros_like(p)
    for v in range(n_verts):
        ring = rings[v]
        val = len(ring)
        if val == 0:
            normals[v] = (0, 0, 1)
            continue
        pr = p_limit[ring]
        if not boundary[v]:
            j = np.arange(val)
            S = (np.cos(2 * np.pi * j / val)[:, None] * pr).sum(0)
            T = (np.sin(2 * np.pi * j / val)[:, None] * pr).sum(0)
        else:
            S = pr[-1] - pr[0]
            if val == 2:
                T = pr[0] + pr[1] - 2 * p_limit[v]
            elif val == 3:
                T = pr[1] - p_limit[v]
            elif val == 4:
                T = (-1 * pr[0] + 2 * pr[1] + 2 * pr[2] - 1 * pr[3]
                     - 2 * p_limit[v])
            else:
                theta = np.pi / (val - 1)
                T = np.sin(theta) * (pr[0] + pr[-1])
                for k in range(1, val - 1):
                    wt = (2 * np.cos(theta) - 2) * np.sin(k * theta)
                    T = T + wt * pr[k]
                T = -T
        normals[v] = np.cross(S, T)

    # pbrt keeps the limit normals UNNORMALIZED (Ns.push_back(Cross(S,T)),
    # loopsubdiv.cpp:378): their magnitudes weight the barycentric blend at
    # hit time (the interpolated SUM is normalized, not the vertices).
    return (
        faces.astype(np.int32),
        p_limit.astype(np.float32),
        normals.astype(np.float32),
    )
