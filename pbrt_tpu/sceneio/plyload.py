"""Minimal PLY mesh loader (ascii + binary little/big endian).

Host-side replacement for the reference's rply-backed loader
(shapes/plymesh.cpp:292): returns (indices [T,3], P [V,3], N or None,
uv or None) ready for SceneBuilder.add_triangle_mesh.
"""
from __future__ import annotations

import numpy as np

_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def load_ply(path: str):
    with open(path, "rb") as f:
        data = f.read()

    # ---- header ----
    end = data.find(b"end_header\n")
    if end < 0:
        raise ValueError(f"{path}: not a PLY file")
    header = data[:end].decode("ascii", "replace").split("\n")
    body = data[end + len(b"end_header\n"):]

    fmt = None
    elements = []  # (name, count, [(prop_name, dtype, is_list, count_dtype)])
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(
                    (parts[4], _PLY_TYPES[parts[3]], True, _PLY_TYPES[parts[2]])
                )
            else:
                elements[-1][2].append((parts[2], _PLY_TYPES[parts[1]], False, None))

    verts = {}
    faces = []
    if fmt == "ascii":
        toks = body.split()
        ti = 0
        for name, count, props in elements:
            if name == "vertex":
                cols = {p[0]: [] for p in props}
                for _ in range(count):
                    for pname, dt, is_list, _ in props:
                        cols[pname].append(float(toks[ti]))
                        ti += 1
                verts = {k: np.asarray(v) for k, v in cols.items()}
            elif name == "face":
                for _ in range(count):
                    n = int(toks[ti]); ti += 1
                    idx = [int(toks[ti + k]) for k in range(n)]
                    ti += n
                    for k in range(1, n - 1):  # fan triangulation
                        faces.append((idx[0], idx[k], idx[k + 1]))
            else:
                # Skip unknown elements (ascii): consume count * n_props.
                for _ in range(count):
                    for pname, dt, is_list, _ in props:
                        if is_list:
                            n = int(toks[ti]); ti += 1 + n
                        else:
                            ti += 1
    else:
        bo = "<" if "little" in fmt else ">"
        off = 0
        for name, count, props in elements:
            if name == "vertex" and all(not p[2] for p in props):
                dt = np.dtype([(p[0], bo + p[1]) for p in props])
                arr = np.frombuffer(body, dt, count, off)
                off += dt.itemsize * count
                verts = {p[0]: arr[p[0]].astype(np.float64) for p in props}
            elif name == "face":
                # Typically one list property.
                pname, dt, is_list, cdt = props[0]
                for _ in range(count):
                    n = int(
                        np.frombuffer(body, bo + cdt, 1, off)[0]
                    )
                    off += np.dtype(cdt).itemsize
                    idx = np.frombuffer(body, bo + dt, n, off)
                    off += np.dtype(dt).itemsize * n
                    for k in range(1, n - 1):
                        faces.append((int(idx[0]), int(idx[k]), int(idx[k + 1])))
            else:
                # Fixed-size unknown element: skip.
                if all(not p[2] for p in props):
                    dt = np.dtype([(p[0], bo + p[1]) for p in props])
                    off += dt.itemsize * count
                else:
                    raise ValueError(f"{path}: unsupported list element {name}")

    p = np.stack([verts["x"], verts["y"], verts["z"]], -1).astype(np.float32)
    n = None
    if all(k in verts for k in ("nx", "ny", "nz")):
        n = np.stack([verts["nx"], verts["ny"], verts["nz"]], -1).astype(np.float32)
    uv = None
    for ux, vx in (("u", "v"), ("s", "t")):
        if ux in verts and vx in verts:
            uv = np.stack([verts[ux], verts[vx]], -1).astype(np.float32)
            break
    indices = np.asarray(faces, np.int32)
    return indices, p, n, uv
