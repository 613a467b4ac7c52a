"""Wavefront OBJ loader (numpy, host-side).

Covers the subset used by the reference assets (scenes/meshes/*.obj:
v / vt / vn / f with v, v/vt, v//vn, v/vt/vn forms, triangles and quads,
negative indices), cf. SURVEY.md §2b mesh I/O row.
"""

from __future__ import annotations

import numpy as np


def load_obj(path):
    """Returns dict with vertices [V,3] f32, faces [F,3] i32 (triangulated),
    normals [V,3] or None, uvs [V,2] or None.

    Per-corner vt/vn indices are re-indexed onto unique (v, vt, vn) corners
    so faces index a single vertex buffer.
    """
    positions, texcoords, normals = [], [], []
    corners = {}  # (vi, ti, ni) -> new index
    out_pos, out_uv, out_nrm = [], [], []
    faces = []
    has_uv = False
    has_nrm = False

    def corner(spec: str):
        nonlocal has_uv, has_nrm
        parts = spec.split("/")
        vi = int(parts[0])
        ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        ni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = ti - 1 if ti > 0 else (len(texcoords) + ti if ti < 0 else -1)
        ni = ni - 1 if ni > 0 else (len(normals) + ni if ni < 0 else -1)
        key = (vi, ti, ni)
        idx = corners.get(key)
        if idx is None:
            idx = len(out_pos)
            corners[key] = idx
            out_pos.append(positions[vi])
            out_uv.append(texcoords[ti] if ti >= 0 else (0.0, 0.0))
            out_nrm.append(normals[ni] if ni >= 0 else (0.0, 0.0, 0.0))
        if ti >= 0:
            has_uv = True
        if ni >= 0:
            has_nrm = True
        return idx

    with open(path, "r", errors="replace") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                positions.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif tok[0] == "vt":
                texcoords.append((float(tok[1]), float(tok[2])))
            elif tok[0] == "vn":
                normals.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif tok[0] == "f":
                idx = [corner(s) for s in tok[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))

    v = np.asarray(out_pos, np.float32).reshape(-1, 3)
    f_arr = np.asarray(faces, np.int32).reshape(-1, 3)
    uv = np.asarray(out_uv, np.float32).reshape(-1, 2) if has_uv else None
    n = np.asarray(out_nrm, np.float32).reshape(-1, 3) if has_nrm else None
    return {"vertices": v, "faces": f_arr, "normals": n, "uvs": uv}
