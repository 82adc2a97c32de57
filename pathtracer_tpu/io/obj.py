"""Wavefront OBJ ingestion.

Replaces the vendored C++ ``outsource/OBJ_Loader.hpp`` (reachable only via
the vestigial ``utils/mesh_loader.h:10-15``) with a loader that actually gets
wired into scenes: the reference ships ``models/bunny`` and
``models/cornellbox`` but never loads them (SURVEY §2.1 mesh-loader row).

Supports: v / vn / vt / f (with 1-based, negative, and v/vt/vn forms),
polygon fan triangulation. A native C++ fast path (pathtracer_tpu/native)
is used when built; pure Python otherwise.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file -> (vertices (V, 3) f32, faces (F, 3) int32).

    Faces are triangulated with a fan around the first vertex, matching
    OBJ_Loader's behavior for convex polygons (OBJ_Loader.hpp:407-715).
    """
    try:
        from pathtracer_tpu.native import bindings
        if bindings.available():
            return bindings.load_obj(path)
    except Exception:
        pass
    return load_obj_python(path)


def load_obj_python(path: str) -> Tuple[np.ndarray, np.ndarray]:
    verts = []
    faces = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]),
                              float(parts[3])))
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    s = tok.split("/")[0]
                    if not s:
                        continue
                    i = int(s)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32).reshape(-1, 3))
