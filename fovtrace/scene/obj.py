"""Wavefront OBJ/MTL loading to flat numpy buffers.

Replaces the reference's prebuilt sutil mesh loader
(`REF/sutil_sdk/include/Mesh.h:64-85`, `OptiXMesh.h:51-76`) and the naive
loader in `REF/GBuffer.cpp:150-243`. Produces position/normal/texcoord/
index arrays ready for `Scene.build`. A native C++ fast path
(fovtrace/native) is used for large files when available.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np


def load_mtl(path: str) -> Dict[str, dict]:
    """Parse a .mtl file -> {name: {kd, ks, ns, d, map_kd}}."""
    mats: Dict[str, dict] = {}
    cur: Optional[dict] = None
    if not os.path.exists(path):
        return mats
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = {"kd": (0.8, 0.8, 0.8), "ks": (0.0, 0.0, 0.0),
                       "ns": 32.0, "d": 1.0, "map_kd": None}
                mats[parts[1]] = cur
            elif cur is None:
                continue
            elif key == "Kd":
                cur["kd"] = tuple(float(x) for x in parts[1:4])
            elif key == "Ks":
                cur["ks"] = tuple(float(x) for x in parts[1:4])
            elif key == "Ns":
                cur["ns"] = float(parts[1])
            elif key == "d":
                cur["d"] = float(parts[1])
            elif key == "map_Kd":
                cur["map_kd"] = parts[-1]
    return mats


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray],
                                 Optional[np.ndarray], np.ndarray, Dict[str, dict]]:
    """Load an OBJ file.

    Returns (vertices [V,3], triangles [T,3], normals [V,3] or None,
    uvs [V,2] or None, face_material [T] int, materials dict).

    Faces with distinct v/vt/vn index triplets are deduplicated into a
    unified vertex stream (the OBJ format indexes positions, uvs, and
    normals independently; GPUs and our flat Scene don't).
    """
    try:
        from fovtrace import native as _native

        # The native parser handles geometry only; files with material
        # groups (usemtl) need the python loader's per-face materials.
        if _native.available():
            with open(path, "rb") as f:
                head = f.read()
            if b"usemtl" not in head:
                out = _native.load_obj_native(path)
                if out is not None:
                    pos, tris, normals, uvs = out
                    return (pos, tris, normals, uvs,
                            np.zeros((tris.shape[0],), np.int32), {})
    except Exception:
        pass
    return _load_obj_py(path)


def _load_obj_py(path: str):
    positions, normals, uvs = [], [], []
    faces = []  # list of ([(vi, ti, ni)]*3, mat_index)
    mtl: Dict[str, dict] = {}
    mat_names = []
    cur_mat = -1

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(x) for x in parts[1:4]])
            elif key == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif key == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif key == "mtllib":
                mtl_path = os.path.join(os.path.dirname(path), parts[1])
                mtl.update(load_mtl(mtl_path))
            elif key == "usemtl":
                name = parts[1]
                if name not in mat_names:
                    mat_names.append(name)
                cur_mat = mat_names.index(name)
            elif key == "f":
                idx = []
                for vtx in parts[1:]:
                    comp = vtx.split("/")
                    vi = int(comp[0])
                    ti = int(comp[1]) if len(comp) > 1 and comp[1] else 0
                    ni = int(comp[2]) if len(comp) > 2 and comp[2] else 0
                    idx.append((vi, ti, ni))
                # fan-triangulate polygons
                for k in range(1, len(idx) - 1):
                    faces.append(((idx[0], idx[k], idx[k + 1]), cur_mat))

    positions = np.asarray(positions, np.float32)
    normals_arr = np.asarray(normals, np.float32) if normals else None
    uvs_arr = np.asarray(uvs, np.float32) if uvs else None

    def resolve(i, n):
        return (i - 1) if i > 0 else (n + i)

    # unify v/vt/vn triplets
    remap: Dict[Tuple[int, int, int], int] = {}
    out_pos, out_n, out_uv, tri_idx, tri_mat = [], [], [], [], []
    for (tri, mat) in faces:
        ids = []
        for (vi, ti, ni) in tri:
            key = (vi, ti, ni)
            if key not in remap:
                remap[key] = len(out_pos)
                out_pos.append(positions[resolve(vi, len(positions))])
                if normals_arr is not None and ni != 0:
                    out_n.append(normals_arr[resolve(ni, len(normals_arr))])
                elif normals_arr is not None:
                    out_n.append(np.zeros(3, np.float32))
                if uvs_arr is not None and ti != 0:
                    out_uv.append(uvs_arr[resolve(ti, len(uvs_arr))])
                elif uvs_arr is not None:
                    out_uv.append(np.zeros(2, np.float32))
            ids.append(remap[key])
        tri_idx.append(ids)
        tri_mat.append(mat)

    vertices = np.asarray(out_pos, np.float32)
    triangles = np.asarray(tri_idx, np.int64)
    face_mat = np.asarray(tri_mat, np.int32)
    norms = np.asarray(out_n, np.float32) if (normals_arr is not None and out_n) else None
    if norms is not None and not np.any(norms):
        norms = None
    uv_out = np.asarray(out_uv, np.float32) if (uvs_arr is not None and out_uv) else None
    ordered_mtl = {name: mtl.get(name, {}) for name in mat_names}
    return vertices, triangles, norms, uv_out, face_mat, ordered_mtl
