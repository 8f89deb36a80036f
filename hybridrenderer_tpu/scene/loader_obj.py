"""Wavefront OBJ (+MTL) importer.

The reference imports via Assimp (AssetImporter.cpp:137-287). Here OBJ is
parsed directly (numpy-vectorized line handling); materials map to the
Material schema with the same PBR slot conventions (map_Kd → colour
texture, map_Ke → emission, bump/map_Bump → normal). Polygons are
fan-triangulated; normals are generated smooth if absent (Assimp
GenSmoothNormals analog); tangents come from scene.geometry.compute_tangents
(CalcTangentSpace analog).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.types import INVALID_ID
from .geometry import MeshData, compute_tangents
from .schema import Material


def parse_mtl(path: str) -> Dict[str, Material]:
    mats: Dict[str, Material] = {}
    cur: Optional[dict] = None
    tex_slots: Dict[str, str] = {}
    if not os.path.exists(path):
        return mats

    def flush():
        if cur is not None:
            mats[cur["name"]] = Material(
                name=cur["name"],
                colour=tuple(cur.get("Kd", (0.8, 0.8, 0.8))),
                emission=tuple(cur.get("Ke", (0.0, 0.0, 0.0))),
                roughness=cur.get("roughness", 0.5),
                metallic=cur.get("metallic", 0.0),
                opacity=cur.get("d", 1.0),
                # OBJ carries no sidedness; two-sided is the safe
                # default for possibly-open meshes (the reference
                # G-buffer renders everything two-sided anyway,
                # GBufferPass.cpp:74)
                double_sided=True,
            )
            mats[cur["name"]]._tex_paths = dict(cur.get("tex", {}))  # type: ignore

    with open(path, "r", errors="replace") as f:
        for line in f:
            t = line.split()
            if not t or t[0].startswith("#"):
                continue
            key = t[0]
            if key == "newmtl":
                flush()
                cur = {"name": t[1], "tex": {}}
            elif cur is None:
                continue
            elif key in ("Kd", "Ke"):
                cur[key] = [float(x) for x in t[1:4]]
            elif key == "Ns":  # shininess → roughness
                ns = float(t[1])
                cur["roughness"] = float(np.clip(1.0 - np.sqrt(ns) / 31.62, 0.03, 1.0))
            elif key == "Pm":
                cur["metallic"] = float(t[1])
            elif key == "Pr":
                cur["roughness"] = float(t[1])
            elif key == "d":
                cur["d"] = float(t[1])
            elif key == "Tr":
                cur["d"] = 1.0 - float(t[1])
            elif key == "map_Kd":
                cur["tex"]["colour"] = t[-1]
            elif key == "map_Ke":
                cur["tex"]["emission"] = t[-1]
            elif key in ("map_Bump", "bump", "norm"):
                cur["tex"]["normal"] = t[-1]
            elif key in ("map_Pr", "map_Ns"):
                cur["tex"]["roughness"] = t[-1]
    flush()
    return mats


def load_obj(path: str) -> Tuple[List[MeshData], List[Material], Dict[int, Dict[str, str]]]:
    """Parse an OBJ into per-material meshes.

    Returns (meshes, materials, tex_paths_by_material_index). Texture
    decoding/stacking happens in scene/loader.py. Uses the native C++
    tokenizer (scene/loader_native.py) when available; the pure-Python
    path below is the fallback and the behavioural reference.
    """
    from . import loader_native

    if loader_native.available():
        native = loader_native.parse_obj_native(path)
        if native is not None:
            return _assemble_from_native(path, native)
    positions: List = []
    texcoords: List = []
    normals: List = []
    mtl_by_name: Dict[str, Material] = {}
    faces_by_mat: Dict[str, List] = {}
    cur_mat = ""

    base = os.path.dirname(path)
    with open(path, "r", errors="replace") as f:
        for line in f:
            t = line.split()
            if not t or t[0].startswith("#"):
                continue
            key = t[0]
            if key == "v":
                positions.append([float(x) for x in t[1:4]])
            elif key == "vt":
                texcoords.append([float(t[1]), float(t[2]) if len(t) > 2 else 0.0])
            elif key == "vn":
                normals.append([float(x) for x in t[1:4]])
            elif key == "mtllib":
                mtl_by_name.update(parse_mtl(os.path.join(base, t[1])))
            elif key == "usemtl":
                cur_mat = t[1]
            elif key == "f":
                verts = t[1:]
                tri_list = faces_by_mat.setdefault(cur_mat, [])
                # fan triangulation
                for k in range(1, len(verts) - 1):
                    tri_list.append((verts[0], verts[k], verts[k + 1]))

    P = np.asarray(positions, np.float32)
    T = np.asarray(texcoords, np.float32) if texcoords else np.zeros((0, 2), np.float32)
    N = np.asarray(normals, np.float32) if normals else np.zeros((0, 3), np.float32)

    materials: List[Material] = []
    tex_paths: Dict[int, Dict[str, str]] = {}
    meshes: List[MeshData] = []

    def idx(token: str, count: int) -> int:
        i = int(token)
        return i - 1 if i > 0 else count + i

    for mat_name, faces in faces_by_mat.items():
        mat = mtl_by_name.get(mat_name, Material(name=mat_name or "default", double_sided=True))
        mat_idx = len(materials)
        materials.append(mat)
        tp = getattr(mat, "_tex_paths", {})
        if tp:
            tex_paths[mat_idx] = {k: os.path.join(base, v) for k, v in tp.items()}

        # deduplicate v/vt/vn triples per mesh
        cache: Dict[str, int] = {}
        vp, vt, vn, indices = [], [], [], []
        for tri in faces:
            for token in tri:
                if token not in cache:
                    parts = token.split("/")
                    pi = idx(parts[0], len(P))
                    ti = idx(parts[1], len(T)) if len(parts) > 1 and parts[1] else -1
                    ni = idx(parts[2], len(N)) if len(parts) > 2 and parts[2] else -1
                    cache[token] = len(vp)
                    vp.append(P[pi])
                    vt.append(T[ti] if ti >= 0 else np.zeros(2, np.float32))
                    vn.append(N[ni] if ni >= 0 else np.zeros(3, np.float32))
                indices.append(cache[token])

        vp = np.asarray(vp, np.float32)
        vt = np.asarray(vt, np.float32)
        vn = np.asarray(vn, np.float32)
        indices = np.asarray(indices, np.int32)

        if np.allclose(vn, 0.0):
            vn = smooth_normals(vp, indices)
        else:
            lens = np.linalg.norm(vn, axis=-1, keepdims=True)
            vn = vn / np.maximum(lens, 1e-8)

        tangents = compute_tangents(vp, vn, vt, indices)
        meshes.append(MeshData(vp, vn, tangents, vt, indices,
                               material=mat_idx, name=mat_name or "obj"))

    return meshes, materials, tex_paths


def _assemble_from_native(path: str, native) -> Tuple[List[MeshData],
                                                      List[Material],
                                                      Dict[int, Dict[str, str]]]:
    """Vectorized mesh assembly over the native parser's flat arrays."""
    P, T, N, tri, tri_mat, mat_names, mtllib = native
    base = os.path.dirname(path)
    mtl_by_name = parse_mtl(os.path.join(base, mtllib)) if mtllib else {}

    materials: List[Material] = []
    tex_paths: Dict[int, Dict[str, str]] = {}
    meshes: List[MeshData] = []
    if len(tri) == 0:
        return meshes, materials or [Material(double_sided=True)], tex_paths

    mat_ids = np.unique(tri_mat)
    for mat_id in mat_ids:
        name = mat_names[mat_id] if 0 <= mat_id < len(mat_names) else "default"
        mat = mtl_by_name.get(name, Material(name=name, double_sided=True))
        out_idx = len(materials)
        materials.append(mat)
        tp = getattr(mat, "_tex_paths", {})
        if tp:
            tex_paths[out_idx] = {k: os.path.join(base, v)
                                  for k, v in tp.items()}

        corners = tri[tri_mat == mat_id].reshape(-1, 3)  # (3F, 3) v/vt/vn
        uniq, inverse = np.unique(corners, axis=0, return_inverse=True)
        vp = P[np.clip(uniq[:, 0], 0, len(P) - 1)]
        vt = np.where(uniq[:, 1:2] >= 0,
                      T[np.clip(uniq[:, 1], 0, max(len(T) - 1, 0))]
                      if len(T) else np.zeros((len(uniq), 2), np.float32),
                      0.0).astype(np.float32)
        vn = np.where(uniq[:, 2:3] >= 0,
                      N[np.clip(uniq[:, 2], 0, max(len(N) - 1, 0))]
                      if len(N) else np.zeros((len(uniq), 3), np.float32),
                      0.0).astype(np.float32)
        indices = inverse.astype(np.int32)
        if np.allclose(vn, 0.0):
            vn = smooth_normals(vp, indices)
        else:
            lens = np.linalg.norm(vn, axis=-1, keepdims=True)
            vn = vn / np.maximum(lens, 1e-8)
        tangents = compute_tangents(vp, vn, vt, indices)
        meshes.append(MeshData(vp, vn, tangents, vt, indices,
                               material=out_idx, name=name))
    return meshes, materials, tex_paths


def smooth_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted smooth normals (Assimp GenSmoothNormals analog)."""
    tri = indices.reshape(-1, 3)
    p0, p1, p2 = positions[tri[:, 0]], positions[tri[:, 1]], positions[tri[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)  # area-weighted
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, tri[:, k], fn)
    lens = np.linalg.norm(out, axis=-1, keepdims=True)
    return (out / np.maximum(lens, 1e-12)).astype(np.float32)
