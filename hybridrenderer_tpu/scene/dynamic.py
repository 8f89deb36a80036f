"""Dynamic scene updates — per-frame entity-transform re-sync, on-device.

The reference re-syncs instance transforms and rebuilds the TLAS every
frame a transform is dirty (Scene.cpp:148-189 OnUpdate,
ResourceManager.cpp:477-532 SyncInstancesToGPU). TPU-native split:

  * ``build_maps(scene)`` — host, once per scene *topology*: static index
    maps (vertex→instance, per-instance local AABBs, light-CDF slots).
  * ``update_transforms(data, maps, transforms)`` — jitted: new instance
    matrices → new SceneData with recomputed inverse/normal transforms,
    world AABBs, world vertex positions, triangle soup and light CDF.
    prev_transform takes the old current transforms, so G-buffer motion
    vectors (ops/gbuffer.py) see real object motion.
  * acceleration refit is SceneTracer.refit (ops/trace.py) — frozen
    topology, device-only.

Entity-level convenience lives on DynamicScene.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import schema


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DynamicMaps:
    """Static per-topology index maps enabling jitted transform updates."""

    vertex_instance: Any   # (V,) i32 — owning (first) instance per vertex
    local_lo: Any          # (N, 3) f32 per-instance local-space AABB
    local_hi: Any          # (N, 3)
    instance_entity: Any   # (N,) i32 — entity id per instance row
    cdf_tri: Any           # (C,) i32 triangle id per light-CDF slot
    cdf_seg_start: Any     # (C,) i32 slot index of the segment start


def build_maps(scene) -> DynamicMaps:
    """Host-side map build; requires scene.build() to have run."""
    built = getattr(scene, "_built", None)
    if built is None:
        raise ValueError("scene.build() must run before build_maps()")
    rows = built["rows"]
    mesh_voffset = built["mesh_voffset"]

    total_v = sum(m.num_vertices for m in scene.meshes)
    vertex_instance = np.zeros((total_v,), np.int32)
    seen = set()
    for i, (mid, _t, _p) in enumerate(rows):
        if mid in seen:
            continue  # world bake uses the FIRST instance (scene.py
        seen.add(mid)  # _world_positions semantics)
        lo = mesh_voffset[mid]
        vertex_instance[lo:lo + scene.meshes[mid].num_vertices] = i

    n = len(rows)
    local_lo = np.zeros((n, 3), np.float32)
    local_hi = np.zeros((n, 3), np.float32)
    for i, (mid, _t, _p) in enumerate(rows):
        lo, hi = scene.meshes[mid].local_aabb()
        local_lo[i], local_hi[i] = lo, hi

    inst_ent = np.zeros((n,), np.int32)
    k = 0
    for eid, ent in enumerate(scene.entities):
        for _ in ent.mesh_ids:
            inst_ent[k] = eid
            k += 1

    # light-CDF slots (mirrors build_light_table's iteration order)
    t_inst = built["t_inst"]
    cdf_tri_l, seg_start_l = [], []
    for inst_id, (mid, _t, _p) in enumerate(rows):
        mesh = scene.meshes[mid]
        mat = scene.materials[mesh.material]
        if np.linalg.norm(np.asarray(mat.emission)) < 1e-3:
            continue
        tri_ids = np.flatnonzero(t_inst == inst_id)
        if len(tri_ids) == 0:
            continue
        off = sum(len(x) for x in cdf_tri_l)
        seg_start_l.append(np.full(len(tri_ids), off, np.int32))
        cdf_tri_l.append(tri_ids.astype(np.int32))
    if cdf_tri_l:
        cdf_tri = np.concatenate(cdf_tri_l)
        cdf_seg_start = np.concatenate(seg_start_l)
    else:
        cdf_tri = np.zeros((0,), np.int32)
        cdf_seg_start = np.zeros((0,), np.int32)

    return DynamicMaps(
        vertex_instance=jnp.asarray(vertex_instance),
        local_lo=jnp.asarray(local_lo), local_hi=jnp.asarray(local_hi),
        instance_entity=jnp.asarray(inst_ent),
        cdf_tri=jnp.asarray(cdf_tri),
        cdf_seg_start=jnp.asarray(cdf_seg_start))


@jax.jit
def update_transforms(data, maps: DynamicMaps, transforms,
                      prev_transforms: Optional[Any] = None):
    """New per-instance transforms → new SceneData, all on-device.

    ``transforms``: (N, 4, 4) world transforms in instance order.
    ``prev_transforms`` defaults to the data's current transforms (so the
    G-buffer motion math sees one frame of object motion).
    """
    inst = data.instances
    prev = inst.transform if prev_transforms is None else prev_transforms
    tf = jnp.asarray(transforms, jnp.float32)

    inv = jnp.linalg.inv(tf)
    nrm3 = jnp.swapaxes(jnp.linalg.inv(tf[:, :3, :3]), 1, 2)
    n = tf.shape[0]
    nrm4 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
    nrm4 = nrm4.at[:, :3, :3].set(nrm3)

    # world AABBs from the 8 local corners
    combos = np.array([[(c >> a) & 1 for a in range(3)]
                       for c in range(8)], np.float32)   # (8, 3) in {0,1}
    corners = (maps.local_lo[:, None, :] * (1.0 - combos[None])
               + maps.local_hi[:, None, :] * combos[None])   # (N, 8, 3)
    wc = jnp.einsum("nij,nkj->nki", tf[:, :3, :3], corners) \
        + tf[:, None, :3, 3]
    amin = wc.min(axis=1)
    amax = wc.max(axis=1)

    new_inst = dataclasses.replace(
        inst, transform=tf, inverse_transform=inv.astype(jnp.float32),
        normal_transform=nrm4, prev_transform=prev,
        aabb_min=amin, aabb_max=amax)

    # world vertex bake (first-instance semantics, scene._world_positions)
    vt = tf[maps.vertex_instance]
    pos = data.vertices.position
    pw = jnp.einsum("vij,vj->vi", vt[:, :3, :3], pos) + vt[:, :3, 3]
    new_verts = dataclasses.replace(data.vertices, world_position=pw)

    soup = data.triangles
    new_soup = dataclasses.replace(
        soup, v0=pw[soup.i0], v1=pw[soup.i1], v2=pw[soup.i2])

    lights = data.lights
    if maps.cdf_tri.shape[0] > 0 and lights.cdf.shape[0] == \
            maps.cdf_tri.shape[0]:
        a = new_soup.v0[maps.cdf_tri]
        b = new_soup.v1[maps.cdf_tri]
        c = new_soup.v2[maps.cdf_tri]
        areas = 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
        cs = jnp.cumsum(areas)
        base = jnp.where(maps.cdf_seg_start > 0,
                         cs[jnp.maximum(maps.cdf_seg_start - 1, 0)], 0.0)
        lights = dataclasses.replace(lights,
                                     cdf=(cs - base).astype(jnp.float32))

    # pre-joined attribute rows depend on world positions + instance
    # matrices — rebuild (4 T-row gathers, cheap next to the per-pixel
    # gathers they save; see schema.build_attr_rows)
    attr = None if data.attr_rows is None else schema.build_attr_rows(
        new_verts, new_inst, new_soup, data.materials)
    rattr = None if data.raster_rows is None else schema.build_raster_rows(
        new_verts, new_inst, new_soup, data.materials)

    return dataclasses.replace(data, instances=new_inst,
                               vertices=new_verts, triangles=new_soup,
                               lights=lights, attr_rows=attr,
                               raster_rows=rattr)


class DynamicScene:
    """Entity-level dynamic-update controller.

    Wraps a built host Scene + Renderer: set entity transforms, then
    ``commit()`` pushes one on-device update (instances, world geometry,
    light CDF) and refits the renderer's acceleration structure — the
    per-frame Scene::OnUpdate analog.
    """

    def __init__(self, scene, renderer):
        self.scene = scene
        self.renderer = renderer
        self.maps = build_maps(scene)
        rows = scene._built["rows"]
        self._transforms = np.stack([r[1] for r in rows]).astype(np.float32)
        self._dirty = False

    def set_entity_transform(self, entity_id: int, transform):
        ent_of = np.asarray(self.maps.instance_entity)
        m = np.asarray(transform, np.float32)
        self._transforms[ent_of == entity_id] = m
        self.scene.entities[entity_id].transform = m
        self._dirty = True

    def commit(self):
        if not self._dirty:
            return
        r = self.renderer
        new_data = update_transforms(r.scene, self.maps,
                                     jnp.asarray(self._transforms))
        r.scene = new_data
        if r.tracer is not None:
            r.tracer = r.tracer.refit(new_data)
        self._dirty = False
