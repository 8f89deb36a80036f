"""Deferred G-buffer construction from the visibility buffer.

Computes exactly the reference's MRT planes (gbuffer.frag:25-67):
  albedo rgb (+ ∂lin-z/∂y), world normal, material params
  (roughness², metallic, ao, type/255), ObjectID, motion
  (uv-motion, linear depth, ∂lin-z/∂x), emissive, reversed-Z depth.

Where the reference's fragment shader gets attributes from the raster
interpolators and gradients from dFdx/dFdy, we gather vertex data with
the visibility buffer's perspective-correct barycentrics and take
neighbor differences of the linear-depth image — the deferred analog.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core import maths
from . import shade
from .raster import VisibilityBuffer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GBuffer:
    albedo: Any          # (H, W, 3)
    normal: Any          # (H, W, 3) world space
    material: Any        # (H, W, 4) roughness², metallic, ao, type/255
    object_id: Any       # (H, W) i32, -1 background
    motion: Any          # (H, W, 2) uv-space motion (cur - prev)
    linear_depth: Any    # (H, W) view-space |z|
    depth_grad: Any      # (H, W, 2) (∂lin-z/∂x, ∂lin-z/∂y)
    emissive: Any        # (H, W, 3)
    depth: Any           # (H, W) reversed-Z NDC
    world_pos: Any       # (H, W, 3)
    uv: Any              # (H, W, 2) surface uv (for debug/alpha passes)

    @property
    def background(self):
        return self.object_id < 0

    def motion_plane(self):
        """The reference's Motion RT layout: (motion.xy, linZ, dzdx)."""
        return jnp.concatenate(
            [self.motion, self.linear_depth[..., None],
             self.depth_grad[..., 0:1]], axis=-1)


def linearize_depth(depth, proj_inverse):
    """gbuffer.frag LinearizeDepth: |(P⁻¹·(0,0,d,1)).z / w|."""
    z = proj_inverse[2, 2] * depth + proj_inverse[2, 3]
    w = proj_inverse[3, 2] * depth + proj_inverse[3, 3]
    return jnp.abs(z / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w))


def screen_gradients(img):
    """dFdx/dFdy analog: forward difference clamped at borders."""
    dx = jnp.diff(img, axis=1, append=img[:, -1:])
    dy = jnp.diff(img, axis=0, append=img[-1:, :])
    return dx, dy


def build_gbuffer(vis: VisibilityBuffer, scene, cam) -> GBuffer:
    """Visibility buffer + scene + camera → full G-buffer."""
    H, W = vis.depth.shape
    tri = jnp.maximum(vis.tri_id, 0)
    bg = vis.tri_id < 0
    b1, b2 = vis.bary1, vis.bary2
    b0 = 1.0 - b1 - b2

    soup = scene.triangles
    inst_id = soup.instance[tri]                    # (H, W)
    i0, i1, i2 = soup.i0[tri], soup.i1[tri], soup.i2[tri]

    def interp(attr):
        return (attr[i0] * b0[..., None] + attr[i1] * b1[..., None]
                + attr[i2] * b2[..., None])

    # world position from the baked world-space soup (exact, no depth
    # reconstruction error)
    world_pos = (soup.v0[tri] * b0[..., None] + soup.v1[tri] * b1[..., None]
                 + soup.v2[tri] * b2[..., None])

    verts = scene.vertices
    uv = (verts.uv[i0] * b0[..., None] + verts.uv[i1] * b1[..., None]
          + verts.uv[i2] * b2[..., None])
    local_n = interp(verts.normal)
    local_t = (verts.tangent[i0] * b0[..., None] + verts.tangent[i1] * b1[..., None]
               + verts.tangent[i2] * b2[..., None])
    local_pos = interp(verts.position)

    # normal transform per pixel (gbuffer.vert:27-29)
    nmat = scene.instances.normal_transform[inst_id][..., :3, :3]  # (H,W,3,3)
    world_n = maths.normalize(jnp.einsum("...ij,...j->...i", nmat, local_n))
    world_t3 = maths.normalize(jnp.einsum("...ij,...j->...i", nmat, local_t[..., :3]))
    world_t = jnp.concatenate([world_t3, local_t[..., 3:4]], axis=-1)

    # material point + normal mapping
    mat_id = scene.instances.material[inst_id]
    mp = shade.get_material_point(scene.materials, mat_id, uv, scene.textures)
    shading_n = shade.apply_normal_map(
        scene.materials, mat_id, world_n, world_t, uv, scene.textures)

    # motion vectors (gbuffer.frag:56-63): unjittered cur/prev clip pos
    vp = cam.proj @ cam.view
    prev_vp = cam.prev_proj @ cam.prev_view
    cur_clip = maths.transform_point_h(vp, world_pos)
    prev_tf = scene.instances.prev_transform[inst_id]
    prev_world = jnp.einsum("...ij,...j->...i", prev_tf[..., :3, :3], local_pos) \
        + prev_tf[..., :3, 3]
    prev_clip = maths.transform_point_h(prev_vp, prev_world)

    def to_uv(clip):
        w = clip[..., 3]
        w = jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
        return clip[..., :2] / w[..., None] * 0.5 + 0.5

    motion = to_uv(cur_clip) - to_uv(prev_clip)

    lin_depth = linearize_depth(vis.depth, cam.proj_inverse)
    lin_depth = jnp.where(bg, 0.0, lin_depth)
    dzdx, dzdy = screen_gradients(lin_depth)

    z3 = jnp.zeros((H, W, 3), jnp.float32)
    shading_model = mp.material_type.astype(jnp.float32) / 255.0
    material_plane = jnp.stack(
        [mp.roughness, mp.metallic, jnp.ones_like(mp.roughness), shading_model],
        axis=-1)

    mask3 = (~bg)[..., None]
    return GBuffer(
        albedo=jnp.where(mask3, mp.colour, z3),
        normal=jnp.where(mask3, shading_n, z3),
        material=jnp.where(mask3, material_plane, jnp.zeros_like(material_plane)),
        object_id=jnp.where(bg, -1, inst_id),
        motion=jnp.where(mask3[..., :2], motion, 0.0),
        linear_depth=lin_depth,
        depth_grad=jnp.where(mask3[..., :2], jnp.stack([dzdx, dzdy], -1), 0.0),
        emissive=jnp.where(mask3, mp.emission, z3),
        depth=vis.depth,
        world_pos=jnp.where(mask3, world_pos, z3),
        uv=jnp.where(mask3[..., :2], uv, 0.0),
    )
