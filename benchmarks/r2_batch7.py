"""Round-2 TPU batch 7, ONE process:

  1. SAH-vs-LBVH traversal rates (isolated, 65k stress, 2M rays) —
     host sim predicts 1.3x (shadow) / 1.35x (AO) fewer packet steps,
     1.4/1.7x fewer per-ray visits.
  2. SAH headline: 1080p hybrid with the SAH build (now the default).
  3. Stage-level floor isolation at 64x64: clip_pack_bin / raster
     kernel / gbuffer / svgf / composition as separate chained jits —
     attribute the ~47-50 ms in-executable per-frame floor.

Run from the repo dir: python - < benchmarks/r2_batch7.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.ops import bvh as bvh_mod
from hybridrenderer_tpu.ops import bvh_wide, trace_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
s = data.triangles

R = 1 << 21
n = int(np.sqrt(R))
amin = np.asarray(s.v0).min(0)
amax = np.asarray(s.v0).max(0)
xs = np.linspace(amin[0], amax[0], n, dtype=np.float32)
zs = np.linspace(amin[2], amax[2], n, dtype=np.float32)
X, Z = np.meshgrid(xs, zs)
o = jnp.asarray(np.stack([X, np.full_like(X, amin[1] + 0.1), Z], -1)
                .reshape(-1, 3))
R = o.shape[0]
rng = np.random.default_rng(1)
sun = np.array([0.4, 1.0, 0.3], np.float32)
d_shadow = jnp.asarray(np.broadcast_to(sun / np.linalg.norm(sun), (R, 3)))
d_ao = rng.normal(size=(R, 3)).astype(np.float32)
d_ao[:, 1] = np.abs(d_ao[:, 1])
d_ao /= np.linalg.norm(d_ao, axis=-1, keepdims=True)
d_ao = jnp.asarray(d_ao)

ITERS = 4


def rate(name, w, d, tmax, any_hit):
    nodes = jnp.asarray(w.nodes)
    leaves = jnp.asarray(w.leaves)
    meta = jnp.asarray(w.meta)

    @jax.jit
    def loop(o_in):
        def body(_, carry):
            t, tri, _, _ = trace_pallas.intersect_wide(
                nodes, leaves, meta, carry, d, 1e-3, tmax, any_hit=any_hit)
            bump = jnp.where(jnp.isfinite(t[:1]), t[:1] * 1e-12, 0.0)
            return carry + bump[:, None]
        return jax.lax.fori_loop(0, ITERS, body, o_in)

    r = loop(o)
    _ = np.asarray(r[0, 0])
    t0 = time.perf_counter()
    r = loop(o)
    _ = np.asarray(r[0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"probe": name, "mrays": round(R / dt / 1e6, 2)}),
          flush=True)


print("=== part 1: SAH vs LBVH rates ===", flush=True)
b_l = bvh_mod.build_bvh_host(s.v0, s.v1, s.v2, builder="lbvh")
w_l = bvh_wide.build_wide(b_l, s.v0, s.v1, s.v2)
b_s = bvh_mod.build_bvh_host(s.v0, s.v1, s.v2, builder="sah")
w_s = bvh_wide.build_wide(b_s, s.v0, s.v1, s.v2)
rate("shadow_lbvh", w_l, d_shadow, 1e4, True)
rate("shadow_sah", w_s, d_shadow, 1e4, True)
rate("ao_lbvh", w_l, d_ao, 10.0, True)
rate("ao_sah", w_s, d_ao, 10.0, True)
rate("closest_lbvh", w_l, d_ao, 1e4, False)
rate("closest_sah", w_s, d_ao, 1e4, False)

print("=== part 2: SAH headline (1080p hybrid) ===", flush=True)
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
HYB = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))


def frame_ms(settings, frames=8):
    r = Renderer.for_scene(settings, data)
    cam = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)
    out = r.render(cam.step(taa_enabled=True))
    out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        cam.orbit(0.01, 0.0)
        out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


report("headline_sah", frame_ms(
    RenderSettings(width=1920, height=1080, path=RenderPathType.HYBRID,
                   flags=HYB)))
report("headline_lbvh", frame_ms(
    RenderSettings(width=1920, height=1080, path=RenderPathType.HYBRID,
                   flags=HYB, bvh_builder="lbvh")))

print("=== part 3: 64^2 stage floor ===", flush=True)
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas

W64 = H64 = 64
cam = OrbitCamera(width=W64, height=H64, **cam_kw)
state = cam.step()
vp = jnp.asarray(np.asarray(state.proj) @ np.asarray(state.view))
wp = data.vertices.world_position
SI = 8


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (leaf.astype(jnp.float32).ravel()[0] * 1e-12).astype(
                carry.dtype)
            return carry + bump
        return jax.lax.fori_loop(0, SI, body, a[0])

    r = loop(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    r = loop(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / SI * 1e3
    print(json.dumps({"probe": "stage64_" + name, "ms": round(ms, 2)}),
          flush=True)


def clip_pack_bin(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    return raster_pallas.pack_candidates(tris)[0]


timed("clip_pack_bin", clip_pack_bin, wp, vp)


def clip_only(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    return tris.valid


timed("clip_only", clip_only, wp, vp)


def full_vis(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    return raster_pallas.rasterize_binned(tris, W64, H64).depth


timed("raster_full", full_vis, wp, vp)

vis = None


def vis_and_gbuf(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    v = raster_pallas.rasterize_binned(tris, W64, H64)
    return gb_ops.build_gbuffer(v, data, state).albedo


timed("raster_gbuffer", vis_and_gbuf, wp, vp)
