"""Round-2 TPU batch 9, ONE process: 64^2 stage-level floor isolation
(re-run of the probes lost to batch-7's import skew) + renderer-wrapper
overhead probes.

The ~47-50 ms resolution-independent frame floor is NOT dispatch
(burst-invariant), NOT one flag's pass (BASE==+SHADOW==+AO==full at
64²), NOT the pallas raster alone (jnp-raster BASE measures the same).
These probes time each raster-path stage at 64² as separate chained
jits, plus a "renderer minus graph" variant to isolate the frame-fn
wrapper (state plumbing, history saves, stats).

Run from the repo dir: python - < benchmarks/r2_batch9.py
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
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W64 = H64 = 64
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W64, height=H64, **cam_kw)
state = cam.step()
vp = jnp.asarray(np.asarray(state.proj) @ np.asarray(state.view))
wp = data.vertices.world_position
SI = 8


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


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
    report("stage64_" + name, (time.perf_counter() - t0) / SI * 1e3)


print("=== part 1: raster stages at 64^2 ===", flush=True)


def xform_only(wpos, viewproj):
    return raster_ops.transform_to_clip(wpos, viewproj)


timed("transform", xform_only, wp, vp)


def clip_only(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    return tris.valid


timed("clip", clip_only, wp, vp)


def clip_pack_bin(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    return raster_pallas.bin_candidates(packed, bbox, valid, W64, H64,
                                        8, 128)


timed("clip_pack_bin", clip_pack_bin, wp, vp)


def full_vis(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    return raster_pallas.rasterize_binned(tris, W64, H64).depth


timed("raster_full", full_vis, wp, vp)


def vis_and_gbuf(wpos, viewproj):
    clip = raster_ops.transform_to_clip(wpos, viewproj)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W64, H64)
    v = raster_pallas.rasterize_binned(tris, W64, H64)
    return gb_ops.build_gbuffer(v, data, state).albedo


timed("raster_gbuffer", vis_and_gbuf, wp, vp)

print("=== part 2: renderer wrapper at 64^2 ===", flush=True)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE


def frame_ms(settings, frames=16):
    r = Renderer.for_scene(settings, data)
    c = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)
    out = r.render(c.step(taa_enabled=True))
    out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        c.orbit(0.01, 0.0)
        out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


report("base64_renderer", frame_ms(
    RenderSettings(width=64, height=64, path=RenderPathType.HYBRID,
                   flags=BASE)))
# cross-check at 256² and 512²: how does the floor grow?
report("base256_renderer", frame_ms(
    RenderSettings(width=256, height=256, path=RenderPathType.HYBRID,
                   flags=BASE)))
report("base512_renderer", frame_ms(
    RenderSettings(width=512, height=512, path=RenderPathType.HYBRID,
                   flags=BASE)))
