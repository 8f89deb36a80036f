"""Round-2 TPU batch 18, ONE process: BASE-rung gap attribution ladder.

base1080 is stable ~127 ms across sessions while the isolated stages
sum to ~55 (clipbin 14.2 + kernel 29.8 + gbuffer 9 + post small).
Three-point ladder, all in-process:

  A. rb    — clip → bin → raster kernel → G-buffer, one fused jit
  B. rbcp  — A + composition (PBR/sky/IBL recombine) + tonemap
  C. base  — the real Renderer BASE rung (graph wrapper, history
             saves, barriers, stats, FrameState copy)

C−B = graph-wrapper cost; B−A = composition+post cost (never isolated
before). Run from the repo dir: python - < benchmarks/r2_batch18.py
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
from hybridrenderer_tpu.graph.params import FrameParams
from hybridrenderer_tpu.ops import composition as comp_ops
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import postprocess as post_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
ITERS = 8
W, H = 1920, 1080
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
settings = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                          flags=BASE)
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))
params = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32),
    frame_index=jnp.uint32(3))


def report(name, val, unit="ms"):
    print(json.dumps({"probe": name, unit: round(val, 2)}), flush=True)


def vis_of(wpos):
    clip = raster_ops.transform_to_clip(wpos, vp)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W, H, None, data.triangles.single_sided)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    return raster_pallas.raster_tiles(bins, W, H)


def timed(name, step):
    wp = data.vertices.world_position

    @jax.jit
    def loop(w0):
        def body(_, carry):
            leaf = step(carry)
            bump = (leaf.astype(jnp.float32).ravel()[0] * 1e-12)
            return carry + bump
        return jax.lax.fori_loop(0, ITERS, body, w0)

    try:
        r = loop(wp)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = loop(wp)
        _ = np.asarray(r[0, 0])
        report(name, (time.perf_counter() - t0) / ITERS * 1e3)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def rb_step(wpos):
    vis = vis_of(wpos)
    gb = gb_ops.build_gbuffer(vis, data, cam)
    return gb.normal


def rbcp_step(wpos):
    vis = vis_of(wpos)
    gb = gb_ops.build_gbuffer(vis, data, cam)
    ones = jnp.ones((H, W, 2), jnp.float32)
    z3 = jnp.zeros((H, W, 3), jnp.float32)
    color = comp_ops.compose(gb, ones, z3, z3, data, cam, settings, params)
    return post_ops.tonemap(color, params.exposure)


print("=== ladder ===", flush=True)
timed("rb1080", rb_step)
timed("rbcp1080", rbcp_step)


def frame_ms(s, frames=8):
    r = Renderer.for_scene(s, data)
    c = OrbitCamera(width=s.width, height=s.height, **cam_kw)
    out = r.render(c.step(taa_enabled=True))
    out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        c.orbit(0.01, 0.0)
        out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


try:
    report("base1080", frame_ms(settings))
except Exception as e:
    print(json.dumps({"probe": "base1080", "error": repr(e)[:250]}),
          flush=True)
