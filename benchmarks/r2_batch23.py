"""Round-2 TPU batch 23, ONE process: pre-joined attr_rows A/B.

Material-row ride-along re-measure: attr_rows grew 68 -> 84 floats
(packed material row joined per instance) so get_material_point and the
alpha paths are gather-free on the joined fetch. Batch-22 baselines in
the PREVIOUS session: rb_join 91.2, rad_join 135.8, base 73.6, head
182.5, fullg 1231 — same rungs here with the wider row:

  rb_join_mat / rad_join_mat   DCE-proof ladder + radiance
  base/head/fullg 1080 _mat    burst frame rungs

Run from the repo dir: python - < benchmarks/r2_batch23.py
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
from hybridrenderer_tpu.core import maths
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.ops import sampling
from hybridrenderer_tpu.ops.trace import SceneTracer
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))
ITERS = 8

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


# --- raster rb rung (batch-20 harness) --------------------------------

def rb_step(wpos):
    clip = raster_ops.transform_to_clip(wpos, vp)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W, H, None, data.triangles.single_sided)
    acc = sum(s(v) for v in (tris.sxy, tris.z, tris.inv_w,
                             tris.bary, tris.tri_id, tris.valid))
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    acc = acc + s(packed) + s(bbox) + s(valid)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    acc = acc + sum(s(v) for v in bins.values())
    vis = raster_pallas.raster_tiles(bins, W, H)
    acc = acc + sum(s(v) for v in jax.tree_util.tree_leaves(vis))
    gb = gb_ops.build_gbuffer(vis, data, cam)
    return acc + sum(s(v) for v in jax.tree_util.tree_leaves(gb))


def rb_ms():
    wp = data.vertices.world_position

    @jax.jit
    def loop(w0):
        def body(_, carry):
            return carry + rb_step(carry)
        return jax.lax.fori_loop(0, ITERS, body, w0)

    r = loop(wp)
    _ = np.asarray(r[0, 0])
    t0 = time.perf_counter()
    r = loop(wp)
    _ = np.asarray(r[0, 0])
    return (time.perf_counter() - t0) / ITERS * 1e3


# --- trace_radiance rung (batch-21 harness) ---------------------------

tracer = SceneTracer.build(data)
settings_rad = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                              flags=BASE)
params_rad = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32),
    frame_index=jnp.uint32(3))


class Ctx:
    pass


ctx = Ctx()
ctx.settings = settings_rad
ctx.params = params_rad

yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos_img = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                      (yy - H / 2) * 0.02], -1)
nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos_img.shape)
view = maths.normalize(wpos_img - jnp.asarray(list(cam.position)))
refl = maths.reflect(view, nrm)
origin_img = sampling.offset_ray(wpos_img, nrm)


def rad_ms():
    @jax.jit
    def loop(z):
        def body(_, carry):
            rgb, dist = tracer.trace_radiance(
                data, origin_img + carry, refl, ctx, 0)
            return carry + s(rgb) + s(dist)
        return jax.lax.fori_loop(0, 4, body, z)

    r = loop(jnp.float32(0.0))
    _ = float(r)
    t0 = time.perf_counter()
    r = loop(jnp.float32(0.0))
    _ = float(r)
    return (time.perf_counter() - t0) / 4 * 1e3


# --- frame rungs -------------------------------------------------------

def burst_ms(flags, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags)
    r = Renderer.for_scene(st, data)
    c = OrbitCamera(width=W, height=H, **cam_kw)

    def steps(n):
        out = []
        for _ in range(n):
            out.append(c.step(taa_enabled=True))
            c.orbit(0.01, 0.0)
        return out

    out = r.render_burst(steps(k))
    out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    t0 = time.perf_counter()
    for _ in range(bursts):
        out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / (bursts * k)


os.environ["GBUFFER_FETCH"] = "auto"
guard("rb_join_mat", rb_ms)

os.environ["SHADE_FETCH"] = "auto"
guard("rad_join_mat", rad_ms)

guard("base1080_mat", lambda: burst_ms(BASE))
guard("head1080_mat", lambda: burst_ms(HEAD))
guard("fullg1080_mat", lambda: burst_ms(FULL, k=4, bursts=1))
print("EXIT=0", flush=True)
