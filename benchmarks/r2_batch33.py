"""Round-2 TPU batch 33, ONE process: radiance re-attribution, fused
shadow+AO traversal, tile_w=256 raster, half-res radiance frame rung.

Post joins + occlusion gating the full-graph remainder is ~115 ms per
radiance pass (batch 31). Re-run the batch-21 attribution ladder under
the current defaults to locate it (closest-hit vs shade), add the GI
variant (interleaved block-32 directions), probe whether fusing the
shadow and AO traversals into ONE kernel launch helps (both are any-hit
with per-ray tmax; concat is free), sweep raster tile_w 128→256 (the
per-tile-floor lever batch 16 tried on tile_h), and measure the frame
cost of the half-res reflection+GI OPTION under round-end defaults.

  refl_ch / refl_rad      reflection-style ladder (batch-22 landed: ~37 / 99.1)
  gi_ch / gi_rad          interleaved GI (block 32) ladder
  rt_split / rt_fused     shadow+AO as 2 traversal calls vs 1 concat call
  rast_tw128 / rast_tw256 cumulative clip+bin+raster ladder per tile_w
  fullg_ctl / halfres_fullg  frame rungs (control vs reflection+gi half-res)

Run from the repo dir: python - < benchmarks/r2_batch33.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core import maths
from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.graph.params import FrameParams
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas, sampling
from hybridrenderer_tpu.ops.trace import SceneTracer
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 4
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
tracer = SceneTracer.build(data)

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI

settings = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                          flags=BASE)
params = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32),
    frame_index=jnp.uint32(3))


class Ctx:
    pass


ctx = Ctx()
ctx.settings = settings
ctx.params = params

# synthetic G-buffer plane (batch-21 harness, comparable numbers)
yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                  (yy - H / 2) * 0.02], -1)
n_up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos.shape)
view = maths.normalize(wpos - jnp.asarray(list(cam.position)))
refl = maths.reflect(view, n_up)
gi_dir = sampling.interleaved_cos_hemisphere(
    params.frame_index, n_up, block=32, salt=0x7D1E6100)
origin = sampling.offset_ray(wpos, n_up)
sun_dir = maths.normalize(-params.sun_direction)


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def prep(o_img, d_img):
    o, _ = img_ops.to_tile_major(o_img)
    d, _ = img_ops.to_tile_major(d_img)
    return o, d


def timed(name, step):
    @jax.jit
    def loop(z):
        def body(_, carry):
            return carry + step(carry)
        return jax.lax.fori_loop(0, ITERS, body, z)

    try:
        r = loop(jnp.float32(0.0))
        _ = float(r)
        t0 = time.perf_counter()
        r = loop(jnp.float32(0.0))
        _ = float(r)
        report(name, (time.perf_counter() - t0) / ITERS * 1e3)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


# ---- 1. radiance attribution ladders -------------------------------------

def make_ch(dirs):
    def step(bump):
        o, d = prep(origin + bump, dirs)
        t, tri, u, v = tracer._intersect(data, o, d, 0.01, 1e6,
                                         any_hit=False)
        return s(t) + s(tri) + s(u) + s(v)
    return step


def make_rad(dirs):
    def step(bump):
        rgb, dist = tracer.trace_radiance(data, origin + bump, dirs, ctx, 0)
        return s(rgb) + s(dist)
    return step


timed("refl_ch", make_ch(refl))
timed("refl_rad", make_rad(refl))
timed("gi_ch", make_ch(gi_dir))
timed("gi_rad", make_rad(gi_dir))


# ---- 2. fused vs split shadow+AO traversal --------------------------------

ao_dir = sampling.interleaved_cos_hemisphere(
    params.frame_index, n_up, block=32)
SH_TMAX, AO_TMAX = 10000.0, 10.0


def split_step(bump):
    o, dsh = prep(origin + bump, jnp.broadcast_to(sun_dir, wpos.shape))
    _, dao = prep(origin + bump, ao_dir)
    t1, tri1, _, _ = tracer._intersect(data, o, dsh, 0.01, SH_TMAX,
                                       any_hit=True)
    t2, tri2, _, _ = tracer._intersect(data, o, dao, 0.01, AO_TMAX,
                                       any_hit=True)
    return s(tri1) + s(tri2)


def fused_step(bump):
    o, dsh = prep(origin + bump, jnp.broadcast_to(sun_dir, wpos.shape))
    _, dao = prep(origin + bump, ao_dir)
    oc = jnp.concatenate([o, o])
    dc = jnp.concatenate([dsh, dao])
    tm = jnp.concatenate([jnp.full((o.shape[0],), SH_TMAX, jnp.float32),
                          jnp.full((o.shape[0],), AO_TMAX, jnp.float32)])
    t, tri, _, _ = tracer._intersect(data, oc, dc, 0.01, tm, any_hit=True)
    return s(tri)


timed("rt_split", split_step)
timed("rt_fused", fused_step)


# ---- 3. raster tile_w sweep (cumulative DCE-proof ladder) ------------------

vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))


def make_raster(tile_w):
    def step(carry):
        eps = carry * 1e-20
        corners = jnp.stack(
            [raster_ops.transform_to_clip(data.triangles.v0 + eps, vp),
             raster_ops.transform_to_clip(data.triangles.v1, vp),
             raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
        tris = raster_ops.clip_triangles(
            None, None, None, None, W, H, None,
            data.triangles.single_sided, corners=corners)
        packed, bbox, valid = raster_pallas.pack_candidates(
            tris, attr_table=data.raster_rows)
        bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H,
                                            8, tile_w)
        vis, kattrs = raster_pallas.raster_tiles(bins, W, H, tile_h=8,
                                                 tile_w=tile_w)
        acc = sum(s(v) for v in jax.tree_util.tree_leaves(vis))
        return acc + s(kattrs)
    return step


timed("rast_tw128", make_raster(128))
timed("rast_tw256", make_raster(256))


# ---- 4. frame rungs: half-res radiance option ------------------------------

def burst_ms(st, k=4, bursts=1):
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


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


guard("fullg_ctl", lambda: burst_ms(
    RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                   flags=FULL)))
guard("halfres_fullg", lambda: burst_ms(
    RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                   flags=FULL, reflection_half_res=True,
                   gi_half_res=True)))
print("EXIT=0", flush=True)
