"""Round-2 TPU batch 17, ONE process: tile_h sweep redo (VMEM-limit fix)
+ unified-B binning A/B.

  1. isolated raster kernel at 1080p, tile_h ∈ {8, 16, 24} — batch 16's
     th16/24 died on the 16 MB default scoped-vmem (now explicit)
  2. binning generations at the winning tile_h: OLD (max_rows=16,
     b_cand_cap=16384 → ground plane rides the always-walked class-C
     list) vs NEW (max_rows=nty → class C empty): kernel + clip_bin
  3. BASE + headline 1080p rungs at the winner (new defaults)

Run from the repo dir: python - < benchmarks/r2_batch17.py
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
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
ITERS = 8
W, H = 1920, 1080


def report(name, val, unit="ms"):
    print(json.dumps({"probe": name, unit: round(val, 2)}), flush=True)


def make_bins(tile_h, **bin_kw):
    cam = OrbitCamera(width=W, height=H, **cam_kw)
    st = cam.step()
    vp = jnp.asarray(np.asarray(st.proj) @ np.asarray(st.view))
    wp = data.vertices.world_position

    def clip_bin(wpos):
        clip = raster_ops.transform_to_clip(wpos, vp)
        tris = raster_ops.clip_triangles(
            clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
            W, H, None, data.triangles.single_sided)
        packed, bbox, valid = raster_pallas.pack_candidates(tris)
        return raster_pallas.bin_candidates(packed, bbox, valid, W, H,
                                            tile_h, 128, **bin_kw)

    return clip_bin, wp


def kernel_ms(tile_h, **bin_kw):
    clip_bin, wp = make_bins(tile_h, **bin_kw)
    bins = jax.jit(clip_bin)(wp)
    bins = jax.tree_util.tree_map(jnp.asarray, bins)

    @jax.jit
    def loop(d0):
        def body(_, carry):
            b = dict(bins)
            b["stream_a"] = bins["stream_a"] + carry * 1e-30
            out = raster_pallas.raster_tiles(b, W, H, tile_h=tile_h,
                                             tile_w=128)
            return carry + out.depth[0, 0] * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, d0)

    r = loop(jnp.float32(0.0))
    _ = np.asarray(r)
    t0 = time.perf_counter()
    r = loop(jnp.float32(0.0))
    _ = np.asarray(r)
    return (time.perf_counter() - t0) / ITERS * 1e3


def clipbin_ms(tile_h, **bin_kw):
    clip_bin, wp = make_bins(tile_h, **bin_kw)

    @jax.jit
    def loop(w0):
        def body(_, carry):
            bins = clip_bin(carry)
            return carry + bins["stream_a"][0, 0, 0] * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, w0)

    r = loop(wp)
    _ = np.asarray(r[0, 0])
    t0 = time.perf_counter()
    r = loop(wp)
    _ = np.asarray(r[0, 0])
    return (time.perf_counter() - t0) / ITERS * 1e3


print("=== part 1: tile_h sweep (new binning defaults) ===", flush=True)
results = {}
for th in (8, 16, 24):
    try:
        ms = kernel_ms(th)
        results[th] = ms
        report(f"rk1080_th{th}", ms)
    except Exception as e:
        print(json.dumps({"probe": f"rk1080_th{th}",
                          "error": repr(e)[:250]}), flush=True)
        time.sleep(120)

best = min(results, key=results.get) if results else 8
print(json.dumps({"winner_tile_h": best}), flush=True)

print("=== part 2: binning generations at winner ===", flush=True)
OLD = dict(max_rows=16, b_cand_cap=16384)
for name, kw in (("old", OLD), ("new", {})):
    try:
        report(f"rk_th{best}_bin_{name}", kernel_ms(best, **kw))
        report(f"clipbin_th{best}_{name}", clipbin_ms(best, **kw))
    except Exception as e:
        print(json.dumps({"probe": f"bin_{name}", "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)

print("=== part 3: frame rungs at winner ===", flush=True)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


def frame_ms(settings, frames=8):
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


for name, flags in (("base1080_th%d_new" % best, BASE),
                    ("headline1080_th%d_new" % best, HEAD)):
    try:
        report(name, frame_ms(RenderSettings(
            width=1920, height=1080, path=RenderPathType.HYBRID,
            flags=flags, tile_h=best)))
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)
