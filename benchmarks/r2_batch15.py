"""Round-2 TPU batch 15, ONE process:

  1. isolated raster kernel eval-mode A/B at 1080p and 64² stress:
     v1 (lane-reduce selects) / v2 (integer-key one-hot picks) /
     v3 (two-matmul: one (P,3)x(3,512) forms dot + one stacked pick)
  2. BASE + headline 1080p rungs with the winning eval mode
     (G-buffer fetch default is now "pixel" after batch 14)
  3. in-frame chunk_steps A/B for the ordered direct kernel:
     headline rung at WIDE_CHUNK_STEPS=8 vs 16 (isolated shadow said
     8 is +11%; AO may disagree)

Run from the repo dir: python - < benchmarks/r2_batch15.py
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


def report(name, val, unit="ms"):
    print(json.dumps({"probe": name, unit: round(val, 2)}), flush=True)


def kernel_ms(W, H, mode):
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
                                            8, 128)

    bins = jax.jit(clip_bin)(wp)
    bins = jax.tree_util.tree_map(jnp.asarray, bins)

    @jax.jit
    def loop(d0):
        def body(_, carry):
            b = dict(bins)
            b["stream_a"] = bins["stream_a"] + carry * 1e-30
            out = raster_pallas.raster_tiles(b, W, H, eval_mode=mode)
            return carry + out.depth[0, 0] * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, d0)

    r = loop(jnp.float32(0.0))
    _ = np.asarray(r)
    t0 = time.perf_counter()
    r = loop(jnp.float32(0.0))
    _ = np.asarray(r)
    return (time.perf_counter() - t0) / ITERS * 1e3


print("=== part 1: raster kernel eval modes ===", flush=True)
results = {}
for W, H, tag in ((1920, 1080, "1080"), (64, 64, "64")):
    for mode in ("v1", "v2", "v3"):
        try:
            ms = kernel_ms(W, H, mode)
            results[(tag, mode)] = ms
            report(f"rk{tag}_{mode}", ms)
        except Exception as e:
            print(json.dumps({"probe": f"rk{tag}_{mode}",
                              "error": repr(e)[:250]}), flush=True)
            time.sleep(120)

best = min((m for (t, m) in results if t == "1080"),
           key=lambda m: results[("1080", m)], default="v1")
print(json.dumps({"winner_eval": best}), flush=True)

print("=== part 2: frame rungs with winner ===", flush=True)
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


os.environ["RASTER_EVAL"] = best
for name, flags, wh in (("base1080_best", BASE, (1920, 1080)),
                        ("base64_best", BASE, (64, 64)),
                        ("headline1080_cs8", HEAD, (1920, 1080))):
    try:
        report(name, frame_ms(RenderSettings(
            width=wh[0], height=wh[1], path=RenderPathType.HYBRID,
            flags=flags)))
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)

print("=== part 3: in-frame chunk_steps 16 (vs 8 above) ===", flush=True)
os.environ["WIDE_CHUNK_STEPS"] = "16"
try:
    report("headline1080_cs16", frame_ms(RenderSettings(
        width=1920, height=1080, path=RenderPathType.HYBRID, flags=HEAD)))
except Exception as e:
    print(json.dumps({"probe": "headline1080_cs16",
                      "error": repr(e)[:250]}), flush=True)
os.environ.pop("WIDE_CHUNK_STEPS")
