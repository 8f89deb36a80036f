"""Round-2 TPU batch 12: raster block-eval v1 vs v2 A/B, ONE process.

  1. isolated raster kernel at 1080p and at 64^2 (v1 vs v2) — batch 9
     put the kernel at ~23 ms even with 8 tiles (record-bound eval)
  2. BASE rung through the renderer with the winning mode

Run from the repo dir: python - < benchmarks/r2_batch12.py
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


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def kernel_ms(W, H, mode):
    cam = OrbitCamera(width=W, height=H, **cam_kw)
    st = cam.step()
    vp = jnp.asarray(np.asarray(st.proj) @ np.asarray(st.view))
    wp = data.vertices.world_position

    def clip_bin(wpos):
        clip = raster_ops.transform_to_clip(wpos, vp)
        tris = raster_ops.clip_triangles(
            clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
            W, H)
        packed, bbox, valid = raster_pallas.pack_candidates(tris)
        return raster_pallas.bin_candidates(packed, bbox, valid, W, H,
                                            8, 128)

    bins = jax.jit(clip_bin)(wp)
    bins = jax.tree_util.tree_map(jnp.asarray, bins)

    def kern(stream_a):
        b = dict(bins)
        b["stream_a"] = stream_a
        return raster_pallas.raster_tiles(b, W, H, eval_mode=mode).depth

    @jax.jit
    def loop(sa):
        def body(_, carry):
            out = kern(carry)
            bump = (out.ravel()[0] * 1e-12).astype(carry.dtype)
            return carry + bump
        return jax.lax.fori_loop(0, ITERS, body, sa)

    r = loop(bins["stream_a"])
    _ = np.asarray(r.ravel()[0])
    t0 = time.perf_counter()
    r = loop(bins["stream_a"])
    _ = np.asarray(r.ravel()[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


print("=== part 1: kernel v1 vs v2 ===", flush=True)
for W, H, tag in [(1920, 1080, "1080p"), (64, 64, "64")]:
    for mode in ("v1", "v2"):
        try:
            report(f"kernel_{tag}_{mode}", kernel_ms(W, H, mode))
        except Exception as e:
            print(json.dumps({"probe": f"kernel_{tag}_{mode}",
                              "error": repr(e)[:250]}), flush=True)
            time.sleep(120)

print("=== part 2: BASE rung with v2 ===", flush=True)
os.environ["RASTER_EVAL"] = "v2"
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE


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


try:
    report("base1080_v2", frame_ms(
        RenderSettings(width=1920, height=1080, path=RenderPathType.HYBRID,
                       flags=BASE)))
except Exception as e:
    print(json.dumps({"probe": "base1080_v2", "error": repr(e)[:250]}),
          flush=True)
