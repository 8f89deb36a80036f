"""Round-2 TPU batch 40, ONE process: tile_w re-sweep under the packed
visibility output.

Batch 39 left the raster kernel at ~6 us/program FIXED cost (empty ==
real). Fewer programs is the remaining lever; the earlier tile_w=256
REJECT (batch 33) was measured under the (P, 1) padding inflation,
which was constant across tile shapes and masked the program-count
effect. Re-sweep kernel ctl/empty at tile_w 128/256/512 + frame rungs
at the winner (settings.tile_w).

Run from the repo dir: python - < benchmarks/r2_batch40.py
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
W, H = 1920, 1080
ITERS = 8
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def build_bins(tile_w):
    corners = jnp.stack(
        [raster_ops.transform_to_clip(data.triangles.v0, vp),
         raster_ops.transform_to_clip(data.triangles.v1, vp),
         raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
    tris = raster_ops.clip_triangles(
        None, None, None, None, W, H, None,
        data.triangles.single_sided, corners=corners)
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows)
    return raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8,
                                        tile_w)


def make_step(tile_w, empty):
    bins = jax.jit(build_bins, static_argnums=0)(tile_w)
    bins = jax.tree_util.tree_map(jnp.asarray, bins)
    b = dict(bins)
    if empty:
        b["counts_a"] = jnp.zeros_like(b["counts_a"])
        b["counts_b"] = jnp.zeros_like(b["counts_b"])
        b["n_overflow"] = jnp.zeros_like(b["n_overflow"])

    def step(bump):
        bb = dict(b)
        bb["stream_a"] = b["stream_a"] + bump
        vis, kattrs = raster_pallas.raster_tiles(bb, W, H, tile_w=tile_w)
        acc = sum(s(v) for v in jax.tree_util.tree_leaves(vis))
        return acc + s(kattrs)

    return step


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
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        report(name, ms)
        return ms
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)
        return 1e9


ctl = {}
for tw in (128, 256, 512):
    ctl[tw] = timed(f"rk{tw}_ctl", make_step(tw, False))
    timed(f"rk{tw}_empty", make_step(tw, True))

BEST = min(ctl, key=ctl.get)
print(json.dumps({"probe": "best_tw", "tile_w": BEST}), flush=True)

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def burst_ms(flags, tile_w, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, tile_w=tile_w)
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


if BEST != 128:
    guard(f"base_tw{BEST}", lambda: burst_ms(BASE, BEST))
    guard(f"head_tw{BEST}", lambda: burst_ms(HEAD, BEST))
    guard(f"fullg_tw{BEST}", lambda: burst_ms(FULL, BEST, k=4, bursts=1))
print("EXIT=0", flush=True)
