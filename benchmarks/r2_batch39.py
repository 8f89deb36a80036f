"""Round-2 TPU batch 39, ONE process: raster-kernel per-program cost
anatomy.

The tile kernel runs ~2025 programs at ~15 us each at 1080p and has
resisted tile-shape changes (batches 15/16, 33). Split the per-program
cost by forcing synthetic stream counts on the REAL stress-scene bins:

  rk_ctl       control: real bins (kernel-only ladder)
  rk_empty     counts_a/b = 0, novf = 0    → pure grid/program floor
  rk_1blk      counts_a = 8 (ONE block/tile), counts_b/novf = 0
               → floor + one DMA wait + one block eval
  rk_2blk      counts_a = 16               → +1 pipelined block
               (within-tile double buffering hides the 2nd DMA)

(rk_1blk − rk_empty) = unhidden DMA latency + eval; (rk_2blk −
rk_1blk) = marginal pipelined block (eval-bound). If (1blk−empty) >>
(2blk−1blk), cross-tile first-block prefetch is the fix.

Run from the repo dir: python - < benchmarks/r2_batch39.py
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
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 8
cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                  focal_point=(0, 2.0, 0)).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def build_bins():
    corners = jnp.stack(
        [raster_ops.transform_to_clip(data.triangles.v0, vp),
         raster_ops.transform_to_clip(data.triangles.v1, vp),
         raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
    tris = raster_ops.clip_triangles(
        None, None, None, None, W, H, None,
        data.triangles.single_sided, corners=corners)
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows)
    return raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)


bins0 = jax.jit(build_bins)()
bins0 = jax.tree_util.tree_map(jnp.asarray, bins0)


def variant(mode):
    b = dict(bins0)
    if mode == "empty":
        b["counts_a"] = jnp.zeros_like(b["counts_a"])
        b["counts_b"] = jnp.zeros_like(b["counts_b"])
        b["n_overflow"] = jnp.zeros_like(bins0["n_overflow"])
    elif mode in ("1blk", "2blk"):
        n = 8 if mode == "1blk" else 16
        b["starts_a"] = jnp.zeros_like(b["starts_a"])
        b["counts_a"] = jnp.full_like(b["counts_a"], n)
        b["counts_b"] = jnp.zeros_like(b["counts_b"])
        b["n_overflow"] = jnp.zeros_like(bins0["n_overflow"])
    return b


def make_step(mode):
    b = variant(mode)

    def step(bump):
        bb = dict(b)
        bb["stream_a"] = b["stream_a"] + bump
        vis, kattrs = raster_pallas.raster_tiles(bb, W, H)
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
        report(name, (time.perf_counter() - t0) / ITERS * 1e3)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


timed("rk_ctl", make_step("ctl"))
timed("rk_empty", make_step("empty"))
timed("rk_1blk", make_step("1blk"))
timed("rk_2blk", make_step("2blk"))
print("EXIT=0", flush=True)

# frame rungs with the packed (ntiles, 4, P) visibility output
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.renderer import Renderer

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI
FWD = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.TAA


def burst_ms(flags, path=RenderPathType.HYBRID, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=path, flags=flags)
    r = Renderer.for_scene(st, data)
    c = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                    focal_point=(0, 2.0, 0))

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


guard("base1080", lambda: burst_ms(BASE))
guard("head1080", lambda: burst_ms(HEAD))
guard("fwd1080", lambda: burst_ms(FWD, path=RenderPathType.FORWARD))
guard("fullg", lambda: burst_ms(FULL, k=4, bursts=1))
print("EXIT2=0", flush=True)
