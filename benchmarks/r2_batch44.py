"""Round-2 TPU batch 44, ONE process: raster 12.4 ms "kernel" rung —
Pallas program floor vs post-kernel XLA relayout attribution.

rk_ctl (12.4, batch 39) times raster_tiles INCLUDING the unflatten /
attr relayout XLA ops. The attr output is (2025, 40, 1024) f32 =
332 MB/frame; its transpose re-reads + rewrites all of it, so the
relayout could be most of the rung. Split it:

  rk_ctl      full raster_tiles (control; expect ~12.4)
  rk_pal      pallas_call outputs only (raw=True) -> Pallas floor
  rk_vis      pallas + vis unflatten, attrs raw   -> vis-relayout cost
  rk_noattr   bins without attr_table (has_attrs=False, raw full)
              -> floor without the 40-plane output volume

(rk_ctl - rk_vis) = attr relayout; (rk_vis - rk_pal) = vis relayout;
rk_pal vs rk_noattr = the attr OUTPUT write volume inside the kernel.

Run from the repo dir: python - < benchmarks/r2_batch44.py
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


def build_bins(attrs=True):
    corners = jnp.stack(
        [raster_ops.transform_to_clip(data.triangles.v0, vp),
         raster_ops.transform_to_clip(data.triangles.v1, vp),
         raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
    tris = raster_ops.clip_triangles(
        None, None, None, None, W, H, None,
        data.triangles.single_sided, corners=corners)
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows if attrs else None)
    return raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)


bins0 = jax.tree_util.tree_map(
    jnp.asarray, jax.jit(lambda: build_bins(True))())
bins_na = jax.tree_util.tree_map(
    jnp.asarray, jax.jit(lambda: build_bins(False))())


def make_step(mode):
    b0 = bins_na if mode == "noattr" else bins0

    def step(bump):
        bb = dict(b0)
        bb["stream_a"] = b0["stream_a"] + bump
        if mode in ("ctl", "noattr"):
            out = raster_pallas.raster_tiles(bb, W, H)
        elif mode == "pal":
            out = raster_pallas.raster_tiles(bb, W, H, raw=True)
        elif mode == "vis":
            outs = raster_pallas.raster_tiles(bb, W, H, raw=True)
            ntx, nty = -(-W // 128), -(-H // 8)

            def unflatten(x):
                img = x.reshape(nty, ntx, 8, 128).transpose(0, 2, 1, 3)
                return img.reshape(nty * 8, ntx * 128)[:H, :W]

            out = [unflatten(outs[0][:, i]) for i in range(4)] + [outs[1]]
        return sum(s(v) for v in jax.tree_util.tree_leaves(out))

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
timed("rk_pal", make_step("pal"))
timed("rk_vis", make_step("vis"))
timed("rk_noattr", make_step("noattr"))
print("EXIT=0", flush=True)
