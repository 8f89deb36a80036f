"""Round-2 TPU batch 45, ONE process: transposed raster kernel ("v4").

Batch 44 attribution of the 12.4 ms kernel rung: the post-kernel XLA
relayouts are FREE (rk_ctl 32.5 vs rk_vis 32.5 in a 2.6x-slow session)
and the attr output volume is ~12% (rk_noattr 28.6) — the rest is the
per-program floor batch 38 measured (empty streams == real work). The
floor is (P, 1)-layout fixed work: five (1024, 1) carries are 128 vregs
each (one live lane), re-materialized every loop step, plus (P, 1) pix
construction and the final (P, 1) -> (1, P) MXU transposes.

v4 (_raster_kernel_t) keeps pixels on the LANE dim everywhere: carries
are (1, P) (8 vregs), the winner pick is one (14, BLOCK) x (BLOCK, P)
MXU matmul, the output write is transpose-free. Interpret-equality vs
v1/v2 is test-pinned (test_eval_v4_transposed_matches).

  eq_frac      TPU v4 vs v1 tri-id agreement (expect > 0.995)
  rk_v1/rk_v4  kernel rung (bins precomputed, attrs riding)
  base_v1/base_v4 / head_v1/head_v4   frame rungs

Run from the repo dir: python - < benchmarks/r2_batch45.py
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
    print(json.dumps({"probe": name, "val": val}), flush=True)


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


bins0 = jax.tree_util.tree_map(jnp.asarray, jax.jit(build_bins)())


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def eq_frac():
    v1, _ = raster_pallas.raster_tiles(bins0, W, H, eval_mode="v1")
    v4, _ = raster_pallas.raster_tiles(bins0, W, H, eval_mode="v4")
    return float((np.asarray(v1.tri_id) == np.asarray(v4.tri_id)).mean())


guard("eq_frac", eq_frac)


def make_step(mode):
    def step(bump):
        bb = dict(bins0)
        bb["stream_a"] = bins0["stream_a"] + bump
        out = raster_pallas.raster_tiles(bb, W, H, eval_mode=mode)
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
        report(name, round((time.perf_counter() - t0) / ITERS * 1e3, 2))
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


timed("rk_v1", make_step("v1"))
timed("rk_v4", make_step("v4"))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


def burst_ms(flags, ev, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, raster_eval=ev)
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
    return round(1000.0 * (time.perf_counter() - t0) / (bursts * k), 2)


guard("base_v1", lambda: burst_ms(BASE, "v1"))
guard("base_v4", lambda: burst_ms(BASE, "v4"))
guard("head_v1", lambda: burst_ms(HEAD, "v1"))
guard("head_v4", lambda: burst_ms(HEAD, "v4"))
print("EXIT=0", flush=True)
