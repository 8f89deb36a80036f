"""Round-5 TPU batch 4, ONE process.

A. Raster loop-floor discriminators (r5 batch 1/3: the ~8 ms zero-trip
   loop cost is per-TILE, invariant to loop merging AND to program
   packing):
     rk_idbody_empty/ctl — loops present, identity body, no DMA trace:
                           prices bare loop+carry machinery
     rk_nodma_ctl/empty  — real eval, DMA machinery removed
B. Group-window texture sampler in-frame (HR_TEX_SAMPLER=window):
     headtex_win vs headtex_quad + a one-frame quality diff
     (quad-vs-window max/mean u8 error, device-side).
C. Traversal ceiling data: REAL frame shadow/AO rays (G-buffer
   world_pos + sun dir / cosine AO), step counts via count_steps=True
   + timed run without: ns/step, steps/ray, active Mrays/s.

Run from the repo dir: python benchmarks/r5_batch4.py
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
from hybridrenderer_tpu.ops import bvh as bvh_mod
from hybridrenderer_tpu.ops import bvh_wide
from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas, sampling
from hybridrenderer_tpu.ops import trace_pallas as tp
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes


def chip_health(max_waits=6):
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def mm(x):
        def body(_, c):
            return c @ c * 1e-9 + a
        return jax.lax.fori_loop(0, 8, body, x)

    for attempt in range(max_waits):
        r = mm(a)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = mm(a)
        _ = np.asarray(r[0, 0])
        ms = (time.perf_counter() - t0) * 1e3
        print(json.dumps({"info": "chip_health_ms", "value": round(ms, 1),
                          "attempt": attempt}), flush=True)
        if ms < 60.0:
            return
        time.sleep(600)


chip_health()

W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV

data = scenes.stress_scene(num_objects=250).build()


def guard(name, fn):
    try:
        r = fn()
        if isinstance(r, dict):
            print(json.dumps(dict(probe=name, **r)), flush=True)
        else:
            print(json.dumps({"probe": name, "ms": round(r, 2)}),
                  flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


# ---- A: floor discriminators ----
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))


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


def s(v):
    return jnp.sum(v.astype(jnp.float32) * 1e-9)


def make_rk(mode, probe):
    b = dict(bins0)
    if mode == "empty":
        b["counts_a"] = jnp.zeros_like(b["counts_a"])
        b["counts_b"] = jnp.zeros_like(b["counts_b"])
        b["n_overflow"] = jnp.zeros_like(b["n_overflow"])

    def step(bump):
        bb = dict(b)
        bb["stream_a"] = b["stream_a"] + bump
        bb["stream_b"] = bb["stream_a"]
        out = raster_pallas.raster_tiles(bb, W, H, raw=True, probe=probe)
        return sum(s(v) for v in out)

    return step


def timed(name, step):
    @jax.jit
    def loop(z):
        def body(_, carry):
            return carry + step(carry)
        return jax.lax.fori_loop(0, 8, body, z)

    try:
        r = loop(jnp.float32(0.0))
        _ = float(r)
        t0 = time.perf_counter()
        r = loop(jnp.float32(0.0))
        _ = float(r)
        print(json.dumps({"probe": name,
                          "ms": round((time.perf_counter() - t0) / 8 * 1e3,
                                      2)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


timed("rk_idbody_empty", make_rk("empty", "idbody"))
timed("rk_idbody_ctl", make_rk("ctl", "idbody"))
timed("rk_nodma_empty", make_rk("empty", "nodma"))
timed("rk_nodma_ctl", make_rk("ctl", "nodma"))
timed("rk_ctl_ref", make_rk("ctl", "none"))
timed("rk_empty_ref", make_rk("empty", "none"))

# ---- B: window sampler in-frame + quality ----
os.environ["HR_TEX_SAMPLER"] = "window"
data_tex_w = scenes.stress_scene(num_objects=250, textured=True).build()
del os.environ["HR_TEX_SAMPLER"]
data_tex_q = scenes.stress_scene(num_objects=250, textured=True).build()


def burst_tex(data_t, flags):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags)
    r = Renderer.for_scene(st, data_t)
    c = OrbitCamera(width=W, height=H, **cam_kw)
    rows = [c.step(taa_enabled=True) for _ in range(4)]
    out = r.render_burst(rows)
    out = r.render_burst(rows)
    _ = np.asarray(out[-1, 0, 0])
    t0 = time.perf_counter()
    out = r.render_burst(rows)
    _ = np.asarray(out[-1, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / 4


guard("headtex_win", lambda: burst_tex(data_tex_w, HEAD))
guard("headtex_quad", lambda: burst_tex(data_tex_q, HEAD))


def tex_quality():
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=BASE)
    c = OrbitCamera(width=W, height=H, **cam_kw)
    row = c.step(taa_enabled=False)
    imgs = []
    for dt in (data_tex_w, data_tex_q):
        r = Renderer.for_scene(st, dt)
        imgs.append(np.asarray(r.render(row)))
    d = np.abs(imgs[0].astype(np.float64) - imgs[1].astype(np.float64))
    d8 = d * 255.0
    return dict(max_u8=round(float(d8.max()), 2),
                mean_u8=round(float(d8.mean()), 4),
                p99_u8=round(float(np.percentile(d8, 99)), 2))


guard("texwin_quality", tex_quality)

# ---- C: traversal ceiling data on REAL frame rays ----
s_tri = data.triangles
b = bvh_mod.build_bvh(s_tri.v0, s_tri.v1, s_tri.v2)
wide = bvh_wide.build_wide(b, s_tri.v0, s_tri.v1, s_tri.v2)
nodes = jnp.asarray(wide.nodes)
leaves = jnp.asarray(wide.leaves)
mt = tp.pack_meta_tiles(jnp.asarray(wide.meta))


@jax.jit
def frame_rays():
    corners = jnp.stack(
        [raster_ops.transform_to_clip(data.triangles.v0, vp),
         raster_ops.transform_to_clip(data.triangles.v1, vp),
         raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
    tris = raster_ops.clip_triangles(
        None, None, None, None, W, H, None,
        data.triangles.single_sided, corners=corners)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    vis = raster_pallas.raster_tiles(bins, W, H)
    tri = jnp.maximum(vis.tri_id, 0)
    b1 = vis.bary1[..., None]
    b2 = vis.bary2[..., None]
    p0 = data.triangles.v0[tri]
    p1 = data.triangles.v1[tri]
    p2 = data.triangles.v2[tri]
    wp = p0 * (1 - b1 - b2) + p1 * b1 + p2 * b2
    n = jnp.cross(p1 - p0, p2 - p0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    active = vis.tri_id >= 0
    return wp, n, active


wp, n, active = frame_rays()
sun = jnp.asarray([0.4, 1.0, 0.3], jnp.float32)
sun = sun / jnp.linalg.norm(sun)
d_sh = jnp.broadcast_to(sun, wp.shape)
o_sh = wp + n * 1e-3

o_t, _ = img_ops.to_tile_major(o_sh)
d_t, _ = img_ops.to_tile_major(d_sh)
a_t, _ = img_ops.to_tile_major(active)


def ceiling(name, any_hit, o, d, act):
    try:
        out = tp.intersect_wide_direct(
            nodes, leaves, mt, o.reshape(-1, 3), d.reshape(-1, 3),
            1e-3, 1e6, any_hit=any_hit, active=act.reshape(-1),
            count_steps=True)
        steps = np.asarray(out[4]).astype(np.int64)
        n_act = int(np.asarray(jnp.sum(act.astype(jnp.int32))))

        @jax.jit
        def loop(oo):
            def body(_, c):
                t, tri, u, v = tp.intersect_wide_direct(
                    nodes, leaves, mt, c, d.reshape(-1, 3), 1e-3, 1e6,
                    any_hit=any_hit, active=act.reshape(-1))
                return c + jnp.clip(t[:, None], 0.0, 1.0) * 1e-6
            return jax.lax.fori_loop(0, 4, body, oo)

        r = loop(o.reshape(-1, 3))
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = loop(o.reshape(-1, 3))
        _ = np.asarray(r[0, 0])
        ms = (time.perf_counter() - t0) / 4 * 1e3
        tot = int(steps.sum())
        print(json.dumps({
            "probe": name, "ms": round(ms, 2),
            "steps_total": tot,
            "steps_mean": round(float(steps.mean()), 1),
            "steps_max": int(steps.max()),
            "active": n_act,
            "mrays_active": round(n_act / ms / 1e3, 1),
            "ns_per_step_program": round(ms * 1e6 / max(tot, 1), 1)}),
            flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


ceiling("ceil_shadow", True, o_t, d_t, a_t)

# AO rays (interleaved cosine, pattern-major like the AO pass)
d_ao = sampling.interleaved_cos_hemisphere(jnp.uint32(0), n, block=64)
o_p, _ = img_ops.to_pattern_major(o_sh)
d_p, _ = img_ops.to_pattern_major(d_ao)
a_p, _ = img_ops.to_pattern_major(active)
ceiling("ceil_ao", True, o_p, d_p, a_p)
print("EXIT=0", flush=True)
