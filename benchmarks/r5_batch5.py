"""Round-5 TPU batch 5, ONE process.

A. Raster floor body-size ladder (batch 4: idbody probe was DCE-
   confounded; nodma showed DMA ~0.8 of the ~8 ms):
     rk_tinybody_empty/ctl — loop-bound, ~zero-footprint body
     rk_f0body_empty       — one-matmul body
     rk_bodyonce           — FULL body traced ONCE, no loops
     rk_ctl/rk_empty       — anchors
   Decides flattened-grid viability: if bodyonce ~ noloops(4.07) the
   body is cheap without control flow around it.
B. Forward anchors after the has_sky bug fix: fwd_ctl, fwd_tex.
C. Anchor refresh under r5 defaults: base, head, fullg, sponza head.

Run from the repo dir: python benchmarks/r5_batch5.py
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
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI
FWD = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.TAA

data = scenes.stress_scene(num_objects=250).build()


def burst_ms(data_t, flags, path=RenderPathType.HYBRID, k=4, **skw):
    st = RenderSettings(width=W, height=H, path=path, flags=flags, **skw)
    r = Renderer.for_scene(st, data_t)
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
    out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / k


def guard(name, fn):
    try:
        print(json.dumps({"probe": name, "ms": round(fn(), 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


# ---- A: body-size ladder ----
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


timed("rk_tinybody_empty", make_rk("empty", "tinybody"))
timed("rk_tinybody_ctl", make_rk("ctl", "tinybody"))
timed("rk_f0body_empty", make_rk("empty", "f0body"))
timed("rk_bodyonce", make_rk("ctl", "bodyonce"))
timed("rk_ctl_ref", make_rk("ctl", "none"))
timed("rk_empty_ref", make_rk("empty", "none"))

# ---- B: forward after the has_sky fix ----
guard("fwd_ctl_fixed", lambda: burst_ms(data, FWD, RenderPathType.FORWARD))
data_tex = scenes.stress_scene(num_objects=250, textured=True).build()
guard("fwd_tex_fixed", lambda: burst_ms(data_tex, FWD,
                                        RenderPathType.FORWARD))

# ---- C: anchors under r5 defaults ----
guard("base_r5", lambda: burst_ms(data, BASE))
guard("head_r5", lambda: burst_ms(data, HEAD))
guard("fullg_r5", lambda: burst_ms(data, FULL))
data_sp = scenes.stress_scene(num_objects=1100).build()
guard("sponza_head_r5", lambda: burst_ms(data_sp, HEAD))

# ---- D: traversal ceiling data (re-run of batch 4's failed probes) ----
from hybridrenderer_tpu.ops import bvh as bvh_mod  # noqa: E402
from hybridrenderer_tpu.ops import bvh_wide, sampling  # noqa: E402
from hybridrenderer_tpu.ops import image as img_ops  # noqa: E402
from hybridrenderer_tpu.ops import trace_pallas as tp  # noqa: E402

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


def ceiling(name, any_hit, o, d, act, tmax=1e6):
    try:
        out = tp.intersect_wide_direct(
            nodes, leaves, mt, o.reshape(-1, 3), d.reshape(-1, 3),
            1e-3, tmax, any_hit=any_hit, active=act.reshape(-1),
            count_steps=True)
        steps = np.asarray(out[4]).astype(np.int64)
        n_act = int(np.asarray(jnp.sum(act.astype(jnp.int32))))

        @jax.jit
        def loop(oo):
            def body(_, c):
                t, tri, u, v = tp.intersect_wide_direct(
                    nodes, leaves, mt, c, d.reshape(-1, 3), 1e-3, tmax,
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


o_t, _ = img_ops.to_tile_major(o_sh)
d_t, _ = img_ops.to_tile_major(d_sh)
a_t, _ = img_ops.to_tile_major(active)
ceiling("ceil_shadow", True, o_t, d_t, a_t)

d_ao = sampling.interleaved_cos_hemisphere(jnp.uint32(0), n, block=64)
o_p, _ = img_ops.to_pattern_major(o_sh)
d_p, _ = img_ops.to_pattern_major(d_ao)
a_p, _ = img_ops.to_pattern_major(active)
ceiling("ceil_ao", True, o_p, d_p, a_p, tmax=2.0)
print("EXIT=0", flush=True)
