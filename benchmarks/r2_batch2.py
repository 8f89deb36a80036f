"""Round-2 TPU batch 2: dissect the raster rung's in-frame-vs-isolated
gap + measure half-res AO, ONE process.

The round-2 bench breakdown shows the BASE (raster+gbuffer+composition)
rung at ~155 ms while the isolated stages sum to ~74 ms. Candidates for
the gap: (a) per-frame fixed overhead (host transfer + dispatch +
readback pacing), (b) graph-machinery/barrier cost, (c) the math really
being slower when fused into one frame jit. This batch separates them:

  floor64      — full hybrid+SVGF frame at 64x64: per-frame fixed cost
  base1080     — BASE rung via the real Renderer (reference point)
  fused_rg     — clip+bin+raster+gbuffer as ONE chained jit (no graph,
                 no per-frame transfer)
  fused_rgcp   — + composition + postprocess (all the BASE math)
  headline_ao_half — full hybrid+SVGF with ao_half_res=True

Run from the repo dir: python - < benchmarks/r2_batch2.py
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
from hybridrenderer_tpu.graph import passes as gpasses
from hybridrenderer_tpu.graph.params import RS, FrameParams, FrameState
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

W, H = 1920, 1080
FRAMES = 8

SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
HYBRID_FULL = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))


def frame_ms(settings, frames=FRAMES):
    r = Renderer.for_scene(settings, data)
    cam = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)
    out = r.render(cam.step(taa_enabled=True))
    out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        cam.orbit(0.01, 0.0)
        out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


# ---- 1. per-frame fixed overhead: full pipeline at 64x64 ----
s64 = RenderSettings(width=64, height=64, path=RenderPathType.HYBRID,
                     flags=HYBRID_FULL)
report("floor64_hybrid_svgf", frame_ms(s64))

# ---- 2. BASE rung reference point ----
sbase = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                       flags=BASE)
report("base1080_renderer", frame_ms(sbase))

# ---- 3/4. fused math-only jits (no graph, no per-frame transfer) ----
cam = OrbitCamera(width=W, height=H, **cam_kw)
state = cam.step()
vp = jnp.asarray(np.asarray(state.proj) @ np.asarray(state.view))
wp = data.vertices.world_position

ITERS = 8


def timed_chain(name, fn):
    """fn(world_positions) -> image-like; chained through a carry bump."""

    @jax.jit
    def loop(w):
        def body(_, carry):
            out = fn(carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (leaf.astype(jnp.float32).ravel()[0] * 1e-12).astype(
                carry.dtype)
            return carry + bump
        return jax.lax.fori_loop(0, ITERS, body, w)

    r = loop(wp)
    _ = np.asarray(r.ravel()[0])
    t0 = time.perf_counter()
    r = loop(wp)
    _ = np.asarray(r.ravel()[0])
    report(name, (time.perf_counter() - t0) / ITERS * 1e3)


def vis_gbuffer(w):
    clip = raster_ops.transform_to_clip(w, vp)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2, W, H)
    vis = raster_pallas.rasterize_binned(tris, W, H)
    return gb_ops.build_gbuffer(vis, data, state)


timed_chain("fused_rg", lambda w: vis_gbuffer(w).albedo)

comp_fn = gpasses.make_composition_pass(
    sbase, "__none__", "__none__", "__none__", None)[0]
post_fn = gpasses.make_postprocess_pass(sbase, RS.FINAL_COLOR)[0]
params = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0]),
    frame_index=jnp.uint32(3))
ctx = gpasses.FrameContext(
    scene=data, cam=state, params=params, settings=sbase,
    state=FrameState.empty(), history_valid=True,
    shadow_query=None, trace_radiance=None)


def full_math(w):
    gb = vis_gbuffer(w)
    reg = {"_GBuffer": gb}
    reg.update(comp_fn(reg, ctx))
    reg.update(post_fn(reg, ctx))
    return reg[list(reg.keys())[-1]]


timed_chain("fused_rgcp", full_math)

# ---- 5. half-res AO headline ----
sh = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                    flags=HYBRID_FULL, ao_half_res=True)
report("headline_ao_half", frame_ms(sh))

sfull = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                       flags=HYBRID_FULL)
report("headline_ao_full", frame_ms(sfull))
