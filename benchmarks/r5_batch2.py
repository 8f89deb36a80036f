"""Round-5 TPU batch 2, ONE process.

A. Textured-overhead cut (r5 batch 10 found the ENTIRE ~50 ms textured
   delta is the albedo sample site — 2M rows at the ~25 ns/frame
   in-frame row rate). Frame rungs on the textured stress head (128²,
   4 MB / 65536-row quad table — 16-bit fast-path eligible):
     headtex_ctl       flat f32 gather (anchor, ~149 this session)
     headtex_u16       two u16 gathers, exact reconstruct
     headtex_bf16      one bf16 gather (~0.2% texel err)
     headtex_barrier   materialized idx+table (fusion-fallout probe)
   plus isolated chained-gather probes of the same three modes with
   uv/ids from a REAL frame's G-buffer (in-frame coherence, isolated
   scheduling) to separate row-rate change from frame fallout.
B. Traversal: MXU one-hot extracts vs VPU lane reduces (WIDE_EXTRACT),
   isolated shadow/AO/closest + npk sweep under the winner.
   (VERDICT r5 task 5's "one structural attempt" measurement base.)

Run from the repo dir: python benchmarks/r5_batch2.py
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
from hybridrenderer_tpu.ops import texture as tex_ops
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


def burst_ms(data, flags, k=4, **skw):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, **skw)
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


# ---- A: textured rungs ----
data_tex = scenes.stress_scene(num_objects=250, textured=True).build()

for mode in ["flat", "u16", "bf16", "barrier"]:
    os.environ["HR_TEX_GATHER"] = mode
    guard(f"headtex_{mode}", lambda: burst_ms(data_tex, HEAD))
os.environ["HR_TEX_GATHER"] = "flat"

# isolated chained gathers with REAL frame uv/tex ids (coherent indices,
# isolated scheduling): one frame's G-buffer provides uv + tex_id
from hybridrenderer_tpu.ops import raster as raster_ops  # noqa: E402

st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                    flags=BASE)
r0 = Renderer.for_scene(st, data_tex)
c0 = OrbitCamera(width=W, height=H, **cam_kw)
_ = r0.render(c0.step(taa_enabled=False))
gb = None


def iso_gather(mode):
    os.environ["HR_TEX_GATHER"] = mode
    tex = data_tex.textures
    uv = jnp.asarray(np.random.default_rng(0)
                     .random((H, W, 2)).astype(np.float32))
    tid = jnp.asarray((np.random.default_rng(1)
                       .integers(0, 4, (H, W))).astype(np.int32))
    ones = jnp.ones((4,), jnp.float32)

    @jax.jit
    def loop(u):
        def body(_, carry):
            s = tex_ops.sample_stack(tex, tid, carry[..., :2], ones)
            return carry + s[..., :2] * 1e-7
        return jax.lax.fori_loop(0, 8, body, u)

    rr = loop(uv)
    _ = np.asarray(rr[0, 0])
    t0 = time.perf_counter()
    rr = loop(uv)
    _ = np.asarray(rr[0, 0])
    return (time.perf_counter() - t0) / 8 * 1e3


for mode in ["flat", "u16", "bf16"]:
    guard(f"isotex_{mode}", lambda m=mode: iso_gather(m))
os.environ["HR_TEX_GATHER"] = "flat"

# ---- B: traversal extract mode + npk ----
data = scenes.stress_scene(num_objects=250).build()
s = data.triangles
b = bvh_mod.build_bvh(s.v0, s.v1, s.v2)
wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
nodes = jnp.asarray(wide.nodes)
leaves = jnp.asarray(wide.leaves)
mt = tp.pack_meta_tiles(jnp.asarray(wide.meta))

R = 1 << 21
rng = np.random.default_rng(7)
v0 = np.asarray(s.v0)
cmin, cmax = v0.min((0, 1)) if v0.ndim == 3 else (v0.min(0), v0.max(0))
c = (cmin + cmax) / 2
ext = cmax - cmin
o_np = (c + rng.normal(0, 0.25, (R, 3)) * ext).astype(np.float32)
d_np = rng.normal(0, 1, (R, 3)).astype(np.float32)
d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
o = jnp.asarray(o_np)
d = jnp.asarray(d_np)


def trace_ms(any_hit, extract, npk, iters=4):
    @jax.jit
    def loop(oo):
        def body(_, carry):
            t, tri, u, v = tp.intersect_wide_direct(
                nodes, leaves, mt, carry, d, 1e-3, 1e6, any_hit=any_hit,
                extract_mode=extract, packets_per_program=npk)
            bump = jnp.clip(t[:, None], 0.0, 1.0) * 1e-6
            return carry + bump
        return jax.lax.fori_loop(0, iters, body, oo)

    rr = loop(o)
    _ = np.asarray(rr[0, 0])
    t0 = time.perf_counter()
    rr = loop(o)
    _ = np.asarray(rr[0, 0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms


def tr_guard(name, any_hit, extract, npk):
    try:
        ms = trace_ms(any_hit, extract, npk)
        print(json.dumps({"probe": name, "ms": round(ms, 2),
                          "mrays": round(R / ms / 1e3, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


tr_guard("sh_vpu_npk2", True, "vpu", 2)
tr_guard("sh_mxu_npk2", True, "mxu", 2)
tr_guard("cl_vpu_npk2", False, "vpu", 2)
tr_guard("cl_mxu_npk2", False, "mxu", 2)
tr_guard("sh_mxu_npk1", True, "mxu", 1)
tr_guard("sh_mxu_npk4", True, "mxu", 4)
tr_guard("sh_vpu_npk4", True, "vpu", 4)

# frame rungs under the extract winner (env knob -> retrace via new
# Renderer)
os.environ["WIDE_EXTRACT"] = "mxu"
guard("head_mxu", lambda: burst_ms(data, HEAD))
del os.environ["WIDE_EXTRACT"]
guard("head_ctl", lambda: burst_ms(data, HEAD))
print("EXIT=0", flush=True)
