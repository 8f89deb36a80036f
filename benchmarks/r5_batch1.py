"""Round-5 TPU batch 1, ONE process.

A. Forward-path DCE ladder (VERDICT r5 task 3 — first-ever forward
   bisect; forward_taa_ms flat at 73 for three rounds):
     fwd_ctl      LIGHT|IBL|TAA          (the bench config, ~73)
     fwd_notaa    LIGHT|IBL              (TAA+jitter delta)
     fwd_noibl    LIGHT|TAA              (2x sample_environment +
                                          fresnel ambient delta)
     fwd_albedo   display=ALBEDO         (PBR+ambient math DCE'd;
                                          raster+gbuffer+sky-bg+TAA)
     base_ref     hybrid BASE            (cross-ref anchor, ~41)
B. Raster floor anatomy under the v4 kernel (VERDICT r5 task 2 — the
   14.5 ms empty-kernel floor's old diagnosis fell with attr16):
     rk_ctl / rk_empty        split walk (r3 batch-8 reproduction)
     rk_m_ctl / rk_m_empty    merged single-loop walk + ONE stream
                              operand (new)
     rk_noloops               probe=noloops: skeleton + carry init +
                              output writes ONLY (no loop constructs,
                              no pix/eval trace)
     rk_nat_ctl / rk_nat_empty  no attr table (48-row records, vis-only
                              output): attr write + attr carry share
     rk_nat_noloops           minimal floor: vis write + 5-row carry
   Decomposition: loops = empty - noloops; attrs = (noloops) -
   (nat_noloops); merged win = empty - m_empty.
C. Frame rungs with the merged walk (if B shows a win): base / headline.

Run from the repo dir: python benchmarks/r5_batch1.py
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
from hybridrenderer_tpu.core.types import (DisplayMode, RenderFlags,
                                           RenderPathType)
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
FWD = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.TAA

data = scenes.stress_scene(num_objects=250).build()


def burst_ms(flags, path=RenderPathType.HYBRID, k=4, **skw):
    st = RenderSettings(width=W, height=H, path=path, flags=flags, **skw)
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


# ---- A: forward ladder ----
guard("fwd_ctl", lambda: burst_ms(FWD, RenderPathType.FORWARD))
guard("fwd_notaa", lambda: burst_ms(
    RenderFlags.LIGHT | RenderFlags.IBL, RenderPathType.FORWARD))
guard("fwd_noibl", lambda: burst_ms(
    RenderFlags.LIGHT | RenderFlags.TAA, RenderPathType.FORWARD))
guard("fwd_albedo", lambda: burst_ms(
    FWD, RenderPathType.FORWARD, display_mode=DisplayMode.ALBEDO))
guard("base_ref", lambda: burst_ms(BASE))

# ---- B: raster floor anatomy ----
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))


def build_bins(with_attrs=True):
    corners = jnp.stack(
        [raster_ops.transform_to_clip(data.triangles.v0, vp),
         raster_ops.transform_to_clip(data.triangles.v1, vp),
         raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
    tris = raster_ops.clip_triangles(
        None, None, None, None, W, H, None,
        data.triangles.single_sided, corners=corners)
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows if with_attrs else None)
    return raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)


bins_at = jax.tree_util.tree_map(
    jnp.asarray, jax.jit(build_bins, static_argnums=0)(True))
bins_nat = jax.tree_util.tree_map(
    jnp.asarray, jax.jit(build_bins, static_argnums=0)(False))


def s(v):
    return jnp.sum(v.astype(jnp.float32) * 1e-9)


def make_rk(bins0, mode, walk, probe="none"):
    b = dict(bins0)
    if mode == "empty":
        b["counts_a"] = jnp.zeros_like(b["counts_a"])
        b["counts_b"] = jnp.zeros_like(b["counts_b"])
        b["n_overflow"] = jnp.zeros_like(b["n_overflow"])

    def step(bump):
        bb = dict(b)
        bb["stream_a"] = b["stream_a"] + bump
        bb["stream_b"] = bb["stream_a"]
        out = raster_pallas.raster_tiles(bb, W, H, walk=walk, probe=probe,
                                         raw=True)
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


timed("rk_ctl", make_rk(bins_at, "ctl", "split"))
timed("rk_empty", make_rk(bins_at, "empty", "split"))
timed("rk_m_ctl", make_rk(bins_at, "ctl", "merged"))
timed("rk_m_empty", make_rk(bins_at, "empty", "merged"))
timed("rk_noloops", make_rk(bins_at, "ctl", "merged", probe="noloops"))
timed("rk_nat_ctl", make_rk(bins_nat, "ctl", "merged"))
timed("rk_nat_empty", make_rk(bins_nat, "empty", "merged"))
timed("rk_nat_noloops", make_rk(bins_nat, "ctl", "merged",
                                probe="noloops"))

# ---- C: frame rungs under the merged walk ----
os.environ["RASTER_WALK"] = "merged"
guard("base_merged", lambda: burst_ms(BASE))
guard("head_merged", lambda: burst_ms(HEAD))
os.environ["RASTER_WALK"] = "split"
guard("base_split", lambda: burst_ms(BASE))
guard("head_split", lambda: burst_ms(HEAD))
del os.environ["RASTER_WALK"]
print("EXIT=0", flush=True)
