"""Round-3 TPU batch 9, ONE process.

A. svgf_bits=16 frame A/B (reference RGBA16F parity): bf16 history
   planes + split-window temporal kernel — halves the SVGF history/
   window HBM traffic. Batch-8 reframe: the SVGF'd GI/refl frames are
   nearly EQUAL in absolute terms (~183 svs / ~203 sv) — the "GI
   anomaly" was the cheaper GI baseline; the lever is the absolute
   SVGF byte volume.
B. Raster bin caps: live entries ~50-70k at stress vs cap_a+cap_b
   147k+8k gathered rows — probe tighter caps with the n_dropped
   spill counter as the safety check.
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
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.ops import raster as raster_ops
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

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def report(name, val, **kw):
    print(json.dumps({"probe": name, "ms": round(val, 2), **kw}),
          flush=True)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def burst_ms(flags, k=4, **skw):
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


guard("head_b32", lambda: burst_ms(HEAD))
guard("head_b16", lambda: burst_ms(HEAD, svgf_bits=16))
guard("fullg_b32", lambda: burst_ms(FULL, k=2))
guard("fullg_b16", lambda: burst_ms(FULL, k=2, svgf_bits=16))

# quality spot check: bits16 vs bits32 rendered frame delta (post-
# history frame, same camera) — bound the bf16 quantization visually
def bits_quality():
    outs = {}
    for bits in (32, 16):
        st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                            flags=HEAD, svgf_bits=bits)
        r = Renderer.for_scene(st, data)
        c = OrbitCamera(width=W, height=H, **cam_kw)
        img = None
        for _ in range(4):
            img = r.render(c.step(taa_enabled=True))
            c.orbit(0.01, 0.0)
        outs[bits] = np.asarray(img)
    d = np.abs(outs[16] - outs[32])
    print(json.dumps({"probe": "bits16_err", "mean": float(d.mean()),
                      "max": float(d.max())}), flush=True)


try:
    bits_quality()
except Exception as e:
    print(json.dumps({"probe": "bits16_err", "error": repr(e)[:250]}),
          flush=True)
    time.sleep(120)


# ---- B: bin-cap ladder (clip+pack+bin+raster+gbuffer rung like batch
# 30, default vs tight caps; n_dropped is the safety counter)
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def bin_probe(name, **caps):
    def build(bump):
        corners = jnp.stack(
            [raster_ops.transform_to_clip(data.triangles.v0 + bump, vp),
             raster_ops.transform_to_clip(data.triangles.v1 + bump, vp),
             raster_ops.transform_to_clip(data.triangles.v2 + bump, vp)],
            axis=1)
        tris = raster_ops.clip_triangles(
            None, None, None, None, W, H, None,
            data.triangles.single_sided, corners=corners)
        packed, bbox, valid = raster_pallas.pack_candidates(
            tris, attr_table=data.raster_rows)
        bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H,
                                            8, 128, **caps)
        vis, kattrs = raster_pallas.raster_tiles(bins, W, H)
        acc = sum(s(v) for v in jax.tree_util.tree_leaves(vis))
        return acc + s(kattrs), bins["n_dropped"]

    @jax.jit
    def loop(z):
        def body(_, carry):
            acc, nd = build(carry[0:1].sum() * 1e-9)
            return carry + acc + nd.astype(jnp.float32) * 0.0
        return jax.lax.fori_loop(0, 8, body, z)

    try:
        _, nd = jax.jit(lambda: build(jnp.float32(0.0)))()
        ndv = int(np.asarray(nd))
        r = loop(jnp.zeros((8,), jnp.float32))
        _ = np.asarray(r[0])
        t0 = time.perf_counter()
        r = loop(jnp.zeros((8,), jnp.float32))
        _ = np.asarray(r[0])
        report(name, (time.perf_counter() - t0) / 8 * 1e3, n_dropped=ndv)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


bin_probe("rungs_caps_default")
bin_probe("rungs_caps_tight", cap_a=98304, cap_b=8192)
bin_probe("rungs_caps_vtight", cap_a=65536, cap_b=4096)
print("EXIT=0", flush=True)
