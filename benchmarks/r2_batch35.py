"""Round-2 TPU batch 35, ONE process: SVGF stencil tile-size sweep +
shared edge stack.

Batch 34 located ~100 ms of the 384 ms full graph in the 3 SVGF chains
and the mechanism in the stencil kernels: a (th+16, tw+256) halo window
DMA per (th, tw) tile = 4.5x over-fetch at 32x128, plus a full-stack
XLA edge-pad per call. The refactor (stencil_pallas two-window design)
shares ONE pre-padded static edge stack across the moments filter and
all atrous iterations (CSE shares it across the 3 chains) and makes the
tile a parameter. Sweep it:

  chain_32x128 .. chain_96x512   isolated full chain (temporal +
                                 moments + blur + 3 atrous) at 1080p
  head_ctl / head_best           frame rungs, default vs best tile
  fullg_ctl / fullg_best         full graph, default vs best tile

Run from the repo dir: python - < benchmarks/r2_batch35.py
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
from hybridrenderer_tpu.ops import svgf as svgf_ops
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 8
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


# ---- isolated full chain --------------------------------------------------

rng = np.random.default_rng(0)
sig0 = jnp.asarray(rng.random((H, W, 4), dtype=np.float32))
alb = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
mp = jnp.asarray(rng.random((H, W, 4), dtype=np.float32) + 0.5)
nrm = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
oid = jnp.zeros((H, W), jnp.int32)
phi = jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32)
hist = svgf_ops.SVGFSignalHistory.create(H, W)


def make_chain(tile):
    cfg = svgf_ops.SVGFConfig(prefix="p", temporal_enabled=True,
                              spatial_enabled=True, tile=tile)

    def step(bump):
        out, new_hist, var = svgf_ops.denoise(
            sig0 + bump, alb, mp, nrm, oid, hist, nrm, mp[..., 2], oid,
            cfg, phi, history_valid=True)
        return s(out) + s(new_hist.signal) + s(new_hist.moments) + s(var)

    def timed():
        @jax.jit
        def loop(z):
            def body(_, carry):
                return carry + step(carry)
            return jax.lax.fori_loop(0, ITERS, body, z)

        r = loop(jnp.float32(0.0))
        _ = float(r)
        t0 = time.perf_counter()
        r = loop(jnp.float32(0.0))
        _ = float(r)
        return (time.perf_counter() - t0) / ITERS * 1e3

    return timed


chain_ms = {}
for tile in ((32, 128), (32, 384), (64, 256), (64, 512), (96, 512)):
    try:
        chain_ms[tile] = make_chain(tile)()
        report(f"chain_{tile[0]}x{tile[1]}", chain_ms[tile])
    except Exception as e:
        print(json.dumps({"probe": f"chain_{tile[0]}x{tile[1]}",
                          "error": repr(e)[:250]}), flush=True)
        time.sleep(120)


# ---- frame rungs ----------------------------------------------------------

def burst_ms(flags, tile, k=4, bursts=1):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, svgf_tile=tile)
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


BEST = min(chain_ms, key=chain_ms.get) if chain_ms else (64, 512)
print(json.dumps({"probe": "best_tile", "tile": list(BEST)}), flush=True)
guard("head_ctl", lambda: burst_ms(HEAD, None, k=8, bursts=2))
guard("head_best", lambda: burst_ms(HEAD, BEST, k=8, bursts=2))
guard("fullg_ctl", lambda: burst_ms(FULL, None))
guard("fullg_best", lambda: burst_ms(FULL, BEST))
print("EXIT=0", flush=True)
