"""Round-2 TPU batch 43, ONE process: temporal sweep radius 8 vs 4.

The windowed reprojection kernel's (range+1)^2 candidate sweep is the
SVGF chain's biggest block (batch 36: temporal 12.6 of 23). range=4
quarters the sweep (81 -> 25 candidates); quality gate runs separately
(benchmarks/quality_temporal_range.py).

  chain_r8 / chain_r4    isolated full chain (K=1)
  head_r4 / fullg_r4     frame rungs at svgf_temporal_range=4
                         (controls: batch 42 head 122.4 / fullg 344.6)

Run from the repo dir: python - < benchmarks/r2_batch43.py
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

rng_np = np.random.default_rng(0)
sig0 = jnp.asarray(rng_np.random((H, W, 4), dtype=np.float32))
alb = jnp.asarray(rng_np.random((H, W, 3), dtype=np.float32))
mp = jnp.asarray(rng_np.random((H, W, 4), dtype=np.float32) + 0.5)
nrm = jnp.asarray(rng_np.random((H, W, 3), dtype=np.float32))
oid = jnp.zeros((H, W), jnp.int32)
phi = jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32)
hist = svgf_ops.SVGFSignalHistory.create(H, W)


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def make_chain(rng):
    cfg = svgf_ops.SVGFConfig(prefix="p", tile=(32, 384),
                              temporal_range=rng)

    def step(bump):
        out, nh, var = svgf_ops.denoise(
            sig0 + bump, alb, mp, nrm, oid, hist, nrm, mp[..., 2], oid,
            cfg, phi, history_valid=True)
        return s(out) + s(nh.signal) + s(nh.moments) + s(var)

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


timed("chain_r8", make_chain(8))
timed("chain_r4", make_chain(4))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def burst_ms(flags, rng, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, svgf_temporal_range=rng)
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


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


guard("head_r8", lambda: burst_ms(HEAD, 8))
guard("head_r4", lambda: burst_ms(HEAD, 4))
guard("fullg_r4", lambda: burst_ms(FULL, 4, k=4, bursts=1))
print("EXIT=0", flush=True)
