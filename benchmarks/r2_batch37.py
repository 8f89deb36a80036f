"""Round-2 TPU batch 37, ONE process: fused 3-signal SVGF A/B.

The hybrid path now runs all active SVGF chains as ONE pass
(make_svgf_multi_pass → denoise_multi → reproject_multi): the temporal
candidate sweep + validation and the window extraction are shared
across signals (they depend only on motion + prev geometry), as is the
stencil edge stack. Equality vs per-signal chains is test-pinned.

  iso_multi3 / iso_single3   isolated: denoise_multi([s1,s2,s3]) vs
                             3 separate denoise() calls (1080p)
  head1080                   headline control (1 chain, K=1 kernel)
  fullg                      full graph (3 chains fused) vs batch-35's
                             371.2 / bench's 363.5 (same code minus
                             fusion)

Run from the repo dir: python - < benchmarks/r2_batch37.py
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
ITERS = 4
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


rng = np.random.default_rng(0)
sigs = [jnp.asarray(rng.random((H, W, 4), dtype=np.float32))
        for _ in range(3)]
alb = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
mp = jnp.asarray(rng.random((H, W, 4), dtype=np.float32) + 0.5)
nrm = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
oid = jnp.zeros((H, W), jnp.int32)
phi = jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32)
hists = [svgf_ops.SVGFSignalHistory(
    signal=jnp.asarray(rng.random((H, W, 4), dtype=np.float32)),
    moments=jnp.asarray(rng.random((H, W, 4), dtype=np.float32)) + 0.5)
    for _ in range(3)]
cfgs = [svgf_ops.SVGFConfig(prefix=f"S{k}", use_albedo_demod=(k > 0))
        for k in range(3)]


def multi_step(bump):
    res = svgf_ops.denoise_multi(
        [s_ + bump for s_ in sigs], alb, mp, nrm, oid, hists, nrm,
        mp[..., 2], oid, cfgs, phi, history_valid=True)
    return sum(s(o) + s(h.signal) + s(h.moments) + s(v) for o, h, v in res)


def single_step(bump):
    acc = jnp.float32(0.0)
    for k in range(3):
        o, h, v = svgf_ops.denoise(
            sigs[k] + bump, alb, mp, nrm, oid, hists[k], nrm, mp[..., 2],
            oid, cfgs[k], phi, history_valid=True)
        acc = acc + s(o) + s(h.signal) + s(h.moments) + s(v)
    return acc


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


def burst_ms(flags, k=4, bursts=1):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags)
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


timed("iso_multi3", multi_step)
timed("iso_single3", single_step)
guard("head1080", lambda: burst_ms(HEAD, k=8, bursts=2))
guard("fullg", lambda: burst_ms(FULL))
print("EXIT=0", flush=True)
