"""Round-3 TPU batch 6, ONE process.

Targets (VERDICT r2 tasks 1/6/7 follow-ups from batch 1-5):
  A. GI-SVGF anomalous marginal (batch 1: GI chain +42.4 in-frame vs
     the config-identical reflection chain's +15.3): reproduce the
     four-rung ladder post-u16, then time denoise_multi ISOLATED at
     K=1/2/3 — if K-scaling is linear, the 42 ms was fusion luck.
  B. Refit-chain attribution (batch 5: full refit 57.8 ms/commit =
     ~the whole dynamic residual): refit_bvh / build_packed /
     refit_wide pieces, isolated + fori-chained.
  C. Half-res knobs (VERDICT task 7): re-measure under round-3
     defaults (u16 shade rows); keep or delete.
  D. head_8x256 — the missing cell from the batch-5 tile sweep.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
HEADR = BASE | RenderFlags.SHADOW | RenderFlags.AO | RenderFlags.REFLECTION
HEADG = BASE | RenderFlags.SHADOW | RenderFlags.AO | RenderFlags.GI
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


# ---- A1: the four-rung SVGF-marginal ladder, post-u16 defaults
guard("headR_sv", lambda: burst_ms(HEADR | SV, k=2))
guard("headR_nosv", lambda: burst_ms(HEADR, k=2))
guard("headG_sv", lambda: burst_ms(HEADG | SV, k=2))
guard("headG_nosv", lambda: burst_ms(HEADG, k=2))


# ---- A2: denoise_multi isolated at K=1/2/3 (fori-chained; every input
# plane derives from the loop carry so nothing hoists)
def svgf_multi_ms(K, iters=8):
    import jax
    import jax.numpy as jnp
    from hybridrenderer_tpu.ops import svgf as svgf_ops

    st = RenderSettings(width=W, height=H)
    cfgs = [svgf_ops.SVGFConfig(prefix=f"Sig{i}", tile=(32, 384))
            for i in range(K)]
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    albedo = jax.random.uniform(ks[0], (H, W, 3))
    normal = jax.random.uniform(ks[1], (H, W, 3))
    motion = jnp.concatenate(
        [jax.random.uniform(ks[2], (H, W, 2)) * 0.01,
         jax.random.uniform(ks[3], (H, W, 1)) * 10.0], axis=-1)
    oid = jnp.zeros((H, W), jnp.int32)
    sig0 = jax.random.uniform(ks[4], (H, W, 4))
    hists = [svgf_ops.SVGFSignalHistory(
        signal=jax.random.uniform(ks[5], (H, W, 4)),
        moments=jax.random.uniform(ks[6], (H, W, 4))) for _ in range(K)]

    @jax.jit
    def run(sig0, hists):
        def body(i, carry):
            sig, hs = carry
            sigs = [sig * (1.0 + 1e-6 * j) for j in range(K)]
            res = svgf_ops.denoise_multi(
                sigs, albedo, motion, normal, oid, hs, normal,
                motion[..., 2], oid, cfgs, 1.0, history_valid=True)
            outs = [r[0] for r in res]
            nh = [r[1] for r in res]
            nsig = outs[0]
            for o in outs[1:]:
                nsig = nsig + o * 1e-6
            return (nsig, nh)

        return jax.lax.fori_loop(0, iters, body, (sig0, hists))

    out = run(sig0, hists)
    _ = np.asarray(out[0][0, 0])
    t0 = time.perf_counter()
    out = run(sig0, hists)
    _ = np.asarray(out[0][0, 0])
    return 1000.0 * (time.perf_counter() - t0) / iters


guard("svgf_multi_k1", lambda: svgf_multi_ms(1))
guard("svgf_multi_k2", lambda: svgf_multi_ms(2))
guard("svgf_multi_k3", lambda: svgf_multi_ms(3))


# ---- B: refit-chain piece attribution (65k stress scene)
def refit_pieces():
    import jax
    import jax.numpy as jnp
    from hybridrenderer_tpu.ops import bvh as bvh_ops
    from hybridrenderer_tpu.ops import bvh_wide, trace_pallas

    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
    r = Renderer.for_scene(st, data)
    tr = r.tracer
    soup = r.scene.triangles
    res = {}

    def timed(name, fn, fence):
        out = fn(soup.v0)
        _ = np.asarray(fence(out))
        N = 8
        t0 = time.perf_counter()
        o = soup.v0
        for _i in range(N):
            out = fn(o)
            o = soup.v0 + 0.0 * fence(out)
        _ = np.asarray(fence(out))
        res[name] = round(1000.0 * (time.perf_counter() - t0) / N, 2)

    refit_jit = jax.jit(lambda v0: bvh_ops.refit_bvh(
        tr.bvh, v0, soup.v1, soup.v2))
    timed("refit_bvh", refit_jit, lambda b: b.node_min[0, 0])

    packed_jit = jax.jit(lambda v0: trace_pallas.build_packed(
        tr.bvh, v0, soup.v1, soup.v2))
    timed("build_packed", packed_jit, lambda o: o[0][0, 0, 0])

    was_bf16 = tr.wide_nodes.dtype == jnp.bfloat16

    def wide_fn(v0):
        wn, wl, wnf, wlf = bvh_wide.refit_wide(
            tr.slot_child_bin, tr.cluster_tri,
            tr.bvh.node_min, tr.bvh.node_max, v0, soup.v1, soup.v2)
        if was_bf16:
            wn, wl = bvh_wide.quantize_refit_device(wn, wl)
        return wn

    timed("refit_wide", jax.jit(wide_fn),
          lambda wn: jnp.float32(wn[0, 0]) if was_bf16 else wn[0, 0])
    print(json.dumps({"probe": "refit_pieces", **res,
                      "bf16": bool(was_bf16)}), flush=True)


try:
    refit_pieces()
except Exception as e:
    print(json.dumps({"probe": "refit_pieces", "error": repr(e)[:250]}),
          flush=True)
    time.sleep(120)

# ---- C: half-res knobs under round-3 defaults
guard("head_ctl", lambda: burst_ms(HEAD))
guard("head_aohalf", lambda: burst_ms(HEAD, ao_half_res=True))
guard("fullg_ctl", lambda: burst_ms(FULL, k=2))
guard("fullg_half", lambda: burst_ms(FULL, k=2, reflection_half_res=True,
                                     gi_half_res=True))

# ---- D: the missing tile-sweep cell
guard("head_8x256", lambda: burst_ms(HEAD, tile_h=8, tile_w=256))
print("EXIT=0", flush=True)
