"""Round-3 TPU batch 6b, ONE process.

Follow-ups to batch 6's A-rungs: the GI-SVGF marginal REPRODUCED
(headG +58.5 vs headR +28.3, config-identical fused chains) — so it is
signal-production-coupled, not chain config. Hypotheses:
  H1 interleaved-GI layout: the block-shared direction signal fuses
     cheaply into composition (broadcast) but SVGF's Pallas temporal
     kernel forces a full materialization + relayout.
  H2 chain cost itself is input-dependent (unlikely — same shapes).
Probes: headG sv/nosv with gi_interleaved=False (random cosine rays are
slower to TRACE but the SVGF marginal should drop to ~refl levels if H1
holds); gi_block=8 (materialization cost should track block size if the
broadcast is the mechanism); isolated denoise_multi K=1/2/3 (fixed
svgf_phi vector) for the K-scaling baseline.

Plus: the refit chain after the tree-height + skip-build_packed fix
(batch 5 measured 57.8 ms/commit before the fix).
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
HEADG = BASE | RenderFlags.SHADOW | RenderFlags.AO | RenderFlags.GI
FULL = (BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
        | RenderFlags.REFLECTION | RenderFlags.GI)


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


def burst_ms(flags, k=2, **skw):
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


# ---- H1/H2: GI-SVGF marginal vs signal production
guard("headG_sv_ctl", lambda: burst_ms(HEADG | SV))
guard("headG_nosv_ctl", lambda: burst_ms(HEADG))
guard("headG_sv_noint", lambda: burst_ms(HEADG | SV, gi_interleaved=False))
guard("headG_nosv_noint", lambda: burst_ms(HEADG, gi_interleaved=False))
guard("headG_sv_b8", lambda: burst_ms(HEADG | SV, gi_block=8))
guard("headG_nosv_b8", lambda: burst_ms(HEADG, gi_block=8))


# ---- isolated denoise_multi K sweep (svgf_phi is a (4,) vector)
def svgf_multi_ms(K, iters=8):
    import jax
    import jax.numpy as jnp
    from hybridrenderer_tpu.ops import svgf as svgf_ops

    phi = jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32)
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
                motion[..., 2], oid, cfgs, phi, history_valid=True)
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


# ---- refit chain after the fix (was 57.8 ms in batch 5)
def refit_ms():
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEADG | SV)
    r = Renderer.for_scene(st, data)
    tr = r.tracer
    report("bvh_height", float(tr.bvh_height))
    tr2 = tr.refit(r.scene)
    _ = np.asarray(tr2.bvh.node_min[0, 0])
    N = 8
    t0 = time.perf_counter()
    for _ in range(N):
        tr2 = tr2.refit(r.scene)
    _ = np.asarray(tr2.bvh.node_min[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / N


guard("refit_full_v2", refit_ms)

# ---- dynamic frame rung under the fix (batch 2: subset 163.9 / static
# 108.5 in that session; same harness shape here)
def dyn_ms(k=4):
    from hybridrenderer_tpu.scene import dynamic
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=BASE | RenderFlags.SHADOW | RenderFlags.AO | SV)
    r = Renderer.for_scene(st, data)
    dyn = dynamic.DynamicScene(host, r)
    c = OrbitCamera(width=W, height=H, **cam_kw)
    eid = len(host.entities) - 1
    base_tf = np.asarray(host.entities[eid].transform, np.float32).copy()

    def one_frame(i):
        tf = base_tf.copy()
        tf[0, 3] += 0.01 * i
        dyn.set_entity_transform(eid, tf)
        dyn.commit()
        return r.render(c.step(taa_enabled=True))

    out = one_frame(0)
    out = one_frame(1)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for i in range(2, 2 + k):
        out = one_frame(i)
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / k


guard("dyn_rung_v2", dyn_ms)
guard("static_ctl", lambda: burst_ms(
    BASE | RenderFlags.SHADOW | RenderFlags.AO | SV, k=4))
print("EXIT=0", flush=True)
