"""Round-3 TPU batch 7, ONE process: leaf-cluster size ladder
(VERDICT r2 task 2 — closest-hit/incoherent throughput).

leaf_tris 4 (default) vs 8 vs 16 on the 65k stress scene, SAH tree,
ordered direct-stack kernel (cs8/npk2 defaults): bigger clusters halve/
quarter the number of leaf records (fewer pops/pushes/extracts and a
shallower wide tree above them) at the cost of more padded
Moller-Trumbore tests per visit. Isolated fori-chained rungs per ray
type, then headline + full-graph frame rungs at the best size.

Run from the repo dir: python - < benchmarks/r3_batch7.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core import maths
from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.graph.params import FrameParams
from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.ops import sampling
from hybridrenderer_tpu.ops.trace import SceneTracer
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 4
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI

params = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32),
    frame_index=jnp.uint32(3))

yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                  (yy - H / 2) * 0.02], -1)
n_up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos.shape)
view = maths.normalize(wpos - jnp.asarray(list(cam.position)))
refl = maths.reflect(view, n_up)
ao_dir = sampling.interleaved_cos_hemisphere(
    params.frame_index, n_up, block=32, salt=0xA0A0)
origin = sampling.offset_ray(wpos, n_up)
sun_dir = maths.normalize(-params.sun_direction)
sun_img = jnp.broadcast_to(sun_dir, wpos.shape)
NRAYS = W * H


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def prep(o_img, d_img):
    o, _ = img_ops.to_tile_major(o_img)
    d, _ = img_ops.to_tile_major(d_img)
    return o, d


def timed(name, step, mrays=True):
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
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        out = {"probe": name, "ms": round(ms, 2)}
        if mrays:
            out["mrays"] = round(NRAYS / ms / 1e3, 2)
        print(json.dumps(out), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


for lt in (4, 8, 16):
    st = RenderSettings(width=W, height=H, bvh_leaf_tris=lt)
    tracer = SceneTracer.build(data, st)
    print(json.dumps({"info": f"tracer_lt{lt}",
                      "leaves_shape": list(tracer.wide_leaves.shape),
                      "nodes_shape": list(tracer.wide_nodes.shape)}),
          flush=True)

    def mk_shadow(tr):
        def step(bump):
            o, d = prep(origin + bump, sun_img)
            vis = tr.occluded(data, o, d, 1e4)
            return s(vis)
        return step

    def mk_ao(tr):
        def step(bump):
            o, d = prep(origin + bump, ao_dir)
            vis = tr.occluded(data, o, d, 10.0)
            return s(vis)
        return step

    def mk_closest(tr):
        def step(bump):
            o, d = prep(origin + bump, refl)
            t, tri, u, v = tr._intersect(data, o, d, 0.01, 1e6,
                                         any_hit=False)
            return s(t) + s(u)
        return step

    timed(f"shadow_lt{lt}", mk_shadow(tracer))
    timed(f"ao_lt{lt}", mk_ao(tracer))
    timed(f"closest_lt{lt}", mk_closest(tracer))


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


def guard(name, fn):
    try:
        print(json.dumps({"probe": name, "ms": round(fn(), 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


# frame rungs: control + the two bigger cluster sizes ride the same
# in-process session for decision-grade deltas
guard("head_lt4", lambda: burst_ms(HEAD, k=4))
guard("head_lt8", lambda: burst_ms(HEAD, k=4, bvh_leaf_tris=8))
guard("fullg_lt4", lambda: burst_ms(FULL))
guard("fullg_lt8", lambda: burst_ms(FULL, bvh_leaf_tris=8))

# ---- GI-SVGF marginal decomposition (batch 6/6b follow-up): the ~58 ms
# marginal is constant across interleave/block — split it temporal vs
# spatial via the existing flags (chains configure from the flag pair)
HEADG = BASE | RenderFlags.SHADOW | RenderFlags.AO | RenderFlags.GI
HEADR = BASE | RenderFlags.SHADOW | RenderFlags.AO | RenderFlags.REFLECTION
SVT = RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
SVS = RenderFlags.SVGF | RenderFlags.SVGF_SPATIAL
guard("headG_nosv", lambda: burst_ms(HEADG))
guard("headG_svt", lambda: burst_ms(HEADG | SVT))
guard("headG_svs", lambda: burst_ms(HEADG | SVS))
guard("headR_nosv", lambda: burst_ms(HEADR))
guard("headR_svt", lambda: burst_ms(HEADR | SVT))
guard("headR_svs", lambda: burst_ms(HEADR | SVS))
# per-pixel temporal gather (no windowed Pallas sweep): kernel-
# interaction control
guard("headG_sv_pix", lambda: burst_ms(
    HEADG | SVT | RenderFlags.SVGF_SPATIAL,
    svgf_temporal_gather="pixel"))


# chain-order diagnostic inside fullg: does the anomalous marginal
# follow the GI SIGNAL or its POSITION in the fused pack list?
def fullg_order(order):
    os.environ["SVGF_CHAIN_ORDER"] = order
    try:
        return burst_ms(FULL)
    finally:
        os.environ.pop("SVGF_CHAIN_ORDER", None)


guard("fullg_order_ctl", lambda: fullg_order("ShadowAO,Refl,GI"))
guard("fullg_order_gi1", lambda: fullg_order("GI,ShadowAO,Refl"))


# ---- RMQ refit vs the 6b scan number (31.35 ms same-scene) + dynamic
def refit_ms():
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
    r = Renderer.for_scene(st, data)
    tr = r.tracer
    print(json.dumps({"info": "rmq_k", "value": tr.rmq_k}), flush=True)
    tr2 = tr.refit(r.scene)
    _ = np.asarray(tr2.bvh.node_min[0, 0])
    N = 8
    t0 = time.perf_counter()
    for _ in range(N):
        tr2 = tr2.refit(r.scene)
    _ = np.asarray(tr2.bvh.node_min[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / N


def dyn_ms(k=4):
    from hybridrenderer_tpu.scene import dynamic
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
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


guard("refit_rmq", refit_ms)
guard("dyn_rung_rmq", dyn_ms)
print("EXIT=0", flush=True)
