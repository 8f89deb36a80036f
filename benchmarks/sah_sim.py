"""Host-side step-count comparison: LBVH vs binned-SAH trees under the
shared-stack wide packet kernel (steps = per-packet union of node
visits, the same methodology as mimt_sim.py). Predicts the on-chip
traversal gain of switching the static-scene build to SAH before
spending chip time. Run: python - < benchmarks/sah_sim.py"""
import sys
import os
import time

sys.path.insert(0, os.getcwd())

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.ops import bvh_sah, bvh_wide, image as img_ops, sampling
from hybridrenderer_tpu.ops.bvh import build_bvh_host
from hybridrenderer_tpu.ops.trace import intersect_bvh
from hybridrenderer_tpu.scene import scene as scenes

H = W = 256
data = scenes.stress_scene(num_objects=250).build()
s = data.triangles


def tables(wide):
    nodes = np.asarray(wide.nodes)
    meta = np.asarray(wide.meta)
    Nw = wide.num_wide
    child_min = np.zeros((Nw, 8, 3), np.float32)
    child_max = np.zeros((Nw, 8, 3), np.float32)
    for c in range(8):
        r = 6 * c
        flat = nodes[:, r:r + 6, :].transpose(0, 2, 1).reshape(-1, 6)[:Nw]
        child_min[:, c] = flat[:, 0:3]
        child_max[:, c] = flat[:, 3:6]
    ibase = meta[:, 0] >> 8
    imask = meta[:, 0] & 255
    lbase = meta[:, 1] >> 8
    lmask = meta[:, 1] & 255
    islot = np.full((Nw, 8), -1, np.int64)
    lslot = np.full((Nw, 8), -1, np.int64)
    for c in range(8):
        bit = 1 << c
        below = bit - 1
        icnt = np.array([bin(m & below).count("1") for m in imask])
        lcnt = np.array([bin(m & below).count("1") for m in lmask])
        islot[:, c] = np.where((imask & bit) != 0, ibase + icnt, -1)
        lslot[:, c] = np.where((lmask & bit) != 0, lbase + lcnt, -1)
    return child_min, child_max, islot, lslot


def visit_counts(tab, o, dd, act, tmax):
    child_min, child_max, islot, lslot = tab
    R = o.shape[0]
    inv = 1.0 / np.where(np.abs(dd) < 1e-12,
                         np.where(dd < 0, -1e-12, 1e-12), dd)
    ray_ids = np.nonzero(act)[0]
    frontier_r = ray_ids
    frontier_n = np.zeros_like(frontier_r)
    ivis = [[] for _ in range(R)]
    lvis = [[] for _ in range(R)]
    for ri in ray_ids:
        ivis[ri].append(0)
    while len(frontier_r):
        o_f = o[frontier_r]
        inv_f = inv[frontier_r]
        t0s = (child_min[frontier_n] - o_f[:, None]) * inv_f[:, None]
        t1s = (child_max[frontier_n] - o_f[:, None]) * inv_f[:, None]
        tn = np.minimum(t0s, t1s).max(-1)
        tf = np.maximum(t0s, t1s).min(-1)
        ok = (tn <= tf) & (tf >= 1e-3) & (tn <= tmax)
        ii = islot[frontier_n]
        ll = lslot[frontier_n]
        hit_i = ok & (ii >= 0)
        hit_l = ok & (ll >= 0)
        fr, fc = np.nonzero(hit_i)
        for r_, n_ in zip(frontier_r[fr], ii[fr, fc]):
            ivis[r_].append(n_)
        lr, lc = np.nonzero(hit_l)
        for r_, n_ in zip(frontier_r[lr], ll[lr, lc]):
            lvis[r_].append(n_)
        frontier_r = frontier_r[fr]
        frontier_n = ii[fr, fc]
    return ivis, lvis


# camera primary hits (shared between builders)
cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                  focal_point=(0, 2.0, 0))
st = cam.step()
inv_vp = np.linalg.inv(np.asarray(st.proj) @ np.asarray(st.view))
ys = (np.arange(H) + 0.5) / H * 2 - 1
xs = (np.arange(W) + 0.5) / W * 2 - 1
X, Y = np.meshgrid(xs, ys)
ndc = np.stack([X, Y, np.full_like(X, 0.5), np.ones_like(X)], -1)
wp = ndc @ inv_vp.T
wp = wp[..., :3] / wp[..., 3:4]
eye = np.asarray(st.position)[:3]
d = wp - eye
d /= np.linalg.norm(d, axis=-1, keepdims=True)

b_l = build_bvh_host(s.v0, s.v1, s.v2)
t, tri, u, v = intersect_bvh(b_l, s.v0, s.v1, s.v2,
                             jnp.asarray(eye + np.zeros_like(d))
                             .reshape(-1, 3),
                             jnp.asarray(d).reshape(-1, 3), 1e-3, 1e6,
                             any_hit=False)
t = np.asarray(t).reshape(H, W)
tri_i = np.asarray(tri).reshape(H, W)
hitm = tri_i >= 0
pos = eye + d * t[..., None]
v0 = np.asarray(s.v0)[np.maximum(tri_i, 0)]
v1 = np.asarray(s.v1)[np.maximum(tri_i, 0)]
v2 = np.asarray(s.v2)[np.maximum(tri_i, 0)]
n = np.cross(v1 - v0, v2 - v0)
n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
n = np.where((np.sum(n * d, -1, keepdims=True) > 0), -n, n)
ao_dir = np.asarray(sampling.interleaved_cos_hemisphere(
    jnp.uint32(3), jnp.asarray(n)))
origin = pos + n * 1e-3
sun = np.array([0.4, 1.0, 0.3], np.float32)
sun /= np.linalg.norm(sun)


def pk(img3):
    flat, _ = img_ops.to_tile_major(jnp.asarray(img3))
    return np.asarray(flat)


def run(builder_name, bvh):
    wide = bvh_wide.build_wide(bvh, s.v0, s.v1, s.v2)
    tab = tables(wide)
    for cfg, dd, tmax in [("shadow", np.broadcast_to(sun, origin.shape)
                           .copy(), 1e4),
                          ("ao", ao_dir, 10.0)]:
        o_p = pk(origin)
        d_p = pk(dd)
        a_p = pk(hitm.astype(np.float32)[..., None]
                 .repeat(3, -1))[:, 0] > 0.5
        ivis, lvis = visit_counts(tab, o_p, d_p, a_p, tmax)
        npkt = o_p.shape[0] // 1024
        shared = 0
        per_ray = 0.0
        for p in range(npkt):
            ai, al = set(), set()
            for k in range(1024):
                ai.update(ivis[p * 1024 + k])
                al.update(lvis[p * 1024 + k])
            shared += max(len(ai), len(al))
            per_ray += sum(len(ivis[p * 1024 + k]) + len(lvis[p * 1024 + k])
                           for k in range(1024)) / 1024
        print({"builder": builder_name, "cfg": cfg,
               "steps_shared": shared // npkt,
               "visits_per_ray": round(per_ray / npkt, 1)}, flush=True)


t0 = time.time()
run("lbvh", b_l)
b_s = bvh_sah.build_sah(s.v0, s.v1, s.v2)
run("sah", b_s)
print(f"total {time.time()-t0:.0f}s", flush=True)
