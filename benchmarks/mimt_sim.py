"""Host-side payoff simulation for the MIMT (per-sublane-row stacks)
traversal formulation, BEFORE any Mosaic engineering.

The wide packet kernel's step count per packet is |union of node visits
across its 1024 rays| (one shared stack). A per-row-stack (MIMT) kernel
would take max over the 8 rows of |union across that row's 128 rays|,
at some per-step overhead multiplier for the per-row field extraction.
This sim computes both on the REAL stress scene with the REAL AO ray
distribution (interleaved directions + pattern-major packet layout,
exactly what rt_passes produces) so the speedup ceiling is known before
committing to the (high Mosaic risk) kernel.

Also reports the tile-major layout alternative for AO packets and
shadow rays for reference. Run on CPU: python - < benchmarks/mimt_sim.py
"""
import sys
import os
import time

sys.path.insert(0, os.getcwd())

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.ops import bvh_wide, image as img_ops, sampling
from hybridrenderer_tpu.ops.bvh import build_bvh_host
from hybridrenderer_tpu.ops.trace import SceneTracer, intersect_bvh
from hybridrenderer_tpu.scene import scene as scenes

H = W = 256
data = scenes.stress_scene(num_objects=250).build()
s = data.triangles
b = build_bvh_host(s.v0, s.v1, s.v2)
wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)

nodes = np.asarray(wide.nodes)          # (Tn, 48, 128)
meta = np.asarray(wide.meta)            # (Nw, 2)
Nw = wide.num_wide

# per-node child AABBs + child ids, flat arrays for the sim
child_min = np.zeros((Nw, 8, 3), np.float32)
child_max = np.zeros((Nw, 8, 3), np.float32)
for c in range(8):
    r = 6 * c
    tile = nodes[:, r:r + 6, :]          # (Tn, 6, 128)
    flat = tile.transpose(0, 2, 1).reshape(-1, 6)[:Nw]
    child_min[:, c] = flat[:, 0:3]
    child_max[:, c] = flat[:, 3:6]

ibase = meta[:, 0] >> 8
imask = meta[:, 0] & 255
lbase = meta[:, 1] >> 8
lmask = meta[:, 1] & 255
# child slot c → (is_internal, index): internal rank within imask bits,
# leaf rank within lmask bits
islot_idx = np.full((Nw, 8), -1, np.int64)
lslot_idx = np.full((Nw, 8), -1, np.int64)
for c in range(8):
    bit = 1 << c
    below = bit - 1
    icnt = np.array([bin(m & below).count("1") for m in imask])
    lcnt = np.array([bin(m & below).count("1") for m in lmask])
    has_i = (imask & bit) != 0
    has_l = (lmask & bit) != 0
    islot_idx[:, c] = np.where(has_i, ibase + icnt, -1)
    lslot_idx[:, c] = np.where(has_l, lbase + lcnt, -1)

# ---- camera primary hits → AO origins/normals --------------------------
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

t0 = time.time()
t, tri, u, v = intersect_bvh(b, s.v0, s.v1, s.v2,
                             jnp.asarray(eye + np.zeros_like(d)).reshape(-1, 3),
                             jnp.asarray(d).reshape(-1, 3), 1e-3, 1e6,
                             any_hit=False)
print(f"primary trace {time.time()-t0:.1f}s", flush=True)
t = np.asarray(t).reshape(H, W)
tri_i = np.asarray(tri).reshape(H, W)
hitm = tri_i >= 0
pos = eye + d * t[..., None]
# geometric normals from the hit triangle
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


def packetize(img3, layout):
    flat, _ = (img_ops.to_pattern_major(jnp.asarray(img3))
               if layout == "pattern" else
               img_ops.to_tile_major(jnp.asarray(img3)))
    return np.asarray(flat)


def visit_sets(o, dd, act, tmax):
    """Per-ray wide-node visit sets via vectorized BFS.
    Returns list-of-arrays: internal visits + leaf visits per ray."""
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
        o_f = o[frontier_r]                       # (F, 3)
        inv_f = inv[frontier_r]
        cmin = child_min[frontier_n]              # (F, 8, 3)
        cmax = child_max[frontier_n]
        t0s = (cmin - o_f[:, None]) * inv_f[:, None]
        t1s = (cmax - o_f[:, None]) * inv_f[:, None]
        tn = np.minimum(t0s, t1s).max(-1)
        tf = np.maximum(t0s, t1s).min(-1)
        ok = (tn <= tf) & (tf >= 1e-3) & (tn <= tmax)   # (F, 8)
        ii = islot_idx[frontier_n]                # (F, 8)
        ll = lslot_idx[frontier_n]
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


def packet_costs(name, o_img, d_img, act_img, tmax, layout):
    o_p = packetize(o_img, layout)
    d_p = packetize(d_img, layout)
    a_p = packetize(act_img.astype(np.float32), layout) > 0.5
    t0 = time.time()
    ivis, lvis = visit_sets(o_p, d_p, a_p, tmax)
    R = o_p.shape[0]
    npkt = R // 1024
    shared = mimt = solo = 0
    for p in range(npkt):
        rows_i, rows_l = [], []
        all_i, all_l = set(), set()
        for r in range(8):
            ri = set()
            rl = set()
            for lane in range(128):
                idx = p * 1024 + r * 128 + lane
                ri.update(ivis[idx])
                rl.update(lvis[idx])
            rows_i.append(len(ri))
            rows_l.append(len(rl))
            all_i |= ri
            all_l |= rl
        shared += max(len(all_i), len(all_l))
        mimt += max(max(rows_i), max(rows_l))
        solo += sum(max(len(set(ivis[p * 1024 + k])),
                        len(set(lvis[p * 1024 + k])))
                    for k in range(1024)) / 1024
    print({"config": name, "layout": layout,
           "steps_shared": shared // npkt,
           "steps_mimt": mimt // npkt,
           "steps_1ray_avg": round(solo / npkt, 1),
           "speedup_ceiling": round(shared / max(mimt, 1), 2),
           "sim_s": round(time.time() - t0, 1)}, flush=True)


act = hitm
packet_costs("ao", origin, ao_dir, act, 10.0, "pattern")
packet_costs("ao", origin, ao_dir, act, 10.0, "tile")
sh_dir = np.broadcast_to(sun, origin.shape).copy()
packet_costs("shadow", origin, sh_dir, act, 1e4, "tile")
