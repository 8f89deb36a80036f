"""Packet BVH traversal — the Pallas ray-tracing kernel.

The ray-query replacement for TPU hardware reality: per-lane pointer
chasing is hostile to the VPU, so rays are traced in *packets* of
8×128 = 1024 lanes sharing one traversal stack (classic coherent packet
traversal, mapped to TPU):

  * the packet pops one node id at a time (scalar SMEM stack),
  * the node's record — BOTH children's AABBs + child ids inlined — is
    one dynamic (16, 128)-tile VMEM read; fields come out with a shared
    lane-one-hot reduction (Mosaic supports reduce→scalar→index),
  * both child boxes are slab-tested against all 1024 lanes in vector
    ops; a child is pushed if ANY lane hits (near child popped first by
    mean entry distance),
  * leaf records embed their triangle (v0, e1, e2, id) — the leaf pop
    runs one packet-wide Möller–Trumbore test, no separate triangle pool.

Node/leaf records are packed 128-per-tile (field rows × node lanes), so
the whole acceleration structure is two VMEM-resident arrays
(64 B/internal + 64 B/leaf). Scenes beyond the VMEM budget fall back to
the jnp traversal (ops/trace.py); the HBM-treelet path is future work.
``any_hit`` packets terminate once every lane is occluded
(gl_RayFlagsTerminateOnFirstHitEXT semantics).

Contract matches ops/trace.intersect_bvh: (t, tri, u, v), tri = -1 miss.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import BVH

PACKET_ROWS = 8
PACKET_COLS = 128
PACKET = PACKET_ROWS * PACKET_COLS
STACK_DEPTH = 96
TRI_EPS = 1e-9
CHUNK_STEPS = 64   # traversal steps per while-loop iteration

# VMEM budget for the resident packed BVH (bytes): 64 B per internal node
# + 64 B per leaf. v5e has 128 MB of VMEM; the kernel's other consumers
# (ray blocks, outputs, unrolled-body temporaries) need < 24 MB, so the
# packed scene can take ~96 MB before we must fall back. The default
# scoped-vmem budget is only 16 MB — intersect_* raise it explicitly via
# CompilerParams(vmem_limit_bytes).
VMEM_SCENE_BUDGET = 96 * 1024 * 1024


def _vmem_limit(*arrs) -> int:
    """Scoped-VMEM limit for a traversal call: resident scene + margin."""
    scene = sum(int(a.size) * a.dtype.itemsize for a in arrs)
    return min(scene + 24 * 1024 * 1024, 127 * 1024 * 1024)

# internal record field rows
_I_LMIN = 0   # 0-2  left child aabb min
_I_LMAX = 3   # 3-5  left child aabb max
_I_RMIN = 6   # 6-8  right child aabb min
_I_RMAX = 9   # 9-11 right child aabb max
_I_LEFT = 12  # encoded left child id
_I_RIGHT = 13  # encoded right child id
# leaf record field rows: 0-2 v0, 3-5 e1, 6-8 e2, 9 tri id


def fits_vmem(num_tris: int) -> bool:
    return num_tris * 128 < VMEM_SCENE_BUDGET  # 64B/leaf + 64B/internal


def fits_vmem_wide(num_tris: int) -> bool:
    """Optimistic gate for the wide-record path: ~56 B/tri as f32
    records (4-tri leaf clusters), ~28 B/tri after bf16 quantization.
    The exact keep/quantize/fall-back decision happens after build_wide
    against the actual packed-array sizes (SceneTracer.build)."""
    return num_tris * 28 < VMEM_SCENE_BUDGET


def _pack_rows(rows):
    """(N, 16) field matrix → (ceil(N/128), 16, 128) tile layout."""
    n = rows.shape[0]
    pad = (-n) % 128
    rows = jnp.pad(rows, ((0, max(pad, 0)), (0, 0)))
    return rows.reshape(-1, 128, 16).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=())
def build_packed(bvh: BVH, tri_v0, tri_v1, tri_v2):
    """BVH + triangles → (internal_tiles, leaf_tiles) packed arrays.

    Child encoding: >= 0 → internal node id; < 0 → leaf id -(k+1).
    """
    T = tri_v0.shape[0]
    n_internal = max(T - 1, 1)

    def encode(child):
        # bvh child node ids: internal < T-1, leaf = (T-1)+k
        is_leaf = child >= (T - 1)
        leaf_k = child - (T - 1)
        return jnp.where(is_leaf, -(leaf_k + 1), child).astype(jnp.float32)

    ii = jnp.arange(n_internal, dtype=jnp.int32)
    lc = bvh.left[ii]
    rc = bvh.right[ii]
    lc_safe = jnp.clip(lc, 0, bvh.node_min.shape[0] - 1)
    rc_safe = jnp.clip(rc, 0, bvh.node_min.shape[0] - 1)
    rows_i = jnp.zeros((n_internal, 16), jnp.float32)
    rows_i = rows_i.at[:, _I_LMIN:_I_LMIN + 3].set(bvh.node_min[lc_safe])
    rows_i = rows_i.at[:, _I_LMAX:_I_LMAX + 3].set(bvh.node_max[lc_safe])
    rows_i = rows_i.at[:, _I_RMIN:_I_RMIN + 3].set(bvh.node_min[rc_safe])
    rows_i = rows_i.at[:, _I_RMAX:_I_RMAX + 3].set(bvh.node_max[rc_safe])
    rows_i = rows_i.at[:, _I_LEFT].set(encode(lc))
    rows_i = rows_i.at[:, _I_RIGHT].set(encode(rc))

    # leaves in BVH order k → original triangle bvh.tri[(T-1)+k]
    leaf_tri = bvh.tri[(T - 1) + jnp.arange(T, dtype=jnp.int32)] \
        if T > 1 else bvh.tri[jnp.arange(1, dtype=jnp.int32)]
    lt = jnp.clip(leaf_tri, 0, T - 1)
    v0 = tri_v0[lt]
    e1 = tri_v1[lt] - v0
    e2 = tri_v2[lt] - v0
    rows_l = jnp.zeros((T, 16), jnp.float32)
    rows_l = rows_l.at[:, 0:3].set(v0)
    rows_l = rows_l.at[:, 3:6].set(e1)
    rows_l = rows_l.at[:, 6:9].set(e2)
    rows_l = rows_l.at[:, 9].set(leaf_tri.astype(jnp.float32))
    return _pack_rows(rows_i), _pack_rows(rows_l)


def _traverse_kernel(any_hit: bool, single_tri: bool, npk: int,
                     # scalar prefetch
                     tmin_ref,
                     # inputs (acceleration arrays stay in HBM)
                     internal_hbm, leaf_hbm,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmax_ref,
                     # outputs
                     t_out, tri_out, u_out, v_out,
                     # scratch
                     internal_ref, leaf_ref, copy_sems, stack_ref):
    """``npk`` independent packets traverse interleaved inside one
    program: their per-step scalar chains (stack pops, node-tile reads,
    reductions) are independent, so the compiler overlaps the latencies
    that a single serial packet would expose.

    The acceleration arrays are HBM-resident inputs copied ONCE into
    persistent VMEM scratch at grid program 0 (scratch survives across
    sequential grid steps). Letting the Pallas pipeline stream them as
    VMEM inputs instead re-DMAs the full structure every program —
    measured ~100-150 us/packet of pure copy overhead for an 8.4 MB
    BVH, 5-10x the actual traversal cost for coherent rays."""
    tmin = tmin_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _load_bvh():
        ic = pltpu.make_async_copy(internal_hbm, internal_ref, copy_sems.at[0])
        lc = pltpu.make_async_copy(leaf_hbm, leaf_ref, copy_sems.at[1])
        ic.start()
        lc.start()
        ic.wait()
        lc.wait()

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def safe_inv(d):
        tiny = jnp.where(d < 0.0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12, tiny, d)

    rays = []
    for pkt in range(npk):
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        ox = ox_ref[r0:r1, :]
        oy = oy_ref[r0:r1, :]
        oz = oz_ref[r0:r1, :]
        dx = dx_ref[r0:r1, :]
        dy = dy_ref[r0:r1, :]
        dz = dz_ref[r0:r1, :]
        rays.append((ox, oy, oz, dx, dy, dz,
                     safe_inv(dx), safe_inv(dy), safe_inv(dz)))
        stack_ref[pkt, 0] = jnp.int32(-1 if single_tri else 0)

    def pkt_init(pkt):
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        return (jnp.int32(1),
                tmax_ref[r0:r1, :],
                jnp.full((PACKET_ROWS, PACKET_COLS), -1, jnp.int32),
                jnp.zeros((PACKET_ROWS, PACKET_COLS), jnp.float32),
                jnp.zeros((PACKET_ROWS, PACKET_COLS), jnp.float32))

    init = tuple(x for pkt in range(npk) for x in pkt_init(pkt))

    def pkt_live(state, pkt):
        sp = state[5 * pkt]
        tri = state[5 * pkt + 2]
        live = sp > 0
        if any_hit:
            live = live & jnp.logical_not(jnp.all(tri >= 0))
        return live

    def cond(state):
        live = pkt_live(state, 0)
        for pkt in range(1, npk):
            live = live | pkt_live(state, pkt)
        return live

    def step(pkt, sub):
        sp, t_best, tri_best, u_best, v_best = sub
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rays[pkt]
        active = sp > 0
        enc = stack_ref[pkt, jnp.maximum(sp - 1, 0)]
        sp_pop = jnp.maximum(sp - 1, 0)

        def leaf_branch(st):
            sp, t_best, tri_best, u_best, v_best = st
            k = jnp.maximum(-enc - 1, 0)
            ltile = leaf_ref[k >> 7]          # (16, 128)
            loh = (lane_iota == (k & 127)).astype(jnp.float32)

            def lf(r):
                return jnp.sum(ltile[r:r + 1, :] * loh, axis=1, keepdims=True)

            p0x, p0y, p0z = lf(0), lf(1), lf(2)
            a1x, a1y, a1z = lf(3), lf(4), lf(5)
            a2x, a2y, a2z = lf(6), lf(7), lf(8)
            tri_id = jnp.sum(ltile[9:10, :] * loh).astype(jnp.int32)

            pvx = dy * a2z - dz * a2y
            pvy = dz * a2x - dx * a2z
            pvz = dx * a2y - dy * a2x
            det = a1x * pvx + a1y * pvy + a1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, TRI_EPS, det)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * a1z - tvz * a1y
            qvy = tvz * a1x - tvx * a1z
            qvz = tvx * a1y - tvy * a1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (a2x * qvx + a2y * qvy + a2z * qvz) * inv_det
            hit = (jnp.abs(det) >= TRI_EPS) & (uu >= 0.0) & (vv >= 0.0) \
                & (uu + vv <= 1.0) & (tt >= tmin) & (tt <= t_best)
            return (sp,
                    jnp.where(hit, tt, t_best),
                    jnp.where(hit, tri_id, tri_best),
                    jnp.where(hit, uu, u_best),
                    jnp.where(hit, vv, v_best))

        def internal_branch(st):
            sp, t_best, tri_best, u_best, v_best = st
            i = jnp.maximum(enc, 0)
            itile = internal_ref[i >> 7]      # (16, 128)
            ioh = (lane_iota == (i & 127)).astype(jnp.float32)

            def nf(r):
                return jnp.sum(itile[r:r + 1, :] * ioh)

            def nfv(r):
                return jnp.sum(itile[r:r + 1, :] * ioh, axis=1, keepdims=True)

            def aabb(rmin, rmax):
                t0x = (nfv(rmin) - ox) * ix
                t1x = (nfv(rmax) - ox) * ix
                t0y = (nfv(rmin + 1) - oy) * iy
                t1y = (nfv(rmax + 1) - oy) * iy
                t0z = (nfv(rmin + 2) - oz) * iz
                t1z = (nfv(rmax + 2) - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                ok = (tn <= tf) & (tf >= tmin) & (tn <= t_best)
                if any_hit:
                    ok = ok & (tri_best < 0)
                return jnp.any(ok), jnp.sum(jnp.where(ok, tn, 0.0))

            l_any, l_tn = aabb(_I_LMIN, _I_LMAX)
            r_any, r_tn = aabb(_I_RMIN, _I_RMAX)
            lid = nf(_I_LEFT).astype(jnp.int32)
            rid = nf(_I_RIGHT).astype(jnp.int32)

            l_nearer = l_tn <= r_tn
            first = jnp.where(l_nearer, rid, lid)    # pushed first (far)
            first_ok = jnp.where(l_nearer, r_any, l_any)
            second = jnp.where(l_nearer, lid, rid)   # pushed last (near)
            second_ok = jnp.where(l_nearer, l_any, r_any)

            @pl.when(first_ok)
            def _():
                stack_ref[pkt, sp] = first

            sp1 = sp + first_ok.astype(jnp.int32)

            @pl.when(second_ok)
            def _():
                stack_ref[pkt, sp1] = second

            return (sp1 + second_ok.astype(jnp.int32),
                    t_best, tri_best, u_best, v_best)

        def active_branch(st):
            return jax.lax.cond(enc < 0, leaf_branch, internal_branch, st)

        return jax.lax.cond(
            active, active_branch, lambda st: st,
            (sp_pop, t_best, tri_best, u_best, v_best))

    def body(state):
        out = []
        for pkt in range(npk):
            out.extend(step(pkt, state[5 * pkt:5 * pkt + 5]))
        return tuple(out)

    # lax.while_loop has a pathological per-iteration cost on this
    # backend; amortize with CHUNK_STEPS masked steps per iteration.
    def chunk(state):
        return jax.lax.fori_loop(0, CHUNK_STEPS, lambda _i, st: body(st),
                                 state)

    state = jax.lax.while_loop(cond, chunk, init)
    for pkt in range(npk):
        _, t, tri, u, v = state[5 * pkt:5 * pkt + 5]
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        miss = tri < 0
        t_out[r0:r1, :] = jnp.where(miss, jnp.inf, t)
        tri_out[r0:r1, :] = tri
        u_out[r0:r1, :] = u
        v_out[r0:r1, :] = v


@functools.partial(jax.jit,
                    static_argnames=("any_hit", "interpret", "num_tris",
                                     "packets_per_program"))
def intersect_packed(internal_tiles, leaf_tiles, num_tris, o, d, tmin, tmax,
                     any_hit: bool = False, interpret: bool = False,
                     packets_per_program: int = 1):
    """Packet-traversal intersect over flat ray batch (R, 3) using the
    pre-packed acceleration arrays from ``build_packed``."""
    npk = packets_per_program
    R = o.shape[0]
    group = PACKET * npk
    pad = (-R) % group
    n_programs = (R + pad) // group
    rows = n_programs * PACKET_ROWS * npk

    def plane(x, fill=0.0):
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
        return x.reshape(rows, PACKET_COLS, 3)

    op = plane(o)
    dp = plane(d, fill=1.0)
    # huge tmax (1e10) poisons the traversal loop with inf-range
    # arithmetic — measured 30x slowdown on v5e; the reference caps
    # shadow rays at 1e4 anyway (common.glsl:127). Clamp hard.
    tmax_full = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(tmax, jnp.float32), 1e6), (R,))
    tmax_p = jnp.pad(tmax_full, (0, pad)).reshape(rows, PACKET_COLS)

    blk_rows = PACKET_ROWS * npk
    ray_spec = pl.BlockSpec((blk_rows, PACKET_COLS), lambda i, *_: (i, 0))
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_programs,),
        in_specs=[hbm, hbm] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM(internal_tiles.shape, jnp.float32),
            pltpu.VMEM(leaf_tiles.shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((npk, STACK_DEPTH), jnp.int32),
        ],
    )
    shape2 = (rows, PACKET_COLS)
    out_shape = [
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.int32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
    ]

    kernel = functools.partial(_traverse_kernel, any_hit, num_tris == 1, npk)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        # sequential grid: program 0's BVH load must precede all others
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(internal_tiles, leaf_tiles)),
    )(jnp.full((1,), jnp.float32(tmin)),
      internal_tiles, leaf_tiles,
      op[..., 0], op[..., 1], op[..., 2],
      dp[..., 0], dp[..., 1], dp[..., 2],
      tmax_p)

    flat = lambda x: x.reshape(-1)[:R]
    return flat(t), flat(tri), flat(u), flat(v)


INACTIVE_TRI = 1 << 29   # sentinel "hit" id for inactive lanes

WIDE_ISTACK_DEPTH = 64
WIDE_LSTACK_DEPTH = 64
import os as _os0

WIDE_CHUNK_STEPS = int(_os0.environ.get("WIDE_CHUNK_STEPS", "16"))
# 16 beat 32/64 in-frame at 1080p on the COMPRESSED-stack kernel (362
# vs 378/408 ms shadow+AO rung): smaller chunks overshoot less past
# packet termination. Batch 14 retuned the ORDERED DIRECT kernel:
# isolated shadow 8/16/24/32 = 63.6/57.1/49.2/... Mrays/s — env knob
# for the in-frame A/B before flipping the default.
# npk sweep on the ordered direct kernel (batch 25, one session):
# shadow 27.6/34.1/48.1 ms, AO 474.6/537.1/588.3, GI 707.6/815.7/892.3
# at npk 2/4/8 — npk=2 wins every ray type (+13..23% over the old
# npk=4, which was tuned on the r1 compressed kernel). Env: WIDE_NPK.
WIDE_PACKETS_PER_PROGRAM = 2
# Unroll factor for the chunk fori_loop: per-ITERATION loop machinery
# measured ~2.4 us regardless of body (micro_traversal nop at 8 chains
# ~2.5 us/step ≈ the real kernel's per-step cost at npk=4) — unrolling
# amortizes it across U steps. Env knob for experiments.
import os as _os

WIDE_CHUNK_UNROLL = int(_os.environ.get("WIDE_UNROLL", "16"))  # full:
# measured shadow 33.0->35.3 / AO 10.2->10.9 Mrays/s vs unroll=1 at 65k
# record-field extraction: "onehot" lane reductions (VPU) or "scalar"
# dynamic-sublane VMEM loads (scalar unit) over the flat record layout
WIDE_EXTRACT = _os.environ.get("WIDE_EXTRACT", "onehot")
# traversal formulation: "packet" = one shared stack per 1024-ray packet;
# "mimt" = per-sublane-row stacks (8 independent 128-ray traversals per
# packet — see the MIMT section below). Host sim ceiling: 2.2×/2.6×
# fewer steps (shadow/AO); pick by measurement.
WIDE_KERNEL = _os.environ.get("WIDE_KERNEL", "packet")
# stack entry encoding for the packet kernel: "compressed" = SMEM meta
# table + (parent<<8|mask) entries, fixed bit-order pops; "direct" =
# child-id entries + VMEM meta tiles with NEAR-FIRST ordered pushes (no
# SMEM table → no ~1.05M-tri ceiling). "auto" = direct: ordered
# traversal measured +37% shadow / +55% AO / +91% closest on the SAH
# tree vs the best compressed configuration (batch 8).
WIDE_STACK = _os.environ.get("WIDE_STACK", "auto")
META_SMEM_LIMIT = 900 * 1024


def _popcount8(x):
    """Scalar popcount of an 8-bit value (SWAR, int32 scalar ops)."""
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


def _wide_traverse_kernel(any_hit: bool, npk: int, chunk_steps: int,
                          chunk_unroll: int, extract: str,
                          # scalar prefetch
                          tmin_ref, meta_ref,
                          # inputs (HBM)
                          nodes_hbm, leaves_hbm,
                          ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          tmax_ref,
                          # outputs
                          t_out, tri_out, u_out, v_out,
                          # scratch
                          nodes_ref, leaves_ref, copy_sems):
    """8-wide BVH packet traversal, branchless with REGISTER stacks
    (layout: ops/bvh_wide.py).

    Why this shape (all measured on v5e, log in BENCH.md):
      * the step's serial chain has a ~400-500 ns latency floor, so
        ``npk`` independent packets interleave per program and overlap;
      * overlap requires a branch-free step (lax.cond / pl.when
        serialize) AND a store-free step: ANY SMEM store in the loop
        body costs ~300 ns of serialization per step regardless of
        count — so each stack lives in a loop-carried (1, 128) int32
        vector register, lanes = slots; push/writeback are lane
        one-hot selects and pops are lane one-hot reductions;
      * stack entries are compressed (parent << 8 | pending-children
        mask), one push per visit per stack; entries are decoded at pop
        with scalar popcount arithmetic against the SMEM meta table
        (scalar SMEM reads are free and pipeline fine);
      * per step the vector→scalar boundary is crossed twice (the two
        popped entries — needed as scalars for the dynamic tile reads
        and meta lookups); the 8-child hitmask stays in the vector
        domain and feeds the pushes directly.
    """
    tmin = tmin_ref[0]
    n_meta = meta_ref.shape[0] // 2

    @pl.when(pl.program_id(0) == 0)
    def _load():
        nc = pltpu.make_async_copy(nodes_hbm, nodes_ref, copy_sems.at[0])
        lc = pltpu.make_async_copy(leaves_hbm, leaves_ref, copy_sems.at[1])
        nc.start()
        lc.start()
        nc.wait()
        lc.wait()

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    if extract == "scalar":
        # flat (N, 48) records: entity = sublane row
        max_node = nodes_ref.shape[0] - 1
        dummy_leaf = leaves_ref.shape[0] - 1     # padded row: all ids -1
    else:
        max_node = nodes_ref.shape[0] * 128 - 1
        dummy_leaf = leaves_ref.shape[0] * 128 - 1  # padded lane: ids -1

    def safe_inv(d):
        tiny = jnp.where(d < 0.0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12, tiny, d)

    rays = []
    for pkt in range(npk):
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        ox = ox_ref[r0:r1, :]
        oy = oy_ref[r0:r1, :]
        oz = oz_ref[r0:r1, :]
        dx = dx_ref[r0:r1, :]
        dy = dy_ref[r0:r1, :]
        dz = dz_ref[r0:r1, :]
        rays.append((ox, oy, oz, dx, dy, dz,
                     safe_inv(dx), safe_inv(dy), safe_inv(dz)))

    def pkt_init(pkt):
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        tmax_rows = tmax_ref[r0:r1, :]
        # tmax < 0 marks inactive lanes: pre-"hit" them so they never
        # pull node visits and never block any-hit early termination
        tri0 = jnp.where(tmax_rows < 0.0, jnp.int32(INACTIVE_TRI),
                         jnp.int32(-1))
        # bootstrap: super-root entry decodes to "visit the real root"
        istack0 = jnp.where(lane_iota == 0, jnp.int32(1), jnp.int32(0))
        return (jnp.full((1, 1), 1, jnp.int32),     # isp
                jnp.full((1, 1), 0, jnp.int32),     # lsp
                istack0,                            # (1,128) reg stack
                jnp.zeros((1, 128), jnp.int32),     # leaf reg stack
                tmax_rows,
                tri0,
                jnp.zeros((PACKET_ROWS, PACKET_COLS), jnp.float32),
                jnp.zeros((PACKET_ROWS, PACKET_COLS), jnp.float32))

    init = (jnp.int32(0),) + tuple(
        x for pkt in range(npk) for x in pkt_init(pkt))
    NS = 8

    def pkt_live(state, pkt):
        isp = state[1 + NS * pkt]
        lsp = state[1 + NS * pkt + 1]
        tri = state[1 + NS * pkt + 5]
        live = (jnp.max(isp) > 0) | (jnp.max(lsp) > 0)
        if any_hit:
            live = live & jnp.logical_not(jnp.all(tri >= 0))
        return live

    def cond(state):
        live = pkt_live(state, 0)
        for pkt in range(1, npk):
            live = live | pkt_live(state, pkt)
        # hard cap: a traversal bug must never wedge the chip lease
        return live & (state[0] < 1 << 16)

    def pop(stack, sp, meta_off):
        """Decode top compressed entry → (child scalar, new stack reg,
        new sp). Zero memory stores: the shrink-writeback is a lane
        select, the entry crosses to scalar once."""
        top = jnp.maximum(sp - 1, 0)
        toh = lane_iota == top                      # (1,128) one-hot
        e = jnp.sum(jnp.where(toh, stack, 0))       # vector→scalar
        valid = jnp.sum(jnp.where(sp > 0, 1, 0))    # scalar 0/1
        par = e >> 8
        bits = e & 255
        low = bits & (-bits)
        below = low - 1
        m = meta_ref[2 * jnp.minimum(par, n_meta - 1) + meta_off]
        child = (m >> 8) + _popcount8((m & 255) & below)
        rem = bits & (bits - 1)
        new_stack = jnp.where(toh, (par << 8) | rem, stack)
        sp_new = sp - jnp.where((rem == 0) & (valid == 1), 1, 0)
        return child, valid, new_stack, sp_new

    def step(pkt, sub):
        isp, lsp, istack, lstack, t_best, tri_best, u_best, v_best = sub
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rays[pkt]

        child_i, i_valid, istack, isp = pop(istack, isp, 0)
        child_l, l_valid, lstack, lsp = pop(lstack, lsp, 1)
        i = jnp.minimum(jnp.where(i_valid == 1, child_i, 0), max_node)
        k = jnp.where(l_valid == 1, jnp.minimum(child_l, dummy_leaf),
                      dummy_leaf)

        # ---- leaf visit: 4 batched Möller–Trumbore, no transfers ----
        bf16 = leaves_ref.dtype == jnp.bfloat16
        if extract == "scalar":
            # dynamic-sublane scalar VMEM reads: field extraction runs
            # on the scalar unit, freeing the VPU (which this kernel
            # saturates) — the 48 loads pipeline behind the vector work
            def lf(r):
                return leaves_ref[k, r]
        else:
            kloh = (lane_iota == (k & 127)).astype(jnp.float32)
            ltile = leaves_ref[k >> 7].astype(jnp.float32)  # (48, 128)
            # ONE batched lane-reduce extracts all 48 fields; per-field
            # use is a static sublane slice (cheaper than 40 separate
            # reduces)
            lcol = jnp.sum(ltile * kloh, axis=1, keepdims=True)   # (48,1)

            def lf(r):
                return lcol[r:r + 1]

        for t in range(leaves_ref.shape[1] // 12):
            r = 12 * t
            p0x, p0y, p0z = lf(r + 0), lf(r + 1), lf(r + 2)
            a1x, a1y, a1z = lf(r + 3), lf(r + 4), lf(r + 5)
            a2x, a2y, a2z = lf(r + 6), lf(r + 7), lf(r + 8)
            if bf16:
                # ids ride three exact byte rows (bf16 can't hold ids
                # > 512 exactly; bvh_wide.quantize_bf16). Padding rows
                # are all -1 → decoded id < 0 → miss. Decode via ONE
                # full reduce to a replicated scalar: summing three
                # (1,1) slices at different sublane offsets needs a
                # relayout whose broadcast Mosaic can't lower
                # ("Broadcast in both sublanes and lanes", r2 batch 3).
                byte_w = (jax.lax.broadcasted_iota(
                    jnp.int32, lcol.shape, 0) - (r + 9))
                w3 = jnp.where(
                    (byte_w >= 0) & (byte_w < 3),
                    jnp.exp2(8.0 * jnp.clip(byte_w, 0, 2)
                             .astype(jnp.float32)), 0.0)
                tid = jnp.sum(lcol * w3)
            else:
                tid = lf(r + 9)
            pvx = dy * a2z - dz * a2y
            pvy = dz * a2x - dx * a2z
            pvz = dx * a2y - dy * a2x
            det = a1x * pvx + a1y * pvy + a1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, TRI_EPS, det)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * a1z - tvz * a1y
            qvy = tvz * a1x - tvx * a1z
            qvz = tvx * a1y - tvy * a1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (a2x * qvx + a2y * qvy + a2z * qvz) * inv_det
            hit = (jnp.abs(det) >= TRI_EPS) & (uu >= 0.0) & (vv >= 0.0) \
                & (uu + vv <= 1.0) & (tt >= tmin) & (tt <= t_best) \
                & (tid >= 0.0)
            t_best = jnp.where(hit, tt, t_best)
            tri_best = jnp.where(hit, tid.astype(jnp.int32), tri_best)
            u_best = jnp.where(hit, uu, u_best)
            v_best = jnp.where(hit, vv, v_best)

        # ---- internal visit: 8 slab tests → packed hitmask (vector) ----
        if extract == "scalar":
            def nfv(r):
                return nodes_ref[i, r]
        else:
            iloh = (lane_iota == (i & 127)).astype(jnp.float32)
            itile = nodes_ref[i >> 7].astype(jnp.float32)  # (48, 128)
            icol = jnp.sum(itile * iloh, axis=1, keepdims=True)   # (48,1)

            def nfv(r):
                return icol[r:r + 1]

        tb = t_best
        if any_hit:
            tb = jnp.where(tri_best < 0, t_best, -jnp.inf)
        # one (8,128)→(1,1) reduce per child: measured FASTER than a
        # bit-accumulate + single OR-log-tree of pltpu.rolls (rolls cost
        # ~2x the hardware cross-lane reduce here)
        hm = jnp.zeros((1, 1), jnp.int32)
        for c in range(8):
            r = 6 * c
            t0x = (nfv(r + 0) - ox) * ix
            t1x = (nfv(r + 3) - ox) * ix
            t0y = (nfv(r + 1) - oy) * iy
            t1y = (nfv(r + 4) - oy) * iy
            t0z = (nfv(r + 2) - oz) * iz
            t1z = (nfv(r + 5) - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            okc = (tn <= tf) & (tf >= tmin) & (tn <= tb)
            af = jnp.max(okc.astype(jnp.int32), axis=(0, 1), keepdims=True)
            hm = hm | (af << c)
        hm = hm * i_valid                   # dummy visit pushes nothing

        m0 = meta_ref[2 * i]                # scalar reads: free
        m1 = meta_ref[2 * i + 1]
        hm_i = hm & (m0 & 255)
        hm_l = hm & (m1 & 255)
        # one compressed register push per stack (a no-op push writes
        # above the unchanged top and is overwritten later)
        entry = hm | (i << 8)               # (1,1) vector
        istack = jnp.where(lane_iota == isp, entry & ((m0 & 255) | -256),
                           istack)
        isp = isp + jnp.where(hm_i != 0, 1, 0)
        lstack = jnp.where(lane_iota == lsp, entry & ((m1 & 255) | -256),
                           lstack)
        lsp = lsp + jnp.where(hm_l != 0, 1, 0)
        return (isp, lsp, istack, lstack, t_best, tri_best, u_best, v_best)

    def body(state):
        out = [state[0] + 1]
        for pkt in range(npk):
            out.extend(step(pkt, state[1 + NS * pkt:1 + NS * pkt + NS]))
        return tuple(out)

    def chunk(state):
        # manual partial unroll (Mosaic's fori lowering only supports
        # unroll=1 or full): U body repeats per loop iteration amortize
        # the ~2.4 us/iteration loop machinery
        u = max(1, min(chunk_unroll, chunk_steps))

        def step_u(_i, st):
            for _ in range(u):
                st = body(st)
            return st

        if chunk_steps // u <= 1:
            return step_u(0, state)
        return jax.lax.fori_loop(0, chunk_steps // u, step_u, state)

    state = jax.lax.while_loop(cond, chunk, init)
    for pkt in range(npk):
        t, tri, u, v = state[1 + NS * pkt + 4:1 + NS * pkt + NS]
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        miss = tri < 0
        t_out[r0:r1, :] = jnp.where(miss, jnp.inf, t)
        tri_out[r0:r1, :] = tri
        u_out[r0:r1, :] = u
        v_out[r0:r1, :] = v


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret",
                                    "packets_per_program", "chunk_steps",
                                    "chunk_unroll", "extract"))
def intersect_wide(nodes, leaves, meta, o, d, tmin, tmax,
                   any_hit: bool = False, interpret: bool = False,
                   packets_per_program: int = WIDE_PACKETS_PER_PROGRAM,
                   active=None, chunk_steps: int = WIDE_CHUNK_STEPS,
                   chunk_unroll: int = None, extract: str = "onehot"):
    """Wide-BVH packet traversal over a flat ray batch (R, 3).

    ``nodes``/``leaves``/``meta`` come from bvh_wide.build_wide. Same
    contract as intersect_packed: returns (t, tri, u, v), tri=-1 miss.
    ``extract="scalar"`` expects the FLAT record arrays
    (bvh_wide nodes_flat/leaves_flat) in the nodes/leaves slots and
    reads fields as dynamic-sublane scalar VMEM loads."""
    npk = packets_per_program
    R = o.shape[0]
    group = PACKET * npk
    pad = (-R) % group
    n_programs = (R + pad) // group
    rows = n_programs * PACKET_ROWS * npk

    def plane(x, fill=0.0):
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
        return x.reshape(rows, PACKET_COLS, 3)

    op = plane(o)
    dp = plane(d, fill=1.0)
    tmax_full = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(tmax, jnp.float32), 1e6), (R,))
    if active is not None:
        # inactive rays carry tmax -1: their lanes never hit anything and
        # count as already-done for any-hit early termination
        tmax_full = jnp.where(active, tmax_full, -1.0)
    tmax_p = jnp.pad(tmax_full, (0, pad),
                     constant_values=-1.0).reshape(rows, PACKET_COLS)

    if nodes.dtype == jnp.bfloat16 and extract == "scalar":
        raise ValueError("bf16 records support only one-hot extraction")

    blk_rows = PACKET_ROWS * npk
    ray_spec = pl.BlockSpec((blk_rows, PACKET_COLS), lambda i, *_: (i, 0))
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[hbm, hbm] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM(nodes.shape, nodes.dtype),
            pltpu.VMEM(leaves.shape, leaves.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    shape2 = (rows, PACKET_COLS)
    out_shape = [
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.int32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
    ]

    if chunk_unroll is None:
        # interpret mode (CPU tests) evaluates the unrolled body
        # step-by-step — full unroll makes small tests minutes-slow
        chunk_unroll = 1 if interpret else WIDE_CHUNK_UNROLL
    kernel = functools.partial(_wide_traverse_kernel, any_hit, npk,
                               chunk_steps, chunk_unroll, extract)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(nodes, leaves)),
    )(jnp.full((1,), jnp.float32(tmin)),
      meta.reshape(-1),
      nodes, leaves,
      op[..., 0], op[..., 1], op[..., 2],
      dp[..., 0], dp[..., 1], dp[..., 2],
      tmax_p)

    flat = lambda x: x.reshape(-1)[:R]
    return flat(t), flat(tri), flat(u), flat(v)


# ---------------------------------------------------------------------------
# Direct-stack wide traversal: child-id entries, meta in VMEM tiles
# ---------------------------------------------------------------------------
#
# The compressed-entry kernel scalar-prefetches the meta table into SMEM
# (1 MB): at ~137k wide nodes (~1.05M tris) the table no longer fits and
# the fast path dies. This variant removes meta from the pop entirely:
#
#   * stack entries are DIRECT child node ids. The push ranks each hit
#     child against the node's type mask with SWAR arithmetic (children
#     of a type are contiguous from the meta base) and lane-selects up
#     to 8 entries; the pop is one lane select + sp decrement — no SMEM
#     reads, no popcount decode on the serial pop chain.
#   * meta (ibase/imask/lbase/lmask) lives in VMEM tiles
#     (⌈Nw/128⌉, 8, 128) i32 — rows 0..3, node lane i&127, tile i>>7 —
#     and is extracted with the SAME lane one-hot as the node record
#     (one extra small reduce per step). Capacity is then bounded only
#     by the VMEM scene budget (~1.4M tris f32, ~2.9M bf16).


def pack_meta_tiles(meta):
    """int32 meta → (⌈Nw/128⌉, 8, 128) i32 VMEM tiles with rows 0..3 =
    ibase, imask, lbase, lmask for node lane i&127 of tile i>>7.

    Accepts either the packed (Nw, 2) base*256|mask layout (8-wide) or
    the unpacked (Nw, 4) [ibase, imask, lbase, lmask] layout (16-wide —
    16-bit masks don't fit the packed form)."""
    m = jnp.asarray(meta)
    if m.shape[1] == 4:
        rows = m
    else:
        rows = jnp.stack([m[:, 0] >> 8, m[:, 0] & 255,
                          m[:, 1] >> 8, m[:, 1] & 255], axis=-1)  # (Nw, 4)
    n = rows.shape[0]
    rows = jnp.pad(rows, (((0, (-n) % 128), (0, 4))))
    return rows.reshape(-1, 128, 8).transpose(0, 2, 1)


def _wide_direct_kernel(any_hit: bool, npk: int, chunk_steps: int,
                        chunk_unroll: int, ordered: bool,
                        push_mode: str,
                        stream_leaves: bool, pkt_rows: int,
                        extract_mode: str, count_steps: bool,
                        # scalar prefetch
                        tmin_ref,
                        # inputs (HBM)
                        nodes_hbm, leaves_hbm, mtiles_hbm,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref,
                        # outputs (t, tri, u, v[, steps])
                        *refs):
    if count_steps:
        t_out, tri_out, u_out, v_out, steps_out, \
            nodes_ref, leaves_ref, mtiles_ref, copy_sems = refs
    else:
        t_out, tri_out, u_out, v_out, \
            nodes_ref, leaves_ref, mtiles_ref, copy_sems = refs
    """``stream_leaves``: leaf records stay in HBM; each packet owns one
    (12*lt, 128) prefetch buffer (leaves_ref[pkt]) filled by a ONE-STEP
    lookahead DMA — after a step's pushes, the next pop's stack top is
    already known, so its tile is fetched while the next step's vector
    work runs. Lifts the leaf half of the VMEM scene budget (the node
    records, ~1/4 of the footprint, stay resident) — the capacity rung
    between in-VMEM records and the ~300x jnp fallback. Reference:
    device-memory BLAS at any size (Model.cpp:114-186)."""
    tmin = tmin_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _load():
        nc = pltpu.make_async_copy(nodes_hbm, nodes_ref, copy_sems.at[0])
        mc = pltpu.make_async_copy(mtiles_hbm, mtiles_ref, copy_sems.at[2])
        nc.start()
        mc.start()
        if not stream_leaves:
            lc = pltpu.make_async_copy(leaves_hbm, leaves_ref,
                                       copy_sems.at[1])
            lc.start()
            lc.wait()
        nc.wait()
        mc.wait()

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    max_node = nodes_ref.shape[0] * 128 - 1
    if stream_leaves:
        dummy_leaf = leaves_hbm.shape[0] * 128 - 1   # padded lane: ids -1

        def leaf_fetch_start(pkt, k):
            pltpu.make_async_copy(
                leaves_hbm.at[k >> 7], leaves_ref.at[pkt],
                copy_sems.at[3 + pkt]).start()

        def leaf_fetch_wait(pkt):
            pltpu.make_async_copy(
                leaves_hbm.at[0], leaves_ref.at[pkt],
                copy_sems.at[3 + pkt]).wait()

        # bootstrap: the first pop of every packet is the dummy leaf
        for pkt in range(npk):
            leaf_fetch_start(pkt, jnp.int32(dummy_leaf))
    else:
        dummy_leaf = leaves_ref.shape[0] * 128 - 1   # padded lane: ids -1

    def safe_inv(d):
        tiny = jnp.where(d < 0.0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12, tiny, d)

    rays = []
    for pkt in range(npk):
        r0, r1 = pkt * pkt_rows, (pkt + 1) * pkt_rows
        rays.append((ox_ref[r0:r1, :], oy_ref[r0:r1, :], oz_ref[r0:r1, :],
                     dx_ref[r0:r1, :], dy_ref[r0:r1, :], dz_ref[r0:r1, :],
                     safe_inv(dx_ref[r0:r1, :]),
                     safe_inv(dy_ref[r0:r1, :]),
                     safe_inv(dz_ref[r0:r1, :])))

    def pkt_init(pkt):
        r0, r1 = pkt * pkt_rows, (pkt + 1) * pkt_rows
        tmax_rows = tmax_ref[r0:r1, :]
        tri0 = jnp.where(tmax_rows < 0.0, jnp.int32(INACTIVE_TRI),
                         jnp.int32(-1))
        # bootstrap: entry 0 = visit the super-root record (its slot-0
        # box is the real root's AABB)
        return (jnp.full((1, 1), 1, jnp.int32),     # isp
                jnp.full((1, 1), 0, jnp.int32),     # lsp
                jnp.zeros((1, 128), jnp.int32),     # node-id stack
                jnp.zeros((1, 128), jnp.int32),     # leaf-id stack
                tmax_rows,
                tri0,
                jnp.zeros((pkt_rows, PACKET_COLS), jnp.float32),
                jnp.zeros((pkt_rows, PACKET_COLS), jnp.float32))

    init = (jnp.int32(0),) + tuple(
        x for pkt in range(npk) for x in pkt_init(pkt))
    NS = 8

    def pkt_live(state, pkt):
        isp = state[1 + NS * pkt]
        lsp = state[1 + NS * pkt + 1]
        tri = state[1 + NS * pkt + 5]
        live = (jnp.max(isp) > 0) | (jnp.max(lsp) > 0)
        if any_hit:
            live = live & jnp.logical_not(jnp.all(tri >= 0))
        return live

    def cond(state):
        live = pkt_live(state, 0)
        for pkt in range(1, npk):
            live = live | pkt_live(state, pkt)
        return live & (state[0] < 1 << 16)

    def pop(stack, sp):
        """Entry IS the child id: one lane select to scalar, no decode,
        no writeback (stale entries are overwritten by later pushes)."""
        top = jnp.maximum(sp - 1, 0)
        toh = lane_iota == top
        e = jnp.sum(jnp.where(toh, stack, 0))        # vector→scalar
        valid = jnp.sum(jnp.where(sp > 0, 1, 0))     # scalar 0/1
        return e, valid, jnp.maximum(sp - 1, 0)

    def extract(tile, oh):
        """(R, 128) tile × (1, 128) one-hot → (R, 1) column.

        mode "mxu": ride the MXU as a K=128 contraction — offloads the
        lane reduction from the VPU (the per-step critical path is pure
        VPU work; three of these run every step). mode "vpu": the
        broadcast-multiply + lane-reduce tree (r1-r4 default)."""
        if extract_mode == "mxu":
            return jax.lax.dot_general(
                tile, oh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(tile * oh, axis=1, keepdims=True)

    def step(pkt, sub):
        isp, lsp, istack, lstack, t_best, tri_best, u_best, v_best = sub
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rays[pkt]

        child_i, i_valid, isp = pop(istack, isp)
        child_l, l_valid, lsp = pop(lstack, lsp)
        i = jnp.minimum(jnp.where(i_valid == 1, child_i, 0), max_node)
        k = jnp.where(l_valid == 1, jnp.minimum(child_l, dummy_leaf),
                      dummy_leaf)

        # ---- leaf visit: batched Möller–Trumbore over the cluster ----
        bf16 = leaves_ref.dtype == jnp.bfloat16
        kloh = (lane_iota == (k & 127)).astype(jnp.float32)
        if stream_leaves:
            leaf_fetch_wait(pkt)             # the lookahead DMA landed
            ltile = leaves_ref[pkt].astype(jnp.float32)
        else:
            ltile = leaves_ref[k >> 7].astype(jnp.float32)  # (12*lt, 128)
        lcol = extract(ltile, kloh)

        def lf(r):
            return lcol[r:r + 1]

        for t in range(leaves_ref.shape[1] // 12):
            r = 12 * t
            p0x, p0y, p0z = lf(r + 0), lf(r + 1), lf(r + 2)
            a1x, a1y, a1z = lf(r + 3), lf(r + 4), lf(r + 5)
            a2x, a2y, a2z = lf(r + 6), lf(r + 7), lf(r + 8)
            if bf16:
                # exact 3-byte id rows; decode via ONE replicated-scalar
                # reduce (see the compressed kernel's note on Mosaic's
                # sublane-offset broadcast limitation)
                byte_w = (jax.lax.broadcasted_iota(
                    jnp.int32, lcol.shape, 0) - (r + 9))
                w3 = jnp.where(
                    (byte_w >= 0) & (byte_w < 3),
                    jnp.exp2(8.0 * jnp.clip(byte_w, 0, 2)
                             .astype(jnp.float32)), 0.0)
                tid = jnp.sum(lcol * w3)
            else:
                tid = lf(r + 9)
            pvx = dy * a2z - dz * a2y
            pvy = dz * a2x - dx * a2z
            pvz = dx * a2y - dy * a2x
            det = a1x * pvx + a1y * pvy + a1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, TRI_EPS, det)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * a1z - tvz * a1y
            qvy = tvz * a1x - tvx * a1z
            qvz = tvx * a1y - tvy * a1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (a2x * qvx + a2y * qvy + a2z * qvz) * inv_det
            hit = (jnp.abs(det) >= TRI_EPS) & (uu >= 0.0) & (vv >= 0.0) \
                & (uu + vv <= 1.0) & (tt >= tmin) & (tt <= t_best) \
                & (tid >= 0.0)
            t_best = jnp.where(hit, tt, t_best)
            tri_best = jnp.where(hit, tid.astype(jnp.int32), tri_best)
            u_best = jnp.where(hit, uu, u_best)
            v_best = jnp.where(hit, vv, v_best)

        # ---- internal visit: `width` slab tests → packed hitmask ----
        width = nodes_ref.shape[1] // 6
        popcnt = _popcnt16_vec if width > 8 else _popcnt8_vec
        iloh = (lane_iota == (i & 127)).astype(jnp.float32)
        itile = nodes_ref[i >> 7].astype(jnp.float32)        # (6w, 128)
        icol = extract(itile, iloh)                          # (6w, 1)

        def nfv(r):
            return icol[r:r + 1]

        tb = t_best
        if any_hit:
            tb = jnp.where(tri_best < 0, t_best, -jnp.inf)
        keys = []
        key_rows = []
        for c in range(width):
            r = 6 * c
            t0x = (nfv(r + 0) - ox) * ix
            t1x = (nfv(r + 3) - ox) * ix
            t0y = (nfv(r + 1) - oy) * iy
            t1y = (nfv(r + 4) - oy) * iy
            t0z = (nfv(r + 2) - oz) * iz
            t1z = (nfv(r + 5) - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            okc = (tn <= tf) & (tf >= tmin) & (tn <= tb)
            masked = jnp.where(okc, jnp.maximum(tn, 0.0), 1e30)
            if push_mode == "rankv":
                # defer the expensive lane reduction: pre-reduce over
                # sublanes only; ONE (width, 128) lane-min later yields
                # every child's key at once (vs `width` serialized
                # full reduces)
                key_rows.append(jnp.min(masked, axis=0, keepdims=True))
            else:
                # packet entry distance doubles as the hit flag (< BIG)
                # and the near-first ordering key — one reduce per child
                keys.append(jnp.min(masked, axis=(0, 1),
                                    keepdims=True))           # (1,1)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0)
        if push_mode == "rankv":
            kmat = jnp.concatenate(key_rows, axis=0)         # (w, 128)
            key_col = jnp.min(kmat, axis=1, keepdims=True)   # (w, 1)
            hm = jnp.sum(jnp.where(key_col < 1e30,
                                   jnp.left_shift(jnp.int32(1), iota_c),
                                   0), axis=0, keepdims=True) * i_valid
        else:
            hm = jnp.zeros((1, 1), jnp.int32)
            for c in range(width):
                hm = hm | (jnp.where(keys[c] < 1e30, 1, 0) << c)
            hm = hm * i_valid

        # meta via the node's lane one-hot (VMEM, no SMEM table)
        mtile = mtiles_ref[i >> 7]                            # (8, 128)
        if extract_mode == "mxu":
            # f32 round-trip is exact: bases < 2^24 (≤16M records)
            mcol = extract(mtile.astype(jnp.float32),
                           iloh).astype(jnp.int32)
        else:
            iloh_i = (lane_iota == (i & 127)).astype(jnp.int32)
            mcol = jnp.sum(mtile * iloh_i, axis=1, keepdims=True)  # (8, 1)
        ibase, imask = mcol[0:1], mcol[1:2]
        lbase, lmask = mcol[2:3], mcol[3:4]

        if ordered and push_mode == "rankv":
            # fully vectorized ordered push: keys already live in a
            # (width, 1) column; descending rank via width-1 STATIC
            # sublane rolls (no transpose, no vector->scalar crossings),
            # then the one-hot scatter writes all children at once.
            hm_i = hm & imask
            hm_l = hm & lmask

            def push_rankv(stack, sp, hm_t, base, full):
                has_col = ((hm_t >> iota_c) & 1) != 0        # (width, 1)
                kc = jnp.where(has_col, key_col, -1e38)
                rank = jnp.zeros((width, 1), jnp.int32)
                for sh in range(1, width):
                    # ks[c] = kc[(c + sh) % width]
                    ks = pltpu.roll(kc, width - sh, axis=0)
                    # tie-break matches the sort network (stable
                    # ascending, pushed in reverse): among equal keys
                    # the higher slot index ranks first — count o > c,
                    # i.e. c + sh did not wrap
                    tie_gt = iota_c <= (width - 1 - sh)
                    rank += ((ks > kc) | ((ks == kc) & tie_gt)) \
                        .astype(jnp.int32)
                pos = sp + rank
                cid = base + popcnt(full & ((1 << iota_c) - 1))
                onehot = (lane_iota == pos) & has_col        # (width, 128)
                upd = jnp.sum(jnp.where(onehot, cid, 0), axis=0,
                              keepdims=True)                 # (1, 128)
                wrote = jnp.sum(onehot.astype(jnp.int32), axis=0,
                                keepdims=True) > 0
                stack = jnp.where(wrote, upd, stack)
                return stack, sp + popcnt(hm_t)

            istack, isp = push_rankv(istack, isp, hm_i, ibase, imask)
            lstack, lsp = push_rankv(lstack, lsp, hm_l, lbase, lmask)
        elif ordered and (push_mode == "rank" or width > 8):
            # NEAR-FIRST order via vectorized descending RANK instead of
            # a comparator network: all-pairs key comparison as ONE
            # (width, 128) matrix op (O(1) dependency depth vs the
            # network's ~10 serialized layers), then a one-hot scatter
            # writes every pushed child in ONE shot. Child c's position
            # is sp + #{o pushed to the same stack: key_o > key_c, ties
            # by slot index} — farthest first, nearest pops next.
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0)
            key_col = jnp.concatenate(keys, axis=0)          # (width, 1)
            key_row = jnp.zeros((1, 128), jnp.float32)
            for c in range(width):
                key_row = jnp.where(lane_iota == c, keys[c], key_row)
            # tie-break matches the sort network exactly: the network is
            # a STABLE ascending sort pushed in reverse, so among equal
            # keys the higher slot index is pushed first (lower rank)
            lane_gt = lane_iota > iota_c                     # (width, 128)
            lane_valid = lane_iota < width                   # (1, 128)
            shift_safe = jnp.minimum(lane_iota, width - 1)

            hm_i = hm & imask
            hm_l = hm & lmask

            def push_rank(stack, sp, hm_t, base, full):
                has_col = ((hm_t >> iota_c) & 1) != 0        # (width, 1)
                has_row = (((hm_t >> shift_safe) & 1) != 0) & lane_valid
                # children outside this stack's mask rank LAST (-1e38)
                kc = jnp.where(has_col, key_col, -1e38)
                kr = jnp.where(has_row, key_row, -1e38)
                gt = (kr > kc) | ((kr == kc) & lane_gt & has_row)
                rank = jnp.sum(gt.astype(jnp.int32), axis=1,
                               keepdims=True)                # (width, 1)
                pos = sp + rank
                cid = base + popcnt(full & ((1 << iota_c) - 1))
                onehot = (lane_iota == pos) & has_col        # (width, 128)
                upd = jnp.sum(jnp.where(onehot, cid, 0), axis=0,
                              keepdims=True)                 # (1, 128)
                wrote = jnp.sum(onehot.astype(jnp.int32), axis=0,
                                keepdims=True) > 0
                stack = jnp.where(wrote, upd, stack)
                return stack, sp + popcnt(hm_t)

            istack, isp = push_rank(istack, isp, hm_i, ibase, imask)
            lstack, lsp = push_rank(lstack, lsp, hm_l, lbase, lmask)
        elif ordered:
            # NEAR-FIRST traversal order — the thing compressed entries
            # (fixed bit-order pops) cannot express. Sort (key, slot)
            # pairs with a 19-comparator Batcher network on (1,1)
            # scalars, then push farthest-first so the nearest child
            # pops next: t_best tightens sooner (closest-hit pruning)
            # and occluders are found sooner (any-hit termination).
            slots = [jnp.full((1, 1), c, jnp.int32) for c in range(8)]
            NET = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                   (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                   (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                   (3, 4)]
            for a, b in NET:
                swap = keys[a] > keys[b]
                ka = jnp.where(swap, keys[b], keys[a])
                kb = jnp.where(swap, keys[a], keys[b])
                sa = jnp.where(swap, slots[b], slots[a])
                sb = jnp.where(swap, slots[a], slots[b])
                keys[a], keys[b] = ka, kb
                slots[a], slots[b] = sa, sb

            hm_i = hm & imask
            hm_l = hm & lmask

            def push_slot(stack, sp, slot, hm_t, base, full):
                bit = jnp.left_shift(jnp.int32(1), slot)
                has = (hm_t & bit) != 0
                cid = base + _popcnt8_vec(full & (bit - 1))
                stack = jnp.where((lane_iota == sp) & has, cid, stack)
                return stack, sp + jnp.where(has, 1, 0)

            for s in range(7, -1, -1):        # farthest pushed first
                istack, isp = push_slot(istack, isp, slots[s], hm_i,
                                        ibase, imask)
                lstack, lsp = push_slot(lstack, lsp, slots[s], hm_l,
                                        lbase, lmask)
        else:
            def push(stack, sp, hm_t, base, full):
                for c in range(width):
                    bit = 1 << c
                    below = bit - 1
                    has = (hm_t & bit) != 0                   # (1,1)
                    pos = sp + popcnt(hm_t & below)
                    cid = base + popcnt(full & below)
                    stack = jnp.where((lane_iota == pos) & has, cid,
                                      stack)
                return stack, sp + popcnt(hm_t)

            istack, isp = push(istack, isp, hm & imask, ibase, imask)
            lstack, lsp = push(lstack, lsp, hm & lmask, lbase, lmask)
        if stream_leaves:
            # one-step lookahead: the next pop's top is known now —
            # fetch its tile while the next step's vector work runs
            top = jnp.maximum(lsp - 1, 0)
            e = jnp.sum(jnp.where(lane_iota == top, lstack, 0))
            nxt = jnp.where(jnp.sum(jnp.where(lsp > 0, 1, 0)) == 1,
                            jnp.minimum(e, dummy_leaf),
                            jnp.int32(dummy_leaf))
            leaf_fetch_start(pkt, nxt)
        return (isp, lsp, istack, lstack, t_best, tri_best, u_best, v_best)

    def body(state):
        out = [state[0] + 1]
        for pkt in range(npk):
            out.extend(step(pkt, state[1 + NS * pkt:1 + NS * pkt + NS]))
        return tuple(out)

    def chunk(state):
        u = max(1, min(chunk_unroll, chunk_steps))

        def step_u(_i, st):
            for _ in range(u):
                st = body(st)
            return st

        if chunk_steps // u <= 1:
            return step_u(0, state)
        return jax.lax.fori_loop(0, chunk_steps // u, step_u, state)

    state = jax.lax.while_loop(cond, chunk, init)
    if stream_leaves:
        for pkt in range(npk):
            leaf_fetch_wait(pkt)   # drain the last lookahead DMAs
    if count_steps:
        steps_out[...] = jnp.broadcast_to(state[0], steps_out.shape)
    for pkt in range(npk):
        t, tri, u, v = state[1 + NS * pkt + 4:1 + NS * pkt + NS]
        r0, r1 = pkt * pkt_rows, (pkt + 1) * pkt_rows
        miss = tri < 0
        t_out[r0:r1, :] = jnp.where(miss, jnp.inf, t)
        tri_out[r0:r1, :] = tri
        u_out[r0:r1, :] = u
        v_out[r0:r1, :] = v


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret",
                                    "packets_per_program", "chunk_steps",
                                    "chunk_unroll", "ordered", "push_mode",
                                    "stream_leaves", "pkt_rows",
                                    "extract_mode", "count_steps"))
def _intersect_wide_direct(nodes, leaves, meta_tiles, o, d, tmin, tmax,
                           any_hit: bool = False, interpret: bool = False,
                           packets_per_program: int = WIDE_PACKETS_PER_PROGRAM,
                           active=None, chunk_steps: int = 8,
                           chunk_unroll: int = None, ordered: bool = True,
                           push_mode: str = "sort",
                           stream_leaves: bool = False,
                           pkt_rows: int = PACKET_ROWS,
                           extract_mode: str = "vpu",
                           count_steps: bool = False):
    """Wide-BVH packet traversal with direct-child-id stacks and VMEM
    meta tiles (pack_meta_tiles) — no SMEM meta table, so scene capacity
    is bounded only by the VMEM record budget; with ``stream_leaves``
    the leaf records stay in HBM behind per-packet lookahead DMAs and
    only the node records bound capacity. ``ordered`` pushes children
    farthest-first (near-first pops). Contract matches intersect_wide.
    ``pkt_rows`` sets the packet height (rays per packet = pkt_rows*128):
    taller packets amortize the fixed per-step cost (pops, one-hot
    extracts, rank push) over more rays at the price of wider traversal
    unions — a win only for direction-coherent ray sets."""
    npk = packets_per_program
    R = o.shape[0]
    group = pkt_rows * PACKET_COLS * npk
    pad = (-R) % group
    n_programs = (R + pad) // group
    rows = n_programs * pkt_rows * npk

    def plane(x, fill=0.0):
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
        return x.reshape(rows, PACKET_COLS, 3)

    op = plane(o)
    dp = plane(d, fill=1.0)
    tmax_full = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(tmax, jnp.float32), 1e6), (R,))
    if active is not None:
        tmax_full = jnp.where(active, tmax_full, -1.0)
    tmax_p = jnp.pad(tmax_full, (0, pad),
                     constant_values=-1.0).reshape(rows, PACKET_COLS)

    blk_rows = pkt_rows * npk
    ray_spec = pl.BlockSpec((blk_rows, PACKET_COLS), lambda i, *_: (i, 0))
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)

    out_specs = [ray_spec] * 4
    shape2 = (rows, PACKET_COLS)
    out_shape = [
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.int32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
    ]
    if count_steps:
        # per-program traversal step count (ceiling-analysis debug);
        # (1, 8, 128) blocks — Mosaic needs the last two dims tileable
        out_specs = out_specs + [
            pl.BlockSpec((1, 8, PACKET_COLS), lambda i, *_: (i, 0, 0))]
        out_shape.append(
            jax.ShapeDtypeStruct((n_programs, 8, PACKET_COLS), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_programs,),
        in_specs=[hbm, hbm, hbm] + [ray_spec] * 7,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(nodes.shape, nodes.dtype),
            # streaming: one lookahead tile buffer per packet; resident:
            # the whole leaf array
            pltpu.VMEM((npk,) + leaves.shape[1:], leaves.dtype)
            if stream_leaves else pltpu.VMEM(leaves.shape, leaves.dtype),
            pltpu.VMEM(meta_tiles.shape, meta_tiles.dtype),
            pltpu.SemaphoreType.DMA((3 + npk,) if stream_leaves
                                    else (3,)),
        ],
    )

    if chunk_unroll is None:
        chunk_unroll = 1 if interpret else WIDE_CHUNK_UNROLL
    kernel = functools.partial(_wide_direct_kernel, any_hit, npk,
                               chunk_steps, chunk_unroll, ordered,
                               push_mode, stream_leaves, pkt_rows,
                               extract_mode, count_steps)
    vmem_args = (nodes, meta_tiles) if stream_leaves \
        else (nodes, leaves, meta_tiles)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(*vmem_args)),
    )(jnp.full((1,), jnp.float32(tmin)),
      nodes, leaves, meta_tiles,
      op[..., 0], op[..., 1], op[..., 2],
      dp[..., 0], dp[..., 1], dp[..., 2],
      tmax_p)
    t, tri, u, v = outs[:4]

    flat = lambda x: x.reshape(-1)[:R]
    if count_steps:
        return flat(t), flat(tri), flat(u), flat(v), outs[4][:, 0, 0]
    return flat(t), flat(tri), flat(u), flat(v)


def intersect_wide_direct(nodes, leaves, meta_tiles, o, d, tmin, tmax,
                          chunk_steps: int = None, chunk_unroll: int = None,
                          **kw):
    """Public entry: resolves chunk_steps/unroll OUTSIDE the jit
    boundary (env knob WIDE_CHUNK_STEPS read per call, so frame-level
    A/Bs retrace; r2 batch-14 retune on the ordered direct kernel:
    isolated shadow 63.6/57.1/49.2 Mrays/s at 8/16/24 → 8. r4 batch 7
    re-tuned under pkt_rows=16: 2048-ray packets take ~half the steps
    per chunk check, so the termination-overshoot optimum drops —
    head rung 103.2/102.6/99.5 at cs 8/4/6 → default 6)."""
    if chunk_steps is None:
        chunk_steps = int(_os.environ.get("WIDE_CHUNK_STEPS", "6"))
    kw.setdefault("packets_per_program",
                  int(_os.environ.get("WIDE_NPK",
                                      str(WIDE_PACKETS_PER_PROGRAM))))
    # packet height in sublane rows (rays/packet = rows*128). Taller
    # packets amortize fixed per-step work (pops, one-hot extracts,
    # rankv rolls, meta fetch) over more rays but widen the traversal
    # union. r4 batch 5 (one process, 65k): 16 rows beat 8 on EVERY ray
    # type isolated (shadow 33.9->26.3, AO 27.0->24.3, closest
    # 27.7->26.3 ms) and edged the head rung (105.6 vs 106.8); 32 rows
    # give it back (shadow 31.0, head 114.8 — union growth). Default 16.
    kw.setdefault("pkt_rows", int(_os.environ.get("WIDE_PKT_ROWS", "16")))
    # one-hot column extracts on the MXU ("mxu") vs VPU lane reduces
    # ("vpu"); see _wide_direct_kernel.extract (r5 batch 2: mxu was
    # neutral isolated, ~-1.3 in-frame — kept as a knob). Distinct from
    # the legacy WIDE_EXTRACT (intersect_wide onehot/scalar).
    kw.setdefault("extract_mode",
                  _os.environ.get("WIDE_DIRECT_EXTRACT", "vpu"))
    # ordered-push implementation: "rankv" (DEFAULT — vectorized keys:
    # ONE lane-reduce for all child keys + static sublane-roll rank;
    # r4 batch 3: head 106.9 vs 109.2, sponza-scale 212.3 vs 218.7,
    # +4-5% isolated at 284k), "sort" = 19-comparator Batcher network
    # (8-wide only; the r1-r3 default), "rank" = scalar-key all-pairs
    # rank. All three are bit-identical (test-pinned).
    push_mode = kw.pop("push_mode", None) \
        or _os.environ.get("WIDE_PUSH", "auto")
    if push_mode == "auto":
        push_mode = "rankv"
    if push_mode == "sort" and nodes.shape[1] > 48:
        push_mode = "rankv"   # the sort network is 8-wide only
    return _intersect_wide_direct(nodes, leaves, meta_tiles, o, d, tmin,
                                  tmax, chunk_steps=chunk_steps,
                                  chunk_unroll=chunk_unroll,
                                  push_mode=push_mode, **kw)


# ---------------------------------------------------------------------------
# MIMT wide traversal: per-sublane-row stacks
# ---------------------------------------------------------------------------
#
# The shared-stack packet kernel's step count is |union of node visits
# across 1024 rays|. The host sim (benchmarks/mimt_sim.py, 65k-tri
# stress, 256² camera hits) measured per-ROW unions (128 rays) at
# max-over-rows 2.2× (coherent shadow) to 2.6× (interleaved AO) smaller
# — so 8 independent row traversals advancing in lockstep do ~2.2-2.6×
# fewer steps for the same vector math per step.
#
# What makes the per-row formulation affordable on Mosaic:
#   * stacks hold DIRECT child node ids (no parent+mask compression):
#     the push computes each hit child's id with vector SWAR rank
#     arithmetic over the meta masks, so the pop is a single lane-select
#     with no meta decode at all;
#   * records live in a flat-packed (⌈N/8⌉, 8, 128) layout — record k at
#     tile k>>3, sublane k&7, its 48 fields along lanes. Extraction per
#     row is one dynamic leading-index tile read + a sublane one-hot
#     reduce to a (1, 128) field row; the 8 rows assemble into one
#     (8, 128) matrix B whose per-field (8, 1) columns come from static
#     pltpu.roll + an aligned [:, 0:1] lane slice.
#   * per-field values are (8, 1) vectors (one value per row) that
#     broadcast along lanes — the Möller–Trumbore / slab math is
#     IDENTICAL in shape and cost to the shared-stack kernel.


def pack_p8(flat):
    """Flat (N, 48) records → (⌈N/8⌉, 8, 128) MIMT layout (fields in
    lanes 0..47, zero-padded — padded records are degenerate: all-zero
    leaf geometry ⇒ det 0 ⇒ miss)."""
    n = flat.shape[0]
    pad = (-n) % 8
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
    flat = jnp.pad(flat, ((0, 0), (0, 128 - flat.shape[1])))
    return flat.reshape(-1, 8, 128)


def _popcnt8_vec(x):
    """SWAR popcount of 8-bit values, vectorized (int32 lanes)."""
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


def _popcnt16_vec(x):
    """SWAR popcount of 16-bit values, vectorized (int32 lanes)."""
    x = x - ((x >> 1) & 0x5555)
    x = (x & 0x3333) + ((x >> 2) & 0x3333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


def _mimt_traverse_kernel(any_hit: bool, npk: int, chunk_steps: int,
                          chunk_unroll: int,
                          # scalar prefetch
                          tmin_ref, meta_ref,
                          # inputs (HBM)
                          nodes_hbm, leaves_hbm,
                          ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          tmax_ref,
                          # outputs
                          t_out, tri_out, u_out, v_out,
                          # scratch
                          nodes_ref, leaves_ref, copy_sems):
    tmin = tmin_ref[0]
    n_meta = meta_ref.shape[0] // 2

    @pl.when(pl.program_id(0) == 0)
    def _load():
        nc = pltpu.make_async_copy(nodes_hbm, nodes_ref, copy_sems.at[0])
        lc = pltpu.make_async_copy(leaves_hbm, leaves_ref, copy_sems.at[1])
        nc.start()
        lc.start()
        nc.wait()
        lc.wait()

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    dummy_node = nodes_ref.shape[0] * 8 - 1
    dummy_leaf = leaves_ref.shape[0] * 8 - 1

    def safe_inv(d):
        tiny = jnp.where(d < 0.0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12, tiny, d)

    rays = []
    for pkt in range(npk):
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        ox = ox_ref[r0:r1, :]
        oy = oy_ref[r0:r1, :]
        oz = oz_ref[r0:r1, :]
        dx = dx_ref[r0:r1, :]
        dy = dy_ref[r0:r1, :]
        dz = dz_ref[r0:r1, :]
        rays.append((ox, oy, oz, dx, dy, dz,
                     safe_inv(dx), safe_inv(dy), safe_inv(dz)))

    def pkt_init(pkt):
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        tmax_rows = tmax_ref[r0:r1, :]
        tri0 = jnp.where(tmax_rows < 0.0, jnp.int32(INACTIVE_TRI),
                         jnp.int32(-1))
        # every row starts at the root: entry 0 at lane 0, sp 1
        return (jnp.ones((8, 1), jnp.int32),        # isp
                jnp.zeros((8, 1), jnp.int32),       # lsp
                jnp.zeros((8, 128), jnp.int32),     # per-row node-id stack
                jnp.zeros((8, 128), jnp.int32),     # per-row leaf-id stack
                tmax_rows,
                tri0,
                jnp.zeros((PACKET_ROWS, PACKET_COLS), jnp.float32),
                jnp.zeros((PACKET_ROWS, PACKET_COLS), jnp.float32))

    init = (jnp.int32(0),) + tuple(
        x for pkt in range(npk) for x in pkt_init(pkt))
    NS = 8

    def pkt_live(state, pkt):
        isp = state[1 + NS * pkt]
        lsp = state[1 + NS * pkt + 1]
        tri = state[1 + NS * pkt + 5]
        live = (jnp.max(isp) > 0) | (jnp.max(lsp) > 0)
        if any_hit:
            live = live & jnp.logical_not(jnp.all(tri >= 0))
        return live

    def cond(state):
        live = pkt_live(state, 0)
        for pkt in range(1, npk):
            live = live | pkt_live(state, pkt)
        return live & (state[0] < 1 << 16)

    def pop(stack, sp):
        """Per-row pop: entries ARE node ids — one lane-select, no
        decode, no writeback (consumed entries are overwritten by
        future pushes)."""
        top = jnp.maximum(sp - 1, 0)
        toh = lane_iota == top                       # (8,128)
        child = jnp.sum(jnp.where(toh, stack, 0), axis=1, keepdims=True)
        valid = (sp > 0).astype(jnp.int32)           # (8,1)
        return child, valid, jnp.maximum(sp - 1, 0)

    def fetch(ref, kvec, valid, dummy):
        """Per-row record fetch: 8 scalar row indices → 8 dynamic tile
        reads + sublane one-hot extracts → B (8,128) with row r =
        record k_r, fields in lanes."""
        k = jnp.where(valid == 1, kvec, dummy)
        B = jnp.zeros((8, 128), ref.dtype)
        for r in range(8):
            k_r = jnp.sum(jnp.where(sub_iota == r, k, 0))   # scalar
            tile = ref[k_r >> 3]                             # (8,128)
            rowm = sub_iota == (k_r & 7)
            rec = jnp.sum(jnp.where(rowm, tile, jnp.zeros_like(tile)),
                          axis=0, keepdims=True)             # (1,128)
            B = jnp.where(sub_iota == r, rec, B)
        return B, k

    def step(pkt, sub):
        isp, lsp, istack, lstack, t_best, tri_best, u_best, v_best = sub
        ox, oy, oz, dx, dy, dz, ix, iy, iz = rays[pkt]

        child_i, i_valid, isp = pop(istack, isp)
        child_l, l_valid, lsp = pop(lstack, lsp)

        Bl, _ = fetch(leaves_ref, child_l, l_valid, dummy_leaf)
        Bn, k_i = fetch(nodes_ref, child_i, i_valid, dummy_node)

        def fld(B, f):
            if f == 0:
                return B[:, 0:1]
            return pltpu.roll(B, 128 - f, 1)[:, 0:1]     # (8,1)

        # ---- leaf visit: 4 Möller–Trumbore, per-row triangles ----
        for t in range(4):
            r = 12 * t
            p0x, p0y, p0z = fld(Bl, r + 0), fld(Bl, r + 1), fld(Bl, r + 2)
            a1x, a1y, a1z = fld(Bl, r + 3), fld(Bl, r + 4), fld(Bl, r + 5)
            a2x, a2y, a2z = fld(Bl, r + 6), fld(Bl, r + 7), fld(Bl, r + 8)
            tid = fld(Bl, r + 9)
            pvx = dy * a2z - dz * a2y
            pvy = dz * a2x - dx * a2z
            pvz = dx * a2y - dy * a2x
            det = a1x * pvx + a1y * pvy + a1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, TRI_EPS, det)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * a1z - tvz * a1y
            qvy = tvz * a1x - tvx * a1z
            qvz = tvx * a1y - tvy * a1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (a2x * qvx + a2y * qvy + a2z * qvz) * inv_det
            # l_valid gate: dummy rows carry zero records (det 0) anyway
            hit = (jnp.abs(det) >= TRI_EPS) & (uu >= 0.0) & (vv >= 0.0) \
                & (uu + vv <= 1.0) & (tt >= tmin) & (tt <= t_best) \
                & (tid >= 0.0)
            t_best = jnp.where(hit, tt, t_best)
            tri_best = jnp.where(hit, tid.astype(jnp.int32), tri_best)
            u_best = jnp.where(hit, uu, u_best)
            v_best = jnp.where(hit, vv, v_best)

        # ---- internal visit: 8 slab tests, PER-ROW hitmask ----
        tb = t_best
        if any_hit:
            tb = jnp.where(tri_best < 0, t_best, -jnp.inf)
        hm = jnp.zeros((8, 1), jnp.int32)
        for c in range(8):
            r = 6 * c
            t0x = (fld(Bn, r + 0) - ox) * ix
            t1x = (fld(Bn, r + 3) - ox) * ix
            t0y = (fld(Bn, r + 1) - oy) * iy
            t1y = (fld(Bn, r + 4) - oy) * iy
            t0z = (fld(Bn, r + 2) - oz) * iz
            t1z = (fld(Bn, r + 5) - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            okc = (tn <= tf) & (tf >= tmin) & (tn <= tb)
            af = jnp.max(okc.astype(jnp.int32), axis=1, keepdims=True)
            hm = hm | (af << c)                      # (8,1)
        hm = hm * i_valid

        # per-row meta (ibase/imask, lbase/lmask) from scalar SMEM reads
        ibase = jnp.zeros((8, 1), jnp.int32)
        imask = jnp.zeros((8, 1), jnp.int32)
        lbase = jnp.zeros((8, 1), jnp.int32)
        lmask = jnp.zeros((8, 1), jnp.int32)
        for r in range(8):
            k_r = jnp.sum(jnp.where(sub_iota == r, k_i, 0))
            k_r = jnp.minimum(k_r, n_meta - 1)
            m0 = meta_ref[2 * k_r]
            m1 = meta_ref[2 * k_r + 1]
            rowm = sub_iota == r
            ibase = jnp.where(rowm, m0 >> 8, ibase)
            imask = jnp.where(rowm, m0 & 255, imask)
            lbase = jnp.where(rowm, m1 >> 8, lbase)
            lmask = jnp.where(rowm, m1 & 255, lmask)

        def push(stack, sp, hm_t, base, full):
            """Push each hit child's DIRECT id: position by rank within
            the hitmask, id by rank within the full type mask (children
            of a type are contiguous from base) — all vector SWAR."""
            for c in range(8):
                bit = 1 << c
                below = bit - 1
                has = (hm_t & bit) != 0                       # (8,1)
                pos = sp + _popcnt8_vec(hm_t & below)         # (8,1)
                cid = base + _popcnt8_vec(full & below)       # (8,1)
                stack = jnp.where((lane_iota == pos) & has, cid, stack)
            return stack, sp + _popcnt8_vec(hm_t)

        istack, isp = push(istack, isp, hm & imask, ibase, imask)
        lstack, lsp = push(lstack, lsp, hm & lmask, lbase, lmask)
        return (isp, lsp, istack, lstack, t_best, tri_best, u_best, v_best)

    def body(state):
        out = [state[0] + 1]
        for pkt in range(npk):
            out.extend(step(pkt, state[1 + NS * pkt:1 + NS * pkt + NS]))
        return tuple(out)

    def chunk(state):
        u = max(1, min(chunk_unroll, chunk_steps))

        def step_u(_i, st):
            for _ in range(u):
                st = body(st)
            return st

        if chunk_steps // u <= 1:
            return step_u(0, state)
        return jax.lax.fori_loop(0, chunk_steps // u, step_u, state)

    state = jax.lax.while_loop(cond, chunk, init)
    for pkt in range(npk):
        t, tri, u, v = state[1 + NS * pkt + 4:1 + NS * pkt + NS]
        r0, r1 = pkt * PACKET_ROWS, (pkt + 1) * PACKET_ROWS
        miss = tri < 0
        t_out[r0:r1, :] = jnp.where(miss, jnp.inf, t)
        tri_out[r0:r1, :] = tri
        u_out[r0:r1, :] = u
        v_out[r0:r1, :] = v


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret",
                                    "packets_per_program", "chunk_steps",
                                    "chunk_unroll"))
def intersect_mimt(nodes_p8, leaves_p8, meta, o, d, tmin, tmax,
                   any_hit: bool = False, interpret: bool = False,
                   packets_per_program: int = WIDE_PACKETS_PER_PROGRAM,
                   active=None, chunk_steps: int = WIDE_CHUNK_STEPS,
                   chunk_unroll: int = None):
    """MIMT wide-BVH traversal: per-sublane-row stacks (8 independent
    128-ray traversals per packet). ``nodes_p8``/``leaves_p8`` come from
    pack_p8(bvh_wide nodes_flat/leaves_flat). Contract matches
    intersect_wide."""
    npk = packets_per_program
    R = o.shape[0]
    group = PACKET * npk
    pad = (-R) % group
    n_programs = (R + pad) // group
    rows = n_programs * PACKET_ROWS * npk

    def plane(x, fill=0.0):
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
        return x.reshape(rows, PACKET_COLS, 3)

    op = plane(o)
    dp = plane(d, fill=1.0)
    tmax_full = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(tmax, jnp.float32), 1e6), (R,))
    if active is not None:
        tmax_full = jnp.where(active, tmax_full, -1.0)
    tmax_p = jnp.pad(tmax_full, (0, pad),
                     constant_values=-1.0).reshape(rows, PACKET_COLS)

    blk_rows = PACKET_ROWS * npk
    ray_spec = pl.BlockSpec((blk_rows, PACKET_COLS), lambda i, *_: (i, 0))
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[hbm, hbm] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM(nodes_p8.shape, nodes_p8.dtype),
            pltpu.VMEM(leaves_p8.shape, leaves_p8.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    shape2 = (rows, PACKET_COLS)
    out_shape = [
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.int32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
    ]

    if chunk_unroll is None:
        chunk_unroll = 1 if interpret else WIDE_CHUNK_UNROLL
    kernel = functools.partial(_mimt_traverse_kernel, any_hit, npk,
                               chunk_steps, chunk_unroll)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(nodes_p8, leaves_p8)),
    )(jnp.full((1,), jnp.float32(tmin)),
      meta.reshape(-1),
      nodes_p8, leaves_p8,
      op[..., 0], op[..., 1], op[..., 2],
      dp[..., 0], dp[..., 1], dp[..., 2],
      tmax_p)

    flat = lambda x: x.reshape(-1)[:R]
    return flat(t), flat(tri), flat(u), flat(v)


def intersect(bvh: BVH, tri_v0, tri_v1, tri_v2, o, d, tmin, tmax,
              any_hit: bool = False, interpret: bool = False):
    """Convenience wrapper: pack on the fly (callers that trace repeatedly
    should cache ``build_packed`` output — SceneTracer does)."""
    internal_tiles, leaf_tiles = build_packed(bvh, tri_v0, tri_v1, tri_v2)
    return intersect_packed(internal_tiles, leaf_tiles, tri_v0.shape[0],
                            o, d, tmin, tmax, any_hit=any_hit,
                            interpret=interpret)
