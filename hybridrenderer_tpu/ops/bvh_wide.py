"""Wide-BVH collapse: binary LBVH → 8-wide nodes + 4-triangle leaves.

The packet traversal kernel's cost is per-*step* (pop, dynamic tile
read, vector→scalar transfer chain), so traversal wants the shallowest
tree with the fewest visited records: collapsing the Karras binary tree
3 levels at a time gives 8-wide internal nodes (~3.3x fewer packet
steps measured on the 65k-tri stress scene), and clustering ≤4
triangles per leaf batches the Möller–Trumbore tests.

This is the TLAS/BLAS-build analog of the reference's
PREFER_FAST_TRACE acceleration structures (Scene.cpp:323-440,
Model.cpp:114-186), re-targeted at TPU packet traversal instead of RT
cores.

Collapse rules (host-side vectorized numpy; runs once per scene build):
  * ``small`` node: subtree holds ≤ LEAF_TRIS triangles → becomes one
    leaf *cluster* (its triangles are a contiguous range of the
    Morton-sorted leaf order, a property of the Karras radix tree).
  * wide roots = non-small binary nodes at depth ≡ 0 (mod 3); the
    children of a wide node are the cluster roots and wide roots whose
    nearest mod-3 ancestor it is (≤ 8 by construction).
  * children are ordered by their sorted-leaf range start, and both
    the internal children and the leaf children of a node are allocated
    contiguously, so a node stores only (ibase, imask, lbase, lmask) —
    the traversal kernel reconstructs each child id with running-rank
    arithmetic in scalar registers (no per-child field extraction).

Record layout (all f32 tiles; entity s → tile s>>7, lane s&127):
  * nodes: (Tn, 48, 128) — child c's AABB at rows 6c..6c+5
    (min.xyz, max.xyz). Empty slots get inverted boxes. One dynamic
    tile read per visit (Mosaic handles 48-sublane dynamic leading
    indices).
  * leaves: (Tl, 48, 128) — triangle t of the cluster at rows
    12t..12t+9: v0, e1, e2, id. Missing triangles are degenerate
    (all-zero ⇒ det==0 ⇒ miss) with id -1.
  * meta: (2*Nw,) int32 SMEM-resident (scalar-prefetch):
    [ibase*256 | imask, lbase*256 | lmask] per node.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

WIDTH = 8
LEAF_TRIS = 4
_LEVELS = 3  # collapse depth: 2^3 = WIDTH


@dataclasses.dataclass
class WideBVH:
    """Host-built wide acceleration structure (fields are jnp-able)."""

    nodes: Any    # (Tn, 48, 128) f32
    leaves: Any   # (Tl, 48, 128) f32
    meta: Any     # (Nw, 2) int32
    num_wide: int
    num_clusters: int
    # static refit maps (topology-frozen dynamic-scene support):
    # slot_child_bin[s, c] = binary BVH node id of wide node s's child in
    # slot c (-1 empty), padded to Tn*128 rows; cluster_tri[k, t] =
    # original triangle id of cluster k's slot t (-1), padded to Tl*128.
    slot_child_bin: Any = None   # (Tn*128, 8) i32
    cluster_tri: Any = None      # (Tl*128, LEAF_TRIS) i32
    # flat row-major records (entity = sublane row, field = lane): the
    # traversal kernel's "scalar extraction" variant reads fields as
    # dynamic-sublane scalar VMEM loads instead of one-hot lane
    # reductions — VPU work moves to the (otherwise idle) scalar unit.
    # 512 B/entity after 128-lane padding vs 192 B in tile form.
    nodes_flat: Any = None       # (Tn*128, 48) f32
    leaves_flat: Any = None      # (Tl*128, 48) f32

    @property
    def vmem_bytes(self) -> int:
        itemsize = np.asarray(self.nodes).dtype.itemsize
        return int(np.prod(self.nodes.shape)
                   + np.prod(self.leaves.shape)) * itemsize


def _depths(parent: np.ndarray) -> np.ndarray:
    d = np.zeros(parent.shape[0], np.int32)
    for _ in range(96):
        nd = np.where(parent >= 0, d[np.maximum(parent, 0)] + 1, 0)
        if (nd == d).all():
            return d
        d = nd
    raise ValueError("BVH deeper than 96 levels")


def build_wide(bvh, tri_v0, tri_v1, tri_v2,
               leaf_tris: int = LEAF_TRIS, width: int = WIDTH) -> WideBVH:
    """Binary BVH (ops/bvh.BVH) + world triangles → WideBVH.

    ``leaf_tris``: triangles per leaf cluster (records are 12 rows per
    triangle → (Tl, 12*leaf_tris, 128) tiles). Bigger clusters halve
    the leaf pop/push/extract overhead per triangle at the cost of
    testing more padded triangles per visit (r3 throughput ladder).

    ``width``: children per wide node (8 or 16 — collapse 3 or 4 binary
    levels). 16-wide halves pop/push/extract count per traversal at 2x
    the slab math per visit (VERDICT r3 task 4; the step-cost lever).
    width=16 emits UNPACKED (Nw, 4) meta (16-bit masks don't fit the
    base*256|mask packing) — direct-stack kernel only."""
    levels = width.bit_length() - 1
    assert width in (8, 16) and 2 ** levels == width
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    tri = np.asarray(bvh.tri)
    v0 = np.asarray(tri_v0)
    v1 = np.asarray(tri_v1)
    v2 = np.asarray(tri_v2)
    T = int(bvh.num_tris)
    T = max(T, 1)
    N = nmin.shape[0]
    n_int = max(T - 1, 1) if T > 1 else 0

    # parents + depths + subtree ranges/counts
    parent = np.full(N, -1, np.int32)
    if T > 1:
        ii = np.arange(T - 1)
        parent[left[: T - 1]] = ii
        parent[right[: T - 1]] = ii
    depth = _depths(parent)

    lo = np.zeros(N, np.int64)
    hi = np.zeros(N, np.int64)
    if T > 1:
        lo[T - 1:] = np.arange(T)
        hi[T - 1:] = np.arange(T)
        lo[: T - 1] = -1
        hi[: T - 1] = -1
        for _ in range(96):
            l_ok = lo[left[: T - 1]] >= 0
            r_ok = lo[right[: T - 1]] >= 0
            both = l_ok & r_ok
            nlo = np.where(both, np.minimum(lo[left[: T - 1]],
                                            lo[right[: T - 1]]), lo[: T - 1])
            nhi = np.where(both, np.maximum(hi[left[: T - 1]],
                                            hi[right[: T - 1]]), hi[: T - 1])
            if (nlo == lo[: T - 1]).all() and (nhi == hi[: T - 1]).all():
                break
            lo[: T - 1] = nlo
            hi[: T - 1] = nhi
    cnt = (hi - lo + 1).astype(np.int64)

    small = cnt <= leaf_tris
    if T == 1 or small[0]:
        # whole scene is one cluster: single wide node, one leaf child
        cluster_nodes = np.array([0], np.int64)
        cluster_parent_w = np.array([0], np.int64)
        cluster_lo = np.array([lo[0] if T > 1 else 0], np.int64)
        wide_nodes = np.array([0], np.int64)
        widx = {0: 0}
        n_wide = 1
        wparent = np.array([-1], np.int64)
        wlo = np.array([0], np.int64)
    else:
        psmall = np.zeros(N, bool)
        psmall[parent >= 0] = small[np.maximum(parent, 0)][parent >= 0]
        cluster_root = small & ~psmall & (np.arange(N) != 0)
        is_wide = (~small) & (depth % levels == 0)

        # nearest mod-`levels` ancestor: ((depth-1) % levels) + 1 hops
        def ancestor_k(nodes, k):
            hops = [nodes]
            for _ in range(levels):
                prev = hops[-1]
                hops.append(np.where(prev >= 0,
                                     parent[np.maximum(prev, 0)], -1))
            return np.select([k == j for j in range(1, levels + 1)],
                             hops[1:levels + 1], -1)

        def enclosing(nodes):
            k = ((depth[nodes] - 1) % levels) + 1
            return ancestor_k(nodes, k)

        wide_nodes = np.flatnonzero(is_wide)
        cluster_nodes = np.flatnonzero(cluster_root)
        w_enc = enclosing(wide_nodes)       # binary id of enclosing wide node
        c_enc = enclosing(cluster_nodes)

        # assign wide indices level by level so children are contiguous
        bin2w = np.full(N, -1, np.int64)
        bin2w[0] = 0
        level = depth[wide_nodes] // levels
        n_wide = len(wide_nodes)
        for lv in range(1, int(level.max()) + 1 if n_wide > 1 else 1):
            sel = level == lv
            if not sel.any():
                continue
            nodes_lv = wide_nodes[sel]
            pw = bin2w[w_enc[sel]]
            assert (pw >= 0).all(), "parent wide level not yet assigned"
            order = np.lexsort((lo[nodes_lv], pw))
            base = (bin2w >= 0).sum()
            bin2w[nodes_lv[order]] = base + np.arange(len(nodes_lv))
        wparent = np.full(n_wide, -1, np.int64)
        ww = bin2w[wide_nodes]
        wparent[ww[depth[wide_nodes] > 0]] = bin2w[w_enc][depth[wide_nodes] > 0]
        cluster_parent_w = bin2w[c_enc]
        assert (cluster_parent_w >= 0).all()
        # re-index arrays to wide order
        inv = np.empty(n_wide, np.int64)
        inv[ww] = np.arange(n_wide)
        wide_nodes = wide_nodes[inv]          # wide idx → binary id
        wlo = lo[wide_nodes]
        cluster_lo = lo[cluster_nodes]
        widx = None

    # order leaf clusters by (parent wide idx, range start) → contiguous
    corder = np.lexsort((cluster_lo, cluster_parent_w))
    cluster_nodes = cluster_nodes[corder]
    cluster_parent_w = cluster_parent_w[corder]
    cluster_lo = cluster_lo[corder]
    n_cluster = len(cluster_nodes)

    # Wide index 0 is a synthetic SUPER-ROOT whose single internal child
    # is the real root (all other indices shift by +1). The traversal
    # kernel's compressed stack entries are (parent << 8 | pending-mask)
    # and decode a child id at pop time — the bootstrap entry
    # (0 << 8 | 1) then decodes to "visit the root".
    n_total = n_wide + 1

    # build per-wide-node child tables
    meta = np.zeros((n_total, 2), np.int64)
    Tn = (n_total + 127) // 128
    node_rec = np.zeros((Tn, 6 * width, 128), np.float32)
    # inverted boxes for empty slots
    for c in range(width):
        node_rec[:, 6 * c:6 * c + 3, :] = 3e38
        node_rec[:, 6 * c + 3:6 * c + 6, :] = -3e38

    # gather children (internal + leaf) per parent, ordered by lo;
    # row 0 = the super-root → root edge
    child_parent = np.concatenate([
        np.zeros(1, np.int64),
        wparent[1:] + 1 if n_wide > 1 else np.empty(0, np.int64),
        cluster_parent_w + 1,
    ])
    child_entity = np.concatenate([
        np.ones(1, np.int64),
        np.arange(1, n_wide) + 1 if n_wide > 1 else np.empty(0, np.int64),
        np.arange(n_cluster),
    ])
    child_is_leaf = np.concatenate([
        np.zeros(1, bool),
        np.zeros(max(n_wide - 1, 0), bool),
        np.ones(n_cluster, bool),
    ])
    child_lo = np.concatenate([
        np.full(1, -1, np.int64),
        wlo[1:] if n_wide > 1 else np.empty(0, np.int64),
        cluster_lo,
    ])
    child_bin = np.concatenate([
        wide_nodes[:1],
        wide_nodes[1:] if n_wide > 1 else np.empty(0, np.int64),
        cluster_nodes,
    ])
    order = np.lexsort((child_lo, child_parent))
    child_parent = child_parent[order]
    child_entity = child_entity[order]
    child_is_leaf = child_is_leaf[order]
    child_bin = child_bin[order]
    # slot index within parent
    first = np.ones(len(child_parent), bool)
    first[1:] = child_parent[1:] != child_parent[:-1]
    gidx = np.arange(len(child_parent))
    start = np.maximum.accumulate(np.where(first, gidx, 0))
    slot = gidx - start
    assert (slot < width).all(), \
        f"wide node with > {width} children"

    # masks + bases
    imask = np.zeros(n_total, np.int64)
    lmask = np.zeros(n_total, np.int64)
    ibase = np.zeros(n_total, np.int64)
    lbase = np.zeros(n_total, np.int64)
    np.add.at(imask, child_parent[~child_is_leaf], 1 << slot[~child_is_leaf])
    np.add.at(lmask, child_parent[child_is_leaf], 1 << slot[child_is_leaf])
    ifirst = first_of_kind(child_parent, ~child_is_leaf)
    lfirst = first_of_kind(child_parent, child_is_leaf)
    ibase[child_parent[ifirst]] = child_entity[ifirst]
    lbase[child_parent[lfirst]] = child_entity[lfirst]
    if width == 8:
        # legacy packed layout (base*256 | mask) — the compressed-entry
        # SMEM kernel decodes this form
        meta[:, 0] = ibase * 256 + imask
        meta[:, 1] = lbase * 256 + lmask
    else:
        # 16-bit masks don't fit the packed form: unpacked (Nw, 4)
        # [ibase, imask, lbase, lmask] — pack_meta_tiles takes either
        meta = np.stack([ibase, imask, lbase, lmask], axis=-1)

    # AABB records
    pw = child_parent
    tile = (pw // 128).astype(np.int64)
    lane = (pw % 128).astype(np.int64)
    base_row = slot * 6
    bmin = nmin[child_bin]
    bmax = nmax[child_bin]
    for ax in range(3):
        node_rec[tile, base_row + ax, lane] = bmin[:, ax]
        node_rec[tile, base_row + 3 + ax, lane] = bmax[:, ax]

    # leaf records; always ≥1 padded lane — the traversal kernel uses the
    # last lane as the branchless dummy-leaf target (all ids -1 ⇒ miss)
    Tl = n_cluster // 128 + 1
    leaf_rec = np.zeros((Tl, 12 * leaf_tris, 128), np.float32)
    cluster_tri = np.full((Tl * 128, leaf_tris), -1, np.int32)
    for t in range(leaf_tris):
        leaf_rec[:, 12 * t + 9, :] = -1.0  # id rows: padding = miss
    # sorted-leaf order → original tri ids
    sorted_tri = tri[T - 1:] if T > 1 else tri[:1]
    c_hi = hi[cluster_nodes] if T > 1 else np.array([0], np.int64)
    c_lo = cluster_lo
    for t in range(leaf_tris):
        sel = (c_lo + t) <= c_hi
        src = sorted_tri[np.minimum(c_lo + t, c_hi)]
        k = np.arange(n_cluster)
        tk = k // 128
        lk = k % 128
        p0 = v0[src]
        e1 = v1[src] - p0
        e2 = v2[src] - p0
        m = sel.astype(np.float32)
        r = 12 * t
        for ax in range(3):
            leaf_rec[tk, r + 0 + ax, lk] = p0[:, ax] * m
            leaf_rec[tk, r + 3 + ax, lk] = e1[:, ax] * m
            leaf_rec[tk, r + 6 + ax, lk] = e2[:, ax] * m
        leaf_rec[tk, r + 9, lk] = np.where(sel, src.astype(np.float32), -1.0)
        cluster_tri[:n_cluster, t] = np.where(sel, src, -1).astype(np.int32)

    # refit map: per-slot binary child ids (covers internal AND cluster
    # children — both carry a binary BVH node id whose refit AABB is the
    # record value)
    slot_child_bin = np.full((Tn * 128, width), -1, np.int64)
    slot_child_bin[child_parent, slot] = child_bin

    if width == 8:
        assert (meta[:, 0] >> 8 < 2 ** 23).all() \
            and (meta[:, 1] >> 8 < 2 ** 23).all()
    return WideBVH(nodes=node_rec, leaves=leaf_rec,
                   meta=meta.astype(np.int32), num_wide=int(n_total),
                   num_clusters=int(n_cluster),
                   slot_child_bin=slot_child_bin.astype(np.int32),
                   cluster_tri=cluster_tri,
                   nodes_flat=np.ascontiguousarray(
                       node_rec.transpose(0, 2, 1).reshape(-1, 6 * width)),
                   leaves_flat=np.ascontiguousarray(
                       leaf_rec.transpose(0, 2, 1)
                       .reshape(-1, 12 * leaf_tris)))


def _bf16_down(x: np.ndarray) -> np.ndarray:
    """Largest bfloat16 ≤ x (conservative AABB-min rounding)."""
    import ml_dtypes

    b = x.astype(np.float32).astype(ml_dtypes.bfloat16)
    bits = b.view(np.uint16).copy()
    too_high = b.astype(np.float32) > x
    neg = bits >= 0x8000
    # +0 stepping down crosses to the smallest-magnitude negative value
    is_pzero = bits == 0
    stepped = np.where(neg, bits + 1, bits - 1).astype(np.uint16)
    stepped = np.where(is_pzero, np.uint16(0x8001), stepped)
    bits = np.where(too_high, stepped, bits)
    return bits.view(ml_dtypes.bfloat16)


def _bf16_up(x: np.ndarray) -> np.ndarray:
    """Smallest bfloat16 ≥ x (conservative AABB-max rounding)."""
    import ml_dtypes

    b = x.astype(np.float32).astype(ml_dtypes.bfloat16)
    bits = b.view(np.uint16).copy()
    too_low = b.astype(np.float32) < x
    # normalize -0 → +0 so the uint16 step is monotone
    bits = np.where(bits == 0x8000, np.uint16(0), bits)
    neg = bits >= 0x8000
    stepped = np.where(neg, bits - 1, bits + 1).astype(np.uint16)
    bits = np.where(too_low, stepped, bits)
    return bits.view(ml_dtypes.bfloat16)


def quantize_bf16(wide: WideBVH) -> WideBVH:
    """bf16 record variant: halves the VMEM-resident footprint (the
    traversal's scene budget doubles — the rung between the f32 in-VMEM
    path and HBM streaming for huge scenes).

    Correctness shape:
      * node AABBs round **outward** (min down, max up) — quantized
        boxes strictly contain the f32 boxes, so traversal can only
        *add* visits, never miss a true hit;
      * leaf geometry (v0/e1/e2) quantizes round-to-nearest: hit points
        move by O(2⁻⁸) relative — acceptable for shadow/AO visibility
        (the SceneTracer only auto-selects this variant when f32 does
        not fit, where the alternative is the ~300× jnp fallback);
      * triangle ids are NOT bf16-representable above 512: each id is
        split into three exact byte rows (lo, mid, hi at record rows
        12t+9..11 — rows 10/11 were spare) and reassembled exactly in
        f32 arithmetic at pop time (ids < 2²⁴).
    """
    import ml_dtypes

    nodes = wide.nodes
    leaves = wide.leaves.copy()
    qn = np.empty(nodes.shape, ml_dtypes.bfloat16)
    for c in range(nodes.shape[1] // 6):
        r = 6 * c
        qn[:, r:r + 3, :] = _bf16_down(nodes[:, r:r + 3, :])
        qn[:, r + 3:r + 6, :] = _bf16_up(nodes[:, r + 3:r + 6, :])
    ql = np.empty(leaves.shape, ml_dtypes.bfloat16)
    for t in range(leaves.shape[1] // 12):
        r = 12 * t
        ql[:, r:r + 9, :] = leaves[:, r:r + 9, :].astype(ml_dtypes.bfloat16)
        tid = leaves[:, r + 9, :].astype(np.int64)
        miss = tid < 0
        safe = np.maximum(tid, 0)
        ql[:, r + 9, :] = np.where(miss, -1.0, safe & 255).astype(
            ml_dtypes.bfloat16)
        ql[:, r + 10, :] = np.where(miss, -1.0, (safe >> 8) & 255).astype(
            ml_dtypes.bfloat16)
        ql[:, r + 11, :] = np.where(miss, -1.0, safe >> 16).astype(
            ml_dtypes.bfloat16)
    return dataclasses.replace(wide, nodes=qn, leaves=ql,
                               nodes_flat=None, leaves_flat=None)


def _bf16_outward_jnp(x, up: bool):
    """Device-side conservative bf16 rounding (refit path analog of
    _bf16_down/_bf16_up)."""
    b = x.astype(jnp.bfloat16)
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16)
    bf = b.astype(jnp.float32)
    if up:
        need = bf < x
        bits = jnp.where(bits == 0x8000, jnp.uint16(0), bits)
        neg = bits >= 0x8000
        stepped = jnp.where(neg, bits - 1, bits + 1).astype(jnp.uint16)
    else:
        need = bf > x
        neg = bits >= 0x8000
        stepped = jnp.where(neg, bits + 1, bits - 1).astype(jnp.uint16)
        stepped = jnp.where(bits == 0, jnp.uint16(0x8001), stepped)
    out = jnp.where(need, stepped, bits)
    return jax.lax.bitcast_convert_type(out, jnp.bfloat16)


@jax.jit
def quantize_refit_device(nodes, leaves):
    """f32 refit records → bf16 records, matching quantize_bf16's layout
    (outward boxes + 3-byte-row ids) without a host round-trip — keeps
    dynamic-scene refits all-device for bf16-quantized scenes."""
    row = jnp.arange(nodes.shape[1])
    is_max_row = (row % 6) >= 3
    qn = jnp.where(is_max_row[None, :, None],
                   _bf16_outward_jnp(nodes, True),
                   _bf16_outward_jnp(nodes, False))
    parts = []
    for t in range(leaves.shape[1] // 12):
        r = 12 * t
        geom = leaves[:, r:r + 9, :].astype(jnp.bfloat16)
        tid = leaves[:, r + 9, :]
        miss = tid < 0
        safe = jnp.maximum(tid, 0.0).astype(jnp.int32)
        lo = jnp.where(miss, -1.0, (safe & 255).astype(jnp.float32))
        mid = jnp.where(miss, -1.0, ((safe >> 8) & 255).astype(jnp.float32))
        hi = jnp.where(miss, -1.0, (safe >> 16).astype(jnp.float32))
        ids = jnp.stack([lo, mid, hi], axis=1).astype(jnp.bfloat16)
        parts += [geom, ids]
    return qn, jnp.concatenate(parts, axis=1)


@jax.jit
def refit_wide(slot_child_bin, cluster_tri, node_min, node_max, v0, v1, v2):
    """Device-side record refit for dynamic scenes: frozen wide topology
    (meta/slot maps unchanged), new geometry → new (nodes, leaves) packed
    arrays, numerically identical to a fresh build_wide over the same
    binary AABBs. All gathers/reshapes — no host round-trip; the analog of
    the reference's per-frame TLAS re-sync (Scene.cpp:148-189).

    slot_child_bin/cluster_tri: the static maps from build_wide.
    node_min/node_max: refit binary-BVH AABBs (ops/bvh.refit_bvh).
    """
    rows_n = slot_child_bin.shape[0]          # Tn * 128
    rows_l = cluster_tri.shape[0]             # Tl * 128
    Tn = rows_n // 128
    Tl = rows_l // 128

    width = slot_child_bin.shape[1]
    cols = []
    for s in range(width):
        bid = slot_child_bin[:, s]
        valid = (bid >= 0)[:, None]
        safe = jnp.maximum(bid, 0)
        bmin = jnp.where(valid, node_min[safe], 3e38)
        bmax = jnp.where(valid, node_max[safe], -3e38)
        cols.append(bmin)
        cols.append(bmax)
    nodes = jnp.concatenate(cols, axis=1).astype(jnp.float32)
    nodes = nodes.reshape(Tn, 128, 6 * width).transpose(0, 2, 1)

    lcols = []
    leaf_tris = cluster_tri.shape[1]
    for t in range(leaf_tris):
        tid = cluster_tri[:, t]
        valid = tid >= 0
        m = valid.astype(jnp.float32)[:, None]
        safe = jnp.maximum(tid, 0)
        p0 = v0[safe] * m
        e1 = (v1[safe] - v0[safe]) * m
        e2 = (v2[safe] - v0[safe]) * m
        tidf = jnp.where(valid, tid.astype(jnp.float32), -1.0)
        pad = jnp.zeros((rows_l, 2), jnp.float32)
        lcols += [p0, e1, e2, tidf[:, None], pad]
    leaves_flat = jnp.concatenate(lcols, axis=1).astype(jnp.float32)
    leaves = leaves_flat.reshape(Tl, 128, 12 * leaf_tris).transpose(0, 2, 1)
    nodes_flat = nodes.transpose(0, 2, 1).reshape(-1, 6 * width)
    return nodes, leaves, nodes_flat, leaves_flat


def first_of_kind(parents: np.ndarray, kind: np.ndarray) -> np.ndarray:
    """True at the first entry of each parent group restricted to `kind`
    (parents must be group-sorted)."""
    out = np.zeros(len(parents), bool)
    seen = {}
    idx = np.flatnonzero(kind)
    p = parents[idx]
    f = np.ones(len(p), bool)
    f[1:] = p[1:] != p[:-1]
    out[idx[f]] = True
    return out


def validate_wide(wide: WideBVH, v0, v1, v2, samples: int = 200) -> bool:
    """Sanity: every triangle appears exactly once across leaf records."""
    ids = np.stack([wide.leaves[:, 12 * t + 9, :]
                    for t in range(wide.leaves.shape[1] // 12)])
    ids = ids.reshape(-1)
    ids = ids[ids >= 0].astype(np.int64)
    T = np.asarray(v0).shape[0]
    return len(ids) == T and len(np.unique(ids)) == T
