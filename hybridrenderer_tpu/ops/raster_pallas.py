"""Binned tile rasterizer — the Pallas perf path.

Replaces the O(T·H·W) jnp reference resolve (ops/raster.py) with a
two-phase design shaped for the TPU memory system:

1. **Pack + bin (jnp)** — every post-clip candidate becomes a 48-float
   record of AFFINE screen-space coefficient triples: the three edge
   forms pre-scaled by 1/(w·area) (each evaluated form is simultaneously
   the coverage test and the unnormalized perspective-correct weight
   u_i), plus depth and barycentric NUMERATORS folded into their own
   triples (Σ z_i·f_i etc.) so every interpolated quantity is one MXU
   matmul in the kernel, and the record's x-extent in tile units.
   Candidates are split into three classes by screen-tile span:
     A. span ≤ max_span      → exact (tile, record) entries
     B. tall/wide triangles  → per-tile-ROW entries (every tile in the
                               row evaluates them, masked by x-extent)
     C. > max_rows rows      → tiny global list all tiles walk
   Each class is sorted/compacted (one argsort for A, one for B) into a
   contiguous *record-blocked, transposed* stream ``(blocks, 24, 128)`` —
   records ride the 128-lane dimension so DMAs and reductions stay
   tiling-aligned. A/B streams are truncated to static caps after sorting
   (dead slots sort to the end), bounding the gather volume.

2. **Raster kernel (Pallas)** — grid over 8×128-pixel screen tiles; each
   program double-buffer-DMAs its record blocks and evaluates each edge
   quantity (edge forms, depth, bary numerators) for 128 records ×
   1024 pixels as one (P, 3) × (3, 128) MXU matmul; reversed-Z depth
   max-resolves along the lane (record) dimension with an argmax
   one-hot — no gathers anywhere, near-zero elementwise interpolation.

Output contract matches ops/raster.rasterize: a VisibilityBuffer of
(tri_id, perspective-correct original barycentrics, reversed-Z depth).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import AREA_EPS, ClippedTriangles, VisibilityBuffer, _edge_coeffs

RECORD_ROWS = 48   # padded row count of a record block
BLOCK = 128        # records per block (lane dimension)


def _deadblock_fix() -> bool:
    """r5 A/B gate, resolved OUTSIDE the jit (static cache key):
    count==0 segments yield zero blocks."""
    import os

    return os.environ.get("RASTER_DEADBLOCK_FIX", "1") != "0"


def _attrw_mode() -> str:
    """r5 A/B gate: attr lerp weights "matmul" (DEFAULT — the r4 path:
    N1/N2 ride the forms matmul) or "affine" (winner-affine values —
    a smaller eval isolated but measured +32 ms on the HEAD frame,
    r5 batch 8: head 97.9 matmul vs 130.4 affine; mechanism not
    attributed — the kernel is unchanged isolated, so the cost is in
    how the frame schedules around the (1,P)-broadcast weights)."""
    import os

    return os.environ.get("RASTER_ATTRW", "matmul")

# Row indices inside a record block. ALL interpolated quantities are
# stored as affine screen-space coefficient triples (value(x,y) =
# a·x + b·y + c): the kernel evaluates every one as a (P, 3) × (3, 128)
# MXU matmul instead of combining per-vertex values with elementwise
# (P, 128) chains — measured round 1 the eval is vector-op-bound.
# Triples start at 8-aligned offsets so (3, 128) sublane slices used as
# matmul operands stay tiling-aligned.
_R_F0 = 0    # rows 0-2: edge0 form coeffs (pre-scaled by inv_w/area)
_R_TRI = 3   # row 3: triangle id (f32-exact < 2^24)
_R_TX0 = 4   # row 4: first covered tile column (f32)
_R_TX1 = 5   # row 5: last covered tile column (f32)
_R_F1 = 8    # rows 8-10: edge1 form coeffs
_R_F2 = 16   # rows 16-18: edge2 form coeffs
_R_ZR = 24   # rows 24-26: depth numerator coeffs  (Σ z_i·f_i)
_R_N1 = 32   # rows 32-34: bary1 numerator coeffs  (Σ B[i,1]·f_i)
_R_N2 = 40   # rows 40-42: bary2 numerator coeffs  (Σ B[i,2]·f_i)

# G-buffer attribute ride-along (scene/schema.py raster_rows, 72 rows
# appended after the raster core): the kernel lerps the winner's vertex
# packs with one-hot-masked bary-numerator MXU matmuls and picks the
# constant block with a plain one-hot matmul — the G-buffer pass then
# needs NO per-pixel attribute gather (the reference's MRT raster
# interpolators, gbuffer.vert/frag, done the TPU way).
_R_A0 = 48       # rows 48-63: vertex-0 pack (wp, prev-wp, wn, wt, uv)
_R_A1 = 64       # rows 64-79: vertex-1 pack
_R_A2 = 80       # rows 80-95: vertex-2 pack
_R_AC = 96       # rows 96-119: const block (mrow 16, mat, inst, pad)
VPACK_ROWS = 16  # rows per vertex pack
CONST_ROWS = 24
ATTR_OUT = VPACK_ROWS + CONST_ROWS  # 40 output channels per pixel
ATTR_RECORD_ROWS = RECORD_ROWS + 3 * VPACK_ROWS + CONST_ROWS  # 120


def pack_candidates(tris: ClippedTriangles, attr_table=None):
    """ClippedTriangles → (T2, 48) records (row layout above) + bboxes.

    With ``attr_table`` (scene.raster_rows, (T, 72)) the per-candidate
    attribute rows are joined onto the records → (T2, 120); the sorted
    entry streams then carry them to the kernel for free (row gathers
    are row-count- not width-priced)."""
    p0, p1, p2 = tris.sxy[:, 0], tris.sxy[:, 1], tris.sxy[:, 2]
    a0, b0, g0 = _edge_coeffs(p1, p2)
    a1, b1, g1 = _edge_coeffs(p2, p0)
    a2, b2, g2 = _edge_coeffs(p0, p1)
    area2 = g0 + a0 * p0[:, 0] + b0 * p0[:, 1]
    sgn = jnp.where(area2 < 0, -1.0, 1.0)
    area = jnp.abs(area2)
    valid = tris.valid & (area > AREA_EPS)
    inv_area = sgn / jnp.maximum(area, AREA_EPS)

    iw = tris.inv_w  # (T2, 3)

    def form(a, b, g, scale):
        return jnp.stack([a * scale, b * scale, g * scale], axis=-1)

    f0 = form(a0, b0, g0, inv_area * iw[:, 0])
    f1 = form(a1, b1, g1, inv_area * iw[:, 1])
    f2 = form(a2, b2, g2, inv_area * iw[:, 2])
    z_clip = tris.z / jnp.maximum(iw, 1e-30)  # z_ndc · w
    B = tris.bary  # (T2, 3, 3)

    # invalid → constant negative edge: never covers
    f0 = jnp.where((~valid)[:, None], jnp.array([0.0, 0.0, -1.0]), f0)

    def affine(w0, w1, w2):
        """Interpolated quantity Σ w_i·F_i(x,y) → its own coeff triple."""
        return (w0[:, None] * f0 + w1[:, None] * f1 + w2[:, None] * f2)

    zr = affine(z_clip[:, 0], z_clip[:, 1], z_clip[:, 2])
    n1r = affine(B[:, 0, 1], B[:, 1, 1], B[:, 2, 1])
    n2r = affine(B[:, 0, 2], B[:, 1, 2], B[:, 2, 2])

    T2 = tris.tri_id.shape[0]
    rec = jnp.zeros((T2, RECORD_ROWS), jnp.float32)
    rec = rec.at[:, _R_F0:_R_F0 + 3].set(f0)
    rec = rec.at[:, _R_TRI].set(tris.tri_id.astype(jnp.float32))
    rec = rec.at[:, _R_F1:_R_F1 + 3].set(f1)
    rec = rec.at[:, _R_F2:_R_F2 + 3].set(f2)
    rec = rec.at[:, _R_ZR:_R_ZR + 3].set(zr)
    rec = rec.at[:, _R_N1:_R_N1 + 3].set(n1r)
    rec = rec.at[:, _R_N2:_R_N2 + 3].set(n2r)

    xs = tris.sxy[..., 0]
    ys = tris.sxy[..., 1]
    bbox = jnp.stack([xs.min(1), xs.max(1), ys.min(1), ys.max(1)], axis=-1)
    if attr_table is not None:
        rec = jnp.concatenate(
            [rec, attr_table[jnp.maximum(tris.tri_id, 0)]], axis=-1)
    return rec, bbox, valid


def _to_blocks(flat):
    """(E, R) → (E/128, R, 128) record-blocked transposed layout."""
    return flat.reshape(-1, BLOCK, flat.shape[1]).transpose(0, 2, 1)


def _bucket_order(keys, n_segments, cap, chunk: int = 8192):
    """Counting-sort grouping WITHOUT a global sort: batched in-chunk
    sorts + per-chunk histograms → exact global bucket positions.

    Grouping-equivalent to ``argsort(keys)[:cap]`` (order *within* a
    segment differs — irrelevant: the raster kernel's reversed-Z
    max-resolve is order-independent). Cost: C chunks of G-entry batched
    bitonic sorts (log²G comparator stages vs log²E for the global sort)
    plus a (C, K) histogram — measured cheaper than the global argsort
    for the ~10⁶-entry streams of 1080p binning.
    """
    E = keys.shape[0]
    G = min(chunk, max(128, E))
    pad = (-E) % G
    kp = jnp.pad(keys, (0, pad), constant_values=n_segments)
    C = kp.shape[0] // G
    kc = kp.reshape(C, G)
    ordc = jnp.argsort(kc, axis=1).astype(jnp.int32)
    sk = jnp.take_along_axis(kc, ordc, axis=1)
    kix = jnp.arange(n_segments + 2, dtype=jnp.int32)
    bounds = jax.vmap(
        lambda s: jnp.searchsorted(s, kix).astype(jnp.int32))(sk)  # (C, K+2)
    counts = bounds[:, 1:] - bounds[:, :-1]                        # (C, K+1)
    totals = counts.sum(0)
    seg_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(totals)]).astype(jnp.int32)
    chunk_base = (jnp.cumsum(counts, axis=0) - counts).astype(jnp.int32)
    p = jnp.arange(G, dtype=jnp.int32)[None, :]
    rank = p - jnp.take_along_axis(bounds, sk, axis=1)
    gpos = seg_starts[sk] + jnp.take_along_axis(chunk_base, sk, axis=1) + rank
    entry = jnp.arange(C, dtype=jnp.int32)[:, None] * G + ordc
    order = jnp.zeros((cap,), jnp.int32)
    order = order.at[gpos.reshape(-1)].set(entry.reshape(-1), mode="drop")
    starts = jnp.minimum(seg_starts[:n_segments], cap)
    cnts = jnp.minimum(seg_starts[1:n_segments + 1], cap) - starts
    return order, starts, cnts


def _gather_stream_rows(packed, idx, mode: str = "whole",
                        budget: int = 14 * 2**20):
    """Gather ``packed[idx]`` — optionally column-chunked.

    The fast-gather gate is TABLE bytes ≲ 16 MB (VMEM residency, r3
    batch 4, dtype-agnostic); the joined record table at stress scale is
    (T2, 120) f32 ≈ 71 MB, so the cap-sized stream gather pays the slow
    per-row rate (~29 ns/row — the bin stage's biggest piece, batch 41).
    ``mode="split"`` gathers in column chunks whose sliced table each
    fits the gate (barrier-materialized so XLA gathers from the small
    copy, not a view of the big buffer) — same rows, same bytes out,
    bit-identical concat. Knob: RASTER_STREAM_GATHER (r4 batch 9)."""
    if mode != "split":
        return packed[idx]
    t_rows, t_cols = packed.shape
    cols = max(8, budget // max(1, packed.dtype.itemsize * t_rows))
    if cols >= t_cols:
        return packed[idx]
    parts = []
    for c0 in range(0, t_cols, cols):
        tbl = jax.lax.optimization_barrier(packed[:, c0:c0 + cols])
        parts.append(tbl[idx])
    return jnp.concatenate(parts, axis=-1)


def _sorted_stream(packed, entry_key, entry_cand, n_segments, cap,
                   method: str = "argsort", gather: str = None):
    """Group entries by key, truncate to ``cap``, gather records, and
    return (blocked stream, starts, counts) over ``n_segments`` keys."""
    if gather is None:
        import os

        gather = os.environ.get("RASTER_STREAM_GATHER", "whole")
    if method == "chunked":
        order_cap, starts, counts = _bucket_order(entry_key, n_segments, cap)
        idx = entry_cand[order_cap]
        n_live = jnp.sum((entry_key < n_segments).astype(jnp.int32))
    else:
        order = jnp.argsort(entry_key)
        sorted_key = entry_key[order]
        kix = jnp.arange(n_segments + 1, dtype=jnp.int32)
        bounds = jnp.searchsorted(sorted_key, kix).astype(jnp.int32)
        starts = jnp.minimum(bounds[:-1], cap)
        counts = jnp.minimum(bounds[1:], cap) - starts
        # Dead entries (key == n_segments) sort past every real segment's
        # [start, start+count) and padded blocks are only touched by the
        # kernel's over-fetch lanes (masked) — no extra kill needed.
        idx = entry_cand[order[:cap]]
        n_live = bounds[-1]
    stream = _gather_stream_rows(packed, idx, gather)
    pad = (-stream.shape[0]) % BLOCK + BLOCK
    stream = jnp.pad(stream, ((0, pad), (0, 0)))
    return _to_blocks(stream), starts, counts, n_live


def bin_candidates(packed, bbox, valid, width, height, tile_h, tile_w,
                   max_span: int = 4, max_rows: int = None,
                   cap_a: int = None, cap_b: int = None,
                   overflow_cap: int = 1024, b_cand_cap: int = None,
                   sort_method: str = None):
    """Three-class binning; see module docstring.

    Sort-volume engineering: the entry sorts dominate bin cost and their
    length is static. Class A emits ``T2 × max_span`` entries (span ≤ 4
    covers the vast majority of candidates — stress @1080p: 0 dropped);
    class B candidates (wide/tall spans) are first *compacted* to
    ``b_cand_cap`` via one T2-length argsort and only then expanded to
    per-row entries, replacing a ``T2 × max_rows`` sort (2.1M entries at
    stress scale, for a few hundred live wides) with ``T2 +
    b_cand_cap × max_rows``.

    ``max_rows`` defaults to the FULL screen row count so class C is
    normally EMPTY — batch 15 measured the raster kernel per-tile-floor
    bound, and a non-empty global list (e.g. the stress ground plane)
    makes every tile pay one extra block eval. C remains as the spill
    ladder: wides beyond the first ``b_cand_cap`` compaction slots (or
    taller than a non-default ``max_rows``) ride the global list, and
    beyond ``overflow_cap`` of those are dropped. ``b_cand_cap``
    auto-sizes to keep the row-entry sort near the class-A volume."""
    if sort_method is None:
        import os

        sort_method = os.environ.get("RASTER_BIN_SORT", "argsort")
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    ntiles = ntx * nty
    if max_rows is None:
        max_rows = nty
    # The post-sort stream gather is CAP-sized: cap_a + cap_b rows are
    # gathered EVERY frame regardless of live entries (~29 ns/row — the
    # bin stage's biggest piece, batch 41). Caps therefore scale with
    # the candidate count (T2 class-A entries is ≥2× the live volume on
    # every measured scene; Sponza-scale saturates at the old fixed
    # 262144). bins["n_dropped"] counts truncated live entries — the
    # spill observability the fixed caps lacked.
    T2_ = packed.shape[0]
    if cap_a is None:
        # 2/3 of the candidate count: live entries measured 50-70k at
        # stress vs T2 147k — the 2x-headroom caps left ~4 ms of dead
        # gather on the table (r3 batch 9: rung 31.1 -> 27.2 at 2/3,
        # n_dropped 0); tighter than ~1.4x headroom starts gambling
        # with view-dependent spill
        cap_a = max(8192, min(262144, -(-(T2_ * 2 // 3) // BLOCK) * BLOCK))
    if cap_b is None:
        cap_b = max(2048, min(32768, -(-T2_ // (12 * BLOCK)) * BLOCK))
    if b_cand_cap is None:
        b_cand_cap = max(2048, -(-262144 // max_rows))

    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(bbox[:, 1] / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(bbox[:, 2] / tile_h).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor(bbox[:, 3] / tile_h).astype(jnp.int32), 0, nty - 1)
    onscreen = valid & (bbox[:, 1] >= 0) & (bbox[:, 0] < width) & \
        (bbox[:, 3] >= 0) & (bbox[:, 2] < height)

    # stash tile-column extent in the record (kernel masks class-B/C evals)
    packed = packed.at[:, _R_TX0].set(tx0.astype(jnp.float32))
    packed = packed.at[:, _R_TX1].set(tx1.astype(jnp.float32))

    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h
    T2 = packed.shape[0]
    # clip slot-B candidates (second half of the 2-slot clip layout;
    # near-plane crossers only, rare) skip the dense class-A entry
    # arrays and ride the compacted row path — class A's sort covers
    # the first T2/2 slots only
    half = T2 // 2
    is_slot_a = jnp.arange(T2, dtype=jnp.int32) < half
    cls_a = onscreen & (span <= max_span) & is_slot_a
    wide = onscreen & ~cls_a
    ncb = min(b_cand_cap, T2)
    wrank = jnp.cumsum(wide.astype(jnp.int32)) - 1
    cls_b = wide & (span_h <= max_rows) & (wrank < ncb)
    cls_c = wide & ~cls_b   # spill: over-cap or over-tall wides

    # --- class A: exact tile entries (keys [0, ntiles)) ---
    dead = ntiles + nty
    k = jnp.arange(max_span, dtype=jnp.int32)[None, :]
    kx = tx0[:half, None] + k % jnp.maximum(span_w[:half], 1)[:, None]
    ky = ty0[:half, None] + k // jnp.maximum(span_w[:half], 1)[:, None]
    in_span = (k < span[:half, None]) & cls_a[:half, None]
    tile_id = jnp.where(in_span, ky * ntx + kx, dead)
    cand_a = jnp.broadcast_to(
        jnp.arange(half, dtype=jnp.int32)[:, None], tile_id.shape)

    # --- class B: compact candidates, then per-row entries (keys
    # [ntiles, ntiles+nty)) ---
    # compaction by scatter: wrank already ranks the live wides, so a
    # drop-mode scatter replaces the T2-length argsort (sorts are
    # latency-priced ~3.5 ms each regardless of volume, batch 13)
    bslot = jnp.where(cls_b, wrank, ncb)
    border = jnp.full((ncb,), T2, jnp.int32).at[bslot].set(
        jnp.arange(T2, dtype=jnp.int32), mode="drop")
    b_alive = border < T2
    border = jnp.minimum(border, T2 - 1)
    kr = jnp.arange(max_rows, dtype=jnp.int32)[None, :]
    row = ty0[border][:, None] + kr
    in_row = (kr < span_h[border][:, None]) & b_alive[:, None]
    row_id = jnp.where(in_row, ntiles + row, dead)
    cand_b = jnp.broadcast_to(border[:, None], row_id.shape)

    # ONE combined sort over both key spaces (A tiles then B rows then
    # dead) — sorts are latency- not volume-priced, so merging the two
    # entry sorts saves a whole sort; the kernel reads the same blocked
    # stream through both its stream refs, with B segment offsets in
    # the [ntiles, ntiles+nty) key range. Caps pool: class A overflow
    # can eat into B's budget (both far above stress-scene volumes;
    # class C remains the spill ladder).
    stream, starts, counts, n_live = _sorted_stream(
        packed,
        jnp.concatenate([tile_id.reshape(-1), row_id.reshape(-1)]),
        jnp.concatenate([cand_a.reshape(-1), cand_b.reshape(-1)]),
        dead, cap_a + cap_b, method=sort_method)
    starts_a, counts_a = starts[:ntiles], counts[:ntiles]
    starts_b, counts_b = starts[ntiles:], counts[ntiles:]
    stream_a = stream_b = stream
    n_dropped = jnp.maximum(0, n_live - (cap_a + cap_b))

    # --- class C: global list (huge triangles; rare) ---
    ov_rank = jnp.cumsum(cls_c.astype(jnp.int32)) - 1
    ov_slot = jnp.where(cls_c, jnp.minimum(ov_rank, overflow_cap - 1),
                        overflow_cap)
    overflow = jnp.zeros((overflow_cap + BLOCK, packed.shape[1]),
                         jnp.float32)
    overflow = overflow.at[ov_slot].set(packed, mode="drop")
    n_overflow = jnp.minimum(jnp.sum(cls_c.astype(jnp.int32)), overflow_cap)

    return dict(
        stream_a=stream_a, starts_a=starts_a, counts_a=counts_a,
        stream_b=stream_b, starts_b=starts_b, counts_b=counts_b,
        overflow=_to_blocks(overflow[:overflow_cap]), n_overflow=n_overflow,
        n_dropped=n_dropped,
    )


def _walk_streams(eval_block, carry, rec_ref, sem_ref,
                  stream_a_hbm, stream_b_hbm, overflow_ref,
                  start_a, count_a, start_b, count_b, n_ovf,
                  deadblock_fix=True):
    """Shared stream-walk scaffolding for the raster kernels: walk the
    tile's class-A and class-B record streams with block-aligned
    double-buffered DMA, then the (VMEM-resident) overflow list, folding
    each (rows, BLOCK) record block into ``carry`` via ``eval_block(rec,
    lo, hi, carry)``."""

    def run_stream(hbm, start, count, carry):
        blk0 = start // BLOCK
        end = start + count
        # count == 0 with an unaligned start otherwise yields ONE dead
        # block (cdiv(start) - floor(start) = 1) — at 1080p that was a
        # full dead 128-lane eval per empty stream per tile, ~8 ms/frame
        # of the r5 batch-1 "zero-trip loop floor"
        # (RASTER_DEADBLOCK_FIX=0 restores the old arithmetic for A/B)
        if deadblock_fix:
            n_blocks = jnp.where(count > 0, pl.cdiv(end, BLOCK) - blk0, 0)
        else:
            n_blocks = pl.cdiv(end, BLOCK) - blk0

        def dma(slot, b):
            return pltpu.make_async_copy(
                hbm.at[blk0 + b], rec_ref.at[slot], sem_ref.at[slot])

        @pl.when(n_blocks > 0)
        def _():
            dma(0, 0).start()

        def blk_body(b, c):
            slot = b % 2

            @pl.when(b + 1 < n_blocks)
            def _():
                dma((b + 1) % 2, b + 1).start()

            dma(slot, b).wait()
            base = (blk0 + b) * BLOCK
            return eval_block(rec_ref[slot], start - base, end - base, c)

        return jax.lax.fori_loop(0, n_blocks, blk_body, carry)

    carry = run_stream(stream_a_hbm, start_a, count_a, carry)
    carry = run_stream(stream_b_hbm, start_b, count_b, carry)

    def ovf_body(b, c):
        return eval_block(overflow_ref[b], 0, n_ovf - b * BLOCK, c)

    return jax.lax.fori_loop(0, pl.cdiv(n_ovf, BLOCK), ovf_body, carry)


def _walk_streams_merged(eval_block, carry, rec_ref, sem_ref,
                         stream_hbm, overflow_ref,
                         start_a, count_a, start_b, count_b, n_ovf,
                         probe="none", deadblock_fix=True):
    """Single-loop stream walk: class-A and class-B blocks ride ONE
    fori_loop (they live in the same blocked stream — bin_candidates
    emits one combined sort), so the kernel pays one loop construct's
    carry round-trip instead of two, and pallas_call carries ONE HBM
    stream operand instead of two aliases of the same array. The rare
    class-C overflow list keeps its own (usually 0-trip) loop.

    ``probe`` (floor anatomy, r5): "idbody" = loops with an identity
    body (no eval trace, no DMA) — prices the bare loop+carry
    machinery; "nodma" = real eval, DMA machinery removed (reads
    whatever is in scratch)."""
    blk_a0 = start_a // BLOCK
    blk_b0 = start_b // BLOCK
    if deadblock_fix:
        # count == 0 must yield ZERO blocks (an unaligned start
        # otherwise rounds to one dead 128-lane eval — _walk_streams)
        n_a = jnp.where(count_a > 0,
                        pl.cdiv(start_a + count_a, BLOCK) - blk_a0, 0)
        n_b = jnp.where(count_b > 0,
                        pl.cdiv(start_b + count_b, BLOCK) - blk_b0, 0)
    else:
        n_a = pl.cdiv(start_a + count_a, BLOCK) - blk_a0
        n_b = pl.cdiv(start_b + count_b, BLOCK) - blk_b0
    n_blocks = n_a + n_b

    def blk_of(b):
        return jnp.where(b < n_a, blk_a0 + b, blk_b0 + (b - n_a))

    def dma(slot, b):
        return pltpu.make_async_copy(
            stream_hbm.at[blk_of(b)], rec_ref.at[slot], sem_ref.at[slot])

    use_dma = probe not in ("idbody", "nodma")
    if use_dma:
        @pl.when(n_blocks > 0)
        def _():
            dma(0, 0).start()

    def blk_body(b, c):
        if probe == "idbody":
            return c
        slot = b % 2
        if use_dma:
            @pl.when(b + 1 < n_blocks)
            def _():
                dma((b + 1) % 2, b + 1).start()

            dma(slot, b).wait()
        in_a = b < n_a
        base = blk_of(b) * BLOCK
        lo = jnp.where(in_a, start_a, start_b) - base
        hi = jnp.where(in_a, start_a + count_a, start_b + count_b) - base
        return eval_block(rec_ref[slot], lo, hi, c)

    carry = jax.lax.fori_loop(0, n_blocks, blk_body, carry)

    def ovf_body(b, c):
        if probe == "idbody":
            return c
        return eval_block(overflow_ref[b], 0, n_ovf - b * BLOCK, c)

    return jax.lax.fori_loop(0, pl.cdiv(n_ovf, BLOCK), ovf_body, carry)


def _raster_kernel(ntx, tile_h, tile_w, eval_mode, has_attrs,
                   # scalar prefetch
                   starts_a_ref, counts_a_ref, starts_b_ref, counts_b_ref,
                   novf_ref,
                   # inputs
                   stream_a_hbm, stream_b_hbm, overflow_ref,
                   # outputs (z, tri, b1, b2[, attr]) then scratch
                   *refs):
    if has_attrs:
        vis_ref, attr_ref, rec_ref, sem_ref = refs
    else:
        vis_ref, rec_ref, sem_ref = refs
    t = pl.program_id(0)
    ty = t // ntx
    tx = t % ntx
    P = tile_h * tile_w

    # pixel matrix (P, 3): columns = px, py, 1 at pixel centers, built
    # directly in (P, 1) layout (Mosaic cannot relayout-reshape (8,128))
    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (idx % tile_w).astype(jnp.float32) + (tx * tile_w) + 0.5
    py = (idx // tile_w).astype(jnp.float32) + (ty * tile_h) + 0.5
    pix = jnp.concatenate([px, py, jnp.ones_like(px)], axis=1)  # (P, 3)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    txf = jnp.float32(tx)

    def eval_block_v1(rec, lo, hi, carry):
        """rec: (48|120, BLOCK); lanes alive when lo <= lane < hi and the
        record's tile-column extent covers this tile."""
        z_acc, tri_acc, n1_acc, n2_acc, s_acc = carry[:5]
        alive = (lane >= lo) & (lane < hi) \
            & (rec[_R_TX0:_R_TX0 + 1, :] <= txf) \
            & (rec[_R_TX1:_R_TX1 + 1, :] >= txf)

        def forms(r0):  # (P, 3) @ (3, BLOCK) on the MXU
            return jax.lax.dot_general(
                pix, rec[r0:r0 + 3, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        F0 = forms(_R_F0)
        F1 = forms(_R_F1)
        F2 = forms(_R_F2)
        # depth / bary numerators ride the MXU too (affine coeff rows)
        Z = forms(_R_ZR)
        S = F0 + F1 + F2
        cover = (F0 >= 0.0) & (F1 >= 0.0) & (F2 >= 0.0) & alive \
            & (Z >= 0.0) & (Z <= 1.0)
        zc = jnp.where(cover, Z, -1.0)

        win_z = jnp.max(zc, axis=1, keepdims=True)      # (P, 1)
        win = jnp.argmax(zc, axis=1)                    # (P,)
        onehot = jnp.where((lane == win[:, None]) & cover, 1.0, 0.0)

        def sel(M):  # winner's value along lanes
            return jnp.sum(M * onehot, axis=1, keepdims=True)

        N1 = forms(_R_N1)
        N2 = forms(_R_N2)
        tri_row = jnp.broadcast_to(rec[_R_TRI:_R_TRI + 1, :], zc.shape)

        take = win_z > z_acc
        z_acc = jnp.where(take, win_z, z_acc)
        tri_acc = jnp.where(take, sel(tri_row), tri_acc)
        n1_acc = jnp.where(take, sel(N1), n1_acc)
        n2_acc = jnp.where(take, sel(N2), n2_acc)
        s_acc = jnp.where(take, sel(S), s_acc)
        out = (z_acc, tri_acc, n1_acc, n2_acc, s_acc)
        if not has_attrs:
            return out

        # --- attribute ride-along: lerp + const pick, all transposed
        # (C, P) so results land channel-major without relayouts ---
        lerpT, constT, sT = carry[5:]
        oh = onehot * jnp.where(take, 1.0, 0.0)          # (P, BLOCK)
        W1 = N1 * oh
        W2 = N2 * oh
        W0 = S * oh - W1 - W2                            # bary0 numerator

        def pickT(r0, n, w):  # rows (n, BLOCK) ·ᵀ w (P, BLOCK) → (n, P)
            return jax.lax.dot_general(
                rec[r0:r0 + n, :], w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        new_lerp = pickT(_R_A0, VPACK_ROWS, W0) \
            + pickT(_R_A1, VPACK_ROWS, W1) + pickT(_R_A2, VPACK_ROWS, W2)
        new_const = pickT(_R_AC, CONST_ROWS, oh)
        ones_row = jnp.ones((1, BLOCK), jnp.float32)

        def rowT(m):  # (P, BLOCK) → (1, P) lane-sum via MXU (transpose)
            return jax.lax.dot_general(
                ones_row, m, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        keep = 1.0 - rowT(oh)                            # (1, P) ∈ {0,1}
        lerpT = lerpT * keep + new_lerp
        constT = constT * keep + new_const
        sT = sT * keep + rowT(S * oh)
        return out + (lerpT, constT, sT)

    def eval_block_v2(rec, lo, hi, carry):
        """Cheaper resolve: the v1 block spends most of its vector time
        in argmax + FOUR (P, BLOCK) lane-reduce selections. v2 packs the
        winner pick into ONE integer key max (quantized depth << 7 |
        lane — the depth STORED is still the winner's exact affine
        eval) and fetches all winner attributes with a single
        (P, BLOCK) × (BLOCK, 16) one-hot MXU matmul over the record's
        coefficient ROWS, combining per pixel with (P, 3) dots."""
        z_acc, tri_acc, n1_acc, n2_acc, s_acc = carry
        alive = (lane >= lo) & (lane < hi) \
            & (rec[_R_TX0:_R_TX0 + 1, :] <= txf) \
            & (rec[_R_TX1:_R_TX1 + 1, :] >= txf)

        def forms(r0):  # (P, 3) @ (3, BLOCK) on the MXU
            return jax.lax.dot_general(
                pix, rec[r0:r0 + 3, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        F0 = forms(_R_F0)
        F1 = forms(_R_F1)
        F2 = forms(_R_F2)
        Z = forms(_R_ZR)
        cover = (F0 >= 0.0) & (F1 >= 0.0) & (F2 >= 0.0) & alive \
            & (Z >= 0.0) & (Z <= 1.0)
        # integer winner key: 17-bit quantized reversed-Z, lane low bits
        # (unique per lane → exact one-hot; ties within 2^-17 of depth
        # resolve toward the higher lane, deterministic)
        ki = (jnp.clip(Z * 131071.0, 0.0, 131071.0).astype(jnp.int32)
              << 7) | jnp.broadcast_to(lane, Z.shape)
        ki = jnp.where(cover, ki, -1)
        win_key = jnp.max(ki, axis=1, keepdims=True)     # (P, 1)
        onehot = jnp.where(ki == win_key, 1.0, 0.0)      # exact one-hot

        # winner attribute fetch: per coefficient triple, one one-hot
        # MXU matmul (P, BLOCK) @ (BLOCK, 3) over the record's rows
        # (rhs-transposed dot), then a (P, 3) dot with the pixel row —
        # replaces v1's four (P, BLOCK) lane-reduce selections
        def pick(rows):                                  # (P, k)
            return jax.lax.dot_general(
                onehot, rows,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        def affine(rows):
            return jnp.sum(pick(rows) * pix, axis=1, keepdims=True)

        hit = win_key >= 0
        win_z = jnp.where(hit, affine(rec[_R_ZR:_R_ZR + 3, :]), -1.0)
        take = win_z > z_acc
        z_acc = jnp.where(take, win_z, z_acc)
        n1_acc = jnp.where(take, affine(rec[_R_N1:_R_N1 + 3, :]), n1_acc)
        n2_acc = jnp.where(take, affine(rec[_R_N2:_R_N2 + 3, :]), n2_acc)
        s_acc = jnp.where(
            take,
            affine(rec[_R_F0:_R_F0 + 3, :] + rec[_R_F1:_R_F1 + 3, :]
                   + rec[_R_F2:_R_F2 + 3, :]), s_acc)
        tri_acc = jnp.where(take, pick(rec[_R_TRI:_R_TRI + 1, :]),
                            tri_acc)
        return z_acc, tri_acc, n1_acc, n2_acc, s_acc

    def eval_block_v3(rec, lo, hi, carry):
        """Two-matmul block eval: all six coefficient triples ride ONE
        (P, 3) × (3, 768) forms matmul (same MXU output area as v1's six
        separate (P, 3) × (3, 128) dots — the win is five fewer matmul
        dispatches), and ALL winner attributes come back in ONE one-hot
        (P, BLOCK) × (BLOCK, 16) pick over stacked record rows. Winner
        selection uses v2's integer key (quantized reversed-Z << 7 |
        lane); the depth stored is the winner's exact affine eval."""
        z_acc, tri_acc, n1_acc, n2_acc, s_acc = carry
        alive = (lane >= lo) & (lane < hi) \
            & (rec[_R_TX0:_R_TX0 + 1, :] <= txf) \
            & (rec[_R_TX1:_R_TX1 + 1, :] >= txf)

        rhs = jnp.concatenate(
            [rec[_R_F0:_R_F0 + 3, :], rec[_R_F1:_R_F1 + 3, :],
             rec[_R_F2:_R_F2 + 3, :], rec[_R_ZR:_R_ZR + 3, :]],
            axis=1)                                       # (3, 4·BLOCK)
        ALL = jax.lax.dot_general(
            pix, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (P, 4·BLOCK)
        F0 = ALL[:, 0 * BLOCK:1 * BLOCK]
        F1 = ALL[:, 1 * BLOCK:2 * BLOCK]
        F2 = ALL[:, 2 * BLOCK:3 * BLOCK]
        Z = ALL[:, 3 * BLOCK:4 * BLOCK]
        cover = (F0 >= 0.0) & (F1 >= 0.0) & (F2 >= 0.0) & alive \
            & (Z >= 0.0) & (Z <= 1.0)
        ki = (jnp.clip(Z * 131071.0, 0.0, 131071.0).astype(jnp.int32)
              << 7) | jnp.broadcast_to(lane, Z.shape)
        ki = jnp.where(cover, ki, -1)
        win_key = jnp.max(ki, axis=1, keepdims=True)      # (P, 1)
        onehot = jnp.where(ki == win_key, 1.0, 0.0)       # exact one-hot

        # stacked winner fetch: rows = [zr | n1 | n2 | f0+f1+f2 | tri]
        rows = jnp.concatenate(
            [rec[_R_ZR:_R_ZR + 3, :], rec[_R_N1:_R_N1 + 3, :],
             rec[_R_N2:_R_N2 + 3, :],
             rec[_R_F0:_R_F0 + 3, :] + rec[_R_F1:_R_F1 + 3, :]
             + rec[_R_F2:_R_F2 + 3, :],
             rec[_R_TRI:_R_TRI + 1, :]], axis=0)          # (13, BLOCK)
        picked = jax.lax.dot_general(
            onehot, rows, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (P, 13)

        def affine(c0):
            return jnp.sum(picked[:, c0:c0 + 3] * pix, axis=1,
                           keepdims=True)

        hit = win_key >= 0
        win_z = jnp.where(hit, affine(0), -1.0)
        take = win_z > z_acc
        z_acc = jnp.where(take, win_z, z_acc)
        n1_acc = jnp.where(take, affine(3), n1_acc)
        n2_acc = jnp.where(take, affine(6), n2_acc)
        s_acc = jnp.where(take, affine(9), s_acc)
        tri_acc = jnp.where(take, picked[:, 12:13], tri_acc)
        return z_acc, tri_acc, n1_acc, n2_acc, s_acc

    eval_block = {"v2": eval_block_v2, "v3": eval_block_v3}.get(
        eval_mode, eval_block_v1)

    zeros = jnp.zeros((P, 1), jnp.float32)
    carry = (zeros, zeros - 1.0, zeros, zeros, jnp.ones((P, 1), jnp.float32))
    if has_attrs:
        carry = carry + (jnp.zeros((VPACK_ROWS, P), jnp.float32),
                         jnp.zeros((CONST_ROWS, P), jnp.float32),
                         jnp.ones((1, P), jnp.float32))

    carry = _walk_streams(eval_block, carry, rec_ref, sem_ref,
                          stream_a_hbm, stream_b_hbm, overflow_ref,
                          starts_a_ref[t], counts_a_ref[t],
                          starts_b_ref[ty], counts_b_ref[ty], novf_ref[0])

    z_acc, tri_acc, n1_acc, n2_acc, s_acc = carry[:5]
    miss = tri_acc < 0.0
    s_safe = jnp.where(jnp.abs(s_acc) < 1e-20, 1e-20, s_acc)

    # Pack the four visibility planes into ONE (4, P) block, P on the
    # lane dim. Separate (P, 1) outputs tile-pad their unit lane dim
    # 128× in HBM (the CLAUDE.md small-trailing-dim gotcha): at 1080p
    # that is ~4.4 GB of padded write traffic per frame and was the
    # entire ~19 ms per-program floor batch 38 measured (empty streams
    # cost the same as real ones). (P, 1) → (1, P) rides the MXU as a
    # K=1 contraction (Mosaic cannot relayout-reshape vectors).
    ones11 = jnp.ones((1, 1), jnp.float32)

    def rowT1(v):
        return jax.lax.dot_general(
            ones11, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    vis_ref[...] = jnp.concatenate(
        [rowT1(jnp.where(miss, 0.0, z_acc)),
         rowT1(jnp.where(miss, -1.0, tri_acc)),
         rowT1(jnp.where(miss, 0.0, n1_acc / s_safe)),
         rowT1(jnp.where(miss, 0.0, n2_acc / s_safe))], axis=0)[None]
    if has_attrs:
        lerpT, constT, sT = carry[5:]
        sT_safe = jnp.where(jnp.abs(sT) < 1e-20, 1e-20, sT)
        attr_ref[...] = jnp.concatenate(
            [lerpT / sT_safe, constT], axis=0)[None].astype(attr_ref.dtype)


def _raster_kernel_t(ntx, tile_h, tile_w, has_attrs, walk, probe, tiles_pp,
                     deadblock_fix, attrw,
                     # scalar prefetch
                     starts_a_ref, counts_a_ref, starts_b_ref, counts_b_ref,
                     novf_ref,
                     # inputs: (stream,) merged / (stream_a, stream_b) split,
                     # then overflow
                     *refs):
    """Transposed ("v4") block eval: every per-program value lives in
    (1, P) / (rows, P) layout — pixels ALWAYS on the lane dimension.

    The v1/v2/v3 kernels carry five (P, 1) accumulators through the
    stream loop; Mosaic lays a (1024, 1) f32 out as 128 vregs with one
    live lane each, so carry init + the per-block where-updates + the
    final (P, 1) -> (1, P) output transposes are ~all of the measured
    ~6 us/program fixed cost (batch 38/39: EMPTY streams cost the same
    as the real workload). Here a carry is 8 vregs, the winner pick is
    ONE (rows, BLOCK) x (BLOCK, P) MXU matmul, and the packed output
    write needs no transposes.

    Candidate-lane masking rides the depth coefficients: dead lanes
    (outside [lo, hi) or outside the record's tile-column extent) get
    their Z triple scaled to 0 and the constant coefficient shifted to
    -2, so the affine eval lands at Z = -2 and fails the cover test —
    no (BLOCK, 1)-shaped mask relayouts needed. Winner selection uses
    the v2 integer key (17-bit quantized reversed-Z << 7 | lane; the
    depth STORED is the winner's exact affine eval), so v4 output is
    v2-tie-compatible by construction."""
    if walk == "merged":
        stream_hbm, overflow_ref, *refs = refs
        streams = (stream_hbm, None)
    else:
        stream_a_hbm, stream_b_hbm, overflow_ref, *refs = refs
        streams = (stream_a_hbm, stream_b_hbm)
    if has_attrs:
        vis_ref, attr_ref, rec_ref, sem_ref = refs
    else:
        vis_ref, rec_ref, sem_ref = refs
        attr_ref = None
    P = tile_h * tile_w
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    cand = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    # tiles_pp > 1: several tiles SEQUENTIALLY per grid program — the
    # per-program fixed loop cost (r5 batch 1: zero-trip dynamic loops
    # cost ~4 µs/program, invariant under loop-count merging — a grid
    # pipelining stall, not per-construct work) amortizes over K tiles.
    g = pl.program_id(0)
    for j in range(tiles_pp):
        _tile_body(ntx, tile_h, tile_w, has_attrs, walk, probe,
                   deadblock_fix, attrw,
                   g * tiles_pp + j, j, P, lane, cand, pidx,
                   starts_a_ref, counts_a_ref, starts_b_ref, counts_b_ref,
                   novf_ref, streams, overflow_ref, rec_ref, sem_ref,
                   vis_ref, attr_ref)


def _tile_body(ntx, tile_h, tile_w, has_attrs, walk, probe,
               deadblock_fix, attrw, t, j, P,
               lane, cand, pidx,
               starts_a_ref, counts_a_ref, starts_b_ref, counts_b_ref,
               novf_ref, streams, overflow_ref, rec_ref, sem_ref,
               vis_ref, attr_ref):
    stream_hbm, stream_b_hbm = streams
    ty = t // ntx
    tx = t % ntx

    # pixel coefficient rows (3, P): px / py / 1 at pixel centers
    pxr = (pidx % tile_w).astype(jnp.float32) + (tx * tile_w) + 0.5
    pyr = (pidx // tile_w).astype(jnp.float32) + (ty * tile_h) + 0.5
    pixT = jnp.concatenate([pxr, pyr, jnp.ones_like(pxr)], axis=0)  # (3, P)
    txf = jnp.float32(tx)

    def eval_block(rec, lo, hi, carry):
        zT, triT, n1T, n2T, sT = carry[:5]
        ind = ((lane >= lo) & (lane < hi)
               & (rec[_R_TX0:_R_TX0 + 1, :] <= txf)
               & (rec[_R_TX1:_R_TX1 + 1, :] >= txf)).astype(jnp.float32)
        # dead-lane kill via the Z triple: Z' = ind·Z - 2·(1 - ind)
        zr = rec[_R_ZR:_R_ZR + 3, :] * ind
        zr = jnp.concatenate(
            [zr[0:2], zr[2:3] - 2.0 * (1.0 - ind)], axis=0)
        pieces = [rec[_R_F0:_R_F0 + 3, :], rec[_R_F1:_R_F1 + 3, :],
                  rec[_R_F2:_R_F2 + 3, :], zr]
        if has_attrs and attrw == "matmul":
            pieces += [rec[_R_N1:_R_N1 + 3, :], rec[_R_N2:_R_N2 + 3, :]]
        rhs = jnp.concatenate(pieces, axis=1)           # (3, k·BLOCK)
        ALL = jax.lax.dot_general(                       # (k·BLOCK, P)
            rhs, pixT, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        F0 = ALL[0 * BLOCK:1 * BLOCK]
        F1 = ALL[1 * BLOCK:2 * BLOCK]
        F2 = ALL[2 * BLOCK:3 * BLOCK]
        Z = ALL[3 * BLOCK:4 * BLOCK]
        cover = (F0 >= 0.0) & (F1 >= 0.0) & (F2 >= 0.0) \
            & (Z >= 0.0) & (Z <= 1.0)
        ki = (jnp.clip(Z * 131071.0, 0.0, 131071.0).astype(jnp.int32)
              << 7) | jnp.broadcast_to(cand, Z.shape)
        ki = jnp.where(cover, ki, -1)
        win = jnp.max(ki, axis=0, keepdims=True)         # (1, P)
        onehot = ((ki == win) & cover).astype(jnp.float32)

        # winner rows: [zr | n1 | n2 | f0+f1+f2 | tri | 1] in ONE matmul
        rows = jnp.concatenate(
            [rec[_R_ZR:_R_ZR + 3, :], rec[_R_N1:_R_N1 + 3, :],
             rec[_R_N2:_R_N2 + 3, :],
             rec[_R_F0:_R_F0 + 3, :] + rec[_R_F1:_R_F1 + 3, :]
             + rec[_R_F2:_R_F2 + 3, :],
             rec[_R_TRI:_R_TRI + 1, :],
             jnp.ones((1, BLOCK), jnp.float32)], axis=0)  # (14, BLOCK)
        picked = jax.lax.dot_general(                     # (14, P)
            rows, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        def affine(r0):
            return jnp.sum(picked[r0:r0 + 3] * pixT, axis=0, keepdims=True)

        hit = picked[13:14] > 0.5
        win_z = jnp.where(hit, affine(0), -1.0)
        take = win_z > zT
        zT = jnp.where(take, win_z, zT)
        n1T = jnp.where(take, affine(3), n1T)
        n2T = jnp.where(take, affine(6), n2T)
        sT = jnp.where(take, affine(9), sT)
        triT = jnp.where(take, picked[12:13], triT)
        out = (zT, triT, n1T, n2T, sT)
        if not has_attrs:
            return out

        # attribute ride-along, already channel-major: bary-numerator
        # weights per candidate, three (16, BLOCK) x (BLOCK, P) lerp
        # matmuls + one const pick, gated by `take` in (C, P) space.
        # The weight rows come from the WINNER's affine numerators
        # (already picked): onehot has one nonzero per pixel, so
        # N1 * onehot == affine(3) * onehot at every live position —
        # this drops N1/N2 from the main forms matmul entirely (ALL
        # shrinks (6·BLOCK, P) → (4·BLOCK, P), r5 eval diet). Last-ulp
        # deltas vs the old path are possible (MXU k=3 vs VPU 3-term
        # sum associativity); goldens gate it.
        lerpT, constT = carry[5:]
        if attrw == "matmul":
            N1 = ALL[4 * BLOCK:5 * BLOCK]
            N2 = ALL[5 * BLOCK:6 * BLOCK]
            W1 = N1 * onehot
            W2 = N2 * onehot
            W0 = (F0 + F1 + F2) * onehot - W1 - W2
        else:
            W1 = affine(3) * onehot
            W2 = affine(6) * onehot
            W0 = affine(9) * onehot - W1 - W2

        def pickT(r0, n, w):
            return jax.lax.dot_general(
                rec[r0:r0 + n, :], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        new_lerp = pickT(_R_A0, VPACK_ROWS, W0) \
            + pickT(_R_A1, VPACK_ROWS, W1) + pickT(_R_A2, VPACK_ROWS, W2)
        new_const = pickT(_R_AC, CONST_ROWS, onehot)
        t_f = take.astype(jnp.float32)                   # (1, P)
        lerpT = lerpT * (1.0 - t_f) + new_lerp * t_f
        constT = constT * (1.0 - t_f) + new_const * t_f
        return out + (lerpT, constT)

    if probe == "tinybody":
        # floor probe: loop-bound body (lo is iteration-dependent — not
        # DCE-able) with ~zero footprint
        def eval_block(rec, lo, hi, carry):  # noqa: F811
            return (carry[0] + jnp.float32(lo) * 1e-30,) + carry[1:]
    elif probe == "f0body":
        # floor probe: ONE (3,BLOCK)x(3,P) matmul body
        def eval_block(rec, lo, hi, carry):  # noqa: F811
            F0 = jax.lax.dot_general(
                rec[_R_F0:_R_F0 + 3, :], pixT,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (carry[0] + F0[0:1] * (jnp.float32(lo) * 1e-30),) \
                + carry[1:]

    zrow = jnp.zeros((1, P), jnp.float32)
    carry = (zrow, zrow - 1.0, zrow, zrow, zrow + 1.0)
    if has_attrs:
        carry = carry + (jnp.zeros((VPACK_ROWS, P), jnp.float32),
                         jnp.zeros((CONST_ROWS, P), jnp.float32))

    if probe == "noloops":
        pass  # floor probe: program skeleton + carry init + output writes
    elif probe == "bodyonce":
        # floor probe: the FULL eval body traced exactly once, no loop
        # constructs — discriminates "body cost needs a loop around it"
        # from "body presence costs per se" (flattened-grid viability)
        carry = eval_block(rec_ref[0], 0, 0, carry)
    elif walk == "merged":
        carry = _walk_streams_merged(
            eval_block, carry, rec_ref, sem_ref, stream_hbm, overflow_ref,
            starts_a_ref[t], counts_a_ref[t],
            starts_b_ref[ty], counts_b_ref[ty], novf_ref[0], probe=probe,
            deadblock_fix=deadblock_fix)
    else:
        carry = _walk_streams(eval_block, carry, rec_ref, sem_ref,
                              stream_hbm, stream_b_hbm, overflow_ref,
                              starts_a_ref[t], counts_a_ref[t],
                              starts_b_ref[ty], counts_b_ref[ty],
                              novf_ref[0], deadblock_fix=deadblock_fix)

    zT, triT, n1T, n2T, sT = carry[:5]
    miss = triT < 0.0
    s_safe = jnp.where(jnp.abs(sT) < 1e-20, 1e-20, sT)
    vis_ref[j] = jnp.concatenate(
        [jnp.where(miss, 0.0, zT),
         jnp.where(miss, -1.0, triT),
         jnp.where(miss, 0.0, n1T / s_safe),
         jnp.where(miss, 0.0, n2T / s_safe)], axis=0)
    if has_attrs:
        lerpT, constT = carry[5:]
        attr_ref[j] = jnp.concatenate(
            [lerpT / s_safe, constT], axis=0).astype(attr_ref.dtype)


def resolve_eval_mode(eval_mode: str = None) -> str:
    """Concrete raster block-eval variant: explicit setting, else env
    RASTER_EVAL, else "v4" (transposed kernel — batch 45 measured base
    57.9→39.2, headline 122.3→102.0 in-frame vs v1). Resolved OUTSIDE
    the jit so env-knob A/Bs retrace instead of silently reusing the
    previously traced kernel (eval_mode is the static cache key)."""
    if eval_mode is None:
        import os

        eval_mode = os.environ.get("RASTER_EVAL", "v4")
    return eval_mode


def resolve_walk(walk: str = None) -> str:
    """Stream-walk variant for the v4 kernel: "merged" (one combined
    A+B loop, one stream operand) or "split" (per-class loops).
    Env RASTER_WALK overrides; resolved outside the jit (static key)."""
    if walk is None:
        import os

        walk = os.environ.get("RASTER_WALK", "merged")
    return walk


def raster_tiles(bins, width, height, tile_h=8, tile_w=128, interpret=False,
                 eval_mode: str = None, raw: bool = False,
                 attr_bits: int = 32, walk: str = None, probe: str = None,
                 tiles_pp: int = None):
    import os

    if probe is None:
        probe = os.environ.get("RASTER_FLOOR_PROBE", "none")
    if tiles_pp is None:
        tiles_pp = int(os.environ.get("RASTER_TPP", "1"))
    return _raster_tiles(bins, width, height, tile_h=tile_h, tile_w=tile_w,
                         interpret=interpret,
                         eval_mode=resolve_eval_mode(eval_mode), raw=raw,
                         attr_bits=attr_bits, walk=resolve_walk(walk),
                         probe=probe, tiles_pp=tiles_pp,
                         deadblock_fix=_deadblock_fix(),
                         attrw=_attrw_mode())


_WARNED_DOWNGRADE = set()


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "tile_h", "tile_w",
                                    "interpret", "eval_mode", "raw",
                                    "attr_bits", "walk", "probe",
                                    "tiles_pp", "deadblock_fix",
                                    "attrw"))
def _raster_tiles(bins, width, height, tile_h=8, tile_w=128, interpret=False,
                  eval_mode: str = "v4", raw: bool = False,
                  attr_bits: int = 32, walk: str = "merged",
                  probe: str = "none", tiles_pp: int = 1,
                  deadblock_fix: bool = True, attrw: str = "matmul"):
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    ntiles = ntx * nty
    rows = bins["stream_a"].shape[1]
    has_attrs = rows > RECORD_ROWS
    if has_attrs and eval_mode not in ("v1", "v4"):
        # v2/v3 are vis-only probes: the attribute ride-along needs the
        # v1 winner logic or the v4 transposed kernel. Warn once per
        # downgraded mode (ADVICE r2) rather than silently substituting.
        if eval_mode not in _WARNED_DOWNGRADE:
            _WARNED_DOWNGRADE.add(eval_mode)
            from ..runtime.log import core as _log

            _log().warn("raster eval_mode downgraded for attr ride-along",
                        requested=eval_mode, used="v1")
        eval_mode = "v1"

    P = tile_h * tile_w
    if eval_mode != "v4":
        tiles_pp = 1
    K = tiles_pp
    # tiles_pp > 1 amortizes the per-program fixed loop cost (r5 batch
    # 1) over K sequential tiles; pad the tile axis so the grid divides
    ntiles_p = -(-ntiles // K) * K
    starts_a, counts_a = bins["starts_a"], bins["counts_a"]
    starts_b, counts_b = bins["starts_b"], bins["counts_b"]
    if ntiles_p != ntiles:
        starts_a = jnp.pad(starts_a, (0, ntiles_p - ntiles))
        counts_a = jnp.pad(counts_a, (0, ntiles_p - ntiles))
    if (ntiles_p - 1) // ntx >= nty:  # padded tiles can index row nty
        starts_b = jnp.pad(starts_b, (0, 1))
        counts_b = jnp.pad(counts_b, (0, 1))
    # one packed (4, P) visibility block per tile — P on the lane dim
    # (separate (P, 1) planes pad 128× in HBM; see kernel comment)
    out_specs = [
        pl.BlockSpec((K, 4, P), lambda t, *_: (t, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ntiles_p, 4, P), jnp.float32),
    ]
    if has_attrs:
        # 16-bit interpolated-attribute planes match the reference's
        # RGBA16F/R8G8B8A8 G-buffer MRTs (GBufferPass.cpp:24-56); the
        # (ntiles, 40, P) f32 output write was ~most of the kernel's
        # fixed per-program floor (batch 8: ~330 MB/frame)
        attr_dt = jnp.bfloat16 if attr_bits == 16 else jnp.float32
        out_specs.append(
            pl.BlockSpec((K, ATTR_OUT, P), lambda t, *_: (t, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((ntiles_p, ATTR_OUT, P), attr_dt))

    # merged walk: class-A/B blocks live in ONE combined stream (see
    # bin_candidates) — pass it once and walk it with one loop. v4 only;
    # the legacy kernels keep the split walk.
    merged = (eval_mode == "v4") and (walk == "merged")
    stream_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # combined stream
    stream_args = (bins["stream_a"],)
    if not merged:
        stream_specs = stream_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        stream_args = (bins["stream_a"], bins["stream_b"])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ntiles_p // K,),
        in_specs=stream_specs + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # class-C list
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, rows, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if eval_mode == "v4":
        kernel = functools.partial(_raster_kernel_t, ntx, tile_h, tile_w,
                                   has_attrs, walk if merged else "split",
                                   probe, K, deadblock_fix, attrw)
    else:
        kernel = functools.partial(_raster_kernel, ntx, tile_h, tile_w,
                                   eval_mode, has_attrs)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        # the block eval holds ~12 live (P, 128) f32 intermediates; at
        # tile_h > 8 (P > 1024) that overflows the 16 MB default
        # scoped-vmem budget (measured: th16 compile HTTP 500)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(32 * 1024 * 1024, 24 * P * 128 * 4)),
    )(starts_a, counts_a, starts_b, counts_b,
      bins["n_overflow"][None],
      *stream_args, bins["overflow"])
    if ntiles_p != ntiles:
        outs = [o[:ntiles] for o in outs]
    if raw:  # perf probes: kernel outputs without the (H, W) relayout
        return outs
    packed_vis = outs[0]                            # (ntiles, 4, P)

    def unflatten(x):
        img = x.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return img.reshape(nty * tile_h, ntx * tile_w)[:height, :width]

    vis = VisibilityBuffer(
        tri_id=unflatten(packed_vis[:, 1]).astype(jnp.int32),
        bary1=unflatten(packed_vis[:, 2]),
        bary2=unflatten(packed_vis[:, 3]),
        depth=unflatten(packed_vis[:, 0]),
    )
    if not has_attrs:
        return vis
    # (ntiles, C, P) → (H, W, C): one channel-last relayout feeding the
    # (elementwise) G-buffer math — replaces the 2M-row attr gather
    a = outs[1].reshape(nty, ntx, ATTR_OUT, tile_h, tile_w)
    a = a.transpose(0, 3, 1, 4, 2).reshape(
        nty * tile_h, ntx * tile_w, ATTR_OUT)[:height, :width]
    # 16-bit planes upcast at the consumer boundary (G-buffer math is f32)
    return vis, a.astype(jnp.float32)


def rasterize_binned(tris: ClippedTriangles, width: int, height: int,
                     tile_h: int = 8, tile_w: int = 128,
                     max_span: int = 4, max_rows: int = 16,
                     interpret: bool = False, attr_table=None,
                     eval_mode: str = None, attr_bits: int = 32,
                     **bin_kw):
    """Full binned pipeline: pack → 3-class bin → Pallas tile raster.

    Returns a VisibilityBuffer, or ``(vis, attrs)`` with ``attrs``
    (H, W, 40) interpolated G-buffer attributes when ``attr_table``
    (scene.raster_rows) rides along."""
    packed, bbox, valid = pack_candidates(tris, attr_table=attr_table)
    bins = bin_candidates(packed, bbox, valid, width, height, tile_h, tile_w,
                          max_span=max_span, max_rows=max_rows, **bin_kw)
    return raster_tiles(bins, width, height, tile_h=tile_h, tile_w=tile_w,
                        interpret=interpret, eval_mode=eval_mode,
                        attr_bits=attr_bits)
