"""Windowed temporal-reprojection kernel (SVGF temporal / TAA history
fetch) — the Pallas answer to per-pixel history gathers.

The XLA formulation gathers one packed history row per pixel
(temporal.comp:95-113 deferred): row gathers cost ~26-55 ns PER ROW on
this hardware regardless of width, ~203 ms for 2M rows at 1080p. This
kernel exploits that reprojection offsets are *locally smooth*: per
32×128-pixel tile, all bilinear footprints lie in a small window around
the tile's minimum footprint base. XLA extracts one (12, 48, 256)
history window per tile (a 510-row batched dynamic-slice — windows have
no alignment constraint, unlike Mosaic DMAs whose dynamic offsets must
be tile-aligned), and the kernel resolves every pixel's 2×2 bilinear
footprint as a static (RANGE+1)² candidate sweep: for each candidate
offset, a static double-roll of the window plus a masked multiply-add —
the same shape as the SVGF stencil kernels (stencil_pallas._tap), whose
49-tap sweep costs 3 ms at 1080p.

Pixels whose footprint base strays ≥ RANGE pixels from their tile's
minimum fall back to "no history" exactly like an off-screen footprint.
Usually those are motion discontinuities (disocclusions, object
boundaries) where ID/depth/normal validation rejects history anyway —
but smooth high-gradient motion (fast zoom/rotation whose base offset
varies > RANGE px across one 32×128 tile) also exceeds the window and
drops valid history: a quality regression vs the per-pixel gather, not
a correctness break. Callers can force svgf gather="pixel" for such
frames.

hpack plane order: sig0..3, m1, m2, hlen, nx, ny, nz, z, oid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32
TILE_W = 128
WIN_H = 48
WIN_W = 256
RANGE = 8   # footprint-base residuals [0, RANGE) are resolved exactly
NP = 12     # history planes


def _lane_tap(w, dx: int):
    """(NP, TILE_H, WIN_W) row-resolved window → (NP, TILE_H, TILE_W)
    at lane offset dx; static roll + aligned slice (Mosaic-safe)."""
    if dx:
        w = pltpu.roll(w, (-dx) % WIN_W, 2)
    return w[:, :, :TILE_W]


def _kernel(K: int, rng: int,
            # scalar prefetch
            y0_ref, x0_ref,
            # inputs
            val_ref, sig_ref, fields_ref,
            # outputs: K × (sig0..3, m1, m2, hlen), then shared wsum
            *out_refs):
    """K-signal fused reprojection. Two window stacks per tile: the 5
    shared f32 validation planes (prev nx, ny, nz, z, oid — oid needs
    exact integer compares) and the K 7-plane signal packs (sig0..3,
    m1, m2, hlen) in their STORAGE dtype — bf16 when svgf_bits=16, the
    analog of the reference's RGBA16F SVGF images (SVGFPass.cpp:24-164),
    halving the window traffic; accumulation stays f32. The candidate
    sweep, bilinear weights, and is_valid_reprojection tests depend
    only on motion and the shared planes — identical for every signal —
    so fusing the SVGF chains' temporal fetches computes them ONCE
    (batch 36/37)."""
    t = pl.program_id(0)
    f = fields_ref[0]
    by = f[0]
    bx = f[1]
    fy = f[2]
    fx = f[3]
    ok = f[4] > 0.5
    nx, ny, nz = f[5], f[6], f[7]
    z_c = f[8]
    oid_c = f[9]

    # residual footprint offset RELATIVE TO THE PIXEL: the window is
    # anchored so that a pixel's tap sits at window row (rdy + i + oy)
    # for local row i — i.e. taps are stencil-style pixel-aligned rolls
    # (no f32 iota on Mosaic — build int and convert)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) \
        .astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) \
        .astype(jnp.float32)
    rdy = by - y0_ref[t].astype(jnp.float32) - iy
    rdx = bx - x0_ref[t].astype(jnp.float32) - ix
    in_range = (rdy >= 0) & (rdy < rng) & (rdx >= 0) & (rdx < rng) & ok

    val_w = val_ref[0]
    # upcast ONCE at the VMEM read: the HBM window traffic stays in the
    # storage dtype (the win), while rolls/taps run f32 (Mosaic's rolls
    # on bf16 rank-3 windows failed to compile — r3 batch 9)
    sig_w = sig_ref[0].astype(jnp.float32)

    accs = [jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for _ in range(7 * K + 1)]
    for dy_c in range(rng + 1):
        wy = jnp.where(rdy == dy_c, 1.0 - fy, 0.0) \
            + jnp.where(rdy + 1.0 == dy_c, fy, 0.0)
        vrow = pltpu.roll(val_w, (-dy_c) % WIN_H, 1) if dy_c else val_w
        srow = pltpu.roll(sig_w, (-dy_c) % WIN_H, 1) if dy_c else sig_w
        # slice to tile height before the lane rolls: shrinks the
        # per-candidate temporaries the unrolled body keeps live
        vrow = vrow[:, :TILE_H, :]
        srow = srow[:, :TILE_H, :]
        for dx_c in range(rng + 1):
            wx = jnp.where(rdx == dx_c, 1.0 - fx, 0.0) \
                + jnp.where(rdx + 1.0 == dx_c, fx, 0.0)
            tap = _lane_tap(vrow, dx_c)
            # is_valid_reprojection (temporal.comp:45-62) — once per
            # candidate, shared by all K signals
            ndot = tap[0] * nx + tap[1] * ny + tap[2] * nz
            okv = (tap[4] == oid_c) & (ndot >= 0.95) \
                & (jnp.abs(z_c - tap[3]) / (z_c + 1e-6) <= 0.05)
            w_eff = jnp.where(in_range & okv, wy * wx, 0.0)
            taps = _lane_tap(srow, dx_c)
            for k in range(K):
                for c in range(7):
                    accs[7 * k + c] = accs[7 * k + c] \
                        + w_eff * taps[7 * k + c]
            accs[7 * K] = accs[7 * K] + w_eff

    for c in range(7 * K + 1):
        out_refs[c][...] = accs[c]


def reproject_multi(val_pm, sig_pms, by, bx, fy, fx, ok, normal, z, oid,
                    interpret: bool = False, range_px: int = RANGE):
    """Fused windowed bilinear history reprojection for K signals.

    val_pm: (5, H, W) f32 shared validation planes (prev normal xyz,
    prev linear depth, prev object id). sig_pms: list of K (7, H, W)
    per-signal packs (sig0..3, m1, m2, hlen). by/bx: per-pixel
    footprint base (i32, clamped to [0, dim-2]); fy/fx: bilinear
    fractions; ok: footprint fully on-screen. normal (H, W, 3),
    z (H, W), oid (H, W) — current-frame validation.

    The footprint bases, bilinear weights, and validation depend only
    on motion + the shared planes, so all K signals resolve in ONE
    candidate sweep (the SVGF chains' temporal fetch, batch 36/37).

    Returns ([K × (hist_sig (H,W,4), hist_mom (H,W,2), hist_len)],
    weight_sum).
    """
    K = len(sig_pms)
    H, W = by.shape
    nty = -(-H // TILE_H)
    ntx = -(-W // TILE_W)
    nt = nty * ntx
    Hp, Wp = nty * TILE_H, ntx * TILE_W
    NPK = 5 + 7 * K

    def pad2(x, fill):
        return jnp.pad(x, ((0, Hp - H), (0, Wp - W)), constant_values=fill)

    # window anchor per tile: tile origin + the minimum pixel-relative
    # footprint offset (so every smooth-motion tap lands at window row
    # rdy + i + oy with rdy in [0, RANGE))
    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    big = jnp.int32(1 << 20)
    off_y = pad2(jnp.where(ok, by - ys, big), big)
    off_x = pad2(jnp.where(ok, bx - xs, big), big)
    m_y = off_y.reshape(nty, TILE_H, ntx, TILE_W).min((1, 3))
    m_x = off_x.reshape(nty, TILE_H, ntx, TILE_W).min((1, 3))
    # anchors may go NEGATIVE (valid bases minus a pixel's own position
    # bottom out at -(tile extent)); the history is padded by one tile
    # on top/left so the slice start (anchor + tile extent) stays >= 0 —
    # clipping the anchor instead would break the rdy/rdx relation for
    # every pixel in an edge tile
    trow = jnp.arange(nty, dtype=jnp.int32)[:, None] * TILE_H
    tcol = jnp.arange(ntx, dtype=jnp.int32)[None, :] * TILE_W
    y0 = jnp.clip(trow + m_y, -TILE_H, Hp).reshape(-1)
    x0 = jnp.clip(tcol + m_x, -TILE_W, Wp).reshape(-1)

    # per-tile history windows: batched dynamic-slice, TWO stacks — the
    # validation planes stay f32 (bf16's 8-bit mantissa would alias
    # object ids > 256), the signal packs keep their STORAGE dtype
    # (bf16 when svgf_bits=16 — the reference's RGBA16F analog)
    sig_dt = sig_pms[0].dtype if sig_pms else jnp.float32
    NSIG = NPK - 5

    def tile_windows(planes, n):
        hq = jnp.pad(planes, ((0, 0), (TILE_H, Hp + WIN_H - H),
                              (TILE_W, Wp + WIN_W - W)), mode="edge")
        return jax.vmap(
            lambda y, x: jax.lax.dynamic_slice(
                hq, (0, y + TILE_H, x + TILE_W), (n, WIN_H, WIN_W))
        )(y0, x0)                                # (nt, n, WIN_H, WIN_W)

    win_val = tile_windows(val_pm.astype(jnp.float32), 5)
    win_sig = tile_windows(
        jnp.concatenate([p.astype(sig_dt) for p in sig_pms], axis=0),
        NSIG)

    fields = jnp.stack([
        pad2(by, big).astype(jnp.float32),
        pad2(bx, big).astype(jnp.float32),
        pad2(fy, 0.0), pad2(fx, 0.0),
        pad2(ok, False).astype(jnp.float32),
        pad2(normal[..., 0], 0.0), pad2(normal[..., 1], 0.0),
        pad2(normal[..., 2], 0.0),
        pad2(z, 0.0), pad2(oid.astype(jnp.float32), -1.0),
    ], axis=0)                                   # (10, Hp, Wp)

    n_out = 7 * K + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 5, WIN_H, WIN_W), lambda t, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, NSIG, WIN_H, WIN_W),
                         lambda t, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, 10, TILE_H, TILE_W),
                         lambda t, *_: (0, 0, t // ntx, t % ntx)),
        ],
        out_specs=[pl.BlockSpec((TILE_H, TILE_W),
                                lambda t, *_: (t // ntx, t % ntx))] * n_out,
    )
    assert 0 < range_px <= RANGE
    outs = pl.pallas_call(
        functools.partial(_kernel, K, range_px),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * n_out,
        interpret=interpret,
        # the unrolled 81-candidate body's temporaries exceed the 16 MB
        # default scoped-vmem budget; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(y0, x0, win_val, win_sig, fields[None])

    outs = [o[:H, :W] for o in outs]
    results = []
    for k in range(K):
        o = outs[7 * k:7 * k + 7]
        results.append((jnp.stack(o[0:4], axis=-1),
                        jnp.stack(o[4:6], axis=-1), o[6]))
    return results, outs[7 * K]


@functools.partial(jax.jit, static_argnames=("interpret", "range_px"))
def reproject(hpack_pm, by, bx, fy, fx, ok, normal, z, oid,
              interpret: bool = False, range_px: int = RANGE):
    """Single-signal wrapper over reproject_multi (back-compat).

    hpack_pm: (12, H, W) f32 plane-major packed history in the legacy
    order sig0..3, m1, m2, hlen, nx, ny, nz, z, oid.

    Returns (hist_sig (H,W,4), hist_mom (H,W,2), hist_len, weight_sum).
    """
    results, wsum = reproject_multi(
        hpack_pm[7:12], [hpack_pm[0:7]], by, bx, fy, fx, ok, normal, z,
        oid, interpret=interpret, range_px=range_px)
    hist_sig, hist_mom, hist_len = results[0]
    return hist_sig, hist_mom, hist_len, wsum


def _sample_kernel(P: int,
                   # scalar prefetch
                   y0_ref, x0_ref,
                   # inputs
                   win_ref, fields_ref,
                   # outputs: P planes + wsum
                   *out_refs):
    """Validation-free variant of _kernel: plain windowed bilinear of P
    planes (the TAA history fetch, taa.comp:95-103 sampling)."""
    t = pl.program_id(0)
    f = fields_ref[0]
    by, bx, fy, fx = f[0], f[1], f[2], f[3]
    ok = f[4] > 0.5

    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) \
        .astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) \
        .astype(jnp.float32)
    rdy = by - y0_ref[t].astype(jnp.float32) - iy
    rdx = bx - x0_ref[t].astype(jnp.float32) - ix
    in_range = (rdy >= 0) & (rdy < RANGE) & (rdx >= 0) & (rdx < RANGE) & ok

    w32 = win_ref[0]
    accs = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(P + 1)]
    for dy_c in range(RANGE + 1):
        wy = jnp.where(rdy == dy_c, 1.0 - fy, 0.0) \
            + jnp.where(rdy + 1.0 == dy_c, fy, 0.0)
        wrow = pltpu.roll(w32, (-dy_c) % WIN_H, 1) if dy_c else w32
        wrow = wrow[:, :TILE_H, :]
        for dx_c in range(RANGE + 1):
            wx = jnp.where(rdx == dx_c, 1.0 - fx, 0.0) \
                + jnp.where(rdx + 1.0 == dx_c, fx, 0.0)
            tap = _lane_tap(wrow, dx_c)
            w_eff = jnp.where(in_range, wy * wx, 0.0)
            for c in range(P):
                accs[c] = accs[c] + w_eff * tap[c]
            accs[P] = accs[P] + w_eff

    for c in range(P + 1):
        out_refs[c][...] = accs[c]


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_sample(planes_pm, by, bx, fy, fx, ok, interpret: bool = False):
    """Windowed per-pixel bilinear gather WITHOUT reprojection validation
    — the generalized TAA history fetch.

    planes_pm: (P, H, W) f32 plane-major. by/bx: footprint base (i32,
    clamped to [0, dim-2]); fy/fx: bilinear fractions; ok: footprint
    fully on-screen. Returns (samples (P, H, W), wsum (H, W)); wsum < 1
    marks pixels whose footprint fell outside the tile window (treat as
    no-history, same as off-screen).
    """
    P = planes_pm.shape[0]
    H, W = by.shape
    nty = -(-H // TILE_H)
    ntx = -(-W // TILE_W)
    nt = nty * ntx
    Hp, Wp = nty * TILE_H, ntx * TILE_W

    def pad2(x, fill):
        return jnp.pad(x, ((0, Hp - H), (0, Wp - W)), constant_values=fill)

    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    big = jnp.int32(1 << 20)
    off_y = pad2(jnp.where(ok, by - ys, big), big)
    off_x = pad2(jnp.where(ok, bx - xs, big), big)
    m_y = off_y.reshape(nty, TILE_H, ntx, TILE_W).min((1, 3))
    m_x = off_x.reshape(nty, TILE_H, ntx, TILE_W).min((1, 3))
    trow = jnp.arange(nty, dtype=jnp.int32)[:, None] * TILE_H
    tcol = jnp.arange(ntx, dtype=jnp.int32)[None, :] * TILE_W
    y0 = jnp.clip(trow + m_y, -TILE_H, Hp).reshape(-1)
    x0 = jnp.clip(tcol + m_x, -TILE_W, Wp).reshape(-1)

    hq = jnp.pad(planes_pm,
                 ((0, 0), (TILE_H, Hp + WIN_H - H), (TILE_W, Wp + WIN_W - W)),
                 mode="edge")
    windows = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(
            hq, (0, y + TILE_H, x + TILE_W), (P, WIN_H, WIN_W))
    )(y0, x0)

    fields = jnp.stack([
        pad2(by, big).astype(jnp.float32),
        pad2(bx, big).astype(jnp.float32),
        pad2(fy, 0.0), pad2(fx, 0.0),
        pad2(ok, False).astype(jnp.float32),
    ], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, P, WIN_H, WIN_W), lambda t, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, 5, TILE_H, TILE_W),
                         lambda t, *_: (0, 0, t // ntx, t % ntx)),
        ],
        out_specs=[pl.BlockSpec((TILE_H, TILE_W),
                                lambda t, *_: (t // ntx, t % ntx))] * (P + 1),
    )
    outs = pl.pallas_call(
        functools.partial(_sample_kernel, P),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * (P + 1),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(y0, x0, windows, fields[None])

    outs = [o[:H, :W] for o in outs]
    return jnp.stack(outs[:P], axis=0), outs[P]


def available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
