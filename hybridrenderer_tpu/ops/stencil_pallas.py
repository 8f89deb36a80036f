"""Tiled stencil kernels (SVGF à-trous / moments / variance blur) — Pallas.

XLA's unrolled formulation of these filters (ops/svgf.py) materializes a
pad+slice pair per tap; at 1080p the 49-tap moments filter + 3 à-trous
iterations × 3 signals produce a >2 GB executable that fails to
serialize. These kernels process tile_h×tile_w-pixel tiles with an
explicit halo window instead:

  * input planes are stacked into (P, Hp+16, Wp+256) arrays, edge-padded
    in XLA (one full lane-tile of column halo keeps every DMA slice
    128-aligned; 8 rows of row halo keep sublane alignment),
  * each program DMAs its (P, tile_h+16, tile_w+256) window once,
  * taps are realized as static double-rolls + aligned slices of the
    in-register window (Mosaic supports static pltpu.roll; unaligned
    slices are not expressible).

Cost model (batch 34): the halo DMA over-fetches by
(tile_h+16)(tile_w+256) / (tile_h·tile_w) — 4.5× at the original
32×128 tile, 1.9× at 64×512 — and the XLA edge-pad materializes the
full stack per call. Two mitigations live here:

  * the tile size is a parameter (env SVGF_TILE, e.g. "64x512");
  * the STATIC edge-stopping planes (linear depth, ∂z, normal) are
    pre-padded ONCE via ``edge_stack`` and shared by the moments filter
    and every à-trous iteration — and, frame-wide, by all three signal
    chains (svgf.denoise threads them through).

Halo capacity is ±8 pixels — enough for à-trous steps 1..4 (offsets
2·step), the 7×7 moments filter and the 3×3 blur. Larger steps fall
back to the jnp path.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # rows/cols of usable halo


def _resolve_tile(tile):
    if tile is None:
        spec = _os.environ.get("SVGF_TILE", "32x128")
        th, tw = (int(x) for x in spec.split("x"))
    else:
        th, tw = tile
    assert th % 8 == 0 and tw % 128 == 0, (th, tw)
    return th, tw


def _grid_dims(height, width, th, tw):
    nty = -(-height // th)
    ntx = -(-width // tw)
    return nty, ntx, nty * th, ntx * tw


def _pad_stack(planes, height, width, th, tw):
    """[(H, W)] → (P, Hp+16, Wp+256) edge-padded stack (8-row / 128-col
    halo on the leading edge; trailing edge absorbs the grid pad)."""
    _, _, Hp, Wp = _grid_dims(height, width, th, tw)
    stacked = jnp.stack(planes, axis=0)
    return jnp.pad(
        stacked,
        ((0, 0), (8, Hp + 16 - 8 - height), (128, Wp + 256 - 128 - width)),
        mode="edge")


def _tap(window, dy: int, dx: int, th: int, tw: int):
    """(P, th+16, tw+256) window → (P, th, tw) tile shifted by (dy, dx).

    pltpu.roll requires non-negative shifts; circular wrap is harmless
    because |dy| ≤ 8 and |dx| ≤ 8 keep the slice inside the halo.
    """
    w = window
    if dy:
        w = pltpu.roll(w, (-dy) % w.shape[1], 1)
    if dx:
        w = pltpu.roll(w, (-dx) % w.shape[2], 2)
    return w[:, 8:8 + th, 128:128 + tw]


# static edge-stopping plane indices (edge_stack order)
_E_Z, _E_DERIV, _E_NX, _E_NY, _E_NZ = 0, 1, 2, 3, 4


def edge_stack(normal, motion_plane, tile=None):
    """Pre-padded (5, Hp+16, Wp+256) stack of the STATIC edge-stopping
    planes (linear depth, ∂z derivative, normal xyz). Build once per
    frame and pass to filter_moments / atrous via ``edges=`` — it is
    shared by every spatial-filter call of every signal chain."""
    th, tw = _resolve_tile(tile)
    H, W = motion_plane.shape[:2]
    return _pad_stack(
        [motion_plane[..., 2], motion_plane[..., 3],
         normal[..., 0], normal[..., 1], normal[..., 2]], H, W, th, tw)


def _stencil_call(kernel_body, dyn_stacked, edges, scalars, n_out, height,
                  width, interpret, th, tw):
    """Shared pallas_call wiring: grid over tiles, window DMA(s), N outputs.

    ``dyn_stacked`` is the per-call plane stack (pre-padded); ``edges``
    the shared static stack from edge_stack() or None. ``scalars`` is a
    small f32 vector landed in SMEM (traced parameters like the svgf phi
    constants — kernels cannot close over tracers)."""
    nty, ntx, Hp, Wp = _grid_dims(height, width, th, tw)
    Pd = dyn_stacked.shape[0]
    assert dyn_stacked.shape[1:] == (Hp + 16, Wp + 256), dyn_stacked.shape
    has_edges = edges is not None
    if has_edges:
        assert edges.shape[1:] == (Hp + 16, Wp + 256), (
            f"edge_stack built for a different tile/grid: {edges.shape}")
    scalars = jnp.asarray(scalars, jnp.float32)

    def kernel(scalars_ref, *refs):
        if has_edges:
            dyn_hbm, edge_hbm = refs[0], refs[1]
            out_refs = refs[2:2 + n_out]
            win_d, win_e, sems = refs[2 + n_out:2 + n_out + 3]
        else:
            dyn_hbm = refs[0]
            out_refs = refs[1:1 + n_out]
            win_d, sems = refs[1 + n_out:1 + n_out + 2]
            win_e = None
        t = pl.program_id(0)
        ty = t // ntx
        tx = t % ntx
        dma = pltpu.make_async_copy(
            dyn_hbm.at[:, pl.ds(ty * th, th + 16),
                       pl.ds(tx * tw, tw + 256)],
            win_d, sems.at[0])
        dma.start()
        if has_edges:
            dma_e = pltpu.make_async_copy(
                edge_hbm.at[:, pl.ds(ty * th, th + 16),
                            pl.ds(tx * tw, tw + 256)],
                win_e, sems.at[1])
            dma_e.start()
            dma.wait()
            dma_e.wait()
            kernel_body(win_d[...], win_e[...], out_refs, scalars_ref)
        else:
            dma.wait()
            kernel_body(win_d[...], None, out_refs, scalars_ref)

    out_spec = pl.BlockSpec((th, tw), lambda t, *_: (t // ntx, t % ntx))
    ins = [dyn_stacked] + ([edges] if has_edges else [])
    scratch = [pltpu.VMEM((Pd, th + 16, tw + 256), jnp.float32)]
    if has_edges:
        scratch.append(pltpu.VMEM((5, th + 16, tw + 256), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty * ntx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins),
        out_specs=[out_spec] * n_out,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * n_out,
        interpret=interpret,
    )(scalars, *ins)
    return [o[:height, :width] for o in outs]


# dynamic plane indices for the atrous/moments stacks
_P_R, _P_G, _P_B, _P_VAR, _P_LUMA = 0, 1, 2, 3, 4
_P_M1, _P_M2 = 5, 6  # moments filter only


def _luma(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


@functools.partial(jax.jit,
                   static_argnames=("step", "interpret", "tile"))
def atrous(signal, normal, motion_plane, step: int, svgf_phi,
           interpret: bool = False, tile=None, edges=None):
    """atrous.comp as a tile kernel; contract matches ops/svgf.atrous."""
    assert 2 * step <= HALO, "halo bound: use jnp path for larger steps"
    th, tw = _resolve_tile(tile)
    H, W = signal.shape[:2]
    r, g, b, var = (signal[..., i] for i in range(4))
    dyn = _pad_stack([r, g, b, var, _luma(r, g, b)], H, W, th, tw)
    if edges is None:
        edges = edge_stack(normal, motion_plane, (th, tw))
    kw = [3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0]

    def body(win, ewin, outs, scalars):
        phi_l_scale = scalars[1]
        phi_n = scalars[2]
        c = win[:, 8:8 + th, 128:128 + tw]
        e = ewin[:, 8:8 + th, 128:128 + tw]
        luma_c = c[_P_LUMA]
        var_c = c[_P_VAR]
        z_c = e[_E_Z]
        deriv = e[_E_DERIV]
        phi_luma = phi_l_scale * jnp.sqrt(jnp.maximum(0.0, 1e-10 + var_c)) + 1e-6
        phi_z_base = jnp.maximum(deriv, 1e-8) * float(step) + 1e-6

        w_center = kw[0] * kw[0]
        sum_w = jnp.full_like(luma_c, w_center)
        acc_r = c[_P_R] * w_center
        acc_g = c[_P_G] * w_center
        acc_b = c[_P_B] * w_center
        acc_v = var_c * w_center
        for yy in range(-2, 3):
            for xx in range(-2, 3):
                if xx == 0 and yy == 0:
                    continue
                p = _tap(win, yy * step, xx * step, th, tw)
                pe = _tap(ewin, yy * step, xx * step, th, tw)
                k = kw[abs(xx)] * kw[abs(yy)]
                dist = float((xx * xx + yy * yy) ** 0.5)
                ndot = jnp.maximum(
                    0.0, e[_E_NX] * pe[_E_NX] + e[_E_NY] * pe[_E_NY]
                    + e[_E_NZ] * pe[_E_NZ])
                w_n = ndot ** phi_n
                w_z = jnp.abs(z_c - pe[_E_Z]) / (phi_z_base * dist)
                w_l = jnp.abs(luma_c - p[_P_LUMA]) / phi_luma
                w = jnp.exp(-w_l - w_z) * w_n * k
                sum_w = sum_w + w
                acc_r = acc_r + p[_P_R] * w
                acc_g = acc_g + p[_P_G] * w
                acc_b = acc_b + p[_P_B] * w
                acc_v = acc_v + p[_P_VAR] * w * w

        bg = (z_c == 0.0) | (z_c > 1000.0)
        outs[0][...] = jnp.where(bg, c[_P_R], acc_r / sum_w)
        outs[1][...] = jnp.where(bg, c[_P_G], acc_g / sum_w)
        outs[2][...] = jnp.where(bg, c[_P_B], acc_b / sum_w)
        outs[3][...] = jnp.where(bg, var_c, acc_v / (sum_w * sum_w))

    r2, g2, b2, v2 = _stencil_call(body, dyn, edges, svgf_phi, 4, H, W,
                                   interpret, th, tw)
    return jnp.stack([r2, g2, b2, v2], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def filter_moments(signal, moments, normal, motion_plane, svgf_phi,
                   interpret: bool = False, tile=None, edges=None):
    """filter_moments.comp (7×7) tile kernel; matches ops/svgf.filter_moments."""
    th, tw = _resolve_tile(tile)
    H, W = signal.shape[:2]
    r, g, b = (signal[..., i] for i in range(3))
    dyn = _pad_stack([r, g, b, signal[..., 3], _luma(r, g, b),
                      moments[..., 0], moments[..., 1]], H, W, th, tw)
    if edges is None:
        edges = edge_stack(normal, motion_plane, (th, tw))

    def body(win, ewin, outs, scalars):
        phi_luma = scalars[0]
        phi_n = scalars[2]
        c = win[:, 8:8 + th, 128:128 + tw]
        e = ewin[:, 8:8 + th, 128:128 + tw]
        luma_c = c[_P_LUMA]
        z_c = e[_E_Z]
        phi_z_base = jnp.maximum(e[_E_DERIV], 1e-8) * 3.0

        sum_w = jnp.zeros_like(luma_c)
        acc = [jnp.zeros_like(luma_c) for _ in range(5)]  # r g b m1 m2
        for yy in range(-3, 4):
            for xx in range(-3, 4):
                p = _tap(win, yy, xx, th, tw)
                pe = _tap(ewin, yy, xx, th, tw)
                dist = float((xx * xx + yy * yy) ** 0.5)
                ndot = jnp.maximum(
                    0.0, e[_E_NX] * pe[_E_NX] + e[_E_NY] * pe[_E_NY]
                    + e[_E_NZ] * pe[_E_NZ])
                w_n = ndot ** phi_n
                w_z = jnp.abs(z_c - pe[_E_Z]) / (phi_z_base * dist + 1e-6)
                w_l = jnp.abs(luma_c - p[_P_LUMA]) / phi_luma
                w = jnp.exp(-w_l - w_z) * w_n
                sum_w = sum_w + w
                for i, pi in enumerate((_P_R, _P_G, _P_B, _P_M1, _P_M2)):
                    acc[i] = acc[i] + p[pi] * w

        sum_w = jnp.maximum(sum_w, 1e-6)
        m1 = acc[3] / sum_w
        m2 = acc[4] / sum_w
        variance = jnp.maximum(0.0, m2 - m1 * m1)
        bg = z_c == 0.0
        outs[0][...] = jnp.where(bg, c[_P_R], acc[0] / sum_w)
        outs[1][...] = jnp.where(bg, c[_P_G], acc[1] / sum_w)
        outs[2][...] = jnp.where(bg, c[_P_B], acc[2] / sum_w)
        outs[3][...] = jnp.where(bg, c[_P_VAR], variance)
        outs[4][...] = m1
        outs[5][...] = m2

    r2, g2, b2, v2, m1, m2 = _stencil_call(body, dyn, edges, svgf_phi, 6,
                                           H, W, interpret, th, tw)
    hlen = moments[..., 3]
    variance = jnp.where(hlen < 4.0, v2 * (4.0 / jnp.maximum(1.0, hlen)), v2)
    bg = motion_plane[..., 2] == 0.0
    variance = jnp.where(bg, signal[..., 3], variance)
    out_signal = jnp.stack([r2, g2, b2, variance], axis=-1)
    out_moments = jnp.stack([m1, m2, variance, hlen], axis=-1)
    return out_signal, out_moments


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def variance_blur(moments, interpret: bool = False, tile=None):
    """variance_blur.comp (3×3 blur/max hybrid) tile kernel."""
    th, tw = _resolve_tile(tile)
    H, W = moments.shape[:2]
    dyn = _pad_stack([moments[..., 2]], H, W, th, tw)
    kernel1d = [1.0, 2.0, 1.0]

    def body(win, ewin, outs, scalars):
        blurred = jnp.zeros((th, tw), jnp.float32)
        vmax = jnp.full((th, tw), -jnp.inf)
        wsum = 0.0
        for yy in (-1, 0, 1):
            for xx in (-1, 0, 1):
                v = _tap(win, yy, xx, th, tw)[0]
                w = kernel1d[xx + 1] * kernel1d[yy + 1]
                blurred = blurred + v * w
                vmax = jnp.maximum(vmax, v)
                wsum += w
        outs[0][...] = 0.5 * (blurred / wsum) + 0.5 * vmax

    (mixed,) = _stencil_call(body, dyn, None, jnp.zeros(4), 1, H, W,
                             interpret, th, tw)
    return moments.at[..., 2].set(mixed)


def available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
