"""Tiled stencil kernels (SVGF à-trous / moments / variance blur) — Pallas.

XLA's unrolled formulation of these filters (ops/svgf.py) materializes a
pad+slice pair per tap; at 1080p the 49-tap moments filter + 3 à-trous
iterations × 3 signals produce a >2 GB executable that fails to
serialize. These kernels process 8×128-pixel tiles with an explicit
halo window instead:

  * all input planes are stacked into one (P, H+16, W+256) array,
    edge-padded in XLA (one full lane-tile of column halo keeps every
    DMA slice 128-aligned; 8 rows of row halo keep sublane alignment),
  * each program DMAs its (P, 24, 384) window once,
  * taps are realized as static double-rolls + aligned slices of the
    in-register window (Mosaic supports static pltpu.roll; unaligned
    slices are not expressible).

Halo capacity is ±8 pixels — enough for à-trous steps 1..4 (offsets
2·step), the 7×7 moments filter and the 3×3 blur. Larger steps fall
back to the jnp path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32
TILE_W = 128
HALO = 8  # rows/cols of usable halo (window = (24, 384))


def _pad_stack(planes):
    """[(H, W)] → (P, H+2*8, W+2*128) edge-padded stack."""
    stacked = jnp.stack(planes, axis=0)
    return jnp.pad(stacked, ((0, 0), (8, 8), (128, 128)), mode="edge")


def _tap(window, dy: int, dx: int):
    """(P, 24, 384) window → (P, 8, 128) tile shifted by (dy, dx).

    pltpu.roll requires non-negative shifts; circular wrap is harmless
    because |dy| ≤ 8 and |dx| ≤ 8 keep the slice inside the halo.
    """
    w = window
    if dy:
        w = pltpu.roll(w, (-dy) % w.shape[1], 1)
    if dx:
        w = pltpu.roll(w, (-dx) % w.shape[2], 2)
    return w[:, 8:8 + TILE_H, 128:128 + TILE_W]


def _stencil_call(kernel_body, stacked, scalars, n_out, height, width,
                  interpret):
    """Shared pallas_call wiring: grid over tiles, window DMA, N outputs.

    ``scalars`` is a small f32 vector landed in SMEM (traced parameters
    like the svgf phi constants — kernels cannot close over tracers).
    """
    P = stacked.shape[0]
    nty = -(-height // TILE_H)
    ntx = -(-width // TILE_W)
    Hp = nty * TILE_H
    Wp = ntx * TILE_W
    if stacked.shape[1] != Hp + 16 or stacked.shape[2] != Wp + 256:
        stacked = jnp.pad(
            stacked,
            ((0, 0), (0, Hp + 16 - stacked.shape[1]),
             (0, Wp + 256 - stacked.shape[2])), mode="edge")
    scalars = jnp.asarray(scalars, jnp.float32)

    def kernel(scalars_ref, stacked_hbm, *refs):
        out_refs = refs[:n_out]
        win_ref, sem = refs[n_out], refs[n_out + 1]
        t = pl.program_id(0)
        ty = t // ntx
        tx = t % ntx
        dma = pltpu.make_async_copy(
            stacked_hbm.at[:, pl.ds(ty * TILE_H, TILE_H + 16),
                           pl.ds(tx * TILE_W, TILE_W + 256)],
            win_ref, sem)
        dma.start()
        dma.wait()
        kernel_body(win_ref[...], out_refs, scalars_ref)

    out_spec = pl.BlockSpec((TILE_H, TILE_W), lambda t, *_: (t // ntx, t % ntx))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty * ntx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((P, TILE_H + 16, TILE_W + 256), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * n_out,
        interpret=interpret,
    )(scalars, stacked)
    return [o[:height, :width] for o in outs]


# plane indices for the atrous/moments stacks
_P_R, _P_G, _P_B, _P_VAR, _P_LUMA, _P_Z, _P_DERIV = 0, 1, 2, 3, 4, 5, 6
_P_NX, _P_NY, _P_NZ = 7, 8, 9
_P_M1, _P_M2 = 10, 11  # moments filter only


def _luma(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


@functools.partial(jax.jit, static_argnames=("step", "interpret"))
def atrous(signal, normal, motion_plane, step: int, svgf_phi,
           interpret: bool = False):
    """atrous.comp as a tile kernel; contract matches ops/svgf.atrous."""
    assert 2 * step <= HALO, "halo bound: use jnp path for larger steps"
    H, W = signal.shape[:2]
    r, g, b, var = (signal[..., i] for i in range(4))
    planes = [r, g, b, var, _luma(r, g, b),
              motion_plane[..., 2], motion_plane[..., 3],
              normal[..., 0], normal[..., 1], normal[..., 2]]
    stacked = _pad_stack(planes)
    kw = [3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0]

    def body(win, outs, scalars):
        phi_l_scale = scalars[1]
        phi_n = scalars[2]
        c = win[:, 8:8 + TILE_H, 128:128 + TILE_W]
        luma_c = c[_P_LUMA]
        var_c = c[_P_VAR]
        z_c = c[_P_Z]
        deriv = c[_P_DERIV]
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
                p = _tap(win, yy * step, xx * step)
                k = kw[abs(xx)] * kw[abs(yy)]
                dist = float((xx * xx + yy * yy) ** 0.5)
                ndot = jnp.maximum(
                    0.0, c[_P_NX] * p[_P_NX] + c[_P_NY] * p[_P_NY]
                    + c[_P_NZ] * p[_P_NZ])
                w_n = ndot ** phi_n
                w_z = jnp.abs(z_c - p[_P_Z]) / (phi_z_base * dist)
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

    r2, g2, b2, v2 = _stencil_call(body, stacked, svgf_phi, 4, H, W,
                                   interpret)
    return jnp.stack([r2, g2, b2, v2], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def filter_moments(signal, moments, normal, motion_plane, svgf_phi,
                   interpret: bool = False):
    """filter_moments.comp (7×7) tile kernel; matches ops/svgf.filter_moments."""
    H, W = signal.shape[:2]
    r, g, b = (signal[..., i] for i in range(3))
    planes = [r, g, b, signal[..., 3], _luma(r, g, b),
              motion_plane[..., 2], motion_plane[..., 3],
              normal[..., 0], normal[..., 1], normal[..., 2],
              moments[..., 0], moments[..., 1]]
    stacked = _pad_stack(planes)

    def body(win, outs, scalars):
        phi_luma = scalars[0]
        phi_n = scalars[2]
        c = win[:, 8:8 + TILE_H, 128:128 + TILE_W]
        luma_c = c[_P_LUMA]
        z_c = c[_P_Z]
        phi_z_base = jnp.maximum(c[_P_DERIV], 1e-8) * 3.0

        sum_w = jnp.zeros_like(luma_c)
        acc = [jnp.zeros_like(luma_c) for _ in range(5)]  # r g b m1 m2
        for yy in range(-3, 4):
            for xx in range(-3, 4):
                p = _tap(win, yy, xx)
                dist = float((xx * xx + yy * yy) ** 0.5)
                ndot = jnp.maximum(
                    0.0, c[_P_NX] * p[_P_NX] + c[_P_NY] * p[_P_NY]
                    + c[_P_NZ] * p[_P_NZ])
                w_n = ndot ** phi_n
                w_z = jnp.abs(z_c - p[_P_Z]) / (phi_z_base * dist + 1e-6)
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

    r2, g2, b2, v2, m1, m2 = _stencil_call(body, stacked, svgf_phi, 6, H, W,
                                           interpret)
    hlen = moments[..., 3]
    variance = jnp.where(hlen < 4.0, v2 * (4.0 / jnp.maximum(1.0, hlen)), v2)
    bg = motion_plane[..., 2] == 0.0
    variance = jnp.where(bg, signal[..., 3], variance)
    out_signal = jnp.stack([r2, g2, b2, variance], axis=-1)
    out_moments = jnp.stack([m1, m2, variance, hlen], axis=-1)
    return out_signal, out_moments


@functools.partial(jax.jit, static_argnames=("interpret",))
def variance_blur(moments, interpret: bool = False):
    """variance_blur.comp (3×3 blur/max hybrid) tile kernel."""
    H, W = moments.shape[:2]
    stacked = _pad_stack([moments[..., 2]])
    kernel1d = [1.0, 2.0, 1.0]

    def body(win, outs, scalars):
        blurred = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        vmax = jnp.full((TILE_H, TILE_W), -jnp.inf)
        wsum = 0.0
        for yy in (-1, 0, 1):
            for xx in (-1, 0, 1):
                v = _tap(win, yy, xx)[0]
                w = kernel1d[xx + 1] * kernel1d[yy + 1]
                blurred = blurred + v * w
                vmax = jnp.maximum(vmax, v)
                wsum += w
        outs[0][...] = 0.5 * (blurred / wsum) + 0.5 * vmax

    (mixed,) = _stencil_call(body, stacked, jnp.zeros(4), 1, H, W, interpret)
    return moments.at[..., 2].set(mixed)


def available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
