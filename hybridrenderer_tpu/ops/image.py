"""Shared screen-space image helpers: shifts, bilinear gathers.

The building blocks of the stencil kernels (SVGF/TAA). Border handling is
clamp-to-edge, matching the shaders' coordinate clamps
(e.g. atrous.comp's ``clamp(ipos + offset, 0, size-1)``).
"""
from __future__ import annotations

import jax.numpy as jnp


def shift(img, dy: int, dx: int):
    """Clamp-to-edge shifted view: out[y, x] = img[y+dy, x+dx]."""
    H, W = img.shape[0], img.shape[1]
    ry = max(abs(dy), 1) if dy != 0 else 0
    rx = max(abs(dx), 1) if dx != 0 else 0
    pad = [(ry, ry), (rx, rx)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return p[ry + dy: ry + dy + H, rx + dx: rx + dx + W]


def sample_bilinear(img, uv, clamp=True):
    """Bilinear sample of an (H, W, C) or (H, W) image at uv ∈ [0,1]²
    (pixel centers at (i+0.5)/N), clamp-to-edge addressing."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[:2]
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def tap(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        return img[yi, xi]

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    out = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + \
          (c01 * (1 - fx) + c11 * fx) * fy
    return out[..., 0] if squeeze else out


def sample_nearest(img, uv):
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[:2]
    xi = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip((uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
    out = img[yi, xi]
    return out[..., 0] if squeeze else out


def pixel_uv_grid(height: int, width: int):
    """(H, W, 2) uv at pixel centers — the shaders' ``(ipos+0.5)/size``."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    u, v = jnp.meshgrid(xs, ys)
    return jnp.stack([u, v], axis=-1)
