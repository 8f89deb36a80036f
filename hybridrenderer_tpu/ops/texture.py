"""Texture sampling over the bindless TextureStack.

Replaces `sampler2D textureArray[]` bindless access (common.glsl:30,
GetAlbedo/CalculateNormal/GetEmissive common.glsl:286-311) with gather-
based bilinear filtering over the padded (N, H, W, 4) stack. Wrap mode is
REPEAT (the reference's sampler default).
"""
from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(stack_data, stack_sizes, tex_id, uv, default):
    """Bilinear sample; tex_id < 0 returns ``default``.

    Args:
      stack_data: (N, TH, TW, 4) f32
      stack_sizes: (N, 2) i32 (height, width) in use
      tex_id: (...,) i32
      uv: (..., 2) f32
      default: (4,) or broadcastable — value where tex_id < 0
    Returns: (..., 4) f32
    """
    tid = jnp.maximum(tex_id, 0)
    h = stack_sizes[tid, 0].astype(jnp.float32)
    w = stack_sizes[tid, 1].astype(jnp.float32)

    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def tap(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), w.astype(jnp.int32))
        yi = jnp.mod(yi.astype(jnp.int32), h.astype(jnp.int32))
        return stack_data[tid, yi, xi]

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    out = top * (1 - fy) + bot * fy

    valid = (tex_id >= 0)[..., None]
    return jnp.where(valid, out, jnp.broadcast_to(default, out.shape))


def sample_nearest(stack_data, stack_sizes, tex_id, uv, default):
    tid = jnp.maximum(tex_id, 0)
    h = stack_sizes[tid, 0]
    w = stack_sizes[tid, 1]
    xi = jnp.mod((uv[..., 0] * w.astype(jnp.float32)).astype(jnp.int32), w)
    yi = jnp.mod((uv[..., 1] * h.astype(jnp.float32)).astype(jnp.int32), h)
    out = stack_data[tid, yi, xi]
    valid = (tex_id >= 0)[..., None]
    return jnp.where(valid, out, jnp.broadcast_to(default, out.shape))
