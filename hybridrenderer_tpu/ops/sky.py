"""Environment / sky sampling.

Equirectangular mapping (common.glsl:109-118) and the procedural sky
gradient + artificial sun fallback used by the radiance miss shader
(miss.rmiss:21-56) and the composition background (composition.frag:43-57).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import maths
from . import texture as tex_ops

PI = 3.14159265359


def sample_equirectangular_uv(v):
    """Direction → equirect uv (common.glsl:109-118)."""
    phi = jnp.arctan2(v[..., 2], v[..., 0])
    theta = jnp.arcsin(jnp.clip(v[..., 1], -1.0, 1.0))
    u = phi / (2.0 * PI) + 0.5
    w = 1.0 - (theta / PI + 0.5)
    return jnp.stack([u, w], axis=-1)


def procedural_sky(direction):
    """miss.rmiss:39-51 procedural gradient + sun glow."""
    t = 0.5 * (direction[..., 1] + 1.0)
    horizon = jnp.array([0.4, 0.5, 0.6], jnp.float32)
    zenith = jnp.array([0.1, 0.2, 0.4], jnp.float32)
    sky = horizon + (zenith - horizon) * t[..., None]
    sun_dir = maths.normalize(jnp.array([1.0, 1.0, -1.0], jnp.float32))
    sun = jnp.maximum(0.0, maths.dot(direction, sun_dir)) ** 128.0
    return sky + sun[..., None] * 5.0


def sample_environment(direction, sky_texture, textures, ibl_enabled: bool,
                       has_sky: bool = True):
    """Radiance for rays that leave the scene (miss.rmiss semantics).

    ``sky_texture`` is a traced scalar; IBL disabled → black.
    ``has_sky`` is the STATIC scene flag (SceneData.has_sky_texture):
    when False the equirect fetch is skipped entirely — a traced
    ``jnp.where`` would still evaluate the full-screen bilinear gather
    for purely procedural skies.
    """
    if not ibl_enabled:
        return jnp.zeros(direction.shape[:-1] + (3,), jnp.float32)
    if not has_sky:
        return procedural_sky(direction)
    uv = sample_equirectangular_uv(direction)
    tid = jnp.broadcast_to(sky_texture, direction.shape[:-1])
    env = tex_ops.sample_stack(
        textures, tid, uv, jnp.zeros((4,), jnp.float32))[..., :3]
    return jnp.where((tid >= 0)[..., None], env, procedural_sky(direction))
