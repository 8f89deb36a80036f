"""Final post-process: exposure + gamma (postprocess.frag:9-21).

Convention note: the reference's CompositionPass *also* applies
exposure+gamma (composition.frag:118-121) and then PostProcessPass applies
both again on the same data — a double application in the hybrid path.
Here tone mapping is applied exactly once, at this final stage; the
composition pass outputs linear HDR (see ops/composition.py docstring).
"""
from __future__ import annotations

import jax.numpy as jnp


def tonemap(color, exposure):
    c = color * exposure
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)


def to_srgb_u8(color):
    return jnp.clip(color * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
