"""Traced per-frame parameters + carried frame state.

``FrameParams`` is the UBO analog (UniformBufferObject,
ShaderCommon.h:226-240 / Application::UpdateGlobalUBO) — everything that
varies per frame without changing program structure.

``FrameState`` replaces the reference's History_* image copies
(RenderGraph::UpdatePersistentResources, RenderGraph.cpp:904-1116): named
history arrays are carried through the jitted frame function and fed back
with donation instead of being vkCmdCopyImage'd.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameParams:
    sun_direction: Any     # (3,)
    sun_color: Any         # (3,)
    sun_intensity: Any     # ()
    ambient_strength: Any  # ()  postData.y
    exposure: Any          # ()  postData.x
    svgf_phi: Any          # (4,) shader-indexed as in ops/svgf.py docstring
    frame_index: Any       # () uint32 — RNG decorrelation (frameData.y)

    @staticmethod
    def create(scene, exposure=1.0, frame_index=0,
               svgf_phi=(4.0, 128.0, 0.02, 0.0)) -> "FrameParams":
        import numpy as np  # host-side scalars; device transfer at jit boundary

        return FrameParams(
            sun_direction=scene.sun.direction,
            sun_color=scene.sun.color,
            sun_intensity=scene.sun.intensity,
            ambient_strength=scene.sun.ambient,
            exposure=np.float32(exposure),
            svgf_phi=np.asarray(svgf_phi, np.float32),
            frame_index=np.uint32(frame_index),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameState:
    """Carried history arrays keyed by canonical resource names
    (Graph/ResourceNames.h)."""

    history: Dict[str, Any]

    @staticmethod
    def empty() -> "FrameState":
        return FrameState(history={})

    def get(self, name, default=None):
        return self.history.get(name, default)


# Canonical resource names (ResourceNames.h:8-50 parity)
class RS:
    ALBEDO = "Albedo"
    NORMAL = "Normal"
    MATERIAL_PARAMS = "MaterialParams"
    OBJECT_ID = "ObjectID"
    MOTION = "Motion"
    EMISSIVE = "Emissive"
    DEPTH = "Depth"
    CUR_COLOR = "ShadowAO"       # packed shadow+AO signal
    AO_RAW = "AORaw"             # standalone RTAOPass demo output
    REFLECTION_RAW = "ReflectionRaw"
    GI_RAW = "GIRaw"
    FINAL_COLOR = "FinalColor"
    TAA_OUTPUT = "TAAOutput"
    RENDER_OUTPUT = "RENDER_OUTPUT"
    WORLD_POS = "WorldPos"       # extra plane (deferred raster keeps it)
    LINEAR_DEPTH = "LinearDepth"
    UV = "SurfaceUV"
