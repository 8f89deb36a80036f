"""RenderPathFactory (RenderPathFactory.cpp:9-22)."""
from __future__ import annotations

from ..core.types import RenderPathType
from .forward import ForwardRenderPath


def create_render_path(settings):
    from .hybrid import HybridRenderPath
    from .raytraced import RayTracedRenderPath

    if settings.path == RenderPathType.FORWARD:
        return ForwardRenderPath(settings)
    if settings.path == RenderPathType.HYBRID:
        return HybridRenderPath(settings)
    if settings.path == RenderPathType.RAYTRACED:
        return RayTracedRenderPath(settings)
    raise ValueError(f"unknown render path {settings.path}")
