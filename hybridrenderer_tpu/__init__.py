"""hybridrenderer_tpu — a TPU-native real-time hybrid rendering framework.

Built on JAX/XLA/Pallas with the capabilities of the reference engine
CadenXc/HybridRenderer ("Chimera"): rasterized G-buffer + ray-traced
shadows/AO/reflections/diffuse GI, SVGF denoising, TAA, PBR shading,
render-graph pass composition, and forward/hybrid/ray-traced render paths.
See DESIGN.md for the architecture mapping.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: frame-function compiles are the
# dominant startup cost (the reference pays an analogous cost in driver
# SPIR-V→ISA compiles, amortized by its PipelineManager cache —
# PipelineManager.cpp:89-103; ours persists across processes).
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/hybridrenderer_jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from .core.config import RenderSettings
from .core.types import DisplayMode, MaterialType, RenderFlags, RenderPathType

__all__ = [
    "RenderSettings",
    "DisplayMode",
    "MaterialType",
    "RenderFlags",
    "RenderPathType",
]
