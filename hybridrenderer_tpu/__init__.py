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
# NOTE: must use jax.config.update, not JAX_* env vars — jax reads env
# config at its own import, which may precede this package's.
import os as _os

import jax as _jax

_jax.config.update("jax_compilation_cache_dir",
                   _os.path.expanduser("~/.cache/hybridrenderer_jax"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from .core.config import RenderSettings
from .core.types import DisplayMode, MaterialType, RenderFlags, RenderPathType

__all__ = [
    "RenderSettings",
    "DisplayMode",
    "MaterialType",
    "RenderFlags",
    "RenderPathType",
]
