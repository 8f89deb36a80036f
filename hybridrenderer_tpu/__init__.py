"""hybridrenderer_tpu — a TPU-native real-time hybrid rendering framework.

Built on JAX/XLA/Pallas with the capabilities of the reference engine
CadenXc/HybridRenderer ("Chimera"): rasterized G-buffer + ray-traced
shadows/AO/reflections/diffuse GI, SVGF denoising, TAA, PBR shading,
render-graph pass composition, and forward/hybrid/ray-traced render paths.
See DESIGN.md for the architecture mapping.
"""

__version__ = "0.1.0"

from .core.config import RenderSettings
from .core.types import DisplayMode, MaterialType, RenderFlags, RenderPathType

__all__ = [
    "RenderSettings",
    "DisplayMode",
    "MaterialType",
    "RenderFlags",
    "RenderPathType",
]
