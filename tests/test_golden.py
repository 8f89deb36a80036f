"""Golden-image regression tests (SURVEY §4: substitute for the
reference's eyeball-driven display modes)."""
import os

import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.output import read_png, to_u8
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_cube_forward_golden():
    data = scenes.cube_scene().build()
    s = RenderSettings(width=64, height=64, path=RenderPathType.FORWARD,
                       flags=RenderFlags.LIGHT | RenderFlags.IBL,
                       raster_backend="jnp")
    r = Renderer(s, data)
    cam = OrbitCamera(width=64, height=64, distance=7.0, pitch=0.45, yaw=0.6,
                      focal_point=(0, 0.7, 0))
    img = to_u8(r.render_np(cam.step()))
    golden = read_png(os.path.join(GOLDEN_DIR, "cube_forward_64.png"))
    diff = np.abs(img.astype(int) - golden.astype(int))
    # allow small cross-platform float drift, catch structural changes
    assert np.percentile(diff, 99) <= 2, f"p99 diff {np.percentile(diff, 99)}"
    assert diff.max() <= 16, f"max diff {diff.max()}"
