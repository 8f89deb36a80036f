"""Benchmark entry (driver contract): prints ONE JSON line.

Headline metric: hybrid-path FPS (RT shadows + AO + SVGF) at 1080p on the
Sponza-scale procedural stress scene — the BASELINE.json north star
(target >= 60 FPS on v5p-8; vs_baseline = fps / 60). Resolution / scene /
path are overridable via env for diagnostics:

  BENCH_WIDTH/BENCH_HEIGHT, BENCH_SCENE (stress|cube|cornell),
  BENCH_PATH (hybrid|forward), BENCH_FRAMES, BENCH_OBJECTS
"""
from __future__ import annotations

import json
import os
import sys
import time


def main():
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    scene_name = os.environ.get("BENCH_SCENE", "stress")
    path_name = os.environ.get("BENCH_PATH", "hybrid")
    frames = int(os.environ.get("BENCH_FRAMES", "16"))
    n_objects = int(os.environ.get("BENCH_OBJECTS", "250"))

    import jax

    from hybridrenderer_tpu.core.camera import OrbitCamera
    from hybridrenderer_tpu.core.config import RenderSettings
    from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
    from hybridrenderer_tpu.runtime.renderer import Renderer
    from hybridrenderer_tpu.scene import scene as scenes

    if scene_name == "stress":
        host = scenes.stress_scene(num_objects=n_objects)
    elif scene_name == "cornell":
        host = scenes.cornell_scene()
    else:
        host = scenes.cube_scene()
    data = host.build()

    if path_name == "hybrid":
        ptype = RenderPathType.HYBRID
        flags = (RenderFlags.LIGHT | RenderFlags.SHADOW | RenderFlags.AO
                 | RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
                 | RenderFlags.SVGF_SPATIAL | RenderFlags.IBL
                 | RenderFlags.EMISSIVE)
    else:
        ptype = RenderPathType.FORWARD
        flags = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.TAA

    settings = RenderSettings(width=width, height=height, path=ptype,
                              flags=flags)
    renderer = Renderer.for_scene(settings, data)
    cam = OrbitCamera(width=width, height=height, distance=30.0, pitch=0.5,
                      yaw=0.8, focal_point=(0, 2.0, 0))

    import numpy as np

    # warmup / compile (2 variants: cold + history). NOTE: frames chain
    # through the carried FrameState, so executions serialize on-device;
    # a host readback of the last frame is the only reliable fence on
    # this backend (block_until_ready returns early through the tunnel).
    out = renderer.render(cam.step(taa_enabled=True))
    out = renderer.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])

    t0 = time.perf_counter()
    for _ in range(frames):
        cam.orbit(0.01, 0.0)
        out = renderer.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    dt = time.perf_counter() - t0
    fps = frames / dt

    result = {
        "metric": f"fps_{width}x{height}_{scene_name}_{path_name}",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 4),
        "extra": {
            "ms_per_frame": round(1000.0 * dt / frames, 2),
            "triangles": int(data.num_triangles),
            "device": str(jax.devices()[0]),
            "frames": frames,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
