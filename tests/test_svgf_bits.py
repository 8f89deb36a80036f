"""SVGF storage-width quality gate (VERDICT r3 task 1).

Round 3 flipped ``svgf_bits`` to 16 without a quality gate and broke 5
goldens (judge bisect: p99 4 / max 57 vs the f32 goldens). Round 4
flipped it PROPERLY: default 16 (the reference's RGBA16F analog,
SVGFPass.cpp:24-164; head −3.0 ms / full graph −7.2, r4 batch 1), with
the golden ladder regenerated under the new default. Two standing
gates:

1. ``test_default_bits_within_quality_bar`` — the DEFAULT chain must
   stay within the MEASURED bf16 drift bound of the exact f32 chain
   (per-frame mean<=0.5 / p99<=8 / max<=96 u8 over 8 frames). A future
   default flip to a lossier width fails HERE with a message naming
   the policy, not just in 5 opaque image diffs.

2. ``test_bf16_chain_quality_bound`` — the bf16 chain's drift vs f32
   over 8 frames, bounded at measured-value + headroom (measured on
   the CPU backend 2026-08: worst frame mean 0.21 / p99 5.5 / max 57,
   decaying after frame 2; flicker bf16 0.163 <= f32 0.208). Catches
   catastrophic regression of the RGBA16F-analog path and provides the
   evidence bar any future width change must clear.
"""
import dataclasses

import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.output import to_u8
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

HY = RenderFlags.default_hybrid()


def _frames(settings, data, n):
    r = Renderer.for_scene(settings, data)
    cam = OrbitCamera(width=settings.width, height=settings.height,
                      distance=7.0, pitch=0.45, yaw=0.6,
                      focal_point=(0, 0.7, 0))
    out = []
    for _ in range(n):
        out.append(to_u8(r.render_np(cam.step(
            taa_enabled=bool(HY & RenderFlags.TAA)))).astype(int))
    return out


def _settings(**kw):
    return RenderSettings(width=128, height=128, path=RenderPathType.HYBRID,
                          flags=HY, ao_block=8, gi_block=8, **kw)


def test_default_bits_within_quality_bar():
    data = scenes.cube_scene().build()
    s = _settings()
    defaults = _frames(s, data, 8)
    f32 = _frames(dataclasses.replace(s, svgf_bits=32), data, 8)
    for f, (a, b) in enumerate(zip(defaults, f32)):
        d = np.abs(a - b)
        ok = d.mean() <= 0.5 and np.percentile(d, 99) <= 8 \
            and d.max() <= 96
        assert ok, (
            f"default svgf_bits={s.svgf_bits} frame {f} drifts from the "
            f"f32 chain (mean {d.mean()}, p99 {np.percentile(d, 99)}, "
            f"max {d.max()}): a storage-width default flip must stay "
            "inside the measured bf16 quality bar AND regenerate the "
            "golden ladder (see test_bf16_chain_quality_bound)")


def test_bf16_chain_quality_bound():
    data = scenes.cube_scene().build()
    s = _settings()
    f32 = _frames(dataclasses.replace(s, svgf_bits=32), data, 8)
    bf16 = _frames(dataclasses.replace(s, svgf_bits=16), data, 8)
    for f, (a, b) in enumerate(zip(f32, bf16)):
        d = np.abs(a - b)
        assert d.mean() <= 0.5, f"frame {f}: mean err {d.mean()}"
        assert np.percentile(d, 99) <= 8, \
            f"frame {f}: p99 err {np.percentile(d, 99)}"
        assert d.max() <= 96, f"frame {f}: max err {d.max()}"
    # temporal stability: bf16 history must not oscillate (flicker is
    # mean |frame-to-frame| delta; measured bf16 0.163 vs f32 0.208)
    fl32 = np.mean([np.abs(f32[i] - f32[i - 1]).mean() for i in range(1, 8)])
    fl16 = np.mean([np.abs(bf16[i] - bf16[i - 1]).mean()
                    for i in range(1, 8)])
    assert fl16 <= 1.5 * fl32 + 0.1, \
        f"bf16 chain flickers: {fl16} vs f32 {fl32}"
