"""Round-4 TPU batch 8, ONE process: textured-frame gather-shape A/B.

The textured headline overhead is ~60 ms for ONE albedo sample per
pixel — far above the ~8 ms a 2M-row gather from a ≤16 MB table costs
(BENCH.md r3 batch 4). Hypothesis: the (tid, yi, xi) THREE-operand-dim
advanced index lowers to a general XLA gather that bypasses the fast
small-table row-gather path; pre-flattening to one row index
(HR_TEX_GATHER=flat, bit-identical, test-pinned) makes it the same op
shape as every other fast gather in the frame.

Probes: isolated 2M-sample quad-gather ladder (3d vs flat, tex 128 and
512) + textured head rungs both modes + untextured anchor.

Run from the repo dir: python benchmarks/r4_batch8.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.ops import texture as tex_ops
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes


def chip_health(max_waits=6):
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def mm(x):
        def body(_, c):
            return c @ c * 1e-9 + a
        return jax.lax.fori_loop(0, 8, body, x)

    for attempt in range(max_waits):
        r = mm(a)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = mm(a)
        _ = np.asarray(r[0, 0])
        ms = (time.perf_counter() - t0) * 1e3
        print(json.dumps({"info": "chip_health_ms", "value": round(ms, 1),
                          "attempt": attempt}), flush=True)
        if ms < 60.0:
            return
        time.sleep(600)


chip_health()

W, H = 1920, 1080
ITERS = 8
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


# ---- isolated 2M-sample quad gather (DCE-proof fori chain) -------------
def tex_probe(tex_size, mode, bits="32"):
    os.environ["HR_TEX_GATHER"] = mode
    os.environ["HR_TEX_BITS"] = bits
    data = scenes.stress_scene(num_objects=50, textured=True,
                               tex_size=tex_size).build()
    quads = data.textures.quads
    sizes = data.textures.sizes
    n = W * H
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.random((n, 2)), jnp.float32)
    tid = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    dflt = jnp.ones((4,), jnp.float32)

    @jax.jit
    def loop(z):
        def body(_, carry):
            out = tex_ops.sample_bilinear_quad(
                quads, sizes, tid, uv + carry * 1e-20, dflt)
            return carry + s(out)
        return jax.lax.fori_loop(0, ITERS, body, z)

    try:
        r = loop(jnp.float32(0.0))
        _ = float(r)
        t0 = time.perf_counter()
        r = loop(jnp.float32(0.0))
        _ = float(r)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({"probe": f"qsample_{tex_size}_{mode}_b{bits}",
                          "ms": round(ms, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": f"qsample_{tex_size}_{mode}_b{bits}",
                          "error": repr(e)[:250]}), flush=True)
        time.sleep(120)


for size in (128, 512):
    for mode in ("3d", "flat"):
        tex_probe(size, mode)
# u8 storage (HR_TEX_BITS=8, reference RGBA8 parity): the 512² quad
# stack drops 67 MB (f32, over the ≲16 MB fast-gather gate) → 16.8 MB
tex_probe(512, "flat", bits="8")
tex_probe(1024, "flat", bits="8")
os.environ["HR_TEX_BITS"] = "32"


def burst_ms(data, flags, k=4, **skw):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, **skw)
    r = Renderer.for_scene(st, data)
    c = OrbitCamera(width=W, height=H, **cam_kw)

    def steps(n):
        out = []
        for _ in range(n):
            out.append(c.step(taa_enabled=True))
            c.orbit(0.01, 0.0)
        return out

    out = r.render_burst(steps(k))
    out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    t0 = time.perf_counter()
    out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / k


def guard(name, fn):
    try:
        print(json.dumps({"probe": name, "ms": round(fn(), 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


data_plain = scenes.stress_scene(num_objects=250).build()
data_tex = scenes.stress_scene(num_objects=250, textured=True,
                               tex_size=128).build()
data_tex1k = scenes.stress_scene(num_objects=250, textured=True,
                                 tex_size=1024).build()

guard("head_plain", lambda: burst_ms(data_plain, HEAD))
os.environ["HR_TEX_GATHER"] = "3d"
guard("headtex128_3d", lambda: burst_ms(data_tex, HEAD))
os.environ["HR_TEX_GATHER"] = "flat"
guard("headtex128_flat", lambda: burst_ms(data_tex, HEAD))
os.environ["HR_TEX_GATHER"] = "3d"
guard("headtex1k_3d", lambda: burst_ms(data_tex1k, HEAD))
os.environ["HR_TEX_GATHER"] = "flat"
guard("headtex1k_flat", lambda: burst_ms(data_tex1k, HEAD))

# 512² textures (the HR_TEX_MAX default) at 65k: f32 vs u8 storage
os.environ["HR_TEX_GATHER"] = "flat"
data_tex512 = scenes.stress_scene(num_objects=250, textured=True,
                                  tex_size=512).build()
guard("headtex512_flat", lambda: burst_ms(data_tex512, HEAD))
os.environ["HR_TEX_BITS"] = "8"
data_tex512_b8 = scenes.stress_scene(num_objects=250, textured=True,
                                     tex_size=512).build()
guard("headtex512_flat_b8", lambda: burst_ms(data_tex512_b8, HEAD))
os.environ["HR_TEX_BITS"] = "32"

# Sponza-scale textured flagship: gather-shape modes + u8 storage
data262t = scenes.stress_scene(num_objects=1000, textured=True).build()
os.environ["HR_TEX_GATHER"] = "3d"
guard("sponzatex_3d", lambda: burst_ms(data262t, HEAD, k=2))
os.environ["HR_TEX_GATHER"] = "flat"
guard("sponzatex_flat", lambda: burst_ms(data262t, HEAD, k=2))
os.environ["HR_TEX_BITS"] = "8"
data262t_b8 = scenes.stress_scene(num_objects=1000, textured=True).build()
guard("sponzatex_flat_b8", lambda: burst_ms(data262t_b8, HEAD, k=2))
os.environ["HR_TEX_BITS"] = "32"
print("EXIT=0", flush=True)
