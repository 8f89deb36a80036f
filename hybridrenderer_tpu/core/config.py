"""Static render configuration.

The reference routes all configuration through a UBO + RenderFlags bitmask
read dynamically by shaders (SURVEY §5.6). TPU-native we split:

* ``RenderSettings`` — *static*, hashable: anything that changes the traced
  program structure (resolution, which passes exist, SVGF iteration count,
  kernel backend). It is the jit cache key — the analog of the reference's
  PipelineManager name+spec-constant pipeline cache (PipelineManager.cpp:89-103).
* ``FrameParams`` (graph/passes.py) — *traced*: camera matrices, sun light,
  exposure, svgf alpha/phi, frame counter. Changing these never recompiles.
"""
from __future__ import annotations

import dataclasses

from .types import DisplayMode, RenderFlags, RenderPathType


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    width: int = 512
    height: int = 512
    path: RenderPathType = RenderPathType.FORWARD
    flags: RenderFlags = RenderFlags.LIGHT | RenderFlags.IBL
    display_mode: DisplayMode = DisplayMode.FINAL

    # SVGF structure (SVGFPass.h:82-101: Config{atrousIterations=3, ...})
    svgf_atrous_iterations: int = 3
    # Pallas stencil tile (h, w) for the SVGF spatial kernels; None →
    # env SVGF_TILE → "32x128". Each stencil program DMAs a
    # (th+16, tw+256) halo window, so wider tiles amortize the fixed
    # ±(8 row, 128 col) alignment halo (batch 35: chain 23.5 → 21.3 ms,
    # full graph −5.8; th ≥ 64 fails remote compile). Results are
    # tile-invariant (tests/test_stencil_pallas.py).
    svgf_tile: tuple = (32, 384)
    # Temporal-reprojection sweep radius (px) for the windowed Pallas
    # kernel; 8 is exact for smooth motion, 4 quarters the candidate
    # sweep at the cost of more history drops under fast motion
    # (quality probe: benchmarks/quality_temporal_range.py).
    svgf_temporal_range: int = 8
    # Temporal history-fetch strategy: "auto" (tile kernel on TPU,
    # per-pixel row gathers elsewhere), "pixel" (reference semantics —
    # also the fast-motion fallback the tile window can't cover),
    # "tile", "tile_interpret" (CPU tests/probes).
    svgf_temporal_gather: str = "auto"

    # Raster kernel selection: "jnp" reference or "pallas" tiled kernel.
    raster_backend: str = "auto"
    trace_backend: str = "auto"

    # Raster tiling (pallas path)
    tile_h: int = 8
    tile_w: int = 128
    # Raster block-eval variant: None → env RASTER_EVAL → "v4"
    # (fully transposed kernel — pixels on lanes in every carry,
    # ops/raster_pallas._raster_kernel_t; batch 45: base 57.9→39.2,
    # headline 122.3→102.0). "v1" lane-reduce winner; "v2"/"v3"
    # integer-key picks are VIS-ONLY probes — the G-buffer pass needs
    # the attribute ride-along and downgrades them to "v1"
    # (raster_pallas.raster_tiles docstring).
    raster_eval: "str | None" = None
    # Triangles per wide-BVH leaf cluster: None → env WIDE_LEAF_TRIS →
    # 4. Bigger clusters halve the leaf pop/push overhead per triangle
    # but test more padded triangles per visit (r3 throughput ladder).
    bvh_leaf_tris: "int | None" = None
    # Children per wide-BVH node: None → env WIDE_WIDTH → 8. 16-wide
    # collapses 4 binary levels per node — half the pop/push/extract
    # steps per traversal at 2x the slab math per visit (VERDICT r3
    # task 4); direct-stack kernel only (reference 2-wide BLAS analog:
    # common.glsl:124-153 traversal re-shaped for packet stepping).
    bvh_width: "int | None" = None
    # Interpolated-attribute output width from the raster kernel: 32
    # (f32, bit-exact vs the join path) or 16 (bf16 — the reference's
    # G-buffer MRTs are R8G8B8A8/RGBA16F, GBufferPass.cpp:24-56; the
    # f32 (ntiles, 40, P) output write is ~most of the kernel's fixed
    # per-program floor, r3 batch 8)
    raster_attr_bits: int = 32
    max_tris_per_tile: int = 512
    # Hit-shading attribute fetch: None → env SHADE_FETCH → "auto"
    # (scene.shade_rows u16 fast-gather table when present, else the
    # f32 attr_rows wide row, else the narrow per-attribute gathers);
    # "attr" forces attr_rows, "pixel" forces the narrow path.
    # A settings field (static) so in-process A/Bs retrace instead of
    # silently reusing the first-traced variant.
    shade_fetch: "str | None" = None
    # Back-face culling of opaque single-sided triangles ("back") or
    # two-sided rendering of everything ("none"). The reference culls
    # back faces in the forward pipeline (ForwardPass.cpp:45) and
    # renders the G-buffer two-sided (GBufferPass.cpp:74); "back" +
    # per-material double_sided/cut-out exemptions preserves both
    # intents while halving live raster candidates on closed meshes.
    raster_cull: str = "back"

    # Ray tracing
    bvh_leaf_size: int = 4
    # Acceleration-structure build: "auto" (= binned SAH, the
    # PREFER_FAST_TRACE analog — fastest on every ray type under the
    # ordered direct-stack traversal), "sah", or "lbvh" (fast build;
    # also what dynamic refits preserve topologically).
    bvh_builder: str = "auto"
    ao_radius: float = 10.0  # rt_shadow.rgen:96 traces AO rays to 10 units
    # Interleaved AO sampling (one direction per 8×8 block pattern per
    # frame + pattern-major packet relayout) — packet-coherent AO rays.
    # False reproduces the reference's per-pixel draw (rt_shadow.rgen:85-96).
    ao_interleaved: bool = True
    # Packet layout for interleaved-AO rays: "pattern" groups rays by
    # interleave pattern (shared direction per packet), "tile" groups by
    # 32×32 pixel tile (compact origin footprint, mixed directions).
    # Origin coherence beats direction coherence here: host sim measured
    # tile unions 1.19× smaller, on-chip A/B (batch 6) 338.4→304.8 ms
    # on the shadow+AO rung. Results are identical (pure relayout).
    ao_layout: str = "tile"
    # (ao_half_res was removed: measured SLOWER than full-res twice —
    # r2 breakdown and r3 batch 6 — interleaved AO is not ray-count-
    # bound, so the quarter ray count never paid for the upsample.)
    # Interleaved GI bounce sampling — the AO trick applied to the
    # diffuse-GI cosine rays (diffuse_gi.rgen:30-40 draws per-pixel):
    # one bounce direction per 8×8 block pattern per frame, decorrelated
    # from AO by seed salt; SVGF temporal accumulation integrates the
    # per-frame pattern rotations exactly as for AO. Unbounded random
    # cosine rays measured ~2.5 Mrays/s (batch 24) — direction-coherent
    # packets are what make full-res GI affordable. False reproduces
    # the reference's per-pixel draw.
    gi_interleaved: bool = True
    # Packet layout for interleaved-GI rays: "tile" | "pattern"
    # (trace_radiance relayout; see ao_layout for the tradeoff).
    gi_layout: str = "tile"
    # Interleave block size (pixels) for the AO / GI pattern samplers.
    # block=8 → 16 distinct directions per 32²-ray packet, block>=32 →
    # ONE direction per packet (fastest; coarser spatial noise structure
    # that SVGF temporal/spatial integrates, same argument as
    # interleaving itself). 8→32 measured −11% headline / −15% full
    # graph (batch 27). Default 64 since r4 batch 6 (−2.4 head / −6.9
    # full graph over 32): converged-AO err 0.0229 vs 0.0197 @32 at 256²
    # (benchmarks/quality_ao_block64.py), converged-GI err IDENTICAL to
    # @32 with LOWER flicker (quality_gi_block64.py). Goldens pin
    # block=8 explicitly, so this tunable never moves them.
    # ao_block 128 since r5: −2.0 ms headline; converged err at 512²
    # 0.0329 vs 0.0315 @64, p99 0.225 vs 0.217, flicker 0.0049 vs
    # 0.0045 (benchmarks/quality_ao_block128.py, TPU run) — the same
    # marginal-quality trade the 32→64 flip made. gi_block stays 64
    # (128 unprobed for GI).
    ao_block: int = 128
    gi_block: int = 64

    # Reflection roughness cutoff (reflection.rgen:55-63)
    reflection_roughness_cutoff: float = 0.6
    # Half-resolution secondary rays (reflection / diffuse GI) with
    # depth-aware upsample — same tradeoff as ao_half_res, off by
    # default for reference parity (reflection.rgen / diffuse_gi.rgen
    # trace full-res). reflection_half_res is production-grade
    # (converged err mean 0.38 / p99 1 u8, gate in
    # tests/test_half_res_ao.py); gi_half_res is EXPERIMENTAL — its
    # converged error is p99 ~32 u8 (visible banding territory; the
    # half-grid interleave pattern interacts with the block-shared
    # directions) and its gate only bounds regression, not quality.
    # Use for previews, not comparisons (VERDICT r4 weak #7).
    reflection_half_res: bool = False
    gi_half_res: bool = False

    # SVGF history-plane storage width: 16 (bf16 — DEFAULT; the
    # reference's RGBA16F analog, SVGFPass.cpp:24-164; halves
    # history/window HBM traffic, filter math stays f32) or 32 (f32
    # exact). r4 batch 1 measured the flip at head −3.0 ms / full graph
    # −7.2; quality is gated by tests/test_svgf_bits.py (8-frame drift
    # vs the f32 chain: worst frame mean 0.21 / p99 5.5 / max 57 u8,
    # decaying; bf16 flicker BELOW f32) and the golden ladder is
    # generated under this default. The r3 exit shipped this flip with
    # STALE goldens (5 red) — any future width change must regen
    # goldens AND pass the drift gate.
    svgf_bits: int = 16
    # SVGF spatial-kernel backend: "auto" (Pallas stencils on TPU) |
    # "pallas" | "jnp" (unfused XLA stencils — the A/B control for
    # Pallas-operand materialization effects, r3 batch 8)
    svgf_backend: str = "auto"
    # Pass-output materialization barriers (graph/graph.py): "multi"
    # barriers only fan-out resources (>= 2 consumers / history saves),
    # "all" barriers every pass output (round-1 behavior), "none"
    # disables. The vkCmdPipelineBarrier2-ladder analog.
    graph_barriers: str = "multi"

    # Blue-noise sample draws for 1-spp GI / per-pixel AO (the reference
    # fetches a tiled blue-noise texture with a per-frame integer offset,
    # raygen.rgen:29-31, common.glsl:86-92). False falls back to the TEA
    # hash draws of rt_shadow.rgen:53.
    use_blue_noise: bool = True

    # DIAGNOSTIC ONLY — truncates trace_radiance so frame-level A/B
    # ladders can attribute the in-frame cost of a radiance pass
    # (VERDICT r2 task 1). "full" (default) | "noshade" (closest-hit
    # traversal only; hits shade to black) | "noocc" (full shading math
    # but the sun/NEE occlusion traversals are skipped — treated as
    # unoccluded) | "noattr" (noocc + constant surface attributes: no
    # attr-row gather) | "nonee" (noocc + emissive-light NEE block
    # skipped). Never set in production configs.
    debug_radiance_stage: str = "full"

    def has(self, flag: RenderFlags) -> bool:
        return bool(self.flags & flag)

    def replace(self, **kw) -> "RenderSettings":
        return dataclasses.replace(self, **kw)

    @property
    def resolution(self):
        return (self.height, self.width)
