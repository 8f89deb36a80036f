"""Scene data schemas — the GPU-side scene state, as JAX pytrees.

TPU-native counterpart of the reference's bindless scene descriptor set
(ResourceManager.cpp:244-299): materials SSBO, instances SSBO, texture
array, lights + light CDF SSBOs, TLAS. Here each is a plain struct-of-
arrays pytree; "bindless" access is array indexing; the TLAS is replaced
by an LBVH built in ``ops/bvh.py`` over the flattened world-space
triangle soup.

Field layouts mirror ShaderCommon.h:
  * MaterialTable  ← GpuMaterial   (ShaderCommon.h:119-139)
  * InstanceTable  ← GpuInstance   (ShaderCommon.h:149-165), with buffer
    device addresses replaced by (vertex_offset, index_offset) into the
    global concatenated vertex/index arrays.
  * LightTable     ← GpuLight + lightsCDF (ShaderCommon.h:191-197,
    LightManager.cpp:21-124)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import INVALID_ID, MaterialType


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MaterialTable:
    """SoA of GpuMaterial (ShaderCommon.h:119-139)."""

    emission: Any          # (M, 3) f32
    colour: Any            # (M, 3) f32
    roughness: Any         # (M,)   f32
    metallic: Any          # (M,)   f32
    opacity: Any           # (M,)   f32
    anisotropy: Any        # (M,)   f32
    material_type: Any     # (M,)   i32
    scattering_colour: Any # (M, 3) f32
    transmission_depth: Any  # (M,) f32
    emission_texture: Any  # (M,) i32, -1 = none
    colour_texture: Any    # (M,) i32
    roughness_texture: Any # (M,) i32
    normal_texture: Any    # (M,) i32
    alpha_mode: Any        # (M,) i32: 0 opaque, 1 alpha-mask (cut-out)
    alpha_cutoff: Any      # (M,) f32
    double_sided: Any      # (M,) i32: render both faces (glTF doubleSided)

    @property
    def count(self) -> int:
        return self.colour.shape[0]

    @staticmethod
    def build(mats: list["Material"]) -> "MaterialTable":
        def f(get, dt=np.float32):
            return jnp.asarray(np.array([get(m) for m in mats], dtype=dt))

        return MaterialTable(
            emission=f(lambda m: m.emission),
            colour=f(lambda m: m.colour),
            roughness=f(lambda m: m.roughness),
            metallic=f(lambda m: m.metallic),
            opacity=f(lambda m: m.opacity),
            anisotropy=f(lambda m: m.anisotropy),
            material_type=f(lambda m: int(m.material_type), np.int32),
            scattering_colour=f(lambda m: m.scattering_colour),
            transmission_depth=f(lambda m: m.transmission_depth),
            emission_texture=f(lambda m: m.emission_texture, np.int32),
            colour_texture=f(lambda m: m.colour_texture, np.int32),
            roughness_texture=f(lambda m: m.roughness_texture, np.int32),
            alpha_mode=f(lambda m: m.alpha_mode, np.int32),
            alpha_cutoff=f(lambda m: m.alpha_cutoff),
            normal_texture=f(lambda m: m.normal_texture, np.int32),
            double_sided=f(lambda m: int(m.double_sided), np.int32),
        )


@dataclasses.dataclass
class Material:
    """Host-side named material (Material.h:8-96 CPU mirror)."""

    name: str = "material"
    colour: tuple = (0.8, 0.8, 0.8)
    emission: tuple = (0.0, 0.0, 0.0)
    roughness: float = 0.5
    metallic: float = 0.0
    opacity: float = 1.0
    anisotropy: float = 0.0
    material_type: MaterialType = MaterialType.PBR
    scattering_colour: tuple = (0.0, 0.0, 0.0)
    transmission_depth: float = 0.0
    emission_texture: int = INVALID_ID
    colour_texture: int = INVALID_ID
    roughness_texture: int = INVALID_ID
    normal_texture: int = INVALID_ID
    # alpha-masked (cut-out) material: gbuffer.frag:33 discard +
    # shadow.rahit / common.glsl:139-148 transparent any-hit skip
    alpha_mode: int = 0
    alpha_cutoff: float = 0.5
    # glTF doubleSided (spec default false). Opaque single-sided
    # triangles are back-face culled in the rasterizer; the reference
    # forward pipeline culls back faces too (ForwardPass.cpp:45) while
    # its G-buffer uses CULL_NONE (GBufferPass.cpp:74) for foliage —
    # cut-out materials are never culled here, preserving that intent.
    double_sided: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class InstanceTable:
    """SoA of GpuInstance (ShaderCommon.h:149-165).

    One row per entity-mesh, flattened in scene order — the row index is
    the ``instanceCustomIndex`` / ObjectID contract used by the G-buffer
    and ray-hit shading (ResourceManager.cpp:477-532).
    """

    transform: Any        # (N, 4, 4)
    inverse_transform: Any
    normal_transform: Any # (N, 4, 4)
    prev_transform: Any   # (N, 4, 4)
    aabb_min: Any         # (N, 3) world-space
    aabb_max: Any         # (N, 3)
    material: Any         # (N,) i32
    vertex_offset: Any    # (N,) i32 into global vertex arrays
    index_offset: Any     # (N,) i32 into global index array
    index_count: Any      # (N,) i32
    selected: Any         # (N,) i32

    @property
    def count(self) -> int:
        return self.material.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VertexArrays:
    """Concatenated vertex attribute arrays (GpuVertex, ShaderCommon.h:183-189)."""

    position: Any        # (V, 3) local space
    world_position: Any  # (V, 3) world space (baked; == position @ T for
                         # the owning instance, recomputed on scene changes)
    normal: Any          # (V, 3)
    tangent: Any         # (V, 4)
    uv: Any              # (V, 2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LightTable:
    """GpuLight SoA + triangle-area CDF (LightManager.cpp:21-124).

    ``cdf`` is the concatenation of per-light prefix-sum triangle areas in
    world space; ``environment`` rows mark an environment light.
    """

    instance: Any   # (L,) i32 instance id or -1
    cdf_start: Any  # (L,) i32
    cdf_count: Any  # (L,) i32
    environment: Any  # (L,) i32
    cdf: Any        # (C,) f32

    @property
    def count(self) -> int:
        return self.instance.shape[0]

    @staticmethod
    def empty() -> "LightTable":
        zi = jnp.zeros((0,), jnp.int32)
        return LightTable(zi, zi, zi, zi, jnp.zeros((1,), jnp.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TextureStack:
    """Bindless texture array replacement (ResourceManager.cpp:244-281).

    Textures are padded into one (N, H, W, 4) f32 stack; per-texture true
    sizes drive UV wrap and bilinear footprint in ops/texture.py.

    ``quads`` is the optional quad-texel layout (ops/texture.build_quads):
    each texel row carries its baked 2x2 bilinear footprint so a sample
    is ONE row gather instead of 4 (the row-gather cost model, BENCH.md).
    Scene.build() bakes it by default; 4x texture memory.

    ``slot_usage`` is STATIC: whether any material binds a
    (colour, emission, roughness, normal) texture — unused slots skip
    their full-screen gathers entirely at trace time (a clamped-id
    gather whose result is discarded costs the same as a real one).
    """

    data: Any   # (N, H, W, 4) f32, linear color
    sizes: Any  # (N, 2) i32 (height, width) actually used
    quads: Any = None  # (N, H, W, 16) f32 baked bilinear footprints
    # (atlas, nwy, nwx) from ops/texture.build_window_atlas — the
    # group-window sampler's overlapping 8x8 windows (r5); baked when
    # HR_TEX_SAMPLER=window
    windows: Any = None
    slot_usage: tuple = dataclasses.field(
        metadata=dict(static=True), default=(True, True, True, True))

    @property
    def count(self) -> int:
        return self.data.shape[0]

    @staticmethod
    def empty() -> "TextureStack":
        return TextureStack(
            data=jnp.zeros((1, 1, 1, 4), jnp.float32),
            sizes=jnp.ones((1, 2), jnp.int32),
            slot_usage=(False, False, False, False),
        )

    # quad-bake HBM budget: the baked layout costs 4x the stack (16 f32
    # per texel). Above this, samples fall back to the slot-gated 4-tap
    # path (r2 batch 28: 309 vs 222 ms textured headline at 65k — the
    # high-res-texture memory/speed trade VERDICT r3 task 7 names).
    # Override via HR_QUAD_MAX_MB.
    QUAD_BYTES_MAX = 1024 * 1024 * 1024

    def finalized(self, materials, bake_quads: bool = True) -> "TextureStack":
        """Scene-build finalization: derive ``slot_usage`` from the host
        material list and bake the quad layout (skipped for the empty
        placeholder stack or when the baked stack would exceed the HBM
        budget above)."""
        import os

        from ..ops.texture import (build_quads, build_window_atlas,
                                   quantize_u8)  # local: cycle
        usage = (
            any(m.colour_texture >= 0 for m in materials),
            any(m.emission_texture >= 0 for m in materials),
            any(m.roughness_texture >= 0 for m in materials),
            any(m.normal_texture >= 0 for m in materials),
        )
        # HR_SLOT_MASK (debug/bisect, e.g. "0000"): force-disable slots
        # to measure a textured scene with its sample sites compiled out
        # (r4 batch 10 — splits textured-frame overhead into sample-site
        # vs structural cost). Not a quality knob: disabled slots render
        # untextured.
        mask = os.environ.get("HR_SLOT_MASK")
        if mask:
            if len(mask) != 4 or any(c not in "01" for c in mask):
                raise ValueError(
                    f"HR_SLOT_MASK must be 4 chars of 0/1, got {mask!r} "
                    "(a short mask would silently disable trailing slots)")
            usage = tuple(u and mask[i] == "1"
                          for i, u in enumerate(usage))
        nontrivial = self.data.shape[1] > 1 or self.data.shape[2] > 1
        # HR_TEX_BITS=8: u8 storage for data + quads (reference RGBA8
        # parity, ResourceManager.cpp:651-728) — 4x smaller gather
        # tables; samplers decode after the gather (ops/texture._decode)
        data = self.data
        if (os.environ.get("HR_TEX_BITS", "32") == "8" and nontrivial
                and data.dtype != jnp.uint8):
            data = quantize_u8(data)
        quads = self.quads
        budget = int(os.environ.get(
            "HR_QUAD_MAX_MB", str(self.QUAD_BYTES_MAX // (1024 * 1024)))) \
            * 1024 * 1024
        quad_bytes = int(np.prod(data.shape)) * data.dtype.itemsize * 4
        if bake_quads and nontrivial and quads is None:
            if quad_bytes > budget:
                from ..runtime.log import core as _log

                _log().warn("texture quad bake skipped: %d MB > budget "
                            "%d MB (bilinear falls back to 4-tap)",
                            quad_bytes >> 20, budget >> 20)
            else:
                quads = build_quads(data, self.sizes)
        windows = self.windows
        if (os.environ.get("HR_TEX_SAMPLER", "quad") == "window"
                and nontrivial and windows is None
                and quad_bytes <= budget):
            # window atlas shares the quad bake's 4x multiplier; image-
            # shaped samples take it, flat (hit-point) samples keep quads
            windows = build_window_atlas(data, self.sizes)
        return TextureStack(data=data, sizes=self.sizes, quads=quads,
                            windows=windows, slot_usage=usage)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleSoup:
    """World-space flattened triangles — the ray-tracing geometry pool.

    Replaces BLAS/TLAS source data (Model.cpp:114-186 / Scene.cpp:323-440):
    triangle order is the global primitive order; ``instance`` recovers the
    GpuInstance row (= ObjectID) for shading, exactly the
    ``instanceCustomIndex`` contract of the reference TLAS build.
    """

    v0: Any        # (T, 3) world-space
    v1: Any        # (T, 3)
    v2: Any        # (T, 3)
    instance: Any  # (T,) i32
    # global vertex indices for attribute interpolation at hit points
    i0: Any        # (T,) i32
    i1: Any
    i2: Any
    # raster back-face-cullable: material opaque and not double-sided
    # (precomputed at build so the frame never gathers material rows)
    single_sided: Any  # (T,) bool

    @property
    def count(self) -> int:
        return self.instance.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SunLight:
    """Main directional light (Scene.h:57-70, LightData UBO block)."""

    direction: Any  # (3,) pointing from sun toward scene
    color: Any      # (3,)
    intensity: Any  # () scalar
    ambient: Any    # () ambient strength (postData.y)

    @staticmethod
    def default() -> "SunLight":
        # Application.cpp:319-324 fallback sun
        d = np.array([-1.0, -1.0, -1.0], np.float32)
        d /= np.linalg.norm(d)
        return SunLight(
            direction=jnp.asarray(d),
            color=jnp.ones((3,), jnp.float32),
            intensity=jnp.float32(3.0),
            ambient=jnp.float32(0.05),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneData:
    """The complete device-side scene — analog of descriptor set 1 plus
    the per-frame UBO scene constants."""

    materials: MaterialTable
    instances: InstanceTable
    vertices: VertexArrays
    indices: Any          # (I,) i32 global vertex indices
    triangles: TriangleSoup
    lights: LightTable
    textures: TextureStack
    sun: SunLight
    sky_texture: Any      # () i32, -1 = procedural sky
    blue_noise: Any       # (Hn, Wn, 4) f32
    # static: scene contains alpha-masked materials (gates the cut-out
    # raster phase and the transparency-continuation ray loop at trace
    # time — zero cost for fully opaque scenes)
    has_alpha_test: bool = dataclasses.field(
        metadata=dict(static=True), default=False)
    # static: scene carries an equirect sky texture (gates the
    # full-screen bilinear environment fetch; procedural-sky scenes
    # skip the gather entirely)
    has_sky_texture: bool = dataclasses.field(
        metadata=dict(static=True), default=False)
    # derived: pre-joined per-triangle attribute rows (T, 84) f32 — see
    # build_attr_rows. Per-pixel/per-ray row gathers cost ~25-55 ns per
    # ROW on this hardware regardless of row width, so G-buffer build and
    # hit shading fetch everything a pixel needs with ONE wide gather
    # instead of ~7/~13 narrow ones. Rebuilt by dynamic.update_transforms.
    attr_rows: Any = None
    # derived: per-triangle G-buffer attribute rows in the raster record
    # layout (T, 72) f32 — see build_raster_rows. Rides the binned raster
    # record stream so the Pallas tile kernel emits the winner's
    # interpolated attributes directly (one-hot MXU picks), replacing the
    # per-pixel attr_rows gather entirely (~48 ms at 1080p). Rebuilt by
    # dynamic.update_transforms.
    raster_rows: Any = None
    # derived: (T, 106) uint16 exact hi/lo re-encode of the shade columns
    # of attr_rows (see encode_shade_rows below) — 16-bit small-table
    # gathers ride a ~3.2x faster XLA path, so _shade_hit fetches from
    # this when present. None above SHADE_ROWS_MAX rows. Rebuilt by
    # dynamic.update_transforms alongside attr_rows.
    shade_rows: Any = None
    # derived: (T, 29) uint16 QUANTIZED shade rows for scenes whose
    # exact u16 table exceeds the ~16 MB fast-gather byte gate (see
    # build_shade_rows_q below — bf16 local normals/tangents, exact
    # uv base + f16 deltas). Transform-invariant: dynamic commits only
    # rebuild inst_shade. None when shade_rows exists (exact wins) or
    # above SHADE_Q_ROWS_MAX.
    shade_rows_q: Any = None
    # derived: (N, 26) f32 per-instance side table (normal matrix +
    # packed material row) feeding the quantized fetch; rebuilt by
    # dynamic.update_transforms.
    inst_shade: Any = None

    @property
    def num_triangles(self) -> int:
        return self.triangles.count


# attr_rows layout: vertex k of the triangle at offset 15*k —
#   [0:3] world_position  [3:6] local position  [6:9] normal
#   [9:13] tangent        [13:15] uv
# instance block at 45 —
#   [45:54] normal matrix (3x3 row-major)  [54:66] prev transform (3x4)
#   [66] material id      [67:83] packed material row
#   (ops/shade._pack_materials: colour|opacity|emission|roughness|
#    metallic|type|4 texture ids|pad2)      [83] instance id
ATTR_V0 = 0
ATTR_V1 = 15
ATTR_V2 = 30
ATTR_INST = 45
ATTR_MAT = 66
ATTR_MROW = 67
ATTR_INST_ID = 83
ATTR_WIDTH = 84


def build_attr_rows(vertices, instances, soup, materials, tris=None):
    """Join vertex + instance + material attributes into one (T, 84) f32
    row per triangle (layout above). Pure jnp — runs once at scene build
    and again inside dynamic.update_transforms when transforms change.

    ``tris`` (D,) i32 scopes the join to a triangle subset (→ (D, 84)):
    the dirty-only dynamic update path — the gathers are row-count-
    priced, so a one-entity update joins ~1k rows instead of T."""
    from ..ops.shade import _pack_materials  # local: avoid import cycle

    vpack = jnp.concatenate([
        vertices.world_position, vertices.position, vertices.normal,
        vertices.tangent, vertices.uv], axis=-1)               # (V, 15)
    n = instances.transform.shape[0]
    mat_ids = instances.material
    ipack = jnp.concatenate([
        instances.normal_transform[:, :3, :3].reshape(n, 9),
        instances.prev_transform[:, :3, :4].reshape(n, 12),
        mat_ids[:, None].astype(jnp.float32),
        _pack_materials(materials)[mat_ids]], axis=-1)         # (N, 38)
    i0, i1, i2, inst = soup.i0, soup.i1, soup.i2, soup.instance
    if tris is not None:
        i0, i1, i2, inst = i0[tris], i1[tris], i2[tris], inst[tris]
    return jnp.concatenate([
        vpack[i0], vpack[i1], vpack[i2],
        ipack[inst],
        inst[:, None].astype(jnp.float32)], axis=-1)  # (T, 84)


# raster_rows layout (T, 72): vertex k of the triangle at offset 16*k —
#   [0:3] world position   [3:6] PREV world position (prev_transform·local)
#   [6:9] world-space normal (normal_transform·n, UNnormalized — the
#         kernel lerps then build_gbuffer normalizes; linear, so
#         normalize(lerp(M·n_k)) == normalize(M·lerp(n_k)))
#   [9:12] world-space tangent xyz  [12] tangent w  [13:15] uv + 1 pad
# constants at 48 (one one-hot MXU pick in the kernel) —
#   [48:64] packed material row (ops/shade._pack_materials)
#   [64] material id  [65] instance id  [66:72] pad
RATTR_V0 = 0
RATTR_V1 = 16
RATTR_V2 = 32
RATTR_CONST = 48
RATTR_MROW = 48
RATTR_MAT = 64
RATTR_INST_ID = 65
RATTR_WIDTH = 72


def build_raster_rows(vertices, instances, soup, materials, tris=None):
    """Join per-triangle G-buffer attributes into the raster ride-along
    layout above — everything instance-dependent (world normal/tangent,
    prev world position) is pre-applied per VERTEX so the tile kernel's
    barycentric lerp is the only per-pixel math left. Pure jnp — runs at
    scene build and inside dynamic.update_transforms. ``tris`` scopes
    the join to a triangle subset (dirty-only updates), as in
    build_attr_rows."""
    from ..ops.shade import _pack_materials  # local: avoid import cycle

    i0, i1, i2, inst = soup.i0, soup.i1, soup.i2, soup.instance
    if tris is not None:
        i0, i1, i2, inst = i0[tris], i1[tris], i2[tris], inst[tris]
    nmat = instances.normal_transform[inst][:, :3, :3]      # (T, 3, 3)
    ptf = instances.prev_transform[inst][:, :3, :]          # (T, 3, 4)
    T = inst.shape[0]

    def vert(ik):
        lp = vertices.position[ik]                          # (T, 3)
        wn = jnp.einsum("tij,tj->ti", nmat, vertices.normal[ik])
        tg = vertices.tangent[ik]
        wt = jnp.einsum("tij,tj->ti", nmat, tg[:, :3])
        pwp = jnp.einsum("tij,tj->ti", ptf[..., :3], lp) + ptf[..., 3]
        return jnp.concatenate([
            vertices.world_position[ik], pwp, wn, wt, tg[:, 3:4],
            vertices.uv[ik], jnp.zeros((T, 1), jnp.float32)], axis=-1)

    mat_ids = instances.material[inst]                      # (T,)
    const = jnp.concatenate([
        _pack_materials(materials)[mat_ids],
        mat_ids[:, None].astype(jnp.float32),
        inst[:, None].astype(jnp.float32),
        jnp.zeros((T, 6), jnp.float32)], axis=-1)           # (T, 24)
    return jnp.concatenate(
        [vert(i0), vert(i1), vert(i2), const], axis=-1)


# shade_rows: the _shade_hit fetch columns of attr_rows re-encoded as
# uint16 hi/lo halves of the f32 bit pattern — EXACT (reconstruction is
# a bitcast, not a rounding). XLA row gathers from 16-bit tables with
# <= ~64k rows run ~3.2x faster than any f32 gather on this hardware
# (BENCH.md r3 batch 3/4: 7.9 vs 25.9 ms for 2.07M rows, width-free),
# so the per-ray hit-shading fetch gathers u16 and bitcasts back.
# Decoded layout (53 f32 columns): vertex k at 9*k —
#   [0:3] normal  [3:7] tangent  [7:9] uv
# instance block at 27 —
#   [27:36] normal matrix (3x3 row-major)  [36] material id
#   [37:53] packed material row (ops/shade._pack_materials)
SH_V0 = 0
SH_V1 = 9
SH_V2 = 18
SH_NMAT = 27
SH_MAT = 36
SH_MROW = 37
SH_WIDTH = 53
# attr_rows columns feeding the shade layout above
_SHADE_COLS = np.r_[6:15, 21:30, 36:45, 45:54, 66, 67:83]
# the fast gather path needs the row count under ~96k (r3 batch 4);
# bigger scenes keep the f32 attr_rows fetch (same gather price)
SHADE_ROWS_MAX = 98304


def encode_shade_rows(attr_rows):
    """(D, 84) f32 attr rows -> (D, 106) uint16: hi halves of the 53
    shade columns at [0:53], lo halves at [53:106]."""
    sel = attr_rows[:, _SHADE_COLS]
    bits = jax.lax.bitcast_convert_type(sel, jnp.uint32)
    hi = (bits >> 16).astype(jnp.uint16)
    lo = (bits & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    return jnp.concatenate([hi, lo], axis=-1)


def decode_shade_rows(rows):
    """(..., 106) uint16 -> (..., 53) f32, bit-exact."""
    hi = rows[..., :SH_WIDTH].astype(jnp.uint32) << 16
    lo = rows[..., SH_WIDTH:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


def build_shade_rows(attr_rows):
    """Full-table encode at scene build / dynamic re-bake; None above
    the fast-path row budget (the u16 fetch would price the same as
    attr_rows there — no point carrying the second table)."""
    if attr_rows is None or attr_rows.shape[0] > SHADE_ROWS_MAX:
        return None
    return encode_shade_rows(attr_rows)


# ---------------------------------------------------------------------------
# Quantized narrow shade rows — the Sponza-scale fast gather
# ---------------------------------------------------------------------------
# The gather fast path is TABLE BYTES <= ~16 MB VMEM, dtype-agnostic
# (BENCH.md r3 batch 4), so above SHADE_ROWS_MAX the exact 212 B/row u16
# split can't ride it. This variant squeezes the per-TRIANGLE shade fetch
# to 29 u16 columns (58 B/row → 262k tris = 15.2 MB, inside the gate):
#
#   [0:9]   vertex normals  (3x xyz, LOCAL space)  bf16 bit patterns
#   [9:18]  vertex tangents (3x xyz, LOCAL space)  bf16 bit patterns
#   [18]    tangent w signs (bit k set → vertex k's w = +1, else -1)
#   [19:23] uv0 EXACT (u hi, u lo, v hi, v lo — f32 bit halves)
#   [23:27] (uv1-uv0, uv2-uv0) f16 bit patterns (delta magnitudes are
#           small → error ~|delta| * 2^-11, subpixel at any sane texel
#           density; the base stays exact so large tiling offsets cost
#           nothing)
#   [27]    material id
#   [28]    instance id
#
# The instance-dependent block (normal matrix + packed material row)
# moves to a tiny per-INSTANCE side table (N, 26) f32 — a second
# row-gather from a KB-scale table (same ~3.8 ns/row as any fast
# gather). Quality: normals/tangents re-normalize after the nmat
# transform, so bf16's 2^-8 relative error lands well under SVGF/TAA
# noise on secondary-ray shading (primary-visible attributes still ride
# the exact raster path). Reference analog: closesthit.rchit:30-54
# per-hit attribute fetch.
SHQ_WIDTH = 29
SHQ_N0 = 0
SHQ_T0 = 9
SHQ_WSIGN = 18
SHQ_UV0 = 19
SHQ_DUV = 23
SHQ_MAT = 27
SHQ_INST = 28
# fast-gather byte gate (BENCH.md r3 batch 4: 16.1 MB measured fast,
# 21.5 slow); u16 ids cap instances/materials at 65536
SHADE_Q_MAX_BYTES = 16 * 1024 * 1024
SHADE_Q_ROWS_MAX = SHADE_Q_MAX_BYTES // (2 * SHQ_WIDTH)
# instance side table layout: [0:9] normal matrix, [9:25] packed
# material row (ops/shade._pack_materials), [25] material id
SHQI_NMAT = 0
SHQI_MROW = 9
SHQI_MAT = 25
SHQI_WIDTH = 26


def _f32_to_bf16_bits(x):
    return (jax.lax.bitcast_convert_type(
        x.astype(jnp.float32), jnp.uint32) >> 16).astype(jnp.uint16)


def _bf16_bits_to_f32(b):
    return jax.lax.bitcast_convert_type(
        b.astype(jnp.uint32) << 16, jnp.float32)


def _f32_to_f16_bits(x):
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16)


def _f16_bits_to_f32(b):
    return jax.lax.bitcast_convert_type(
        b.astype(jnp.uint16), jnp.float16).astype(jnp.float32)


def build_shade_rows_q(vertices, instances, soup):
    """(T, 29) uint16 quantized shade rows (layout above). All columns
    are transform-INVARIANT (local normals/tangents, uv, ids), so
    dynamic updates never touch this table — only the instance side
    table (build_inst_shade) follows transforms."""
    T = soup.i0.shape[0]
    if T > SHADE_Q_ROWS_MAX or instances.transform.shape[0] > 65536:
        return None
    i0, i1, i2 = soup.i0, soup.i1, soup.i2
    n_bits = jnp.concatenate(
        [_f32_to_bf16_bits(vertices.normal[ik]) for ik in (i0, i1, i2)],
        axis=-1)                                             # (T, 9)
    t_bits = jnp.concatenate(
        [_f32_to_bf16_bits(vertices.tangent[ik][:, :3])
         for ik in (i0, i1, i2)], axis=-1)                   # (T, 9)
    wsign = sum(((vertices.tangent[ik][:, 3] > 0.0)
                 .astype(jnp.uint16) << k)
                for k, ik in enumerate((i0, i1, i2)))        # (T,)
    uv0 = vertices.uv[i0]                                    # (T, 2)
    uv0_bits = jax.lax.bitcast_convert_type(uv0, jnp.uint32)
    uv0_cols = jnp.stack([
        (uv0_bits[:, 0] >> 16).astype(jnp.uint16),
        (uv0_bits[:, 0] & 0xFFFF).astype(jnp.uint16),
        (uv0_bits[:, 1] >> 16).astype(jnp.uint16),
        (uv0_bits[:, 1] & 0xFFFF).astype(jnp.uint16)], axis=-1)
    duv = jnp.concatenate([vertices.uv[i1] - uv0,
                           vertices.uv[i2] - uv0], axis=-1)  # (T, 4)
    duv_bits = _f32_to_f16_bits(duv)
    mat = instances.material[soup.instance].astype(jnp.uint16)
    inst = soup.instance.astype(jnp.uint16)
    return jnp.concatenate([
        n_bits, t_bits, wsign[:, None], uv0_cols, duv_bits,
        mat[:, None], inst[:, None]], axis=-1)


def build_inst_shade(instances, materials):
    """(N, 26) f32 per-instance shade side table (normal matrix + packed
    material row). KB-scale — rebuilt whole on every dynamic commit."""
    from ..ops.shade import _pack_materials  # local: avoid import cycle

    n = instances.transform.shape[0]
    mat_ids = instances.material
    return jnp.concatenate([
        instances.normal_transform[:, :3, :3].reshape(n, 9),
        _pack_materials(materials)[mat_ids],
        mat_ids[:, None].astype(jnp.float32)], axis=-1)


def decode_shade_rows_q(qrow, inst_row):
    """(..., 29) u16 + (..., 26) f32 → the decode_shade_rows 53-column
    f32 layout (SH_* offsets), so _shade_hit's consumer code is shared.
    uv reconstruction: per-vertex uv_k = uv0 + delta_k (delta 0 for
    vertex 0, exact base)."""
    parts = []
    for k in range(3):
        n = _bf16_bits_to_f32(qrow[..., SHQ_N0 + 3 * k:SHQ_N0 + 3 * k + 3])
        t3 = _bf16_bits_to_f32(qrow[..., SHQ_T0 + 3 * k:SHQ_T0 + 3 * k + 3])
        w = jnp.where((qrow[..., SHQ_WSIGN:SHQ_WSIGN + 1]
                       & jnp.uint16(1 << k)) > 0, 1.0, -1.0)
        u_hi = qrow[..., SHQ_UV0].astype(jnp.uint32) << 16
        u_lo = qrow[..., SHQ_UV0 + 1].astype(jnp.uint32)
        v_hi = qrow[..., SHQ_UV0 + 2].astype(jnp.uint32) << 16
        v_lo = qrow[..., SHQ_UV0 + 3].astype(jnp.uint32)
        uv0 = jnp.stack([
            jax.lax.bitcast_convert_type(u_hi | u_lo, jnp.float32),
            jax.lax.bitcast_convert_type(v_hi | v_lo, jnp.float32)],
            axis=-1)
        if k == 0:
            uv = uv0
        else:
            uv = uv0 + _f16_bits_to_f32(
                qrow[..., SHQ_DUV + 2 * (k - 1):SHQ_DUV + 2 * k])
        parts.append(jnp.concatenate([n, t3, w, uv], axis=-1))  # (..., 9)
    nmat = inst_row[..., SHQI_NMAT:SHQI_NMAT + 9]
    mat_id = inst_row[..., SHQI_MAT:SHQI_MAT + 1]
    mrow = inst_row[..., SHQI_MROW:SHQI_MROW + 16]
    return jnp.concatenate(parts + [nmat, mat_id, mrow], axis=-1)
