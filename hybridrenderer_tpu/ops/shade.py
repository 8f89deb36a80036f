"""PBR shading math — the engine's single BRDF module.

Vectorized port of the shader library's Cook-Torrance evaluation
(common.glsl:171-219: EtaToReflectivity / FresnelSchlick /
MicrofacetDistribution / MicrofacetShadowing / EvalPbr) and the material
point fetch (common.glsl:282-337). All functions are elementwise over
leading dims — (H, W) images or (R,) ray batches alike.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core import maths
from . import texture as tex_ops

PI = 3.14159265359
MIN_ROUGHNESS = 0.03 * 0.03  # common.glsl:46


def luminance(rgb):
    """Rec.709 luma (temporal.comp CalculateLuminance)."""
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2])


def eta_to_reflectivity(eta):
    return ((eta - 1.0) ** 2) / ((eta + 1.0) ** 2)


def fresnel_schlick(specular, normal, outgoing):
    """common.glsl:182-186 (note: |cos| as the reference)."""
    cosine = maths.dot(normal, outgoing, keepdims=True)
    f = specular + (1.0 - specular) * jnp.clip(1.0 - jnp.abs(cosine), 0.0, 1.0) ** 5
    nonzero = jnp.any(specular != 0.0, axis=-1, keepdims=True)
    return jnp.where(nonzero, f, 0.0)


def microfacet_distribution(roughness, normal, halfway):
    cosine = maths.dot(normal, halfway)
    r2 = roughness * roughness
    c2 = cosine * cosine
    denom = c2 * (r2 - 1.0) + 1.0
    d = r2 / (PI * denom * denom)
    return jnp.where(cosine > 0.0, d, 0.0)


def _microfacet_shadowing1(roughness, normal, halfway, direction):
    cosine = maths.dot(normal, direction)
    c2 = cosine * cosine
    cosine_h = maths.dot(halfway, direction)
    r2 = roughness * roughness
    g = 2.0 / (jnp.sqrt(jnp.maximum(((r2 * (1.0 - c2)) + c2) / jnp.maximum(c2, 1e-12), 0.0)) + 1.0)
    return jnp.where(cosine * cosine_h > 0.0, g, 0.0)


def microfacet_shadowing(roughness, normal, halfway, outgoing, incoming):
    return (_microfacet_shadowing1(roughness, normal, halfway, outgoing)
            * _microfacet_shadowing1(roughness, normal, halfway, incoming))


def eval_pbr(colour, ior, roughness, metallic, normal, outgoing, incoming):
    """EvalPbr (common.glsl:203-219): diffuse + specular, cosine-weighted.

    ``outgoing`` = direction to viewer, ``incoming`` = direction to light.
    Scalar args broadcast; colour/normal/... are (..., 3).
    """
    roughness = roughness[..., None] if jnp.ndim(roughness) == jnp.ndim(colour) - 1 else roughness
    metallic_ = metallic[..., None] if jnp.ndim(metallic) == jnp.ndim(colour) - 1 else metallic

    reflectivity = maths.mix(
        jnp.broadcast_to(eta_to_reflectivity(jnp.float32(ior)), colour.shape),
        colour, metallic_,
    )
    n_dot_o = maths.dot(normal, outgoing, keepdims=True)
    up_normal = jnp.where(n_dot_o <= 0.0, -normal, normal)
    f1 = fresnel_schlick(reflectivity, up_normal, outgoing)
    halfway = maths.normalize(incoming + outgoing)
    f = fresnel_schlick(reflectivity, halfway, incoming)
    d = microfacet_distribution(roughness[..., 0], up_normal, halfway)[..., None]
    g = microfacet_shadowing(roughness[..., 0], up_normal, halfway, outgoing, incoming)[..., None]

    cosine = jnp.abs(maths.dot(up_normal, incoming, keepdims=True))
    diffuse = colour * (1.0 - metallic_) * (1.0 - f1) / PI
    denom = 4.0 * jnp.abs(maths.dot(up_normal, outgoing, keepdims=True)) * \
        jnp.abs(maths.dot(up_normal, incoming, keepdims=True))
    specular = f * d * g / jnp.maximum(denom, 1e-8)

    result = (diffuse + specular) * cosine
    visible = (maths.dot(normal, incoming) * maths.dot(normal, outgoing) > 0.0)[..., None]
    return jnp.where(visible, result, 0.0)


# ---------------------------------------------------------------------------
# Material point evaluation (common.glsl:313-337)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MaterialPoint:
    colour: Any      # (..., 3)
    emission: Any    # (..., 3)
    roughness: Any   # (...)  — squared-roughness convention
    metallic: Any    # (...)
    opacity: Any     # (...)
    material_type: Any  # (...) i32


def _pack_materials(materials):
    """(M, 16) single-row material records — one gather per pixel instead
    of ten (per-row gather cost dominates on this hardware)."""
    M = materials.colour.shape[0]
    return jnp.concatenate([
        materials.colour,                                   # 0:3
        materials.opacity[:, None],                         # 3
        materials.emission,                                 # 4:7
        materials.roughness[:, None],                       # 7
        materials.metallic[:, None],                        # 8
        materials.material_type[:, None].astype(jnp.float32),   # 9
        materials.colour_texture[:, None].astype(jnp.float32),  # 10
        materials.emission_texture[:, None].astype(jnp.float32),  # 11
        materials.roughness_texture[:, None].astype(jnp.float32),  # 12
        materials.normal_texture[:, None].astype(jnp.float32),     # 13
        materials.alpha_mode[:, None].astype(jnp.float32),         # 14
        materials.alpha_cutoff[:, None],                           # 15
    ], axis=-1)


def _has_textures(textures) -> bool:
    """Static: the empty TextureStack placeholder is (1, 1, 1, 4)."""
    return textures.data.shape[1] > 1 or textures.data.shape[2] > 1


def get_material_point(materials, mat_id, uv, textures) -> MaterialPoint:
    """Fetch + texture-modulate material params at surface points.

    ``mat_id`` (...,) i32 rows of MaterialTable; applies the reference's
    squared-roughness floor (common.glsl:330-333).
    """
    row = _pack_materials(materials)[mat_id]  # one gather
    return material_point_from_row(row, uv, textures)


def material_point_from_row(row, uv, textures) -> MaterialPoint:
    """get_material_point when the (..., 16) packed material row was
    already fetched — e.g. joined into scene.attr_rows, where the
    material ride-along makes the surface-point fetch gather-free."""
    base_colour = row[..., 0:3]
    base_opacity = row[..., 3]
    emission = row[..., 4:7]
    roughness = row[..., 7]
    metallic = row[..., 8]
    mat_type = row[..., 9].astype(jnp.int32)

    # STATIC slot gating: a slot no material binds skips its gather
    # entirely (sample_bilinear clamps invalid ids and gathers anyway —
    # the discarded fetch costs the same as a real one)
    used = getattr(textures, "slot_usage", (True, True, True, True))
    colour = base_colour
    opacity = base_opacity
    if _has_textures(textures):
        ones = jnp.ones((4,), jnp.float32)
        if used[0]:
            albedo_tex = tex_ops.sample_stack(
                textures, row[..., 10].astype(jnp.int32), uv, ones)
            colour = base_colour * albedo_tex[..., :3]
            opacity = base_opacity * albedo_tex[..., 3]
        if used[1]:
            em_tex = tex_ops.sample_stack(
                textures, row[..., 11].astype(jnp.int32), uv, ones)
            emission = emission * em_tex[..., :3]
        if used[2]:
            mr_tex = tex_ops.sample_stack(
                textures, row[..., 12].astype(jnp.int32), uv, ones)
            roughness = roughness * mr_tex[..., 1]
            metallic = metallic * mr_tex[..., 2]

    r2 = roughness * roughness
    r2 = jnp.where(r2 < MIN_ROUGHNESS, 0.0, r2)
    return MaterialPoint(
        colour=colour,
        emission=emission,
        roughness=r2,
        metallic=metallic,
        opacity=opacity,
        material_type=mat_type,
    )


def apply_normal_map(materials, mat_id, shading_normal, tangent, uv,
                     textures, nrm_tex_id=None):
    """CalculateNormal (common.glsl:293-303): TBN-transformed normal map.
    Pass ``nrm_tex_id`` when it was already fetched (joined material row)
    to skip the per-point gather."""
    used = getattr(textures, "slot_usage", (True, True, True, True))
    if not _has_textures(textures) or not used[3]:
        return maths.normalize(shading_normal)
    if nrm_tex_id is None:
        nrm_tex_id = materials.normal_texture[mat_id]
    n = maths.normalize(shading_normal)
    t = maths.normalize(tangent[..., :3])
    t_len = maths.length(tangent[..., :3])
    w = tangent[..., 3]
    b = maths.cross(n, t) * jnp.where(jnp.abs(w) < 0.001, 1.0, w)[..., None]
    nm = tex_ops.sample_stack(
        textures, nrm_tex_id, uv,
        jnp.array([0.5, 0.5, 1.0, 1.0], jnp.float32))[..., :3] * 2.0 - 1.0
    mapped = maths.normalize(
        t * nm[..., 0:1] + b * nm[..., 1:2] + n * nm[..., 2:3]
    )
    use = ((nrm_tex_id >= 0) & (t_len >= 0.001))[..., None]
    return jnp.where(use, mapped, n)
