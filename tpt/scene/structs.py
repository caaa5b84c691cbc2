"""Device-side scene data model as JAX pytrees.

Capability parity with the reference PODs (/root/reference/src/
scene_structs.h): MeshData, LBVHData, Material table, LightData,
EnvMapAliasTable — but laid out TPU-first: every vec3 is a SoA `Vec3` of
flat arrays (full 128-lane tiles), textures live in one padded atlas
instead of bindless handles, and material/texture tables are ordinary
jitted-in arrays instead of __constant__ memory.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3


class MaterialType(IntEnum):
    # same ordering as the reference enum (/root/reference/src/scene_structs.h:8-14)
    MICROFACET_PBR = 0
    DIFFUSE = 1
    SPECULAR_REFLECTION = 2
    SPECULAR_REFRACTION = 3


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MeshData:
    """Triangle soup for the whole scene, SoA over vertices/triangles."""

    positions: Vec3        # [V]
    normals: Vec3          # [V] shading normals
    tangents: Vec3         # [V] from UVs (zero if no UVs)
    uv_u: jnp.ndarray      # [V] f32
    uv_v: jnp.ndarray      # [V] f32
    i0: jnp.ndarray        # [T] int32 triangle vertex indices
    i1: jnp.ndarray
    i2: jnp.ndarray
    material_ids: jnp.ndarray   # [T] int32
    geom_normals: Vec3          # [T] geometric (face) normals
    # packed shading rows: ONE row-gather fetches what would otherwise be
    # ~8 scalar gathers (a 2M-lane gather costs ~30 ms on v5e regardless
    # of payload width — benchmarks/primitives.py; same design as SVGF's
    # packed history matrix)
    shade_tri: jnp.ndarray = None  # [T, 8] f32: i0,i1,i2,matid (int32
    #                                bit-cast), geom normal xyz, pad
    shade_vtx: jnp.ndarray = None  # [V, 8] f32: normal xyz, tangent xyz, u, v
    # fully de-normalized hit row (mesh.finalize_mesh docstring): matid +
    # geom normal + all 3 vertices' attrs + material fields in ONE row —
    # the per-bounce shade fetch is a single gather (built when the scene
    # passes mat_packed; None in mesh-only test fixtures)
    shade_hit: jnp.ndarray = None  # [T, 40] f32

    @property
    def num_triangles(self) -> int:
        return int(self.i0.shape[0])

    @property
    def num_vertices(self) -> int:
        return int(self.uv_u.shape[0])

    def tri_vertices(self, tri_idx):
        """Gather the three corner positions of triangles `tri_idx`."""
        v0 = self.positions.take(jnp.take(self.i0, tri_idx, mode="clip"))
        v1 = self.positions.take(jnp.take(self.i1, tri_idx, mode="clip"))
        v2 = self.positions.take(jnp.take(self.i2, tri_idx, mode="clip"))
        return v0, v1, v2


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MaterialTable:
    """SoA over materials; jitted in as constants (replaces __constant__
    tables, /root/reference/src/pathtrace_wavefront.cu:35-39)."""

    basecolor: Vec3             # [M]
    metallic: jnp.ndarray       # [M] f32
    roughness: jnp.ndarray      # [M] f32
    emittance: jnp.ndarray      # [M] f32
    ior: jnp.ndarray            # [M] f32
    mtype: jnp.ndarray          # [M] int32 (MaterialType)
    tex_diffuse: jnp.ndarray    # [M] int32 atlas texture id, -1 = none
    tex_metallic_roughness: jnp.ndarray  # [M] int32
    tex_normal: jnp.ndarray     # [M] int32
    # [M, 16] f32: basecolor xyz, metallic, roughness, emittance, ior,
    # mtype, tex_d, tex_mr, tex_n (ints bit-cast), pad — one row-gather
    # replaces the 9 per-field gathers
    packed: jnp.ndarray = None
    # static: whether ANY material carries each texture slot (lets the
    # shading path drop whole atlas-sampling graphs at trace time)
    any_tex_diffuse: bool = field(metadata=dict(static=True), default=True)
    any_tex_mr: bool = field(metadata=dict(static=True), default=True)
    any_tex_normal: bool = field(metadata=dict(static=True), default=True)

    @property
    def num_materials(self) -> int:
        return int(self.metallic.shape[0])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LightData:
    """Emissive-triangle table + area CDF for NEE
    (reference buildLightCDF — /root/reference/src/scene.cpp:579-631)."""

    tri_idx: jnp.ndarray   # [L] int32 triangle index of each light
    cdf: jnp.ndarray       # [L] f32 normalized area CDF (last = 1)
    areas: jnp.ndarray     # [L] f32 triangle areas
    total_area: jnp.ndarray  # scalar f32
    # [L, 16] f32: v0 xyz, v1 xyz, v2 xyz, face normal xyz, emitted
    # radiance Le xyz (basecolor*emittance, precomputed). One row-gather
    # per NEE sample replaces ~13 (tri_idx + 3 vertex-index + 9 position
    # gathers) plus the light-material gather
    packed: jnp.ndarray = None

    @property
    def num_lights(self) -> int:
        return int(self.tri_idx.shape[0])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TextureAtlas:
    """All LDR textures packed into one (AH, AW) RGBA atlas, SoA per channel.

    Replaces bindless cudaTextureObject handles
    (/root/reference/src/scene.h:94-145) with gather-based bilinear sampling.
    Per-texture placement arrays are indexed by texture id.
    """

    r: jnp.ndarray  # [AH, AW] f32 (linear 0..1, NOT degammaed — shader does 2.2)
    g: jnp.ndarray
    b: jnp.ndarray
    a: jnp.ndarray
    x0: jnp.ndarray      # [Ntex] int32 top-left col
    y0: jnp.ndarray      # [Ntex] int32 top-left row
    width: jnp.ndarray   # [Ntex] int32
    height: jnp.ndarray  # [Ntex] int32

    @property
    def num_textures(self) -> int:
        return int(self.x0.shape[0])

    @staticmethod
    def empty() -> "TextureAtlas":
        z = jnp.zeros((8, 128), jnp.float32)
        zi = jnp.zeros((1,), jnp.int32)
        one = jnp.ones((1,), jnp.int32)
        return TextureAtlas(z, z, z, z, zi, zi, one, one)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnvMap:
    """HDR environment: equirect radiance + precomputed PDF map + Vose alias
    table over texels for O(1) direct sampling (reference builds the same
    three structures — /root/reference/src/scene.cpp:183-300; its device
    alias sampler is dead code, ours is live in NEE)."""

    r: jnp.ndarray       # [H, W] f32 radiance
    g: jnp.ndarray
    b: jnp.ndarray
    pdf: jnp.ndarray     # [H, W] f32 solid-angle pdf of sampling each texel dir
    alias: jnp.ndarray   # [H*W] int32 Vose alias index
    prob: jnp.ndarray    # [H*W] f32 Vose acceptance probability
    enabled: bool = field(metadata=dict(static=True), default=False)

    @property
    def shape(self):
        return self.r.shape

    @staticmethod
    def disabled() -> "EnvMap":
        z = jnp.zeros((8, 128), jnp.float32)
        return EnvMap(z, z, z, z, jnp.zeros((8 * 128,), jnp.int32),
                      jnp.zeros((8 * 128,), jnp.float32), enabled=False)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LBVHData:
    """Linear BVH arrays (layout mirrors the reference:
    internal nodes [0, T-2], leaves [T, 2T-1] —
    /root/reference/src/scene_structs.h:151-169)."""

    aabb_min: Vec3            # [2T] node bounds
    aabb_max: Vec3            # [2T]
    left: jnp.ndarray         # [2T] int32 child node id (-1 for leaf)
    right: jnp.ndarray        # [2T] int32
    parent: jnp.ndarray       # [2T] int32
    escape: jnp.ndarray       # [2T] int32 stackless escape link (-1 = done)
    prim_index: jnp.ndarray   # [2T] int32: for leaf nodes, the triangle id; -1 otherwise
    num_triangles: int = field(metadata=dict(static=True), default=0)

    @property
    def root(self) -> int:
        return 0

    @staticmethod
    def empty() -> "LBVHData":
        z3 = Vec3.zeros((2,))
        zi = jnp.full((2,), -1, jnp.int32)
        return LBVHData(z3, z3, zi, zi, zi, zi, zi, num_triangles=1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SceneData:
    """Everything the integrators need, as one pytree (closed over by jit)."""

    mesh: MeshData
    materials: MaterialTable
    lights: LightData
    atlas: TextureAtlas
    env: EnvMap
    bvh: Optional[LBVHData] = None
    pack: Optional["object"] = None  # PacketBVH (bvh/pack.py), Pallas backend
    sweep: Optional["object"] = None  # SweepTables (bvh/treelet.py), BVH_SWEEP
