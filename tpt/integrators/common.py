"""Shared integrator machinery: surface-property fetch (normal mapping, UV
interpolation, texture application), the pluggable ray-cast backend seam,
and radiance accumulation helpers.

Mirrors GetSurfaceProperties (/root/reference/src/common/cuda_utilities.h:
279-326) and the texture application in the shading kernels
(/root/reference/src/kernels/shading.cu:108-116).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RayCastBackend, RenderConfig
from ..core.vec import Vec3, where as vwhere
from ..materials.bsdf import MaterialLanes
from ..scene.structs import MeshData, SceneData, TextureAtlas
from ..scene.texture import sample_atlas
from .intersect import (
    HitRecord,
    brute_force_any_hit,
    brute_force_closest_hit,
)


@dataclass(frozen=True)
class Raycaster:
    """Pluggable ray-cast backend behind one stage interface (the TPU
    analogue of the reference's software-LBVH vs OptiX seam, SURVEY.md C9/C13)."""

    closest_hit: Callable[..., HitRecord]
    any_hit: Callable[..., jnp.ndarray]
    name: str = "brute_force"


def make_raycaster(scene: SceneData, cfg: RenderConfig,
                   primary_rays: bool = False) -> Raycaster:
    if cfg.backend == RayCastBackend.BRUTE_FORCE or scene.bvh is None:
        return Raycaster(
            closest_hit=lambda o, d, t_max=None: brute_force_closest_hit(scene.mesh, o, d, t_max),
            any_hit=lambda o, d, t_max: brute_force_any_hit(scene.mesh, o, d, t_max),
            name="brute_force",
        )
    if cfg.backend == RayCastBackend.BVH_PALLAS:
        from ..bvh.pallas_traverse import pallas_closest_hit, pallas_any_hit

        knobs = dict(group=primary_rays and cfg.trav_group_primary
                     or cfg.trav_group,
                     node_pops=cfg.trav_node_pops,
                     cluster_pops=cfg.trav_cluster_pops)
        return Raycaster(
            closest_hit=lambda o, d, t_max=None: pallas_closest_hit(
                scene.mesh, scene.pack, o, d, t_max, **knobs),
            any_hit=lambda o, d, t_max: pallas_any_hit(
                scene.mesh, scene.pack, o, d, t_max, **knobs),
            name="bvh_pallas",
        )
    if cfg.backend == RayCastBackend.BVH_TREELET:
        from ..bvh.pallas_traverse import (
            packet_closest_hit_wide,
            pallas_any_hit,
        )
        from ..bvh.pallas_treelet import treelet_closest_hit
        from ..integrators.intersect import FLT_MAX as _FMAX

        pack = scene.pack
        if pack is None or pack.top_f32 is None:
            raise ValueError(
                "BVH_TREELET requires treelet tables "
                "(host.build(with_bvh=True) attaches them for wide packs)")
        knobs = dict(group=primary_rays and cfg.trav_group_primary
                     or cfg.trav_group,
                     node_pops=cfg.trav_node_pops,
                     cluster_pops=cfg.trav_cluster_pops,
                     slots=cfg.treelet_slots,
                     max_rounds=cfg.treelet_max_rounds)
        wide_knobs = dict(group=cfg.trav_group, node_pops=cfg.trav_node_pops,
                          cluster_pops=cfg.trav_cluster_pops)

        def closest(o, d, t_max=None, seed=None, hard=None):
            if t_max is None:
                t_max = jnp.full((o.shape[0],), _FMAX)
            if hard is None:
                return treelet_closest_hit(pack, o, d, t_max, seed=seed,
                                           **knobs)
            # hybrid: the sorted pool has easy rays in the prefix (grouped
            # by target treelet) and hard grazing rays in a dense suffix;
            # each kernel sees the other region as dead lanes (t_max=-1)
            # and skips its packets at the root test
            hit_e = treelet_closest_hit(
                pack, o, d, jnp.where(hard, -1.0, t_max), seed=seed, **knobs)
            hit_h = packet_closest_hit_wide(
                pack, o, d, jnp.where(hard, t_max, -1.0), **wide_knobs)
            pick = lambda a, b: jnp.where(hard, a, b)
            return HitRecord(t=pick(hit_h.t, hit_e.t),
                             tri=pick(hit_h.tri, hit_e.tri),
                             u=pick(hit_h.u, hit_e.u),
                             v=pick(hit_h.v, hit_e.v))

        return Raycaster(
            closest_hit=closest,
            any_hit=lambda o, d, t_max: pallas_any_hit(
                scene.mesh, pack, o, d, t_max, **wide_knobs),
            name="bvh_treelet",
        )
    if cfg.backend == RayCastBackend.BVH_SWEEP:
        from ..bvh.pallas_traverse import (packet_closest_hit_wide,
                                           pallas_any_hit)
        from ..bvh.sweepcast import (sweep_any_hit, sweep_cast,
                                     sweep_cast_sorted)
        from ..integrators.intersect import FLT_MAX as _FMAX

        pack, sweep = scene.pack, scene.sweep
        if pack is None or sweep is None or pack.num_treelets == 0:
            raise ValueError(
                "BVH_SWEEP requires sweep tables "
                "(host.build(with_bvh=True) attaches them for wide,"
                " non-streaming packs)")
        wide_knobs = dict(group=cfg.trav_group, node_pops=cfg.trav_node_pops,
                          cluster_pops=cfg.trav_cluster_pops)

        if primary_rays and not cfg.sweep_primary:
            # raster-coherent primaries: the wide packet kernel with the
            # primary-tuned group wins (measured 85 vs 93 ms/1M on v5e)
            prim_knobs = dict(wide_knobs, group=cfg.trav_group_primary)

            def closest(o, d, t_max=None):
                if t_max is None:
                    t_max = jnp.full((o.shape[0],), _FMAX)
                return packet_closest_hit_wide(pack, o, d, t_max,
                                               **prim_knobs)
        else:
            # cfg.sweep_primary routes bounce 0 here too: the caller
            # passes scan slots for the raster-order pool (no bin sort)
            # and the dense sweep drains tiny raster unions
            def closest(o, d, t_max=None, sweep_slots=None):
                if t_max is None:
                    t_max = jnp.full((o.shape[0],), _FMAX)
                if sweep_slots is None:
                    return sweep_cast(pack, sweep, o, d, t_max,
                                      slots=cfg.sweep_slots,
                                      kernel=cfg.sweep_kernel,
                                      unroll=cfg.sweep_unroll,
                                      tail_compact=cfg.sweep_tail_compact,
                                      key_slots=cfg.sweep_key_slots,
                                      groups=cfg.sweep_groups)
                s_o, s_t, thr = sweep_slots
                return sweep_cast_sorted(pack, sweep, o, d, t_max,
                                         s_o, s_t, thr,
                                         kernel=cfg.sweep_kernel,
                                         unroll=cfg.sweep_unroll,
                                         tail_compact=cfg.sweep_tail_compact,
                                         groups=cfg.sweep_groups)

        if cfg.sweep_shadow:
            # shadow rays through the sweep pipeline too: no bin sort
            # (pool order inherits the extension sort's coherence), the
            # kernel's any-hit mode demand-drops slots on first occlusion
            def any_hit(o, d, t_max):
                return sweep_any_hit(
                    pack, sweep, o, d, t_max, slots=cfg.sweep_slots,
                    kernel=cfg.sweep_kernel, unroll=cfg.sweep_unroll,
                    group=cfg.trav_group, node_pops=cfg.trav_node_pops,
                    cluster_pops=cfg.trav_cluster_pops,
                    groups=cfg.sweep_groups)
        else:
            def any_hit(o, d, t_max):
                return pallas_any_hit(scene.mesh, pack, o, d, t_max,
                                      **wide_knobs)
        return Raycaster(
            closest_hit=closest,
            any_hit=any_hit,
            name="bvh_sweep",
        )
    from ..bvh.traverse import bvh_closest_hit, bvh_any_hit

    return Raycaster(
        closest_hit=lambda o, d, t_max=None: bvh_closest_hit(
            scene.mesh, scene.bvh, o, d, t_max, stack_depth=cfg.bvh_stack_depth),
        any_hit=lambda o, d, t_max: bvh_any_hit(scene.mesh, scene.bvh, o, d, t_max),
        name="bvh_xla",
    )


def interpolate_surface(mesh: MeshData, tri: jnp.ndarray, bu: jnp.ndarray,
                        bv: jnp.ndarray):
    """Barycentric interpolation of shading normal, tangent and UV at hits.
    Weights: w = 1-u-v on v0, u on v1, v on v2 (reference convention)."""
    tri_c = jnp.maximum(tri, 0)
    i0 = jnp.take(mesh.i0, tri_c, mode="clip")
    i1 = jnp.take(mesh.i1, tri_c, mode="clip")
    i2 = jnp.take(mesh.i2, tri_c, mode="clip")
    w = 1.0 - bu - bv

    n = (mesh.normals.take(i0) * w + mesh.normals.take(i1) * bu
         + mesh.normals.take(i2) * bv).normalize()
    tang = (mesh.tangents.take(i0) * w + mesh.tangents.take(i1) * bu
            + mesh.tangents.take(i2) * bv)
    uu = (jnp.take(mesh.uv_u, i0, mode="clip") * w
          + jnp.take(mesh.uv_u, i1, mode="clip") * bu
          + jnp.take(mesh.uv_u, i2, mode="clip") * bv)
    vv = (jnp.take(mesh.uv_v, i0, mode="clip") * w
          + jnp.take(mesh.uv_v, i1, mode="clip") * bu
          + jnp.take(mesh.uv_v, i2, mode="clip") * bv)
    return n, tang, uu, vv


def get_surface_properties(mesh: MeshData, atlas: TextureAtlas,
                           mats: MaterialLanes, tri, bu, bv):
    """Shading normal (normal-mapped when the material has one) + UV."""
    n_shading, tang, uu, vv = interpolate_surface(mesh, tri, bu, bv)

    has_nm = mats.tex_normal >= 0
    # TBN: B = normalize(N x T_interp); T = B x N  (reference order)
    b = n_shading.cross(tang).normalize()
    t = b.cross(n_shading)
    nm_rgb, _ = sample_atlas(atlas, mats.tex_normal, uu, vv)
    mapped = Vec3(nm_rgb.x * 2.0 - 1.0, nm_rgb.y * 2.0 - 1.0, nm_rgb.z * 2.0 - 1.0)
    n_mapped = (t * mapped.x + b * mapped.y + n_shading * mapped.z).normalize()

    n_out = vwhere(has_nm, n_mapped, n_shading)
    return n_out, uu, vv


def apply_material_textures(mats: MaterialLanes, atlas: TextureAtlas, uu, vv
                            ) -> MaterialLanes:
    """basecolor *= degamma(diffuse tex); roughness *= rm.g; metallic *= rm.b."""
    diff_rgb, _ = sample_atlas(atlas, mats.tex_diffuse, uu, vv)
    has_diff = mats.tex_diffuse >= 0
    degamma = Vec3(diff_rgb.x ** 2.2, diff_rgb.y ** 2.2, diff_rgb.z ** 2.2)
    basecolor = vwhere(has_diff, mats.basecolor * degamma, mats.basecolor)

    rm_rgb, _ = sample_atlas(atlas, mats.tex_metallic_roughness, uu, vv)
    has_rm = mats.tex_metallic_roughness >= 0
    roughness = jnp.where(has_rm, mats.roughness * rm_rgb.y, mats.roughness)
    metallic = jnp.where(has_rm, mats.metallic * rm_rgb.z, mats.metallic)

    return MaterialLanes(
        basecolor=basecolor, metallic=metallic, roughness=roughness,
        emittance=mats.emittance, ior=mats.ior, mtype=mats.mtype,
        tex_diffuse=mats.tex_diffuse,
        tex_metallic_roughness=mats.tex_metallic_roughness,
        tex_normal=mats.tex_normal,
    )


def fetch_hit_surface(scene, tri, bu, bv, wo: Vec3):
    """Fused hit-surface fetch over the packed shading rows (MeshData.
    shade_tri/shade_vtx + MaterialTable.packed): 5 row-gathers replace the
    ~35 per-field gathers of the unpacked path (each 2M-lane gather costs
    ~30 ms on v5e regardless of width — the gather COUNT is the cost).
    Atlas sampling graphs are dropped at trace time when no material
    carries that texture slot (MaterialTable.any_tex_*).

    Returns (mats_tex, n_shading, ng_raw, ng_oriented, mat_id, uu, vv) —
    semantics identical to the gather_materials + get_surface_properties +
    apply_material_textures + oriented_geom_normal chain (tests pin
    equality)."""
    from ..materials.bsdf import gather_materials

    mesh = scene.mesh
    tric = jnp.maximum(tri, 0)
    as_int = lambda c: jax.lax.bitcast_convert_type(c, jnp.int32)
    w = 1.0 - bu - bv
    if mesh.shade_hit is not None:
        # the de-normalized [T, 40] hit row (mesh.finalize_mesh): ONE
        # row-gather replaces tri row + 3 vertex rows + material row.
        # Same per-column math/conversions as the 5-gather path below —
        # results are bit-identical (tests/test_wavefront.py pins it)
        row = jnp.take(mesh.shade_hit, tric, axis=0, mode="clip")
        mat_id = as_int(row[:, 0])
        ng_raw = Vec3(row[:, 1], row[:, 2], row[:, 3])
        lerp = lambda c: (row[:, 4 + c] * w + row[:, 12 + c] * bu
                          + row[:, 20 + c] * bv)
        mats = MaterialLanes(
            basecolor=Vec3(row[:, 28], row[:, 29], row[:, 30]),
            metallic=row[:, 31], roughness=row[:, 32],
            emittance=row[:, 33], ior=row[:, 34],
            mtype=row[:, 35].astype(jnp.int32),
            tex_diffuse=row[:, 36].astype(jnp.int32),
            tex_metallic_roughness=row[:, 37].astype(jnp.int32),
            tex_normal=row[:, 38].astype(jnp.int32),
        )
    else:
        trow = jnp.take(mesh.shade_tri, tric, axis=0, mode="clip")
        i0 = as_int(trow[:, 0])
        i1 = as_int(trow[:, 1])
        i2 = as_int(trow[:, 2])
        mat_id = as_int(trow[:, 3])
        ng_raw = Vec3(trow[:, 4], trow[:, 5], trow[:, 6])

        r0 = jnp.take(mesh.shade_vtx, i0, axis=0, mode="clip")
        r1 = jnp.take(mesh.shade_vtx, i1, axis=0, mode="clip")
        r2 = jnp.take(mesh.shade_vtx, i2, axis=0, mode="clip")
        lerp = lambda c: r0[:, c] * w + r1[:, c] * bu + r2[:, c] * bv
        mats = gather_materials(scene.materials, mat_id)

    flip = ng_raw.dot(wo) < 0.0
    ng = vwhere(flip, -1.0 * ng_raw, ng_raw)
    n_shading = Vec3(lerp(0), lerp(1), lerp(2)).normalize()
    tang = Vec3(lerp(3), lerp(4), lerp(5))
    uu = lerp(6)
    vv = lerp(7)

    # normal mapping (TBN as get_surface_properties)
    if scene.materials.any_tex_normal:
        has_nm = mats.tex_normal >= 0
        b = n_shading.cross(tang).normalize()
        t = b.cross(n_shading)
        nm_rgb, _ = sample_atlas(scene.atlas, mats.tex_normal, uu, vv)
        mapped = Vec3(nm_rgb.x * 2.0 - 1.0, nm_rgb.y * 2.0 - 1.0,
                      nm_rgb.z * 2.0 - 1.0)
        n_mapped = (t * mapped.x + b * mapped.y
                    + n_shading * mapped.z).normalize()
        n_out = vwhere(has_nm, n_mapped, n_shading)
    else:
        n_out = n_shading

    # material textures (apply_material_textures, statically gated)
    basecolor, roughness, metallic = (mats.basecolor, mats.roughness,
                                      mats.metallic)
    if scene.materials.any_tex_diffuse:
        diff_rgb, _ = sample_atlas(scene.atlas, mats.tex_diffuse, uu, vv)
        has_diff = mats.tex_diffuse >= 0
        degamma = Vec3(diff_rgb.x ** 2.2, diff_rgb.y ** 2.2,
                       diff_rgb.z ** 2.2)
        basecolor = vwhere(has_diff, basecolor * degamma, basecolor)
    if scene.materials.any_tex_mr:
        rm_rgb, _ = sample_atlas(scene.atlas, mats.tex_metallic_roughness,
                                 uu, vv)
        has_rm = mats.tex_metallic_roughness >= 0
        roughness = jnp.where(has_rm, roughness * rm_rgb.y, roughness)
        metallic = jnp.where(has_rm, metallic * rm_rgb.z, metallic)

    mats_tex = MaterialLanes(
        basecolor=basecolor, metallic=metallic, roughness=roughness,
        emittance=mats.emittance, ior=mats.ior, mtype=mats.mtype,
        tex_diffuse=mats.tex_diffuse,
        tex_metallic_roughness=mats.tex_metallic_roughness,
        tex_normal=mats.tex_normal,
    )
    return mats_tex, n_out, ng_raw, ng, mat_id, uu, vv


def heavy_shading_factor(u: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Synthetic shading load: an `iters`-long sin^2+cos^2 chain that
    multiplies to ~1.0 — the reference's Phase-II stress experiment
    (/root/reference/src/interactions.cu:255-321, README.md:105-109)."""
    if iters <= 0:
        return jnp.ones_like(u)

    def body(i, m):
        s = jnp.sin(m * 12.9898 + u + i.astype(jnp.float32) * 1e-3)
        c = jnp.cos(m * 12.9898 + u + i.astype(jnp.float32) * 1e-3)
        return m * (s * s + c * c)

    return jax.lax.fori_loop(0, iters, body, jnp.ones_like(u))


def apply_russian_roulette(cfg, depth, throughput: Vec3, alive, state):
    """Throughput-proportional termination after cfg.rr_start_bounce (the
    reference leaves its RR stub empty — pathtrace.cu:437 — so this is
    off by default for parity; enabling changes the RNG stream)."""
    if not cfg.russian_roulette:
        return throughput, alive, state
    from ..core import rng as rng_mod

    state, u = rng_mod.rand_float(state)
    p = jnp.clip(throughput.max_component(), 0.05, 1.0)
    active = alive & (depth >= cfg.rr_start_bounce)
    kill = active & (u > p)
    boost = jnp.where(active & ~kill, 1.0 / p, 1.0)
    return throughput * boost, alive & ~kill, state


def compute_env_nee(scene, cfg, raycaster, state, point: Vec3, n_sh: Vec3,
                    ng: Vec3, wo: Vec3, mats, throughput: Vec3, alive):
    """Direct environment sampling via the alias table (capability the
    reference builds but never calls — scene.cpp:183-300 vs the dead
    sampleEnvironmentMap; live here behind cfg.env_nee). Returns
    (state, contribution Vec3 masked by visibility)."""
    from ..core import rng as rng_mod
    from ..core.mathutil import EPSILON, power_heuristic
    from ..materials import bsdf as bsdf_mod
    from ..scene import envmap as envmod

    n = point.shape[0]
    state, u1 = rng_mod.rand_float(state)
    state, u2 = rng_mod.rand_float(state)
    wi, radiance, pdf_env = envmod.sample_env(scene.env, u1, u2)
    cos_surf = jnp.maximum(n_sh.dot(wi), 0.0)
    front = ng.dot(wi) > 0.0
    f = bsdf_mod.eval_bsdf(wo, wi, n_sh, mats)
    pdf_b = bsdf_mod.pdf_bsdf(wo, wi, n_sh, mats)
    w_mis = power_heuristic(pdf_env, pdf_b)
    contrib = throughput * radiance * f * (cos_surf / jnp.maximum(pdf_env, 1e-8) * w_mis)
    is_delta = (mats.mtype == 2) | (mats.mtype == 3)
    mask = (alive & front & ~is_delta & (cos_surf > 0.0)
            & (pdf_env > 0.0) & (contrib.length_sq() > 0.0))
    shadow_ori = point + ng * EPSILON
    t_far = jnp.where(mask, jnp.full((n,), 1e7), -1.0)
    occluded = raycaster.any_hit(shadow_ori, wi, t_far)
    from ..core.vec import where as vwhere3

    return state, vwhere3(mask & ~occluded, contrib, Vec3.zeros((n,)))


def oriented_geom_normal(mesh: MeshData, tri, wo: Vec3) -> Vec3:
    """Face normal flipped into the viewer hemisphere (reference: shading.cu
    'Ng always faces the observer')."""
    ng = mesh.geom_normals.take(jnp.maximum(tri, 0))
    flip = ng.dot(wo) < 0.0
    return vwhere(flip, -1.0 * ng, ng)
