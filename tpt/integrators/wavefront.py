"""Wavefront integrator: the reference's staged pipeline (RayGen -> per
bounce [TraceExtension -> Logic -> Shade -> TraceShadow]) re-designed for
TPU execution semantics.

Key departures from the CUDA original (/root/reference/src/
pathtrace_wavefront.cu, src/kernels/*):
- No queues, no atomic appends: the path pool is kept PHYSICALLY SORTED
  by a ray-coherence key — one multi-operand lax.sort per bounce moves
  the whole path state (measured ~2.6 ms per extra 2M-lane payload
  operand vs ~30 ms per 2M gather), dead lanes get the max key so live
  paths compact into dense packets (the reference's warp-aggregated
  queue compaction as a by-product), and pixel order is restored by one
  sort at frame end. See _sort_pool.
- The reference's per-bounce D2H queue-counter readbacks return in TPU
  form as ONE 4-byte alive-count fetch per bounce (split mode), which
  drives adaptive pool shrinking: later bounces dispatch on a static
  prefix variant of the sorted pool and the frame stops early when no
  path is alive. Exact — tests pin bit-equality against the fixed pool.
- Material-sorted shading becomes lane-parallel lobe evaluation + select
  (materials/bsdf.py); the sort budget goes to traversal coherence, the
  actually-scarce resource on a vector machine.
- The 4-function engine API (init/frame/free) collapses into a pure
  function over an explicit carry pytree, so snapshot/resume and
  multi-chip sharding come for free.

Stage outputs match the reference: separate direct (NEE) and indirect
(BSDF/emissive/env) radiance channels plus first-bounce G-buffers (depth,
geometric normal + material id, textured albedo, motion vectors) feeding
SVGF (/root/reference/src/kernels/logic.cu:67-138).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core import rng
from ..core.camera import Camera, camera_arrays, generate_camera_rays
from ..core.mathutil import (
    EPSILON,
    PDF_DIRAC_DELTA,
    DELTA_THRESHOLD,
    power_heuristic,
    perspective_look_at,
    project_to_screen_uv,
)
from ..core.vec import Vec3, where as vwhere
from ..materials import bsdf
from ..scene import envmap as envmod
from ..scene.lights import sample_light
from ..scene.structs import SceneData
from .common import Raycaster, fetch_hit_surface, make_raycaster
from .intersect import HitRecord


# smallest adaptive-pool prefix variant (each size compiles its own XLA
# program, so the ladder is coarse: n, n/4, n/16, ... down to this floor)
MIN_POOL = 1 << 16


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GBuffers:
    """First-bounce buffers for SVGF (wavefront_internal.cu:285-301)."""

    depth: jnp.ndarray       # [N] f32, -1000 = sky
    normal: Vec3             # [N] geometric normal
    mat_id: jnp.ndarray      # [N] int32, -1 = sky
    albedo: Vec3             # [N] textured basecolor
    motion_u: jnp.ndarray    # [N] pixel-space motion vector
    motion_v: jnp.ndarray

    @staticmethod
    def zeros(n: int) -> "GBuffers":
        return GBuffers(
            depth=jnp.full((n,), -1000.0),
            normal=Vec3.zeros((n,)),
            mat_id=jnp.full((n,), -1, jnp.int32),
            albedo=Vec3.ones((n,)),
            motion_u=jnp.zeros((n,)),
            motion_v=jnp.zeros((n,)),
        )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrameOutput:
    direct: Vec3     # [N] NEE radiance
    indirect: Vec3   # [N] BSDF/emissive/env radiance
    gbuf: GBuffers
    rays_traced: jnp.ndarray  # scalar int32 (extension+shadow), for MRays/s


def _sort_pool(scene, cfg, carry_slice, first):
    """Physically re-sort the live path pool by ray-coherence key.

    TPU rationale (measured, BENCHMARKS.md §6): a multi-operand lax.sort
    costs ~2.6 ms per extra 2M payload operand on top of the ~80 ms base,
    while a single 2M random gather costs ~30 ms — so the whole path
    state rides ONE sort per bounce and nothing is ever gathered. Dead
    lanes get the max key, which compacts live paths into dense packets
    (the reference's queue compaction, as a by-product of the coherence
    sort). Skipped on the first bounce: camera rays are raster-coherent
    and the G-buffers must be written in pixel order."""
    from . import raysort

    world_lo, world_inv = raysort.world_bounds(scene.mesh)

    def do_sort(args):
        (ori, direction, throughput, last_pdf, state, alive, direct,
         indirect, pixel_idx) = args
        key = raysort.coherence_key(ori, direction, world_lo, world_inv,
                                     mode=cfg.sort_key)
        key = jnp.where(alive, key, jnp.int32(1 << 30))
        (_, ox, oy, oz, dx, dy, dz, tx, ty, tz, lp, st, al,
         drx, dry, drz, inx, iny, inz, pidx) = jax.lax.sort(
            (key, ori.x, ori.y, ori.z,
             direction.x, direction.y, direction.z,
             throughput.x, throughput.y, throughput.z,
             last_pdf, state, alive.astype(jnp.int32),
             direct.x, direct.y, direct.z,
             indirect.x, indirect.y, indirect.z, pixel_idx),
            num_keys=1)
        return (Vec3(ox, oy, oz), Vec3(dx, dy, dz), Vec3(tx, ty, tz),
                lp, st, al != 0, Vec3(drx, dry, drz), Vec3(inx, iny, inz),
                pidx)

    if first is False:  # statically known non-first bounce: always sort
        return do_sort(carry_slice)
    return jax.lax.cond(first, lambda a: a, do_sort, carry_slice)


def unsort_by_pixel(pixel_idx, direct: Vec3, indirect: Vec3):
    """Restore pixel order once per frame (pixel_idx is a permutation, so
    sorting by it is the exact inverse of the per-bounce coherence sorts)."""
    (_, dx, dy, dz, ix, iy, iz) = jax.lax.sort(
        (pixel_idx, direct.x, direct.y, direct.z,
         indirect.x, indirect.y, indirect.z), num_keys=1)
    return Vec3(dx, dy, dz), Vec3(ix, iy, iz)


def _sweep_scan_keys(scene: SceneData, cfg: RenderConfig, carry_slice):
    """BVH_SWEEP seed stage 1: dense treelet scan on the unsorted pool +
    the bin-sort keys (dead lanes keyed last, preserving the adaptive
    pool's dense-prefix invariant). Elementwise + one Pallas kernel —
    dispatchable as its own program (see _sweep_seed_sort)."""
    from ..bvh.pallas_sweep import dense_scan
    from ..bvh.sweepcast import bin_key, bin_key2

    (ori, direction, throughput, last_pdf, state, alive, direct,
     indirect, pixel_idx) = carry_slice
    S = cfg.sweep_slots
    pre_tmax = jnp.where(alive, 3.4e38, -1.0)
    s_t, s_o, thr = dense_scan(scene.sweep, ori, direction,
                               pre_tmax, slots=S)
    two_key = cfg.sweep_key_slots >= 3 and S > 2
    key = jnp.where(
        alive, bin_key(s_o, direction, scene.sweep.num_treelets, S,
                       with_octant=not two_key),
        jnp.int32(1 << 30))
    keys = (key,)
    if two_key:
        keys = (key, jnp.where(
            alive,
            bin_key2(s_o, direction, scene.sweep.num_treelets, S),
            jnp.int32(1 << 30)))
    return keys, (s_t, s_o, thr)


def _sweep_bin_sort(cfg: RenderConfig, carry_slice, keys, slots_raw):
    """BVH_SWEEP seed stage 2: ONE multi-operand pool sort by the sweep
    bin key, carrying the pool slice and the scan's candidate slot
    planes as payload operands."""
    (ori, direction, throughput, last_pdf, state, alive, direct,
     indirect, pixel_idx) = carry_slice
    s_t, s_o, thr = slots_raw
    S = cfg.sweep_slots
    sorted_ops = jax.lax.sort(
        tuple(keys) + (ori.x, ori.y, ori.z,
                       direction.x, direction.y, direction.z,
                       throughput.x, throughput.y, throughput.z,
                       last_pdf, state, alive.astype(jnp.int32),
                       direct.x, direct.y, direct.z,
                       indirect.x, indirect.y, indirect.z, pixel_idx,
                       *(s_o[i] for i in range(S)),
                       *(s_t[i] for i in range(S)), thr),
        num_keys=len(keys))
    (ox, oy, oz, dx, dy, dz, tx, ty, tz, lp, stt, al,
     drx, dry, drz, inx, iny, inz, pidx, *slot_ops) = sorted_ops[len(keys):]
    sorted_slice = (Vec3(ox, oy, oz), Vec3(dx, dy, dz), Vec3(tx, ty, tz),
                    lp, stt, al != 0, Vec3(drx, dry, drz),
                    Vec3(inx, iny, inz), pidx)
    slots_data = (tuple(slot_ops[:S]), tuple(slot_ops[S:2 * S]),
                  slot_ops[2 * S])
    return sorted_slice, slots_data


def _sweep_sort_packed(scene: SceneData, cfg: RenderConfig, carry_slice,
                       keys, slots_raw):
    """BVH_SWEEP seed stage 2, packed flavor: ONE pool sort carrying the
    candidate planes compressed to ~4 payload operands
    (sweepcast.pack_seed) — 23-24 operands total vs the 31 that never
    finish the TPU compile and the lean shape's 20 + a second full dense
    scan (BENCHMARKS §4d). Returns (sorted carry slice, sorted keys,
    sorted packed operands); unpack with sweepcast.unpack_seed inside
    the consuming cast program (elementwise, fuses)."""
    from ..bvh.sweepcast import pack_seed

    s_t, s_o, thr = slots_raw
    packed = pack_seed(s_o, s_t, thr, scene.sweep.num_treelets,
                       cfg.sweep_slots, cfg.sweep_key_slots)
    (ori, direction, throughput, last_pdf, state, alive, direct,
     indirect, pixel_idx) = carry_slice
    nk = len(keys)
    sorted_ops = jax.lax.sort(
        tuple(keys) + (ori.x, ori.y, ori.z,
                       direction.x, direction.y, direction.z,
                       throughput.x, throughput.y, throughput.z,
                       last_pdf, state, alive.astype(jnp.int32),
                       direct.x, direct.y, direct.z,
                       indirect.x, indirect.y, indirect.z,
                       pixel_idx) + tuple(packed),
        num_keys=nk)
    (ox, oy, oz, dx, dy, dz, tx, ty, tz, lp, stt, al,
     drx, dry, drz, inx, iny, inz, pidx) = sorted_ops[nk:nk + 19]
    sorted_slice = (Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                    Vec3(tx, ty, tz), lp, stt, al != 0,
                    Vec3(drx, dry, drz), Vec3(inx, iny, inz), pidx)
    return sorted_slice, sorted_ops[:nk], sorted_ops[nk + 19:]


def _sweep_seed_sort(scene: SceneData, cfg: RenderConfig, carry_slice):
    """The BVH_SWEEP pool-seeding stage: dense treelet scan on the
    unsorted pool, then ONE multi-operand pool sort keyed by the sweep
    bin key, returning the sorted pool slice plus the candidate slot
    planes in pool order.

    Composed of _sweep_scan_keys + _sweep_bin_sort so split mode can
    dispatch EACH as its own jit program: the fully-fused seeded bounce
    (scan + 30-operand sort + sweep kernel + tail + shade in one XLA
    program) hangs the TPU backend compiler (>60 min, observed twice),
    and so does scan+sort alone (seed_rest, observed 2026-08-18) — while
    the scan and an equally-shaped sort each compiled in normal time in
    benchmarks/sweep_kernel.py. Costs ~4 ms of extra dispatch per
    bounce per extra program."""
    keys, slots_raw = _sweep_scan_keys(scene, cfg, carry_slice)
    return _sweep_bin_sort(cfg, carry_slice, keys, slots_raw)


def _bounce_body(scene: SceneData, raycaster: Raycaster, cam: Camera,
                 cfg: RenderConfig, view_proj, prev_view_proj, depth, carry,
                 first_static: Optional[bool] = None,
                 sort_this: Optional[bool] = None,
                 sweep_slots: Optional[tuple] = None,
                 ext_hit: Optional[HitRecord] = None):
    """One wavefront bounce over the full path pool (shared by the fused
    fori_loop frame, the split per-dispatch execution, and the shard_map
    multi-chip step — lane count comes from the carry, so a per-device
    shard of the path pool works unchanged).

    `first_static` specializes the first-bounce branches at trace time
    (split mode knows depth on the host): True drops the sort program and
    always writes G-buffers; False drops the G-buffer write. None keeps
    the traced `depth == 0` conds (fused fori_loop mode)."""
    w, h = cam.resolution
    has_lights = scene.lights.num_lights > 0

    from ..config import RayCastBackend

    do_sort = cfg.sort_bounce_rays and cfg.backend.is_packet
    if sort_this is False:  # cfg.sort_every cadence (split mode only)
        do_sort = False

    if True:  # keep original indentation of the bounce body
        (ori, direction, throughput, last_pdf, state, alive,
         direct, indirect, pixel_idx, gbuf, rays) = carry
        n = ori.shape[0]
        first = (depth == 0) if first_static is None else jnp.bool_(
            first_static)

        seed = None
        sweep_slots_data = None
        if ext_hit is not None:
            # cascade split mode: the caller's cast dispatches already
            # seeded AND sorted this pool — no in-body sort or seeding
            do_sort = False
        treelet_seeding = (cfg.backend == RayCastBackend.BVH_TREELET
                           and do_sort and first_static is False)
        sweep_seeding = (cfg.backend == RayCastBackend.BVH_SWEEP
                         and do_sort and first_static is False)
        if sweep_slots is not None:
            # split mode: the caller already seeded this pool as its own
            # dispatch — for rest bounces the carry is bin-sorted with
            # these slot planes (_sweep_seed_sort); for bounce 0
            # (cfg.sweep_primary) the pool is raster-order and unsorted
            # (G-buffers need pixel order) with scan slots only
            sweep_slots_data = sweep_slots
        elif sweep_seeding:
            # fold the sweep pipeline's bin sort INTO the pool sort: the
            # dense scan runs on the unsorted pool, the pool sorts once by
            # the sweep bin key (dead lanes last for the adaptive pool's
            # dense-prefix invariant), and the raycaster gets the sorted
            # candidate planes — no internal sort/unsort inside the cast
            # (sweepcast.sweep_cast_sorted).
            ((ori, direction, throughput, last_pdf, state, alive, direct,
              indirect, pixel_idx), sweep_slots_data) = _sweep_seed_sort(
                scene, cfg, (ori, direction, throughput, last_pdf, state,
                             alive, direct, indirect, pixel_idx))
        elif treelet_seeding:
            # phase-1 scan + treelet-major re-binning: sort the pool by
            # each ray's nearest-treelet ordinal (then direction cone /
            # origin morton within a treelet), so the self-rebinning
            # kernel's packets agree on their first drains. Measured:
            # without the global re-bin a 2048-lane bounce packet demands
            # nearly every treelet and rounds degenerate to whole-tree
            # work (BENCHMARKS §4c). Split mode only (fused fori frames
            # fall back to the unseeded kernel).
            from ..bvh.pallas_treelet import NONE_CODE, treelet_scan
            from . import raysort

            pre_tmax = jnp.where(alive, 3.4e38, -1.0)
            st, sc, so, ovf, cnt = treelet_scan(
                scene.pack, ori, direction, pre_tmax,
                node_pops=cfg.trav_node_pops, group=cfg.trav_group)
            world_lo, world_inv = raysort.world_bounds(scene.mesh)
            dir_key = raysort.coherence_key(ori, direction, world_lo,
                                            world_inv, mode=cfg.sort_key)
            # hybrid partition: grazing multi-treelet rays form their own
            # dense tail group and go to the wide whole-tree kernel
            hard = (alive & (cnt >= cfg.treelet_hard_count)
                    if cfg.treelet_hybrid
                    else jnp.zeros_like(alive))
            key1 = jnp.where(
                alive & hard, jnp.int32(1 << 29),
                jnp.where(alive & (sc != NONE_CODE), so,
                          jnp.where(alive, jnp.int32((1 << 30) - 1),
                                    jnp.int32(1 << 30))))
            (_, _, ox, oy, oz, dx, dy, dz, tx, ty, tz, lp, stt, al,
             drx, dry, drz, inx, iny, inz, pidx, st, sc, ovf,
             hrd) = jax.lax.sort(
                (key1, dir_key, ori.x, ori.y, ori.z,
                 direction.x, direction.y, direction.z,
                 throughput.x, throughput.y, throughput.z,
                 last_pdf, state, alive.astype(jnp.int32),
                 direct.x, direct.y, direct.z,
                 indirect.x, indirect.y, indirect.z, pixel_idx,
                 st, sc, ovf, hard.astype(jnp.int32)), num_keys=2)
            ori, direction = Vec3(ox, oy, oz), Vec3(dx, dy, dz)
            throughput, last_pdf, state = Vec3(tx, ty, tz), lp, stt
            alive = al != 0
            direct, indirect = Vec3(drx, dry, drz), Vec3(inx, iny, inz)
            pixel_idx = pidx
            seed = (st, sc, ovf)
            hard_mask = (hrd != 0) if cfg.treelet_hybrid else None
        elif do_sort and first_static is not True:
            (ori, direction, throughput, last_pdf, state, alive, direct,
             indirect, pixel_idx) = _sort_pool(
                scene, cfg, (ori, direction, throughput, last_pdf, state,
                             alive, direct, indirect, pixel_idx),
                first if first_static is None else False)

        # ---- TraceExtensionRay stage -------------------------------------
        # dead lanes get t_max=-1 so their packets fail even root boxes
        # that contain the stale origin (a 0 limit still passes the slab
        # test with tn=tf=0); post-sort they are dense at the pool tail
        if ext_hit is not None:
            # cascade split mode: the extension cast already ran as its
            # own dispatch chain (sweepcast.cascade_phase1/2) over this
            # (sorted) pool order — _make_bounce_fn bounce_rest_cascade
            hit = ext_hit
        elif (cfg.nearfield_frac > 0.0
                and cfg.backend == RayCastBackend.BVH_PALLAS):
            # two-pass: bounded near-field cast, then unbounded recast of
            # the misses (a hit at exactly t == r1 falls through to pass 2
            # because pass 1 only accepts t < its limit — no hit is lost)
            from . import raysort as _rs

            lo, inv = _rs.world_bounds(scene.mesh)
            diag = jnp.sqrt((1.0 / inv.x) ** 2 + (1.0 / inv.y) ** 2
                            + (1.0 / inv.z) ** 2)
            r1 = cfg.nearfield_frac * diag
            hit1 = raycaster.closest_hit(
                ori, direction, jnp.where(alive, r1, -1.0))
            miss1 = alive & ~hit1.hit_mask
            hit2 = raycaster.closest_hit(
                ori, direction, jnp.where(miss1, 3.4e38, -1.0))
            hit = HitRecord(
                t=jnp.where(hit1.hit_mask, hit1.t, hit2.t),
                tri=jnp.where(hit1.hit_mask, hit1.tri, hit2.tri),
                u=jnp.where(hit1.hit_mask, hit1.u, hit2.u),
                v=jnp.where(hit1.hit_mask, hit1.v, hit2.v))
        elif seed is not None:
            ext_tmax = jnp.where(alive, 3.4e38, -1.0)
            hit = raycaster.closest_hit(ori, direction, ext_tmax, seed=seed,
                                        hard=hard_mask)
        elif sweep_slots_data is not None:
            ext_tmax = jnp.where(alive, 3.4e38, -1.0)
            hit = raycaster.closest_hit(ori, direction, ext_tmax,
                                        sweep_slots=sweep_slots_data)
        else:
            ext_tmax = jnp.where(alive, 3.4e38, -1.0)
            hit = raycaster.closest_hit(ori, direction, ext_tmax)
        rays = rays + jnp.sum(alive.astype(jnp.int32))

        # ---- Logic stage ----------------------------------------------------
        wo = -1.0 * direction
        (mats_tex, n_sh, ng_raw, ng, hit_matid, uu, vv) = fetch_hit_surface(
            scene, hit.tri, hit.u, hit.v, wo)
        point = ori + direction * hit.t

        # miss -> environment into indirect
        miss = alive & ~hit.hit_mask
        if scene.env.enabled:
            env_l = envmod.env_radiance(scene.env, direction)
            # MIS down-weighting of BSDF-sampled env hits is only unbiased
            # when the complementary env-NEE estimator actually runs
            # (radiometry bug found by the analytic battery, round 3)
            if cfg.env_nee:
                pdf_env = envmod.env_pdf(scene.env, direction)
                w_mis = jnp.where(
                    first | (last_pdf > DELTA_THRESHOLD), 1.0,
                    power_heuristic(last_pdf, pdf_env))
            else:
                w_mis = 1.0
            indirect = indirect + vwhere(miss, throughput * env_l * w_mis,
                                         Vec3.zeros((n,)))

        # first bounce -> G-buffers + motion vectors. G-buffers are
        # PER-PIXEL (pool_n / spp_batch): sample batch 0 sits in the
        # raster-order pool PREFIX at bounce 0 (the pool is never sorted
        # before this), so slicing inputs to the prefix writes exactly
        # pixel-ordered buffers — and the 10 G-buffer planes never ride
        # the carry at pool width (spp_batch x the memory; the spp=6
        # 1080p RESOURCE_EXHAUSTED headroom lives here, BENCHMARKS §4d).
        def write_gbuf(gbuf):
            npx = gbuf.depth.shape[0]
            pre = lambda a: a[:npx]
            vpre = lambda v: v.map(lambda c: c[:npx])
            sky = pre(miss)
            depth_b = jnp.where(sky, -1000.0, pre(hit.t))
            normal_b = vwhere(sky, Vec3.zeros((npx,)), vpre(ng_raw))
            matid_b = jnp.where(sky, -1, pre(hit_matid))
            albedo_b = vwhere(sky, Vec3.ones((npx,)), vpre(mats_tex.basecolor))
            u_c, v_c, ok_c = project_to_screen_uv(vpre(point), view_proj)
            u_p, v_p, ok_p = project_to_screen_uv(vpre(point), prev_view_proj)
            mu = jnp.where(~sky & ok_c & ok_p, (u_c - u_p) * w, 0.0)
            mv = jnp.where(~sky & ok_c & ok_p, (v_c - v_p) * h, 0.0)
            return GBuffers(depth=depth_b, normal=normal_b, mat_id=matid_b,
                            albedo=albedo_b, motion_u=mu, motion_v=mv)

        if first_static is None:
            gbuf = jax.lax.cond(first, write_gbuf, lambda g: g, gbuf)
        elif first_static:
            gbuf = write_gbuf(gbuf)
        alive = alive & hit.hit_mask

        # emissive hit -> MIS -> indirect, kill
        emissive = alive & (mats_tex.emittance > 0.0)
        cos_light = jnp.maximum(n_sh.dot(wo), 0.0)
        pdf_la = 1.0 / jnp.maximum(scene.lights.total_area, 1e-20)
        pdf_lsa = pdf_la * (hit.t * hit.t) / jnp.maximum(cos_light, 1e-20)
        w_emis = jnp.where(
            first | (last_pdf > 0.9 * PDF_DIRAC_DELTA) | (not has_lights),
            1.0,
            jnp.where(cos_light > EPSILON,
                      power_heuristic(last_pdf, pdf_lsa), 0.0))
        indirect = indirect + vwhere(
            emissive,
            throughput * mats_tex.basecolor * (mats_tex.emittance * w_emis),
            Vec3.zeros((n,)))
        alive = alive & ~emissive

        # ---- Shade stage: NEE -> ShadowQueue analogue ----------------------
        if has_lights:
            state, lp, ln, pdf_area, ltri, le = sample_light(
                scene.mesh, scene.lights, state)
            # geometry measured from the OFFSET shadow origin: measuring
            # from `point` shortens the segment by EPSILON/cos, which
            # exceeds the any-hit kernels' fixed EPSILON endpoint margin —
            # the light then occludes its own shadow ray and the direct
            # channel silently dies (round-3 bug, caught by the analytic
            # contour-integral test in test_radiometry.py)
            shadow_ori = point + ng * EPSILON
            to_l = lp - shadow_ori
            dist = to_l.length()
            wi_l = to_l * (1.0 / jnp.maximum(dist, 1e-20))
            dist_sq = jnp.maximum(1e-6, dist * dist)
            cos_surf = jnp.maximum(n_sh.dot(wi_l), 0.0)
            cos_l = jnp.maximum(ln.dot(-1.0 * wi_l), 0.0)
            front = ng.dot(wi_l) > 0.0
            if le is None:
                lmat = bsdf.gather_materials(
                    scene.materials,
                    jnp.take(scene.mesh.material_ids, ltri, mode="clip"))
                le = lmat.basecolor * lmat.emittance
            f = bsdf.eval_bsdf(wo, wi_l, n_sh, mats_tex)
            pdf_b = bsdf.pdf_bsdf(wo, wi_l, n_sh, mats_tex)
            pdf_l_sa = pdf_area * dist_sq / jnp.maximum(cos_l, 1e-20)
            w_nee = power_heuristic(pdf_l_sa, pdf_b)
            contrib = throughput * le * f * (
                cos_surf * cos_l / dist_sq * w_nee / pdf_area)
            is_delta = (mats_tex.mtype == 2) | (mats_tex.mtype == 3)
            nee_mask = (alive & front & ~is_delta & (cos_surf > 0.0)
                        & (cos_l > 0.0) & (contrib.length_sq() > 0.0))
            # ---- TraceShadowRay stage --------------------------------------
            # shadow lanes inherit the extension sort's coherence: origins
            # are the (cell-sorted) hit points, so no second sort is needed
            shadow_t = jnp.where(nee_mask, dist, -1.0)  # dead shadow lanes
            if cfg.debug_no_shadow:
                # timing diagnostic (config.py): drop the any-hit dispatch
                # to expose its share of the fused bounce program
                occluded = jnp.zeros((n,), bool)
            else:
                occluded = raycaster.any_hit(shadow_ori, wi_l, shadow_t)
            rays = rays + jnp.sum(nee_mask.astype(jnp.int32))
            direct = direct + vwhere(nee_mask & ~occluded, contrib,
                                     Vec3.zeros((n,)))
        else:
            state, _ = rng.rand_float(state)
            state, _ = rng.rand_float(state)
            state, _ = rng.rand_float(state)

        # optional: direct environment sampling via the live alias table
        if scene.env.enabled and cfg.env_nee:
            from .common import compute_env_nee

            state, env_contrib = compute_env_nee(
                scene, cfg, raycaster, state, point, n_sh, ng, wo,
                mats_tex, throughput, alive)
            direct = direct + env_contrib
            rays = rays + jnp.sum(alive.astype(jnp.int32))

        # ---- BSDF sample + path update -------------------------------------
        state, smp = bsdf.sample_bsdf(wo, n_sh, mats_tex, state)
        if cfg.heavy_shading_iters:
            from .common import heavy_shading_factor

            smp = bsdf.BSDFSample(
                wi=smp.wi, pdf=smp.pdf,
                attenuation=smp.attenuation
                * heavy_shading_factor(hit.u, cfg.heavy_shading_iters),
                is_transmission=smp.is_transmission)
        valid = (smp.pdf > 0.0) & (smp.attenuation.length_sq() > 0.0)
        exiting = smp.wi.dot(ng) > 0.0
        valid = valid & (exiting | smp.is_transmission)
        bias_n = vwhere(exiting, ng, -1.0 * ng)

        throughput = vwhere(alive & valid, throughput * smp.attenuation,
                            throughput)
        ori = vwhere(alive & valid, point + bias_n * EPSILON, ori)
        direction = vwhere(alive & valid, smp.wi, direction)
        last_pdf = jnp.where(alive & valid, smp.pdf, last_pdf)
        alive = alive & valid

        from .common import apply_russian_roulette

        throughput, alive, state = apply_russian_roulette(
            cfg, depth, throughput, alive, state)

        return (ori, direction, throughput, last_pdf, state, alive,
                direct, indirect, pixel_idx, gbuf, rays)


def trace_frame(scene: SceneData, raycaster: Raycaster, cam: Camera,
                cfg: RenderConfig, iteration: jnp.ndarray,
                view_proj: jnp.ndarray, prev_view_proj: jnp.ndarray
                ) -> FrameOutput:
    """One 1-spp wavefront frame over the full fixed path pool (fused:
    the whole frame is one traced program)."""
    n = cam.num_pixels
    ori, direction, state = generate_camera_rays(cam, iteration, cfg.jitter)

    carry = init_carry(cfg, ori, direction, state)
    carry = jax.lax.fori_loop(
        0, cfg.trace_depth,
        lambda depth, c: _bounce_body(scene, raycaster, cam, cfg, view_proj,
                                      prev_view_proj, depth, c),
        carry)
    return finish_carry(cfg, carry)


def init_carry(cfg: RenderConfig, ori: Vec3, direction: Vec3, state,
               pixel_idx=None):
    n = ori.shape[0]
    if pixel_idx is None:
        pixel_idx = jnp.arange(n, dtype=jnp.int32)
    # G-buffers are per-PIXEL, not per-lane: with spp batching the pool
    # holds spp_batch samples of every pixel but first-bounce buffers
    # only come from sample batch 0 (see write_gbuf)
    return (ori, direction, Vec3.ones((n,)), jnp.zeros((n,)), state,
            jnp.ones((n,), bool), Vec3.zeros((n,)), Vec3.zeros((n,)),
            pixel_idx, GBuffers.zeros(n // max(1, cfg.spp_batch)),
            jnp.zeros((), jnp.int32))


def finish_carry(cfg: RenderConfig, carry) -> FrameOutput:
    """Unsort radiance back to pixel order (when the pool was coherence-
    sorted) and NaN-guard — the end-of-frame accumulation step.

    With spp batching the pool holds cfg.spp_batch samples of every pixel
    (pool = S*N lanes); the pixel sort leaves each pixel's S samples
    adjacent (lax.sort is stable), so one reshape-sum yields the per-pixel
    SUM over the batch. G-buffers come from sample batch 0, which sits in
    raster order in the pool prefix at write time (bounce 0 never sorts)."""
    direct, indirect, pixel_idx, gbuf, rays = (
        carry[6], carry[7], carry[8], carry[9], carry[10])
    spp = cfg.spp_batch
    nan_guard = lambda v: v.map(lambda c: jnp.where(jnp.isfinite(c), c, 0.0))
    if cfg.sort_bounce_rays and cfg.backend.is_packet:
        direct, indirect = unsort_by_pixel(pixel_idx, direct, indirect)
        if spp > 1:
            batch_sum = lambda v: v.map(
                lambda c: c.reshape(-1, spp).sum(axis=1))
            direct, indirect = batch_sum(direct), batch_sum(indirect)
    elif spp > 1:
        # unsorted pool: still S concatenated raster copies
        batch_sum = lambda v: v.map(lambda c: c.reshape(spp, -1).sum(axis=0))
        direct, indirect = batch_sum(direct), batch_sum(indirect)
    # gbuf is already per-pixel (init_carry sizes it n // spp_batch)
    return FrameOutput(direct=nan_guard(direct), indirect=nan_guard(indirect),
                       gbuf=gbuf, rays_traced=rays)


def batched_raygen(cam: Camera, cfg: RenderConfig, iteration, camv=None):
    """RayGen for one wavefront dispatch: cfg.spp_batch jittered samples
    of every pixel in ONE pool (sample s uses iteration+s, so per-path
    RNG streams are identical to spp_batch=1 frames traced separately).
    The richer pool tightens the per-bounce coherence sort's packets at
    the same per-path sort cost — the round-3 headline lever (§1)."""
    spp = cfg.spp_batch
    if spp == 1:
        ori, direction, state = generate_camera_rays(cam, iteration,
                                                     cfg.jitter, camv=camv)
        return init_carry(cfg, ori, direction, state)
    parts = [generate_camera_rays(cam, iteration + jnp.uint32(s),
                                  cfg.jitter, camv=camv) for s in range(spp)]
    cat3 = lambda vs: Vec3(*(jnp.concatenate([getattr(v, ax) for v in vs])
                             for ax in ("x", "y", "z")))
    ori = cat3([p[0] for p in parts])
    direction = cat3([p[1] for p in parts])
    state = jnp.concatenate([p[2] for p in parts])
    pix = jnp.tile(jnp.arange(cam.num_pixels, dtype=jnp.int32), spp)
    return init_carry(cfg, ori, direction, state, pixel_idx=pix)


def camera_view_proj(cam: Camera) -> jnp.ndarray:
    w, h = cam.resolution
    return jnp.asarray(perspective_look_at(
        cam.position, cam.look_at, cam.up, cam.fovy_deg, w / h))


def make_frame_fn(scene: SceneData, cam: Camera, cfg: RenderConfig,
                  split_bounces: Optional[bool] = None):
    """Returns (frame fn, view_proj). frame(iteration, prev_vp, acc_d,
    acc_i, camv=...) -> (FrameOutput, acc_d', acc_i').

    `camv` (a core.camera.CamArrays pytree, defaulting to `cam`'s values)
    carries every per-move camera quantity as a RUNTIME argument, so
    re-targeting the camera reuses the compiled programs — the viewer's
    camera moves cost zero recompiles (engine.Renderer.move_camera).

    `split_bounces=True` dispatches one jit call per bounce instead of one
    per frame: on this TPU runtime a deep-bounce frame over a large scene
    can exceed the device program watchdog as a single program (incoherent
    packets traverse long); per-bounce dispatch costs ~4 ms each and keeps
    every program short. Defaults to True for the Pallas backend."""
    from ..config import RayCastBackend

    raycaster = make_raycaster(scene, cfg)
    raycaster_primary = make_raycaster(scene, cfg, primary_rays=True)
    camv0 = camera_arrays(cam)
    vp = camv0.view_proj
    if split_bounces is None:
        split_bounces = cfg.backend.is_packet
    spp = cfg.spp_batch

    if not split_bounces:
        @jax.jit
        def frame_jit(iteration, camv, prev_vp, acc_direct: Vec3,
                      acc_indirect: Vec3):
            carry = batched_raygen(cam, cfg, iteration, camv=camv)
            carry = jax.lax.fori_loop(
                0, cfg.trace_depth,
                lambda depth, c: _bounce_body(scene, raycaster, cam, cfg,
                                              camv.view_proj, prev_vp,
                                              depth, c),
                carry)
            out = finish_carry(cfg, carry)
            return out, acc_direct + out.direct, acc_indirect + out.indirect

        def frame(iteration, prev_vp, acc_direct: Vec3, acc_indirect: Vec3,
                  camv=camv0):
            return frame_jit(iteration, camv, prev_vp, acc_direct,
                             acc_indirect)

        frame._jit_fns = (frame_jit,)
        return frame, vp

    # --- split execution: raygen once, then one jitted bounce per call ----
    n = cam.num_pixels * spp

    start = jax.jit(
        lambda iteration, camv: batched_raygen(cam, cfg, iteration,
                                               camv=camv))

    bounce_fn = _make_bounce_fn(scene, raycaster, cam, cfg,
                                raycaster_primary=raycaster_primary)

    @(partial(jax.jit, donate_argnums=(0,)) if cfg.donate_pool
      else jax.jit)
    def finish(carry, acc_direct, acc_indirect):
        out = finish_carry(cfg, carry)
        return out, acc_direct + out.direct, acc_indirect + out.indirect

    # Adaptive pool shrinking (the reference's per-bounce queue-counter
    # readback, TPU-shaped — pathtrace_wavefront.cu:285-287): each bounce
    # starts with the compacting coherence sort, so all live paths sit in
    # a dense prefix whose size the host learns from a 4-byte fetch. Later
    # bounces dispatch on a static prefix variant (one XLA program per
    # size), and the frame stops early once nothing is alive. Exact: the
    # sliced-off tail is all-dead with final radiance, and per-lane math
    # is independent of pool composition.
    sort_on = cfg.sort_bounce_rays and do_adaptive_pool(cfg)
    if sort_on:
        sizes = []
        s = n
        while s >= MIN_POOL:
            sizes.append(s)
            s //= 4
        sizes = sizes or [n]

        def variant_ceil(count):
            for s in reversed(sizes):
                if count <= s:
                    return s
            return n

        slice_leaf = lambda size: (
            lambda a: a[:size] if getattr(a, "ndim", 0) >= 1 else a)
        tail_leaf = lambda size: (
            lambda a: a[size:] if getattr(a, "ndim", 0) >= 1 else a)

        def frame(iteration, prev_vp, acc_direct: Vec3, acc_indirect: Vec3,
                  camv=camv0):
            import numpy as _np

            carry = start(iteration, camv)
            head = n
            alive_count = n
            # alive lanes are known to sit in prefix(compact_bound) only
            # after a bounce that ran the compacting sort (depth >= 1)
            compact_bound = None
            tails = []
            for depth in range(cfg.trace_depth):
                if alive_count == 0:
                    break
                if compact_bound is not None:
                    new_head = variant_ceil(compact_bound)
                    if new_head < head:
                        tails.append(jax.tree_util.tree_map(
                            tail_leaf(new_head), carry))
                        carry = jax.tree_util.tree_map(slice_leaf(new_head),
                                                       carry)
                        head = new_head
                entry_count = alive_count
                carry, alive_scalar = bounce_fn(jnp.int32(depth),
                                                camv.view_proj, prev_vp,
                                                carry)
                alive_count = int(_np.asarray(alive_scalar))
                if bounce_fn.sorted_at(depth):  # live now in a dense prefix
                    compact_bound = entry_count
            for tail in reversed(tails):
                carry = jax.tree_util.tree_map(
                    lambda a, b: (jnp.concatenate([a, b])
                                  if getattr(a, "ndim", 0) >= 1 else a),
                    carry, tail)
            return finish(carry, acc_direct, acc_indirect)
    else:
        def frame(iteration, prev_vp, acc_direct: Vec3, acc_indirect: Vec3,
                  camv=camv0):
            carry = start(iteration, camv)
            for depth in range(cfg.trace_depth):
                carry, _ = bounce_fn(jnp.int32(depth), camv.view_proj,
                                     prev_vp, carry)
            return finish(carry, acc_direct, acc_indirect)

    frame._jit_fns = (start, finish) + bounce_fn._jit_fns
    return frame, vp


def do_adaptive_pool(cfg: RenderConfig) -> bool:
    from ..config import RayCastBackend

    return cfg.adaptive_pool and cfg.backend.is_packet


def _make_bounce_fn(scene: SceneData, raycaster: Raycaster, cam: Camera,
                    cfg: RenderConfig,
                    raycaster_primary: Optional[Raycaster] = None):
    """One wavefront bounce over the (possibly sliced) path pool (split
    mode): one_bounce(depth, view_proj, prev_view_proj, carry). Returns
    (carry', alive_count) — the scalar count is the 4-byte per-bounce
    readback driving adaptive pool shrinking. Both view-projections are
    runtime arrays so camera moves reuse the compiled programs.

    Depth is known on the host in split mode, so bounce 0 gets its own
    program: the primary-tuned traversal kernel (large packet group —
    raster rays are coherent), no sort, unconditional G-buffer write.

    With cfg.donate_pool each dispatch donates its pool-width inputs
    (the carry, and in sweep mode the seed keys/planes — each a
    last-use in the frame loop), so XLA aliases them into the outputs
    instead of double-buffering the ~630 MB pool across every dispatch
    boundary."""
    ray0 = raycaster_primary or raycaster

    def jit_d(*donate):
        # donate_argnums only when the config opts in: tools that
        # re-dispatch a saved carry (sweep_breakdown timing reps) need
        # the default non-donating programs
        if cfg.donate_pool:
            return partial(jax.jit, donate_argnums=donate)
        return jax.jit

    @jit_d(2)
    def bounce_first(view_proj, prev_view_proj, carry):
        out = _bounce_body(scene, ray0, cam, cfg, view_proj,
                           prev_view_proj, jnp.int32(0), carry,
                           first_static=True)
        return out, jnp.sum(out[5].astype(jnp.int32))

    from ..config import RayCastBackend as _RCB

    sweep_primary_on = (cfg.backend == _RCB.BVH_SWEEP and cfg.sweep_primary)
    if sweep_primary_on:
        # bounce 0 through the dense-sweep path (CEILING §4 move (c)):
        # raster-order rays are the sweep's best case — one dense scan
        # (its own dispatch; no bin sort, G-buffers need pixel order)
        # seeds the sweep cast fused with the bounce-0 logic/shade.
        from ..bvh.pallas_sweep import dense_scan

        @jax.jit
        def scan_first(carry):
            ori, direction, alive = carry[0], carry[1], carry[5]
            pre_tmax = jnp.where(alive, 3.4e38, -1.0)
            s_t, s_o, thr = dense_scan(scene.sweep, ori, direction,
                                       pre_tmax, slots=cfg.sweep_slots)
            return s_o, s_t, thr

        @jit_d(2, 3)
        def bounce_first_sweep(view_proj, prev_view_proj, carry, slots):
            out = _bounce_body(scene, raycaster, cam, cfg, view_proj,
                               prev_view_proj, jnp.int32(0), carry,
                               first_static=True, sweep_slots=slots)
            return out, jnp.sum(out[5].astype(jnp.int32))

    @jit_d(3)
    def bounce_rest(depth, view_proj, prev_view_proj, carry):
        out = _bounce_body(scene, raycaster, cam, cfg, view_proj,
                           prev_view_proj, depth, carry,
                           first_static=False)
        return out, jnp.sum(out[5].astype(jnp.int32))

    # sort-cadence variant (cfg.sort_every > 1): identical bounce, pool
    # sort skipped. Only for the plain packet backend — seeding backends
    # fold their bin key into the sort and need it fresh every bounce.
    from ..config import RayCastBackend

    # BVH_SWEEP split mode runs the seed sort as its OWN dispatch: the
    # fully-fused seeded bounce hangs the TPU backend compiler (>60 min,
    # twice); see _sweep_seed_sort. Two programs per bounce, each a shape
    # that compiles in normal time; identical math (tests).
    sweep_split = (cfg.backend == RayCastBackend.BVH_SWEEP
                   and cfg.sort_bounce_rays)
    if sweep_split:
        @jax.jit
        def scan_rest(carry):
            keys, slots_raw = _sweep_scan_keys(scene, cfg, carry[:9])
            return keys, slots_raw

        @jit_d(0, 1, 2)
        def sort_rest(carry, keys, slots_raw):
            sorted_slice, slots = _sweep_bin_sort(cfg, carry[:9], keys,
                                                  slots_raw)
            return sorted_slice + carry[9:], slots

        @jit_d(0, 1)
        def sort_lean(carry, keys):
            # the wide backend's proven 20-operand pool-sort shape: slot
            # planes do NOT ride the sort — seed_rest regenerates them
            # with a second scan_rest call on the sorted pool
            (ori, direction, throughput, last_pdf, state, alive, direct,
             indirect, pixel_idx) = carry[:9]
            sorted_ops = jax.lax.sort(
                tuple(keys) + (ori.x, ori.y, ori.z,
                               direction.x, direction.y, direction.z,
                               throughput.x, throughput.y, throughput.z,
                               last_pdf, state, alive.astype(jnp.int32),
                               direct.x, direct.y, direct.z,
                               indirect.x, indirect.y, indirect.z,
                               pixel_idx),
                num_keys=len(keys))
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, lp, stt, al,
             drx, dry, drz, inx, iny, inz, pidx) = sorted_ops[len(keys):]
            sorted_slice = (Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                            Vec3(tx, ty, tz), lp, stt, al != 0,
                            Vec3(drx, dry, drz), Vec3(inx, iny, inz), pidx)
            return sorted_slice + carry[9:]

        @jit_d(0, 1, 2)
        def sort_packed(carry, keys, slots_raw):
            sorted_slice, skeys, spacked = _sweep_sort_packed(
                scene, cfg, carry[:9], keys, slots_raw)
            return sorted_slice + carry[9:], skeys, spacked

        def seed_rest(carry):
            # separate dispatches: scan+sort fused in one program hangs
            # the TPU backend compiler at 1080p pool sizes, while each
            # half compiles in normal time (2026-08-18 diagnosis)
            keys, slots_raw = scan_rest(carry)
            if cfg.sweep_seed_mode == "packed":
                # two dispatches: the candidate planes ride the sort in
                # packed form and unpack inside the cast program
                return sort_packed(carry, keys, slots_raw)
            if cfg.sweep_seed_mode == "lean":
                # three dispatches: slot planes regenerated post-sort
                # instead of riding the sort as 9 extra payload operands
                carry2 = sort_lean(carry, keys)
                _, (s_t, s_o, thr) = scan_rest(carry2)
                return carry2, (s_o, s_t, thr)
            assert cfg.sweep_seed_mode == "wide", cfg.sweep_seed_mode
            return sort_rest(carry, keys, slots_raw)

        @jit_d(3, 4)
        def bounce_rest_sweep(depth, view_proj, prev_view_proj, carry,
                              slots):
            out = _bounce_body(scene, raycaster, cam, cfg, view_proj,
                               prev_view_proj, depth, carry,
                               first_static=False, sweep_slots=slots)
            return out, jnp.sum(out[5].astype(jnp.int32))

        @jit_d(3, 4, 5)
        def bounce_rest_sweep_packed(depth, view_proj, prev_view_proj,
                                     carry, keys, packed):
            # unpack is elementwise and fuses into the cast program
            from ..bvh.sweepcast import unpack_seed

            slots = unpack_seed(keys, packed, scene.sweep.num_treelets,
                                cfg.sweep_slots, cfg.sweep_key_slots)
            out = _bounce_body(scene, raycaster, cam, cfg, view_proj,
                               prev_view_proj, depth, carry,
                               first_static=False, sweep_slots=slots)
            return out, jnp.sum(out[5].astype(jnp.int32))

        # cfg.split_shade: the fused seeded bounce as TWO dispatches —
        # extension cast (sweep + wide tail -> HitRecord) and the
        # logic/shade/shadow program (VERDICT r4 item 2's per-stage
        # seam). The cast donates only the seed (the shade program
        # still needs the carry); the shade program donates the carry
        # and the hit record.
        @jit_d(1, 2)
        def cast_rest_packed(carry, keys, packed):
            from ..bvh.sweepcast import unpack_seed

            slots = unpack_seed(keys, packed, scene.sweep.num_treelets,
                                cfg.sweep_slots, cfg.sweep_key_slots)
            ori, direction, alive = carry[0], carry[1], carry[5]
            ext_tmax = jnp.where(alive, 3.4e38, -1.0)
            return raycaster.closest_hit(ori, direction, ext_tmax,
                                         sweep_slots=slots)

        @jit_d(3, 4)
        def shade_rest(depth, view_proj, prev_view_proj, carry, hit):
            out = _bounce_body(scene, raycaster, cam, cfg, view_proj,
                               prev_view_proj, depth, carry,
                               first_static=False, ext_hit=hit)
            return out, jnp.sum(out[5].astype(jnp.int32))

    # cascade split mode (cfg.sweep_cascade): the extension cast leaves
    # the bounce program entirely — phase-1 sweep + compaction, the
    # phase-2 bin sort (its OWN dispatch, per the sort-fusion compile
    # cliff), then phase-2 sweep + tail fused with logic/shade/shadow.
    # Five dispatches per rest bounce; packed seed mode only.
    cascade_on = (sweep_split and cfg.sweep_cascade and cfg.sweep_slots > 2
                  and cfg.sweep_seed_mode == "packed"
                  and cfg.sweep_kernel == "sublane")
    if cascade_on:
        from ..bvh.sweepcast import (_cascade_prefix, cascade_phase1,
                                     cascade_phase2, cascade_sort,
                                     unpack_seed)

        @jit_d(1, 2)
        def cascade_pre(carry, keys, packed):
            ori, direction, alive = carry[0], carry[1], carry[5]
            s_o, s_t, thr = unpack_seed(keys, packed,
                                        scene.sweep.num_treelets,
                                        cfg.sweep_slots, cfg.sweep_key_slots)
            ext_tmax = jnp.where(alive, 3.4e38, -1.0)
            P = _cascade_prefix(ori.x.shape[0], cfg.sweep_cascade_frac)
            hit1, resolved1, bundle, _ = cascade_phase1(
                scene.sweep, ori, direction, ext_tmax, s_o, s_t, thr, P,
                unroll=cfg.sweep_unroll, groups=cfg.sweep_groups)
            return hit1, resolved1, thr, bundle

        @jit_d(0)
        def cascade_sort_d(bundle):
            return cascade_sort(bundle)

        @jit_d(3, 4, 5, 6, 7)
        def bounce_rest_cascade(depth, view_proj, prev_view_proj, carry,
                                hit1, resolved1, thr, sbundle):
            ori, direction, alive = carry[0], carry[1], carry[5]
            ext_tmax = jnp.where(alive, 3.4e38, -1.0)
            ext = cascade_phase2(
                scene.pack, scene.sweep, ori, direction, ext_tmax, thr,
                hit1, resolved1, sbundle, cfg.sweep_slots,
                tail=True, unroll=cfg.sweep_unroll,
                tail_compact=cfg.sweep_tail_compact,
                groups=cfg.sweep_groups)
            out = _bounce_body(scene, raycaster, cam, cfg, view_proj,
                               prev_view_proj, depth, carry,
                               first_static=False, ext_hit=ext)
            return out, jnp.sum(out[5].astype(jnp.int32))

    se = max(1, cfg.sort_every)
    cadence_on = se > 1 and cfg.backend == RayCastBackend.BVH_PALLAS

    @jit_d(3)
    def bounce_rest_nosort(depth, view_proj, prev_view_proj, carry):
        out = _bounce_body(scene, raycaster, cam, cfg, view_proj,
                           prev_view_proj, depth, carry,
                           first_static=False, sort_this=False)
        return out, jnp.sum(out[5].astype(jnp.int32))

    def sorted_at(depth: int) -> bool:
        """Does bounce `depth` run the compacting pool sort? (Drives the
        adaptive pool: the dense-prefix bound only tightens on sorted
        bounces.)"""
        return depth >= 1 and (not cadence_on or (depth - 1) % se == 0)

    def one_bounce(depth, view_proj, prev_view_proj, carry):
        d = int(depth)
        if d == 0:
            if sweep_primary_on:
                slots = scan_first(carry)
                return bounce_first_sweep(view_proj, prev_view_proj,
                                          carry, slots)
            return bounce_first(view_proj, prev_view_proj, carry)
        if sweep_split:
            if cfg.sweep_seed_mode == "packed":
                carry, keys, packed = seed_rest(carry)
                if cascade_on:
                    hit1, res1, thr, bundle = cascade_pre(
                        carry, keys, packed)
                    sbundle = cascade_sort_d(bundle)
                    return bounce_rest_cascade(jnp.int32(depth), view_proj,
                                               prev_view_proj, carry, hit1,
                                               res1, thr, sbundle)
                if cfg.split_shade:
                    hit = cast_rest_packed(carry, keys, packed)
                    return shade_rest(jnp.int32(depth), view_proj,
                                      prev_view_proj, carry, hit)
                return bounce_rest_sweep_packed(jnp.int32(depth), view_proj,
                                                prev_view_proj, carry, keys,
                                                packed)
            carry, slots = seed_rest(carry)
            return bounce_rest_sweep(jnp.int32(depth), view_proj,
                                     prev_view_proj, carry, slots)
        if sorted_at(d):
            return bounce_rest(jnp.int32(depth), view_proj, prev_view_proj,
                               carry)
        return bounce_rest_nosort(jnp.int32(depth), view_proj,
                                  prev_view_proj, carry)

    one_bounce.sorted_at = sorted_at
    one_bounce._jit_fns = (bounce_first, bounce_rest, bounce_rest_nosort)
    if sweep_split:
        one_bounce._jit_fns += (scan_rest, sort_rest, sort_lean,
                                sort_packed, bounce_rest_sweep,
                                bounce_rest_sweep_packed)
        one_bounce._split_fns = (cast_rest_packed, shade_rest)
        one_bounce._jit_fns += (cast_rest_packed, shade_rest)
    if sweep_primary_on:
        one_bounce._primary_fns = (scan_first, bounce_first_sweep)
        one_bounce._jit_fns += (scan_first, bounce_first_sweep)
    if cascade_on:
        one_bounce._jit_fns += (cascade_pre, cascade_sort_d,
                                bounce_rest_cascade)
    return one_bounce


def render(scene: SceneData, cam: Camera, cfg: RenderConfig,
           iterations: Optional[int] = None, start_iter: int = 1):
    """Headless accumulate-and-average (no denoiser): returns [H, W, 3]."""
    iters = iterations if iterations is not None else cfg.iterations
    if iters <= 0:
        w, h = cam.resolution
        import numpy as np

        return np.zeros((h, w, 3), np.float32)
    frame, vp = make_frame_fn(scene, cam, cfg)
    acc_d = Vec3.zeros((cam.num_pixels,))
    acc_i = Vec3.zeros((cam.num_pixels,))
    spp = cfg.spp_batch
    total = 0
    for it in range(start_iter, start_iter + iters, spp):
        out, acc_d, acc_i = frame(jnp.uint32(it), vp, acc_d, acc_i)
        total += spp
    w, h = cam.resolution
    img = ((acc_d + acc_i) * (1.0 / total)).stacked().reshape(h, w, 3)
    return jax.device_get(img)
