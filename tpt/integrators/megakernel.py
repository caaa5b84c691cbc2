"""Megakernel integrator: one lane = one pixel = one full path, the whole
per-sample bounce loop inside a single jitted function (TPU analogue of the
reference megakernel /root/reference/src/pathtrace.cu:234-452 — control
crosses host<->device once per sample).

The bounce loop is a lax.fori_loop over a fixed trace depth with masked
dead lanes (XLA traces the body once); shading evaluates all material lobes
lane-parallel and selects (see materials/bsdf.py). NEE shadow rays are
resolved inline per bounce like the reference's IsOccluded.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core import rng
from ..core.camera import Camera, generate_camera_rays
from ..core.mathutil import DELTA_THRESHOLD, EPSILON, power_heuristic
from ..core.vec import Vec3, where as vwhere
from ..materials import bsdf
from ..scene import envmap as envmod
from ..scene.lights import sample_light
from ..scene.structs import SceneData
from .common import Raycaster, fetch_hit_surface, make_raycaster
from .intersect import FLT_MAX


def trace_sample(scene: SceneData, raycaster: Raycaster, cam: Camera,
                 cfg: RenderConfig, iteration: jnp.ndarray,
                 pix=None, camv=None) -> Vec3:
    """One sample per pixel (or per `pix` tile); returns radiance Vec3."""
    ori, direction, state = generate_camera_rays(cam, iteration, cfg.jitter,
                                                 pix=pix, camv=camv)
    n = ori.shape[0]

    radiance = Vec3.zeros((n,))
    throughput = Vec3.ones((n,))
    last_pdf = jnp.zeros((n,))
    alive = jnp.ones((n,), bool)
    has_lights = scene.lights.num_lights > 0 and True  # static

    def bounce(depth, carry):
        ori, direction, throughput, last_pdf, state, alive, radiance = carry

        # dead lanes get t_max=-1 so fully-dead packets exit immediately
        # (0 would still pass slab tests for boxes containing the origin)
        hit = raycaster.closest_hit(ori, direction,
                                    jnp.where(alive, 3.4e38, -1.0))
        hit_mask = alive & hit.hit_mask
        first = depth == 0

        # ---- miss: environment ------------------------------------------------
        if scene.env.enabled:
            env_l = envmod.env_radiance(scene.env, direction)
            # MIS down-weighting of BSDF-sampled env hits is only unbiased
            # when the complementary env-NEE estimator actually runs
            # (radiometry bug found by the analytic battery, round 3)
            if cfg.env_nee:
                pdf_env = envmod.env_pdf(scene.env, direction)
                w_mis = jnp.where(
                    first | (last_pdf > DELTA_THRESHOLD),
                    1.0,
                    power_heuristic(last_pdf, pdf_env),
                )
            else:
                w_mis = 1.0
            miss_mask = alive & ~hit.hit_mask
            radiance = radiance + vwhere(
                miss_mask, throughput * env_l * w_mis, Vec3.zeros((n,)))
        alive = alive & hit.hit_mask

        # ---- surface fetch (fused packed-row gathers) ---------------------------
        wo = -1.0 * direction
        mats, n_sh, _ng_raw, ng, _matid, uu, vv = fetch_hit_surface(
            scene, hit.tri, hit.u, hit.v, wo)
        point = ori + direction * hit.t

        # ---- emissive hit (MIS vs NEE) -----------------------------------------
        emissive = hit_mask & (mats.emittance > 0.0)
        cos_light = jnp.maximum(n_sh.dot(wo), 0.0)
        pdf_light_area = 1.0 / jnp.maximum(scene.lights.total_area, 1e-20)
        pdf_light_sa = pdf_light_area * (hit.t * hit.t) / jnp.maximum(cos_light, 1e-20)
        w_emis = jnp.where(
            first | (last_pdf > 0.9 * 1e10) | (not has_lights),
            1.0,
            jnp.where(cos_light > EPSILON,
                      power_heuristic(last_pdf, pdf_light_sa), 0.0),
        )
        radiance = radiance + vwhere(
            emissive, throughput * mats.basecolor * (mats.emittance * w_emis),
            Vec3.zeros((n,)))
        alive = alive & ~emissive

        # ---- NEE ----------------------------------------------------------------
        if has_lights:
            state, lp, ln, pdf_area, ltri, le = sample_light(
                scene.mesh, scene.lights, state)
            # offset-origin geometry: see wavefront.py — measuring the
            # segment from `point` makes the light occlude its own NEE ray
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
            f = bsdf.eval_bsdf(wo, wi_l, n_sh, mats)
            pdf_b = bsdf.pdf_bsdf(wo, wi_l, n_sh, mats)
            pdf_l_sa = pdf_area * dist_sq / jnp.maximum(cos_l, 1e-20)
            w_nee = power_heuristic(pdf_l_sa, pdf_b)
            contrib = throughput * le * f * (cos_surf * cos_l / dist_sq * w_nee / pdf_area)

            is_delta = (mats.mtype == 2) | (mats.mtype == 3)
            nee_mask = (
                alive & front & ~is_delta
                & (cos_surf > 0.0) & (cos_l > 0.0)
                & (contrib.length_sq() > 0.0)
            )
            occluded = raycaster.any_hit(shadow_ori, wi_l, dist)
            radiance = radiance + vwhere(
                nee_mask & ~occluded, contrib, Vec3.zeros((n,)))
        else:
            state, _ = rng.rand_float(state)
            state, _ = rng.rand_float(state)
            state, _ = rng.rand_float(state)

        if scene.env.enabled and cfg.env_nee:
            from .common import compute_env_nee

            state, env_contrib = compute_env_nee(
                scene, cfg, raycaster, state, point, n_sh, ng, wo,
                mats, throughput, alive)
            radiance = radiance + env_contrib

        # ---- BSDF sample + path update -------------------------------------------
        state, smp = bsdf.sample_bsdf(wo, n_sh, mats, state)
        if cfg.heavy_shading_iters:
            from .common import heavy_shading_factor

            smp = bsdf.BSDFSample(
                wi=smp.wi, pdf=smp.pdf,
                attenuation=smp.attenuation
                * heavy_shading_factor(hit.u, cfg.heavy_shading_iters),
                is_transmission=smp.is_transmission)
        valid = (smp.pdf > 0.0) & (smp.attenuation.length_sq() > 0.0)
        # hemisphere check vs geometric normal (transmission is two-sided)
        exiting = smp.wi.dot(ng) > 0.0
        valid = valid & (exiting | smp.is_transmission)
        bias_n = vwhere(exiting, ng, -1.0 * ng)

        throughput = vwhere(alive & valid, throughput * smp.attenuation, throughput)
        ori = vwhere(alive & valid, point + bias_n * EPSILON, ori)
        direction = vwhere(alive & valid, smp.wi, direction)
        last_pdf = jnp.where(alive & valid, smp.pdf, last_pdf)
        alive = alive & valid

        from .common import apply_russian_roulette

        throughput, alive, state = apply_russian_roulette(
            cfg, depth, throughput, alive, state)

        return ori, direction, throughput, last_pdf, state, alive, radiance

    carry = (ori, direction, throughput, last_pdf, state, alive, radiance)
    carry = jax.lax.fori_loop(0, cfg.trace_depth, bounce, carry)
    radiance = carry[-1]
    # NaN guard, as the reference does before accumulation (pathtrace.cu:442)
    radiance = radiance.map(lambda c: jnp.where(jnp.isfinite(c), c, 0.0))
    return radiance


def make_sample_fn(scene: SceneData, cam: Camera, cfg: RenderConfig):
    """Returns fn(iteration, accum[N], camv=...) -> accum + one sample.
    `camv` carries the per-move camera values as runtime arrays, so
    re-targeting the camera reuses the compiled tile programs.

    The pixel pool is dispatched in tiles of cfg.megakernel_tile paths:
    one fused whole-path program per tile instead of one per frame. A
    single 2M-path deep-bounce program over a large scene exceeds the TPU
    per-program watchdog (BENCHMARKS.md §2, round 1); tiling keeps every
    dispatch a few seconds while preserving the megakernel shape (control
    crosses host<->device once per tile, state lives in registers/VMEM for
    the whole path — the capability of /root/reference/src/pathtrace.cu:
    645-706). Tiles are raster-contiguous, so primary packets stay
    coherent."""
    from ..core.camera import camera_arrays

    raycaster = make_raycaster(scene, cfg)
    camv0 = camera_arrays(cam)
    n = cam.num_pixels
    tile = min(cfg.megakernel_tile, n)
    n_tiles = -(-n // tile)

    if n_tiles == 1:
        @jax.jit
        def step_jit(iteration, camv, accum: Vec3) -> Vec3:
            return accum + trace_sample(scene, raycaster, cam, cfg,
                                        iteration, camv=camv)

        def step(iteration, accum: Vec3, camv=camv0) -> Vec3:
            return step_jit(iteration, camv, accum)

        step._jit_fns = (step_jit,)
        return step

    @jax.jit
    def tile_sample(iteration, camv, pix) -> Vec3:
        # out-of-range tail pixels clip to n-1; their radiance is dropped
        return trace_sample(scene, raycaster, cam, cfg, iteration,
                            pix=jnp.minimum(pix, n - 1), camv=camv)

    def step(iteration, accum: Vec3, camv=camv0) -> Vec3:
        parts = []
        for t in range(n_tiles):
            pix = jnp.arange(t * tile, (t + 1) * tile, dtype=jnp.uint32)
            parts.append(tile_sample(iteration, camv, pix))
        full = Vec3(
            jnp.concatenate([p.x for p in parts])[:n],
            jnp.concatenate([p.y for p in parts])[:n],
            jnp.concatenate([p.z for p in parts])[:n],
        )
        return accum + full

    step._jit_fns = (tile_sample,)
    return step


def render(scene: SceneData, cam: Camera, cfg: RenderConfig,
           iterations: Optional[int] = None, start_iter: int = 1):
    """Host loop over samples; returns mean radiance [H, W, 3] float32."""
    iters = iterations if iterations is not None else cfg.iterations
    if iters <= 0:
        w, h = cam.resolution
        return jnp.zeros((h, w, 3), jnp.float32)
    step = make_sample_fn(scene, cam, cfg)
    accum = Vec3.zeros((cam.num_pixels,))
    for it in range(start_iter, start_iter + iters):
        accum = step(jnp.uint32(it), accum)
    w, h = cam.resolution
    img = (accum * (1.0 / iters)).stacked().reshape(h, w, 3)
    return jax.device_get(img)
