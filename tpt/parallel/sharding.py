"""Multi-chip rendering via jax.sharding — pixels sharded over a device
mesh, scene replicated, XLA inserting the collectives.

The reference is strictly single-GPU (SURVEY.md §2: no multi-device code
anywhere); this module is the TPU-native scaling story on top of the same
frame function: path tracing is embarrassingly parallel over pixels, so
the wavefront frame shards over a 'dp' axis with zero communication in
the bounce loop (all scene tables are replicated; every gather is from a
replicated operand). SVGF's spatial stencils shard over image rows, where
GSPMD inserts halo exchanges (collective-permute) automatically — the
only inter-chip traffic in the whole frame.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RayCastBackend, RenderConfig
from ..core.camera import Camera
from ..core.vec import Vec3
from ..denoise.svgf import SVGFState, run_svgf
from ..integrators import wavefront
from ..integrators.common import make_raycaster
from ..scene.structs import SceneData


def make_pixel_mesh(devices: Optional[Sequence] = None,
                    axis: str = "dp") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis,))


def shard_paths(mesh: Mesh, tree, axis: str = "dp"):
    """Place every flat per-path array in `tree` sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_sharded_step(scene: SceneData, cam: Camera, cfg: RenderConfig,
                      mesh: Mesh, axis: str = "dp", with_svgf: bool = True,
                      use_shard_map: bool = True,
                      split_bounces: bool = False):
    """Jitted full step over the mesh: one wavefront 1-spp frame (pixels
    sharded) + SVGF (rows sharded, halo exchange) + accumulation.

    `use_shard_map=True` (default) runs the bounce loop under
    jax.shard_map: each device executes the full per-shard pipeline —
    including the Pallas traversal kernels and the per-shard coherence
    sort — with zero communication until a single psum for the ray
    counter. This is the real multi-chip execution shape (a global GSPMD
    lax.sort over sharded rays would insert all-to-alls every bounce).
    SVGF stays under GSPMD row sharding so its stencil halos become
    collective-permutes on ICI.

    `split_bounces=True` additionally dispatches one jitted shard_map
    program per bounce instead of fusing the whole frame: on real
    hardware a deep-bounce frame over a large scene exceeds the device
    program watchdog as one program (the reason wavefront.make_frame_fn
    defaults to split mode for the packet backends — wavefront.py). The
    per-bounce psum'd alive count is the one 4-byte readback per bounce
    (the reference's queue-counter readback,
    /root/reference/src/pathtrace_wavefront.cu:285-287) and stops the
    frame early when no path survives. Bitwise-identical to the fused
    path (tests/test_parallel.py).

    Returns (step_fn, init_state_fn, view_proj). step_fn(iteration,
    prev_vp, carry) -> (rgb [H, W] Vec3 row-sharded, carry')."""
    raycaster = make_raycaster(scene, cfg)
    vp = wavefront.camera_view_proj(cam)
    w, h = cam.resolution
    n = cam.num_pixels
    ndev = int(np.prod(mesh.devices.shape))
    assert n % ndev == 0 and h % ndev == 0, (
        f"pixels ({w}x{h}) must divide the {ndev}-device mesh")

    path_sh = NamedSharding(mesh, P(axis))
    row_sh = NamedSharding(mesh, P(axis, None))
    repl_sh = NamedSharding(mesh, P())

    def init_state():
        acc_d = shard_paths(mesh, Vec3.zeros((n,)), axis)
        acc_i = shard_paths(mesh, Vec3.zeros((n,)), axis)
        svgf_state = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, row_sh if getattr(a, "ndim", 0) == 2 else repl_sh),
            SVGFState.zeros(h, w))
        return acc_d, acc_i, svgf_state

    scene_repl = replicate(mesh, scene)

    def bounce_loop(prev_vp, ori, direction, state):
        """Per-device: full bounce loop over this device's path shard.
        The per-bounce coherence sort and the end-of-frame unsort are
        shard-local (pixel_idx is shard-local; shards hold contiguous
        pixel ranges, so local pixel order == global pixel order)."""
        carry = wavefront.init_carry(cfg, ori, direction, state)
        carry = jax.lax.fori_loop(
            0, cfg.trace_depth,
            lambda depth, c: wavefront._bounce_body(
                scene_repl, raycaster, cam, cfg, vp, prev_vp, depth, c),
            carry)
        out = wavefront.finish_carry(cfg, carry)
        return (out.direct, out.indirect, out.gbuf,
                jax.lax.psum(out.rays_traced, axis))

    if use_shard_map:
        sharded_bounces = jax.shard_map(
            bounce_loop, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P()),
            check_vma=False)

    def finish_and_denoise(out, acc_d, acc_i, svgf_state):
        acc_d = acc_d + out.direct
        acc_i = acc_i + out.indirect
        if with_svgf:
            plane = lambda a: a.reshape(h, w)
            p3 = lambda v: Vec3(plane(v.x), plane(v.y), plane(v.z))
            rgb, svgf_state = run_svgf(
                cfg.svgf, svgf_state,
                p3(out.direct), p3(out.indirect), p3(out.gbuf.albedo),
                plane(out.gbuf.depth), p3(out.gbuf.normal),
                plane(out.gbuf.mat_id), plane(out.gbuf.motion_u),
                plane(out.gbuf.motion_v))
        else:
            total = acc_d + acc_i
            rgb = Vec3(total.x.reshape(h, w), total.y.reshape(h, w),
                       total.z.reshape(h, w))
        return rgb, (acc_d, acc_i, svgf_state)

    if split_bounces:
        assert use_shard_map, "split mode is a shard_map execution shape"
        raycaster_primary = make_raycaster(scene, cfg, primary_rays=True)

        def carry_specs(carry):
            return jax.tree_util.tree_map(
                lambda a: P(axis) if getattr(a, "ndim", 0) >= 1 else P(),
                carry)

        # build spec template from an abstract carry (shapes only)
        _tmpl = jax.eval_shape(
            lambda: wavefront.init_carry(
                cfg, Vec3.zeros((n,)), Vec3.zeros((n,)),
                jnp.zeros((n,), jnp.uint32)))
        _cspec = carry_specs(_tmpl)

        @partial(jax.jit, out_shardings=jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), _cspec))
        def start(iteration):
            ori, direction, state = wavefront.generate_camera_rays(
                cam, iteration, cfg.jitter)
            return wavefront.init_carry(cfg, ori, direction, state)

        def one_bounce(depth_static, prev_vp, carry):
            ray = raycaster_primary if depth_static == 0 else raycaster

            def local(prev_vp, carry):
                out = wavefront._bounce_body(
                    scene_repl, ray, cam, cfg, vp, prev_vp,
                    jnp.int32(depth_static), carry,
                    first_static=depth_static == 0)
                alive = jax.lax.psum(
                    jnp.sum(out[5].astype(jnp.int32)), axis)
                return out, alive

            return jax.shard_map(
                local, mesh=mesh, in_specs=(P(), _cspec),
                out_specs=(_cspec, P()), check_vma=False)(prev_vp, carry)

        # BVH_SWEEP bounces >= 1: the seed (dense scan, then the packed
        # pool sort) dispatches as its own per-shard programs, exactly
        # like single-chip split mode — a seeded bounce fused into one
        # program is the shape that hangs the TPU backend compiler
        # (BENCHMARKS §4d). Per-shard pools are shard-local, so the sort
        # is a shard-local lax.sort with no collectives.
        sweep_seeded = (cfg.backend == RayCastBackend.BVH_SWEEP
                        and cfg.sort_bounce_rays)
        if sweep_seeded:
            assert cfg.sweep_seed_mode == "packed", (
                "multi-chip split mode implements the packed seed shape "
                "(the production default; lean/wide are single-chip "
                "A/B flavors)")
            from ..bvh.sweepcast import unpack_seed

            _T = scene.sweep.num_treelets

            @jax.jit
            def seed_scan(carry):
                def local(carry):
                    return wavefront._sweep_scan_keys(scene_repl, cfg,
                                                      carry[:9])

                return jax.shard_map(
                    local, mesh=mesh, in_specs=(_cspec,),
                    out_specs=P(axis), check_vma=False)(carry)

            @jax.jit
            def seed_sort(carry, keys, slots_raw):
                def local(carry, keys, slots_raw):
                    sl, skeys, spacked = wavefront._sweep_sort_packed(
                        scene_repl, cfg, carry[:9], keys, slots_raw)
                    return sl + carry[9:], skeys, spacked

                return jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(_cspec, P(axis), P(axis)),
                    out_specs=(_cspec, P(axis), P(axis)),
                    check_vma=False)(carry, keys, slots_raw)

            def one_bounce_seeded(depth_static, prev_vp, carry, keys,
                                  packed):
                def local(prev_vp, carry, keys, packed):
                    slots = unpack_seed(keys, packed, _T, cfg.sweep_slots,
                                        cfg.sweep_key_slots)
                    out = wavefront._bounce_body(
                        scene_repl, raycaster, cam, cfg, vp, prev_vp,
                        jnp.int32(depth_static), carry,
                        first_static=False, sweep_slots=slots)
                    alive = jax.lax.psum(
                        jnp.sum(out[5].astype(jnp.int32)), axis)
                    return out, alive

                return jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), _cspec, P(axis), P(axis)),
                    out_specs=(_cspec, P()), check_vma=False)(
                        prev_vp, carry, keys, packed)

        # cascade sweep in sharded split mode: every phase is shard-local
        # (the compaction, the phase-2 bin sort, and the scatter-back all
        # permute lanes WITHIN a shard), so the single-chip five-dispatch
        # shape maps 1:1 — same dispatch boundaries, no collectives
        # beyond the alive-count psum.
        cascade_on = (sweep_seeded and cfg.sweep_cascade
                      and cfg.sweep_slots > 2
                      and cfg.sweep_kernel == "sublane")
        if cascade_on:
            from ..bvh.sweepcast import (_cascade_prefix, cascade_phase1,
                                         cascade_phase2, cascade_sort)

            @jax.jit
            def casc_pre_sh(carry, keys, packed):
                def local(carry, keys, packed):
                    ori, direction, alive = carry[0], carry[1], carry[5]
                    s_o, s_t, thr = unpack_seed(keys, packed, _T,
                                                cfg.sweep_slots,
                                                cfg.sweep_key_slots)
                    ext_tmax = jnp.where(alive, 3.4e38, -1.0)
                    Pn = _cascade_prefix(ori.x.shape[0],
                                         cfg.sweep_cascade_frac)
                    hit1, res1, bundle, _ = cascade_phase1(
                        scene_repl.sweep, ori, direction, ext_tmax,
                        s_o, s_t, thr, Pn, unroll=cfg.sweep_unroll,
                        groups=cfg.sweep_groups)
                    return hit1, res1, thr, bundle

                return jax.shard_map(
                    local, mesh=mesh, in_specs=(_cspec, P(axis), P(axis)),
                    out_specs=P(axis), check_vma=False)(carry, keys, packed)

            @jax.jit
            def casc_sort_sh(bundle):
                return jax.shard_map(
                    cascade_sort, mesh=mesh, in_specs=P(axis),
                    out_specs=P(axis), check_vma=False)(bundle)

            def one_bounce_casc(depth_static, prev_vp, carry, hit1, res1,
                                thr, sbundle):
                def local(prev_vp, carry, hit1, res1, thr, sbundle):
                    ori, direction, alive = carry[0], carry[1], carry[5]
                    ext_tmax = jnp.where(alive, 3.4e38, -1.0)
                    ext = cascade_phase2(
                        scene_repl.pack, scene_repl.sweep, ori, direction,
                        ext_tmax, thr, hit1, res1, sbundle,
                        cfg.sweep_slots, tail=True,
                        unroll=cfg.sweep_unroll,
                        tail_compact=cfg.sweep_tail_compact,
                        groups=cfg.sweep_groups)
                    out = wavefront._bounce_body(
                        scene_repl, raycaster, cam, cfg, vp, prev_vp,
                        jnp.int32(depth_static), carry,
                        first_static=False, ext_hit=ext)
                    alive_n = jax.lax.psum(
                        jnp.sum(out[5].astype(jnp.int32)), axis)
                    return out, alive_n

                return jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), _cspec, P(axis), P(axis), P(axis),
                              P(axis)),
                    out_specs=(_cspec, P()), check_vma=False)(
                        prev_vp, carry, hit1, res1, thr, sbundle)

        bounce_jits = {}

        def bounce_at(depth, prev_vp, carry):
            if sweep_seeded and depth > 0:
                keys, slots_raw = seed_scan(carry)
                carry, keys, packed = seed_sort(carry, keys, slots_raw)
                if cascade_on:
                    hit1, res1, thr, bundle = casc_pre_sh(carry, keys,
                                                          packed)
                    sbundle = casc_sort_sh(bundle)
                    if ("casc", depth) not in bounce_jits:
                        bounce_jits[("casc", depth)] = jax.jit(
                            partial(one_bounce_casc, depth))
                    return bounce_jits[("casc", depth)](
                        prev_vp, carry, hit1, res1, thr, sbundle)
                if depth not in bounce_jits:
                    bounce_jits[depth] = jax.jit(
                        partial(one_bounce_seeded, depth))
                return bounce_jits[depth](prev_vp, carry, keys, packed)
            if depth not in bounce_jits:
                bounce_jits[depth] = jax.jit(
                    partial(one_bounce, depth))
            return bounce_jits[depth](prev_vp, carry)

        @jax.jit
        def finish(carry, acc_d, acc_i, svgf_state):
            def local(carry):
                out = wavefront.finish_carry(cfg, carry)
                return (out.direct, out.indirect, out.gbuf,
                        jax.lax.psum(out.rays_traced, axis))

            direct, indirect, gbuf, rays = jax.shard_map(
                local, mesh=mesh, in_specs=(_cspec,),
                out_specs=(P(axis), P(axis), P(axis), P()),
                check_vma=False)(carry)
            out = wavefront.FrameOutput(direct=direct, indirect=indirect,
                                        gbuf=gbuf, rays_traced=rays)
            return finish_and_denoise(out, acc_d, acc_i, svgf_state)

        def step(iteration, prev_vp, carry):
            acc_d, acc_i, svgf_state = carry
            bcarry = start(iteration)
            for depth in range(cfg.trace_depth):
                bcarry, alive = bounce_at(depth, prev_vp, bcarry)
                if int(np.asarray(alive)) == 0:
                    break
            return finish(bcarry, acc_d, acc_i, svgf_state)

        return step, init_state, vp

    @partial(jax.jit, static_argnames=())
    def step(iteration, prev_vp, carry):
        acc_d, acc_i, svgf_state = carry
        if use_shard_map:
            ori, direction, state = wavefront.generate_camera_rays(
                cam, iteration, cfg.jitter)
            direct, indirect, gbuf, rays = sharded_bounces(
                prev_vp, ori, direction, state)
            out = wavefront.FrameOutput(direct=direct, indirect=indirect,
                                        gbuf=gbuf, rays_traced=rays)
        else:
            out = wavefront.trace_frame(
                scene_repl, raycaster, cam, cfg, iteration, vp, prev_vp)
        return finish_and_denoise(out, acc_d, acc_i, svgf_state)

    return step, init_state, vp


def render_sharded(scene: SceneData, cam: Camera, cfg: RenderConfig,
                   mesh: Optional[Mesh] = None, iterations: int = 1,
                   with_svgf: bool = False):
    """Convenience: accumulate `iterations` sharded frames, gather image."""
    mesh = mesh or make_pixel_mesh()
    step, init_state, vp = make_sharded_step(
        scene, cam, cfg, mesh, with_svgf=with_svgf)
    carry = init_state()
    rgb = None
    for it in range(1, iterations + 1):
        rgb, carry = step(jnp.uint32(it), vp, carry)
    if not with_svgf:
        rgb = rgb * (1.0 / iterations)
    img = jax.device_get(rgb.stacked())
    return np.asarray(img)
