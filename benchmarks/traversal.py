#!/usr/bin/env python
"""Ray-cast kernel sweep (BENCHMARKS.md §4): Mrays/s per ray population
(coherent primaries / sorted bounce rays / fully random) for the packet
kernels — v1 binary vs v2 wide-node — across (arity, cluster K, node pops).

Run on the TPU host. Env: TRAV_N (ray count, default 2**20),
TRAV_TRIS (default 143_000), TRAV_CFGS (e.g. "v1:32 4:16:1 8:16:1 4:8:2").
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpt.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from tpt.core.vec import Vec3
    from tpt.core.camera import generate_camera_rays
    from tpt.bvh.pack import build_packet_bvh, build_packet_bvh_wide
    from tpt.bvh.pallas_traverse import (
        packet_closest_hit, packet_closest_hit_wide)
    from tpt.bvh.sah import build_sah_bvh
    from tpt.integrators import raysort
    from tpt.integrators.intersect import FLT_MAX
    from tpt.scene import procedural

    n = int(os.environ.get("TRAV_N", str(2 ** 20)))
    tris = int(os.environ.get("TRAV_TRIS", "143000"))
    cfgs = os.environ.get("TRAV_CFGS", "v1:32 4:16:1 8:16:1 8:32:1").split()

    t0 = time.time()
    res = (1440, n // 1440)
    host = procedural.fireplace_like(num_triangles=tris, resolution=res)
    scene = host.build(with_bvh=True)
    bvh = scene.bvh
    mesh = scene.mesh
    print(f"[trav] scene {mesh.num_triangles} tris ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    # --- ray populations ---------------------------------------------------
    cam = host.camera
    nn = cam.num_pixels
    ori_p, dir_p, _ = generate_camera_rays(cam, jnp.uint32(1))
    tmax = jnp.full((nn,), FLT_MAX)

    rng = np.random.default_rng(7)
    lo = np.array([np.asarray(mesh.positions.x).min(),
                   np.asarray(mesh.positions.y).min(),
                   np.asarray(mesh.positions.z).min()])
    hi = np.array([np.asarray(mesh.positions.x).max(),
                   np.asarray(mesh.positions.y).max(),
                   np.asarray(mesh.positions.z).max()])
    p = rng.uniform(lo, hi, (nn, 3)).astype(np.float32)
    drnd = rng.normal(size=(nn, 3)).astype(np.float32)
    drnd /= np.linalg.norm(drnd, axis=1, keepdims=True)
    ori_r = Vec3(*[jnp.asarray(p[:, i]) for i in range(3)])
    dir_r = Vec3(*[jnp.asarray(drnd[:, i]) for i in range(3)])

    world_lo, world_inv = raysort.world_bounds(mesh)

    def sort_rays(o, d, mode):
        key = raysort.coherence_key(o, d, world_lo, world_inv, mode=mode)
        perm, _ = raysort.sort_permutation(key)
        return o.take(perm), d.take(perm)

    # real first-bounce rays: trace primaries, cosine-sample around normals
    from tpt.bvh.pallas_traverse import packet_closest_hit_wide as _pch
    from tpt.bvh.pack import build_packet_bvh_wide as _bw
    from tpt.core import rng as rngmod
    from tpt.integrators.common import oriented_geom_normal
    from tpt.materials.bsdf import cosine_weighted_dir

    pack0 = _bw(mesh, bvh, max_cluster=16, arity=8)
    hit0 = _pch(pack0, ori_p, dir_p, tmax)
    pt = ori_p + dir_p * jnp.minimum(hit0.t, 1e4)
    ngb = oriented_geom_normal(mesh, hit0.tri, -1.0 * dir_p)
    st = jnp.arange(nn, dtype=jnp.uint32) * jnp.uint32(2654435761)
    st, u1 = rngmod.rand_float(st)
    st, u2 = rngmod.rand_float(st)
    dir_b1 = cosine_weighted_dir(ngb, u1, u2)
    ori_b1 = pt + ngb * 1e-3

    # realistic bounce-1 shadow rays: hit points toward a ceiling light
    lp = jnp.asarray(0.5 * (lo + hi) + np.float32([0, 0.45 * (hi - lo)[1], 0]))
    to_l = Vec3(lp[0] - pt.x, lp[1] - pt.y, lp[2] - pt.z)
    ldist = to_l.length()
    dir_sh = to_l * (1.0 / jnp.maximum(ldist, 1e-9))

    srt = jax.jit(sort_rays, static_argnames="mode")
    pops = {
        "primary": (ori_p, dir_p),
        "bounce1_cell": srt(ori_b1, dir_b1, "cell_major"),
        "bounce1_dir": srt(ori_b1, dir_b1, "dir_major"),
        "bounce1_oct3": srt(ori_b1, dir_b1, "oct3"),
        "bounce1_oct4": srt(ori_b1, dir_b1, "oct4"),
        "bounce1_oct5": srt(ori_b1, dir_b1, "oct5"),
        "sorted_random": srt(ori_r, dir_r, "dir_major"),
        "random": (ori_r, dir_r),
    }
    # shadow populations use any-hit semantics with t_max = light distance
    o_sh, d_sh = ori_b1 + ngb * 1e-3, dir_sh
    key_sh = raysort.coherence_key(o_sh, d_sh, world_lo, world_inv,
                                   mode="dir_major")
    perm_sh, _ = raysort.sort_permutation(key_sh)
    anyhit_pops = {
        "shadow1": (o_sh.take(perm_sh), d_sh.take(perm_sh),
                    ldist.take(perm_sh)),
        "shadow1_unsorted": (o_sh, d_sh, ldist),
    }

    sel = os.environ.get("TRAV_POPS")
    if sel:
        pops = {k: v for k, v in pops.items() if k in sel.split()}
        anyhit_pops = {k: v for k, v in anyhit_pops.items()
                       if k in sel.split()}
    if os.environ.get("TRAV_KIND", "closest") != "any":
        anyhit_pops = {}
    else:
        pops = {}

    def bench(fn, o, d, reps=3):
        hit = fn(o, d, tmax)
        np.asarray(hit.t)  # compile + force
        t0 = time.time()
        for _ in range(reps):
            hit = fn(o, d, tmax)
        np.asarray(hit.t)
        return nn * reps / (time.time() - t0) / 1e6

    def bench_seeded(pack, o, d, knobs, reps=3, hard_count=0):
        """Seeded treelet pipeline, staged: phase-1 scan -> ordinal sort ->
        seeded cast. Reports per-stage ms + end-to-end Mrays/s.
        hard_count > 0 = hybrid: rays with >= that many phase-1 candidates
        form a dense tail group traced by the wide kernel."""
        from tpt.bvh.pallas_treelet import treelet_scan, treelet_closest_hit

        grp, np_, cp, sl = knobs

        @jax.jit
        def scan(o, d):
            return treelet_scan(pack, o, d, tmax, node_pops=np_, group=grp)

        @jax.jit
        def sort_stage(o, d, st, sc, so, ovf, cnt):
            hard = ((cnt >= hard_count) if hard_count
                    else jnp.zeros_like(cnt, bool))
            key = jnp.where(hard, jnp.int32(1 << 29),
                            jnp.where(sc != 0x7FFFFFFF, so,
                                      jnp.int32(1 << 30)))
            dkey = raysort.coherence_key(o, d, world_lo, world_inv,
                                         mode="dir_major")
            (_, _, ox, oy, oz, dx, dy, dz, st2, sc2, ovf2,
             hrd) = jax.lax.sort(
                (key, dkey, o.x, o.y, o.z, d.x, d.y, d.z, st, sc, ovf,
                 hard.astype(jnp.int32)), num_keys=2)
            return (Vec3(ox, oy, oz), Vec3(dx, dy, dz), st2, sc2, ovf2,
                    hrd != 0)

        def cast(o, d, st, sc, ovf, hard):
            if not hard_count:
                return treelet_closest_hit(
                    pack, o, d, tmax, node_pops=np_, group=grp,
                    cluster_pops=cp, slots=sl, seed=(st, sc, ovf))
            hit_e = treelet_closest_hit(
                pack, o, d, jnp.where(hard, -1.0, tmax), node_pops=np_,
                group=grp, cluster_pops=cp, slots=sl, seed=(st, sc, ovf))
            hit_h = packet_closest_hit_wide(
                pack, o, d, jnp.where(hard, tmax, -1.0), node_pops=np_,
                group=grp, cluster_pops=cp)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(hard, a, b), hit_h, hit_e)

        stages = {}
        seeds = scan(o, d)
        np.asarray(seeds[0])
        t0 = time.time()
        for _ in range(reps):
            seeds = scan(o, d)
        np.asarray(seeds[0])
        stages["scan"] = (time.time() - t0) / reps * 1e3

        st, sc, so, ovf, cnt = seeds
        if hard_count:
            stages["hard_frac"] = round(
                float(np.asarray(cnt >= hard_count).mean()), 3)
        sorted_ = sort_stage(o, d, st, sc, so, ovf, cnt)
        np.asarray(sorted_[0].x)
        t0 = time.time()
        for _ in range(reps):
            sorted_ = sort_stage(o, d, st, sc, so, ovf, cnt)
        np.asarray(sorted_[0].x)
        stages["sort"] = (time.time() - t0) / reps * 1e3

        o2, d2, st2, sc2, ovf2, hrd2 = sorted_
        cast_j = jax.jit(cast)
        hit = cast_j(o2, d2, st2, sc2, ovf2, hrd2)
        np.asarray(hit.t)
        t0 = time.time()
        for _ in range(reps):
            hit = cast_j(o2, d2, st2, sc2, ovf2, hrd2)
        np.asarray(hit.t)
        stages["cast"] = (time.time() - t0) / reps * 1e3
        total = stages["scan"] + stages["sort"] + stages["cast"]
        return nn / total / 1e3, stages

    for cfg in cfgs:
        parts = cfg.split(":")
        if parts[0] == "v1":
            pack = build_packet_bvh(mesh, bvh, max_cluster=int(parts[1]))
            fn = lambda o, d, t: packet_closest_hit(pack, o, d, t)
            from tpt.bvh.pallas_traverse import packet_any_hit

            fn_any = lambda o, d, t: packet_any_hit(pack, o, d, t)
        elif parts[0] in ("ts", "th"):
            # seeded treelet pipeline: ts:MAX_TRIS[:SLOTS[:GROUP[:NP[:CP]]]]
            # hybrid easy/hard:       th:MAX_TRIS:HARD_COUNT[:SLOTS[...]]
            from tpt.bvh.treelet import attach_treelets

            hybrid = parts[0] == "th"
            mt = int(parts[1])
            off = 1 if hybrid else 0
            hc = int(parts[2]) if hybrid else 0
            sl = int(parts[2 + off]) if len(parts) > 2 + off else 4
            grp = int(parts[3 + off]) if len(parts) > 3 + off else 2
            np_ = int(parts[4 + off]) if len(parts) > 4 + off else 4
            cp = int(parts[5 + off]) if len(parts) > 5 + off else 4
            pack = attach_treelets(
                build_packet_bvh_wide(mesh, bvh, max_cluster=16, arity=4),
                max_tris=mt)
            print(f"[trav] treelet cut: {pack.num_top} top nodes, "
                  f"{pack.num_treelets} treelets", file=sys.stderr)
            for pop_name, (o, d) in pops.items():
                t0 = time.time()
                mrays, stages = bench_seeded(pack, o, d, (grp, np_, cp, sl),
                                             hard_count=hc)
                print(json.dumps({
                    "metric": f"seeded_pipeline {cfg} {pop_name}",
                    "value": round(mrays, 3), "unit": "Mrays/s",
                    "stages_ms": {k: round(v, 1) for k, v in stages.items()},
                    "wall": round(time.time() - t0, 1)}))
                sys.stdout.flush()
            continue
        elif parts[0] == "t":
            # treelet kernel: t:MAX_TRIS[:SLOTS[:GROUP[:NODE_POPS[:CPOPS]]]]
            from tpt.bvh.pallas_treelet import treelet_closest_hit
            from tpt.bvh.treelet import attach_treelets

            mt = int(parts[1])
            sl = int(parts[2]) if len(parts) > 2 else 4
            grp = int(parts[3]) if len(parts) > 3 else 2
            np_ = int(parts[4]) if len(parts) > 4 else 4
            cp = int(parts[5]) if len(parts) > 5 else 4
            pack = attach_treelets(
                build_packet_bvh_wide(mesh, bvh, max_cluster=16, arity=4),
                max_tris=mt)
            print(f"[trav] treelet cut: {pack.num_top} top nodes, "
                  f"{pack.num_treelets} treelets", file=sys.stderr)
            fn = lambda o, d, t: treelet_closest_hit(
                pack, o, d, t, node_pops=np_, group=grp, cluster_pops=cp,
                slots=sl)
            from tpt.bvh.pallas_traverse import packet_any_hit_wide

            fn_any = lambda o, d, t: packet_any_hit_wide(
                pack, o, d, t, node_pops=np_, group=grp, cluster_pops=cp)
        else:
            arity, k, np_ = int(parts[0]), int(parts[1]), int(parts[2])
            grp = int(parts[3]) if len(parts) > 3 else 1
            cp = int(parts[4]) if len(parts) > 4 else 1
            cull = len(parts) > 5 and parts[5] == "cull"
            pack = build_packet_bvh_wide(mesh, bvh, max_cluster=k,
                                         arity=arity)
            fn = lambda o, d, t: packet_closest_hit_wide(
                pack, o, d, t, node_pops=np_, group=grp, cluster_pops=cp,
                t_cull=cull)
            from tpt.bvh.pallas_traverse import packet_any_hit_wide

            fn_any = lambda o, d, t: packet_any_hit_wide(
                pack, o, d, t, node_pops=np_, group=grp, cluster_pops=cp)
        for pop_name, (o, d) in pops.items():
            t0 = time.time()
            mrays = bench(fn, o, d)
            print(json.dumps({
                "metric": f"closest_hit {cfg} {pop_name}",
                "value": round(mrays, 3), "unit": "Mrays/s",
                "wall": round(time.time() - t0, 1)}))
            sys.stdout.flush()
        for pop_name, (o, d, tsh) in anyhit_pops.items():
            occ = fn_any(o, d, tsh)
            np.asarray(occ)
            t0 = time.time()
            for _ in range(3):
                occ = fn_any(o, d, tsh)
            np.asarray(occ)
            mrays = nn * 3 / (time.time() - t0) / 1e6
            print(json.dumps({
                "metric": f"any_hit {cfg} {pop_name}",
                "value": round(mrays, 3), "unit": "Mrays/s",
                "wall": round(time.time() - t0, 1)}))
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
