#!/usr/bin/env python
"""Stage-resolved throughput of the sweep-cast pipeline
(bvh/sweepcast.py) on real ray populations, vs the wide packet kernel.

Stages timed separately (each its own jit, matching sweep_cast's
internals): scan (treelet_scan_multi), bin sort (multi-operand
lax.sort), demand sweep (sweep_closest_hit), tail (packet cast with
t-cull on unresolved lanes), plus the fused sweep_cast end-to-end and
the packet-kernel control. Also reports the unresolved fraction — the
tail's workload share.

Env: SWK_N (2**20), SWK_TRIS (143000), SWK_SIZES ("256 512"),
SWK_REPS (10).
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

    from tpt.bvh.pack import build_packet_bvh_wide
    from tpt.bvh.pallas_sweep import sweep8_closest_hit, sweep_closest_hit
    from tpt.bvh.pallas_sweep import dense_scan
    from tpt.bvh.pallas_traverse import packet_closest_hit_wide
    from tpt.bvh.pallas_treelet import _INF
    from tpt.bvh.sweepcast import bin_key, sweep_cast
    from tpt.bvh.treelet import attach_treelets, sweep_tables
    from tpt.core.camera import generate_camera_rays
    from tpt.core import rng as rngmod
    from tpt.core.vec import Vec3
    from tpt.integrators.common import oriented_geom_normal
    from tpt.integrators.intersect import FLT_MAX
    from tpt.materials.bsdf import cosine_weighted_dir
    from tpt.scene import procedural

    n = int(os.environ.get("SWK_N", str(2 ** 20)))
    tris = int(os.environ.get("SWK_TRIS", "143000"))
    sizes = [int(s) for s in os.environ.get("SWK_SIZES", "256 512").split()]
    reps = int(os.environ.get("SWK_REPS", "10"))
    unrolls = [int(u) for u in os.environ.get("SWK_UNROLL", "4").split()]

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris,
                                     resolution=(1440, n // 1440))
    scene = host.build(with_bvh=True)
    mesh, bvh = scene.mesh, scene.bvh
    cam = host.camera
    nn = cam.num_pixels
    print(f"[swk] scene {mesh.num_triangles} tris ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    # populations: primaries + real first/second-bounce cosine rays
    ori_p, dir_p, _ = generate_camera_rays(cam, jnp.uint32(1))
    tmax = jnp.full((nn,), FLT_MAX)
    pack_w = build_packet_bvh_wide(mesh, bvh, max_cluster=16, arity=4)

    def bounce_from(o, d, seed):
        hit = packet_closest_hit_wide(pack_w, o, d, tmax,
                                      node_pops=4, group=2, cluster_pops=4)
        ht = jnp.minimum(hit.t, 1e4)
        p = o + d * ht
        ngb = oriented_geom_normal(mesh, hit.tri, -1.0 * d)
        st = (jnp.arange(nn, dtype=jnp.uint32) + jnp.uint32(seed)) \
            * jnp.uint32(2654435761)
        st, u1 = rngmod.rand_float(st)
        st, u2 = rngmod.rand_float(st)
        nd = cosine_weighted_dir(ngb, u1, u2)
        tm = jnp.where(hit.tri >= 0, FLT_MAX, -1.0)
        return p + ngb * 1e-3, nd, tm

    ori_b1, dir_b1, tm_b1 = bounce_from(ori_p, dir_p, 11)
    ori_b2, dir_b2, tm_b2 = bounce_from(ori_b1, dir_b1, 23)

    @jax.jit
    def probe(outs):
        """Tiny scalar that depends on every leaf — forces completion
        with a 4-byte fetch (np.asarray of big arrays rides the slow
        relay and pollutes stage timings by 100s of ms)."""
        tot = 0.0
        for leaf in jax.tree_util.tree_leaves(outs):
            sub = leaf if getattr(leaf, "ndim", 0) == 0 else leaf[::4096]
            tot = tot + jnp.sum(sub.astype(jnp.float32))
        return tot

    def timed(f, *args):
        outs = f(*args)
        float(probe(outs))  # warm/compile
        ts = []
        for _ in range(reps):
            t1 = time.time()
            outs = f(*args)
            float(probe(outs))
            ts.append(time.time() - t1)
        return outs, min(ts) * 1e3

    results = []
    for mt in sizes:
        pack = attach_treelets(
            build_packet_bvh_wide(mesh, bvh, max_cluster=16, arity=4),
            max_tris=mt)
        sweep = sweep_tables(pack)
        T = sweep.num_treelets
        print(f"[swk] mt={mt}: {T} treelets, max_chunks={sweep.max_chunks}",
              file=sys.stderr)

        scan_j = jax.jit(lambda o, d, t: dense_scan(sweep, o, d, t))

        @jax.jit
        def sort_j(key, o, d, t, so, st_, thr):
            idx = jnp.arange(key.shape[0], dtype=jnp.int32)
            return jax.lax.sort(
                (key, o.x, o.y, o.z, d.x, d.y, d.z, t,
                 so[0], so[1], so[2], so[3],
                 st_[0], st_[1], st_[2], st_[3], thr, idx), num_keys=1)

        sweep_j = jax.jit(lambda o, d, t, so, st_: sweep_closest_hit(
            sweep, o, d, t, so, st_))
        sweep8_j = jax.jit(lambda o, d, t, so, st_: sweep8_closest_hit(
            sweep, o, d, t, so, st_))
        tail_j = jax.jit(lambda o, d, t: packet_closest_hit_wide(
            pack, o, d, t, t_cull=True))
        full_j = jax.jit(lambda o, d, t: sweep_cast(pack, sweep, o, d, t,
                                                    kernel="sublane"))
        ctrl_j = jax.jit(lambda o, d, t: packet_closest_hit_wide(
            pack_w, o, d, t))

        for name, (o, d, tm) in (("primary", (ori_p, dir_p, tmax)),
                                 ("bounce1", (ori_b1, dir_b1, tm_b1)),
                                 ("bounce2", (ori_b2, dir_b2, tm_b2))):
            (s_t, s_o, thr), t_scan = timed(scan_j, o, d, tm)
            key = bin_key(s_o, d, T, 4)
            ops, t_sort = timed(sort_j, key, o, d, tm,
                                [s_o[i] for i in range(4)],
                                [s_t[i] for i in range(4)], thr)
            ox, oy, oz, dx, dy, dz, tms = ops[1:8]
            so_s = tuple(ops[8:12])
            st_s = tuple(ops[12:16])
            thr_s = ops[16]
            os_, ds_ = Vec3(ox, oy, oz), Vec3(dx, dy, dz)
            hit, t_sweep = timed(sweep_j, os_, ds_, tms, so_s, st_s)
            union_stats = {}
            if os.environ.get("SWK_UNION") == "1":
                # distinct requested ordinals per 128-lane block: the
                # sweep8 while-loop's trip count upper bound (demand drops
                # only shrink it). Separates visit-bound from
                # chunk-loop-bound regimes.
                so_h = np.stack([np.asarray(s) for s in so_s])
                live_h = np.asarray(tms) > 0
                so_h = np.where(live_h[None, :], so_h, 0x7FFFFF)
                nb = so_h.shape[1] // 128
                so_b = so_h[:, :nb * 128].reshape(4, nb, 128)
                cnts = [np.sum(np.unique(so_b[:, b, :]) != 0x7FFFFF)
                        for b in range(nb)]
                union_stats = dict(union_mean=round(float(np.mean(cnts)), 1),
                                   union_p95=round(
                                       float(np.percentile(cnts, 95)), 1))
            t8 = {}
            t8g = {}
            for u in unrolls:
                sw_u = sweep if u == 4 else sweep_tables(pack, chunk_align=u)
                variants = [(t8, False)]
                if os.environ.get("SWK_GROUPS", "1") == "1":
                    variants.append((t8g, True))
                for out, grp in variants:
                    f = jax.jit(lambda o, d, t, so, st_, _sw=sw_u, _u=u,
                                _g=grp:
                                sweep8_closest_hit(_sw, o, d, t, so, st_,
                                                   unroll_chunks=_u,
                                                   use_groups=_g))
                    try:
                        _, out[u] = timed(f, os_, ds_, tms, so_s, st_s)
                    except Exception as e:  # VMEM OOM / group constraint
                        print(f"[swk] unroll={u} groups={grp} failed: "
                              f"{str(e).splitlines()[0][:160]}",
                              file=sys.stderr)
                        out[u] = -1.0
            t_sweep8 = t8[unrolls[0]]
            # cascade phases (SWK_CASCADE=0 to skip): phase-1 2-slot
            # sweep + compaction, the phase-2 bin sort, and the phase-2
            # sweep + merge + tail — each its own dispatch, as the
            # production split mode runs them
            casc = {}
            if os.environ.get("SWK_CASCADE", "1") == "1":
                from tpt.bvh.sweepcast import (_cascade_prefix,
                                               cascade_phase1,
                                               cascade_phase2, cascade_sort)
                cP = _cascade_prefix(nn, float(
                    os.environ.get("SWK_CASCADE_FRAC", "0.5")))
                p1_j = jax.jit(lambda o, d, t, so, st_, thr:
                               cascade_phase1(sweep, o, d, t, so, st_, thr,
                                              cP))
                (h1, r1, bundle, nu), t_p1 = timed(p1_j, os_, ds_, tms,
                                                   so_s, st_s, thr_s)
                sort2_j = jax.jit(cascade_sort)
                sb, t_s2 = timed(sort2_j, bundle)
                p2_j = jax.jit(lambda o, d, t, thr, h, r, sb:
                               cascade_phase2(pack, sweep, o, d, t, thr,
                                              h, r, sb, 4))
                hc, t_p2 = timed(p2_j, os_, ds_, tms, thr_s, h1, r1, sb)
                # sanity: cascade must agree with the one-shot sweep+tail
                unres1 = float(jnp.mean(((~r1) & (tms > 0))
                                        .astype(jnp.float32)))
                casc = dict(casc_p1_ms=round(t_p1, 2),
                            casc_sort_ms=round(t_s2, 2),
                            casc_p2_ms=round(t_p2, 2),
                            casc_total_ms=round(t_p1 + t_s2 + t_p2, 2),
                            casc_unres1=round(unres1, 4))
            best = jnp.where(hit.tri >= 0, hit.t, FLT_MAX)
            resolved = (thr_s >= _INF) | (best <= thr_s)
            unres = float(jnp.mean(1.0 - resolved.astype(jnp.float32)
                                   * jnp.where(tms > 0, 1.0, 0.0)))
            live = float(jnp.mean((tms > 0).astype(jnp.float32)))
            unres_live = float(jnp.mean(((~resolved) & (tms > 0))
                                        .astype(jnp.float32)))
            tail_tm = jnp.where(resolved, 0.0, jnp.minimum(best, tms))
            _, t_tail = timed(tail_j, os_, ds_, tail_tm)
            # production tail: compacted-prefix cast, both compaction
            # flavors (SWK_TAILC=0 to skip)
            t_tailc = {}
            if os.environ.get("SWK_TAILC", "1") == "1":
                from tpt.bvh.sweepcast import _tail_compact_cast
                for meth in ("scatter", "sort"):
                    f = jax.jit(lambda o, d, r, t, _m=meth:
                                _tail_compact_cast(pack, o, d, hit, r, t,
                                                   0, compact=_m))
                    _, t_tailc[meth] = timed(f, os_, ds_, resolved, tail_tm)
            _, t_full = timed(full_j, o, d, tm)
            _, t_ctrl = timed(ctrl_j, o, d, tm)
            row = dict(mt=mt, pop=name, live=round(live, 3),
                       unresolved=round(unres_live, 4),
                       scan_ms=round(t_scan, 2), sort_ms=round(t_sort, 2),
                       sweep_ms=round(t_sweep, 2),
                       **{f"sweep8_u{u}_ms": round(v, 2)
                          for u, v in t8.items()},
                       **{f"sweep8g_u{u}_ms": round(v, 2)
                          for u, v in t8g.items()},
                       tail_ms=round(t_tail, 2),
                       **casc,
                       **{f"tailc_{m}_ms": round(v, 2)
                          for m, v in t_tailc.items()},
                       full_ms=round(t_full, 2), ctrl_ms=round(t_ctrl, 2),
                       full_mrays=round(nn * live / t_full / 1e3, 2),
                       ctrl_mrays=round(nn * live / t_ctrl / 1e3, 2),
                       **union_stats)
            print(json.dumps(row))
            sys.stdout.flush()
    return results


if __name__ == "__main__":
    main()
