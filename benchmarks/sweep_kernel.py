#!/usr/bin/env python
"""Raw throughput of the dense cluster-sweep cast (bvh/pallas_sweep.py)
on real ray populations, vs the wide packet kernel control.

Each ray is assigned its nearest-entered treelet ordinal (host-side slab
test over treelet AABBs) and the pool is sorted by (ordinal, dir-key).
The kernel then sweeps each block's ordinal union densely. This measures
the per-pair-triangle dense cost and block-union overhead in isolation —
the full pipeline adds scan + re-rounds (integrators wiring).

Env: SWK_N (2**20), SWK_TRIS (143000), SWK_SIZES ("256 512 1024").
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
    from tpt.bvh.pallas_sweep import NONE_ORD, sweep_closest_hit
    from tpt.bvh.pallas_traverse import packet_closest_hit_wide
    from tpt.bvh.treelet import attach_treelets, sweep_tables
    from tpt.core.camera import generate_camera_rays
    from tpt.core import rng as rngmod
    from tpt.core.vec import Vec3
    from tpt.integrators import raysort
    from tpt.integrators.common import oriented_geom_normal
    from tpt.integrators.intersect import FLT_MAX
    from tpt.materials.bsdf import cosine_weighted_dir
    from tpt.scene import procedural

    n = int(os.environ.get("SWK_N", str(2 ** 20)))
    tris = int(os.environ.get("SWK_TRIS", "143000"))
    sizes = [int(s) for s in os.environ.get("SWK_SIZES",
                                            "256 512 1024").split()]

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris,
                                     resolution=(1440, n // 1440))
    scene = host.build(with_bvh=True)
    mesh, bvh = scene.mesh, scene.bvh
    cam = host.camera
    nn = cam.num_pixels
    print(f"[swk] scene {mesh.num_triangles} tris ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    # populations: primaries + real first-bounce cosine rays
    ori_p, dir_p, _ = generate_camera_rays(cam, jnp.uint32(1))
    tmax = jnp.full((nn,), FLT_MAX)
    pack_w = build_packet_bvh_wide(mesh, bvh, max_cluster=16, arity=4)
    hit0 = packet_closest_hit_wide(pack_w, ori_p, dir_p, tmax,
                                   node_pops=4, group=2, cluster_pops=4)
    pt = ori_p + dir_p * jnp.minimum(hit0.t, 1e4)
    ngb = oriented_geom_normal(mesh, hit0.tri, -1.0 * dir_p)
    st = jnp.arange(nn, dtype=jnp.uint32) * jnp.uint32(2654435761)
    st, u1 = rngmod.rand_float(st)
    st, u2 = rngmod.rand_float(st)
    dir_b1 = cosine_weighted_dir(ngb, u1, u2)
    ori_b1 = pt + ngb * 1e-3

    world_lo, world_inv = raysort.world_bounds(mesh)

    def nearest_ordinal(boxes, o, d):
        """Host: nearest-entered treelet per ray (entry-t argmin)."""
        om = np.stack([np.asarray(o.x), np.asarray(o.y),
                       np.asarray(o.z)], -1).astype(np.float64)
        dm = np.stack([np.asarray(d.x), np.asarray(d.y),
                       np.asarray(d.z)], -1).astype(np.float64)
        inv = 1.0 / np.where(np.abs(dm) < 1e-12,
                             np.copysign(1e-12, dm), dm)
        t0_ = (boxes[None, :, 0:3] - om[:, None, :]) * inv[:, None, :]
        t1_ = (boxes[None, :, 3:6] - om[:, None, :]) * inv[:, None, :]
        tn = np.minimum(t0_, t1_).max(2)
        tf = np.maximum(t0_, t1_).min(2)
        enter = (tf >= np.maximum(tn, 0.0))
        tn = np.where(enter, np.maximum(tn, 0.0), np.inf)
        best = tn.argmin(1).astype(np.int32)
        none = ~enter.any(1)
        return np.where(none, NONE_ORD, best), enter.sum(1)

    for mt in sizes:
        pack = attach_treelets(
            build_packet_bvh_wide(mesh, bvh, max_cluster=16, arity=4),
            max_tris=mt)
        sweep = sweep_tables(pack)
        boxes = np.asarray(sweep.boxes)[:, :6]
        for pop, (o, d) in (("primary", (ori_p, dir_p)),
                            ("bounce1", (ori_b1, dir_b1))):
            ordn, cnt = nearest_ordinal(boxes, o, d)
            dkey = raysort.coherence_key(o, d, world_lo, world_inv,
                                         mode="dir_major")
            (_, _, ox, oy, oz, dx, dy, dz, og) = jax.lax.sort(
                (jnp.asarray(ordn), dkey, o.x, o.y, o.z, d.x, d.y, d.z,
                 jnp.asarray(ordn)), num_keys=2)
            os_, ds_ = Vec3(ox, oy, oz), Vec3(dx, dy, dz)

            fn = jax.jit(lambda o_, d_, t_, g_: sweep_closest_hit(
                sweep, o_, d_, t_, g_))
            hit = fn(os_, ds_, tmax, og)
            np.asarray(hit.t)
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                hit = fn(os_, ds_, tmax, og)
            np.asarray(hit.t)
            dt = time.time() - t0
            hitfrac = float(np.asarray(hit.tri >= 0).mean())
            print(json.dumps({
                "metric": f"sweep mt:{mt} {pop}",
                "value": round(nn * reps / dt / 1e6, 3),
                "unit": "Mrays/s",
                "treelets": sweep.num_treelets,
                "mean_entered": round(float(cnt.mean()), 2),
                "hit_frac": round(hitfrac, 3),
            }))
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
