#!/usr/bin/env python
"""Go/no-go cost model for the dense cluster-sweep cast (round 3).

Design under evaluation: replace packet *traversal* for incoherent bounce
rays with a dense brute-force sweep — expand each ray into (ray, treelet)
pairs for every treelet AABB its segment [0, t_hit] enters, bin pairs by
treelet, and have each 1024-pair block test the treelet's ENTIRE
contiguous triangle range with zero control flow (the per-visit serial
chain and packet union waste both disappear; all cost is dense VPU work
at ~1 MT test per lane-cycle).

This script measures, on CPU with the XLA oracle (no TPU needed), the two
quantities that decide the design:
  - pairs/ray (treelet AABBs entered before the closest hit) per treelet
    size — drives the binning-sort cost;
  - dense tris tested/ray (sum of entered treelets' triangle counts) —
    drives the VPU cost at ~40 ps/pair-tri (40-op MT over 1024 lanes).

Also verifies every treelet's triangles form one contiguous range of the
packed triangle table (required for blockwise fetches).

Env: SW_N (rays, default 2**17), SW_TRIS (143000),
SW_SIZES ("256 512 1024 2048").
"""

import json
import os
import sys
import time

import numpy as np


def treelet_tables(pack):
    """Per-treelet (aabb[6], tri_start, tri_count) from the top-tree cut.
    Returns (boxes [T,6], start [T], count [T], contiguous: bool)."""
    from tpt.bvh.pack import decode_cluster

    top_child = np.asarray(pack.top_child)
    top_tref = np.asarray(pack.top_tref)
    top_tord = np.asarray(pack.top_tord)
    top_f32 = np.asarray(pack.top_f32)
    child = np.asarray(pack.node_child)
    arity = pack.arity

    def subtree_range(code):
        """(start, count, contiguous) of the packed-tri range under a
        phase-2 code (>=0 wide node id, <0 cluster code)."""
        ranges = []
        stack = [int(code)]
        while stack:
            c = stack.pop()
            if c < 0:
                s, n = decode_cluster(c)
                ranges.append((s, n))
            else:
                for cc in child[c, :arity]:
                    if int(cc) != -1:
                        stack.append(int(cc))
        ranges.sort()
        start = ranges[0][0]
        total = sum(n for _, n in ranges)
        contig = all(ranges[i][0] + ranges[i][1] == ranges[i + 1][0]
                     for i in range(len(ranges) - 1))
        return start, total, contig

    T = pack.num_treelets
    boxes = np.zeros((T, 6), np.float32)
    start = np.zeros(T, np.int64)
    count = np.zeros(T, np.int64)
    contig_all = True
    for r in range(top_child.shape[0]):
        for s in range(arity):
            if top_child[r, s] != -1:
                continue
            code = int(top_tref[r, s])
            if code == 0:  # empty slot (wide node 0 is always top)
                continue
            t = int(top_tord[r, s])
            boxes[t] = top_f32[r, 6 * s:6 * s + 6]
            st, cn, cg = subtree_range(code)
            start[t], count[t] = st, cn
            contig_all &= cg
    return boxes, start, count, contig_all


def entered_mask(boxes, o, d, t_hit):
    """[N, T] bool: ray segment [0, t_hit] enters treelet AABB."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.copysign(1e-12, d), d)
    t0 = (boxes[None, :, 0:3] - o[:, None, :]) * inv[:, None, :]
    t1 = (boxes[None, :, 3:6] - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    return (tf >= np.maximum(tn, 0.0)) & (tn <= t_hit[:, None])


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpt.bvh.pack import build_packet_bvh_wide
    from tpt.bvh.traverse import bvh_closest_hit
    from tpt.bvh.treelet import attach_treelets
    from tpt.core.camera import generate_camera_rays
    from tpt.core import rng as rngmod
    from tpt.core.vec import Vec3
    from tpt.integrators.common import oriented_geom_normal
    from tpt.integrators.intersect import FLT_MAX
    from tpt.materials.bsdf import cosine_weighted_dir
    from tpt.scene import procedural

    n = int(os.environ.get("SW_N", str(2 ** 17)))
    tris = int(os.environ.get("SW_TRIS", "143000"))
    sizes = [int(s) for s in
             os.environ.get("SW_SIZES", "256 512 1024 2048").split()]

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris,
                                     resolution=(1024, max(8, n // 1024)))
    scene = host.build(with_bvh=True)
    mesh, bvh = scene.mesh, scene.bvh
    cam = host.camera
    nn = cam.num_pixels
    print(f"[sweep] scene {mesh.num_triangles} tris ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    # ray populations: primaries + real first-bounce cosine rays (oracle)
    ori_p, dir_p, _ = generate_camera_rays(cam, jnp.uint32(1))
    tmax = jnp.full((nn,), FLT_MAX)
    hit0 = bvh_closest_hit(mesh, bvh, ori_p, dir_p, tmax)
    pt = ori_p + dir_p * jnp.minimum(hit0.t, 1e4)
    ngb = oriented_geom_normal(mesh, hit0.tri, -1.0 * dir_p)
    st = jnp.arange(nn, dtype=jnp.uint32) * jnp.uint32(2654435761)
    st, u1 = rngmod.rand_float(st)
    st, u2 = rngmod.rand_float(st)
    dir_b1 = cosine_weighted_dir(ngb, u1, u2)
    ori_b1 = pt + ngb * 1e-3
    hit1 = bvh_closest_hit(mesh, bvh, ori_b1, dir_b1, tmax)
    print(f"[sweep] oracle hits done ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    pops = {
        "primary": (ori_p, dir_p, hit0.t),
        "bounce1": (ori_b1, dir_b1, hit1.t),
    }

    for mt in sizes:
        t0 = time.time()
        pack = attach_treelets(
            build_packet_bvh_wide(mesh, bvh, max_cluster=16, arity=4),
            max_tris=mt)
        boxes, tstart, tcount, contig = treelet_tables(pack)
        T = pack.num_treelets
        for pop, (o, d, th) in pops.items():
            om = np.stack([np.asarray(o.x), np.asarray(o.y),
                           np.asarray(o.z)], -1).astype(np.float64)
            dm = np.stack([np.asarray(d.x), np.asarray(d.y),
                           np.asarray(d.z)], -1).astype(np.float64)
            tm = np.minimum(np.asarray(th, np.float64), 1e7)
            ent = entered_mask(boxes, om, dm, tm)
            pairs = ent.sum(1)
            dense_tris = (ent * tcount[None, :]).sum(1)
            # cost model (v5e): 40-op MT on [8,128] => ~40 ps/pair-tri;
            # pair sort ~20 ms/M pairs; scan ~50 ms / 2M rays
            n_rays = om.shape[0]
            scale = 2.097e6 / n_rays  # per-2M-ray frame numbers
            cast_ms = dense_tris.sum() * 40e-12 * 1e3 * scale
            sort_ms = pairs.sum() * scale * 20e-6 / 1e3 * 1e3
            print(json.dumps({
                "treelet_max": mt, "treelets": T, "pop": pop,
                "contiguous": bool(contig),
                "pairs_mean": round(float(pairs.mean()), 2),
                "pairs_p50": int(np.percentile(pairs, 50)),
                "pairs_p95": int(np.percentile(pairs, 95)),
                "tris_tested_mean": round(float(dense_tris.mean()), 0),
                "est_cast_ms_per_2M": round(cast_ms, 1),
                "est_pairsort_ms_per_2M": round(sort_ms, 1),
                "tri_count_mean": round(float(tcount.mean()), 0),
            }))
            sys.stdout.flush()
        print(f"[sweep] mt={mt} done ({time.time()-t0:.0f}s)",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
