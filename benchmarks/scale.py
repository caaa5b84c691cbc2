#!/usr/bin/env python
"""Scene-scale sweep (VERDICT item 5): Sponza-class 262k triangles and a
>VMEM 2M-triangle scene through the HBM-streaming traversal path.

The reference's scale datapoint is OptiX on Sponza 262,279 tris
(/root/reference/README.md:113). tpt's VMEM ceiling for the resident
triangle table is ~48 MB (~780k tris); beyond that host.build switches to
stream_tris and the kernel DMAs each cluster from HBM.

Run on the TPU host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/scale.py
Env: SCALE_TRIS (default "262279 2000000"), SCALE_N (rays, default 2^20).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpt.core.camera import generate_camera_rays
    from tpt.bvh.pallas_traverse import packet_closest_hit_wide
    from tpt.integrators import raysort
    from tpt.integrators.intersect import FLT_MAX
    from tpt.scene import procedural

    tri_counts = [int(v) for v in
                  os.environ.get("SCALE_TRIS", "262279 2000000").split()]
    n = int(os.environ.get("SCALE_N", str(2 ** 20)))

    for tris in tri_counts:
        t0 = time.time()
        res = (1440, n // 1440)
        host = procedural.fireplace_like(num_triangles=tris, resolution=res)
        scene = host.build(with_bvh=True)
        pack = scene.pack
        build_s = time.time() - t0
        mb = pack.tri_f32.nbytes / 1e6
        print(f"[scale] {scene.mesh.num_triangles} tris, tri table "
              f"{mb:.0f} MB, stream={pack.stream_tris}, build {build_s:.0f}s",
              file=sys.stderr)

        cam = host.camera
        nn = cam.num_pixels
        ori_p, dir_p, _ = generate_camera_rays(cam, jnp.uint32(1))
        tmax = jnp.full((nn,), FLT_MAX)

        # sorted bounce-like rays: random surface points, dir-major sorted
        rng = np.random.default_rng(11)
        px = np.asarray(scene.mesh.positions.x)
        sel = rng.integers(0, px.shape[0], nn)
        from tpt.core.vec import Vec3

        o_b = Vec3(*[jnp.asarray(np.asarray(c)[sel])
                     for c in (scene.mesh.positions.x,
                               scene.mesh.positions.y,
                               scene.mesh.positions.z)])
        dd = rng.normal(size=(3, nn)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=0)
        d_b = Vec3(*[jnp.asarray(c) for c in dd])
        world_lo, world_inv = raysort.world_bounds(scene.mesh)
        key = raysort.coherence_key(o_b, d_b, world_lo, world_inv)
        perm, _ = raysort.sort_permutation(key)
        o_b, d_b = o_b.take(perm), d_b.take(perm)

        def bench(o, d, reps=3):
            hit = packet_closest_hit_wide(pack, o, d, tmax)
            np.asarray(hit.t)
            t0 = time.time()
            for _ in range(reps):
                hit = packet_closest_hit_wide(pack, o, d, tmax)
            np.asarray(hit.t)
            return nn * reps / (time.time() - t0) / 1e6

        for name, (o, d) in (("primary", (ori_p, dir_p)),
                             ("sorted_surface", (o_b, d_b))):
            mrays = bench(o, d)
            print(json.dumps({
                "metric": f"scale {tris}tris stream={int(pack.stream_tris)}"
                          f" {name}",
                "value": round(mrays, 3), "unit": "Mrays/s",
                "tri_table_mb": round(mb, 1)}))
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
