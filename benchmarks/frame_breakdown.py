#!/usr/bin/env python
"""Per-stage frame breakdown on the bench scene (BENCHMARKS.md §4 data):
times every per-bounce dispatch of the split wavefront frame, plus
isolated sort / extension-cast / shadow-cast stages against the live
per-bounce carries, and the alive-lane decay.

Env: BD_TRIS (default 143000), BD_RES (default 1920x1080), BD_DEPTH (8).
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

    from tpt.config import RayCastBackend, RenderConfig
    from tpt.integrators import wavefront
    from tpt.integrators.common import make_raycaster
    from tpt.scene import procedural

    tris = int(os.environ.get("BD_TRIS", "143000"))
    res = tuple(int(v) for v in
                os.environ.get("BD_RES", "1920x1080").split("x"))
    depth = int(os.environ.get("BD_DEPTH", "8"))
    spp = int(os.environ.get("BD_SPP", "1"))
    backend = {"pallas": RayCastBackend.BVH_PALLAS,
               "treelet": RayCastBackend.BVH_TREELET}[
                   os.environ.get("BD_BACKEND", "pallas")]

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris, resolution=res)
    scene = host.build(with_bvh=True)
    cfg = RenderConfig(backend=backend, trace_depth=depth, spp_batch=spp)
    raycaster = make_raycaster(scene, cfg)
    cam = host.camera
    vp = wavefront.camera_view_proj(cam)
    print(f"[bd] scene ready ({time.time()-t0:.0f}s)", file=sys.stderr)

    start = jax.jit(lambda it: wavefront.batched_raygen(cam, cfg, it))
    bounce = wavefront._make_bounce_fn(scene, raycaster, cam, cfg)

    sort_only = jax.jit(lambda c: wavefront._sort_pool(
        scene, cfg, (c[0], c[1], c[2], c[3], c[4], c[5], c[6], c[7], c[8]),
        jnp.bool_(False)))
    ext_only = jax.jit(lambda ori, d, alive: raycaster.closest_hit(
        ori, d, jnp.where(alive, 3.4e38, 0.0)))

    def force(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0])

    # warmup/compile every dispatch shape
    carry = start(jnp.uint32(1))
    force(carry)
    c1, _ = bounce(jnp.int32(0), vp, vp, carry)
    force(c1)
    force(sort_only(c1))
    force(ext_only(c1[0], c1[1], c1[5]))

    carry = start(jnp.uint32(2))
    force(carry)
    rows = []
    prev_rays = 0
    for d in range(depth):
        # isolated stages against this bounce's carry
        t0 = time.time()
        force(sort_only(carry))
        t_sort = time.time() - t0
        sorted_slice = sort_only(carry)
        t0 = time.time()
        force(ext_only(sorted_slice[0], sorted_slice[1], sorted_slice[5]))
        t_ext = time.time() - t0

        alive_frac = float(jnp.mean(carry[5].astype(jnp.float32)))
        t0 = time.time()
        carry, _ = bounce(jnp.int32(d), vp, vp, carry)
        force(carry)
        t_bounce = time.time() - t0
        rays = int(carry[10])
        rows.append(dict(depth=d, alive=round(alive_frac, 3),
                         bounce_ms=round(t_bounce * 1e3, 1),
                         sort_ms=round(t_sort * 1e3, 1),
                         ext_ms=round(t_ext * 1e3, 1),
                         rays=rays - prev_rays))
        prev_rays = rays
        print(json.dumps(rows[-1]))
        sys.stdout.flush()

    total = sum(r["bounce_ms"] for r in rows)
    print(json.dumps({"total_bounce_ms": round(total, 1),
                      "note": "bounce includes sort+ext+logic+shade+shadow"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
