#!/usr/bin/env python
"""Megakernel vs wavefront + heavy-shading stress (BENCHMARKS.md §2/§3;
the reference's README §3.1 and Phase II study).

Run on the TPU host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/engines.py
Env: ENG_SCENES ("cornell fireplace", default "cornell"),
ENG_HEAVY ("0 256", default "0"), ENG_FRAMES (default 2).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpt.config import RayCastBackend, RenderConfig, RenderMode
    from tpt.engine import Renderer
    from tpt.scene import procedural
    from tpt.scene.structs import MaterialType

    scenes = os.environ.get("ENG_SCENES", "cornell").split()
    heavies = [int(v) for v in os.environ.get("ENG_HEAVY", "0").split()]
    frames = int(os.environ.get("ENG_FRAMES", "2"))

    def bench(name, host, cfg):
        r = Renderer(host.build(with_bvh=True), host.camera, cfg)
        r.frame()  # compile + warmup
        t0 = time.time()
        for _ in range(frames):
            img = r.frame()
        np.asarray(img)
        dt = (time.time() - t0) / frames
        mpaths = host.camera.num_pixels / dt / 1e6
        print(json.dumps({
            "metric": name, "value": round(dt, 3), "unit": "s/frame",
            "mpaths_per_s": round(mpaths, 4)}))
        sys.stdout.flush()

    for sname in scenes:
        if sname == "cornell":
            host = procedural.cornell_box(
                resolution=(800, 800),
                sphere_materials=(MaterialType.SPECULAR_REFLECTION,
                                  MaterialType.SPECULAR_REFRACTION))
        else:
            host = procedural.fireplace_like(num_triangles=143_000,
                                             resolution=(1920, 1080))
        for heavy in heavies:
            base = RenderConfig(backend=RayCastBackend.BVH_PALLAS,
                                trace_depth=8, heavy_shading_iters=heavy)
            bench(f"wavefront {sname} heavy={heavy}",
                  host, base.with_(mode=RenderMode.WAVEFRONT))
            bench(f"megakernel {sname} heavy={heavy}",
                  host, base.with_(mode=RenderMode.MEGAKERNEL))
    return 0


if __name__ == "__main__":
    sys.exit(main())
