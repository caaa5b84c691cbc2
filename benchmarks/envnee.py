#!/usr/bin/env python
"""Env-NEE at headline scale (VERDICT round-2 item 8).

Scene: the windowed fireplace interior (procedural.fireplace_like
windowed=True) under a sun+sky HDR environment — a bright ~4-pixel sun
disk aimed through the window plus a dim sky gradient. This is the
configuration the reference's dead sampleEnvironmentMap code
(/root/reference/src/interactions.cu:447-488) was written for: without
direct env sampling, interior surfaces only find the sun by blind BSDF
luck through the window cut.

Measures, at equal spp, for env_nee off vs on:
  - throughput (Mpaths/s, same protocol as bench.py)
  - sample variance proxy: MSE between two independent 1-frame renders
    (start iterations far apart), plus mean image luminance (sanity:
    both estimators must agree in expectation).

Env knobs: EN_TRIS (143000), EN_RES (1920x1080), EN_DEPTH (8),
EN_SPP (4), EN_FRAMES (2).
"""

import json
import os
import sys
import time

import numpy as np


def sun_sky_rgb(h=64, w=128, sun_dir=(-0.85, 0.42, 0.12),
                sun_radiance=2000.0, sun_px=2):
    """Equirect sun+sky using envmap._dir_to_uv's conventions
    (u = atan2(z, x)/2pi wrapped, v = arccos(y)/pi)."""
    d = np.asarray(sun_dir, np.float64)
    d /= np.linalg.norm(d)
    phi = np.arctan2(d[2], d[0])
    if phi < 0:
        phi += 2 * np.pi
    u, v = phi / (2 * np.pi), np.arccos(d[1]) / np.pi
    rgb = np.zeros((h, w, 3), np.float32)
    vy = (np.arange(h, dtype=np.float32) + 0.5) / h  # v=0 is +y (up)
    sky = np.clip(0.55 - 0.5 * vy, 0.03, None)  # horizon-to-zenith gradient
    rgb[:] = sky[:, None, None] * np.array([0.45, 0.65, 1.0], np.float32)
    rgb[int(v * h) - sun_px:int(v * h) + sun_px + 1,
        int(u * w) - sun_px:int(u * w) + sun_px + 1] = (
        sun_radiance * np.array([1.0, 0.93, 0.82], np.float32))
    return rgb


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpt.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from tpt.config import RayCastBackend, RenderConfig
    from tpt.core.vec import Vec3
    from tpt.integrators import wavefront
    from tpt.scene import procedural
    from tpt.scene.envmap import build_envmap

    tris = int(os.environ.get("EN_TRIS", "143000"))
    res = tuple(int(v) for v in
                os.environ.get("EN_RES", "1920x1080").split("x"))
    depth = int(os.environ.get("EN_DEPTH", "8"))
    spp = int(os.environ.get("EN_SPP", "4"))
    frames = int(os.environ.get("EN_FRAMES", "2"))
    on_tpu = jax.default_backend() == "tpu"
    backend = RayCastBackend.BVH_PALLAS if on_tpu else RayCastBackend.BVH_XLA

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris, resolution=res,
                                     windowed=True)
    host.env_map = build_envmap(sun_sky_rgb())
    data = host.build(with_bvh=True)
    jax.block_until_ready(data.pack.tri_f32)
    n = host.camera.num_pixels
    print(f"[envnee] scene ready: {host.mesh.num_triangles} tris "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)

    for env_nee in (False, True):
        cfg = RenderConfig(backend=backend, trace_depth=depth,
                           spp_batch=spp, env_nee=env_nee)
        frame, vp = wavefront.make_frame_fn(data, host.camera, cfg)

        def render_one(start_it):
            acc_d = Vec3.zeros((n,))
            acc_i = Vec3.zeros((n,))
            out, acc_d, acc_i = frame(jnp.uint32(start_it), vp, acc_d, acc_i)
            img = np.stack([np.asarray(acc_d.x + acc_i.x),
                            np.asarray(acc_d.y + acc_i.y),
                            np.asarray(acc_d.z + acc_i.z)], -1)
            return img / spp

        # compile + warmup
        t0 = time.time()
        img_a = render_one(1)
        print(f"[envnee] nee={env_nee} compile+warmup {time.time()-t0:.0f}s",
              file=sys.stderr)

        # throughput
        acc_d = Vec3.zeros((n,))
        acc_i = Vec3.zeros((n,))
        t0 = time.time()
        for b in range(frames):
            out, acc_d, acc_i = frame(jnp.uint32(100 + b * spp), vp,
                                      acc_d, acc_i)
        np.asarray(acc_d.x)
        dt = time.time() - t0
        mpaths = n * frames * spp / dt / 1e6

        # variance proxy: two independent renders, far-apart iterations
        img_b = render_one(1000)
        mse = float(np.mean((img_a - img_b) ** 2))
        lum = float(np.mean(img_a))
        print(json.dumps({
            "metric": f"envnee_{'on' if env_nee else 'off'}",
            "mpaths": round(mpaths, 4),
            "ms_frame": round(dt / frames * 1e3, 1),
            "sample_mse": round(mse, 6),
            "mean_lum": round(lum, 5),
            "spp": spp,
        }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
