#!/usr/bin/env python
"""Interactive-navigation preview rate (viewer.py C15 story): frames/s of
the low-res preview engine while the camera moves every frame, plus the
full-res re-accumulation frame that runs when the camera rests.

The reference's viewer re-renders full frames interactively on GPU
(/root/reference/src/preview.cpp:175-198); tpt's viewer navigates on a
1/scale-resolution engine with zero-recompile camera retargets
(CamArrays runtime args) and re-accumulates at full res on rest. This
measures whether navigation is actually interactive on a v5e.

Prints one JSON line per preview scale:
  {"metric": "preview_fps s<scale>", "value": fps, ...}

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/preview_fps.py

Env: PF_RES (1920x1080), PF_TRIS (143000), PF_DEPTH (3 — the viewer's
navigation depth), PF_SCALES ("4 6 8"), PF_FRAMES (20), PF_ENGINE
("wave" | "mega" — engine for the PREVIEW renderer; mega runs the whole
preview frame as one fused dispatch, the queue-10 finding that the
preview floor is dispatch count, BENCHMARKS §7b), PF_PIPELINE=1
(Renderer.pipeline on the preview engine — frame N dispatches while
N-1 displays, the viewers' default latency hider; metric gains "pip").
"""

import json
import os
import sys
import time

import numpy as np


def main():
    from tpt.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from tpt.config import RayCastBackend, RenderConfig, RenderMode
    from tpt.engine import Renderer
    from tpt.scene import procedural
    from tpt.viewer import make_preview_renderer, view_from_yaw_pitch, \
        yaw_pitch_from_view

    res = tuple(int(x)
                for x in os.environ.get("PF_RES", "1920x1080").split("x"))
    tris = int(os.environ.get("PF_TRIS", "143000"))
    depth = int(os.environ.get("PF_DEPTH", "3"))
    scales = [int(s) for s in os.environ.get("PF_SCALES", "4 6 8").split()]
    frames = int(os.environ.get("PF_FRAMES", "20"))

    import jax

    on_tpu = jax.default_backend() == "tpu"
    backend = (RayCastBackend.BVH_PALLAS if on_tpu
               else RayCastBackend.BVH_XLA)

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris, resolution=res)
    scene = host.build(with_bvh=True)
    print(f"[pf] scene ready ({time.time() - t0:.0f}s)", file=sys.stderr)

    engine = os.environ.get("PF_ENGINE", "wave")
    pmode = RenderMode.MEGAKERNEL if engine == "mega" else None
    pipeline = os.environ.get("PF_PIPELINE") == "1"

    cfg = RenderConfig(backend=backend, trace_depth=depth)
    full = Renderer(scene, host.camera, cfg)

    for scale in scales:
        prev = make_preview_renderer(full, scale=scale, mode=pmode)
        prev.pipeline = pipeline
        if os.environ.get("PF_U8") == "0":
            # A/B the device-tonemap u8 fetch (display_u8, default ON via
            # make_preview_renderer) against the old f32 plane fetch
            prev.display_u8 = False
        yaw, pitch = yaw_pitch_from_view(
            np.asarray(host.camera.view, np.float64))

        t0 = time.time()
        img = prev.frame()
        print(f"[pf] s{scale} first preview frame (compile) "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

        # navigate: mouse-look retarget EVERY frame — the viewer's exact
        # hot path per viewer.py:_retarget: BOTH engines re-target (the
        # full-res engine's move includes its reset() allocation), then
        # one preview frame renders
        ts = []
        for i in range(frames):
            t1 = time.time()
            v = view_from_yaw_pitch(yaw + (i + 1) * 0.5, pitch)
            moved = full.cam.moved(
                look_at=tuple(np.asarray(full.cam.position)
                              + np.asarray(v)))
            full.move_camera(moved)
            prev.move_camera(prev.cam.moved(position=moved.position,
                                            look_at=moved.look_at))
            img = prev.frame()
            assert np.isfinite(img).all(), f"non-finite frame {i}"
            ts.append(time.time() - t1)
        ms = float(np.median(ts)) * 1e3
        pw, ph = prev.cam.resolution
        print(json.dumps({
            "metric": (f"preview_nav_frame s{scale} {pw}x{ph} d{depth}"
                       + (f" {engine}" if engine != "wave" else "")
                       + (" pip" if pipeline else "")
                       + ("" if prev.display_u8 else " f32")),
            "value": round(ms, 1), "unit": "ms",
            "fps": round(1e3 / ms, 1),
        }))
        sys.stdout.flush()

        if os.environ.get("PF_PROBE") == "1" and pmode is not None:
            # decompose the nav frame (VERDICT r4 item 7: compute vs
            # relay): compute+sync via a 1-element fetch, then the
            # display fetch at f32 and u8 widths. Fresh device arrays
            # each rep — jax caches a fetched array's host copy.
            import jax.numpy as jnp

            step, camv = prev._mega_step, prev._camv
            acc = step(jnp.uint32(999), prev.acc_mega, camv=camv)
            np.asarray(acc.x.ravel()[0])
            t1 = time.time()
            reps = 5
            for k in range(reps):
                acc = step(jnp.uint32(1000 + k), acc, camv=camv)
                np.asarray(acc.x.ravel()[0])
            compute_ms = (time.time() - t1) / reps * 1e3
            img32 = (acc * (1.0 / 8)).stacked()
            np.asarray(img32 * 1.0)
            t1 = time.time()
            for _ in range(reps):
                np.asarray(img32 * 1.0)  # tiny mul keeps the fetch fresh
            f32_ms = (time.time() - t1) / reps * 1e3
            np.asarray(prev._u8_fn(img32))
            t1 = time.time()
            for _ in range(reps):
                np.asarray(prev._u8_fn(img32))
            u8_ms = (time.time() - t1) / reps * 1e3
            print(json.dumps({
                "metric": f"preview_probe s{scale} {pw}x{ph} d{depth}",
                "compute_sync_ms": round(compute_ms, 1),
                "fetch_f32_ms": round(f32_ms, 1),
                "fetch_u8_ms": round(u8_ms, 1)}))
            sys.stdout.flush()

    # the rest state: one full-res accumulation frame
    t0 = time.time()
    full.frame()
    print(f"[pf] full-res frame (compile) {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    full.frame()
    print(json.dumps({
        "metric": f"fullres_accum_frame {res[0]}x{res[1]} d{depth}",
        "value": round((time.time() - t0) * 1e3, 1), "unit": "ms",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
