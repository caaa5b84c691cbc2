"""CLI driver — flag parity with the reference app
(/root/reference/src/main.cpp:106-237): `python -m tpt.cli SCENE.json
[-mega|-wave] [-vis]` plus quality-of-life flags. Headless mode runs the
scene's ITERATIONS (reference hardcodes 120), gamma-corrects at 2.2, mirrors
x like the reference saveImage (main.cpp:239-269), and writes a
timestamped PNG.

`-vis` renders progressively and writes a preview PNG every N frames
(matplotlib/GL interactive windows don't exist on a headless TPU host;
the preview path and display-channel switching live in engine.py/viewer.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpt", description="TPU path tracer (tpt)")
    p.add_argument("scene", help="scene JSON file (reference schema)")
    p.add_argument("-mega", action="store_true", help="megakernel engine")
    p.add_argument("-wave", action="store_true", help="wavefront engine (default)")
    p.add_argument("-vis", action="store_true",
                   help="progressive preview: write preview PNG every --preview-every frames")
    p.add_argument("-tui", action="store_true",
                   help="live terminal viewer (ANSI truecolor, FPS keys; "
                        "see tpt/term_viewer.py)")
    p.add_argument("--iterations", type=int, default=None,
                   help="override scene ITERATIONS")
    p.add_argument("--depth", type=int, default=None, help="override trace depth")
    p.add_argument("--backend",
                   choices=["brute", "bvh", "pallas", "treelet", "sweep",
                            "auto"],
                   default="auto", help="ray-cast backend")
    p.add_argument("--denoise", action="store_true", help="SVGF real-time mode")
    p.add_argument("--env-nee", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="direct environment sampling via the alias table "
                        "(default on: measured 46x variance cut for 1.68x "
                        "frame cost on env-lit scenes, BENCHMARKS §8; "
                        "compiled out when the scene has no env map)")
    p.add_argument("--warmup", action="store_true",
                   help="pre-populate the persistent XLA compile cache "
                        "for this scene/config and exit (runs one frame; "
                        "production runs then start without paying cold "
                        "compile — BENCHMARKS §6b measures minutes for "
                        "cold sweep-backend shapes)")
    p.add_argument("--out-dir", default=".", help="output directory")
    p.add_argument("--preview-every", type=int, default=10)
    p.add_argument("--display", choices=["result", "normal", "depth", "albedo", "motion"],
                   default="result")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from .utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from .config import DisplayMode, RayCastBackend, RenderConfig, RenderMode
    from .engine import Renderer
    from .io.image import save_png, timestamped_name
    from .scene.loader import load_scene

    print(f"[tpt] loading scene {args.scene}")
    t0 = time.time()
    host = load_scene(args.scene)
    mode = RenderMode.MEGAKERNEL if args.mega else RenderMode.WAVEFRONT

    if args.backend == "auto":
        backend = (RayCastBackend.BRUTE_FORCE if host.mesh.num_triangles < 4096
                   else RayCastBackend.BVH_PALLAS)
    else:
        backend = {"brute": RayCastBackend.BRUTE_FORCE,
                   "bvh": RayCastBackend.BVH_XLA,
                   "pallas": RayCastBackend.BVH_PALLAS,
                   "treelet": RayCastBackend.BVH_TREELET,
                   "sweep": RayCastBackend.BVH_SWEEP}[args.backend]

    cfg = RenderConfig(
        mode=mode,
        backend=backend,
        trace_depth=args.depth if args.depth else host.trace_depth,
        iterations=args.iterations if args.iterations else host.iterations,
        denoiser_on=args.denoise,
        env_nee=args.env_nee,
        display={"result": DisplayMode.RESULT, "normal": DisplayMode.NORMAL,
                 "depth": DisplayMode.DEPTH, "albedo": DisplayMode.ALBEDO,
                 "motion": DisplayMode.MOTION_VECTOR}[args.display],
    )
    with_bvh = backend != RayCastBackend.BRUTE_FORCE
    data = host.build(with_bvh=with_bvh)
    print(f"[tpt] scene ready: {host.mesh.num_triangles} tris, "
          f"{len(host.materials)} materials, engine={mode.name}, "
          f"backend={backend.name} ({time.time() - t0:.1f}s)")
    if with_bvh:
        from .bvh.validate import validate_lbvh

        rep = validate_lbvh(data.bvh)
        status = "Pass" if rep.ok else f"FAIL: {rep.errors[:3]}"
        print(f"[tpt] LBVH: {rep.num_leaves} leaves, depth {rep.max_depth} [{status}]")

    renderer = Renderer(data, host.camera, cfg)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.warmup:
        # one real frame compiles every program the production loop
        # dispatches (raygen, per-bounce seed scan/sort + bounce shapes,
        # the adaptive-pool ladder steps the first frame's alive counts
        # touch, SVGF when --denoise) and lands them in the persistent
        # cache (utils/cache.py). A second frame confirms the steady rate.
        t0 = time.time()
        renderer.frame()
        print(f"[tpt] warmup: compile+first-frame {time.time() - t0:.1f}s")
        t0 = time.time()
        renderer.frame()
        print(f"[tpt] warmup: steady frame {time.time() - t0:.1f}s — "
              f"cache populated; production runs start warm")
        return 0

    if args.tui:
        from .term_viewer import run_term_viewer

        run_term_viewer(renderer, max_frames=cfg.iterations,
                        out_dir=args.out_dir)
        name = timestamped_name(host.image_name, cfg.iterations)
        out_path = os.path.join(args.out_dir, name)
        save_png(out_path, renderer.frame()[:, ::-1], gamma=cfg.gamma)
        print(f"[tpt] saved {out_path}")
        return 0

    img = None
    t0 = time.time()
    for it in range(1, cfg.iterations + 1):
        img = renderer.frame()
        if it == 1 or it % 10 == 0 or it == cfg.iterations:
            elapsed = time.time() - t0
            print(f"[tpt] iter {it}/{cfg.iterations}  "
                  f"{renderer.gui.frame_ms:.1f} ms/frame  "
                  f"{renderer.gui.mrays_per_sec:.2f} MRays/s  "
                  f"({elapsed:.1f}s total)")
        if args.vis and it % args.preview_every == 0:
            save_png(os.path.join(args.out_dir, f"{host.image_name}.preview.png"),
                     img[:, ::-1], gamma=cfg.gamma)

    # final save: mirror x like the reference saveImage
    name = timestamped_name(host.image_name, cfg.iterations)
    out_path = os.path.join(args.out_dir, name)
    save_png(out_path, img[:, ::-1], gamma=cfg.gamma)
    print(f"[tpt] saved {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
