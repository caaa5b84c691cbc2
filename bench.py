#!/usr/bin/env python
"""Headline benchmark: wavefront throughput in Mpaths/s at 1080p on a
143k-triangle interior (stand-in for the reference's Fireplace Room, which
is not shipped in-repo — same triangle count, surface-concentrated
geometry, the same material-class mix, one area light; see
tpt/scene/procedural.py:fireplace_like).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 31.72 Mpaths/s — the reference wavefront on an RTX 3060 Laptop
(/root/reference/README.md:46; BASELINE.md).

Env knobs: BENCH_FRAMES (default 3), BENCH_FAST=1 (tiny scene, smoke only),
BENCH_BACKEND / BENCH_SPP / BENCH_SORT_EVERY / BENCH_SWEEP_UNROLL /
BENCH_TREELET_MT / BENCH_SWEEP_SHADOW / BENCH_SWEEP_KEY_SLOTS /
BENCH_SWEEP_GROUPS / BENCH_SWEEP_SEED (packed|lean|wide seed-sort shape,
default packed) / BENCH_SWEEP_CASCADE=1 + BENCH_SWEEP_CASCADE_FRAC
(two-phase cascade sweep — phase-2 re-bin of the unresolved minority,
cfg.sweep_cascade) / BENCH_DONATE (donate the pool carry into every split
dispatch — the HBM-peak lever that lets spp_batch=6 fit; defaults ON for
the TPU headline, BENCH_DONATE=0 to disable) — measurement overrides
for the config knobs of the same name. BENCH_RR=1 measures the beyond-parity "TPU-native mode" estimator
(Russian roulette from bounce 3 — RenderConfig.tpu_native; the metric
name gains an `_rr` suffix so the row never masquerades as the parity
headline).
"""

import json
import os
import sys
import time

BASELINE_MPATHS = 31.72


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpt.utils.cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    print(f"[bench] compilation cache: {cache_dir}", file=sys.stderr)

    from tpt.config import RayCastBackend, RenderConfig
    from tpt.core.vec import Vec3
    from tpt.integrators import wavefront
    from tpt.scene import procedural

    fast = os.environ.get("BENCH_FAST") == "1"
    frames = int(os.environ.get("BENCH_FRAMES", "3"))
    on_tpu = jax.default_backend() == "tpu"

    if fast:
        res, tris, depth = (256, 144), 20_000, 4
    else:
        res, tris, depth = (1920, 1080), 143_000, 8

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris, resolution=res)
    # BVH_SWEEP + lean seed sort is the measured-best TPU config
    # (0.3948 Mpaths/s vs 0.356-0.370 for BVH_PALLAS, BENCHMARKS §1;
    # u8+group-culling measured identical at full frame — keep u4)
    backend = RayCastBackend.BVH_SWEEP if on_tpu else RayCastBackend.BVH_XLA
    bname = os.environ.get("BENCH_BACKEND")
    if bname:
        backend = RayCastBackend[bname.upper()]
    sweep_unroll = int(os.environ.get("BENCH_SWEEP_UNROLL", "4"))
    treelet_mt = int(os.environ.get("BENCH_TREELET_MT", "256"))
    data = host.build(with_bvh=True, treelet_max_tris=treelet_mt,
                      sweep_chunk_align=max(4, sweep_unroll))
    jax.block_until_ready(data.pack.tri_f32)
    print(f"[bench] scene ready: {host.mesh.num_triangles} tris, "
          f"backend={backend.name} ({time.time() - t0:.1f}s)", file=sys.stderr)

    # spp_batch=6 + donate_pool is the measured-best headline config
    # (BENCHMARKS §1/§4f: 6 samples/pixel per wavefront pool -> richer
    # coherence sort, 0.4937 w/ one-gather shade row vs 0.4123 at spp=4
    # pre-row; spp=6 only fits HBM at
    # 1080p with the pool carry donated across split dispatches — queue
    # 11's undonated spp=6 hit RESOURCE_EXHAUSTED). Off-TPU keep spp=4:
    # donation is a no-op there and the CPU mesh is memory-tight.
    spp_default = "1" if fast else ("6" if on_tpu else "4")
    spp = int(os.environ.get("BENCH_SPP", spp_default))
    sort_every = int(os.environ.get("BENCH_SORT_EVERY", "1"))
    sweep_shadow = os.environ.get("BENCH_SWEEP_SHADOW") == "1"
    key_slots = int(os.environ.get("BENCH_SWEEP_KEY_SLOTS", "2"))
    sweep_groups = os.environ.get("BENCH_SWEEP_GROUPS") == "1"
    seed_mode = os.environ.get("BENCH_SWEEP_SEED", "packed")
    rr = os.environ.get("BENCH_RR") == "1"
    donate_default = "1" if (on_tpu and not fast) else "0"
    donate = os.environ.get("BENCH_DONATE", donate_default) == "1"
    cascade = os.environ.get("BENCH_SWEEP_CASCADE") == "1"
    cascade_frac = float(os.environ.get("BENCH_SWEEP_CASCADE_FRAC", "0.5"))
    cfg = RenderConfig(backend=backend, trace_depth=depth, spp_batch=spp,
                       sort_every=sort_every, sweep_unroll=sweep_unroll,
                       sweep_shadow=sweep_shadow, sweep_key_slots=key_slots,
                       sweep_groups=sweep_groups, sweep_seed_mode=seed_mode,
                       sweep_cascade=cascade,
                       sweep_cascade_frac=cascade_frac,
                       russian_roulette=rr, donate_pool=donate)
    frame, vp = wavefront.make_frame_fn(data, host.camera, cfg)
    n = host.camera.num_pixels
    acc_d = Vec3.zeros((n,))
    acc_i = Vec3.zeros((n,))

    # warmup/compile
    t0 = time.time()
    out, acc_d, acc_i = frame(jnp.uint32(1), vp, acc_d, acc_i)
    jax.block_until_ready(acc_d.x)
    print(f"[bench] compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    total_rays = 0
    for b in range(frames):
        it = 1 + spp + b * spp  # frame consumes spp iteration numbers
        out, acc_d, acc_i = frame(jnp.uint32(it), vp, acc_d, acc_i)
        jax.block_until_ready(acc_d.x)
        total_rays += int(out.rays_traced)
    dt = time.time() - t0

    mpaths = n * frames * spp / dt / 1e6
    print(f"[bench] {frames} frames in {dt:.2f}s  "
          f"({dt / frames * 1000:.0f} ms/frame, "
          f"{total_rays / dt / 1e6:.1f} MRays/s)", file=sys.stderr)

    print(json.dumps({
        "metric": "wavefront_throughput_1080p_143k_tris" + ("_rr" if rr
                                                            else ""),
        "value": round(mpaths, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths / BASELINE_MPATHS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
