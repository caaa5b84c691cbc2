#!/usr/bin/env python
"""Per-dispatch breakdown of the PRODUCTION sweep-split frame (the
round-4 headline shape): raygen, bounce 0 (wide-kernel primaries), then
per bounce the three dispatches the frame actually runs —
seed scan (_sweep_scan_keys), packed 24-operand pool sort
(_sweep_sort_packed), and the seeded bounce program
(sweep cast + tail + logic/shade/shadow fused). Answers "where do the
20.1 s/frame go" at the headline config (BENCHMARKS §4d round-4 note).

Env: BD_TRIS (143000), BD_RES (1920x1080), BD_DEPTH (8), BD_SPP (4),
BD_REPS (2 timing reps per dispatch, first rep discarded as warmup),
plus bench.py's BENCH_SWEEP_* knobs for the config under test.
BD_NO_SHADOW=1 drops the NEE shadow any-hit from the bounce program
(cfg.debug_no_shadow — timing diagnostic: the delta vs the default run
is the shadow cast's share of the fused dispatch).
BD_SPLIT=1 times cfg.split_shade's two-dispatch shape instead: the
extension cast (sweep + wide tail) and the logic/shade/shadow program
each get their own row — the per-stage table VERDICT r4 item 2 asks
for. BD_PRIMARY=1 routes bounce 0 through the dense-sweep path
(cfg.sweep_primary: scan dispatch + seeded sweep bounce) and times
both dispatches.
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
    spp = int(os.environ.get("BD_SPP", "4"))
    unroll = int(os.environ.get("BENCH_SWEEP_UNROLL", "4"))
    treelet_mt = int(os.environ.get("BENCH_TREELET_MT", "256"))
    groups = os.environ.get("BENCH_SWEEP_GROUPS") == "1"
    key_slots = int(os.environ.get("BENCH_SWEEP_KEY_SLOTS", "2"))
    seed_mode = os.environ.get("BENCH_SWEEP_SEED", "packed")
    sweep_shadow = os.environ.get("BENCH_SWEEP_SHADOW") == "1"
    cascade = os.environ.get("BENCH_SWEEP_CASCADE") == "1"
    cascade_frac = float(os.environ.get("BENCH_SWEEP_CASCADE_FRAC", "0.5"))

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris, resolution=res)
    scene = host.build(with_bvh=True, treelet_max_tris=treelet_mt,
                       sweep_chunk_align=max(4, unroll))
    split = os.environ.get("BD_SPLIT") == "1"
    primary = os.environ.get("BD_PRIMARY") == "1"
    cfg = RenderConfig(backend=RayCastBackend.BVH_SWEEP, trace_depth=depth,
                       spp_batch=spp, sweep_unroll=unroll,
                       sweep_groups=groups, sweep_key_slots=key_slots,
                       sweep_seed_mode=seed_mode, sweep_shadow=sweep_shadow,
                       debug_no_shadow=os.environ.get("BD_NO_SHADOW") == "1",
                       sweep_cascade=cascade,
                       sweep_cascade_frac=cascade_frac,
                       split_shade=split, sweep_primary=primary)
    raycaster = make_raycaster(scene, cfg)
    cam = host.camera
    vp = wavefront.camera_view_proj(cam)
    print(f"[sbd] scene ready ({time.time()-t0:.0f}s) pool="
          f"{cam.num_pixels * spp}", file=sys.stderr)

    start = jax.jit(lambda it: wavefront.batched_raygen(cam, cfg, it))
    bounce = wavefront._make_bounce_fn(scene, raycaster, cam, cfg)
    assert seed_mode == "packed", "breakdown wired for the packed shape"
    (bounce_first, _, _, scan_rest, _, _, sort_packed, _,
     bounce_packed) = bounce._jit_fns[:9]
    if cascade:
        casc_pre, casc_sort, bounce_casc = bounce._jit_fns[9:12]

    def force(x):
        # one jitted fn = one XLA program = atomic completion: fetching a
        # single element of ONE output leaf proves the dispatch retired.
        # Fetching whole leaves instead ships the ~630 MB carry over the
        # axon relay (~9 MB/s) and times the tunnel, not the TPU — the
        # first queue-10 run measured 71.9 s for a raygen dispatch that
        # way. block_until_ready also lies under the async relay
        # (CLAUDE.md), so a value fetch it must be.
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jnp.ravel(leaf)[:1])

    def timed(fn, *args):
        out = fn(*args)   # warmup rep (compile on first call)
        force(out)
        t0 = time.time()
        out = fn(*args)
        force(out)
        return out, (time.time() - t0) * 1e3

    # raygen + primaries (bounce 0: wide-kernel cast, no seed — or the
    # scan + seeded-sweep pair under BD_PRIMARY=1)
    carry = start(jnp.uint32(2))
    _, t_raygen = timed(start, jnp.uint32(2))
    rows = [dict(stage="raygen", ms=round(t_raygen, 1))]
    if primary:
        scan_first, bounce_first_sweep = bounce._primary_fns
        slots0, t_scan0 = timed(scan_first, carry)
        (carry1, _), t_first = timed(bounce_first_sweep, vp, vp, carry,
                                     slots0)
        rows.append(dict(stage="bounce0_scan", ms=round(t_scan0, 1)))
        rows.append(dict(stage="bounce0_sweep", ms=round(t_first, 1)))
    else:
        (carry1, _), t_first = timed(bounce_first, vp, vp, carry)
        rows.append(dict(stage="bounce0_primaries", ms=round(t_first, 1)))
    for r in rows:
        print(json.dumps(r))
    sys.stdout.flush()

    carry = carry1
    total = sum(r["ms"] for r in rows)
    for d in range(1, depth):
        alive = float(jnp.mean(carry[5].astype(jnp.float32)))
        (keys, slots_raw), t_scan = timed(scan_rest, carry)
        (carry_s, skeys, packed), t_sort = timed(
            sort_packed, carry, keys, slots_raw)
        row = dict(depth=d, alive=round(alive, 3),
                   seed_scan_ms=round(t_scan, 1),
                   seed_sort_ms=round(t_sort, 1))
        if cascade:
            # five-dispatch shape: phase-1 sweep + compact, phase-2 bin
            # sort, then phase-2 sweep + tail + logic/shade/shadow
            (h1, r1, thr, bundle), t_p1 = timed(
                casc_pre, carry_s, skeys, packed)
            sb, t_s2 = timed(casc_sort, bundle)
            (out, _), t_bounce = timed(
                bounce_casc, jnp.int32(d), vp, vp, carry_s, h1, r1, thr,
                sb)
            row.update(casc_p1_ms=round(t_p1, 1),
                       casc_sort_ms=round(t_s2, 1),
                       casc_unres1=round(float(jnp.mean(
                           (~r1).astype(jnp.float32))), 4),
                       bounce_ms=round(t_bounce, 1))
            total += t_p1 + t_s2
        elif split:
            # two-dispatch shape: extension cast, then logic/shade/shadow
            cast_fn, shade_fn = bounce._split_fns
            hit, t_cast = timed(cast_fn, carry_s, skeys, packed)
            (out, _), t_shade = timed(shade_fn, jnp.int32(d), vp, vp,
                                      carry_s, hit)
            row.update(cast_ms=round(t_cast, 1),
                       shade_ms=round(t_shade, 1),
                       bounce_ms=round(t_cast + t_shade, 1))
        else:
            (out, _), t_bounce = timed(
                bounce_packed, jnp.int32(d), vp, vp, carry_s, skeys, packed)
            row.update(bounce_ms=round(t_bounce, 1))
        carry = out
        rows.append(row)
        total += row["bounce_ms"] if "bounce_ms" in row else 0
        total += t_scan + t_sort
        print(json.dumps(row))
        sys.stdout.flush()

    print(json.dumps({
        "total_ms": round(total, 1),
        "note": "bounce = sweep cast + tail cast + logic/shade/shadow "
                "(one program); timings are 2nd-rep (steady dispatch)"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
