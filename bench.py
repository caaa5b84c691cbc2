#!/usr/bin/env python
"""Headline benchmark: wavefront throughput in Mpaths/s at 1080p on a
143k-triangle interior (stand-in for the reference's Fireplace Room, which
is not shipped in-repo — same triangle count, surface-concentrated
geometry, the same material-class mix, one area light; see
tpt/scene/procedural.py:fireplace_like).

Prints JSON lines {"metric", "value", "unit", "vs_baseline"} — the LAST
line is the result. Baseline: 31.72 Mpaths/s — the reference wavefront on
an RTX 3060 Laptop (/root/reference/README.md:46; BASELINE.md).

Survival design (VERDICT r4 item 1 — round 4's official record was a
timeout): the run is STAGED so a parseable line lands as early as
possible, and a watchdog flushes the best row measured so far on
SIGTERM/SIGINT or when the elapsed budget (BENCH_BUDGET_S, default
1500 s) runs out. Stages, cheapest first:

  1. scene prep from the committed blob in benchmarks/prebuilt/
     (~seconds; a cold host build is 306-1686 s — what killed BENCH_r04)
  2. smoke row (256x144, 18.5k tris, depth 4, XLA-oracle backend: one
     fused program, 14.8 s compile measured fully cold) — the
     guaranteed first JSON line lands ~2 minutes into a cold run
  3. spp4/undonated production row at 1080p (the cheapest production
     compile class; 0.473 at the round-5 unroll-8 config)
  4. spp6+donate headline (0.512 measured in round 5) — only entered
     when the remaining budget covers its compile class

The committed prebuilt assets (scene tables + prewarmed XLA cache
entries, see tpt/scene/prepcache.py and tpt/utils/cache.py) make a
fresh-VM run warm: ~10 s prep + ~90 s compile — the XLA seed is
best-effort (compile-cache keys rotate with the TPU relay session,
BENCHMARKS §6c); the staged rows are the cold guarantee (validated:
fully-cold run landed the spp4 row at +1146 s, exit 0).
TPT_NO_PREBUILT=1 measures the true cold path.

Env knobs (any of these switches to single-shot mode, for the queue
scripts' A/B rows): BENCH_FRAMES, BENCH_FAST=1 (tiny scene, smoke only),
BENCH_BACKEND / BENCH_SPP / BENCH_SORT_EVERY / BENCH_SWEEP_UNROLL /
BENCH_TREELET_MT / BENCH_SWEEP_SHADOW / BENCH_SWEEP_KEY_SLOTS /
BENCH_SWEEP_GROUPS / BENCH_SWEEP_SEED (packed|lean|wide) /
BENCH_SWEEP_CASCADE=1 + BENCH_SWEEP_CASCADE_FRAC / BENCH_DONATE —
measurement overrides for the config knobs of the same name. BENCH_RR=1 measures the beyond-parity
"TPU-native mode" estimator (Russian roulette from bounce 3 —
RenderConfig.tpu_native; the metric name gains an `_rr` suffix so the
row never masquerades as the parity headline).
"""

import faulthandler
import json
import os
import signal
import sys
import threading
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

BASELINE_MPATHS = 31.72
HEADLINE_METRIC = "wavefront_throughput_1080p_143k_tris"

_best = None          # best row measured so far (flushed on exit/signal)
_t_start = time.time()


def _emit(row):
    """Print a row and track the best one for the final flush. A 1080p
    production row always beats the smoke row; among same-metric rows the
    higher value wins (spp6 should beat spp4, but measure, don't assume)."""
    global _best
    print(json.dumps(row), flush=True)
    if _best is None:
        _best = row
        return
    cur_head = _best["metric"].startswith(HEADLINE_METRIC)
    new_head = row["metric"].startswith(HEADLINE_METRIC)
    if new_head and not cur_head:
        _best = row
    elif new_head == cur_head and row["metric"] == _best["metric"] \
            and row["value"] > _best["value"]:
        _best = row


def _flush_and_exit(signum=None, frame=None):
    if _best is not None:
        print(json.dumps(_best), flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0 if _best is not None else 1)


def _log(msg):
    print(f"[bench +{time.time() - _t_start:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _row(metric, mpaths):
    return {"metric": metric, "value": round(mpaths, 4), "unit": "Mpaths/s",
            "vs_baseline": round(mpaths / BASELINE_MPATHS, 4)}


def _prep_scene(tris, res, treelet_mt=256, sweep_align=4):
    from tpt.scene import procedural

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris, resolution=res)
    data = host.build(with_bvh=True, treelet_max_tris=treelet_mt,
                      sweep_chunk_align=sweep_align)
    import jax

    jax.block_until_ready(data.pack.tri_f32)
    _log(f"scene ready: {host.mesh.num_triangles} tris ({time.time() - t0:.1f}s)")
    return host, data


def _measure(host, data, cfg, frames, metric):
    """Compile, warm up, time `frames` frames, emit one row. Returns the
    compile+warmup seconds (the caller's budget signal)."""
    import jax
    import jax.numpy as jnp

    from tpt.core.vec import Vec3
    from tpt.integrators import wavefront

    frame, vp = wavefront.make_frame_fn(data, host.camera, cfg)
    n = host.camera.num_pixels
    spp = cfg.spp_batch
    acc_d = Vec3.zeros((n,))
    acc_i = Vec3.zeros((n,))
    t0 = time.time()
    out, acc_d, acc_i = frame(jnp.uint32(1), vp, acc_d, acc_i)
    jax.block_until_ready(acc_d.x)
    compile_s = time.time() - t0
    _log(f"{metric}: compile+warmup {compile_s:.1f}s")

    t0 = time.time()
    total_rays = 0
    for b in range(frames):
        it = 1 + spp + b * spp  # frame consumes spp iteration numbers
        out, acc_d, acc_i = frame(jnp.uint32(it), vp, acc_d, acc_i)
        jax.block_until_ready(acc_d.x)
        total_rays += int(out.rays_traced)
    dt = time.time() - t0
    mpaths = n * frames * spp / dt / 1e6
    _log(f"{metric}: {frames} frames in {dt:.2f}s "
         f"({dt / frames * 1000:.0f} ms/frame, "
         f"{total_rays / dt / 1e6:.1f} MRays/s)")
    _emit(_row(metric, mpaths))
    return compile_s


_SINGLE_SHOT_KNOBS = (
    "BENCH_FAST", "BENCH_BACKEND", "BENCH_SPP", "BENCH_SORT_EVERY",
    "BENCH_SWEEP_UNROLL", "BENCH_TREELET_MT", "BENCH_SWEEP_SHADOW",
    "BENCH_SWEEP_KEY_SLOTS", "BENCH_SWEEP_GROUPS", "BENCH_SWEEP_SEED",
    "BENCH_SWEEP_CASCADE", "BENCH_SWEEP_CASCADE_FRAC", "BENCH_RR",
    "BENCH_DONATE", "BENCH_ADAPTIVE", "BENCH_SPLIT_SHADE",
    "BENCH_SWEEP_PRIMARY",
)


def _single_shot():
    """Queue-script mode: one explicitly-configured measurement."""
    import jax

    from tpt.config import RayCastBackend, RenderConfig

    fast = os.environ.get("BENCH_FAST") == "1"
    frames = int(os.environ.get("BENCH_FRAMES", "3"))
    on_tpu = jax.default_backend() == "tpu"
    if fast:
        res, tris, depth = (256, 144), 20_000, 4
    else:
        res, tris, depth = (1920, 1080), 143_000, 8

    backend = RayCastBackend.BVH_SWEEP if on_tpu else RayCastBackend.BVH_XLA
    bname = os.environ.get("BENCH_BACKEND")
    if bname:
        backend = RayCastBackend[bname.upper()]
    sweep_unroll = int(os.environ.get("BENCH_SWEEP_UNROLL", "4"))
    treelet_mt = int(os.environ.get("BENCH_TREELET_MT", "256"))
    host, data = _prep_scene(tris, res, treelet_mt=treelet_mt,
                             sweep_align=max(4, sweep_unroll))

    # spp_batch=6 + donate_pool is the measured-best headline config
    # (BENCHMARKS §1/§4f: richer pool -> better coherence sort; the
    # ablation chain is 0.4123 -> 0.4427 for spp4->spp6+donate, then
    # 0.4427 -> 0.4937 for the one-gather shade_hit row; spp=6 only
    # fits HBM at 1080p with the pool carry donated across split
    # dispatches — queue 11's undonated spp=6 hit RESOURCE_EXHAUSTED).
    # Off-TPU keep spp=4: donation is a no-op there and the CPU mesh is
    # memory-tight.
    spp_default = "1" if fast else ("6" if on_tpu else "4")
    spp = int(os.environ.get("BENCH_SPP", spp_default))
    donate_default = "1" if (on_tpu and not fast) else "0"
    rr = os.environ.get("BENCH_RR") == "1"
    cfg = RenderConfig(
        backend=backend, trace_depth=depth, spp_batch=spp,
        sort_every=int(os.environ.get("BENCH_SORT_EVERY", "1")),
        sweep_unroll=sweep_unroll,
        sweep_shadow=os.environ.get("BENCH_SWEEP_SHADOW") == "1",
        sweep_key_slots=int(os.environ.get("BENCH_SWEEP_KEY_SLOTS", "2")),
        sweep_groups=os.environ.get("BENCH_SWEEP_GROUPS") == "1",
        sweep_seed_mode=os.environ.get("BENCH_SWEEP_SEED", "packed"),
        sweep_cascade=os.environ.get("BENCH_SWEEP_CASCADE") == "1",
        sweep_cascade_frac=float(
            os.environ.get("BENCH_SWEEP_CASCADE_FRAC", "0.5")),
        russian_roulette=rr,
        donate_pool=os.environ.get("BENCH_DONATE", donate_default) == "1",
        # RR kills lanes, which engages the adaptive-pool ladder — and
        # every engaged rung compiles its own full bounce-program set
        # (queue 20's RR rows burned 45+ min inside that, rc 124 twice).
        # BENCH_ADAPTIVE=0 pins the pool to one compile class; the RR
        # row defaults to that (a conservative measurement: dead lanes
        # still ride the sort+sweep, but the row lands).
        adaptive_pool=os.environ.get(
            "BENCH_ADAPTIVE", "0" if rr else "1") == "1",
        split_shade=os.environ.get("BENCH_SPLIT_SHADE") == "1",
        sweep_primary=os.environ.get("BENCH_SWEEP_PRIMARY") == "1",
    )
    metric = HEADLINE_METRIC + ("_rr" if rr else "")
    if fast:
        metric = "wavefront_throughput_smoke_256x144_18k_tris"
    _measure(host, data, cfg, frames, metric)


def _staged(deadline):
    """Driver mode: land a number early, then upgrade while budget lasts."""
    import jax

    from tpt.config import RayCastBackend, RenderConfig

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # off-TPU there is no compile-cost cliff to stage around
        os.environ.setdefault("BENCH_SPP", "4")
        return _single_shot()

    remaining = lambda: deadline - time.time()  # noqa: E731

    # Stage 1+2: smoke row — the guaranteed "first parseable line", on
    # the XLA-oracle backend: ONE fused program, no Mosaic kernels —
    # 14.8 s compile measured FULLY COLD (2026-08-20) vs 400-600 s for
    # the sweep-backend smoke. Runs slow (~6.4 s/frame at 256×144) but
    # a canary's runtime is irrelevant; the line lands ~2 min into a
    # cold run. (20k requested -> 18,500 actual tris; must match the
    # prebuilt key.)
    host_s, data_s = _prep_scene(20_000, (256, 144))
    cfg_s = RenderConfig(backend=RayCastBackend.BVH_XLA, trace_depth=4,
                         spp_batch=1, donate_pool=False)
    _measure(host_s, data_s, cfg_s, 1,
             "wavefront_throughput_smoke_256x144_18k_tris")
    del host_s, data_s

    # Stage 3: spp4/undonated production row (cheapest production
    # compile class — ~600-680 s cold / ~45-90 s warm; frames ~30 s
    # each). Attempt whenever any plausible budget remains — the
    # watchdog flushes the smoke row if the compile runs long.
    if remaining() < 300:
        _log(f"skipping 1080p rows: {remaining():.0f}s left")
        return
    # unroll-8 sweep kernel is the round-5 production config (queue 24:
    # 0.473 at spp4 vs 0.4567 u4; 0.512 headline vs 0.4949) — it needs
    # chunk_align=8 tables (benchmarks/prebuilt ships that blob too)
    host, data = _prep_scene(143_000, (1920, 1080), sweep_align=8)
    cfg4 = RenderConfig(backend=RayCastBackend.BVH_SWEEP, trace_depth=8,
                        spp_batch=4, donate_pool=False, sweep_unroll=8)
    spp4_compile = _measure(host, data, cfg4, 2, HEADLINE_METRIC)

    # Stage 4: spp6+donate headline — a different (more expensive)
    # compile class; only enter with budget for compile + 3 frames.
    est_spp6 = max(spp4_compile * 1.5, 120) + 3 * 30
    if remaining() < est_spp6:
        _log(f"stopping at spp4 row: {remaining():.0f}s left < "
             f"{est_spp6:.0f}s estimated for the spp6 class")
        return
    cfg6 = RenderConfig(backend=RayCastBackend.BVH_SWEEP, trace_depth=8,
                        spp_batch=6, donate_pool=True, sweep_unroll=8)
    _measure(host, data, cfg6, 3, HEADLINE_METRIC)


def _work(deadline):
    if any(os.environ.get(k) for k in _SINGLE_SHOT_KNOBS):
        _single_shot()
    else:
        _staged(deadline)


def main() -> int:
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    # leave a margin so the flush beats an external `timeout` SIGKILL
    deadline = _t_start + budget - min(45.0, budget * 0.1)
    signal.signal(signal.SIGTERM, _flush_and_exit)
    signal.signal(signal.SIGINT, _flush_and_exit)

    # The measurement MUST run on the main thread: device-to-host value
    # fetches from a non-main thread hang (or take minutes) over the
    # axon TPU relay — observed twice this round (a worker-thread
    # np.asarray of a scene array sat 12+ min; a worker-thread value
    # fetch of a matmul took 217 s vs 2 s from the main thread). The
    # budget watchdog therefore runs in a helper thread: os._exit works
    # from any thread, even while the main thread blocks inside an XLA
    # compile where a Python signal handler could not run.
    def watchdog():
        while True:
            time.sleep(1.0)
            if time.time() > deadline:
                _log("budget exceeded — flushing best row")
                _flush_and_exit()

    threading.Thread(target=watchdog, daemon=True).start()

    if os.environ.get("TPT_FORCE_CPU") == "1":
        # the JAX_PLATFORMS env var is ignored once the axon TPU plugin
        # registers itself; the config update after import does work
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.zeros((8,)).sum())
    from tpt.utils.cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    _log(f"backend {jax.default_backend()}, compilation cache: {cache_dir}")
    try:
        _work(deadline)
    except BaseException:  # noqa: BLE001 — report, still flush best row
        import traceback

        traceback.print_exc()
    if _best is not None:
        print(json.dumps(_best), flush=True)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
