#!/usr/bin/env python
"""SVGF stage breakdown at 1080p (BENCHMARKS.md §5 data; the reference's
README §3.5 measured 8.26 ms full-pipeline on an RTX 3060).

Times the full `run_svgf` pipeline in both reprojection/à-trous backends
(Pallas vs XLA) plus isolated stages. Run on the TPU host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/svgf_stages.py
Env: SV_RES (default 1920x1080), SV_REPS (default 5).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpt.config import SVGFConfig
    from tpt.core.vec import Vec3
    from tpt.denoise import svgf as svgf_mod
    from tpt.denoise.svgf import SVGFState, run_svgf

    w, h = (int(v) for v in os.environ.get("SV_RES", "1920x1080").split("x"))
    reps = int(os.environ.get("SV_REPS", "5"))

    rng = np.random.default_rng(3)
    r = lambda: jnp.asarray(rng.random((h, w), np.float32))
    v3 = lambda: Vec3(r(), r(), r())
    nrm = rng.normal(size=(3, h, w)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
    normal = Vec3(*[jnp.asarray(c) for c in nrm])
    depth = jnp.asarray(rng.uniform(1, 50, (h, w)).astype(np.float32))
    matid = jnp.asarray(rng.integers(0, 4, (h, w)).astype(np.int32))
    mu = jnp.asarray(rng.uniform(-3, 3, (h, w)).astype(np.float32))
    mv = jnp.asarray(rng.uniform(-3, 3, (h, w)).astype(np.float32))

    # a believable warm state: consistent history (same depth/normal/matid)
    state = SVGFState(
        hist_direct=v3(), hist_direct_var=r(),
        hist_indirect=v3(), hist_indirect_var=r(),
        m1_dir=r(), m1_ind=r(), m2_dir=r(), m2_ind=r(),
        history_len=jnp.full((h, w), 8, jnp.int32),
        prev_depth=depth, prev_normal=normal, prev_matid=matid,
    )
    raw_d, raw_i, albedo = v3(), v3(), v3()

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + force
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.time() - t0) / reps * 1000.0

    def report(name, ms):
        print(json.dumps({"metric": f"svgf {name} {w}x{h}",
                          "value": round(ms, 2), "unit": "ms"}))
        sys.stdout.flush()

    only_pallas = os.environ.get("SV_ONLY_PALLAS") == "1"
    # isolated stages
    cfg = SVGFConfig()
    from tpt.denoise.pallas_reproject import reproject_pallas

    re_p = jax.jit(lambda st: reproject_pallas(
        st, mu, mv, normal, depth, matid, radius=cfg.reproject_radius))
    report("reproject pallas", timeit(re_p, state))
    if not only_pallas:
        re_x = jax.jit(lambda st: svgf_mod._reproject_taps(
            st, mu, mv, normal, depth, matid))
        report("reproject xla(4 gathers)", timeit(re_x, state))

    from tpt.denoise.pallas_stencil import atrous_pallas

    at_p = jax.jit(lambda a, b, c, d: atrous_pallas(
        a, b, c, d, depth, normal, 4, cfg.sigma_z, cfg.sigma_n, cfg.sigma_l))
    report("atrous x1 pallas", timeit(at_p, raw_d, r(), raw_i, r()))
    if not only_pallas:
        at_x = jax.jit(lambda a, b, c, d: svgf_mod._atrous_once(
            a, b, c, d, depth, normal, 4, cfg))
        report("atrous x1 xla", timeit(at_x, raw_d, r(), raw_i, r()))

    sp = jax.jit(lambda: svgf_mod._spatial_variance(
        r(), r(), r(), r(), depth, normal, cfg))
    report("spatial variance 7x7", timeit(sp))
    for pallas_re in ((True,) if only_pallas else (True, False)):
        for pallas_at in ((True,) if only_pallas else (True, False)):
            cfg = SVGFConfig(use_pallas_reproject=pallas_re,
                             use_pallas_atrous=pallas_at)
            full = jax.jit(lambda st, cfg=cfg: run_svgf(
                cfg, st, raw_d, raw_i, albedo, depth, normal, matid, mu, mv))
            tag = (f"full reproject={'pallas' if pallas_re else 'xla'} "
                   f"atrous={'pallas' if pallas_at else 'xla'}")
            report(tag, timeit(full, state))

    return 0


if __name__ == "__main__":
    sys.exit(main())
