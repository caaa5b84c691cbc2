#!/usr/bin/env python
"""Near-field two-pass extension-cast probe (BENCHMARKS.md §4).

Hypothesis: a bounded per-lane t_max collapses the packet's node-visit
union (far subtrees fail the slab test for every lane), so casting
bounce-like rays with t_max = frac * diag and re-casting only the misses
unbounded beats one unbounded cast. Measures sorted surface rays on the
bench interior at several fracs plus the one-pass baseline.

Run on the TPU host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/nearfield.py
Env: NF_TRIS (143000), NF_N (2^21), NF_FRACS ("0.05 0.1 0.2 0.4").
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpt.bvh.pallas_traverse import packet_closest_hit_wide
    from tpt.core.vec import Vec3
    from tpt.integrators import raysort
    from tpt.scene import procedural

    tris = int(os.environ.get("NF_TRIS", "143000"))
    n = int(os.environ.get("NF_N", str(2 ** 21)))
    fracs = [float(v) for v in
             os.environ.get("NF_FRACS", "0.05 0.1 0.2 0.4").split()]

    t0 = time.time()
    host = procedural.fireplace_like(num_triangles=tris,
                                     resolution=(1440, n // 1440))
    scene = host.build(with_bvh=True)
    pack = scene.pack
    print(f"[nf] scene {scene.mesh.num_triangles} tris ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    # bounce-like rays: random surface origins + cosine-ish directions,
    # coherence-sorted exactly like the wavefront pool
    rng = np.random.default_rng(7)
    nn = n
    px = np.asarray(scene.mesh.positions.x)
    sel = rng.integers(0, px.shape[0], nn)
    o = Vec3(*[jnp.asarray(np.asarray(c)[sel]) for c in
               (scene.mesh.positions.x, scene.mesh.positions.y,
                scene.mesh.positions.z)])
    dd = rng.normal(size=(3, nn)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=0)
    d = Vec3(*[jnp.asarray(c) for c in dd])
    lo, inv = raysort.world_bounds(scene.mesh)
    key = raysort.coherence_key(o, d, lo, inv)
    perm, _ = raysort.sort_permutation(key)
    o, d = o.take(perm), d.take(perm)
    diag = float(np.sqrt(sum((1.0 / np.asarray(getattr(inv, c))) ** 2
                             for c in "xyz")))

    inf = jnp.full((nn,), 3.4e38)

    @jax.jit
    def one_pass(o, d):
        return packet_closest_hit_wide(pack, o, d, inf)

    def two_pass_fn(r1):
        @jax.jit
        def f(o, d):
            h1 = packet_closest_hit_wide(pack, o, d, jnp.full((nn,), r1))
            miss = ~(h1.tri >= 0)
            h2 = packet_closest_hit_wide(
                pack, o, d, jnp.where(miss, 3.4e38, -1.0))
            return (jnp.where(h1.tri >= 0, h1.t, h2.t),
                    jnp.where(h1.tri >= 0, h1.tri, h2.tri),
                    jnp.sum(miss.astype(jnp.int32)))
        return f

    def timeit(fn, reps=3):
        out = fn(o, d)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(o, d)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.time() - t0) / reps, out

    dt, base = timeit(one_pass)
    bt = np.asarray(base.t)
    btri = np.asarray(base.tri)
    print(json.dumps({"metric": "nearfield baseline one-pass",
                      "value": round(nn / dt / 1e6, 3), "unit": "Mrays/s"}))
    sys.stdout.flush()

    for frac in fracs:
        dt, out = timeit(two_pass_fn(frac * diag))
        t2, tri2, nmiss = (np.asarray(out[0]), np.asarray(out[1]),
                           int(out[2]))
        ok = np.array_equal(tri2, btri) and np.allclose(
            np.where(np.isfinite(bt), bt, 0),
            np.where(np.isfinite(t2), t2, 0), atol=1e-5)
        print(json.dumps({
            "metric": f"nearfield two-pass frac={frac}",
            "value": round(nn / dt / 1e6, 3), "unit": "Mrays/s",
            "miss_pct": round(100.0 * nmiss / nn, 1),
            "matches_baseline": bool(ok)}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
