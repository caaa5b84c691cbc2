"""Sweep-cast: the scan → bin-sort → demand-driven dense sweep → hard
tail closest-hit pipeline for incoherent (bounce) rays.

This is the round-3 re-binning design that replaces packet *traversal*
for the binned majority of rays (VERDICT round 2, "find the next
decade"). Stages, all static-shaped and fully on-device:

1. SCAN (pallas_treelet.treelet_scan_multi): one small top-tree
   traversal emits each ray's S=4 nearest treelet candidates
   (entry_t, ordinal) plus thr_t, a lower bound on every candidate the
   slots could not capture.
2. BIN SORT: one multi-operand lax.sort keyed on (slot1, slot0)
   ordinals. Rank data (benchmarks/sweep_kernel.py) shows bounce-ray
   hits land at candidate rank <=1 for 73.5% and <=2 for 94.6% while
   rank 0 (the origin's own treelet) almost never resolves — slot1 is
   the bin a block most wants to agree on. Sorting payloads is ~10x
   cheaper than gathering them (raysort.py measurement), so the rays
   and slot planes ride the sort as operands.
3. SWEEP (pallas_sweep.sweep_closest_hit, demand mode): each 1024-ray
   block walks the union of its lanes' still-needed candidate
   treelets and tests every triangle densely — no stack, no per-visit
   latency chain. Lanes drop slot k the moment their best hit
   precedes the slot's entry t, so far slots usually die unswept.
4. RESOLUTION: a lane is done iff best_t <= thr_t (no uncaptured
   candidate can beat it) or thr_t = INF (the slots were exhaustive).
   Unresolved lanes (measured ~5-25% depending on depth) fall to the
   ordinary wide packet traversal with a tight t_max cull; resolved
   lanes ride along dead (t_max = 0), costing only lane occupancy.
5. UNSORT: a second lax.sort keyed on the original index restores
   order (cheaper than a scatter for the same reason as step 2).

Reference counterpart: none — the reference's per-ray MIMD traversal
(/root/reference/src/kernels/ray_cast.cu:12-122) needs no global
re-binning; this is the TPU answer to packet-union divergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.vec import Vec3
from ..integrators.intersect import FLT_MAX, HitRecord
from .pack import PacketBVH
from .pallas_sweep import (NONE_ORD, dense_scan, sweep8_closest_hit,
                           sweep_closest_hit)
from .pallas_traverse import packet_closest_hit_wide
from .pallas_treelet import _INF
from .treelet import SweepTables


def bin_key(s_o, d: Vec3, T: int, slots: int) -> jnp.ndarray:
    """(slot1, slot0, dir-octant) composite sort key. The octant tertiary
    groups same-bin rays by direction cone so the (unsorted) slot2/3
    requests of adjacent lanes correlate — measured to shrink the demand
    sweep's block unions. Fits int32 for T < 5000."""
    assert (T + 1) * (T + 1) * 8 < 2 ** 31
    o_cap = [jnp.minimum(s_o[i], T).astype(jnp.int32) for i in range(slots)]
    octant = ((d.x >= 0).astype(jnp.int32) * 4
              + (d.y >= 0).astype(jnp.int32) * 2
              + (d.z >= 0).astype(jnp.int32))
    key = o_cap[1] * (T + 1) + o_cap[0] if slots > 1 else o_cap[0]
    return key * 8 + octant


@functools.partial(jax.jit,
                   static_argnames=("slots", "tail", "kernel", "tail_prefix"))
def sweep_cast(pack: PacketBVH, sweep: SweepTables, ori: Vec3, d: Vec3,
               t_max: jnp.ndarray, slots: int = 4,
               tail: bool = True, kernel: str = "sublane",
               tail_prefix: int = 0) -> HitRecord:
    """Exact closest hit (bit-matches brute force up to equal-t ties) for
    an unsorted ray population; dead lanes (t_max <= 0) return tri=-1.
    kernel: "sublane" (sweep8: 128-ray blocks, 8 tris/VPU-op) or "lane"
    (1024-ray blocks, one tri/op)."""
    n = ori.x.shape[0]
    s_t, s_o, thr = dense_scan(sweep, ori, d, t_max, slots=slots)

    # --- bin sort: key = (slot1, slot0, octant), compact ----------------
    T = sweep.num_treelets
    key = bin_key(s_o, d, T, slots)
    idx = jnp.arange(n, dtype=jnp.int32)
    ops = (key, ori.x, ori.y, ori.z, d.x, d.y, d.z, t_max,
           *(s_o[i] for i in range(slots)),
           *(s_t[i] for i in range(slots)), thr, idx)
    ops = jax.lax.sort(ops, num_keys=1)
    (ox, oy, oz, dx, dy, dz, tm) = ops[1:8]
    so = ops[8:8 + slots]
    st = ops[8 + slots:8 + 2 * slots]
    thr_s = ops[8 + 2 * slots]
    idx_s = ops[9 + 2 * slots]
    ori_s = Vec3(ox, oy, oz)
    d_s = Vec3(dx, dy, dz)

    # --- demand-driven dense sweep --------------------------------------
    cast = sweep8_closest_hit if kernel == "sublane" else sweep_closest_hit
    hit = cast(sweep, ori_s, d_s, tm, tuple(so), tuple(st))

    # --- resolution: nothing uncaptured can beat best_t -----------------
    best = jnp.where(hit.tri >= 0, hit.t, FLT_MAX)
    resolved = (thr_s >= _INF) | (best <= thr_s)

    if tail:
        # Unresolved lanes are a sub-percent minority (measured 0.2-0.5%),
        # but a full-pool tail cast pays the dead-lane tax on EVERY packet
        # (413-644 ms at 1M rays for <1% live). Compact them into a dense
        # prefix with one more multi-operand sort (resolved lanes keep
        # original-index order so the final unsort is unchanged), cast a
        # static prefix, and fall back to the full-pool cast only if the
        # unresolved count overflows the prefix (lax.cond: both branches
        # compile, one runs).
        tail_tm = jnp.where(resolved, 0.0, jnp.minimum(best, tm))
        ckey = jnp.where(resolved, idx_s + n, idx_s)
        (_, ox2, oy2, oz2, dx2, dy2, dz2, tm2, ht2, htri2, hu2, hv2,
         idx2) = jax.lax.sort(
            (ckey, ox, oy, oz, dx, dy, dz, tail_tm,
             hit.t, hit.tri, hit.u, hit.v, idx_s), num_keys=1)
        n_unres = jnp.sum((~resolved).astype(jnp.int32))
        P = min(n, tail_prefix or max(16384, n // 32))

        def prefix_cast(_):
            h = lambda a: a[:P]
            th = packet_closest_hit_wide(
                pack, Vec3(h(ox2), h(oy2), h(oz2)),
                Vec3(h(dx2), h(dy2), h(dz2)), h(tm2), t_cull=True)
            pad = lambda a, fill: jnp.concatenate(
                [a, jnp.full((n - P,), fill, a.dtype)])
            return (pad(th.t, 0.0), pad(th.tri, -1), pad(th.u, 0.0),
                    pad(th.v, 0.0))

        def full_cast(_):
            th = packet_closest_hit_wide(
                pack, Vec3(ox2, oy2, oz2), Vec3(dx2, dy2, dz2), tm2,
                t_cull=True)
            return th.t, th.tri, th.u, th.v

        tt, ttri, tu, tv = jax.lax.cond(n_unres <= P, prefix_cast,
                                        full_cast, operand=None)
        win = ttri >= 0
        hit = HitRecord(t=jnp.where(win, tt, ht2),
                        tri=jnp.where(win, ttri, htri2),
                        u=jnp.where(win, tu, hu2),
                        v=jnp.where(win, tv, hv2))
        idx_s = idx2
    else:
        # sound-subset contract: an unresolved lane's sweep best may not
        # be the global closest — report it as a miss instead of a hit
        hit = HitRecord(t=jnp.where(resolved, hit.t, FLT_MAX),
                        tri=jnp.where(resolved, hit.tri, -1),
                        u=hit.u, v=hit.v)

    # --- unsort ---------------------------------------------------------
    _, t, tri, u, v = jax.lax.sort(
        (idx_s, hit.t, hit.tri, hit.u, hit.v), num_keys=1)
    return HitRecord(t=t, tri=tri, u=u, v=v)
