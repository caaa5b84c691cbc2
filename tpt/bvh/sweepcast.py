"""Sweep-cast: the scan → bin-sort → demand-driven dense sweep → hard
tail closest-hit pipeline for incoherent (bounce) rays.

This is the round-3 re-binning design that replaces packet *traversal*
for the binned majority of rays (VERDICT round 2, "find the next
decade"). Stages, all static-shaped and fully on-device:

1. SCAN (pallas_sweep.dense_scan): slab-test every treelet AABB per
   [8,128] ray block (no tree, no serial visit chain) and emit each
   ray's S=4 nearest treelet candidates (entry_t, ordinal) plus thr_t,
   an exact lower bound on every candidate the slots could not capture.
2. BIN SORT: one multi-operand lax.sort keyed on (slot1, slot0, octant)
   ordinals. Rank data (benchmarks/sweep_kernel.py) shows bounce-ray
   hits land at candidate rank <=1 for 73.5% and <=2 for 94.6% while
   rank 0 (the origin's own treelet) almost never resolves — slot1 is
   the bin a block most wants to agree on. Sorting payloads is ~10x
   cheaper than gathering them (raysort.py measurement), so the rays
   and slot planes ride the sort as operands.
3. SWEEP (pallas_sweep.sweep8_closest_hit, demand mode): each 128-ray
   block walks the union of its lanes' still-needed candidate treelets
   and tests every triangle densely (8 tris x 128 rays per VPU op) —
   no stack, no per-visit latency chain. Lanes drop slot k the moment
   their best hit precedes the slot's entry t, so far slots usually
   die unswept.
4. RESOLUTION: a lane is done iff best_t <= thr_t (no uncaptured
   candidate can beat it) or thr_t = INF (the slots were exhaustive).
   Unresolved lanes (measured 0.2-0.5%) are compacted into a dense
   prefix by one more sort and cast by the wide packet kernel as a
   small static prefix (a full-pool tail cast pays the dead-lane tax
   on EVERY packet: 413-644 ms/1M rays at <1% live); results scatter
   back. lax.cond falls back to a full-pool cast if the unresolved
   count overflows the prefix.
5. UNSORT: a second lax.sort keyed on the original index restores
   order (cheaper than a scatter for the same reason as step 2).

When the caller's pool is ALREADY bin-sorted (the wavefront integrator
folds the bin key into its per-bounce pool sort — wavefront.py
sweep_seeding), use `sweep_cast_sorted`: steps 3-4 only, results in the
given pool order, no internal sort/unsort.

Reference counterpart: none — the reference's per-ray MIMD traversal
(/root/reference/src/kernels/ray_cast.cu:12-122) needs no global
re-binning; this is the TPU answer to packet-union divergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from ..integrators.intersect import FLT_MAX, HitRecord
from .pack import PacketBVH
from .pallas_sweep import (NONE_ORD, dense_scan, sweep8_closest_hit,
                           sweep_closest_hit)
from .pallas_traverse import packet_any_hit_wide, packet_closest_hit_wide
from .pallas_treelet import _INF
from .treelet import SweepTables


def _octant(d: Vec3) -> jnp.ndarray:
    return ((d.x >= 0).astype(jnp.int32) * 4
            + (d.y >= 0).astype(jnp.int32) * 2
            + (d.z >= 0).astype(jnp.int32))


def bin_key(s_o, d: Vec3, T: int, slots: int,
            with_octant: bool = True) -> jnp.ndarray:
    """(slot1, slot0, dir-octant) composite sort key. The octant tertiary
    groups same-bin rays by direction cone so the (unsorted) slot2/3
    requests of adjacent lanes correlate — measured to shrink the demand
    sweep's block unions. Fits int32 for T < 5000. `with_octant=False`
    drops the octant tertiary (the 2-key bin sort moves it into key 2,
    after slot2 — see bin_key2)."""
    assert (T + 1) * (T + 1) * 8 < 2 ** 31
    o_cap = [jnp.minimum(s_o[i], T).astype(jnp.int32) for i in range(slots)]
    key = o_cap[1] * (T + 1) + o_cap[0] if slots > 1 else o_cap[0]
    return key * 8 + _octant(d) if with_octant else key


def bin_key2(s_o, d: Vec3, T: int, slots: int) -> jnp.ndarray:
    """Secondary sort key (slot2, dir-octant) for the 2-key bin sort
    (cfg.sweep_key_slots=3; key 1 = bin_key(with_octant=False)): within
    a (slot1, slot0) group, lanes that also agree on their THIRD
    candidate pack into the same 128-lane block, shrinking the demand
    sweep's ordinal union (the union 14-19 vs ideal 2-3 is the sweep
    kernel's remaining cost — BENCHMARKS §4d). One extra int32 sort
    operand (~2.6 ms/2M) + the 2-key comparator cost."""
    o2 = (jnp.minimum(s_o[2], T).astype(jnp.int32) if slots > 2
          else jnp.zeros_like(s_o[0], jnp.int32))
    return o2 * 8 + _octant(d)


# ---------------------------------------------------------------------------
# Packed seed planes: the scan's 2S+1 candidate planes compressed to 4
# pool-sort payload operands (wavefront.py sweep_seed_mode="packed")
# ---------------------------------------------------------------------------

_BF16_MASK = np.uint32(0xFFFF0000)


def _pack_bf16_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two NON-NEGATIVE f32 planes -> one int32 plane (a in the low half,
    b in the high half). Each value is truncated to bf16; truncation
    rounds non-negative floats toward zero, i.e. DOWN, which is the sound
    direction for both uses (demand entries and thr bounds may shrink,
    never grow)."""
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    bi = jax.lax.bitcast_convert_type(b, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        (ai >> 16) | (bi & _BF16_MASK), jnp.int32)


def _unpack_bf16_pair(p: jnp.ndarray):
    pi = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type(pi << 16, jnp.float32)
    b = jax.lax.bitcast_convert_type(pi & _BF16_MASK, jnp.float32)
    return a, b


def _ord_bits(T: int) -> int:
    """Bits to encode one capped ordinal in 0..T (T = 'no candidate')."""
    b = 1
    while (1 << b) <= T:
        b += 1
    return b


def _keyed_slots(slots: int, key_slots: int) -> int:
    """How many leading candidate ordinals the bin-sort key(s) already
    encode: bin_key carries (slot1, slot0) and, in the 2-key flavor,
    bin_key2 carries slot2."""
    return 3 if (key_slots >= 3 and slots > 2) else 2


def pack_seed(s_o, s_t, thr, T: int, slots: int, key_slots: int):
    """Compress the dense scan's candidate planes into the minimum pool-
    sort payload: ordinals the bin key(s) already encode are dropped
    (re-derived from the sorted keys), the remaining ordinals pack into
    ONE int32 plane, and the S entry-t planes pack into ceil(S/2) int32
    planes as truncated-bf16 pairs. thr stays exact f32 (its >=_INF
    comparison must not be disturbed by rounding — a truncated-INF thr
    would send every env-miss lane to the tail cast).

    Soundness: unpacked entry-t <= original (truncation of t >= 0), so
    the sweep kernel's demand mask requests a SUPERSET of slots — extra
    provably-useless sweeps, identical hits. Why: 31 payload operands
    never finish the TPU backend compile at 1080p pool sizes while ~24
    is expected inside the 20-operand shape's compile class
    (BENCHMARKS §4d compiler-shape rule)."""
    b = _ord_bits(T)
    nk = _keyed_slots(slots, key_slots)
    assert (slots - nk) * b <= 31, \
        f"{slots - nk} ordinals x {b} bits exceed one int32 (T={T})"
    enc = None
    for i in range(nk, slots):
        o = jnp.minimum(s_o[i], T).astype(jnp.int32)
        enc = o if enc is None else enc | (o << ((i - nk) * b))
    ops = () if enc is None else (enc,)
    for i in range(0, slots, 2):
        hi = s_t[i + 1] if i + 1 < slots else jnp.zeros_like(s_t[i])
        ops = ops + (_pack_bf16_pair(s_t[i], hi),)
    return ops + (thr,)


def unpack_seed(keys, packed, T: int, slots: int, key_slots: int):
    """Inverse of pack_seed given the SORTED key plane(s): returns
    (s_o tuple, s_t tuple, thr) shaped like the scan's planes. Ordinals
    round-trip exactly (capped-at-T 'none' values map back to NONE_ORD);
    entry-t values come back bf16-truncated (<= originals, sound).

    Dead lanes carry the sentinel key 1<<30, whose decoded slot0 can
    alias a real ordinal — harmless: the sweep kernels force ordinals of
    t_max <= 0 lanes to NONE_ORD before any sweep (pallas_sweep _tile
    masking), and those lanes resolve via their exact f32 thr (=_INF
    from the scan's zeroed t_max)."""
    two_key = key_slots >= 3 and slots > 2
    nk = _keyed_slots(slots, key_slots)
    k = keys[0] if two_key else keys[0] // 8  # strip the octant tertiary
    s_o = [k % (T + 1), k // (T + 1)]
    if two_key:
        s_o.append(keys[1] // 8)
    rest = packed
    if slots > nk:
        b = _ord_bits(T)
        mask = (1 << b) - 1
        for i in range(nk, slots):
            s_o.append((rest[0] >> ((i - nk) * b)) & mask)
        rest = rest[1:]
    s_o = tuple(jnp.where(o >= T, jnp.int32(NONE_ORD), o.astype(jnp.int32))
                for o in s_o[:slots])
    s_t = []
    for i in range(0, slots, 2):
        a, bb = _unpack_bf16_pair(rest[i // 2])
        s_t.append(a)
        if i + 1 < slots:
            s_t.append(bb)
    return s_o, tuple(s_t), rest[-1]


def _tail_compact_cast(pack: PacketBVH, ori: Vec3, d: Vec3,
                       hit: HitRecord, resolved, tail_tm,
                       tail_prefix: int,
                       compact: str = "scatter") -> HitRecord:
    """Wide-kernel tail over the unresolved minority, returned in the
    CALLER's lane order. Compacts unresolved lanes to a dense prefix,
    casts a static prefix, and scatters the winners back; overflow falls
    back to a full-pool cast in place (lax.cond).

    compact="scatter" (default): cumsum destinations + ONE int32 index
    scatter + P-sized gathers of the 8 ray planes — the pool-wide work is
    a single scatter instead of the 9-operand full-pool lax.sort of
    compact="sort" (kept for A/B; lane order inside the prefix is the
    pool order either way, preserving the caller's bin coherence)."""
    n = ori.x.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    unres = ~resolved
    n_unres = jnp.sum(unres.astype(jnp.int32))
    P = min(n, tail_prefix or max(16384, n // 32))

    def prefix_cast_scatter(_):
        # destination slot per unresolved lane, in pool order; resolved
        # lanes target the sentinel row P (sliced off). Overflow slots
        # (dst > P under the cond's n_unres <= P guard can't happen, but
        # the branch still traces) drop.
        dst = jnp.where(unres, jnp.cumsum(unres.astype(jnp.int32)) - 1, P)
        tail_idx = jnp.zeros((P + 1,), jnp.int32).at[dst].set(
            pos, mode="drop")
        ti = tail_idx[:P]
        live_slot = jnp.arange(P, dtype=jnp.int32) < n_unres
        g = lambda a: jnp.take(a, ti)
        # unfilled slots alias lane 0 — kill them via t_max <= 0
        tm_g = jnp.where(live_slot, g(tail_tm), 0.0)
        th = packet_closest_hit_wide(
            pack, Vec3(g(ori.x), g(ori.y), g(ori.z)),
            Vec3(g(d.x), g(d.y), g(d.z)), tm_g, t_cull=True)
        win = (th.tri >= 0) & live_slot
        # only winners write (unfilled slots alias lane 0 — a plain
        # write-back would race lane 0's real winner on duplicate indices)
        ti_w = jnp.where(win, ti, n)
        merge = lambda cur, new: cur.at[ti_w].set(new, mode="drop")
        return (merge(hit.t, th.t), merge(hit.tri, th.tri),
                merge(hit.u, th.u), merge(hit.v, th.v))

    def prefix_cast_sort(_):
        ckey = jnp.where(resolved, pos + n, pos)
        (_, ox2, oy2, oz2, dx2, dy2, dz2, tm2, pos2) = jax.lax.sort(
            (ckey, ori.x, ori.y, ori.z, d.x, d.y, d.z, tail_tm, pos),
            num_keys=1)
        h = lambda a: a[:P]
        th = packet_closest_hit_wide(
            pack, Vec3(h(ox2), h(oy2), h(oz2)),
            Vec3(h(dx2), h(dy2), h(dz2)), h(tm2), t_cull=True)
        pp = pos2[:P]
        win = th.tri >= 0
        merge = lambda cur, new: cur.at[pp].set(
            jnp.where(win, new, cur[pp]))
        return (merge(hit.t, th.t), merge(hit.tri, th.tri),
                merge(hit.u, th.u), merge(hit.v, th.v))

    prefix_cast = (prefix_cast_scatter if compact == "scatter"
                   else prefix_cast_sort)

    def full_cast(_):
        th = packet_closest_hit_wide(pack, ori, d, tail_tm, t_cull=True)
        win = th.tri >= 0
        return (jnp.where(win, th.t, hit.t),
                jnp.where(win, th.tri, hit.tri),
                jnp.where(win, th.u, hit.u),
                jnp.where(win, th.v, hit.v))

    tt, ttri, tu, tv = jax.lax.cond(n_unres <= P, prefix_cast, full_cast,
                                    operand=None)
    return HitRecord(t=tt, tri=ttri, u=tu, v=tv)


# ---------------------------------------------------------------------------
# Cascade sweep: the round-4 union-width attack. The bin sort makes a
# 128-lane block agree on slots 0-1 (they ARE the sort key), but slots
# 2-3 diverge lane-by-lane — measured block unions of 14-19 treelets
# where slots 0-1 alone need ~2-4 (BENCHMARKS §4d). Phase 1 sweeps ONLY
# the key-coherent slots; the unresolved minority is compacted to a
# dense prefix, re-sorted by (slot3, slot2, octant) — so phase 2's
# blocks agree on THEIR slots too — and swept again. Unlike the global
# treelet re-binning that measured negative (§4c), the phase-2
# population is a compacted fraction with an exact, scan-bounded
# candidate list, not a re-traversal whose union regrows.
#
# The three phases are separate functions because the phase-2 sort must
# be its OWN dispatch on TPU (fusing a multi-operand lax.sort with any
# Pallas stage never finishes the backend compile — §4d compiler rule);
# sweep_cast_sorted(cascade=True) fuses them for tests / CPU use.
# ---------------------------------------------------------------------------


def _cascade_prefix(n: int, frac: float) -> int:
    """Static phase-2 prefix size: frac of the pool, tile-aligned."""
    return min(n, max(1024, -(-int(n * frac) // 1024) * 1024))


def cascade_phase1(sweep: SweepTables, ori: Vec3, d: Vec3,
                   t_max: jnp.ndarray, s_o, s_t, thr, prefix: int,
                   unroll: int = 4, groups: bool = False):
    """Phase 1: demand-sweep the two key-coherent candidate slots, then
    compact the unresolved lanes into a dense prefix for phase 2.

    A lane resolves in phase 1 iff its best hit precedes every candidate
    the sweep did not cover: slots >= 2 (entry >= s_t[2], ascending) and
    the uncaptured bound thr. bf16-truncated entry-t (packed seed) only
    shrinks s_t[2], making the test conservative — sound.

    Returns (hit1, resolved1, bundle) where bundle = (key2, ox..dz, tm2,
    rest ordinals, rest entries, ti) at the static prefix size plus the
    unresolved count — ready for cascade_sort. Lanes past the prefix
    (overflow) stay unresolved and fall to the wide tail's own fallback."""
    n = ori.x.shape[0]
    nslots = len(s_o)
    assert nslots > 2, "cascade needs > 2 candidate slots"
    hit1 = sweep8_closest_hit(sweep, ori, d, t_max,
                              (s_o[0], s_o[1]), (s_t[0], s_t[1]),
                              unroll_chunks=unroll, use_groups=groups)
    best1 = jnp.where(hit1.tri >= 0, hit1.t, FLT_MAX)
    bound = jnp.minimum(s_t[2], thr)
    resolved1 = (bound >= _INF) | (best1 <= bound)

    pos = jnp.arange(n, dtype=jnp.int32)
    unres = ~resolved1
    n_unres = jnp.sum(unres.astype(jnp.int32))
    P = prefix
    dst = jnp.where(unres, jnp.cumsum(unres.astype(jnp.int32)) - 1, P)
    ti = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.minimum(dst, P)].set(pos, mode="drop")[:P]
    live_slot = jnp.arange(P, dtype=jnp.int32) < jnp.minimum(n_unres, P)
    g = lambda a: jnp.take(a, ti)
    # phase-2 budget: the lane's current best caps any useful hit; dead
    # (unfilled alias-lane-0) slots are killed outright
    tm2 = jnp.where(live_slot, g(jnp.minimum(best1, t_max)), 0.0)
    d2 = Vec3(g(d.x), g(d.y), g(d.z))
    # unfilled slots (alias lane 0) sort to the END as dense dead blocks
    # instead of diluting live blocks with their aliased key
    key2 = jnp.where(
        live_slot,
        bin_key(tuple(g(s_o[i]) for i in range(2, nslots)), d2,
                sweep.num_treelets, nslots - 2),
        jnp.int32(1 << 30))
    bundle = (key2, g(ori.x), g(ori.y), g(ori.z), d2.x, d2.y, d2.z, tm2,
              *(g(s_o[i]) for i in range(2, nslots)),
              *(g(s_t[i]) for i in range(2, nslots)), ti)
    return hit1, resolved1, bundle, n_unres


def cascade_sort(bundle):
    """Phase-2 bin sort: key = (slot3, slot2, octant) over the compacted
    prefix. Dispatch this as its OWN program on TPU (compiler rule)."""
    return jax.lax.sort(bundle, num_keys=1)


def cascade_phase2(pack: PacketBVH, sweep: SweepTables, ori: Vec3, d: Vec3,
                   t_max: jnp.ndarray, thr, hit1: HitRecord, resolved1,
                   sorted_bundle, nslots: int,
                   tail: bool = True, tail_prefix: int = 0,
                   unroll: int = 4, tail_compact: str = "scatter",
                   groups: bool = False) -> HitRecord:
    """Phase 2: demand-sweep the re-binned rest slots over the compacted
    prefix, scatter winners back, resolve exactly, and finish with the
    compacted wide tail. ori/d/t_max/thr are the FULL pool planes (the
    caller's lane order); returns hits in that order. Slot liveness is
    self-contained (tm2 > 0), so phase 1's n_unres is diagnostic only."""
    (_, ox, oy, oz, dx, dy, dz, tm2) = sorted_bundle[:8]
    rest = sorted_bundle[8:]
    n_rest = nslots - 2
    so2 = tuple(rest[:n_rest])
    st2 = tuple(rest[n_rest:2 * n_rest])
    ti = rest[2 * n_rest]
    n = ori.x.shape[0]
    P = ti.shape[0]

    hit2 = sweep8_closest_hit(sweep, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                              tm2, so2, st2, unroll_chunks=unroll,
                              use_groups=groups)
    live_slot = tm2 > 0.0
    win2 = (hit2.tri >= 0) & live_slot
    # only winners write back (dead slots alias lane 0 post-sort too)
    ti_w = jnp.where(win2, ti, n)
    merge = lambda cur, new: cur.at[ti_w].set(new, mode="drop")
    hit = HitRecord(t=merge(hit1.t, hit2.t),
                    tri=merge(hit1.tri, hit2.tri),
                    u=merge(hit1.u, hit2.u), v=merge(hit1.v, hit2.v))
    # lanes whose rest-slots were actually swept (in the prefix) are now
    # exact up to thr; overflow lanes stay unresolved for the tail
    ti_c = jnp.where(live_slot, ti, n)
    completed = jnp.zeros((n,), bool).at[ti_c].set(True, mode="drop")
    best = jnp.where(hit.tri >= 0, hit.t, FLT_MAX)
    resolved = resolved1 | (completed & ((thr >= _INF) | (best <= thr)))
    if tail:
        tail_tm = jnp.where(resolved, 0.0, jnp.minimum(best, t_max))
        return _tail_compact_cast(pack, ori, d, hit, resolved, tail_tm,
                                  tail_prefix, compact=tail_compact)
    return HitRecord(t=jnp.where(resolved, hit.t, FLT_MAX),
                     tri=jnp.where(resolved, hit.tri, -1),
                     u=hit.u, v=hit.v)


@functools.partial(jax.jit,
                   static_argnames=("tail", "kernel", "tail_prefix",
                                    "unroll", "tail_compact", "groups",
                                    "cascade", "cascade_frac"))
def sweep_cast_sorted(pack: PacketBVH, sweep: SweepTables, ori: Vec3,
                      d: Vec3, t_max: jnp.ndarray, s_o, s_t, thr,
                      tail: bool = True, kernel: str = "sublane",
                      tail_prefix: int = 0, unroll: int = 4,
                      tail_compact: str = "scatter",
                      groups: bool = False, cascade: bool = False,
                      cascade_frac: float = 0.5) -> HitRecord:
    """Demand sweep + resolution + compacted tail over a pool that is
    ALREADY sorted by bin_key (same-ordinal lanes adjacent — required
    for performance, not correctness). s_o/s_t are tuples of candidate
    slot planes, thr the scan's uncaptured-candidate bound (all in the
    pool's lane order, e.g. carried through the pool sort as operands).
    Returns hits in the given lane order; dead lanes (t_max <= 0)
    return tri = -1. cascade=True runs the two-phase cascade (see
    cascade_phase1) fused in one program — fine on CPU and for tests;
    TPU callers must dispatch the phases separately (wavefront.py)."""
    if cascade and len(s_o) > 2 and kernel == "sublane":
        P = _cascade_prefix(ori.x.shape[0], cascade_frac)
        hit1, resolved1, bundle, _ = cascade_phase1(
            sweep, ori, d, t_max, s_o, s_t, thr, P, unroll=unroll,
            groups=groups)
        return cascade_phase2(pack, sweep, ori, d, t_max, thr, hit1,
                              resolved1, cascade_sort(bundle),
                              len(s_o), tail=tail, tail_prefix=tail_prefix,
                              unroll=unroll, tail_compact=tail_compact,
                              groups=groups)
    if kernel == "sublane":
        # unroll must divide the table's chunk_align (asserted inside);
        # unroll >= max_chunks takes the kernel's static one-trip path
        hit = sweep8_closest_hit(sweep, ori, d, t_max, tuple(s_o),
                                 tuple(s_t), unroll_chunks=unroll,
                                 use_groups=groups)
    else:
        hit = sweep_closest_hit(sweep, ori, d, t_max, tuple(s_o),
                                tuple(s_t))
    best = jnp.where(hit.tri >= 0, hit.t, FLT_MAX)
    resolved = (thr >= _INF) | (best <= thr)
    if tail:
        tail_tm = jnp.where(resolved, 0.0, jnp.minimum(best, t_max))
        return _tail_compact_cast(pack, ori, d, hit, resolved, tail_tm,
                                  tail_prefix, compact=tail_compact)
    # sound-subset contract: an unresolved lane's sweep best may not be
    # the global closest — report it as a miss instead of a hit
    return HitRecord(t=jnp.where(resolved, hit.t, FLT_MAX),
                     tri=jnp.where(resolved, hit.tri, -1),
                     u=hit.u, v=hit.v)


@functools.partial(jax.jit,
                   static_argnames=("slots", "kernel", "tail_prefix",
                                    "unroll", "group", "node_pops",
                                    "cluster_pops", "groups"))
def sweep_any_hit(pack: PacketBVH, sweep: SweepTables, ori: Vec3, d: Vec3,
                  t_max: jnp.ndarray, slots: int = 4,
                  kernel: str = "sublane", tail_prefix: int = 0,
                  unroll: int = 4, group: int = 2, node_pops: int = 4,
                  cluster_pops: int = 4, groups: bool = False) -> jnp.ndarray:
    """Occlusion query via the sweep pipeline: True where the segment
    [EPS, t_max - 1e-3) is blocked (the brute/packet any-hit contract).
    Dead lanes (t_max <= 0) return False.

    No bin sort: shadow pools inherit the extension sort's coherence
    (origins are the cell-sorted hit points, wavefront.py TraceShadowRay),
    so the demand sweep runs in the caller's lane order — saving the
    ~40 ms/2M sort the closest-hit pipeline pays. The kernel's any_hit
    mode demand-drops ALL remaining slots the moment a lane is occluded,
    so blocks whose lanes resolve early stop sweeping.

    Resolution rule: a lane is exact when it is occluded, or when
    thr >= t_max - 1e-3 (every uncaptured candidate treelet's entry lies
    at or beyond the endpoint margin, so nothing there can occlude; a
    slot demand-dropped at budget bt can only hold t >= bt, and an
    unoccluded lane's bt is >= t_max - 1e-3 by definition). The rest are
    compacted to a dense prefix and finished by the wide packet any-hit
    kernel (overflow: full-pool fallback under lax.cond)."""
    n = ori.x.shape[0]
    s_t, s_o, thr = dense_scan(sweep, ori, d, t_max, slots=slots)
    if kernel == "sublane":
        hit = sweep8_closest_hit(sweep, ori, d, t_max, tuple(s_o),
                                 tuple(s_t), unroll_chunks=unroll,
                                 any_hit=True, use_groups=groups)
    else:
        hit = sweep_closest_hit(sweep, ori, d, t_max, tuple(s_o),
                                tuple(s_t), any_hit=True)
    live = t_max > 0
    occ = live & (hit.tri >= 0) & (hit.t < t_max - 1e-3)
    resolved = occ | (thr >= t_max - 1e-3) | ~live

    pos = jnp.arange(n, dtype=jnp.int32)
    unres = ~resolved
    n_unres = jnp.sum(unres.astype(jnp.int32))
    P = min(n, tail_prefix or max(16384, n // 32))
    wide_knobs = dict(group=group, node_pops=node_pops,
                      cluster_pops=cluster_pops)

    def prefix_any(_):
        dst = jnp.where(unres, jnp.cumsum(unres.astype(jnp.int32)) - 1, P)
        tail_idx = jnp.zeros((P + 1,), jnp.int32).at[dst].set(
            pos, mode="drop")
        ti = tail_idx[:P]
        live_slot = jnp.arange(P, dtype=jnp.int32) < n_unres
        g = lambda a: jnp.take(a, ti)
        # unfilled slots alias lane 0 — kill via t_max <= 0
        tm_g = jnp.where(live_slot, g(t_max), 0.0)
        to = packet_any_hit_wide(
            pack, Vec3(g(ori.x), g(ori.y), g(ori.z)),
            Vec3(g(d.x), g(d.y), g(d.z)), tm_g, **wide_knobs)
        win = to & live_slot
        ti_w = jnp.where(win, ti, n)  # only occluded slots write back
        return occ.at[ti_w].set(True, mode="drop")

    def full_any(_):
        to = packet_any_hit_wide(pack, ori, d,
                                 jnp.where(resolved, 0.0, t_max),
                                 **wide_knobs)
        # the wide kernel reports t_max<=1e-3 lanes as occluded (its
        # packet early-exit convention, pallas_traverse.py occ0) — mask
        # the killed lanes back out
        return occ | (to & ~resolved)

    return jax.lax.cond(n_unres <= P, prefix_any, full_any, operand=None)


@functools.partial(jax.jit,
                   static_argnames=("slots", "tail", "kernel", "tail_prefix",
                                    "unroll", "tail_compact", "key_slots",
                                    "groups", "cascade", "cascade_frac"))
def sweep_cast(pack: PacketBVH, sweep: SweepTables, ori: Vec3, d: Vec3,
               t_max: jnp.ndarray, slots: int = 4,
               tail: bool = True, kernel: str = "sublane",
               tail_prefix: int = 0, unroll: int = 4,
               tail_compact: str = "scatter",
               key_slots: int = 2, groups: bool = False,
               cascade: bool = False,
               cascade_frac: float = 0.5) -> HitRecord:
    """Exact closest hit (bit-matches brute force up to equal-t ties) for
    an unsorted ray population; dead lanes (t_max <= 0) return tri=-1.
    kernel: "sublane" (sweep8: 128-ray blocks, 8 tris/VPU-op) or "lane"
    (1024-ray blocks, one tri/op). key_slots=3 uses the 2-key bin sort
    ((slot1, slot0), (slot2, octant)) — see bin_key2."""
    n = ori.x.shape[0]
    s_t, s_o, thr = dense_scan(sweep, ori, d, t_max, slots=slots)

    # --- bin sort: key = (slot1, slot0, octant), compact ----------------
    T = sweep.num_treelets
    two_key = key_slots >= 3 and slots > 2
    keys = (bin_key(s_o, d, T, slots, with_octant=not two_key),)
    if two_key:
        keys = keys + (bin_key2(s_o, d, T, slots),)
    nk = len(keys)
    idx = jnp.arange(n, dtype=jnp.int32)
    ops = (*keys, ori.x, ori.y, ori.z, d.x, d.y, d.z, t_max,
           *(s_o[i] for i in range(slots)),
           *(s_t[i] for i in range(slots)), thr, idx)
    ops = jax.lax.sort(ops, num_keys=nk)
    (ox, oy, oz, dx, dy, dz, tm) = ops[nk:nk + 7]
    so = ops[nk + 7:nk + 7 + slots]
    st = ops[nk + 7 + slots:nk + 7 + 2 * slots]
    thr_s = ops[nk + 7 + 2 * slots]
    idx_s = ops[nk + 8 + 2 * slots]
    ori_s = Vec3(ox, oy, oz)
    d_s = Vec3(dx, dy, dz)

    hit = sweep_cast_sorted(pack, sweep, ori_s, d_s, tm, so, st, thr_s,
                            tail=tail, kernel=kernel,
                            tail_prefix=tail_prefix, unroll=unroll,
                            tail_compact=tail_compact, groups=groups,
                            cascade=cascade, cascade_frac=cascade_frac)

    # --- unsort ---------------------------------------------------------
    _, t, tri, u, v = jax.lax.sort(
        (idx_s, hit.t, hit.tri, hit.u, hit.v), num_keys=1)
    return HitRecord(t=t, tri=tri, u=u, v=v)
