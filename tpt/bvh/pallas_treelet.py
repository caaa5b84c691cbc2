"""Self-rebinning treelet traversal kernel — packet-level MIMD over
subtrees, the round-3 answer to the extension-cast bottleneck.

Problem (BENCHMARKS.md §4): the wide packet kernel charges all 2048 lanes
of a super-packet for the packet's node-visit UNION; for incoherent bounce
rays that union approaches the whole tree (sorted bounce rays 3.2 Mrays/s
vs 12 coherent). The reference's per-ray MIMD loop
(/root/reference/src/kernels/ray_cast.cu:12-122) pays per-ray visit sets.

docs/ROADMAP_traversal.md costed a sort/scatter re-binning pipeline at
~400-500 ms/frame, dominated by the XLA sort/scatter primitives, and named
a native binning primitive as the unlock. This kernel goes one step
further: the re-binning never leaves the packet. Per round:

1. SCAN: traverse the small top tree (bvh/treelet.py) once; each lane
   keeps the S lexicographically-nearest (entry_t, code) treelet
   candidates beyond its threshold in per-lane slot planes (insertion by
   dense compare-swap cascade — no sort, no scatter).
2. DRAIN: pick the packet-global nearest requested treelet (two
   min-reduces), traverse that subtree ONCE with the ordinary wide-node
   machinery — every lane gets its hits tested (extra hits from
   non-requesting lanes are exact and free) — and remove the consumed
   slot.
3. Lanes that exhaust their slots with overflow re-enter SCAN with the
   threshold advanced to the last emitted candidate (the roadmap's
   "re-enter phase 1 with a skip count"); lanes whose next candidate
   entry lies beyond their best hit are resolved and go dense-dead.

The per-visit dense cost then scales with per-treelet unions (the packet
traverses each requested subtree once) instead of the whole-tree union,
while staying ONE pallas_call per bounce — no extra lax.sorts, no
scatters, no host round-trips (an 8M-pair sort alone would cost ~140 ms,
ROADMAP table).

Tables: subtree traversal reuses the PacketBVH node/tri tables unchanged;
the top tree is the ~Ntreelets/arity rows above the cut (PacketBVH.top_*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import Vec3
from ..integrators.intersect import FLT_MAX, HitRecord
from .pack import PacketBVH
from .pallas_traverse import (
    LANES,
    SUBLANES,
    _children_any_hit,
    _interpret,
    _mt_scalar_tri,
    _packet_octant,
    _safe_inv,
    _select_order_word,
    _slab,
    _tile_rays_grouped,
    _tri_getter,
    CSTACK_DEPTH,
    NSTACK_DEPTH,
)

_INF = 3.0e38
NONE_CODE = 0x7FFFFFFF  # empty slot sentinel (int32 max)
INT_MIN = -0x80000000


def _lex_lt(t_a, c_a, t_b, c_b):
    """(t, code) lexicographic less-than, dense."""
    return (t_a < t_b) | ((t_a == t_b) & (c_a < c_b))


def _make_kernel_treelet(num_nodes: int, num_top: int, k_cluster: int,
                         nstack_depth: int, cstack_depth: int,
                         tri_rows: int, arity: int, slots: int,
                         node_pops: int, cluster_pops: int,
                         rows: int, max_rounds: int, seeded: bool = False):
    A = arity
    S = slots

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, child_ref, tri_ref, top_ref, topc_ref, tref_ref,
               *rest):
        if seeded:
            seedt_ref, seedc_ref, exh_ref = rest[0], rest[1], rest[2]
            rest = rest[3:]
        bt_out, btri_out, bu_out, bv_out, nstack, cstack = rest
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        tm = tmax_ref[0]
        ix = _safe_inv(dx)
        iy = _safe_inv(dy)
        iz = _safe_inv(dz)
        oct_idx = _packet_octant(dx, dy, dz)

        zeros = jnp.zeros((rows, LANES), jnp.float32)
        neg1 = jnp.full((rows, LANES), -1, jnp.int32)
        inf = jnp.full((rows, LANES), _INF, jnp.float32)
        none = jnp.full((rows, LANES), NONE_CODE, jnp.int32)

        max_steps = 8 * num_nodes + 8192
        cmargin = cstack_depth - node_pops * A - 1

        # ------------------------------------------------------------------
        # SCAN round: top-tree traversal filling per-lane candidate slots
        # ------------------------------------------------------------------
        def scan_round(c):
            (bt, btri, bu, bv, s_t, s_c, thr_t, thr_c, exhausted) = c
            s_t = list(s_t)
            s_c = list(s_c)
            # lanes needing candidates: slots empty, not exhausted, and the
            # last emitted key still precedes the current best hit
            scan_mask = ((s_c[0] == NONE_CODE) & (exhausted == 0)
                         & (thr_t < bt))
            overflow = jnp.zeros((rows, LANES), jnp.int32)

            nstack[0] = jnp.int32(0)  # top root

            def cond(st):
                step, sp = st[0], st[1]
                return (sp > 0) & (step < 8 * num_top + 1024)

            def body(st):
                step, sp = st[0], st[1]
                s_t = list(st[2:2 + S])
                s_c = list(st[2 + S:2 + 2 * S])
                ovf = st[2 + 2 * S]
                for _ in range(node_pops):
                    has = sp > 0
                    code = jnp.where(has, nstack[jnp.maximum(sp - 1, 0)],
                                     jnp.int32(-1))
                    sp = jnp.where(has, sp - 1, sp)
                    nid = jnp.clip(code, 0, num_top - 1)
                    row = top_ref[pl.ds(nid, 1), :]
                    crow = topc_ref[pl.ds(nid, 1), :]
                    trow = tref_ref[pl.ds(nid, 1), :]
                    ordw = _select_order_word(crow, oct_idx)
                    valid_pop = code >= 0
                    # slab at the FULL per-lane bt limit; the slot-window
                    # prune (tn <= worst kept slot) is applied separately so
                    # anything it excludes can set the overflow flag — a
                    # silently-pruned candidate beyond the window would
                    # otherwise mark the lane exhausted and lose real hits
                    # (found by the Cornell bounce-ray cross-backend test)
                    limit = jnp.where(scan_mask, bt, -1.0)
                    codes, anyh = [], []
                    for s in range(A):
                        hit_s, tn_s = _slab(row, 6 * s, ox, oy, oz,
                                            ix, iy, iz, limit)
                        kept_s = tn_s <= s_t[S - 1]
                        child_id = crow[0, s]
                        is_internal = child_id >= 0
                        # treelet-ref slot: insert (tn, tref code) into the
                        # lane's ascending slot list (compare-swap cascade)
                        tcode = trow[0, s]
                        cand = (hit_s & (tn_s < bt) & scan_mask
                                & jnp.logical_not(is_internal) & valid_pop
                                & ((tn_s > thr_t)
                                   | ((tn_s == thr_t) & (tcode > thr_c))))
                        valid = cand & kept_s
                        ovf = ovf | (cand & ~kept_s).astype(jnp.int32)
                        # subtree pruned by the slot window: conservative
                        # overflow (it may hide candidates for this lane)
                        ovf = ovf | (hit_s & ~kept_s & scan_mask & valid_pop
                                     & is_internal).astype(jnp.int32)
                        cur_t = jnp.where(valid, tn_s, _INF)
                        cur_c = jnp.where(valid, tcode, NONE_CODE)
                        for i in range(S):
                            swap = _lex_lt(cur_t, cur_c, s_t[i], s_c[i])
                            s_t[i], cur_t = (jnp.where(swap, cur_t, s_t[i]),
                                             jnp.where(swap, s_t[i], cur_t))
                            s_c[i], cur_c = (jnp.where(swap, cur_c, s_c[i]),
                                             jnp.where(swap, s_c[i], cur_c))
                        ovf = ovf | (cur_c != NONE_CODE).astype(jnp.int32)
                        codes.append(child_id)
                        anyh.append(hit_s & kept_s & is_internal & valid_pop)
                    any_scalar = _children_any_hit(anyh)
                    # push internal children far-to-near per octant order
                    for pos in range(A - 1, -1, -1):
                        slot = (ordw >> (4 * pos)) & 15
                        csel = jnp.int32(-1)
                        hsel = False
                        for s in range(A):
                            is_s = slot == s
                            csel = jnp.where(is_s, codes[s], csel)
                            hsel = jnp.logical_or(
                                jnp.logical_and(is_s, any_scalar[s]), hsel)
                        do_push = hsel & (csel >= 0) & (sp < nstack_depth)

                        @pl.when(do_push)
                        def _(csel=csel, sp=sp):
                            nstack[sp] = csel

                        sp = sp + do_push.astype(jnp.int32)
                return (step + 1, sp, *s_t, *s_c, ovf)

            init = (jnp.int32(0), jnp.int32(1), *s_t, *s_c, overflow)
            fin = jax.lax.while_loop(cond, body, init)
            s_t = list(fin[2:2 + S])
            s_c = list(fin[2 + S:2 + 2 * S])
            overflow = fin[2 + 2 * S]

            # threshold advances to the last emitted candidate (full lists
            # only — short lists mean the scan was exhaustive)
            full = s_c[S - 1] != NONE_CODE
            thr_t = jnp.where(scan_mask & full, s_t[S - 1], thr_t)
            thr_c = jnp.where(scan_mask & full, s_c[S - 1], thr_c)
            exhausted = jnp.where(scan_mask, 1 - overflow, exhausted)
            return (bt, btri, bu, bv, tuple(s_t), tuple(s_c),
                    thr_t, thr_c, exhausted)

        # ------------------------------------------------------------------
        # DRAIN round: traverse the packet-nearest requested treelet
        # ------------------------------------------------------------------
        def drain_round(c):
            (bt, btri, bu, bv, s_t, s_c, thr_t, thr_c, exhausted) = c
            s_t = list(s_t)
            s_c = list(s_c)
            valid0 = (s_c[0] != NONE_CODE) & (s_t[0] < bt)
            min_t = jnp.min(jnp.where(valid0, s_t[0], _INF))
            root = jnp.min(jnp.where(valid0 & (s_t[0] == min_t), s_c[0],
                                     NONE_CODE))

            @pl.when(root >= 0)
            def _():
                nstack[0] = root

            @pl.when(root < 0)
            def _():
                cstack[0] = -(root + 1)

            nsp0 = (root >= 0).astype(jnp.int32)
            csp0 = (root < 0).astype(jnp.int32)

            def cond(st):
                step, nsp, csp = st[0], st[1], st[2]
                return ((nsp > 0) | (csp > 0)) & (step < max_steps)

            def body(st):
                step, nsp, csp, bt, btri, bu, bv = st
                allow_nodes = csp < cmargin
                ncodes = []
                for _ in range(node_pops):
                    has = (nsp > 0) & allow_nodes
                    ncodes.append(jnp.where(
                        has, nstack[jnp.maximum(nsp - 1, 0)], jnp.int32(-1)))
                    nsp = jnp.where(has, nsp - 1, nsp)
                cvals = []
                for _ in range(cluster_pops):
                    chas = csp > 0
                    cvals.append(jnp.where(
                        chas, cstack[jnp.maximum(csp - 1, 0)], jnp.int32(0)))
                    csp = jnp.maximum(csp - 1, 0)
                for cval in cvals:
                    start = jnp.clip(cval // 256, 0, tri_rows - k_cluster)
                    count = cval % 256
                    get = _tri_getter(tri_ref[pl.ds(start, k_cluster), :],
                                      False)
                    for j in range(k_cluster):
                        t, u, v, hitg = _mt_scalar_tri(
                            get, j, ox, oy, oz, dx, dy, dz)
                        hit = hitg & (j < count) & (t < bt)
                        tri_id = get(j, 9).astype(jnp.int32)
                        bt = jnp.where(hit, t, bt)
                        btri = jnp.where(hit, tri_id, btri)
                        bu = jnp.where(hit, u, bu)
                        bv = jnp.where(hit, v, bv)
                for c_node in ncodes:
                    valid_pop = c_node >= 0
                    nid = jnp.clip(c_node, 0, num_nodes - 1)
                    row = nodes_ref[pl.ds(nid, 1), :]
                    crow = child_ref[pl.ds(nid, 1), :]
                    ordw = _select_order_word(crow, oct_idx)
                    hits, codes = [], []
                    for s in range(A):
                        hit_s, _ = _slab(row, 6 * s, ox, oy, oz,
                                         ix, iy, iz, bt)
                        hits.append(hit_s & valid_pop)
                        codes.append(crow[0, s])
                    anyh = _children_any_hit(hits)
                    for pos in range(A - 1, -1, -1):
                        slot = (ordw >> (4 * pos)) & 15
                        csel = jnp.int32(-1)
                        hsel = False
                        for s in range(A):
                            is_s = slot == s
                            csel = jnp.where(is_s, codes[s], csel)
                            hsel = jnp.logical_or(
                                jnp.logical_and(is_s, anyh[s]), hsel)
                        is_node = hsel & (csel >= 0) & (nsp < nstack_depth)
                        cpush = -(csel + 1)
                        is_clus = hsel & (csel < 0) & (cpush > 0) & (
                            csp < cstack_depth)

                        @pl.when(is_node)
                        def _(csel=csel, nsp=nsp):
                            nstack[nsp] = csel

                        nsp = nsp + is_node.astype(jnp.int32)

                        @pl.when(is_clus)
                        def _(cpush=cpush, csp=csp):
                            cstack[csp] = cpush

                        csp = csp + is_clus.astype(jnp.int32)
                return (step + 1, nsp, csp, bt, btri, bu, bv)

            fin = jax.lax.while_loop(
                cond, body, (jnp.int32(0), nsp0, csp0, bt, btri, bu, bv))
            bt, btri, bu, bv = fin[3], fin[4], fin[5], fin[6]

            # consume the drained slot (at most one per lane matches): from
            # the match position on, every slot pulls its successor up
            s_t2, s_c2 = list(s_t), list(s_c)
            shifted = jnp.zeros((rows, LANES), jnp.bool_)
            for i in range(S):
                shifted = shifted | (s_c[i] == root)
                nt_i = s_t[i + 1] if i + 1 < S else inf
                nc_i = s_c[i + 1] if i + 1 < S else none
                s_t2[i] = jnp.where(shifted, nt_i, s_t[i])
                s_c2[i] = jnp.where(shifted, nc_i, s_c[i])
            return (bt, btri, bu, bv, tuple(s_t2), tuple(s_c2),
                    thr_t, thr_c, exhausted)

        # ------------------------------------------------------------------
        # round loop
        # ------------------------------------------------------------------
        MODE_SCAN = 0

        def outer_cond(c):
            step, done = c[0], c[1]
            return (done == 0) & (step < max_rounds)

        def outer_body(c):
            step, done, mode = c[0], c[1], c[2]
            state = c[3:]
            s_t_flat = state[4:4 + S]
            s_c_flat = state[4 + S:4 + 2 * S]
            packed = (state[0], state[1], state[2], state[3],
                      tuple(s_t_flat), tuple(s_c_flat),
                      state[4 + 2 * S], state[5 + 2 * S], state[6 + 2 * S])
            out = jax.lax.cond(mode == MODE_SCAN, scan_round, drain_round,
                               packed)
            (bt, btri, bu, bv, s_t, s_c, thr_t, thr_c, exhausted) = out
            any_slot = jnp.max(jnp.where(
                (s_c[0] != NONE_CODE) & (s_t[0] < bt), 1, 0))
            need_scan = jnp.max(jnp.where(
                (s_c[0] == NONE_CODE) & (exhausted == 0) & (thr_t < bt),
                1, 0))
            done = jnp.where((any_slot == 0) & (need_scan == 0),
                             jnp.int32(1), jnp.int32(0))
            mode = jnp.where(any_slot > 0, jnp.int32(1), jnp.int32(0))
            return (step + 1, done, mode, bt, btri, bu, bv,
                    *s_t, *s_c, thr_t, thr_c, exhausted)

        bt0 = jnp.minimum(tm, _INF)
        if seeded:
            # slot 0 arrives from the phase-1 scan over the unsorted pool
            # (wavefront plumbs it through the coherence sort); the
            # threshold starts AT the seed — phase 1 emitted the lex-min
            # candidate, so every other candidate lies beyond it
            seed_t = seedt_ref[0]
            seed_c = seedc_ref[0]
            exh0 = exh_ref[0]
            valid_seed = (seed_c != NONE_CODE) & (seed_t < bt0)
            s_t0 = [jnp.where(valid_seed, seed_t, _INF)]
            s_c0 = [jnp.where(valid_seed, seed_c, NONE_CODE)]
            s_t0 += [inf for _ in range(S - 1)]
            s_c0 += [none for _ in range(S - 1)]
            thr_t0 = jnp.where(valid_seed, seed_t, -_INF)
            thr_c0 = jnp.where(valid_seed, seed_c, INT_MIN)
            any_slot0 = jnp.max(valid_seed.astype(jnp.int32))
            need_scan0 = jnp.max(jnp.where(
                ~valid_seed & (exh0 == 0) & (bt0 > 0.0), 1, 0))
            done0 = jnp.where((any_slot0 == 0) & (need_scan0 == 0),
                              jnp.int32(1), jnp.int32(0))
            mode0 = jnp.where(any_slot0 > 0, jnp.int32(1),
                              jnp.int32(MODE_SCAN))
        else:
            s_t0 = [inf for _ in range(S)]
            s_c0 = [none for _ in range(S)]
            thr_t0 = jnp.full((rows, LANES), -_INF, jnp.float32)
            thr_c0 = jnp.full((rows, LANES), INT_MIN, jnp.int32)
            exh0 = jnp.zeros((rows, LANES), jnp.int32)
            done0 = (jnp.max(bt0) <= 0.0).astype(jnp.int32)
            mode0 = jnp.int32(MODE_SCAN)
        init = (jnp.int32(0), done0, mode0, bt0, neg1, zeros, zeros)
        init += tuple(s_t0)
        init += tuple(s_c0)
        init += (thr_t0, thr_c0, exh0)
        fin = jax.lax.while_loop(outer_cond, outer_body, init)
        bt_out[0, :, :] = fin[3]
        btri_out[0, :, :] = fin[4]
        bu_out[0, :, :] = fin[5]
        bv_out[0, :, :] = fin[6]

    return kernel


def _make_kernel_scan(num_top: int, arity: int, node_pops: int, rows: int):
    """Phase-1-only kernel: traverse the top tree once and emit, per lane,
    the lexicographically nearest (entry_t, code) treelet candidate plus
    its dense ordinal (for the coherence-sort key) and an overflow flag
    (>= 2 candidates existed). The wavefront integrator sorts the pool by
    the ordinal so the main kernel's packets agree on their first drain —
    the global re-binning that packet-local slots cannot provide
    (measured: without it, a 2048-lane bounce packet demands nearly every
    treelet and the rounds degenerate to whole-tree work)."""
    A = arity

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               top_ref, topc_ref, tref_ref, tord_ref,
               st_out, sc_out, so_out, ovf_out, cnt_out, nstack):
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        bt = jnp.minimum(tmax_ref[0], _INF)
        ix = _safe_inv(dx)
        iy = _safe_inv(dy)
        iz = _safe_inv(dz)
        oct_idx = _packet_octant(dx, dy, dz)

        none = jnp.full((rows, LANES), NONE_CODE, jnp.int32)
        inf = jnp.full((rows, LANES), _INF, jnp.float32)
        zero_i = jnp.zeros((rows, LANES), jnp.int32)

        nstack[0] = jnp.int32(0)

        def cond(st):
            step, sp = st[0], st[1]
            return (sp > 0) & (step < 8 * num_top + 1024)

        def body(st):
            step, sp, s_t, s_c, s_o, ovf, cnt = st
            for _ in range(node_pops):
                has = sp > 0
                code = jnp.where(has, nstack[jnp.maximum(sp - 1, 0)],
                                 jnp.int32(-1))
                sp = jnp.where(has, sp - 1, sp)
                nid = jnp.clip(code, 0, num_top - 1)
                row = top_ref[pl.ds(nid, 1), :]
                crow = topc_ref[pl.ds(nid, 1), :]
                trow = tref_ref[pl.ds(nid, 1), :]
                orow = tord_ref[pl.ds(nid, 1), :]
                ordw = _select_order_word(crow, oct_idx)
                valid_pop = code >= 0
                # slab at the full bt limit; the nearest-only prune
                # (tn <= current best candidate) is applied separately so
                # every pruned candidate/subtree raises the overflow flag
                # (same silent-prune soundness fix as the main kernel)
                codes, anyh = [], []
                for s in range(A):
                    hit_s, tn_s = _slab(row, 6 * s, ox, oy, oz,
                                        ix, iy, iz, bt)
                    kept_s = tn_s <= s_t
                    child_id = crow[0, s]
                    is_internal = child_id >= 0
                    tcode = trow[0, s]
                    cand = (hit_s & (tn_s < bt) & valid_pop
                            & jnp.logical_not(is_internal))
                    valid = cand & kept_s
                    cnt = cnt + cand.astype(jnp.int32)
                    ovf = ovf | (cand & ~kept_s).astype(jnp.int32)
                    ovf = ovf | (hit_s & ~kept_s & valid_pop
                                 & is_internal).astype(jnp.int32)
                    cur_t = jnp.where(valid, tn_s, _INF)
                    cur_c = jnp.where(valid, tcode, NONE_CODE)
                    cur_o = jnp.where(valid, orow[0, s], 0)
                    swap = _lex_lt(cur_t, cur_c, s_t, s_c)
                    s_t, cur_t = (jnp.where(swap, cur_t, s_t),
                                  jnp.where(swap, s_t, cur_t))
                    s_c, cur_c2 = (jnp.where(swap, cur_c, s_c),
                                   jnp.where(swap, s_c, cur_c))
                    s_o = jnp.where(swap, cur_o, s_o)
                    ovf = ovf | (cur_c2 != NONE_CODE).astype(jnp.int32)
                    codes.append(child_id)
                    anyh.append(hit_s & kept_s & is_internal & valid_pop)
                any_scalar = _children_any_hit(anyh)
                for pos in range(A - 1, -1, -1):
                    slot = (ordw >> (4 * pos)) & 15
                    csel = jnp.int32(-1)
                    hsel = False
                    for s in range(A):
                        is_s = slot == s
                        csel = jnp.where(is_s, codes[s], csel)
                        hsel = jnp.logical_or(
                            jnp.logical_and(is_s, any_scalar[s]), hsel)
                    do_push = hsel & (csel >= 0) & (sp < 256)

                    @pl.when(do_push)
                    def _(csel=csel, sp=sp):
                        nstack[sp] = csel

                    sp = sp + do_push.astype(jnp.int32)
            return (step + 1, sp, s_t, s_c, s_o, ovf, cnt)

        fin = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), (jnp.max(bt) > 0.0).astype(jnp.int32),
             inf, none, zero_i, zero_i, zero_i))
        st_out[0, :, :] = fin[2]
        sc_out[0, :, :] = fin[3]
        so_out[0, :, :] = fin[4]
        ovf_out[0, :, :] = fin[5]
        cnt_out[0, :, :] = fin[6]

    return kernel


@functools.partial(jax.jit, static_argnames=("node_pops", "group"))
def treelet_scan(pack: PacketBVH, ori: Vec3, d: Vec3, t_max: jnp.ndarray,
                 node_pops: int = 4, group: int = 2):
    """Per-ray nearest-treelet candidate: (entry_t, code, ordinal,
    overflow, count) flat arrays. `count` is a lower bound on the ray's
    candidate treelets (subtrees pruned by the nearest-only window are
    not descended) — the hybrid easy/hard classifier. Dead lanes
    (t_max <= 0) emit NONE_CODE with overflow 0 (-> exhausted)."""
    assert pack.top_f32 is not None
    rows = SUBLANES * group
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays_grouped(ori, d, t_max,
                                                           group)
    kernel = _make_kernel_scan(pack.num_top, pack.arity, node_pops, rows)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
    ]
    st, sc, so, ovf, cnt = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 4,
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((258,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.top_f32, pack.top_child,
      pack.top_tref, pack.top_tord)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(st), flat(sc), flat(so), flat(ovf), flat(cnt)


# default knobs (shared heritage with the wide kernel; swept on v5e)
SLOTS = 4
MAX_ROUNDS = 4096


@functools.partial(jax.jit,
                   static_argnames=("stack_depth", "node_pops", "group",
                                    "cluster_pops", "slots", "max_rounds"))
def treelet_closest_hit(pack: PacketBVH, ori: Vec3, d: Vec3,
                        t_max: jnp.ndarray,
                        stack_depth: int = NSTACK_DEPTH,
                        node_pops: int = 4, group: int = 2,
                        cluster_pops: int = 4, slots: int = SLOTS,
                        max_rounds: int = MAX_ROUNDS,
                        seed=None) -> HitRecord:
    """`seed`: optional (seed_t, seed_code, overflow) flat arrays from
    treelet_scan, already permuted by the caller's coherence sort — the
    kernel then starts each lane at its phase-1 candidate instead of
    scanning, and packets agree on their first drains by construction."""
    assert pack.top_f32 is not None, (
        "BVH_TREELET requires treelet tables (bvh.treelet.attach_treelets)")
    assert not pack.stream_tris, "treelet kernel is VMEM-resident for now"
    rows = SUBLANES * group
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays_grouped(ori, d, t_max,
                                                           group)
    kernel = _make_kernel_treelet(
        pack.num_nodes, pack.num_top, pack.max_cluster, stack_depth,
        CSTACK_DEPTH, tri_rows=pack.tri_f32.shape[0], arity=pack.arity,
        slots=slots, node_pops=node_pops, cluster_pops=cluster_pops,
        rows=rows, max_rounds=max_rounds, seeded=seed is not None)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
    ]
    seed_ops = []
    seed_specs = []
    if seed is not None:
        st, sc, ovf = seed
        n_pad = nt * rows * LANES

        def pad3(v, fill):
            return jnp.pad(v, (0, n_pad - n),
                           constant_values=fill).reshape(nt, rows, LANES)

        # padded lanes: no candidate, exhausted
        seed_ops = [pad3(st, _INF), pad3(sc, NONE_CODE), pad3(1 - ovf, 1)]
        seed_specs = [ray_spec] * 3
    bt, btri, bu, bv = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 6 + seed_specs,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((stack_depth + 2,), jnp.int32),
                        pltpu.SMEM((CSTACK_DEPTH + 2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.node_f32, pack.node_child,
      pack.tri_f32, pack.top_f32, pack.top_child, pack.top_tref, *seed_ops)

    flat = lambda a: a.reshape(-1)[:n]
    bt = flat(bt)
    btri = flat(btri)
    return HitRecord(
        t=jnp.where(btri >= 0, bt, FLT_MAX),
        tri=btri,
        u=flat(bu),
        v=flat(bv),
    )


# ---------------------------------------------------------------------------
# Multi-slot scan: S nearest treelet candidates per ray (sweep-cast phase 1)
# ---------------------------------------------------------------------------

NONE_ORD = 0x7FFFFF  # matches bvh/pallas_sweep.NONE_ORD


def _make_kernel_scan_multi(num_top: int, arity: int, node_pops: int,
                            rows: int, S: int):
    """Phase-1-only kernel emitting, per lane, the S lexicographically
    nearest (entry_t, ordinal) treelet candidates plus thr_t — a lower
    bound on the entry t of EVERY candidate not captured in the slots
    (displaced inserts, window-pruned candidates, window-pruned internal
    subtrees). Soundness: after densely testing the slots' treelets, a
    lane whose best hit t satisfies t <= thr_t (or whose remaining slots
    are empty) cannot be beaten by any unexplored treelet — that is the
    sweep-cast resolution rule (bvh/sweepcast.py).

    Rank data that shaped S=4 (benchmarks/sweep_kernel.py, fireplace
    143k tris, mt=256): bounce-ray hits land at candidate rank <=1 for
    73.5%, <=2 for 94.6%; primaries almost never resolve at rank 0 (the
    origin sits inside boxes it passes through)."""
    A = arity

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               top_ref, topc_ref, tref_ref, tord_ref, *outs):
        nstack = outs[-1]
        st_outs = outs[:S]
        so_outs = outs[S:2 * S]
        thr_out = outs[2 * S]
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        bt = jnp.minimum(tmax_ref[0], _INF)
        ix = _safe_inv(dx)
        iy = _safe_inv(dy)
        iz = _safe_inv(dz)
        oct_idx = _packet_octant(dx, dy, dz)

        none_o = jnp.full((rows, LANES), NONE_ORD, jnp.int32)
        inf = jnp.full((rows, LANES), _INF, jnp.float32)

        nstack[0] = jnp.int32(0)

        def cond(st):
            step, sp = st[0], st[1]
            return (sp > 0) & (step < 8 * num_top + 1024)

        def body(st):
            step, sp = st[0], st[1]
            s_t = list(st[2:2 + S])
            s_o = list(st[2 + S:2 + 2 * S])
            thr = st[2 + 2 * S]
            for _ in range(node_pops):
                has = sp > 0
                code = jnp.where(has, nstack[jnp.maximum(sp - 1, 0)],
                                 jnp.int32(-1))
                sp = jnp.where(has, sp - 1, sp)
                nid = jnp.clip(code, 0, num_top - 1)
                row = top_ref[pl.ds(nid, 1), :]
                crow = topc_ref[pl.ds(nid, 1), :]
                trow = tref_ref[pl.ds(nid, 1), :]
                orow = tord_ref[pl.ds(nid, 1), :]
                ordw = _select_order_word(crow, oct_idx)
                valid_pop = code >= 0
                codes, anyh = [], []
                for s in range(A):
                    hit_s, tn_s = _slab(row, 6 * s, ox, oy, oz,
                                        ix, iy, iz, bt)
                    kept_s = tn_s <= s_t[S - 1]
                    child_id = crow[0, s]
                    is_internal = child_id >= 0
                    cand = (hit_s & (tn_s < bt) & valid_pop
                            & jnp.logical_not(is_internal))
                    # anything the slot window excludes lower-bounds thr
                    excl = ((cand | (hit_s & valid_pop & is_internal))
                            & ~kept_s)
                    thr = jnp.where(excl, jnp.minimum(thr, tn_s), thr)
                    valid = cand & kept_s
                    cur_t = jnp.where(valid, tn_s, _INF)
                    cur_o = jnp.where(valid, orow[0, s], NONE_ORD)
                    for i in range(S):
                        swap = _lex_lt(cur_t, cur_o, s_t[i], s_o[i])
                        s_t[i], cur_t = (jnp.where(swap, cur_t, s_t[i]),
                                         jnp.where(swap, s_t[i], cur_t))
                        s_o[i], cur_o = (jnp.where(swap, cur_o, s_o[i]),
                                         jnp.where(swap, s_o[i], cur_o))
                    # displaced slot (or uninserted candidate) falls to thr
                    thr = jnp.where(cur_o != NONE_ORD,
                                    jnp.minimum(thr, cur_t), thr)
                    codes.append(child_id)
                    anyh.append(hit_s & kept_s & is_internal & valid_pop)
                any_scalar = _children_any_hit(anyh)
                for pos in range(A - 1, -1, -1):
                    slot = (ordw >> (4 * pos)) & 15
                    csel = jnp.int32(-1)
                    hsel = False
                    for s in range(A):
                        is_s = slot == s
                        csel = jnp.where(is_s, codes[s], csel)
                        hsel = jnp.logical_or(
                            jnp.logical_and(is_s, any_scalar[s]), hsel)
                    do_push = hsel & (csel >= 0) & (sp < 256)

                    @pl.when(do_push)
                    def _(csel=csel, sp=sp):
                        nstack[sp] = csel

                    sp = sp + do_push.astype(jnp.int32)
            return (step + 1, sp) + tuple(s_t) + tuple(s_o) + (thr,)

        init = (jnp.int32(0), (jnp.max(bt) > 0.0).astype(jnp.int32))
        init += tuple(inf for _ in range(S))
        init += tuple(none_o for _ in range(S))
        init += (inf,)
        fin = jax.lax.while_loop(cond, body, init)
        for i in range(S):
            st_outs[i][0, :, :] = fin[2 + i]
            so_outs[i][0, :, :] = fin[2 + S + i]
        thr_out[0, :, :] = fin[2 + 2 * S]

    return kernel


@functools.partial(jax.jit, static_argnames=("slots", "node_pops", "group"))
def treelet_scan_multi(pack: PacketBVH, ori: Vec3, d: Vec3,
                       t_max: jnp.ndarray, slots: int = 4,
                       node_pops: int = 4, group: int = 2):
    """S-slot treelet candidate scan. Returns (s_t [S,n] f32 entry ts
    ascending, s_ord [S,n] int32 dense ordinals (NONE_ORD = empty),
    thr_t [n] f32 lower bound on every uncaptured candidate's entry t;
    _INF = the slots are exhaustive). Dead lanes (t_max <= 0) emit all
    slots empty with thr_t = _INF."""
    assert pack.top_f32 is not None
    S = slots
    rows = SUBLANES * group
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays_grouped(ori, d, t_max,
                                                           group)
    kernel = _make_kernel_scan_multi(pack.num_top, pack.arity, node_pops,
                                     rows, S)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32)
                  for _ in range(S)]
                 + [jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32)
                    for _ in range(S)]
                 + [jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32)])
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 4,
        out_specs=[ray_spec] * (2 * S + 1),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((258,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.top_f32, pack.top_child,
      pack.top_tref, pack.top_tord)
    flat = lambda a: a.reshape(-1)[:n]
    s_t = jnp.stack([flat(outs[i]) for i in range(S)])
    s_o = jnp.stack([flat(outs[S + i]) for i in range(S)])
    return s_t, s_o, flat(outs[2 * S])
