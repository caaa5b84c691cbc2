"""Dense cluster-sweep cast: brute-force a treelet's whole contiguous
triangle range against a 1024-ray block — the round-3 alternative to
packet *traversal* for incoherent bounce rays.

Why (BENCHMARKS §4/§4c): the wide packet kernel charges every lane for
the packet's node-visit union, and the treelet re-binning kernel's
subtree traversal still pays a serial per-visit chain (~0.4 us/step) on
unions that regrow. This kernel abandons traversal entirely for the
binned phase: rays arrive sorted by nearest-treelet ordinal, each [8,128]
block walks the (few) distinct treelets its lanes request, and tests
EVERY triangle of each treelet densely — no stack, no per-visit
latency chain, no union beyond the block's ordinal span. A Moller-
Trumbore test is ~45 VPU ops on a [8,128] tile, so the marginal cost is
~45 cycles per triangle per 1024 rays (~40 ps/ray-triangle): a 256-tri
treelet sweep costs ~12 us per block, competitive with traversal
whenever the per-ray candidate set is within ~1-2 treelets — which is
exactly what the phase-1 scan + ordinal sort arranges.

Reference counterpart: none — the reference's per-ray MIMD traversal
(/root/reference/src/kernels/ray_cast.cu:12-122) has no need for this;
it is a TPU-native answer to the no-per-lane-gather constraint.

Tables come from `sweep_tables` (treelet.py): an 8-row-aligned repacked
triangle table plus per-treelet (row_start, tri_count) ranges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import Vec3
from ..integrators.intersect import FLT_MAX, HitRecord
from .pallas_traverse import LANES, SUBLANES, _interpret, _mt_scalar_tri

# ordinal sentinel for lanes with no treelet (dead rays / no candidate):
# sorts past every real ordinal and the kernel stops before sweeping it
NONE_ORD = 0x7FFFFF


def _make_sweep_kernel(num_treelets: int, unroll: int, max_chunks: int,
                       n_planes: int = 1, demand: bool = False,
                       any_hit: bool = False):
    """Kernel over one [8,128] ray block: sweep each distinct requested
    treelet's full triangle range, keep the per-lane closest hit. With
    n_planes > 1 each lane requests several candidate treelets (ordinal
    slot planes from treelet_scan_multi) and the kernel sweeps the
    block's union over ALL planes.

    With demand=True each ordinal plane comes with its entry-t plane and
    a lane's request for slot k is dropped once its current best hit
    precedes the slot's entry (s_t[k] >= best_t => no closer hit can
    live there). Sound because best_t only decreases: a slot skipped at
    its ordinal's turn stays provably unneeded forever, and slots are
    all requested initially (the scan only emits entry < t_max). This
    lets one kernel invocation subsume the multi-round re-binning
    pipeline: far slots usually die before their turn."""

    def kernel(*refs):
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref) = refs[:7]
        k = 7
        ord_refs = refs[k:k + n_planes]
        k += n_planes
        st_refs = ()
        if demand:
            st_refs = refs[k:k + n_planes]
            k += n_planes
        range_ref, tri_ref = refs[k:k + 2]
        t_out, tri_out, u_out, v_out = refs[k + 2:]
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        tmax = tmax_ref[0]
        ord_planes = [r[0] for r in ord_refs]
        st_planes = [r[0] for r in st_refs]

        best_t = jnp.minimum(tmax, 3.4e38)  # FLT_MAX as a literal: jnp
        # scalars captured from module scope become pallas constants
        best_tri = jnp.full_like(ord_planes[0], -1)
        best_u = jnp.zeros_like(best_t)
        best_v = jnp.zeros_like(best_t)

        def next_ord(cur, bt):
            """Smallest requested ordinal > cur under the demand mask."""
            nxt = jnp.int32(NONE_ORD)
            for i, o in enumerate(ord_planes):
                m = o > cur
                if demand:
                    m = m & (st_planes[i] < bt)
                nxt = jnp.minimum(nxt, jnp.min(jnp.where(m, o, NONE_ORD)))
            return nxt

        # first requested ordinal in the block (dead lanes carry NONE_ORD)
        cur0 = next_ord(jnp.int32(-1), best_t)

        def sweep_cond(state):
            cur, *_ = state
            return cur < NONE_ORD

        def sweep_body(state):
            cur, bt, btri, bu, bv = state
            start = range_ref[cur, 0]  # 8-aligned row into tri table
            nchunks = range_ref[cur, 1]  # count / unroll, host-padded
            # provable 8-alignment for the dynamic sublane start (Mosaic
            # slow-paths unprovably-unaligned starts); exact when unroll
            # is a multiple of 8, harmless otherwise (start % 8 == 0)
            start_a = (start // SUBLANES) * SUBLANES \
                if unroll % SUBLANES == 0 else start

            def chunk(i, acc):
                bt, btri, bu, bv = acc
                block = tri_ref[pl.ds(start_a + i * unroll, unroll), :]
                get = lambda j, c: block[j, c]
                for j in range(unroll):
                    t, u, v, hitg = _mt_scalar_tri(get, j, ox, oy, oz,
                                                   dx, dy, dz)
                    win = hitg & (t < bt)
                    bt = jnp.where(win, t, bt)
                    tid = block[j, 9].astype(jnp.int32)  # original tri id
                    btri = jnp.where(win, tid, btri)
                    bu = jnp.where(win, u, bu)
                    bv = jnp.where(win, v, bv)
                return bt, btri, bu, bv

            bt, btri, bu, bv = jax.lax.fori_loop(
                0, jnp.minimum(nchunks, max_chunks), chunk,
                (bt, btri, bu, bv))
            bt_dem = bt
            if any_hit:
                # occlusion query: a hit inside [., t_max - 1e-3) answers
                # the lane — drop all remaining slots (see sweep8 kernel)
                bt_dem = jnp.where(bt < tmax - 1e-3, -3.4e38, bt)
            return next_ord(cur, bt_dem), bt, btri, bu, bv

        _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
            sweep_cond, sweep_body,
            (cur0, best_t, best_tri, best_u, best_v))

        # lanes whose t_max was <= 0 are dead: force miss
        dead = tmax <= 0.0
        t_out[0] = best_t
        tri_out[0] = jnp.where(dead, -1, best_tri)
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


def _tile(a, rows, fill=0):
    n = a.shape[0]
    per = rows * LANES
    nt = max(1, -(-n // per))
    pad = nt * per - n
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(nt, rows, LANES), nt, n


@functools.partial(jax.jit, static_argnames=("unroll", "any_hit"))
def sweep_closest_hit(sweep, ori: Vec3, d: Vec3, t_max: jnp.ndarray,
                      ordinal, entry_t=None, unroll: int = 8,
                      any_hit: bool = False) -> HitRecord:
    """Closest hit where lane i tests ONLY its requested treelets'
    triangle ranges (plus any other ordinals present in its 1024-lane
    block — free extra coverage, still exact). `ordinal` is one int32
    array or a tuple of them (candidate slot planes); each must be
    block-sorted for performance (identical values adjacent); NONE_ORD
    lanes (or t_max<=0) are skipped. `entry_t` (tuple matching
    `ordinal`) enables demand-driven slot dropping — see
    _make_sweep_kernel. `sweep` is a SweepTables (treelet.sweep_tables)."""
    if not isinstance(ordinal, (tuple, list)):
        ordinal = (ordinal,)
    n_planes = len(ordinal)
    demand = entry_t is not None
    rows = SUBLANES
    ox, nt, n = _tile(ori.x, rows)
    oy, _, _ = _tile(ori.y, rows)
    oz, _, _ = _tile(ori.z, rows)
    dx, _, _ = _tile(d.x, rows)
    dy, _, _ = _tile(d.y, rows)
    dz, _, _ = _tile(d.z, rows)
    tm = jnp.where(t_max > 0, t_max, 0.0)
    tm, _, _ = _tile(tm, rows)
    # pad lanes and dead rays carry NONE_ORD so they never force a sweep
    ogs = []
    for o in ordinal:
        og = jnp.where(t_max > 0, o, NONE_ORD)
        og, _, _ = _tile(og, rows, fill=NONE_ORD)
        ogs.append(og)
    if demand:
        assert len(entry_t) == n_planes
        for st in entry_t:
            sg, _, _ = _tile(st, rows, fill=3.0e38)
            ogs.append(sg)

    kernel = _make_sweep_kernel(sweep.num_treelets, unroll,
                                sweep.max_chunks, n_planes, demand, any_hit)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
    ]
    bt, btri, bu, bv = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=([ray_spec] * (7 + len(ogs)) + [smem_spec, tab_spec]),
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, *ogs, sweep.ranges, sweep.tri_f32)

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
# Dense scan: S nearest treelet candidates without a tree
# ---------------------------------------------------------------------------

_INF = 3.0e38


def _lex_lt(t_a, o_a, t_b, o_b):
    return (t_a < t_b) | ((t_a == t_b) & (o_a < o_b))


def _make_dense_scan_kernel(t_pad: int, S: int, unroll: int, rows: int):
    """Slab-test EVERY treelet AABB against a [rows,128] ray block in one
    static fori loop — no stack, no serial per-visit chain, box coords
    ride the scalar unit (SMEM) in parallel with the VPU cascade.

    Why: the top-tree scan (pallas_treelet._make_kernel_scan_multi) pays
    the packet's visit-UNION through a serial while-loop; for incoherent
    bounce packets that union is the whole top tree and the measured cost
    was 380-460 ms per 1M rays. Dense enumeration is O(T) per block but
    every op is a pipelined [rows,128] VPU op: ~45 ms per 1M rays at
    T=1270 — and it needs only the treelet AABBs, not the top tree.

    Same output contract as treelet_scan_multi: S ascending (entry_t,
    ordinal) slots plus thr_t, a sound lower bound on every uncaptured
    candidate's entry t (here simply exact: every box is tested)."""

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               boxes_ref, *outs):
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
        ix = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx,
                             jnp.where(dx >= 0, 1e-12, -1e-12))
        iy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy,
                             jnp.where(dy >= 0, 1e-12, -1e-12))
        iz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz,
                             jnp.where(dz >= 0, 1e-12, -1e-12))

        inf = jnp.full((rows, LANES), _INF, jnp.float32)
        none = jnp.full((rows, LANES), NONE_ORD, jnp.int32)

        def body(c, state):
            s_t = list(state[:S])
            s_o = list(state[S:2 * S])
            thr = state[2 * S]
            for j in range(unroll):
                idx = c * unroll + j
                t0x = (boxes_ref[idx, 0] - ox) * ix
                t0y = (boxes_ref[idx, 1] - oy) * iy
                t0z = (boxes_ref[idx, 2] - oz) * iz
                t1x = (boxes_ref[idx, 3] - ox) * ix
                t1y = (boxes_ref[idx, 4] - oy) * iy
                t1z = (boxes_ref[idx, 5] - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), bt))
                cand = (tn <= tf) & (tn < bt)
                kept = tn <= s_t[S - 1]
                thr = jnp.where(cand & ~kept, jnp.minimum(thr, tn), thr)
                valid = cand & kept
                cur_t = jnp.where(valid, tn, _INF)
                cur_o = jnp.where(valid, idx, NONE_ORD)
                for i in range(S):
                    swap = _lex_lt(cur_t, cur_o, s_t[i], s_o[i])
                    s_t[i], cur_t = (jnp.where(swap, cur_t, s_t[i]),
                                     jnp.where(swap, s_t[i], cur_t))
                    s_o[i], cur_o = (jnp.where(swap, cur_o, s_o[i]),
                                     jnp.where(swap, s_o[i], cur_o))
                thr = jnp.where(cur_o != NONE_ORD,
                                jnp.minimum(thr, cur_t), thr)
            return tuple(s_t) + tuple(s_o) + (thr,)

        init = tuple(inf for _ in range(S)) + tuple(
            none for _ in range(S)) + (inf,)
        fin = jax.lax.fori_loop(0, t_pad // unroll, body, init)
        for i in range(S):
            st_outs[i][0] = fin[i]
            so_outs[i][0] = fin[S + i]
        thr_out[0] = fin[2 * S]

    return kernel


@functools.partial(jax.jit, static_argnames=("slots", "unroll"))
def dense_scan(sweep, ori: Vec3, d: Vec3, t_max: jnp.ndarray,
               slots: int = 4, unroll: int = 8):
    """Dense S-slot treelet candidate scan over SweepTables.boxes.
    Returns (s_t [S,n], s_ord [S,n], thr_t [n]) — drop-in for
    treelet_scan_multi (pallas_treelet.py) with exact thr (every box is
    tested, so thr bounds exactly the candidates the slots displaced)."""
    S = slots
    rows = SUBLANES
    ox, nt, n = _tile(ori.x, rows)
    oy, _, _ = _tile(ori.y, rows)
    oz, _, _ = _tile(ori.z, rows)
    dx, _, _ = _tile(d.x, rows)
    dy, _, _ = _tile(d.y, rows)
    dz, _, _ = _tile(d.z, rows)
    tm = jnp.where(t_max > 0, t_max, 0.0)
    tm, _, _ = _tile(tm, rows)

    T = sweep.num_treelets
    t_pad = max(unroll, -(-T // unroll) * unroll)
    # pad boxes with lo=hi=+INF: the slab test provably fails for every
    # direction sign combination (tn >= tf or tn >= bt)
    boxes = jnp.concatenate(
        [sweep.boxes[:, :6],
         jnp.full((t_pad - T, 6), _INF, jnp.float32)], axis=0)

    kernel = _make_dense_scan_kernel(t_pad, S, unroll, rows)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = ([jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32)
                  for _ in range(S)]
                 + [jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32)
                    for _ in range(S)]
                 + [jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32)])
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [smem_spec],
        out_specs=[ray_spec] * (2 * S + 1),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, boxes)
    flat = lambda a: a.reshape(-1)[:n]
    s_t = jnp.stack([flat(outs[i]) for i in range(S)])
    s_o = jnp.stack([flat(outs[S + i]) for i in range(S)])
    return s_t, s_o, flat(outs[2 * S])


# ---------------------------------------------------------------------------
# Sublane-parallel sweep: 8 triangles x 128 rays per VPU op
# ---------------------------------------------------------------------------


def _mt_chunk(block, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of an [8,16] triangle chunk (tris on sublanes)
    against 128 rays (lanes). Tri columns ride [8,1] sublane broadcasts,
    rays [1,128] lane broadcasts -> every op is a full [8,128] VPU op
    covering 1024 ray-triangle pairs. Same math and epsilons as
    _mt_scalar_tri (pallas_traverse.py) so results bit-match the scalar
    kernels pair-for-pair."""
    col = lambda a: block[:, a:a + 1]
    v0x, v0y, v0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > 1e-9
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > 1e-4))
    return t, u, v, hit


def _make_sweep8_kernel(unroll_chunks: int, max_chunks: int, n_planes: int,
                       demand: bool, any_hit: bool = False,
                       groups: int = 0):
    """Sweep kernel over a [1,128] ray block. vs _make_sweep_kernel:

    - 8x finer union granularity: each sweep serves 128 rays instead of
      1024, so a block's ordinal union shrinks toward the per-ray
      candidate sets the bin sort arranges (measured: the 1024-lane
      kernel paid ~52 treelet sweeps per block on bounce rays — most
      serving a minority of its lanes).
    - Triangle data rides [8,1] vector column slices of the [8,16]
      chunk instead of 16 scalar extracts per triangle — the VPU sees
      1024 ray-tri pairs per op with no scalar-load latency chain.

    Per-sublane running bests (sublane s owns rows with row%8 == s) are
    reduced once at the end, picking the smallest packed row among
    equal-t winners — exactly the serial scan-order semantics of the
    scalar kernels.

    `groups` > 0 enables group-window culling: each treelet carries 8
    sub-AABBs (SweepTables.group_boxes, one per `chunk_align` chunks =
    `groups` fori trips each) and the sweep slab-tests all 8 against the
    block's 128 rays in one [8,128] op, then runs only trips
    [first_hit_group * groups, (last_hit_group+1) * groups) — a
    branchless trim of the dense MT range (interior miss groups between
    first and last are still swept; the win is leading/trailing trim,
    which the packing's spatial order makes common)."""

    def kernel(*refs):
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref) = refs[:7]
        k = 7
        ord_refs = refs[k:k + n_planes]
        k += n_planes
        st_refs = ()
        if demand:
            st_refs = refs[k:k + n_planes]
            k += n_planes
        gbox_ref = None
        if groups:
            gbox_ref = refs[k]
            k += 1
        range_ref, tri_ref = refs[k:k + 2]
        t_out, tri_out, u_out, v_out = refs[k + 2:]
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        tmax = tmax_ref[0]
        ord_planes = [r[0] for r in ord_refs]
        st_planes = [r[0] for r in st_refs]

        if groups:
            # reciprocal directions for the group slab test (same zero
            # guards as dense_scan so degenerate components agree)
            ix = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx,
                                 jnp.where(dx >= 0, 1e-12, -1e-12))
            iy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy,
                                 jnp.where(dy >= 0, 1e-12, -1e-12))
            iz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz,
                                 jnp.where(dz >= 0, 1e-12, -1e-12))

        inf8 = jnp.full((SUBLANES, LANES), 3.4e38, jnp.float32)
        best_t = jnp.minimum(tmax, 3.4e38) + (inf8 - inf8)  # bcast [8,128]
        best_row = jnp.full((SUBLANES, LANES), -1, jnp.int32)
        best_u = jnp.zeros((SUBLANES, LANES), jnp.float32)
        best_v = jnp.zeros((SUBLANES, LANES), jnp.float32)

        def next_ord(cur, bt):
            nxt = jnp.int32(NONE_ORD)
            for i, o in enumerate(ord_planes):
                m = o > cur
                if demand:
                    m = m & (st_planes[i] < bt)
                nxt = jnp.minimum(nxt, jnp.min(jnp.where(m, o, NONE_ORD)))
            return nxt

        cur0 = next_ord(jnp.int32(-1), jnp.minimum(tmax, 3.4e38))

        def sweep_cond(state):
            return state[0] < NONE_ORD

        def sweep_body(state):
            cur, bt, brow, bu, bv = state
            start = range_ref[cur, 0]
            nchunks = range_ref[cur, 1]

            # start is a multiple of SUBLANES by construction (sweep_tables
            # rows); recompute via //8*8 so Mosaic can PROVE the dynamic
            # sublane start is 8-aligned (unaligned dynamic starts hit a
            # slow path)
            start_c = start // SUBLANES

            def chunk(i, acc):
                bt, brow, bu, bv = acc
                for j in range(unroll_chunks):
                    row0 = (start_c + i * unroll_chunks + j) * SUBLANES
                    block = tri_ref[pl.ds(row0, SUBLANES), :]
                    t, u, v, hitg = _mt_chunk(block, ox, oy, oz, dx, dy, dz)
                    win = hitg & (t < bt)
                    bt = jnp.where(win, t, bt)
                    rows = (row0 + jax.lax.broadcasted_iota(
                        jnp.int32, (SUBLANES, LANES), 0))
                    brow = jnp.where(win, rows, brow)
                    bu = jnp.where(win, u, bu)
                    bv = jnp.where(win, v, bv)
                return bt, brow, bu, bv

            # chunks are host-aligned to unroll_chunks (sweep_tables
            # chunk_align), so the division is exact and never overruns
            if unroll_chunks >= max_chunks:
                # alignment makes every treelet exactly one trip: skip the
                # Mosaic while-loop layer (~2 us/iteration of scalar
                # overhead, BENCHMARKS §6) and issue the body inline
                bt, brow, bu, bv = chunk(0, (bt, brow, bu, bv))
            elif groups:
                # group-window culling: slab-test the treelet's 8 group
                # sub-AABBs (sublanes) against the 128 rays (lanes) and
                # trim the trip range to [first, last] hit groups. Pad
                # groups carry lo = hi = +INF (provable miss), so the
                # window never reaches beyond nchunks; an all-miss block
                # (every candidate already beaten by best_t) runs zero
                # trips (fori lower 8*groups > upper 0).
                gb = gbox_ref[pl.ds(cur * SUBLANES, SUBLANES), :]
                gcol = lambda a: gb[:, a:a + 1]
                bt_ray = jnp.min(bt, axis=0, keepdims=True)
                t0x = (gcol(0) - ox) * ix
                t0y = (gcol(1) - oy) * iy
                t0z = (gcol(2) - oz) * iz
                t1x = (gcol(3) - ox) * ix
                t1y = (gcol(4) - oy) * iy
                t1z = (gcol(5) - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), bt_ray))
                m = tn <= tf
                gi = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES),
                                              0)
                first = jnp.min(jnp.where(m, gi, SUBLANES))
                last = jnp.max(jnp.where(m, gi, -1))
                # clamp to the treelet's real trip count: the +INF pad-box
                # slab test is only a provable miss for normalized ray
                # directions (|d| components < ~0.88 keep (3e38-o)*inv at
                # inf); the clamp makes the window safe for any caller
                bt, brow, bu, bv = jax.lax.fori_loop(
                    first * groups,
                    jnp.minimum((last + 1) * groups,
                                jnp.minimum(nchunks, max_chunks)
                                // unroll_chunks),
                    chunk, (bt, brow, bu, bv))
            else:
                bt, brow, bu, bv = jax.lax.fori_loop(
                    0, jnp.minimum(nchunks, max_chunks) // unroll_chunks,
                    chunk, (bt, brow, bu, bv))
            bt_ray = jnp.min(bt, axis=0, keepdims=True)
            if any_hit:
                # occlusion query: a hit strictly inside the segment
                # [., t_max - 1e-3) (the any-hit kernels' endpoint margin,
                # pallas_traverse.py) answers the lane — demand-drop ALL
                # remaining slots by forcing its budget below every entry.
                # Hits in the margin zone keep refining: a closer slot
                # could still produce an occluding t.
                bt_ray = jnp.where(bt_ray < tmax - 1e-3, -3.4e38, bt_ray)
            return next_ord(cur, bt_ray), bt, brow, bu, bv

        _, best_t, best_row, best_u, best_v = jax.lax.while_loop(
            sweep_cond, sweep_body, (cur0, best_t, best_row, best_u, best_v))

        # cross-sublane reduce: smallest t, ties -> smallest packed row
        t_fin = jnp.min(best_t, axis=0, keepdims=True)
        is_min = (best_t == t_fin) & (best_row >= 0)
        big = jnp.int32(0x7FFFFFFF)
        row_fin = jnp.min(jnp.where(is_min, best_row, big), axis=0,
                          keepdims=True)
        pick = best_row == row_fin
        sel_i = lambda a: jnp.max(jnp.where(pick, a, -1), axis=0,
                                  keepdims=True)
        sel_f = lambda a: jnp.max(jnp.where(pick, a, -3.4e38), axis=0,
                                  keepdims=True)
        dead = tmax <= 0.0
        found = row_fin != big
        t_out[0] = jnp.where(found, t_fin, jnp.minimum(tmax, 3.4e38))
        tri_out[0] = jnp.where(dead | ~found, -1, sel_i(best_row))
        u_out[0] = jnp.where(found, sel_f(best_u), 0.0)
        v_out[0] = jnp.where(found, sel_f(best_v), 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("unroll_chunks", "any_hit",
                                             "use_groups"))
def sweep8_closest_hit(sweep, ori: Vec3, d: Vec3, t_max: jnp.ndarray,
                       ordinal, entry_t=None,
                       unroll_chunks: int = 4,
                       any_hit: bool = False,
                       use_groups: bool = False) -> HitRecord:
    """Sublane-parallel variant of sweep_closest_hit: [1,128] ray blocks,
    8 triangles per VPU op. Returns packed-table row ids translated back
    to original triangle ids on the host side of the kernel (one cheap
    XLA gather over the [rows] id column).

    use_groups=True trims each treelet sweep to the [first, last] window
    of its 8 group sub-AABBs that the block's rays actually enter (see
    _make_sweep8_kernel); requires the table's 8 group slots to cover
    max_chunks (max_chunks <= 8 * chunk_align)."""
    if not isinstance(ordinal, (tuple, list)):
        ordinal = (ordinal,)
    # every treelet's chunk count must be a whole number of unrolled
    # trips, or tail chunks are silently skipped (missed hits). Since
    # counts are chunk_align multiples, unroll_chunks | chunk_align is
    # necessary and sufficient — and it also makes the static one-trip
    # fast path (unroll_chunks >= max_chunks => counts all equal) exact
    # and in-bounds.
    assert sweep.chunk_align % unroll_chunks == 0, \
        (f"unroll_chunks={unroll_chunks} must divide the table's "
         f"chunk_align={sweep.chunk_align} (rebuild sweep_tables with "
         f"chunk_align={unroll_chunks})")
    groups = 0
    if use_groups and unroll_chunks < sweep.max_chunks:
        # 8 group slots must cover every treelet's chunk span; trips per
        # group must be whole (chunk_align % unroll_chunks == 0, above)
        assert sweep.max_chunks <= SUBLANES * sweep.chunk_align, \
            (f"group culling needs max_chunks={sweep.max_chunks} <= "
             f"8*chunk_align={SUBLANES * sweep.chunk_align} (rebuild "
             f"sweep_tables with a larger chunk_align)")
        assert sweep.group_boxes is not None, \
            "sweep tables built before group_boxes existed — rebuild"
        groups = sweep.chunk_align // unroll_chunks
    n_planes = len(ordinal)
    demand = entry_t is not None
    rows = 1
    ox, nt, n = _tile(ori.x, rows)
    oy, _, _ = _tile(ori.y, rows)
    oz, _, _ = _tile(ori.z, rows)
    dx, _, _ = _tile(d.x, rows)
    dy, _, _ = _tile(d.y, rows)
    dz, _, _ = _tile(d.z, rows)
    tm = jnp.where(t_max > 0, t_max, 0.0)
    tm, _, _ = _tile(tm, rows)
    ogs = []
    for o in ordinal:
        og = jnp.where(t_max > 0, o, NONE_ORD)
        og, _, _ = _tile(og, rows, fill=NONE_ORD)
        ogs.append(og)
    if demand:
        assert len(entry_t) == n_planes
        for st in entry_t:
            sg, _, _ = _tile(st, rows, fill=3.0e38)
            ogs.append(sg)

    kernel = _make_sweep8_kernel(unroll_chunks, sweep.max_chunks, n_planes,
                                 demand, any_hit, groups=groups)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
    ]
    extra_in = [tab_spec] if groups else []
    extra_args = (sweep.group_boxes,) if groups else ()
    bt, brow, bu, bv = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=([ray_spec] * (7 + len(ogs)) + extra_in
                  + [smem_spec, tab_spec]),
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, *ogs, *extra_args,
      sweep.ranges, sweep.tri_f32)

    flat = lambda a: a.reshape(-1)[:n]
    brow = flat(brow)
    # packed row -> original tri id (tiny XLA gather over the id column)
    ids = sweep.tri_f32[:, 9].astype(jnp.int32)
    btri = jnp.where(brow >= 0, ids[jnp.clip(brow, 0, ids.shape[0] - 1)], -1)
    bt = flat(bt)
    return HitRecord(
        t=jnp.where(btri >= 0, bt, FLT_MAX),
        tri=btri,
        u=flat(bu),
        v=flat(bv),
    )
