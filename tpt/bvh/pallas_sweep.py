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
                       n_planes: int = 1, demand: bool = False):
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

            def chunk(i, acc):
                bt, btri, bu, bv = acc
                block = tri_ref[pl.ds(start + i * unroll, unroll), :]
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
            return next_ord(cur, bt), bt, btri, bu, bv

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


@functools.partial(jax.jit, static_argnames=("unroll",))
def sweep_closest_hit(sweep, ori: Vec3, d: Vec3, t_max: jnp.ndarray,
                      ordinal, entry_t=None, unroll: int = 8) -> HitRecord:
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
                                sweep.max_chunks, n_planes, demand)
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
