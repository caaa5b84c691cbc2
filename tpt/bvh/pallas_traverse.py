"""Pallas packet-traversal kernels — the performance ray-cast backend.

Design (from measured v5e behavior, not translated from CUDA):
- Mosaic has no per-lane VMEM gather, so per-ray SIMT traversal (the CUDA
  model, /root/reference/src/kernels/ray_cast.cu) cannot map. Instead each
  grid step owns a *packet* of 8x128 = 1024 rays sharing ONE traversal
  stack in SMEM (scalar memory). Per step: pop a node (scalar), fetch its
  two child AABBs with one dynamic row slice from the VMEM node table,
  test them against all 1024 lanes densely on the VPU, and push children
  any lane hit — nearer child on top (packet-min t_near ordering).
- Leaves are clusters of <= K morton-contiguous triangles (bvh/pack.py):
  one contiguous (K, 16) slice fetches the whole cluster; Moller-Trumbore
  runs K times over all lanes with static unrolling.
- Dead lanes carry t_max = -1, so fully-dead packets fail the root
  AABB test and exit after one step (0 would still pass for boxes that
  contain the stale origin: tn = tf = 0) — per-bounce "compaction" without
  moving any data.
- Measured step costs: internal-node step ~370 ns (dominated by VPU box
  math — near issue-rate); the per-kernel dispatch overhead (~3 ms on this
  runtime) is amortized by the enclosing jitted frame function.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import Vec3
from ..integrators.intersect import FLT_MAX, HitRecord
from .pack import PacketBVH

LANES = 128
SUBLANES = 8
PACKET = SUBLANES * LANES
_INF = 3.0e38  # plain float: jnp scalars would be captured consts in the kernel


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d >= 0, 1e-12, -1e-12))


def _slab(row, base, ox, oy, oz, ix, iy, iz, limit):
    """Child AABB slab test; box faces come from scalar extracts of `row`
    starting at column `base`. Returns (hit, t_near)."""
    t0x = (row[0, base + 0] - ox) * ix
    t0y = (row[0, base + 1] - oy) * iy
    t0z = (row[0, base + 2] - oz) * iz
    t1x = (row[0, base + 3] - ox) * ix
    t1y = (row[0, base + 4] - oy) * iy
    t1z = (row[0, base + 5] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), limit))
    return (tn <= tf), tn


def _tri_getter(block, lane_packed: bool):
    """Scalar accessor for triangle j, column c. Two layouts:
    - resident: block [K, 16], element at [j, c]
    - streaming: block lane-packed [K*16/128, 128] (8 tri-rows per
      128-lane row, the only DMA-able layout) — element at
      [(j*16)//128, (j*16)%128 + c]; j is static, so both indices are."""
    if lane_packed:
        return lambda j, c: block[(j * 16) // 128, (j * 16) % 128 + c]
    return lambda j, c: block[j, c]


def _mt_scalar_tri(get, j, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of triangle row j (scalars via `get(j, c)` —
    see _tri_getter) against all lanes. Returns (t, u, v, hit_geom) —
    caller applies t-range and validity."""
    v0x = get(j, 0)
    v0y = get(j, 1)
    v0z = get(j, 2)
    e1x = get(j, 3)
    e1y = get(j, 4)
    e1z = get(j, 5)
    e2x = get(j, 6)
    e2y = get(j, 7)
    e2z = get(j, 8)

    # pvec = d x e2
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
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-4)
    return t, u, v, hit


def _make_kernel(num_nodes: int, k_cluster: int, stack_depth: int,
                 any_hit: bool, tri_rows: int = 1 << 30, arity: int = 2,
                 interleave: int = 2):
    """Traversal kernel over P = `interleave` independent packets per grid
    program. A single packet's step is a serial latency chain (node fetch
    -> slab math -> min-reduce -> next-node select, ~390 ns measured);
    interleaving packets gives the scheduler independent work to overlap
    into those latencies. A finished packet pops the idle code -1, which
    decodes as a zero-count cluster — a natural no-op."""
    P = interleave

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, child_ref, tri_ref,
               *out_refs):
        stack_ref = out_refs[-1]
        outs = out_refs[:-1]
        rays = []
        for p in range(P):
            ox = ox_ref[p]
            oy = oy_ref[p]
            oz = oz_ref[p]
            dx = dx_ref[p]
            dy = dy_ref[p]
            dz = dz_ref[p]
            rays.append((ox, oy, oz, dx, dy, dz,
                         _safe_inv(dx), _safe_inv(dy), _safe_inv(dz),
                         tmax_ref[p]))
            stack_ref[p * stack_depth] = jnp.int32(0)

        zeros = jnp.zeros((SUBLANES, LANES), jnp.float32)
        neg1 = jnp.full((SUBLANES, LANES), -1, jnp.int32)

        def pop(p, sp):
            """Pop next code for packet p; -1 (no-op cluster) when empty."""
            has = sp > 0
            code = jnp.where(
                has,
                stack_ref[p * stack_depth + jnp.maximum(sp - 1, 0)],
                jnp.int32(-1))
            return code, jnp.maximum(sp - 1, 0)

        def node_case(p, code, sp, bt, btri, bu, bv):
            ox, oy, oz, dx, dy, dz, ix, iy, iz, _ = rays[p]
            nid = jnp.clip(code, 0, num_nodes - 1)
            row = nodes_ref[pl.ds(nid, 1), :]
            crow = child_ref[pl.ds(nid, 1), :]
            mins = []
            codes = []
            for s in range(arity):
                hit_s, tn_s = _slab(row, 6 * s, ox, oy, oz, ix, iy, iz, bt)
                mins.append(jnp.min(jnp.where(hit_s, tn_s, _INF)))
                codes.append(crow[0, s])

            if arity == 2:
                order = [(0, 1)]
            else:
                order = [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)]
            for a, b in order:
                swap = mins[a] > mins[b]
                mins[a], mins[b] = (jnp.where(swap, mins[b], mins[a]),
                                    jnp.where(swap, mins[a], mins[b]))
                codes[a], codes[b] = (jnp.where(swap, codes[b], codes[a]),
                                      jnp.where(swap, codes[a], codes[b]))

            # push far-to-near so the nearest is popped first
            for s in range(arity - 1, -1, -1):
                ok = (mins[s] < _INF) & (sp < stack_depth)

                @pl.when(ok)
                def _(s=s, sp=sp):
                    stack_ref[p * stack_depth + sp] = codes[s]

                sp = sp + ok.astype(jnp.int32)
            return sp, bt, btri, bu, bv

        def cluster_case(p, code, sp, bt, btri, bu, bv):
            ox, oy, oz, dx, dy, dz, ix, iy, iz, _ = rays[p]
            val = -(code + 1)  # idle code -1 -> val 0 -> count 0 (no-op)
            start = jnp.clip(val // 256, 0, tri_rows - k_cluster)
            count = val % 256
            get = _tri_getter(tri_ref[pl.ds(start, k_cluster), :], False)
            for j in range(k_cluster):
                t, u, v, hitg = _mt_scalar_tri(get, j, ox, oy, oz, dx, dy, dz)
                hit = hitg & (j < count) & (t < bt)
                tri_id = get(j, 9).astype(jnp.int32)
                bt = jnp.where(hit, t, bt)
                btri = jnp.where(hit, tri_id, btri)
                bu = jnp.where(hit, u, bu)
                bv = jnp.where(hit, v, bv)
            return sp, bt, btri, bu, bv

        # safety bound: no packet can need more steps than nodes+clusters
        max_steps = 8 * num_nodes + 4096

        if any_hit:
            def occ_node_case(p, code, sp, occ):
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = rays[p]
                limit = tmax - 1e-3
                nid = jnp.clip(code, 0, num_nodes - 1)
                row = nodes_ref[pl.ds(nid, 1), :]
                live_limit = jnp.where(occ > 0, -1.0, limit)
                crow = child_ref[pl.ds(nid, 1), :]
                for s in range(arity):
                    hit_s, _ = _slab(row, 6 * s, ox, oy, oz, ix, iy, iz,
                                     live_limit)
                    ok = jnp.any(hit_s) & (sp < stack_depth)
                    cs = crow[0, s]

                    @pl.when(ok)
                    def _(cs=cs, sp=sp):
                        stack_ref[p * stack_depth + sp] = cs

                    sp = sp + ok.astype(jnp.int32)
                return sp, occ

            def occ_cluster_case(p, code, sp, occ):
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = rays[p]
                limit = tmax - 1e-3
                val = -(code + 1)
                start = jnp.clip(val // 256, 0, tri_rows - k_cluster)
                count = val % 256
                get = _tri_getter(tri_ref[pl.ds(start, k_cluster), :], False)
                for j in range(k_cluster):
                    t, u, v, hitg = _mt_scalar_tri(
                        get, j, ox, oy, oz, dx, dy, dz)
                    occ = jnp.maximum(
                        occ,
                        (hitg & (j < count) & (t < limit)).astype(jnp.int32))
                return sp, occ

            def cond(c):
                step = c[0]
                sps = c[1:1 + P]
                occs = c[1 + P:]
                live = jnp.int32(0)
                for p in range(P):
                    # packet contributes while it has work AND unresolved lanes
                    live = live + jnp.where(
                        (sps[p] > 0) & (jnp.min(occs[p]) < 1), 1, 0)
                return (live > 0) & (step < max_steps)

            def body(c):
                step = c[0]
                sps = list(c[1:1 + P])
                occs = list(c[1 + P:])
                for p in range(P):
                    code, sp = pop(p, sps[p])
                    sps[p], occs[p] = jax.lax.cond(
                        code >= 0,
                        lambda a, p=p, code=code: occ_node_case(p, code, *a),
                        lambda a, p=p, code=code: occ_cluster_case(p, code, *a),
                        (sp, occs[p]))
                return (step + 1, *sps, *occs)

            init = (jnp.int32(0),)
            init += tuple(jnp.int32(1) for _ in range(P))
            occ0 = []
            for p in range(P):
                limit = rays[p][9] - 1e-3
                occ0.append((limit <= 0.0).astype(jnp.int32))
            init += tuple(occ0)
            final = jax.lax.while_loop(cond, body, init)
            for p in range(P):
                outs[0][p, :, :] = final[1 + P + p]
        else:
            def cond(c):
                step = c[0]
                sps = c[1:1 + P]
                live = jnp.int32(0)
                for p in range(P):
                    live = live + jnp.where(sps[p] > 0, 1, 0)
                return (live > 0) & (step < max_steps)

            def body(c):
                step = c[0]
                sps = list(c[1:1 + P])
                rest = list(c[1 + P:])
                # rest layout: [bt0.., btri0.., bu0.., bv0..] grouped by field
                bts = rest[0:P]
                btris = rest[P:2 * P]
                bus = rest[2 * P:3 * P]
                bvs = rest[3 * P:4 * P]
                for p in range(P):
                    code, sp = pop(p, sps[p])
                    sps[p], bts[p], btris[p], bus[p], bvs[p] = jax.lax.cond(
                        code >= 0,
                        lambda a, p=p, code=code: node_case(p, code, *a),
                        lambda a, p=p, code=code: cluster_case(p, code, *a),
                        (sp, bts[p], btris[p], bus[p], bvs[p]))
                return (step + 1, *sps, *bts, *btris, *bus, *bvs)

            init = (jnp.int32(0),)
            init += tuple(jnp.int32(1) for _ in range(P))
            init += tuple(jnp.minimum(rays[p][9], _INF) for p in range(P))
            init += tuple(neg1 for _ in range(P))
            init += tuple(zeros for _ in range(P))
            init += tuple(zeros for _ in range(P))
            final = jax.lax.while_loop(cond, body, init)
            for p in range(P):
                outs[0][p, :, :] = final[1 + P + p]
                outs[1][p, :, :] = final[1 + 2 * P + p]
                outs[2][p, :, :] = final[1 + 3 * P + p]
                outs[3][p, :, :] = final[1 + 4 * P + p]

    return kernel


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels are testable on the CPU mesh."""
    return jax.default_backend() != "tpu"


def _tile_rays(ori: Vec3, d: Vec3, t_max: jnp.ndarray, group: int = 1):
    """Pad + reshape rays to (nt, 8, 128) with nt a multiple of `group`
    (padded packets carry t_max=0 and finish after one root test)."""
    n = ori.shape[0]
    n_pad = -(-n // (PACKET * group)) * PACKET * group
    nt = n_pad // PACKET

    def pad3(v):
        return jnp.pad(v, (0, n_pad - n)).reshape(nt, SUBLANES, LANES)

    return (
        pad3(ori.x), pad3(ori.y), pad3(ori.z),
        pad3(d.x), pad3(d.y), pad3(d.z),
        jnp.pad(t_max, (0, n_pad - n),
                constant_values=-1.0).reshape(nt, SUBLANES, LANES),
        nt, n,
    )


# Packets per Pallas program. Measured on v5e: P=2/P=4 give NO speedup
# (~5% slower) — Mosaic executes the while body without overlapping the
# independent packets' fetch/reduce chains, so the step stays serial.
# Kept as a parameter; default 1.
INTERLEAVE = 1


@functools.partial(jax.jit, static_argnames=("stack_depth", "interleave"))
def packet_closest_hit(pack: PacketBVH, ori: Vec3, d: Vec3,
                       t_max: jnp.ndarray, stack_depth: int = 64,
                       interleave: int = INTERLEAVE) -> HitRecord:
    P = interleave
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays(ori, d, t_max, group=P)

    kernel = _make_kernel(pack.num_nodes, pack.max_cluster, stack_depth,
                          any_hit=False, tri_rows=pack.tri_f32.shape[0],
                          arity=pack.arity, interleave=P)
    ray_spec = pl.BlockSpec((P, SUBLANES, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.float32),
    ]
    bt, btri, bu, bv = pl.pallas_call(
        kernel,
        grid=(nt // P,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 3,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((P * stack_depth + 2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.node_f32, pack.node_child, pack.tri_f32)

    flat = lambda a: a.reshape(-1)[:n]
    bt = flat(bt)
    btri = flat(btri)
    return HitRecord(
        t=jnp.where(btri >= 0, bt, FLT_MAX),
        tri=btri,
        u=flat(bu),
        v=flat(bv),
    )


@functools.partial(jax.jit, static_argnames=("stack_depth", "interleave"))
def packet_any_hit(pack: PacketBVH, ori: Vec3, d: Vec3,
                   t_max: jnp.ndarray, stack_depth: int = 64,
                   interleave: int = INTERLEAVE) -> jnp.ndarray:
    P = interleave
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays(ori, d, t_max, group=P)
    kernel = _make_kernel(pack.num_nodes, pack.max_cluster, stack_depth,
                          any_hit=True, tri_rows=pack.tri_f32.shape[0],
                          arity=pack.arity, interleave=P)
    ray_spec = pl.BlockSpec((P, SUBLANES, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(nt // P,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 3,
        out_specs=[ray_spec],
        out_shape=[jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((P * stack_depth + 2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.node_f32, pack.node_child, pack.tri_f32)[0]
    return occ.reshape(-1)[:n].astype(bool)


def pallas_closest_hit(mesh, bvh_or_pack, ori: Vec3, d: Vec3, t_max=None,
                       group=None, node_pops=None, cluster_pops=None):
    """Raycaster-seam adapter (common.make_raycaster)."""
    pack = bvh_or_pack if isinstance(bvh_or_pack, PacketBVH) else None
    if pack is None:
        raise ValueError("BVH_PALLAS backend requires a PacketBVH (scene.pack)")
    if t_max is None:
        t_max = jnp.full((ori.shape[0],), FLT_MAX)
    if pack.arity > 2:
        return packet_closest_hit_wide(
            pack, ori, d, t_max,
            node_pops=node_pops or NODE_POPS,
            group=group or GROUP,
            cluster_pops=cluster_pops or CLUSTER_POPS)
    return packet_closest_hit(pack, ori, d, t_max)


def pallas_any_hit(mesh, bvh_or_pack, ori: Vec3, d: Vec3, t_max,
                   group=None, node_pops=None, cluster_pops=None):
    pack = bvh_or_pack if isinstance(bvh_or_pack, PacketBVH) else None
    if pack is None:
        raise ValueError("BVH_PALLAS backend requires a PacketBVH (scene.pack)")
    if pack.arity > 2:
        return packet_any_hit_wide(
            pack, ori, d, t_max,
            node_pops=node_pops or NODE_POPS,
            group=group or GROUP,
            cluster_pops=cluster_pops or CLUSTER_POPS)
    return packet_any_hit(pack, ori, d, t_max)


# ---------------------------------------------------------------------------
# Wide-node kernel (v2): arity-4/8 nodes, two speculative SMEM stacks
# (nodes + clusters) popped every iteration with straight-line masked
# execution — no lax.cond in the loop body, so Mosaic can overlap the
# independent node-fetch/slab/reduce and cluster-fetch/Moller-Trumbore
# chains that the v1 kernel serialized. Child ordering comes from the
# host-precomputed per-octant tables (pack.build_packet_bvh_wide); the
# push decision uses ONE lane-reduce per node via an 8-bit-per-child
# bitfield sum + scalar OR across sublanes, instead of one min-reduce per
# child (the measured killer of the round-1 BVH4 experiment).
# ---------------------------------------------------------------------------


def _packet_octant(dx, dy, dz):
    """Scalar octant of the packet from lane (0, 0) (packets share an
    octant after the coherence sort; wrong order on stragglers only costs
    pruning efficiency, never correctness)."""
    ob = lambda v: (v[0, 0] >= 0.0).astype(jnp.int32)
    return ob(dx) * 4 + ob(dy) * 2 + ob(dz)


def _select_order_word(crow, oct_idx):
    """crow[0, 8 + oct] via a static-extract + select chain (Mosaic has no
    dynamic lane extract)."""
    ordw = jnp.int32(0)
    for o in range(8):
        ordw = jnp.where(oct_idx == o, crow[0, 8 + o], ordw)
    return ordw


def _children_any_hit(hits):
    """Packet-wide any-hit per child with two fused reduces (no per-child
    reduce — the measured killer of the round-1 BVH4 experiment).

    hits: list of (rows, 128) bool, rows <= 255. Per-lane bitfield (8 bits
    per child, 4 children per int32 word; a per-row lane count <= 128
    fits), sum-reduce over lanes -> (rows, 1), binarize each field, pack
    again, sum-reduce over rows -> one scalar whose fields stay < 256.
    Returns a list of scalar bools."""
    out = []
    for base in range(0, len(hits), 4):
        group = hits[base:base + 4]
        combined = jnp.zeros_like(group[0], dtype=jnp.int32)
        for s, h in enumerate(group):
            combined = combined + (h.astype(jnp.int32) << (8 * s))
        lane = jnp.sum(combined, axis=1, keepdims=True)  # (rows, 1)
        packed = jnp.zeros_like(lane)
        for s in range(len(group)):
            bit = (((lane >> (8 * s)) & 255) > 0).astype(jnp.int32)
            packed = packed + (bit << (8 * s))
        total = jnp.sum(packed)  # scalar; per-field count <= rows <= 255
        out.extend((((total >> (8 * s)) & 255) > 0)
                   for s in range(len(group)))
    return out


def _make_kernel_wide(num_nodes: int, k_cluster: int, nstack_depth: int,
                      cstack_depth: int, any_hit: bool, tri_rows: int,
                      arity: int, node_pops: int = 1, rows: int = SUBLANES,
                      cluster_pops: int = 1, stream_tris: bool = False,
                      t_cull: bool = False):
    """`rows` = 8 * group: a super-packet of group*1024 rays shares one
    traversal stack. Vector ops on a (rows, 128) tile issue as `group`
    back-to-back register ops with no dependency between them, so the
    fixed per-step latency (fetch -> slab -> reduce -> scalar decide)
    amortizes over group x the rays. The node-visit union grows
    sub-linearly with group for sorted rays (and not at all for fully
    incoherent ones, which visit most of the tree regardless) — measured
    net wins at group 4-16 on v5e.

    `stream_tris`: the triangle table stays in HBM; each popped cluster's
    (K, 16) slice is DMA'd into a VMEM scratch slot at the top of the loop
    iteration and intersected after the node work, so the copy rides the
    slab-math latency. Removes the VMEM ceiling on scene size (the
    reference's equivalent capability is GPU global memory + L2 for the
    triangle buffer, ray_cast.cu __ldg loads).

    `t_cull` (closest-hit only): every push records the packet-min entry
    distance in a parallel f32 SMEM stack; a pop whose recorded t exceeds
    the packet's current max hit distance skips its dense work entirely
    (lax.cond). Ordered traversal tightens bt early, so late far pushes
    are frequently dead by pop time — the per-child min-reduces this
    needs replace the bitfield any-hit."""
    assert not (stream_tris and t_cull), "stream_tris + t_cull not combined"
    A = arity

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, child_ref, tri_ref, *out_refs):
        out_refs = list(out_refs)
        if t_cull:
            ctmin = out_refs.pop()
            ntmin = out_refs.pop()
        if stream_tris:
            dma_sems = out_refs.pop()
            tri_scratch = out_refs.pop()
        cstack = out_refs.pop()
        nstack = out_refs.pop()
        outs = out_refs
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

        nstack[0] = jnp.int32(0)
        if t_cull:
            ntmin[0] = jnp.float32(0.0)
        zeros = jnp.zeros((rows, LANES), jnp.float32)
        neg1 = jnp.full((rows, LANES), -1, jnp.int32)
        max_steps = 8 * num_nodes + 8192

        # when the cluster stack could overflow on this iteration's pushes,
        # skip node pops so the cluster stack drains (cluster_pops per
        # iteration) — a dropped push would silently lose intersections
        cmargin = cstack_depth - node_pops * A - 1

        def pops(nsp, csp):
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
                cvals.append(jnp.where(chas, cstack[jnp.maximum(csp - 1, 0)],
                                       jnp.int32(0)))
                csp = jnp.maximum(csp - 1, 0)
            return ncodes, cvals, nsp, csp

        def cluster_start_count(cval):
            start = jnp.clip(cval // 256, 0, tri_rows - k_cluster)
            return start, cval % 256

        def cluster_block(cval):
            start, count = cluster_start_count(cval)
            return _tri_getter(tri_ref[pl.ds(start, k_cluster), :],
                               False), count

        # streaming layout: lane-packed [T/8, 128] (8 tri-rows per
        # 128-lane row — a DMA slice must be 128-aligned in the lane dim,
        # so the resident [T, 16] layout cannot be streamed); cluster
        # starts are 8-aligned by pack.align_clusters_for_stream. Each
        # scratch slot is 8 rows so static slot slices stay 8-aligned.
        stream_rws = k_cluster * 16 // 128 if stream_tris else 0

        def cluster_dma(slot, start):
            return pltpu.make_async_copy(
                tri_ref.at[pl.ds(start // 8, stream_rws), :],
                tri_scratch.at[pl.ds(slot * 8, stream_rws), :],
                dma_sems.at[slot])

        def stream_block(slot):
            return _tri_getter(
                tri_scratch[pl.ds(slot * 8, stream_rws), :], True)

        def pops_t(nsp, csp):
            """pops() variant that also returns each entry's pushed t_near
            (empty pops yield +INF so the cull skips them)."""
            allow_nodes = csp < cmargin
            ncodes, ntmins = [], []
            for _ in range(node_pops):
                has = (nsp > 0) & allow_nodes
                top = jnp.maximum(nsp - 1, 0)
                ncodes.append(jnp.where(has, nstack[top], jnp.int32(-1)))
                ntmins.append(jnp.where(has, ntmin[top], jnp.float32(_INF)))
                nsp = jnp.where(has, nsp - 1, nsp)
            cvals, ctmins = [], []
            for _ in range(cluster_pops):
                chas = csp > 0
                ctop = jnp.maximum(csp - 1, 0)
                cvals.append(jnp.where(chas, cstack[ctop], jnp.int32(0)))
                ctmins.append(jnp.where(chas, ctmin[ctop],
                                        jnp.float32(_INF)))
                csp = jnp.maximum(csp - 1, 0)
            return ncodes, ntmins, cvals, ctmins, nsp, csp

        def node_children_t(c_node, limit):
            """node_children variant: per-child packet-min entry distance
            via masked min-reduces (replaces the bitfield any-hit)."""
            nid = jnp.clip(c_node, 0, num_nodes - 1)
            row = nodes_ref[pl.ds(nid, 1), :]
            crow = child_ref[pl.ds(nid, 1), :]
            ordw = _select_order_word(crow, oct_idx)
            codes, tmins = [], []
            for s in range(A):
                hit_s, tn_s = _slab(row, 6 * s, ox, oy, oz, ix, iy, iz,
                                    limit)
                tmins.append(jnp.min(jnp.where(hit_s, tn_s, _INF)))
                codes.append(crow[0, s])
            return codes, tmins, ordw

        def push_children_t(codes, tmins, ordw, nsp, csp):
            for pos in range(A - 1, -1, -1):
                slot = (ordw >> (4 * pos)) & 15
                csel = jnp.int32(-1)
                tsel = jnp.float32(_INF)
                for s in range(A):
                    is_s = slot == s
                    csel = jnp.where(is_s, codes[s], csel)
                    tsel = jnp.where(is_s, tmins[s], tsel)
                hsel = tsel < _INF
                is_node = hsel & (csel >= 0) & (nsp < nstack_depth)
                cpush = -(csel + 1)
                is_clus = hsel & (csel < 0) & (cpush > 0) & (
                    csp < cstack_depth)

                @pl.when(is_node)
                def _(csel=csel, tsel=tsel, nsp=nsp):
                    nstack[nsp] = csel
                    ntmin[nsp] = tsel

                nsp = nsp + is_node.astype(jnp.int32)

                @pl.when(is_clus)
                def _(cpush=cpush, tsel=tsel, csp=csp):
                    cstack[csp] = cpush
                    ctmin[csp] = tsel

                csp = csp + is_clus.astype(jnp.int32)
            return nsp, csp

        def node_children(c_node, limit):
            """Slab-test the A children of node `c_node` against `limit`
            (per-lane). Returns (codes, anyhits) scalars."""
            valid = c_node >= 0
            nid = jnp.clip(c_node, 0, num_nodes - 1)
            row = nodes_ref[pl.ds(nid, 1), :]
            crow = child_ref[pl.ds(nid, 1), :]
            ordw = _select_order_word(crow, oct_idx)
            hits = []
            codes = []
            for s in range(A):
                hit_s, _ = _slab(row, 6 * s, ox, oy, oz, ix, iy, iz, limit)
                hits.append(hit_s)
                codes.append(crow[0, s])
            anyh = _children_any_hit(hits)
            anyh = [h & valid for h in anyh]
            return codes, anyh, ordw

        def push_children(codes, anyh, ordw, nsp, csp):
            """Push hit children far-to-near per the octant order word."""
            for pos in range(A - 1, -1, -1):
                slot = (ordw >> (4 * pos)) & 15
                csel = jnp.int32(-1)
                hsel = False
                for s in range(A):
                    is_s = slot == s
                    csel = jnp.where(is_s, codes[s], csel)
                    hsel = jnp.logical_or(jnp.logical_and(is_s, anyh[s]),
                                          hsel)
                is_node = hsel & (csel >= 0) & (nsp < nstack_depth)
                is_clus = hsel & (csel < 0) & (csp < cstack_depth)

                @pl.when(is_node)
                def _(csel=csel, nsp=nsp):
                    nstack[nsp] = csel

                nsp = nsp + is_node.astype(jnp.int32)
                cpush = -(csel + 1)

                @pl.when(is_clus & (cpush > 0))
                def _(cpush=cpush, csp=csp):
                    cstack[csp] = cpush

                csp = csp + (is_clus & (cpush > 0)).astype(jnp.int32)
            return nsp, csp

        if any_hit:
            limit0 = tm - 1e-3

            def cond(c):
                step, nsp, csp, occ = c
                return ((nsp > 0) | (csp > 0)) & (jnp.min(occ) < 1) \
                    & (step < max_steps)

            def occ_cluster(get, count, occ):
                for j in range(k_cluster):
                    t, u, v, hitg = _mt_scalar_tri(
                        get, j, ox, oy, oz, dx, dy, dz)
                    occ = jnp.maximum(
                        occ, (hitg & (j < count)
                              & (t < limit0)).astype(jnp.int32))
                return occ

            def body(c):
                step, nsp, csp, occ = c
                ncodes, cvals, nsp, csp = pops(nsp, csp)
                live_limit = jnp.where(occ > 0, -1.0, limit0)
                if stream_tris:
                    scs = [cluster_start_count(cv) for cv in cvals]
                    dmas = [cluster_dma(i, s)
                            for i, (s, _) in enumerate(scs)]
                    for d in dmas:
                        d.start()
                    # node work rides the DMA latency
                    for c_node in ncodes:
                        codes, anyh, ordw = node_children(c_node, live_limit)
                        nsp, csp = push_children(codes, anyh, ordw, nsp, csp)
                    for i, (_, count) in enumerate(scs):
                        dmas[i].wait()
                        occ = occ_cluster(stream_block(i), count, occ)
                else:
                    for cval in cvals:
                        get, count = cluster_block(cval)
                        occ = occ_cluster(get, count, occ)
                    for c_node in ncodes:
                        codes, anyh, ordw = node_children(c_node, live_limit)
                        nsp, csp = push_children(codes, anyh, ordw, nsp, csp)
                return (step + 1, nsp, csp, occ)

            occ0 = (limit0 <= 0.0).astype(jnp.int32)
            final = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(1), jnp.int32(0), occ0))
            outs[0][0, :, :] = final[3]
        else:
            def cond(c):
                step, nsp, csp = c[0], c[1], c[2]
                return ((nsp > 0) | (csp > 0)) & (step < max_steps)

            def closest_cluster(get, count, bt, btri, bu, bv):
                for j in range(k_cluster):
                    t, u, v, hitg = _mt_scalar_tri(
                        get, j, ox, oy, oz, dx, dy, dz)
                    hit = hitg & (j < count) & (t < bt)
                    tri_id = get(j, 9).astype(jnp.int32)
                    bt = jnp.where(hit, t, bt)
                    btri = jnp.where(hit, tri_id, btri)
                    bu = jnp.where(hit, u, bu)
                    bv = jnp.where(hit, v, bv)
                return bt, btri, bu, bv

            def body_cull(c):
                step, nsp, csp, bt, btri, bu, bv = c
                ncodes, ntmins, cvals, ctmins, nsp, csp = pops_t(nsp, csp)
                btmax = jnp.max(bt)  # bt only shrinks: start-of-iter is safe
                for cval, ct in zip(cvals, ctmins):
                    def do_cluster(args, cval=cval):
                        get, count = cluster_block(cval)
                        return closest_cluster(get, count, *args)

                    bt, btri, bu, bv = jax.lax.cond(
                        ct <= btmax, do_cluster, lambda a: a,
                        (bt, btri, bu, bv))
                for c_node, nt in zip(ncodes, ntmins):
                    def do_node(args, c_node=c_node):
                        codes, tmins, ordw = node_children_t(c_node, bt)
                        return push_children_t(codes, tmins, ordw, *args)

                    nsp, csp = jax.lax.cond(
                        (c_node >= 0) & (nt <= btmax), do_node,
                        lambda a: a, (nsp, csp))
                return (step + 1, nsp, csp, bt, btri, bu, bv)

            def body(c):
                step, nsp, csp, bt, btri, bu, bv = c
                ncodes, cvals, nsp, csp = pops(nsp, csp)
                if stream_tris:
                    scs = [cluster_start_count(cv) for cv in cvals]
                    dmas = [cluster_dma(i, s)
                            for i, (s, _) in enumerate(scs)]
                    for d in dmas:
                        d.start()
                    # node work rides the DMA latency (bt is one cluster
                    # staler than the VMEM path — pruning only, not
                    # correctness)
                    for c_node in ncodes:
                        codes, anyh, ordw = node_children(c_node, bt)
                        nsp, csp = push_children(codes, anyh, ordw, nsp, csp)
                    for i, (_, count) in enumerate(scs):
                        dmas[i].wait()
                        bt, btri, bu, bv = closest_cluster(
                            stream_block(i), count, bt, btri, bu, bv)
                else:
                    for cval in cvals:
                        get, count = cluster_block(cval)
                        bt, btri, bu, bv = closest_cluster(
                            get, count, bt, btri, bu, bv)
                    for c_node in ncodes:
                        codes, anyh, ordw = node_children(c_node, bt)
                        nsp, csp = push_children(codes, anyh, ordw, nsp, csp)
                return (step + 1, nsp, csp, bt, btri, bu, bv)

            init = (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                    jnp.minimum(tm, _INF), neg1, zeros, zeros)
            final = jax.lax.while_loop(cond, body_cull if t_cull else body,
                                       init)
            outs[0][0, :, :] = final[3]
            outs[1][0, :, :] = final[4]
            outs[2][0, :, :] = final[5]
            outs[3][0, :, :] = final[6]

    return kernel


# knobs for the wide kernel (swept on hardware; see benchmarks/traversal.py:
# arity4/K16/pops4/group2 measured best on sorted bounce rays — 3.17 vs
# 1.41 Mrays/s for the round-2-start arity8/group8 — because the visit
# union of a large group is barely smaller than separate unions, so the
# dense per-visit work dominates; coherent primaries prefer group 4-8).
# Stack bounds: nstack holds a DFS frontier <= (arity-1) * tree levels +
# pops; cstack is drained-before-overflow by the pop throttle.
NODE_POPS = 4
CLUSTER_POPS = 4
GROUP = 2  # super-packet = GROUP * 1024 rays per shared stack
NSTACK_DEPTH = 192
CSTACK_DEPTH = 1024


def _tile_rays_grouped(ori: Vec3, d: Vec3, t_max: jnp.ndarray, group: int):
    """Pad + reshape rays to (nt, group*8, 128) super-packet tiles
    (padded rays carry t_max=0; a fully-padded super-packet exits after
    one root test)."""
    n = ori.shape[0]
    rows = SUBLANES * group
    n_pad = -(-n // (PACKET * group)) * PACKET * group
    nt = n_pad // (PACKET * group)

    def pad3(v):
        return jnp.pad(v, (0, n_pad - n)).reshape(nt, rows, LANES)

    return (
        pad3(ori.x), pad3(ori.y), pad3(ori.z),
        pad3(d.x), pad3(d.y), pad3(d.z),
        jnp.pad(t_max, (0, n_pad - n),
                constant_values=-1.0).reshape(nt, rows, LANES),
        nt, n,
    )


@functools.partial(jax.jit,
                   static_argnames=("stack_depth", "node_pops", "group",
                                    "cluster_pops", "t_cull"))
def packet_closest_hit_wide(pack: PacketBVH, ori: Vec3, d: Vec3,
                            t_max: jnp.ndarray, stack_depth: int = NSTACK_DEPTH,
                            node_pops: int = NODE_POPS,
                            group: int = GROUP,
                            cluster_pops: int = CLUSTER_POPS,
                            t_cull: bool = False) -> HitRecord:
    rows = SUBLANES * group
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays_grouped(ori, d, t_max,
                                                           group)
    stream = pack.stream_tris
    # streaming tri table is lane-packed [T/8, 128]; tri_rows is always
    # in triangle units for the start clip
    tri_count = pack.tri_f32.shape[0] * (8 if stream else 1)
    kernel = _make_kernel_wide(
        pack.num_nodes, pack.max_cluster, stack_depth, CSTACK_DEPTH,
        any_hit=False, tri_rows=tri_count, arity=pack.arity,
        node_pops=node_pops, rows=rows, cluster_pops=cluster_pops,
        stream_tris=stream, t_cull=t_cull and not stream)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY) if stream else tab_spec
    scratch = [pltpu.SMEM((stack_depth + 2,), jnp.int32),
               pltpu.SMEM((CSTACK_DEPTH + 2,), jnp.int32)]
    if stream:
        scratch += [
            pltpu.VMEM((cluster_pops * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((cluster_pops,)),
        ]
    elif t_cull:
        scratch += [pltpu.SMEM((stack_depth + 2,), jnp.float32),
                    pltpu.SMEM((CSTACK_DEPTH + 2,), jnp.float32)]
    out_shape = [
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nt, rows, LANES), jnp.float32),
    ]
    bt, btri, bu, bv = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 2 + [tri_spec],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.node_f32, pack.node_child, pack.tri_f32)

    flat = lambda a: a.reshape(-1)[:n]
    bt = flat(bt)
    btri = flat(btri)
    return HitRecord(
        t=jnp.where(btri >= 0, bt, FLT_MAX),
        tri=btri,
        u=flat(bu),
        v=flat(bv),
    )


@functools.partial(jax.jit,
                   static_argnames=("stack_depth", "node_pops", "group",
                                    "cluster_pops"))
def packet_any_hit_wide(pack: PacketBVH, ori: Vec3, d: Vec3,
                        t_max: jnp.ndarray, stack_depth: int = NSTACK_DEPTH,
                        node_pops: int = NODE_POPS,
                        group: int = GROUP,
                        cluster_pops: int = CLUSTER_POPS) -> jnp.ndarray:
    rows = SUBLANES * group
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays_grouped(ori, d, t_max,
                                                           group)
    stream = pack.stream_tris
    tri_count = pack.tri_f32.shape[0] * (8 if stream else 1)
    kernel = _make_kernel_wide(
        pack.num_nodes, pack.max_cluster, stack_depth, CSTACK_DEPTH,
        any_hit=True, tri_rows=tri_count, arity=pack.arity,
        node_pops=node_pops, rows=rows, cluster_pops=cluster_pops,
        stream_tris=stream)
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY) if stream else tab_spec
    scratch = [pltpu.SMEM((stack_depth + 2,), jnp.int32),
               pltpu.SMEM((CSTACK_DEPTH + 2,), jnp.int32)]
    if stream:
        scratch += [
            pltpu.VMEM((cluster_pops * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((cluster_pops,)),
        ]
    occ = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 2 + [tri_spec],
        out_specs=[ray_spec],
        out_shape=[jax.ShapeDtypeStruct((nt, rows, LANES), jnp.int32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.node_f32, pack.node_child, pack.tri_f32)[0]
    return occ.reshape(-1)[:n].astype(bool)
