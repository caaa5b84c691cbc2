"""Sub-packet traversal kernel (v2): 8 independent 128-ray packets per
(8, 128) tile, each sublane row walking its own stack.

Rationale (measured on v5e): the v1 single-packet kernel is latency-bound —
~370 ns/step of which only ~100 ns is VPU issue; the rest is the dynamic
slice, scalar syncs and reduces, serialized once per node visit. Here each
step processes EIGHT nodes (one per sublane row): the eight fetches,
scalar reads and row updates pipeline against each other, and every VPU op
still runs on the full tile. Divergence waste also drops ~8x because a
packet is 128 coherent rays instead of 1024.

Mosaic-shaped mechanics:
- fetched node rows land in an (8, 16) VMEM scratch; a per-row scalar
  becomes scratch[:, j:j+1] -> lane broadcast to (8, 128)
  (sublane-preserving broadcasts lower; (1,1)->(8,128) does not)
- per-row child codes stay in SMEM int32 scratch (they exceed f32's exact
  integer range)
- per-row reductions (min t_near) are written to a VMEM scratch column,
  then read back row-by-row for the SMEM stack updates
- cluster triangles land in an (8, K, 16) VMEM scratch; iteration jj reads
  the static slice [:, jj, :]
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
from .pallas_traverse import _interpret, _tile_rays, _safe_inv, LANES, SUBLANES

_INF = 3.0e38
_DONE = -(2 ** 30)  # sentinel child code for inactive rows


def _make_kernel_v2(num_nodes: int, k_cluster: int, stack_depth: int,
                    tri_rows: int, any_hit: bool):
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, child_ref, tri_ref,
               *refs):
        if any_hit:
            occ_ref = refs[0]
            stack_ref, sp_ref, codes_ref, nrow_ref, trow_ref, red_ref = refs[1:7]
        else:
            t_ref, tri_out_ref, u_ref, v_ref = refs[0:4]
            stack_ref, sp_ref, codes_ref, nrow_ref, trow_ref, red_ref = refs[4:10]

        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        ix = _safe_inv(dx)
        iy = _safe_inv(dy)
        iz = _safe_inv(dz)
        tmax = tmax_ref[0]

        for r in range(SUBLANES):
            stack_ref[r * stack_depth] = jnp.int32(0)
            sp_ref[r] = jnp.int32(1)

        if any_hit:
            limit = tmax - 1e-3
            occ0 = (limit <= 0.0).astype(jnp.int32)
            carry0 = (jnp.int32(0), occ0)
        else:
            limit = None
            carry0 = (jnp.int32(0),
                      jnp.minimum(tmax, _INF),
                      jnp.full((SUBLANES, LANES), -1, jnp.int32),
                      jnp.zeros((SUBLANES, LANES), jnp.float32),
                      jnp.zeros((SUBLANES, LANES), jnp.float32))

        max_steps = 4 * num_nodes + 4096

        def fetch():
            """Pop one code per row; stage node boxes / cluster triangles
            into scratch. codes_ref layout per row r: [2r]=left child code,
            [2r+1]=right child code (or _DONE); red col 3 = cluster count."""
            for r in range(SUBLANES):
                sp = sp_ref[r]
                has = sp > 0
                code = jnp.where(
                    has, stack_ref[r * stack_depth + jnp.maximum(sp - 1, 0)],
                    jnp.int32(_DONE))
                sp_ref[r] = jnp.maximum(sp - 1, 0)

                is_node = has & (code >= 0)
                nid = jnp.clip(code, 0, num_nodes - 1)
                nrow_ref[r:r + 1, :] = jnp.where(
                    is_node, nodes_ref[pl.ds(nid, 1), :], _INF)
                crow = child_ref[pl.ds(nid, 1), :]
                codes_ref[2 * r] = jnp.where(is_node, crow[0, 0],
                                             jnp.int32(_DONE))
                codes_ref[2 * r + 1] = jnp.where(is_node, crow[0, 1],
                                                 jnp.int32(_DONE))

                is_cluster = has & (code < 0) & (code > _DONE)
                val = -(code + 1)
                start = jnp.clip(val // 256, 0, tri_rows - k_cluster)
                count = jnp.where(is_cluster, val % 256, 0)
                red_ref[r:r + 1, 3:4] = count.astype(jnp.float32).reshape(1, 1)
                trow_ref[r, :, :] = jnp.where(
                    is_cluster,
                    tri_ref[pl.ds(start, k_cluster), :],
                    0.0,
                )

        def nbc(j):
            return jnp.broadcast_to(nrow_ref[:, j:j + 1], (SUBLANES, LANES))

        def node_phase(bt_like):
            def slab(base):
                t0x = (nbc(base + 0) - ox) * ix
                t0y = (nbc(base + 1) - oy) * iy
                t0z = (nbc(base + 2) - oz) * iz
                t1x = (nbc(base + 3) - ox) * ix
                t1y = (nbc(base + 4) - oy) * iy
                t1z = (nbc(base + 5) - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), bt_like))
                return (tn <= tf), tn

            lhit, ltn = slab(0)
            rhit, rtn = slab(6)
            return lhit, ltn, rhit, rtn

        def cluster_tri_tests(fn):
            """Calls fn(jj, hit_geom, tt, uu, vv, tri_id) for each cluster
            slot jj with full-tile test results."""
            count8 = jnp.broadcast_to(red_ref[:, 3:4], (SUBLANES, LANES))
            for jj in range(k_cluster):
                tri8 = trow_ref[:, jj, :]  # (8, 16)

                def c(j):
                    return jnp.broadcast_to(tri8[:, j:j + 1], (SUBLANES, LANES))

                v0x, v0y, v0z = c(0), c(1), c(2)
                e1x, e1y, e1z = c(3), c(4), c(5)
                e2x, e2y, e2z = c(6), c(7), c(8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                ok = jnp.abs(det) > 1e-9
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = (ok & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
                       & (uu + vv <= 1.0) & (tt > 1e-4) & (jj < count8))
                tri_id = c(9).astype(jnp.int32)
                fn(jj, hit, tt, uu, vv, tri_id)

        def push(r, code, ok):
            sp = sp_ref[r]
            do = ok & (sp < stack_depth)

            @pl.when(do)
            def _():
                stack_ref[r * stack_depth + sp] = code

            sp_ref[r] = sp + do.astype(jnp.int32)

        def live_rows():
            total = jnp.int32(0)
            for r in range(SUBLANES):
                total = total + sp_ref[r]
            return total

        if any_hit:
            def cond(c):
                step, occ = c
                return ((live_rows() > 0) & (step < max_steps)
                        & (jnp.min(occ) < 1))

            def body(c):
                step, occ = c
                fetch()
                live_limit = jnp.where(occ > 0, 0.0, limit)
                lhit, _, rhit, _ = node_phase(live_limit)

                occ_box = [occ]

                def on_tri(jj, hit, tt, uu, vv, tri_id):
                    occ_box[0] = jnp.maximum(
                        occ_box[0],
                        (hit & (tt < live_limit)).astype(jnp.int32))

                cluster_tri_tests(on_tri)
                occ = occ_box[0]

                red_ref[:, 4:5] = jnp.max(jnp.where(lhit, 1.0, 0.0), axis=1,
                                          keepdims=True)
                red_ref[:, 5:6] = jnp.max(jnp.where(rhit, 1.0, 0.0), axis=1,
                                          keepdims=True)
                for r in range(SUBLANES):
                    rr = red_ref[r:r + 1, :]
                    cl = codes_ref[2 * r]
                    cr = codes_ref[2 * r + 1]
                    is_node = cl != _DONE
                    push(r, cl, is_node & (rr[0, 4] > 0.0))
                    push(r, cr, is_node & (rr[0, 5] > 0.0))
                return step + 1, occ

            _, occ_f = jax.lax.while_loop(cond, body, carry0)
            occ_ref[0, :, :] = occ_f
        else:
            def cond(c):
                return (live_rows() > 0) & (c[0] < max_steps)

            def body(c):
                step, bt, btri, bu, bv = c
                fetch()
                lhit, ltn, rhit, rtn = node_phase(bt)

                box = [bt, btri, bu, bv]

                def on_tri(jj, hit, tt, uu, vv, tri_id):
                    bt0, btri0, bu0, bv0 = box
                    better = hit & (tt < bt0)
                    box[0] = jnp.where(better, tt, bt0)
                    box[1] = jnp.where(better, tri_id, btri0)
                    box[2] = jnp.where(better, uu, bu0)
                    box[3] = jnp.where(better, vv, bv0)

                cluster_tri_tests(on_tri)
                bt, btri, bu, bv = box

                red_ref[:, 4:5] = jnp.min(jnp.where(lhit, ltn, _INF), axis=1,
                                          keepdims=True)
                red_ref[:, 5:6] = jnp.min(jnp.where(rhit, rtn, _INF), axis=1,
                                          keepdims=True)
                for r in range(SUBLANES):
                    rr = red_ref[r:r + 1, :]
                    cl = codes_ref[2 * r]
                    cr = codes_ref[2 * r + 1]
                    is_node = cl != _DONE
                    ml = rr[0, 4]
                    mr = rr[0, 5]
                    l_first = ml <= mr
                    near = jnp.where(l_first, cl, cr)
                    far = jnp.where(l_first, cr, cl)
                    near_ok = jnp.where(l_first, ml, mr) < _INF
                    far_ok = jnp.where(l_first, mr, ml) < _INF
                    push(r, far, is_node & far_ok)
                    push(r, near, is_node & near_ok)
                return step + 1, bt, btri, bu, bv

            _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, carry0)
            t_ref[0, :, :] = bt
            tri_out_ref[0, :, :] = btri
            u_ref[0, :, :] = bu
            v_ref[0, :, :] = bv

    return kernel


def _scratches(k_cluster: int, stack_depth: int):
    return [
        pltpu.SMEM((SUBLANES * stack_depth + 2,), jnp.int32),  # stacks
        pltpu.SMEM((SUBLANES + 2,), jnp.int32),                # stack ptrs
        pltpu.SMEM((2 * SUBLANES + 2,), jnp.int32),            # child codes
        pltpu.VMEM((SUBLANES, 16), jnp.float32),               # node rows
        pltpu.VMEM((SUBLANES, k_cluster, 16), jnp.float32),    # cluster tris
        pltpu.VMEM((SUBLANES, 16), jnp.float32),               # reductions
    ]


def _call(pack: PacketBVH, ori, d, t_max, stack_depth, any_hit):
    ox, oy, oz, dx, dy, dz, tm, nt, n = _tile_rays(ori, d, t_max)
    kernel = _make_kernel_v2(pack.num_nodes, pack.max_cluster, stack_depth,
                             pack.tri_f32.shape[0], any_hit=any_hit)
    ray_spec = pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if any_hit:
        out_shape = [jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.int32)]
        out_specs = [ray_spec]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.float32),
        ]
        out_specs = [ray_spec] * 4
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [tab_spec] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=_scratches(pack.max_cluster, stack_depth),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(ox, oy, oz, dx, dy, dz, tm, pack.node_f32, pack.node_child, pack.tri_f32)
    return outs, n


@functools.partial(jax.jit, static_argnames=("stack_depth",))
def packet_closest_hit_v2(pack: PacketBVH, ori: Vec3, d: Vec3,
                          t_max: jnp.ndarray, stack_depth: int = 48
                          ) -> HitRecord:
    (bt, btri, bu, bv), n = _call(pack, ori, d, t_max, stack_depth, False)
    flat = lambda a: a.reshape(-1)[:n]
    bt = flat(bt)
    btri = flat(btri)
    return HitRecord(t=jnp.where(btri >= 0, bt, FLT_MAX), tri=btri,
                     u=flat(bu), v=flat(bv))


@functools.partial(jax.jit, static_argnames=("stack_depth",))
def packet_any_hit_v2(pack: PacketBVH, ori: Vec3, d: Vec3,
                      t_max: jnp.ndarray, stack_depth: int = 48) -> jnp.ndarray:
    (occ,), n = _call(pack, ori, d, t_max, stack_depth, True)
    return occ.reshape(-1)[:n].astype(bool)
