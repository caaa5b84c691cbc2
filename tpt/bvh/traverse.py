"""BVH traversal in pure XLA: lockstep masked traversal with a per-lane
short stack (closest hit, ordered near-child-first like the reference's
/root/reference/src/kernels/ray_cast.cu:12-122) and stackless escape-link
walking (any hit, ray_cast.cu:125-201).

All rays advance one traversal step per `lax.while_loop` iteration with
dead lanes masked — the XLA-portable baseline backend. The Pallas kernel
backend (bvh/pallas_traverse.py) is the performance path; this one is the
correctness oracle that runs anywhere (including the CPU test mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.vec import Vec3, where as vwhere
from ..scene.structs import LBVHData, MeshData
from ..integrators.intersect import FLT_MAX, HitRecord, moller_trumbore


def _prep(bvh: LBVHData):
    n = bvh.num_triangles
    num_internal = n - 1
    return n, num_internal


def _child_aabb_hit(bvh: LBVHData, child, ori: Vec3, inv_d: Vec3, t_best):
    bmin = bvh.aabb_min.take(child)
    bmax = bvh.aabb_max.take(child)
    t0 = (bmin - ori) * inv_d
    t1 = (bmax - ori) * inv_d
    tn = Vec3(jnp.minimum(t0.x, t1.x), jnp.minimum(t0.y, t1.y), jnp.minimum(t0.z, t1.z))
    tf = Vec3(jnp.maximum(t0.x, t1.x), jnp.maximum(t0.y, t1.y), jnp.maximum(t0.z, t1.z))
    t_near = jnp.maximum(tn.max_component(), 0.0)
    t_far = jnp.minimum(tf.min_component(), t_best)
    return t_near <= t_far, t_near


@partial(jax.jit, static_argnames=("stack_depth",))
def _closest_hit_impl(mesh: MeshData, bvh: LBVHData, ori: Vec3, d: Vec3,
                      t_max: jnp.ndarray, stack_depth: int = 32) -> HitRecord:
    n_rays = ori.shape[0]
    n, num_internal = _prep(bvh)

    inv_d = Vec3(
        1.0 / jnp.where(jnp.abs(d.x) > 1e-12, d.x, jnp.where(d.x >= 0, 1e-12, -1e-12)),
        1.0 / jnp.where(jnp.abs(d.y) > 1e-12, d.y, jnp.where(d.y >= 0, 1e-12, -1e-12)),
        1.0 / jnp.where(jnp.abs(d.z) > 1e-12, d.z, jnp.where(d.z >= 0, 1e-12, -1e-12)),
    )

    stack = jnp.zeros((n_rays, stack_depth), jnp.int32)
    sp = jnp.zeros((n_rays,), jnp.int32)
    node = jnp.zeros((n_rays,), jnp.int32)  # root
    active = jnp.ones((n_rays,), bool)
    best_t = jnp.minimum(jnp.full((n_rays,), FLT_MAX), t_max)
    best_tri = jnp.full((n_rays,), -1, jnp.int32)
    best_u = jnp.zeros((n_rays,))
    best_v = jnp.zeros((n_rays,))

    def cond(state):
        return jnp.any(state[3])

    def body(state):
        stack, sp, node, active, best_t, best_tri, best_u, best_v = state
        node_c = jnp.clip(node, 0, 2 * n - 2)
        is_leaf = node_c >= num_internal

        # ---- leaf: triangle test -----------------------------------------
        tri = jnp.take(bvh.prim_index, node_c, mode="clip")
        tri_c = jnp.maximum(tri, 0)
        v0, v1, v2 = mesh.tri_vertices(tri_c)
        t, u, v, hit = moller_trumbore(ori, d, v0, v1, v2)
        leaf_hit = active & is_leaf & hit & (t < best_t)
        best_t = jnp.where(leaf_hit, t, best_t)
        best_tri = jnp.where(leaf_hit, tri_c, best_tri)
        best_u = jnp.where(leaf_hit, u, best_u)
        best_v = jnp.where(leaf_hit, v, best_v)

        # ---- internal: test both children ---------------------------------
        lc = jnp.take(bvh.left, node_c, mode="clip")
        rc = jnp.take(bvh.right, node_c, mode="clip")
        lc_c = jnp.maximum(lc, 0)
        rc_c = jnp.maximum(rc, 0)
        lhit, lt = _child_aabb_hit(bvh, lc_c, ori, inv_d, best_t)
        rhit, rt = _child_aabb_hit(bvh, rc_c, ori, inv_d, best_t)
        internal = active & ~is_leaf
        lhit = internal & lhit
        rhit = internal & rhit

        both = lhit & rhit
        near_is_left = lt <= rt
        near = jnp.where(near_is_left, lc_c, rc_c)
        far = jnp.where(near_is_left, rc_c, lc_c)
        one = lhit ^ rhit
        only = jnp.where(lhit, lc_c, rc_c)

        # push far child when both hit
        push = both & (sp < stack_depth)
        sp_idx = jnp.clip(sp, 0, stack_depth - 1)
        row = jnp.arange(n_rays)
        stack = stack.at[row, sp_idx].set(
            jnp.where(push, far, stack[row, sp_idx]))
        sp = jnp.where(push, sp + 1, sp)

        descend = both | one
        next_node = jnp.where(both, near, only)

        # pop for: leaves, and internals with no child hit
        need_pop = active & ~descend
        can_pop = need_pop & (sp > 0)
        sp_pop = jnp.clip(sp - 1, 0, stack_depth - 1)
        popped = stack[row, sp_pop]
        node = jnp.where(descend, next_node, jnp.where(can_pop, popped, node))
        sp = jnp.where(can_pop, sp - 1, sp)
        active = active & (descend | can_pop)

        return stack, sp, node, active, best_t, best_tri, best_u, best_v

    state = (stack, sp, node, active, best_t, best_tri, best_u, best_v)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, best_t, best_tri, best_u, best_v = state
    best_t = jnp.where(best_tri >= 0, best_t, FLT_MAX)
    return HitRecord(t=best_t, tri=best_tri, u=best_u, v=best_v)


def bvh_closest_hit(mesh: MeshData, bvh: LBVHData, ori: Vec3, d: Vec3,
                    t_max=None, stack_depth: int = 32) -> HitRecord:
    if t_max is None:
        t_max = jnp.full((ori.shape[0],), FLT_MAX)
    return _closest_hit_impl(mesh, bvh, ori, d, t_max, stack_depth=stack_depth)


@partial(jax.jit, static_argnames=("stack_depth",))
def traversal_cost(mesh: MeshData, bvh: LBVHData, ori: Vec3, d: Vec3,
                   stack_depth: int = 64) -> jnp.ndarray:
    """Per-ray traversal step counts — the data behind the reference's BVH
    heatmap debug view (/root/reference/src/bvh.cu:518-641). Runs the same
    lockstep walk counting active steps per lane."""
    n_rays = ori.shape[0]
    t_max = jnp.full((n_rays,), FLT_MAX)
    # piggyback on closest-hit by re-running its loop with a counter
    n, num_internal = _prep(bvh)
    inv_d = Vec3(
        1.0 / jnp.where(jnp.abs(d.x) > 1e-12, d.x, 1e-12),
        1.0 / jnp.where(jnp.abs(d.y) > 1e-12, d.y, 1e-12),
        1.0 / jnp.where(jnp.abs(d.z) > 1e-12, d.z, 1e-12),
    )

    def cond(state):
        node, _ = state
        return jnp.any(node >= 0)

    def body(state):
        node, count = state
        live = node >= 0
        node_c = jnp.clip(node, 0, 2 * n - 2)
        is_leaf = node_c >= num_internal
        count = count + live.astype(jnp.int32)
        bhit, _ = _child_aabb_hit(bvh, node_c, ori, inv_d, t_max)
        descend = live & ~is_leaf & bhit
        lc = jnp.maximum(jnp.take(bvh.left, node_c, mode="clip"), 0)
        esc = jnp.take(bvh.escape, node_c, mode="clip")
        node = jnp.where(live, jnp.where(descend, lc, esc), -1)
        return node, count

    _, count = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((n_rays,), jnp.int32), jnp.zeros((n_rays,), jnp.int32)))
    return count


@jax.jit
def bvh_any_hit(mesh: MeshData, bvh: LBVHData, ori: Vec3, d: Vec3,
                t_max: jnp.ndarray) -> jnp.ndarray:
    """Occlusion query via stackless escape-index walk (shadow rays)."""
    n_rays = ori.shape[0]
    n, num_internal = _prep(bvh)

    inv_d = Vec3(
        1.0 / jnp.where(jnp.abs(d.x) > 1e-12, d.x, jnp.where(d.x >= 0, 1e-12, -1e-12)),
        1.0 / jnp.where(jnp.abs(d.y) > 1e-12, d.y, jnp.where(d.y >= 0, 1e-12, -1e-12)),
        1.0 / jnp.where(jnp.abs(d.z) > 1e-12, d.z, jnp.where(d.z >= 0, 1e-12, -1e-12)),
    )
    limit = t_max - 1e-3  # match the reference shadow-segment shrink

    def cond(state):
        node, occluded = state
        return jnp.any(node >= 0)

    def body(state):
        node, occluded = state
        live = node >= 0
        node_c = jnp.clip(node, 0, 2 * n - 2)
        is_leaf = node_c >= num_internal

        tri = jnp.maximum(jnp.take(bvh.prim_index, node_c, mode="clip"), 0)
        v0, v1, v2 = mesh.tri_vertices(tri)
        t, _, _, hit = moller_trumbore(ori, d, v0, v1, v2)
        newly = live & is_leaf & hit & (t < limit)
        occluded = occluded | newly

        bhit, _ = _child_aabb_hit(bvh, node_c, ori, inv_d, limit)
        descend = live & ~is_leaf & bhit
        lc = jnp.maximum(jnp.take(bvh.left, node_c, mode="clip"), 0)
        esc = jnp.take(bvh.escape, node_c, mode="clip")
        nxt = jnp.where(descend, lc, esc)
        node = jnp.where(live & ~occluded, nxt, -1)
        return node, occluded

    node0 = jnp.zeros((n_rays,), jnp.int32)
    occ0 = jnp.zeros((n_rays,), bool)
    _, occluded = jax.lax.while_loop(cond, body, (node0, occ0))
    return occluded
