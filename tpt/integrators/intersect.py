"""Ray-scene intersection: Möller–Trumbore triangle test and the
brute-force all-triangles intersector (reference: /root/reference/src/
intersections.cu:10-32 for the primitive tests).

The brute-force path is the BRUTE_FORCE RayCastBackend: for each ray it
scans every triangle in fixed-size chunks with a lax.fori_loop reduction —
for small scenes (Cornell box class) this is MXU/VPU-dense and beats
traversal overhead; it is also the oracle the BVH backends are tested
against.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.vec import Vec3
from ..scene.structs import MeshData

FLT_MAX = jnp.float32(3.4e38)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HitRecord:
    t: jnp.ndarray         # f32[N], FLT_MAX = miss
    tri: jnp.ndarray       # int32[N], -1 = miss
    u: jnp.ndarray         # f32[N] barycentric
    v: jnp.ndarray         # f32[N]

    @property
    def hit_mask(self):
        return self.tri >= 0


def moller_trumbore(
    ori: Vec3, d: Vec3,
    v0: Vec3, v1: Vec3, v2: Vec3,
    eps: float = 1e-9,
):
    """Watertight-enough Möller–Trumbore; lane-parallel over rays×tris
    (callers broadcast). Returns (t, u, v, hit) with t>0 on hit."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = d.cross(e2)
    det = e1.dot(pvec)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = ori - v0
    u = tvec.dot(pvec) * inv_det
    qvec = tvec.cross(e1)
    v = d.dot(qvec) * inv_det
    t = e2.dot(qvec) * inv_det
    hit = (
        (jnp.abs(det) > eps)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > 1e-4)
    )
    return t, u, v, hit


def aabb_hit(ori: Vec3, inv_d: Vec3, bmin: Vec3, bmax: Vec3, t_max):
    """Slab test; returns (hit, t_near)."""
    t0 = (bmin - ori) * inv_d
    t1 = (bmax - ori) * inv_d
    tsm = Vec3(jnp.minimum(t0.x, t1.x), jnp.minimum(t0.y, t1.y), jnp.minimum(t0.z, t1.z))
    tbg = Vec3(jnp.maximum(t0.x, t1.x), jnp.maximum(t0.y, t1.y), jnp.maximum(t0.z, t1.z))
    t_near = jnp.maximum(tsm.max_component(), 0.0)
    t_far = jnp.minimum(tbg.min_component(), t_max)
    return t_near <= t_far, t_near


def brute_force_closest_hit(mesh: MeshData, ori: Vec3, d: Vec3,
                            t_max=None, chunk: int = 512) -> HitRecord:
    """Closest hit over all triangles: fixed-size triangle chunks are
    broadcast against all rays (rays in lanes, chunk reduction in a scan)."""
    n_rays = ori.shape[0]
    n_tris = mesh.num_triangles
    n_chunks = max(1, -(-n_tris // chunk))

    if t_max is None:
        t_max = jnp.full((n_rays,), FLT_MAX)

    def body(c, carry):
        best_t, best_tri, best_u, best_v = carry
        base = c * chunk
        tri_ids = base + jnp.arange(chunk, dtype=jnp.int32)
        tri_valid = tri_ids < n_tris
        v0, v1, v2 = mesh.tri_vertices(tri_ids)  # Vec3[chunk]

        # broadcast rays [N,1] against tris [1,C]
        o_b = Vec3(ori.x[:, None], ori.y[:, None], ori.z[:, None])
        d_b = Vec3(d.x[:, None], d.y[:, None], d.z[:, None])
        v0b = Vec3(v0.x[None, :], v0.y[None, :], v0.z[None, :])
        v1b = Vec3(v1.x[None, :], v1.y[None, :], v1.z[None, :])
        v2b = Vec3(v2.x[None, :], v2.y[None, :], v2.z[None, :])

        t, u, v, hit = moller_trumbore(o_b, d_b, v0b, v1b, v2b)
        hit = hit & tri_valid[None, :] & (t < best_t[:, None]) & (t < t_max[:, None])
        t_masked = jnp.where(hit, t, FLT_MAX)
        arg = jnp.argmin(t_masked, axis=1)
        row = jnp.arange(n_rays)
        cand_t = t_masked[row, arg]
        improved = cand_t < best_t
        best_t = jnp.where(improved, cand_t, best_t)
        best_tri = jnp.where(improved, tri_ids[arg], best_tri)
        best_u = jnp.where(improved, u[row, arg], best_u)
        best_v = jnp.where(improved, v[row, arg], best_v)
        return best_t, best_tri, best_u, best_v

    init = (
        jnp.full((n_rays,), FLT_MAX),
        jnp.full((n_rays,), -1, jnp.int32),
        jnp.zeros((n_rays,)),
        jnp.zeros((n_rays,)),
    )
    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(0, n_chunks, body, init)
    return HitRecord(t=best_t, tri=best_tri, u=best_u, v=best_v)


def brute_force_any_hit(mesh: MeshData, ori: Vec3, d: Vec3, t_max,
                        chunk: int = 512) -> jnp.ndarray:
    """Occlusion query: True where the segment [EPS, t_max) is blocked."""
    n_rays = ori.shape[0]
    n_tris = mesh.num_triangles
    n_chunks = max(1, -(-n_tris // chunk))

    def body(c, occluded):
        base = c * chunk
        tri_ids = base + jnp.arange(chunk, dtype=jnp.int32)
        tri_valid = tri_ids < n_tris
        v0, v1, v2 = mesh.tri_vertices(tri_ids)
        o_b = Vec3(ori.x[:, None], ori.y[:, None], ori.z[:, None])
        d_b = Vec3(d.x[:, None], d.y[:, None], d.z[:, None])
        v0b = Vec3(v0.x[None, :], v0.y[None, :], v0.z[None, :])
        v1b = Vec3(v1.x[None, :], v1.y[None, :], v1.z[None, :])
        v2b = Vec3(v2.x[None, :], v2.y[None, :], v2.z[None, :])
        t, u, v, hit = moller_trumbore(o_b, d_b, v0b, v1b, v2b)
        hit = hit & tri_valid[None, :] & (t < t_max[:, None] - 1e-3)
        return occluded | jnp.any(hit, axis=1)

    return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((n_rays,), bool))
