"""Bounce-ray coherence sorting.

Secondary-bounce rays scatter in direction, and packet traversal
(bvh/pallas_traverse.py) degrades ~20x when the 1024 rays of a packet
disagree about where to go (measured: 8.5 Mrays/s coherent vs 0.37
incoherent at 143k tris on v5e). Before traversal we therefore sort rays
by a (origin-cell morton, direction octant) key so each packet sees rays
from one locale heading one way — the TPU-native replacement for the
reference's thrust material sort (which optimizes shading divergence; here
the scarce resource is traversal coherence).

Cost: one lax.sort + ~10 full-lane gathers per bounce (~0.2-0.3 s at 2M
rays) against multi-second traversal savings on large scenes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.vec import Vec3


def _quantize(c: jnp.ndarray, lo: jnp.ndarray, inv_extent: jnp.ndarray,
              bits: int) -> jnp.ndarray:
    n = (1 << bits) - 1
    return jnp.clip(((c - lo) * inv_extent * (1 << bits)).astype(jnp.int32),
                    0, n)


def _interleave7(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 7 bits to every 3rd position (the proven 10-bit expander from
    bvh.build handles any <=10-bit input)."""
    from ..bvh.build import _expand_bits

    return _expand_bits(jnp.asarray(v, jnp.uint32))


def coherence_key(ori: Vec3, d: Vec3, world_lo: Vec3, world_inv: Vec3
                  ) -> jnp.ndarray:
    """24-bit sort key: 21-bit origin morton (128^3 cells) << 3 | octant."""
    qx = _interleave7(_quantize(ori.x, world_lo.x, world_inv.x, 7))
    qy = _interleave7(_quantize(ori.y, world_lo.y, world_inv.y, 7))
    qz = _interleave7(_quantize(ori.z, world_lo.z, world_inv.z, 7))
    morton = (qx << 2) | (qy << 1) | qz
    octant = ((d.x >= 0).astype(jnp.uint32) * 4
              + (d.y >= 0).astype(jnp.uint32) * 2
              + (d.z >= 0).astype(jnp.uint32))
    return ((morton << 3) | octant).astype(jnp.int32)


def sort_permutation(key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (perm, inv_perm): perm gathers into sorted order; inv_perm
    maps sorted slots back to original lanes."""
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    return perm, inv


def gather_vec3(v: Vec3, idx: jnp.ndarray) -> Vec3:
    return v.take(idx)


def world_bounds(mesh) -> Tuple[Vec3, Vec3]:
    """Host-side world AABB of the scene mesh (static per scene)."""
    lo = Vec3(jnp.min(mesh.positions.x), jnp.min(mesh.positions.y),
              jnp.min(mesh.positions.z))
    hi = Vec3(jnp.max(mesh.positions.x), jnp.max(mesh.positions.y),
              jnp.max(mesh.positions.z))
    inv = Vec3(1.0 / jnp.maximum(hi.x - lo.x, 1e-6),
               1.0 / jnp.maximum(hi.y - lo.y, 1e-6),
               1.0 / jnp.maximum(hi.z - lo.z, 1e-6))
    return lo, inv


def sorted_closest_hit(raycaster, ori: Vec3, d: Vec3, t_max, world_lo,
                       world_inv):
    """closest_hit with coherence-sorted rays; results in original order."""
    key = coherence_key(ori, d, world_lo, world_inv)
    perm, inv = sort_permutation(key)
    hit = raycaster.closest_hit(
        gather_vec3(ori, perm), gather_vec3(d, perm),
        None if t_max is None else jnp.take(t_max, perm))
    from .intersect import HitRecord

    return HitRecord(
        t=jnp.take(hit.t, inv),
        tri=jnp.take(hit.tri, inv),
        u=jnp.take(hit.u, inv),
        v=jnp.take(hit.v, inv),
    )


def sorted_any_hit(raycaster, ori: Vec3, d: Vec3, t_max, world_lo, world_inv):
    key = coherence_key(ori, d, world_lo, world_inv)
    perm, inv = sort_permutation(key)
    occ = raycaster.any_hit(gather_vec3(ori, perm), gather_vec3(d, perm),
                            jnp.take(t_max, perm))
    return jnp.take(occ, inv)
