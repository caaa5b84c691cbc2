"""Bounce-ray coherence keys.

Secondary-bounce rays scatter in direction, and packet traversal
(bvh/pallas_traverse.py) degrades ~20x when the 1024 rays of a packet
disagree about where to go. The wavefront integrator therefore keeps the
whole path pool physically sorted by a (origin-cell morton, direction
octant) key (wavefront._sort_pool): one multi-operand lax.sort per bounce
moves ALL path state (measured ~2.6 ms per extra 2M-lane operand vs
~30 ms per 2M gather — sorting payloads is 10x cheaper than gathering
them), and dead lanes get the max key so live paths compact into dense
packets for free. This is the TPU-native replacement for the reference's
thrust material sort + warp-aggregated queue compaction
(/root/reference/src/pathtrace_wavefront.cu:314-334) — here the scarce
resource is traversal coherence, not shading coherence.
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


def coherence_key(ori: Vec3, d: Vec3, world_lo: Vec3, world_inv: Vec3,
                  mode: str = "dir_major") -> jnp.ndarray:
    """Sort key for packet coherence. Modes (swept on hardware,
    benchmarks/traversal.py):

    - "cell_major": 21-bit origin morton << 3 | octant. Groups rays by
      locale; a super-packet then contains ALL directions — measured to
      saturate the traversal union to the whole scene on interiors.
    - "dir_major": direction cone (octant + 1 bit/axis = 6 bits) on top,
      then 18-bit origin morton. Packets share a <=45-degree cone AND a
      locale, so they traverse beams instead of spheres.
    """
    octant = ((d.x >= 0).astype(jnp.uint32) * 4
              + (d.y >= 0).astype(jnp.uint32) * 2
              + (d.z >= 0).astype(jnp.uint32))
    if mode == "cell_major":
        qx = _interleave7(_quantize(ori.x, world_lo.x, world_inv.x, 7))
        qy = _interleave7(_quantize(ori.y, world_lo.y, world_inv.y, 7))
        qz = _interleave7(_quantize(ori.z, world_lo.z, world_inv.z, 7))
        morton = (qx << 2) | (qy << 1) | qz
        return ((morton << 3) | octant).astype(jnp.int32)
    if mode.startswith("oct"):
        # octahedral direction code (bits/axis from the mode suffix, e.g.
        # "oct4" = 4+4 bits ≈ 256 cones of ~13°): finer cones than the
        # octant modes, at the cost of origin-morton bits below
        b = int(mode[3:] or 4)
        s = jnp.abs(d.x) + jnp.abs(d.y) + jnp.abs(d.z)
        px = d.x / jnp.maximum(s, 1e-20)
        py = d.y / jnp.maximum(s, 1e-20)
        lower = d.z < 0
        ox_ = jnp.where(lower, (1 - jnp.abs(py)) * jnp.sign(px), px)
        oy_ = jnp.where(lower, (1 - jnp.abs(px)) * jnp.sign(py), py)
        qu = jnp.clip(((ox_ * 0.5 + 0.5) * (1 << b)).astype(jnp.int32),
                      0, (1 << b) - 1).astype(jnp.uint32)
        qv = jnp.clip(((oy_ * 0.5 + 0.5) * (1 << b)).astype(jnp.int32),
                      0, (1 << b) - 1).astype(jnp.uint32)
        code = (qu << b) | qv
        mb = min(30 - 2 * b, 18)  # origin-morton bits below the dir code
        per = mb // 3
        qx = _quantize(ori.x, world_lo.x, world_inv.x, per).astype(jnp.uint32)
        qy = _quantize(ori.y, world_lo.y, world_inv.y, per).astype(jnp.uint32)
        qz = _quantize(ori.z, world_lo.z, world_inv.z, per).astype(jnp.uint32)
        from ..bvh.build import _expand_bits

        morton = ((_expand_bits(qx) << 2) | (_expand_bits(qy) << 1)
                  | _expand_bits(qz))
        return ((code << (3 * per)) | morton).astype(jnp.int32)
    # dir_major: refine each octant by the dominant |component| sign bitting
    ax = (jnp.abs(d.x) > 0.5).astype(jnp.uint32)
    ay = (jnp.abs(d.y) > 0.5).astype(jnp.uint32)
    az = (jnp.abs(d.z) > 0.5).astype(jnp.uint32)
    cone = (octant << 3) | (ax << 2) | (ay << 1) | az
    qx = _quantize(ori.x, world_lo.x, world_inv.x, 6).astype(jnp.uint32)
    qy = _quantize(ori.y, world_lo.y, world_inv.y, 6).astype(jnp.uint32)
    qz = _quantize(ori.z, world_lo.z, world_inv.z, 6).astype(jnp.uint32)
    from ..bvh.build import _expand_bits

    morton = ((_expand_bits(qx) << 2) | (_expand_bits(qy) << 1)
              | _expand_bits(qz))
    return ((cone << 18) | morton).astype(jnp.int32)


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
