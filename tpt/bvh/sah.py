"""Binned-SAH BVH (native C++ builder) — the quality backend.

LBVH optimizes build speed; SAH optimizes traversal (typically 1.5-2.5x
fewer node visits per ray), which is the scarce resource for packet
traversal on TPU. The C++ builder (native/tpt_native.cpp: tpt_build_sah)
emits the exact array layout of bvh/build.py — internal nodes [0, T-2],
single-triangle leaves [T-1, 2T-2] with contiguous subtree leaf ranges —
so the validator, XLA traversal oracle, packet packing and heatmap all
work unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from ..scene.structs import LBVHData, MeshData


def _escape_links(left: np.ndarray, right: np.ndarray, parent: np.ndarray
                  ) -> np.ndarray:
    """escape[left child] = right sibling; escape[right child] =
    escape[parent]; root = -1. Fixed-point downward propagation."""
    total = left.shape[0]
    ids = np.arange(total)
    par = np.maximum(parent, 0)
    par_right = right[par]
    is_left = left[par] == ids
    has_parent = parent >= 0
    escape = np.full(total, -1, np.int32)
    for _ in range(total.bit_length() * 4 + 8):
        new = np.where(is_left, par_right, escape[par]).astype(np.int32)
        new = np.where(has_parent, new, -1)
        if np.array_equal(new, escape):
            break
        escape = new
    return escape


def build_sah_bvh(mesh: MeshData) -> LBVHData:
    """Build a SAH BVH via the native builder; raises if unavailable."""
    from ..scene.native import build_sah_native

    t = mesh.num_triangles
    tri_ids = np.arange(max(t, 2), dtype=np.int64) % max(t, 1)
    px = np.asarray(mesh.positions.x)
    py = np.asarray(mesh.positions.y)
    pz = np.asarray(mesh.positions.z)
    i0 = np.asarray(mesh.i0)[tri_ids]
    i1 = np.asarray(mesh.i1)[tri_ids]
    i2 = np.asarray(mesh.i2)[tri_ids]
    v012 = np.stack([px[i0], py[i0], pz[i0],
                     px[i1], py[i1], pz[i1],
                     px[i2], py[i2], pz[i2]], axis=-1).astype(np.float32)
    result = build_sah_native(v012)
    if result is None:
        raise RuntimeError("native SAH builder unavailable (make -C native)")
    left, right, parent, prim, amin, amax = result
    escape = _escape_links(left, right, parent)
    return LBVHData(
        aabb_min=Vec3.from_stacked(jnp.asarray(amin)),
        aabb_max=Vec3.from_stacked(jnp.asarray(amax)),
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        parent=jnp.asarray(parent),
        escape=jnp.asarray(escape),
        prim_index=jnp.asarray(prim),
        num_triangles=max(t, 2),
    )
