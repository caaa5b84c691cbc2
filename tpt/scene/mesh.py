"""Host-side (numpy) mesh assembly: TRS transforms, vertex dedup, tangent
generation, mesh merging, and upload to the device `MeshData` pytree.

Capability parity with the reference's loadObjects pipeline
(/root/reference/src/scene.cpp:330-539): TRS + inverse-transpose normals,
per-triangle tangents from UVs, geometric normals, hash-based vertex dedup.
All of it is vectorized numpy (no per-vertex Python loops) — this is the
"data loader" tier, so it runs on host once at scene load.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from .structs import MeshData


@dataclass
class HostMesh:
    """Mutable numpy triangle mesh being assembled on host."""

    positions: np.ndarray  # [V, 3] f32
    normals: np.ndarray    # [V, 3] f32
    uvs: np.ndarray        # [V, 2] f32
    tangents: np.ndarray   # [V, 3] f32
    indices: np.ndarray    # [T, 3] int32
    material_ids: np.ndarray  # [T] int32

    @staticmethod
    def empty() -> "HostMesh":
        return HostMesh(
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.float32),
            np.zeros((0, 2), np.float32),
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.int32),
            np.zeros((0,), np.int32),
        )

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0])


def apply_transform(positions: np.ndarray, normals: np.ndarray, trs: np.ndarray):
    """Apply 4x4 TRS to positions and inverse-transpose to normals."""
    p = positions @ trs[:3, :3].T + trs[:3, 3]
    inv_t = np.linalg.inv(trs[:3, :3]).T
    n = normals @ inv_t.T
    lens = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(lens, 1e-20)
    return p.astype(np.float32), n.astype(np.float32)


def compute_geometric_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    lens = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(lens, 1e-20)).astype(np.float32)


def compute_smooth_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals for meshes without authored normals."""
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted (unnormalized)
    normals = np.zeros_like(positions)
    for k in range(3):
        np.add.at(normals, indices[:, k], fn)
    lens = np.linalg.norm(normals, axis=-1, keepdims=True)
    return (normals / np.maximum(lens, 1e-20)).astype(np.float32)


def compute_tangents(positions, normals, uvs, indices) -> np.ndarray:
    """Per-vertex tangents from UV derivatives, accumulated over faces and
    Gram-Schmidt orthogonalized against the normal (same construction as the
    reference at /root/reference/src/scene.cpp:505-516)."""
    if uvs.size == 0 or not np.any(uvs):
        return np.zeros_like(positions)
    v0, v1, v2 = (positions[indices[:, k]] for k in range(3))
    w0, w1, w2 = (uvs[indices[:, k]] for k in range(3))
    e1, e2 = v1 - v0, v2 - v0
    du1, dv1 = w1[:, 0] - w0[:, 0], w1[:, 1] - w0[:, 1]
    du2, dv2 = w2[:, 0] - w0[:, 0], w2[:, 1] - w0[:, 1]
    det = du1 * dv2 - du2 * dv1
    r = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    t = (e1 * dv2[:, None] - e2 * dv1[:, None]) * r[:, None]
    tangents = np.zeros_like(positions)
    for k in range(3):
        np.add.at(tangents, indices[:, k], t)
    # orthogonalize
    d = np.sum(tangents * normals, axis=-1, keepdims=True)
    tangents = tangents - normals * d
    lens = np.linalg.norm(tangents, axis=-1, keepdims=True)
    return np.where(lens > 1e-12, tangents / np.maximum(lens, 1e-20), 0.0).astype(np.float32)


def dedup_vertices(positions, normals, uvs, indices):
    """Merge identical (position, normal, uv) vertices — the reference's
    hash-based dedup (/root/reference/src/scene.cpp:18-41) as one
    np.unique over quantized rows."""
    rows = np.concatenate([positions, normals, uvs], axis=-1)
    # exact-bits dedup (reference hashes exact floats too)
    view = np.ascontiguousarray(rows).view(
        np.dtype((np.void, rows.dtype.itemsize * rows.shape[1]))
    ).ravel()
    _, first_idx, inverse = np.unique(view, return_index=True, return_inverse=True)
    new_positions = positions[first_idx]
    new_normals = normals[first_idx]
    new_uvs = uvs[first_idx]
    new_indices = inverse[indices].astype(np.int32)
    return new_positions, new_normals, new_uvs, new_indices


def merge_meshes(meshes: List[HostMesh]) -> HostMesh:
    if not meshes:
        return HostMesh.empty()
    out = HostMesh.empty()
    offset = 0
    pos, nor, uv, tan, idx, mid = [], [], [], [], [], []
    for m in meshes:
        pos.append(m.positions)
        nor.append(m.normals)
        uv.append(m.uvs)
        tan.append(m.tangents)
        idx.append(m.indices + offset)
        mid.append(m.material_ids)
        offset += m.positions.shape[0]
    out.positions = np.concatenate(pos).astype(np.float32)
    out.normals = np.concatenate(nor).astype(np.float32)
    out.uvs = np.concatenate(uv).astype(np.float32)
    out.tangents = np.concatenate(tan).astype(np.float32)
    out.indices = np.concatenate(idx).astype(np.int32)
    out.material_ids = np.concatenate(mid).astype(np.int32)
    return out


def finalize_mesh(m: HostMesh, mat_packed: np.ndarray = None) -> MeshData:
    """Upload a HostMesh to the device MeshData pytree.

    With `mat_packed` (the scene's [M, 16] material rows, host.py) also
    builds `shade_hit`: the fully DE-NORMALIZED per-triangle hit row —
    geometric normal + all three vertices' shading attributes + the
    triangle's material fields in ONE [T, 40] row, so the per-bounce
    shade fetch is a single row-gather instead of five (tri row + 3
    vertex rows + material row). A 2M-lane gather costs ~30 ms on v5e
    regardless of row width — the gather COUNT is the cost — so
    duplicating vertex/material data per triangle (~23 MB at 143k tris)
    buys ~4 gathers per bounce (integrators/common.py:fetch_hit_surface)."""
    geo_n = compute_geometric_normals(m.positions, m.indices)

    # packed shading rows (structs.MeshData docstring): int32 indices ride
    # in float32 rows via bit-cast, recovered exactly in the shader
    t = m.indices.shape[0]
    v = m.positions.shape[0]
    shade_tri = np.zeros((t, 8), np.float32)
    shade_tri[:, 0:3] = m.indices.astype(np.int32).view(np.float32)
    shade_tri[:, 3] = m.material_ids.astype(np.int32).view(np.float32)
    shade_tri[:, 4:7] = geo_n
    shade_vtx = np.zeros((v, 8), np.float32)
    shade_vtx[:, 0:3] = m.normals
    shade_vtx[:, 3:6] = m.tangents
    shade_vtx[:, 6] = m.uvs[:, 0]
    shade_vtx[:, 7] = m.uvs[:, 1]

    shade_hit = None
    if mat_packed is not None:
        # [T, 40]: 0 matid (int32 bitcast) | 1:4 geom normal | 4:12,
        # 12:20, 20:28 per-vertex attrs (shade_vtx row layout) | 28:39
        # material fields 0:11 of mat_packed (same float encodings as
        # MaterialTable.packed, so the shader's conversions bit-match
        # gather_materials) | 39 pad
        shade_hit = np.zeros((t, 40), np.float32)
        shade_hit[:, 0] = m.material_ids.astype(np.int32).view(np.float32)
        shade_hit[:, 1:4] = geo_n
        if t:
            shade_hit[:, 4:12] = shade_vtx[m.indices[:, 0]]
            shade_hit[:, 12:20] = shade_vtx[m.indices[:, 1]]
            shade_hit[:, 20:28] = shade_vtx[m.indices[:, 2]]
            mid = np.clip(m.material_ids, 0, mat_packed.shape[0] - 1)
            shade_hit[:, 28:39] = mat_packed[mid, 0:11]
        shade_hit = jnp.asarray(shade_hit)

    return MeshData(
        shade_hit=shade_hit,
        positions=Vec3.from_stacked(jnp.asarray(m.positions)),
        normals=Vec3.from_stacked(jnp.asarray(m.normals)),
        tangents=Vec3.from_stacked(jnp.asarray(m.tangents)),
        uv_u=jnp.asarray(m.uvs[:, 0]),
        uv_v=jnp.asarray(m.uvs[:, 1]),
        i0=jnp.asarray(m.indices[:, 0]),
        i1=jnp.asarray(m.indices[:, 1]),
        i2=jnp.asarray(m.indices[:, 2]),
        material_ids=jnp.asarray(m.material_ids),
        geom_normals=Vec3.from_stacked(jnp.asarray(geo_n)),
        shade_tri=jnp.asarray(shade_tri),
        shade_vtx=jnp.asarray(shade_vtx),
    )
