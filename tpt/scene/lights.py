"""Emissive-triangle light table: area CDF build (host) + lane-parallel
sampling (device). Parity with buildLightCDF (/root/reference/src/
scene.cpp:579-631) and SampleLight (/root/reference/src/interactions.cu:
400-445): uniform-area pick via CDF search, sqrt-uniform barycentrics,
pdf_area = 1/total_area.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.vec import Vec3
from .mesh import HostMesh
from .structs import LightData, MeshData


def build_light_cdf(mesh: HostMesh, emittance_per_material: np.ndarray) -> LightData:
    """Host: collect triangles whose material is emissive; area-weighted CDF."""
    emissive_mask = emittance_per_material[mesh.material_ids] > 0.0
    tri_idx = np.nonzero(emissive_mask)[0].astype(np.int32)
    if tri_idx.size == 0:
        return LightData(
            tri_idx=jnp.zeros((1,), jnp.int32),
            cdf=jnp.ones((1,), jnp.float32),
            areas=jnp.zeros((1,), jnp.float32),
            total_area=jnp.zeros((), jnp.float32),
        )
    idx = mesh.indices[tri_idx]
    v0 = mesh.positions[idx[:, 0]]
    v1 = mesh.positions[idx[:, 1]]
    v2 = mesh.positions[idx[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    total = float(areas.sum())
    cdf = np.cumsum(areas) / max(total, 1e-20)
    cdf[-1] = 1.0
    return LightData(
        tri_idx=jnp.asarray(tri_idx),
        cdf=jnp.asarray(cdf.astype(np.float32)),
        areas=jnp.asarray(areas.astype(np.float32)),
        total_area=jnp.asarray(total, jnp.float32),
    )


def sample_light(mesh: MeshData, lights: LightData, state: jnp.ndarray):
    """Per-lane area sampling of the light set.

    Returns (state, point: Vec3, normal: Vec3, pdf_area, light_tri: int32).
    CDF binary search is a single vectorized searchsorted (XLA lowers it to
    a fixed log2-depth gather loop — the TPU analogue of the per-thread
    BinarySearch)."""
    state, r1 = rng.rand_float(state)
    state, r2 = rng.rand_float(state)
    state, r3 = rng.rand_float(state)

    num_lights = lights.cdf.shape[0]
    cdf_idx = jnp.clip(
        jnp.searchsorted(lights.cdf, r1, side="left"), 0, num_lights - 1
    ).astype(jnp.int32)
    tri = jnp.take(lights.tri_idx, cdf_idx, mode="clip")

    sqrt_r2 = jnp.sqrt(r2)
    b_u = 1.0 - sqrt_r2
    b_v = r3 * sqrt_r2
    b_w = 1.0 - b_u - b_v

    if lights.packed is not None:
        # one [L, 16] row-gather replaces tri_idx->vertex-index->position
        # chains AND the light-material fetch (precomputed Le columns)
        row = jnp.take(lights.packed, cdf_idx, axis=0, mode="clip")
        v0 = Vec3(row[:, 0], row[:, 1], row[:, 2])
        v1 = Vec3(row[:, 3], row[:, 4], row[:, 5])
        v2 = Vec3(row[:, 6], row[:, 7], row[:, 8])
        normal = Vec3(row[:, 9], row[:, 10], row[:, 11])
        le = Vec3(row[:, 12], row[:, 13], row[:, 14])
    else:
        v0, v1, v2 = mesh.tri_vertices(tri)
        normal = (v1 - v0).cross(v2 - v0).normalize()
        le = None

    point = v0 * b_u + v1 * b_v + v2 * b_w
    pdf_area = jnp.full(jnp.shape(r1), 1.0) / jnp.maximum(lights.total_area, 1e-20)
    return state, point, normal, pdf_area, tri, le
