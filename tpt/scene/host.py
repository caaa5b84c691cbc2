"""Host-side scene container: materials, mesh, camera, render settings —
the assembled output of the JSON/OBJ loaders or the procedural builders,
plus the upload step to the device SceneData pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.vec import Vec3
from .lights import build_light_cdf
from .mesh import HostMesh, finalize_mesh
from .structs import EnvMap, MaterialTable, MaterialType, SceneData, TextureAtlas
from .texture import AtlasBuilder


@dataclass
class HostMaterial:
    name: str = ""
    basecolor: tuple = (1.0, 1.0, 1.0)
    metallic: float = 0.0
    roughness: float = 1.0
    emittance: float = 0.0
    ior: float = 1.5
    mtype: MaterialType = MaterialType.DIFFUSE
    tex_diffuse: int = -1
    tex_metallic_roughness: int = -1
    tex_normal: int = -1


@dataclass
class HostScene:
    mesh: HostMesh = dfield(default_factory=HostMesh.empty)
    materials: List[HostMaterial] = dfield(default_factory=list)
    camera: Optional[Camera] = None
    atlas: AtlasBuilder = dfield(default_factory=AtlasBuilder)
    env_map: Optional[EnvMap] = None  # built by envmap.load_envmap
    iterations: int = 120
    trace_depth: int = 8
    image_name: str = "render"

    def add_material(self, m: HostMaterial) -> int:
        self.materials.append(m)
        return len(self.materials) - 1

    def material_id(self, name: str) -> int:
        for i, m in enumerate(self.materials):
            if m.name == name:
                return i
        raise KeyError(f"unknown material {name!r}")

    def emittances(self) -> np.ndarray:
        return np.array([m.emittance for m in self.materials] or [0.0], np.float32)

    # triangle tables beyond this stay HBM-resident and are DMA-streamed
    # per cluster by the traversal kernel. Measured ceiling on v5e: a
    # 17 MB resident table OOMs VMEM at 1M rays (XLA stacks the table,
    # ray windows, and S(1) output buffers in the same 128 MB space);
    # 9 MB (the 143k-tri bench interior) fits with room to spare.
    STREAM_TRIS_BYTES = 12 * 1024 * 1024

    def build(self, with_bvh: bool = False, bvh_builder: str = "auto",
              max_cluster: int = 16, packet_arity: int = 4,
              stream_tris: "bool | str" = "auto",
              treelet_max_tris: int = 256,
              sweep_chunk_align: int = 4,
              prep_cache: bool = True) -> SceneData:
        """Upload everything to device pytrees; optionally build the BVH.

        bvh_builder: "sah" (native C++ binned SAH — better traversal),
        "lbvh" (on-device morton/Karras build), or "auto" (SAH when the
        native library is available). packet_arity 4/8 selects the
        wide-node packet layout (the measured sweet spot is arity 4 with
        16-triangle clusters at packet group 2 — benchmarks/traversal.py);
        2 keeps the binary packet layout. stream_tris True (or "auto" beyond
        STREAM_TRIS_BYTES) leaves the triangle table in HBM and the
        Pallas kernel DMA-streams each cluster — removes the VMEM
        ceiling on scene size."""
        mats = self.materials or [HostMaterial()]
        mat_packed = np.zeros((len(mats), 16), np.float32)
        for i, m in enumerate(mats):
            mat_packed[i, 0:3] = m.basecolor
            mat_packed[i, 3:8] = (m.metallic, m.roughness, m.emittance,
                                  m.ior, float(int(m.mtype)))
            mat_packed[i, 8:11] = (float(m.tex_diffuse),
                                   float(m.tex_metallic_roughness),
                                   float(m.tex_normal))
        table = MaterialTable(
            packed=jnp.asarray(mat_packed),
            any_tex_diffuse=any(m.tex_diffuse >= 0 for m in mats),
            any_tex_mr=any(m.tex_metallic_roughness >= 0 for m in mats),
            any_tex_normal=any(m.tex_normal >= 0 for m in mats),
            basecolor=Vec3.from_stacked(
                jnp.asarray(np.array([m.basecolor for m in mats], np.float32))
            ),
            metallic=jnp.asarray(np.array([m.metallic for m in mats], np.float32)),
            roughness=jnp.asarray(np.array([m.roughness for m in mats], np.float32)),
            emittance=jnp.asarray(np.array([m.emittance for m in mats], np.float32)),
            ior=jnp.asarray(np.array([m.ior for m in mats], np.float32)),
            mtype=jnp.asarray(np.array([int(m.mtype) for m in mats], np.int32)),
            tex_diffuse=jnp.asarray(np.array([m.tex_diffuse for m in mats], np.int32)),
            tex_metallic_roughness=jnp.asarray(
                np.array([m.tex_metallic_roughness for m in mats], np.int32)
            ),
            tex_normal=jnp.asarray(np.array([m.tex_normal for m in mats], np.int32)),
        )
        lights = build_light_cdf(self.mesh, self.emittances())
        if lights.num_lights > 0:
            import dataclasses

            ltri = np.asarray(lights.tri_idx)
            idx = self.mesh.indices[ltri]              # [L, 3]
            vp = self.mesh.positions
            v0, v1, v2 = vp[idx[:, 0]], vp[idx[:, 1]], vp[idx[:, 2]]
            ln = np.cross(v1 - v0, v2 - v0)
            ln /= np.maximum(np.linalg.norm(ln, axis=-1, keepdims=True),
                             1e-20)
            lmid = self.mesh.material_ids[ltri]
            le = np.array([np.float32(mats[i].basecolor)
                           * np.float32(mats[i].emittance) for i in lmid],
                          np.float32)
            lpacked = np.zeros((ltri.shape[0], 16), np.float32)
            lpacked[:, 0:3] = v0
            lpacked[:, 3:6] = v1
            lpacked[:, 6:9] = v2
            lpacked[:, 9:12] = ln
            lpacked[:, 12:15] = le
            lights = dataclasses.replace(lights,
                                         packed=jnp.asarray(lpacked))
        mesh = finalize_mesh(self.mesh, mat_packed=mat_packed)
        atlas = self.atlas.build()
        env = self.env_map if self.env_map is not None else EnvMap.disabled()
        bvh = None
        pack = None
        sweep = None
        if with_bvh:
            from ..bvh.pack import build_packet_bvh, build_packet_bvh_wide

            builder = bvh_builder
            if builder == "auto":
                from . import native as native_mod

                builder = "sah" if native_mod.available() else "lbvh"
            # acceleration tables are a pure function of the host mesh +
            # the resolved build parameters — disk-cache them keyed by
            # that fingerprint so every run after the first skips the
            # 5.5-82.9 s build (scene/prepcache.py; the reference's
            # analogue is a milliseconds on-GPU rebuild, bvh.cu:456-516)
            from . import prepcache

            key = None
            # below ~10k tris the build is faster than a disk round-trip
            # (and tests churn thousands of tiny scenes) — skip the cache
            if prep_cache and self.mesh.num_triangles >= 10_000:
                def _key(b):
                    return prepcache.fingerprint(
                        self.mesh, builder=b, max_cluster=max_cluster,
                        packet_arity=packet_arity,
                        stream_tris=str(stream_tris),
                        stream_bytes=self.STREAM_TRIS_BYTES,
                        treelet_max_tris=treelet_max_tris,
                        sweep_chunk_align=sweep_chunk_align)

                key = _key(builder)
                cached = prepcache.load(key)
                if (cached is None and bvh_builder == "auto"
                        and builder != "sah"):
                    # cached/prebuilt SAH tables need no native library
                    # to LOAD — prefer them over a cold LBVH build when
                    # the C++ builder is unavailable on this host
                    sah_key = _key("sah")
                    cached = prepcache.load(sah_key)
                    if cached is not None:
                        key = sah_key
                if cached is not None:
                    bvh, pack, sweep = cached
            if pack is None:
                if builder == "sah":
                    from ..bvh.sah import build_sah_bvh

                    bvh = build_sah_bvh(mesh)
                else:
                    from ..bvh.build import build_lbvh

                    bvh = build_lbvh(mesh)
                if packet_arity > 2:
                    pack = build_packet_bvh_wide(mesh, bvh,
                                                 max_cluster=max_cluster,
                                                 arity=packet_arity)
                else:
                    pack = build_packet_bvh(mesh, bvh,
                                            max_cluster=max_cluster)
                stream = stream_tris
                if stream == "auto":
                    stream = pack.tri_f32.nbytes > self.STREAM_TRIS_BYTES
                if stream and pack.arity > 2:
                    from ..bvh.pack import align_clusters_for_stream

                    pack = align_clusters_for_stream(pack)
                elif pack.arity > 2:
                    # top-tree tables for the self-rebinning treelet
                    # backend (cheap numpy walk; lets BVH_TREELET switch
                    # on without a scene rebuild). Streaming packs skip
                    # it for now.
                    from ..bvh.treelet import attach_treelets, sweep_tables

                    pack = attach_treelets(pack, max_tris=treelet_max_tris)
                    sweep = sweep_tables(pack,
                                         chunk_align=sweep_chunk_align)
                if key is not None:
                    prepcache.store(key, (bvh, pack, sweep))
        return SceneData(mesh=mesh, materials=table, lights=lights, atlas=atlas,
                         env=env, bvh=bvh, pack=pack, sweep=sweep)
