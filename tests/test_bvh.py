import jax.numpy as jnp
import numpy as np
import pytest

from tpt.bvh.build import build_lbvh, morton3d
from tpt.bvh.traverse import bvh_any_hit, bvh_closest_hit
from tpt.bvh.validate import validate_lbvh
from tpt.core.vec import Vec3
from tpt.integrators.intersect import brute_force_any_hit, brute_force_closest_hit
from tpt.scene import procedural
from tpt.scene.mesh import finalize_mesh, merge_meshes


def random_ray_batch(n, lo, hi, seed=0):
    rs = np.random.default_rng(seed)
    ori = rs.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Vec3.from_stacked(jnp.asarray(ori)), Vec3.from_stacked(jnp.asarray(d))


@pytest.fixture(scope="module")
def sphere_mesh():
    m = procedural.make_uv_sphere((0, 0, 0), 1.0, 0, n_theta=16, n_phi=32)
    return finalize_mesh(m)


@pytest.fixture(scope="module")
def cluttered_mesh():
    rs = np.random.default_rng(3)
    parts = []
    for i in range(30):
        c = rs.uniform(-5, 5, 3)
        parts.append(procedural.make_uv_sphere(tuple(c), rs.uniform(0.2, 0.8), 0,
                                               n_theta=6, n_phi=8))
    return finalize_mesh(merge_meshes(parts))


class TestMorton:
    def test_ordering_locality(self):
        # origin has code 0; far corner has the max code
        c0 = morton3d(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
        c1 = morton3d(jnp.ones(1), jnp.ones(1), jnp.ones(1))
        assert int(c0[0]) == 0
        assert int(c1[0]) == (1 << 30) - 1

    def test_axis_interleave(self):
        # x contributes the highest bit of each 3-bit group
        cx = morton3d(jnp.ones(1), jnp.zeros(1), jnp.zeros(1))
        cy = morton3d(jnp.zeros(1), jnp.ones(1), jnp.zeros(1))
        cz = morton3d(jnp.zeros(1), jnp.zeros(1), jnp.ones(1))
        assert int(cx[0]) == int(cy[0]) * 2 == int(cz[0]) * 4


class TestBuild:
    def test_topology_sphere(self, sphere_mesh):
        bvh = build_lbvh(sphere_mesh)
        rep = validate_lbvh(bvh)
        assert rep.ok, rep.errors
        assert rep.num_leaves == sphere_mesh.num_triangles
        assert rep.max_depth < 64

    def test_topology_clutter(self, cluttered_mesh):
        bvh = build_lbvh(cluttered_mesh)
        rep = validate_lbvh(bvh)
        assert rep.ok, rep.errors

    def test_tiny_meshes(self):
        for ntheta in (2, 3):
            m = finalize_mesh(procedural.make_uv_sphere((0, 0, 0), 1, 0,
                                                        n_theta=ntheta, n_phi=3))
            rep = validate_lbvh(build_lbvh(m))
            assert rep.ok, rep.errors

    def test_root_aabb_bounds_scene(self, cluttered_mesh):
        bvh = build_lbvh(cluttered_mesh)
        pos = np.stack([np.asarray(cluttered_mesh.positions.x),
                        np.asarray(cluttered_mesh.positions.y),
                        np.asarray(cluttered_mesh.positions.z)], -1)
        root_min = np.array([float(bvh.aabb_min.x[0]), float(bvh.aabb_min.y[0]),
                             float(bvh.aabb_min.z[0])])
        root_max = np.array([float(bvh.aabb_max.x[0]), float(bvh.aabb_max.y[0]),
                             float(bvh.aabb_max.z[0])])
        assert np.all(pos.min(0) >= root_min - 1e-4)
        assert np.all(pos.max(0) <= root_max + 1e-4)


class TestTraversalMatchesBruteForce:
    def test_closest_hit_sphere(self, sphere_mesh):
        ori, d = random_ray_batch(512, -3, 3, seed=1)
        bvh = build_lbvh(sphere_mesh)
        got = bvh_closest_hit(sphere_mesh, bvh, ori, d)
        want = brute_force_closest_hit(sphere_mesh, ori, d)
        hit_g = np.asarray(got.tri >= 0)
        hit_w = np.asarray(want.tri >= 0)
        np.testing.assert_array_equal(hit_g, hit_w)
        np.testing.assert_allclose(
            np.asarray(got.t)[hit_w], np.asarray(want.t)[hit_w], rtol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(got.tri)[hit_w], np.asarray(want.tri)[hit_w])

    def test_closest_hit_clutter(self, cluttered_mesh):
        ori, d = random_ray_batch(1024, -6, 6, seed=2)
        bvh = build_lbvh(cluttered_mesh)
        got = bvh_closest_hit(cluttered_mesh, bvh, ori, d)
        want = brute_force_closest_hit(cluttered_mesh, ori, d)
        np.testing.assert_array_equal(np.asarray(got.tri >= 0), np.asarray(want.tri >= 0))
        m = np.asarray(want.tri >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(want.t)[m], rtol=1e-4)

    def test_any_hit_matches(self, cluttered_mesh):
        ori, d = random_ray_batch(1024, -6, 6, seed=4)
        t_max = jnp.full((1024,), 4.0)
        bvh = build_lbvh(cluttered_mesh)
        got = np.asarray(bvh_any_hit(cluttered_mesh, bvh, ori, d, t_max))
        want = np.asarray(brute_force_any_hit(cluttered_mesh, ori, d, t_max))
        np.testing.assert_array_equal(got, want)

    def test_t_max_respected(self, sphere_mesh):
        # rays from far away with t_max shorter than the distance -> no hits
        ori = Vec3.splat((0.0, 0.0, -10.0), shape=(64,))
        d = Vec3.splat((0.0, 0.0, 1.0), shape=(64,))
        bvh = build_lbvh(sphere_mesh)
        rec = bvh_closest_hit(sphere_mesh, bvh, ori, d, t_max=jnp.full((64,), 2.0))
        assert np.all(np.asarray(rec.tri) == -1)


class TestRenderParity:
    def test_cornell_bvh_equals_bruteforce(self):
        from tpt.config import RayCastBackend, RenderConfig
        from tpt.integrators import megakernel

        scene = procedural.cornell_box(resolution=(32, 32), spheres=True)
        data_bf = scene.build(with_bvh=False)
        data_bvh = scene.build(with_bvh=True)
        cfg_bf = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=3)
        cfg_bvh = RenderConfig(backend=RayCastBackend.BVH_XLA, trace_depth=3)
        img_bf = megakernel.render(data_bf, scene.camera, cfg_bf, iterations=2)
        img_bvh = megakernel.render(data_bvh, scene.camera, cfg_bvh, iterations=2)
        # equal-t tie-breaks on shared triangle edges may resolve differently
        # between backends; require near-equality on >=99.5% of pixels and
        # identical global statistics
        close = np.isclose(img_bvh, img_bf, atol=5e-3).mean()
        assert close > 0.995, close
        np.testing.assert_allclose(img_bvh.mean(), img_bf.mean(), rtol=0.02)

    def test_backend_disagreements_are_geometric_ties(self):
        """AUDIT of the tie-break allowance the image-level tolerances
        rest on: every primary-ray lane where the Pallas packet kernel
        and the XLA oracle name different triangles must be a genuine
        near-tie — a dense numpy Möller–Trumbore (same epsilons) must
        show both reported hits within 1e-4 of the true closest t. If a
        real traversal bug ever drops a node, the winning backend's t
        diverges from the dense minimum and this fails loudly."""
        from tpt.bvh.pack import build_packet_bvh_wide
        from tpt.bvh.pallas_traverse import packet_closest_hit_wide
        from tpt.core.camera import generate_camera_rays
        from tpt.integrators.intersect import FLT_MAX

        scene = procedural.cornell_box(resolution=(48, 48), spheres=True)
        data = scene.build(with_bvh=True)
        mesh = data.mesh
        cam = scene.camera
        ori, d, _ = generate_camera_rays(cam, jnp.uint32(1))
        tmax = jnp.full((cam.num_pixels,), FLT_MAX)

        hx = bvh_closest_hit(mesh, data.bvh, ori, d, tmax)
        pack = build_packet_bvh_wide(mesh, data.bvh, max_cluster=16, arity=4)
        hp = packet_closest_hit_wide(pack, ori, d, tmax)

        # dense [R, T] intersection t-matrix (numpy, kernel epsilons)
        P = np.stack([np.asarray(mesh.positions.x),
                      np.asarray(mesh.positions.y),
                      np.asarray(mesh.positions.z)], -1).astype(np.float64)
        i0 = np.asarray(mesh.i0)
        i1 = np.asarray(mesh.i1)
        i2 = np.asarray(mesh.i2)
        v0, e1, e2 = P[i0], P[i1] - P[i0], P[i2] - P[i0]
        O = np.stack([np.asarray(ori.x), np.asarray(ori.y),
                      np.asarray(ori.z)], -1).astype(np.float64)
        D = np.stack([np.asarray(d.x), np.asarray(d.y),
                      np.asarray(d.z)], -1).astype(np.float64)
        pv = np.cross(D[:, None, :], e2[None, :, :])
        det = np.einsum("tk,rtk->rt", e1, pv)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = O[:, None, :] - v0[None, :, :]
        u = np.einsum("rtk,rtk->rt", tv, pv) * inv
        qv = np.cross(tv, e1[None, :, :])
        v = np.einsum("rk,rtk->rt", D, qv) * inv
        t = np.einsum("tk,rtk->rt", e2, qv) * inv
        valid = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) \
            & (t > 1e-4)
        t_dense = np.where(valid, t, np.inf)
        t_best = t_dense.min(axis=1)

        tri_x = np.asarray(hx.tri)
        tri_p = np.asarray(hp.tri)
        np.testing.assert_array_equal(tri_x >= 0, tri_p >= 0)
        dis = np.nonzero((tri_x != tri_p) & (tri_x >= 0))[0]
        # sanity: SOME pixels must hit, and disagreements stay rare
        assert (tri_x >= 0).any()
        assert dis.size <= 0.01 * tri_x.size, dis.size
        for r in dis:
            tb = t_best[r]
            assert np.isfinite(tb)
            assert abs(float(np.asarray(hx.t)[r]) - tb) <= 1e-4 * max(1.0, tb)
            assert abs(float(np.asarray(hp.t)[r]) - tb) <= 1e-4 * max(1.0, tb)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))


class TestSAH:
    def test_sah_topology_and_parity(self, cluttered_mesh):
        from tpt.bvh.sah import build_sah_bvh
        from tpt.scene.native import available

        if not available():
            pytest.skip("native library unavailable")
        bvh = build_sah_bvh(cluttered_mesh)
        rep = validate_lbvh(bvh)
        assert rep.ok, rep.errors
        ori, d = random_ray_batch(512, -6, 6, seed=9)
        got = bvh_closest_hit(cluttered_mesh, bvh, ori, d)
        want = brute_force_closest_hit(cluttered_mesh, ori, d)
        np.testing.assert_array_equal(np.asarray(got.tri >= 0),
                                      np.asarray(want.tri >= 0))
        m = np.asarray(want.tri >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(want.t)[m],
                                   rtol=1e-4)

    def test_sah_beats_lbvh_on_visits(self, cluttered_mesh):
        from tpt.bvh.sah import build_sah_bvh
        from tpt.bvh.traverse import traversal_cost
        from tpt.scene.native import available

        if not available():
            pytest.skip("native library unavailable")
        sah = build_sah_bvh(cluttered_mesh)
        lb = build_lbvh(cluttered_mesh)
        ori, d = random_ray_batch(1024, -6, 6, seed=10)
        c_sah = float(np.asarray(traversal_cost(cluttered_mesh, sah, ori, d)).mean())
        c_lb = float(np.asarray(traversal_cost(cluttered_mesh, lb, ori, d)).mean())
        assert c_sah <= c_lb * 1.05  # SAH never materially worse


class TestWideKernelStackPressure:
    def test_many_cluster_scene_matches_brute_force(self):
        """Regression: a scene with more clusters than the cluster-stack
        capacity must not silently drop intersections (the pop throttle
        drains the stack instead — round-2 bug: 276 clusters vs a
        160-entry stack lost ~9% of pixels)."""
        import jax.numpy as jnp

        from tpt.bvh.pallas_traverse import (packet_any_hit_wide,
                                             packet_closest_hit_wide)
        from tpt.core.vec import Vec3
        from tpt.integrators.intersect import (FLT_MAX,
                                               brute_force_any_hit,
                                               brute_force_closest_hit)
        from tpt.scene import procedural

        host = procedural.cornell_box(resolution=(8, 8), spheres=True)
        data = host.build(with_bvh=True, max_cluster=8)  # ~550 clusters
        mesh = data.mesh
        rng = np.random.default_rng(11)
        n = 4096
        o = Vec3(jnp.asarray(rng.uniform(-4, 4, n).astype(np.float32)),
                 jnp.asarray(rng.uniform(0.5, 9.5, n).astype(np.float32)),
                 jnp.asarray(rng.uniform(-4, 4, n).astype(np.float32)))
        dd = rng.normal(size=(3, n)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=0)
        d = Vec3(*[jnp.asarray(c) for c in dd])
        tmax = jnp.full((n,), FLT_MAX)

        ref = brute_force_closest_hit(mesh, o, d, tmax)
        hit = packet_closest_hit_wide(data.pack, o, d, tmax)
        np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                                   rtol=1e-4, atol=1e-4)

        t_short = jnp.full((n,), 3.0)
        ref_occ = brute_force_any_hit(mesh, o, d, t_short)
        occ = packet_any_hit_wide(data.pack, o, d, t_short)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))


class TestStreamedTriangles:
    def test_align_clusters_layout_invariants(self):
        """align_clusters_for_stream invariants the kernel relies on:
        every cluster code decodes to an 8-aligned start with its
        original count, the table is lane-packed [rows, 128], and each
        cluster's triangle rows are copied verbatim into its slot."""
        import numpy as np

        from tpt.bvh.pack import align_clusters_for_stream, decode_cluster
        from tpt.scene import procedural

        host = procedural.cornell_box(resolution=(8, 8), spheres=True)
        data = host.build(with_bvh=True, stream_tris=False)
        pack = data.pack
        aligned = align_clusters_for_stream(pack)

        assert aligned.stream_tris
        assert aligned.tri_f32.shape[1] == 128
        old_child = np.asarray(pack.node_child)[:, :pack.arity]
        new_child = np.asarray(aligned.node_child)[:, :pack.arity]
        old_tri = np.asarray(pack.tri_f32)
        new_tri = np.asarray(aligned.tri_f32).reshape(-1, 16)
        k = pack.max_cluster
        n_checked = 0
        for r in range(old_child.shape[0]):
            for s in range(pack.arity):
                oc, nc = int(old_child[r, s]), int(new_child[r, s])
                if oc >= -1:  # node or empty: unchanged
                    assert nc == oc
                    continue
                os_, ocnt = decode_cluster(oc)
                ns_, ncnt = decode_cluster(nc)
                assert ncnt == ocnt
                assert ns_ % 8 == 0
                assert ns_ % k == 0  # own K-row slot
                np.testing.assert_array_equal(
                    new_tri[ns_:ns_ + ocnt], old_tri[os_:os_ + ocnt])
                n_checked += 1
        assert n_checked > 0


    def test_streamed_matches_vmem_and_brute_force(self):
        """HBM triangle streaming (pack.stream_tris): the DMA-per-cluster
        kernel must agree exactly with the VMEM-resident kernel and with
        brute force — the capability that removes the VMEM ceiling on
        scene size (reference equivalent: GPU global-memory triangle
        buffer, ray_cast.cu __ldg loads). The streamed pack carries a
        different (lane-packed, cluster-aligned) triangle table, so the
        resident comparison pack comes from its own build."""
        import jax.numpy as jnp

        from tpt.bvh.pallas_traverse import (packet_any_hit_wide,
                                             packet_closest_hit_wide)
        from tpt.core.vec import Vec3
        from tpt.integrators.intersect import (FLT_MAX,
                                               brute_force_any_hit,
                                               brute_force_closest_hit)
        from tpt.scene import procedural

        host = procedural.cornell_box(resolution=(8, 8), spheres=True)
        data = host.build(with_bvh=True, stream_tris=True)
        assert data.pack.stream_tris
        assert data.pack.tri_f32.shape[1] == 128  # lane-packed DMA layout
        pack_v = host.build(with_bvh=True, stream_tris=False).pack
        assert not pack_v.stream_tris
        mesh = data.mesh

        rng = np.random.default_rng(7)
        n = 4096
        o = Vec3(jnp.asarray(rng.uniform(-4, 4, n).astype(np.float32)),
                 jnp.asarray(rng.uniform(0.5, 9.5, n).astype(np.float32)),
                 jnp.asarray(rng.uniform(-4, 4, n).astype(np.float32)))
        dd = rng.normal(size=(3, n)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=0)
        d = Vec3(*[jnp.asarray(c) for c in dd])
        tmax = jnp.full((n,), FLT_MAX)

        ref = brute_force_closest_hit(mesh, o, d, tmax)
        hs = packet_closest_hit_wide(data.pack, o, d, tmax)
        hv = packet_closest_hit_wide(pack_v, o, d, tmax)
        np.testing.assert_array_equal(np.asarray(hs.t), np.asarray(hv.t))
        np.testing.assert_array_equal(np.asarray(hs.tri), np.asarray(hv.tri))
        np.testing.assert_allclose(np.asarray(hs.t), np.asarray(ref.t),
                                   rtol=1e-4, atol=1e-4)

        t_short = jnp.full((n,), 3.0)
        ref_occ = brute_force_any_hit(mesh, o, d, t_short)
        occ = packet_any_hit_wide(data.pack, o, d, t_short)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))

    def test_auto_threshold(self):
        from tpt.scene import procedural

        host = procedural.cornell_box(resolution=(8, 8))
        small = host.build(with_bvh=True)           # tiny: stays VMEM
        assert not small.pack.stream_tris
        forced = host.build(with_bvh=True, stream_tris=True)
        assert forced.pack.stream_tris
