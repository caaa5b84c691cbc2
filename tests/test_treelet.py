"""BVH_TREELET backend: self-rebinning treelet traversal
(bvh/treelet.py + bvh/pallas_treelet.py).

Correctness bar: exact agreement with brute force — the kernel tests
triangles exactly, so any mismatch is a missed visit (slot bookkeeping or
threshold bug), never a numeric tolerance issue.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpt.bvh.build import build_lbvh
from tpt.bvh.pack import build_packet_bvh_wide, decode_cluster
from tpt.bvh.pallas_treelet import treelet_closest_hit
from tpt.bvh.treelet import attach_treelets, subtree_sizes
from tpt.core.vec import Vec3
from tpt.integrators.intersect import FLT_MAX, brute_force_closest_hit
from tpt.scene import procedural
from tpt.scene.mesh import finalize_mesh, merge_meshes


@pytest.fixture(scope="module")
def cluttered():
    rs = np.random.default_rng(3)
    parts = []
    for _ in range(10):
        c = rs.uniform(-5, 5, 3)
        parts.append(procedural.make_uv_sphere(
            tuple(c), rs.uniform(0.3, 1.2), 0, n_theta=6, n_phi=8))
    mesh = finalize_mesh(merge_meshes(parts))
    pack = build_packet_bvh_wide(mesh, build_lbvh(mesh), max_cluster=16,
                                 arity=4)
    return mesh, pack


def rays(n, lo, hi, seed=0):
    rs = np.random.default_rng(seed)
    ori = rs.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (Vec3.from_stacked(jnp.asarray(ori)),
            Vec3.from_stacked(jnp.asarray(d)))


class TestCut:
    def test_cut_covers_all_triangles(self, cluttered):
        mesh, pack = cluttered
        size = subtree_sizes(pack)
        assert size[0] == pack.num_triangles
        p = attach_treelets(pack, max_tris=64)
        child = np.asarray(p.top_child)
        tref = np.asarray(p.top_tref)
        boxes = np.asarray(p.top_f32)
        total = 0
        for r in range(p.num_top):
            for s in range(pack.arity):
                if child[r, s] >= 0 or boxes[r, 6 * s] > 1e38:
                    continue  # internal or empty slot
                code = int(tref[r, s])
                if code >= 0:
                    assert size[code] <= 64
                    total += int(size[code])
                else:
                    total += decode_cluster(code)[1]
        assert total == pack.num_triangles

    def test_single_treelet_degenerate(self, cluttered):
        mesh, pack = cluttered
        p = attach_treelets(pack, max_tris=10**9)
        assert p.num_top == 1 and p.num_treelets == 1
        assert int(np.asarray(p.top_tref)[0, 0]) == 0


class TestTreeletTraversal:
    @pytest.mark.parametrize("max_tris", [48, 256])
    def test_matches_brute_force_random(self, cluttered, max_tris):
        mesh, pack = cluttered
        p = attach_treelets(pack, max_tris=max_tris)
        o, d = rays(1024, -6, 6, seed=11)
        tmax = jnp.full((1024,), FLT_MAX)
        ref = brute_force_closest_hit(mesh, o, d, tmax)
        hit = treelet_closest_hit(p, o, d, tmax)
        assert np.array_equal(np.asarray(hit.tri), np.asarray(ref.tri))
        m = np.asarray(ref.tri) >= 0
        assert np.array_equal(np.asarray(hit.t)[m], np.asarray(ref.t)[m])

    def test_t_max_and_dead_lanes(self, cluttered):
        mesh, pack = cluttered
        p = attach_treelets(pack, max_tris=64)
        o, d = rays(512, -6, 6, seed=5)
        rs = np.random.default_rng(9)
        tmax = jnp.asarray(rs.uniform(0.5, 8.0, (512,)).astype(np.float32))
        tmax = tmax.at[::3].set(-1.0)
        ref = brute_force_closest_hit(mesh, o, d, tmax)
        hit = treelet_closest_hit(p, o, d, tmax)
        assert np.array_equal(np.asarray(hit.tri), np.asarray(ref.tri))
        assert (np.asarray(hit.tri)[::3] == -1).all()

    def test_seeded_pipeline_matches_brute_force(self, cluttered):
        """The production path: phase-1 scan -> ordinal sort -> seeded
        kernel. Seeds must change packet scheduling only, never hits."""
        import jax
        from tpt.bvh.pallas_treelet import NONE_CODE, treelet_scan

        mesh, pack = cluttered
        p = attach_treelets(pack, max_tris=64)
        o, d = rays(1024, -6, 6, seed=21)
        tmax = jnp.full((1024,), FLT_MAX).at[::5].set(-1.0)
        st, sc, so, ovf, cnt = treelet_scan(p, o, d, tmax)
        assert (np.asarray(cnt)[np.asarray(sc) != NONE_CODE] >= 1).all()
        # every brute-force hit must have a phase-1 candidate
        ref = brute_force_closest_hit(mesh, o, d, tmax)
        has_seed = np.asarray(sc) != NONE_CODE
        assert (has_seed | (np.asarray(ref.tri) < 0)).all()
        key = jnp.where(sc != NONE_CODE, so, jnp.int32(1 << 30))
        (_, ox, oy, oz, dx, dy, dz, tm2, st2, sc2, ovf2) = jax.lax.sort(
            (key, o.x, o.y, o.z, d.x, d.y, d.z, tmax, st, sc, ovf),
            num_keys=1)
        o2, d2 = Vec3(ox, oy, oz), Vec3(dx, dy, dz)
        hit = treelet_closest_hit(p, o2, d2, tm2, seed=(st2, sc2, ovf2))
        ref2 = brute_force_closest_hit(mesh, o2, d2, tm2)
        assert np.array_equal(np.asarray(hit.tri), np.asarray(ref2.tri))

    def test_fully_dead_pool_exits(self, cluttered):
        mesh, pack = cluttered
        p = attach_treelets(pack, max_tris=64)
        o, d = rays(256, -6, 6, seed=6)
        hit = treelet_closest_hit(p, o, d, jnp.full((256,), -1.0))
        assert (np.asarray(hit.tri) == -1).all()


class TestEndToEnd:
    def test_hybrid_render_matches_xla_backend(self):
        """Hybrid partition (easy rays -> treelet kernel, grazing rays ->
        wide kernel) through the full integrator, vs the XLA oracle."""
        import tpt
        from tpt.integrators import wavefront

        host = procedural.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        cfg_t = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_TREELET,
                                 trace_depth=3, treelet_hybrid=True,
                                 treelet_hard_count=2)
        cfg_x = cfg_t.with_(backend=tpt.RayCastBackend.BVH_XLA)
        img_t = wavefront.render(scene, host.camera, cfg_t, iterations=2)
        img_x = wavefront.render(scene, host.camera, cfg_x, iterations=2)
        diff = np.abs(img_t - img_x)
        assert (diff > 5e-3).mean() < 0.01, diff.max()

    def test_render_matches_xla_backend(self):
        """Tiny Cornell render through the full wavefront integrator: the
        treelet backend must reproduce the reference-backend image (both
        backends return exact closest hits; ties inside one cluster are
        broken identically by triangle order)."""
        import tpt
        from tpt.integrators import wavefront

        host = procedural.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        cfg_t = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_TREELET,
                                 trace_depth=3, iterations=2,
                                 treelet_hybrid=False)
        cfg_x = cfg_t.with_(backend=tpt.RayCastBackend.BVH_XLA)
        img_t = wavefront.render(scene, host.camera, cfg_t)
        img_x = wavefront.render(scene, host.camera, cfg_x)
        assert np.isfinite(img_t).all()
        # identical RNG streams + exact hits: allow only tie-break noise
        diff = np.abs(img_t - img_x)
        assert (diff > 5e-3).mean() < 0.01, diff.max()

    def test_sweep_render_matches_xla_backend(self):
        """BVH_SWEEP (scan -> bin sort -> demand sweep -> tail) through the
        full wavefront integrator vs the XLA oracle; both exact."""
        import tpt
        from tpt.integrators import wavefront

        host = procedural.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        cfg_s = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_SWEEP,
                                 trace_depth=3, iterations=2)
        cfg_x = cfg_s.with_(backend=tpt.RayCastBackend.BVH_XLA)
        img_s = wavefront.render(scene, host.camera, cfg_s)
        img_x = wavefront.render(scene, host.camera, cfg_x)
        assert np.isfinite(img_s).all()
        diff = np.abs(img_s - img_x)
        assert (diff > 5e-3).mean() < 0.01, diff.max()
