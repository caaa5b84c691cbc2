import jax.numpy as jnp
import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig
from tpt.integrators import megakernel, wavefront
from tpt.scene import procedural
from tpt.scene.structs import MaterialType


CFG = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=4)


@pytest.fixture(scope="module")
def cornell():
    scene = procedural.cornell_box(resolution=(48, 48), spheres=False)
    return scene, scene.build()


class TestWavefront:
    def test_matches_megakernel(self, cornell):
        """Same RNG conventions, same sampling decisions -> the two engines
        must produce identical images (the reference engines only match
        statistically; ours match exactly by construction)."""
        scene, data = cornell
        img_m = megakernel.render(data, scene.camera, CFG, iterations=2)
        img_w = wavefront.render(data, scene.camera, CFG, iterations=2)
        np.testing.assert_allclose(img_w, img_m, atol=1e-5)

    def test_direct_indirect_split(self, cornell):
        scene, data = cornell
        frame, vp = wavefront.make_frame_fn(data, scene.camera, CFG)
        from tpt.core.vec import Vec3

        acc_d = Vec3.zeros((scene.camera.num_pixels,))
        acc_i = Vec3.zeros((scene.camera.num_pixels,))
        out, acc_d, acc_i = frame(jnp.uint32(1), vp, acc_d, acc_i)
        d = np.asarray(out.direct.x)
        i = np.asarray(out.indirect.x)
        assert d.sum() > 0  # NEE contributes
        assert i.sum() > 0  # emissive hits / bounces contribute
        assert int(out.rays_traced) > scene.camera.num_pixels  # ext + shadow

    def test_gbuffers(self, cornell):
        scene, data = cornell
        frame, vp = wavefront.make_frame_fn(data, scene.camera, CFG)
        from tpt.core.vec import Vec3

        n = scene.camera.num_pixels
        out, _, _ = frame(jnp.uint32(1), vp, Vec3.zeros((n,)), Vec3.zeros((n,)))
        depth = np.asarray(out.gbuf.depth)
        matid = np.asarray(out.gbuf.mat_id)
        # camera frames the open box face: nearly every pixel hits; edge rays
        # jittered past the opening report sky
        hit = depth > 0
        assert hit.mean() > 0.9
        assert (matid[hit] >= 0).all()
        assert (matid[~hit] == -1).all()
        # static camera: zero motion vectors
        np.testing.assert_allclose(np.asarray(out.gbuf.motion_u), 0.0, atol=1e-3)
        # albedo is the wall color for most pixels
        alb = np.asarray(out.gbuf.albedo.x)
        assert 0.2 < np.median(alb) < 0.9

    def test_motion_vectors_on_camera_move(self, cornell):
        scene, data = cornell
        cam2 = scene.camera.moved(position=(288.0, 273.0, -800.0))
        frame, vp = wavefront.make_frame_fn(data, cam2, CFG)
        prev_vp = wavefront.camera_view_proj(scene.camera)
        from tpt.core.vec import Vec3

        n = cam2.num_pixels
        out, _, _ = frame(jnp.uint32(1), prev_vp, Vec3.zeros((n,)), Vec3.zeros((n,)))
        mu = np.asarray(out.gbuf.motion_u)
        assert np.abs(mu).max() > 0.1  # camera slid in x -> horizontal motion


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))


class TestRaySorting:
    def test_sorted_pool_matches_unsorted(self):
        """The persistent coherence sort (sort_bounce_rays) must not change
        the render: per-lane math is order-independent and the end-of-frame
        unsort restores pixel order exactly. The two configs compile to
        different XLA graphs, so fusion may contract different FMA chains
        in the packed-row shading lerp — allow 1-ulp drift, nothing more
        (a real sort/unsort bug shifts whole pixels, orders of magnitude
        beyond this tolerance)."""
        scene = procedural.cornell_box(resolution=(32, 32), spheres=True)
        data = scene.build(with_bvh=True)
        img_sorted = wavefront.render(
            data, scene.camera,
            RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=3,
                         sort_bounce_rays=True), iterations=2)
        img_plain = wavefront.render(
            data, scene.camera,
            RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=3,
                         sort_bounce_rays=False), iterations=2)
        np.testing.assert_allclose(img_sorted, img_plain,
                                   rtol=1e-6, atol=2e-7)

    def test_shade_hit_row_matches_five_gather_path(self):
        """The de-normalized [T, 40] hit row (mesh.shade_hit — one gather)
        must render bit-identically to the 5-gather packed-row path it
        replaces: the per-column math and conversions are the same ops on
        the same values, in the same program shape."""
        import dataclasses

        scene = procedural.cornell_box(resolution=(32, 32), spheres=True)
        data = scene.build(with_bvh=True)
        assert data.mesh.shade_hit is not None
        stripped = dataclasses.replace(
            data, mesh=dataclasses.replace(data.mesh, shade_hit=None))
        cfg = RenderConfig(backend=RayCastBackend.BVH_XLA, trace_depth=3)
        img_one = wavefront.render(data, scene.camera, cfg, iterations=2)
        img_five = wavefront.render(stripped, scene.camera, cfg,
                                    iterations=2)
        np.testing.assert_array_equal(img_one, img_five)

    def test_nearfield_two_pass_matches_one_pass(self):
        """nearfield_frac splits the extension cast into a bounded pass +
        an unbounded recast of the misses; the composite must find the
        same hits (a hit at exactly t == r1 falls through to pass 2)."""
        scene = procedural.cornell_box(resolution=(24, 24), spheres=True)
        data = scene.build(with_bvh=True)
        img_nf = wavefront.render(
            data, scene.camera,
            RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=3,
                         nearfield_frac=0.15), iterations=2)
        img_base = wavefront.render(
            data, scene.camera,
            RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=3),
            iterations=2)
        np.testing.assert_allclose(img_nf, img_base, rtol=1e-6, atol=2e-7)

    def test_wavefront_pallas_sorted_render(self):
        """Full wavefront frame through the Pallas backend (interpret mode)
        with sorting on matches the XLA backend."""
        scene = procedural.cornell_box(resolution=(16, 16), spheres=False)
        data = scene.build(with_bvh=True)
        img_p = wavefront.render(
            data, scene.camera,
            RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=2),
            iterations=1)
        img_x = wavefront.render(
            data, scene.camera,
            RenderConfig(backend=RayCastBackend.BVH_XLA, trace_depth=2),
            iterations=1)
        close = np.isclose(img_p, img_x, atol=5e-3).mean()
        assert close > 0.99, close

    @pytest.mark.slow
    def test_split_shade_matches_fused(self):
        """cfg.split_shade runs the seeded rest bounce as TWO dispatches
        (extension cast -> HitRecord, then logic/shade/shadow) instead of
        one fused program (VERDICT r4 item 2's per-stage seam). Same ops
        on the same values in the same order — the hit record crossing a
        program boundary is exact — so the render must be bit-identical
        to the fused shape."""
        scene = procedural.cornell_box(resolution=(24, 24), spheres=True)
        data = scene.build(with_bvh=True, treelet_max_tris=256)
        base = RenderConfig(backend=RayCastBackend.BVH_SWEEP, trace_depth=3,
                            sort_bounce_rays=True, spp_batch=2)
        img = wavefront.render(data, scene.camera, base, iterations=2)
        img_s = wavefront.render(data, scene.camera,
                                 base.with_(split_shade=True), iterations=2)
        np.testing.assert_array_equal(img_s, img)

    @pytest.mark.slow
    def test_sweep_primary_matches_wide_kernel(self):
        """cfg.sweep_primary routes bounce 0 through the dense-sweep path
        (raster-order scan + seeded sweep, no sort) instead of the wide
        packet kernel. Both kernels are pinned exact against brute force
        (test_sweep.py), so the closest hits agree; allow 1-ulp-class
        drift in t between the two Möller-Trumbore implementations."""
        scene = procedural.cornell_box(resolution=(24, 24), spheres=True)
        data = scene.build(with_bvh=True, treelet_max_tris=256)
        base = RenderConfig(backend=RayCastBackend.BVH_SWEEP, trace_depth=3,
                            sort_bounce_rays=True, spp_batch=2)
        img = wavefront.render(data, scene.camera, base, iterations=2)
        img_p = wavefront.render(data, scene.camera,
                                 base.with_(sweep_primary=True),
                                 iterations=2)
        np.testing.assert_allclose(img_p, img, rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_donate_pool_matches_default(self):
        """cfg.donate_pool threads the pool carry through the split
        dispatches as donated buffers (the HBM-peak lever for
        spp_batch > 4). Donation must be value-neutral, and the frame
        loop must never touch an invalidated buffer — this drives the
        full packed-sweep seed chain (scan / donated sort / donated
        seeded bounce / donated finish) on the headline backend."""
        scene = procedural.cornell_box(resolution=(24, 24), spheres=True)
        data = scene.build(with_bvh=True, treelet_max_tris=256)
        base = RenderConfig(backend=RayCastBackend.BVH_SWEEP, trace_depth=3,
                            sort_bounce_rays=True, spp_batch=2)
        img = wavefront.render(data, scene.camera, base, iterations=2)
        img_d = wavefront.render(data, scene.camera,
                                 base.with_(donate_pool=True), iterations=2)
        np.testing.assert_array_equal(img_d, img)

    def test_spp_batch_matches_sequential(self):
        """spp_batch=S traces S jittered samples of every pixel in ONE
        pool (richer coherence sort at the same per-path sort cost); the
        per-path RNG streams are identical to S separate 1-spp frames, so
        the accumulated image must match up to float add order."""
        scene = procedural.cornell_box(resolution=(32, 24), spheres=True)
        data = scene.build(with_bvh=True)
        base = RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=3)
        seq = wavefront.render(data, scene.camera, base, iterations=2)
        bat = wavefront.render(data, scene.camera, base.with_(spp_batch=2),
                               iterations=2)
        np.testing.assert_allclose(bat, seq, atol=2e-5)
        # fused (non-split) mode: the unsorted pool reduces bitwise
        cfgx = RenderConfig(backend=RayCastBackend.BVH_XLA, trace_depth=3)
        seq_x = wavefront.render(data, scene.camera, cfgx, iterations=2)
        bat_x = wavefront.render(data, scene.camera,
                                 cfgx.with_(spp_batch=2), iterations=2)
        np.testing.assert_array_equal(bat_x, seq_x)

    def test_engine_spp_batch_iteration_step(self):
        """Renderer advances `iteration` by spp_batch per frame (it counts
        SAMPLES): one spp_batch=2 frame must reproduce two sequential
        1-spp frames exactly — same seeds, same accumulator normalization
        (a +1 step would re-trace sample 2's seed in frame 2)."""
        from tpt.engine import Renderer

        scene = procedural.cornell_box(resolution=(24, 24), spheres=False)
        data = scene.build()
        base = RenderConfig(backend=RayCastBackend.BRUTE_FORCE,
                            trace_depth=2, denoiser_on=False)
        r1 = Renderer(data, scene.camera, base)
        r1.frame()
        seq = r1.frame()
        r2 = Renderer(data, scene.camera, base.with_(spp_batch=2))
        bat = r2.frame()
        assert r2.iteration == 2
        np.testing.assert_array_equal(bat, seq)

    def test_sort_cadence_matches_every_bounce(self, monkeypatch):
        """cfg.sort_every=2 skips the pool sort on alternate bounces
        (coherence vs fixed sort cost — BENCHMARKS §6); lane order changes
        but per-lane math is pool-independent and the pixel unsort is
        exact — including with the adaptive pool, whose dense-prefix
        bound only tightens on sorted bounces. The skip-sort bounce is a
        different XLA program, so fusion may contract different FMA
        chains; allow the same 1-ulp drift as
        test_sorted_pool_matches_unsorted, nothing more."""
        monkeypatch.setattr(wavefront, "MIN_POOL", 1024)
        scene = procedural.cornell_box(resolution=(48, 48), spheres=True)
        data = scene.build(with_bvh=True)
        base = RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=5)
        a = wavefront.render(data, scene.camera, base, iterations=2)
        b = wavefront.render(data, scene.camera, base.with_(sort_every=2),
                             iterations=2)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=2e-7)

    def test_adaptive_pool_matches_fixed(self, monkeypatch):
        """Pool shrinking (per-bounce alive-count readback + prefix-variant
        dispatch) must not change any pixel — the sliced-off tail is
        all-dead with final radiance."""
        monkeypatch.setattr(wavefront, "MIN_POOL", 1024)
        scene = procedural.cornell_box(resolution=(96, 96), spheres=True)
        data = scene.build(with_bvh=True)
        base = RenderConfig(backend=RayCastBackend.BVH_PALLAS, trace_depth=5)
        a = wavefront.render(data, scene.camera,
                             base.with_(adaptive_pool=True), iterations=2)
        b = wavefront.render(data, scene.camera,
                             base.with_(adaptive_pool=False), iterations=2)
        np.testing.assert_array_equal(a, b)
