"""Camera moves are zero-recompile runtime updates.

The reference resets by re-initializing the whole tracer on every camera
edit (/root/reference/src/main.cpp:310-321) — free on CUDA, but a
multi-minute XLA recompile if translated literally. tpt passes the
per-move camera values (core/camera.py:CamArrays) as runtime pytree
arguments instead, so `Renderer.move_camera` reuses every compiled
program. These tests pin (a) bit-equality of a post-move render against
a fresh engine at the new camera and (b) zero new jit traces on a move.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig, RenderMode
from tpt.engine import Renderer
from tpt.scene import procedural


@pytest.fixture(scope="module")
def cornell():
    scene = procedural.cornell_box(resolution=(32, 32), spheres=False)
    return scene, scene.build()


def _trace_count(step_fn):
    return sum(f._cache_size() for f in step_fn._jit_fns)


MOVED_EYE = (300.0, 260.0, -750.0)


class TestCameraMove:
    def test_wavefront_move_exact_and_no_retrace(self, cornell):
        scene, data = cornell
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=3,
                           denoiser_on=False)
        r = Renderer(data, scene.camera, cfg)
        r.frame()  # compile at the original camera
        cam2 = scene.camera.moved(position=MOVED_EYE)

        before = _trace_count(r._frame_fn)
        r.move_camera(cam2)
        img_moved = r.frame()
        assert _trace_count(r._frame_fn) == before, \
            "camera move must not trigger a retrace"
        assert r.iteration == 1  # accumulation reset

        fresh = Renderer(data, cam2, cfg)
        img_fresh = fresh.frame()
        np.testing.assert_array_equal(img_moved, img_fresh)

    def test_wavefront_split_mode_move_exact(self, cornell):
        """Split-bounce dispatch (the TPU production path) takes the camera
        through `start` and per-bounce view_proj arguments."""
        from tpt.core.vec import Vec3
        from tpt.integrators import wavefront

        scene, data = cornell
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=3)
        frame, vp = wavefront.make_frame_fn(data, scene.camera, cfg,
                                            split_bounces=True)
        n = scene.camera.num_pixels
        zero = lambda: (Vec3.zeros((n,)), Vec3.zeros((n,)))
        out0, _, _ = frame(jnp.uint32(1), vp, *zero())

        cam2 = scene.camera.moved(position=MOVED_EYE)
        from tpt.core.camera import camera_arrays

        camv2 = camera_arrays(cam2)
        before = _trace_count(frame)
        out_moved, acc_d, acc_i = frame(jnp.uint32(1), camv2.view_proj,
                                        *zero(), camv=camv2)
        assert _trace_count(frame) == before

        frame2, vp2 = wavefront.make_frame_fn(data, cam2, cfg,
                                              split_bounces=True)
        out_fresh, acc_d2, acc_i2 = frame2(jnp.uint32(1), vp2, *zero())
        np.testing.assert_array_equal(np.asarray(acc_d.x),
                                      np.asarray(acc_d2.x))
        np.testing.assert_array_equal(np.asarray(acc_i.x),
                                      np.asarray(acc_i2.x))

    def test_megakernel_move_exact_and_no_retrace(self, cornell):
        scene, data = cornell
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=3,
                           mode=RenderMode.MEGAKERNEL)
        r = Renderer(data, scene.camera, cfg)
        r.frame()
        cam2 = scene.camera.moved(position=MOVED_EYE)

        before = _trace_count(r._mega_step)
        r.move_camera(cam2)
        img_moved = r.frame()
        assert _trace_count(r._mega_step) == before

        fresh = Renderer(data, cam2, cfg)
        img_fresh = fresh.frame()
        np.testing.assert_array_equal(img_moved, img_fresh)


class TestNavigationPreview:
    def test_preview_renderer_scale_and_move(self, cornell):
        from tpt.viewer import _upscale, make_preview_renderer

        scene, data = cornell
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=2)
        r = Renderer(data, scene.camera, cfg)
        p = make_preview_renderer(r, scale=2)
        assert p.cam.resolution == (16, 16)
        img = p.frame()
        assert img.shape == (16, 16, 3)
        up = _upscale(img, r._shape)
        assert up.shape == (32, 32, 3)
        # preview re-targets without error and stays in sync
        p.move_camera(p.cam.moved(position=MOVED_EYE))
        assert p.frame().shape == (16, 16, 3)

    def test_yaw_pitch_roundtrip(self):
        import numpy as np

        from tpt.viewer import view_from_yaw_pitch, yaw_pitch_from_view

        for v in ((0.0, 0.0, -1.0), (1.0, 0.0, 0.0),
                  (0.577, 0.577, -0.578), (0.0, 0.999, 0.045)):
            v = np.asarray(v) / np.linalg.norm(v)
            yaw, pitch = yaw_pitch_from_view(v)
            back = np.asarray(view_from_yaw_pitch(yaw, pitch))
            np.testing.assert_allclose(back, v, atol=1e-6)
        assert yaw_pitch_from_view((0.0, 1.0, 0.0))[1] == 90.0


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))
