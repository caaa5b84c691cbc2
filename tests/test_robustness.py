"""Degenerate-input robustness: the reference exits the process on bad
inputs (scene.cpp:53-127); tpt must stay finite and well-defined."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig
from tpt.core.camera import Camera
from tpt.integrators import megakernel, wavefront
from tpt.scene import procedural
from tpt.scene.host import HostMaterial, HostScene
from tpt.scene.mesh import finalize_mesh, merge_meshes


CFG = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=3)


def tiny_cam(res=16):
    return Camera.build((res, res), (0, 0, -5), (0, 0, 0), (0, 1, 0), 45.0)


class TestDegenerateScenes:
    def test_no_lights_no_env_renders_black(self):
        s = HostScene()
        m = s.add_material(HostMaterial("d", (0.5, 0.5, 0.5)))
        s.mesh = procedural.make_box((-1, -1, -1), (1, 1, 1), m)
        s.camera = tiny_cam()
        img = megakernel.render(s.build(), s.camera, CFG, iterations=2)
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img, 0.0)

    def test_single_triangle_scene(self):
        s = HostScene()
        light = s.add_material(HostMaterial("l", (1, 1, 1), emittance=5.0))
        s.mesh = procedural.make_quad((-1, 2, -1), (1, 2, -1), (1, 2, 1),
                                      (-1, 2, 1), light)
        # drop one triangle -> single-triangle mesh
        s.mesh.indices = s.mesh.indices[:1]
        s.mesh.material_ids = s.mesh.material_ids[:1]
        s.camera = tiny_cam()
        data = s.build(with_bvh=True)  # exercises T<2 BVH padding
        img = megakernel.render(data, s.camera,
                                CFG.with_(backend=RayCastBackend.BVH_XLA),
                                iterations=1)
        assert np.isfinite(img).all()

    def test_emissive_only_scene(self):
        """Camera staring straight at a light: first-bounce emissive path."""
        s = HostScene()
        light = s.add_material(HostMaterial("l", (1.0, 0.5, 0.25),
                                            emittance=2.0))
        s.mesh = procedural.make_quad((-2, -2, 2), (2, -2, 2), (2, 2, 2),
                                      (-2, 2, 2), light)
        s.camera = tiny_cam()
        img = megakernel.render(s.build(), s.camera, CFG, iterations=1)
        center = img[6:10, 6:10].mean(axis=(0, 1))
        np.testing.assert_allclose(center, [2.0, 1.0, 0.5], rtol=1e-3)

    def test_camera_inside_geometry(self):
        s = procedural.cornell_box(resolution=(12, 12), spheres=True)
        # bury the camera inside the first sphere
        s.camera = Camera.build((12, 12), (185, 110, 170), (278, 273, 0),
                                (0, 1, 0), 45.0)
        img = megakernel.render(s.build(), s.camera, CFG, iterations=1)
        assert np.isfinite(img).all()

    def test_degenerate_triangles(self):
        """Zero-area triangles must not produce NaNs or hits."""
        s = HostScene()
        m = s.add_material(HostMaterial("d", (0.5, 0.5, 0.5)))
        light = s.add_material(HostMaterial("l", (1, 1, 1), emittance=5.0))
        box = procedural.make_box((-1, -1, -1), (1, 1, 1), m)
        lamp = procedural.make_quad((-1, 3, -1), (1, 3, -1), (1, 3, 1),
                                    (-1, 3, 1), light)
        degen = procedural.make_quad((0, 0, 0), (0, 0, 0), (0, 0, 0),
                                     (0, 0, 0), m)  # all-zero quad
        s.mesh = merge_meshes([box, lamp, degen])
        s.camera = tiny_cam()
        img = megakernel.render(s.build(), s.camera, CFG, iterations=2)
        assert np.isfinite(img).all()

    def test_wavefront_matches_on_degenerate(self):
        s = procedural.cornell_box(resolution=(12, 12), spheres=False)
        data = s.build()
        a = megakernel.render(data, s.camera, CFG, iterations=1)
        b = wavefront.render(data, s.camera, CFG, iterations=1)
        np.testing.assert_allclose(b, a, atol=1e-5)

    def test_zero_emittance_lights_table(self):
        """build_light_cdf with no emissive materials yields the num_lights=0
        path; NEE must be skipped without consuming different RNG."""
        s = HostScene()
        m = s.add_material(HostMaterial("d", (0.5, 0.5, 0.5)))
        s.mesh = procedural.make_box((-1, -1, -1), (1, 1, 1), m)
        s.camera = tiny_cam()
        data = s.build()
        assert int(np.asarray(data.lights.total_area)) == 0
