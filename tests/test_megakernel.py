import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig
from tpt.integrators import megakernel
from tpt.scene import procedural
from tpt.scene.structs import MaterialType


@pytest.fixture(scope="module")
def cornell_empty():
    scene = procedural.cornell_box(resolution=(48, 48), spheres=False)
    return scene, scene.build()


CFG = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=4)


class TestMegakernel:
    def test_renders_finite_nonzero(self, cornell_empty):
        scene, data = cornell_empty
        img = megakernel.render(data, scene.camera, CFG, iterations=2)
        assert img.shape == (48, 48, 3)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01  # lit scene
        assert img.max() <= 15.0 + 1e-3  # bounded by light emittance

    def test_deterministic_per_seed(self, cornell_empty):
        scene, data = cornell_empty
        a = megakernel.render(data, scene.camera, CFG, iterations=1)
        b = megakernel.render(data, scene.camera, CFG, iterations=1)
        np.testing.assert_array_equal(a, b)

    def test_different_iterations_decorrelated(self, cornell_empty):
        scene, data = cornell_empty
        a = megakernel.render(data, scene.camera, CFG, iterations=1, start_iter=1)
        b = megakernel.render(data, scene.camera, CFG, iterations=1, start_iter=2)
        assert np.abs(a - b).max() > 1e-4

    def test_color_bleed_sides(self, cornell_empty):
        """Green wall at x=0 (image right with this camera), red wall at x=L
        (image left): side columns must tint accordingly."""
        scene, data = cornell_empty
        img = megakernel.render(data, scene.camera, CFG, iterations=4)
        left = img[:, :6].mean(axis=(0, 1))
        right = img[:, -6:].mean(axis=(0, 1))
        assert left[0] > left[1] * 2  # red dominant
        assert right[1] > right[0] * 2  # green dominant

    def test_energy_decreases_with_depth1(self, cornell_empty):
        """depth-1 only shows direct light; depth-4 adds bounces -> brighter."""
        scene, data = cornell_empty
        img1 = megakernel.render(data, scene.camera, CFG.with_(trace_depth=1),
                                 iterations=2)
        img4 = megakernel.render(data, scene.camera, CFG, iterations=2)
        assert img4.mean() > img1.mean()

    def test_specular_spheres_render(self):
        scene = procedural.cornell_box(
            resolution=(32, 32),
            sphere_materials=(MaterialType.SPECULAR_REFLECTION,
                              MaterialType.SPECULAR_REFRACTION))
        data = scene.build()
        img = megakernel.render(data, scene.camera, CFG, iterations=2)
        assert np.isfinite(img).all()
        assert img.mean() > 0.005

    def test_pbr_sphere_renders(self):
        scene = procedural.cornell_box(
            resolution=(32, 32),
            sphere_materials=(MaterialType.MICROFACET_PBR, MaterialType.DIFFUSE))
        data = scene.build()
        img = megakernel.render(data, scene.camera, CFG, iterations=2)
        assert np.isfinite(img).all()


class TestWhiteFurnace:
    def test_furnace_closed_room(self):
        """A closed white box with albedo 1 and a uniform env would conserve
        energy; here we check a looser invariant: with pure-white walls the
        render is brighter than with grey walls, and both are finite."""
        import copy

        s_white = procedural.cornell_box(resolution=(24, 24), spheres=False)
        for m in s_white.materials:
            if m.emittance == 0:
                m.basecolor = (1.0, 1.0, 1.0)
        img_w = megakernel.render(s_white.build(), s_white.camera, CFG, iterations=2)

        s_grey = procedural.cornell_box(resolution=(24, 24), spheres=False)
        img_g = megakernel.render(s_grey.build(), s_grey.camera, CFG, iterations=2)
        assert img_w.mean() > img_g.mean()
        assert np.isfinite(img_w).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
