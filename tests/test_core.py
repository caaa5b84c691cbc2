import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpt.core import rng
from tpt.core.camera import Camera, generate_camera_rays
from tpt.core.mathutil import build_trs_matrix, power_heuristic, refract, reflect
from tpt.core.vec import Vec3


class TestRng:
    def test_wang_hash_reference_values(self):
        # wang_hash is a fixed public construction; check a couple of
        # hand-computed values
        def ref(seed):
            seed = np.uint32(seed)
            seed = np.uint32((seed ^ np.uint32(61)) ^ (seed >> np.uint32(16)))
            seed = np.uint32(seed * np.uint32(9))
            seed = np.uint32(seed ^ (seed >> np.uint32(4)))
            seed = np.uint32(seed * np.uint32(0x27D4EB2D))
            seed = np.uint32(seed ^ (seed >> np.uint32(15)))
            return seed

        xs = np.array([0, 1, 42, 19990303, 0xFFFFFFFF], np.uint32)
        got = np.asarray(rng.wang_hash(jnp.asarray(xs)))
        want = np.array([ref(x) for x in xs], np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_rand_float_range_and_determinism(self):
        state = rng.path_seed(jnp.arange(1024, dtype=jnp.uint32), 3)
        s1, u = rng.rand_float(state)
        assert np.all(np.asarray(u) >= 0.0) and np.all(np.asarray(u) < 1.0)
        s2, u2 = rng.rand_float(state)
        np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
        assert not np.array_equal(np.asarray(s1), np.asarray(state))

    def test_uniformity(self):
        state = rng.path_seed(jnp.arange(100_000, dtype=jnp.uint32), 1)
        _, u = rng.rand_float(state)
        u = np.asarray(u)
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(np.var(u) - 1.0 / 12) < 0.01

    def test_halton(self):
        h = np.asarray(rng.halton(jnp.arange(1, 9), 2))
        np.testing.assert_allclose(
            h, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625], atol=1e-6)


class TestVec3:
    def test_ops(self):
        a = Vec3.of(1.0, 2.0, 3.0)
        b = Vec3.of(4.0, 5.0, 6.0)
        assert float(a.dot(b)) == 32.0
        c = a.cross(b)
        np.testing.assert_allclose([c.x, c.y, c.z], [-3.0, 6.0, -3.0])
        n = a.normalize()
        np.testing.assert_allclose(float(n.length()), 1.0, rtol=1e-6)

    def test_pytree(self):
        v = Vec3.ones((8,))
        leaves = jax.tree_util.tree_leaves(v)
        assert len(leaves) == 3
        doubled = jax.jit(lambda u: u * 2.0)(v)
        np.testing.assert_allclose(np.asarray(doubled.x), 2.0)

    def test_stacked_roundtrip(self):
        arr = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
        v = Vec3.from_stacked(jnp.asarray(arr))
        np.testing.assert_allclose(np.asarray(v.stacked()), arr)


class TestMath:
    def test_power_heuristic(self):
        assert abs(float(power_heuristic(jnp.float32(1.0), jnp.float32(1.0))) - 0.5) < 1e-3
        assert float(power_heuristic(jnp.float32(100.0), jnp.float32(0.1))) > 0.99

    def test_reflect(self):
        d = Vec3.of(1.0, -1.0, 0.0).normalize()
        n = Vec3.of(0.0, 1.0, 0.0)
        r = reflect(d, n)
        np.testing.assert_allclose(
            [float(r.x), float(r.y), float(r.z)],
            np.array([1.0, 1.0, 0.0]) / np.sqrt(2), rtol=1e-6)

    def test_refract_tir(self):
        # grazing ray from dense to sparse medium -> TIR
        d = Vec3.of(1.0, -0.1, 0.0).normalize()
        n = Vec3.of(0.0, 1.0, 0.0)
        _, tir = refract(d, n, jnp.float32(1.5))
        assert bool(tir)

    def test_trs_matrix(self):
        m = build_trs_matrix([1, 2, 3], [0, 90, 0], [2, 2, 2])
        p = m @ np.array([1, 0, 0, 1.0])
        np.testing.assert_allclose(p[:3], [1, 2, 1], atol=1e-5)


class TestCamera:
    def test_build_matches_reference_derivation(self):
        cam = Camera.build((1920, 1080), (0, 0, -10), (0, 0, 0), (0, 1, 0), 45.0)
        np.testing.assert_allclose(cam.view, (0, 0, 1), atol=1e-7)
        np.testing.assert_allclose(cam.right, (-1, 0, 0), atol=1e-7)
        yscaled = np.tan(np.radians(45.0 / 2))
        np.testing.assert_allclose(cam.pixel_length[1], 2 * yscaled / 1080, rtol=1e-6)

    def test_generate_rays_center_pixel(self):
        cam = Camera.build((64, 64), (0, 0, -10), (0, 0, 0), (0, 1, 0), 45.0)
        o, d, seed = generate_camera_rays(cam, jnp.uint32(1), jitter=False)
        assert o.shape == (64 * 64,)
        # all directions unit length
        lens = np.asarray(d.length())
        np.testing.assert_allclose(lens, 1.0, rtol=1e-5)
        # corner rays symmetric about the view axis
        dz = np.asarray(d.z)
        assert dz.min() > 0.5


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
