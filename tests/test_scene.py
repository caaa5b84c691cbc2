import jax.numpy as jnp
import numpy as np
import pytest

from tpt.core import rng
from tpt.core.vec import Vec3
from tpt.scene import procedural
from tpt.scene.envmap import build_envmap, build_vose_alias, env_pdf, env_radiance, sample_env
from tpt.scene.lights import build_light_cdf, sample_light
from tpt.scene.mesh import compute_geometric_normals, dedup_vertices, merge_meshes
from tpt.scene.structs import MaterialType
from tpt.scene.texture import AtlasBuilder, sample_atlas


class TestMesh:
    def test_quad_normals(self):
        q = procedural.make_quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), 0)
        gn = compute_geometric_normals(q.positions, q.indices)
        np.testing.assert_allclose(gn, [[0, 0, 1], [0, 0, 1]], atol=1e-6)

    def test_dedup(self):
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 0], [1, 0, 0]], np.float32)
        nor = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
        uv = np.zeros((4, 2), np.float32)
        idx = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
        p2, n2, uv2, idx2 = dedup_vertices(pos, nor, uv, idx)
        assert p2.shape[0] == 2
        # triangle connectivity preserved under relabeling
        orig = pos[idx]
        new = p2[idx2]
        np.testing.assert_allclose(orig, new)

    def test_merge(self):
        a = procedural.make_quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), 0)
        b = procedural.make_box((0, 0, 0), (1, 1, 1), 1)
        m = merge_meshes([a, b])
        assert m.num_triangles == 2 + 12
        assert m.indices.max() == m.positions.shape[0] - 1

    def test_sphere_closed(self):
        s = procedural.make_uv_sphere((0, 0, 0), 2.0, 0, n_theta=8, n_phi=16)
        r = np.linalg.norm(s.positions, axis=-1)
        np.testing.assert_allclose(r, 2.0, rtol=1e-5)
        # total surface area approximates 4*pi*r^2
        v0 = s.positions[s.indices[:, 0]]
        v1 = s.positions[s.indices[:, 1]]
        v2 = s.positions[s.indices[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
        assert abs(area - 4 * np.pi * 4) / (4 * np.pi * 4) < 0.1


class TestLights:
    def test_cdf_and_sampling(self):
        scene = procedural.cornell_box(resolution=(8, 8), spheres=False)
        lights = build_light_cdf(scene.mesh, scene.emittances())
        assert lights.num_lights == 2  # light quad = 2 triangles
        cdf = np.asarray(lights.cdf)
        assert cdf[-1] == 1.0
        assert np.all(np.diff(cdf) >= 0)
        # area of 130x105 quad
        np.testing.assert_allclose(float(lights.total_area), 130 * 105, rtol=1e-4)

        data = scene.build()
        state = rng.path_seed(jnp.arange(4096, dtype=jnp.uint32), 1)
        state, p, n, pdf, tri, le = sample_light(data.mesh, data.lights, state)
        # all samples on the light plane y=548
        np.testing.assert_allclose(np.asarray(p.y), 548.0, atol=1e-3)
        assert np.all(np.asarray(p.x) >= 213 - 1e-3)
        assert np.all(np.asarray(p.x) <= 343 + 1e-3)
        np.testing.assert_allclose(np.asarray(pdf), 1.0 / (130 * 105), rtol=1e-4)


class TestAtlas:
    def test_pack_and_sample(self):
        b = AtlasBuilder()
        img0 = np.zeros((4, 4, 4), np.float32)
        img0[..., 0] = 1.0  # red
        img1 = np.zeros((8, 8, 4), np.float32)
        img1[..., 1] = 0.5  # green
        t0 = b.add(img0)
        t1 = b.add(img1)
        atlas = b.build()
        assert atlas.num_textures == 2

        uv = jnp.full((16,), 0.5)
        rgb0, _ = sample_atlas(atlas, jnp.full((16,), t0, jnp.int32), uv, uv)
        np.testing.assert_allclose(np.asarray(rgb0.x), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb0.y), 0.0, atol=1e-6)
        rgb1, _ = sample_atlas(atlas, jnp.full((16,), t1, jnp.int32), uv, uv)
        np.testing.assert_allclose(np.asarray(rgb1.y), 0.5, atol=1e-6)

    def test_no_texture_identity(self):
        atlas = AtlasBuilder().build()
        rgb, a = sample_atlas(atlas, jnp.full((8,), -1, jnp.int32),
                              jnp.zeros((8,)), jnp.zeros((8,)))
        np.testing.assert_allclose(np.asarray(rgb.x), 1.0)
        np.testing.assert_allclose(np.asarray(a), 1.0)

    def test_dedup_by_path(self):
        b = AtlasBuilder()
        img = np.ones((4, 4, 4), np.float32)
        assert b.add(img, "foo.png") == b.add(img, "foo.png")


class TestEnvMap:
    def test_vose_alias_statistics(self):
        w = np.array([1.0, 2.0, 3.0, 4.0])
        alias, prob = build_vose_alias(w)
        # Monte-Carlo over the table reproduces the weights
        rs = np.random.default_rng(0)
        n = 200_000
        u = rs.random(n) * 4
        slot = np.minimum(u.astype(int), 3)
        xi = u - slot
        pick = np.where(xi < prob[slot], slot, alias[slot])
        freq = np.bincount(pick, minlength=4) / n
        np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)

    def test_pdf_integrates_to_one(self):
        # white env: pdf must integrate to 1 over the sphere
        rgb = np.ones((64, 128, 3), np.float32)
        env = build_envmap(rgb)
        h, w = 64, 128
        theta = (np.arange(h) + 0.5) / h * np.pi
        d_omega = (2 * np.pi / w) * (np.pi / h) * np.sin(theta)[:, None]
        integral = float((np.asarray(env.pdf) * d_omega).sum())
        assert abs(integral - 1.0) < 0.01

    def test_radiance_lookup(self):
        rgb = np.zeros((16, 32, 3), np.float32)
        rgb[:, :, 0] = np.linspace(0, 1, 32)[None, :]
        env = build_envmap(rgb)
        # +Z direction is phi=pi/2 -> u=0.25 -> texel col ~7.5 of the gradient
        d = Vec3.of(jnp.zeros(4), jnp.zeros(4), jnp.ones(4))
        r = env_radiance(env, d)
        np.testing.assert_allclose(np.asarray(r.x), 7.5 / 31.0, atol=0.02)
        # -X is phi=pi -> u=0.5 -> middle of the gradient
        d2 = Vec3.of(-jnp.ones(4), jnp.zeros(4), jnp.zeros(4))
        r2 = env_radiance(env, d2)
        np.testing.assert_allclose(np.asarray(r2.x), 15.5 / 31.0, atol=0.02)

    def test_sample_env_dirs_unit(self):
        rgb = np.random.default_rng(1).random((16, 32, 3)).astype(np.float32)
        env = build_envmap(rgb)
        u1 = jnp.linspace(0.0, 0.999, 256)
        u2 = jnp.linspace(0.0, 0.999, 256)
        d, rad, pdf = sample_env(env, u1, u2)
        np.testing.assert_allclose(np.asarray(d.length()), 1.0, rtol=1e-5)
        assert np.all(np.asarray(pdf) > 0)


class TestMaterialsTable:
    def test_build(self):
        scene = procedural.cornell_box(
            resolution=(8, 8),
            sphere_materials=(MaterialType.SPECULAR_REFLECTION,
                              MaterialType.SPECULAR_REFRACTION))
        data = scene.build()
        assert data.materials.num_materials == 6
        types = np.asarray(data.materials.mtype)
        assert (types == int(MaterialType.SPECULAR_REFLECTION)).sum() == 1
        assert (types == int(MaterialType.SPECULAR_REFRACTION)).sum() == 1


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
