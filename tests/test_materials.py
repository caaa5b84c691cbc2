"""Material-system correctness: pdf normalization, energy conservation,
reciprocity-ish sanity, and the white-furnace test (SURVEY.md §4's
suggested property tests for the TPU build)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpt.core import rng
from tpt.core.vec import Vec3
from tpt.materials import bsdf
from tpt.scene.structs import MaterialType


def lanes_material(mtype, n, basecolor=(0.8, 0.8, 0.8), metallic=0.0,
                   roughness=0.5, ior=1.5, emittance=0.0):
    shape = (n,)
    return bsdf.MaterialLanes(
        basecolor=Vec3.splat(basecolor, shape=shape),
        metallic=jnp.full(shape, metallic),
        roughness=jnp.full(shape, roughness),
        emittance=jnp.full(shape, emittance),
        ior=jnp.full(shape, ior),
        mtype=jnp.full(shape, int(mtype), jnp.int32),
        tex_diffuse=jnp.full(shape, -1, jnp.int32),
        tex_metallic_roughness=jnp.full(shape, -1, jnp.int32),
        tex_normal=jnp.full(shape, -1, jnp.int32),
    )


def uniform_hemisphere(n, seed=0):
    rs = np.random.default_rng(seed)
    u1 = rs.random(n)
    u2 = rs.random(n)
    z = u1
    r = np.sqrt(np.maximum(0.0, 1 - z * z))
    phi = 2 * np.pi * u2
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)


class TestPdfNormalization:
    @pytest.mark.parametrize("roughness,metallic,lo", [
        (0.5, 0.0, 0.95), (0.2, 0.8, 0.95),
        # high roughness + specular weight: classic-NDF sampling puts some
        # half-vectors below the horizon; both the reference and tpt kill
        # those samples (interactions.cu samplePBR), so the hemisphere pdf
        # integral is legitimately < 1 by exactly that wasted fraction
        (0.9, 0.3, 0.75),
    ])
    def test_pbr_pdf_integrates_to_at_most_one(self, roughness, metallic, lo):
        """MC integral of the PBR solid-angle pdf over the hemisphere is
        <= 1, and ~1 when little energy falls below the horizon
        (uniform-direction estimator: mean(pdf) * 2pi)."""
        n = 200_000
        dirs = uniform_hemisphere(n, seed=3)
        wi = Vec3.from_stacked(jnp.asarray(dirs.astype(np.float32)))
        normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        wo = Vec3.splat((np.sin(0.4), 0.0, np.cos(0.4)), shape=(n,))
        m = lanes_material(MaterialType.MICROFACET_PBR, n,
                           roughness=roughness, metallic=metallic)
        pdf = np.asarray(bsdf.pdf_bsdf(wo, wi, normal, m))
        integral = pdf.mean() * 2 * np.pi
        assert lo < integral < 1.02, integral

    def test_diffuse_pdf_integrates_to_one(self):
        n = 100_000
        dirs = uniform_hemisphere(n, seed=4)
        wi = Vec3.from_stacked(jnp.asarray(dirs.astype(np.float32)))
        normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        wo = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        m = lanes_material(MaterialType.DIFFUSE, n)
        pdf = np.asarray(bsdf.pdf_bsdf(wo, wi, normal, m))
        assert abs(pdf.mean() * 2 * np.pi - 1.0) < 0.03


class TestSamplingConsistency:
    def test_sampled_pdf_matches_pdf_fn(self):
        """pdf reported by sample_bsdf equals pdf_bsdf re-evaluated at the
        sampled direction (PBR lobe mixing consistency)."""
        n = 8192
        state = rng.path_seed(jnp.arange(n, dtype=jnp.uint32), 9)
        normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        wo = Vec3.splat((np.sin(0.5), 0.0, np.cos(0.5)), shape=(n,))
        m = lanes_material(MaterialType.MICROFACET_PBR, n, roughness=0.4,
                           metallic=0.5)
        _, smp = bsdf.sample_bsdf(wo, normal, m, state)
        valid = np.asarray(smp.pdf) > 0
        pdf_re = np.asarray(bsdf.pdf_bsdf(wo, smp.wi, normal, m))
        np.testing.assert_allclose(np.asarray(smp.pdf)[valid],
                                   pdf_re[valid], rtol=2e-3)

    def test_cosine_sampling_distribution(self):
        """Diffuse sampling: E[cos theta] = 2/3 for pdf = cos/pi."""
        n = 200_000
        state = rng.path_seed(jnp.arange(n, dtype=jnp.uint32), 5)
        normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        wo = normal
        m = lanes_material(MaterialType.DIFFUSE, n)
        _, smp = bsdf.sample_bsdf(wo, normal, m, state)
        cos_t = np.asarray(smp.wi.z)
        assert abs(cos_t.mean() - 2.0 / 3.0) < 0.01

    def test_mirror_reflects(self):
        n = 64
        state = rng.path_seed(jnp.arange(n, dtype=jnp.uint32), 1)
        normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        wo = Vec3.splat((np.sin(0.7), 0.0, np.cos(0.7)), shape=(n,))
        m = lanes_material(MaterialType.SPECULAR_REFLECTION, n, metallic=1.0)
        _, smp = bsdf.sample_bsdf(wo, normal, m, state)
        np.testing.assert_allclose(np.asarray(smp.wi.x), -np.sin(0.7),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(smp.wi.z), np.cos(0.7),
                                   atol=1e-5)

    def test_glass_energy_split(self):
        """Dielectric: reflect and refract branches both occur; attenuation
        never exceeds the (n2/n1)^2 radiance-scaling bound."""
        n = 100_000
        state = rng.path_seed(jnp.arange(n, dtype=jnp.uint32), 2)
        normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        wo = Vec3.splat((np.sin(0.3), 0.0, np.cos(0.3)), shape=(n,))
        m = lanes_material(MaterialType.SPECULAR_REFRACTION, n,
                           basecolor=(1.0, 1.0, 1.0), ior=1.5)
        _, smp = bsdf.sample_bsdf(wo, normal, m, state)
        trans = np.asarray(smp.is_transmission)
        assert 0.7 < trans.mean() < 0.99  # mostly refracts at this angle
        att = np.asarray(smp.attenuation.x)
        assert att.max() <= 1.5 ** 2 + 1e-4


class TestWhiteFurnace:
    def test_furnace_diffuse(self):
        """A unit-albedo diffuse plane under a uniform unit environment must
        reflect exactly radiance 1 in expectation (f*cos/pdf == albedo for
        cosine sampling): the attenuation of every sample is albedo."""
        n = 65_536
        state = rng.path_seed(jnp.arange(n, dtype=jnp.uint32), 7)
        normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
        wo = Vec3.splat((0.3, 0.1, 0.94), shape=(n,)).normalize()
        m = lanes_material(MaterialType.DIFFUSE, n, basecolor=(1.0, 1.0, 1.0))
        _, smp = bsdf.sample_bsdf(wo, normal, m, state)
        att = np.asarray(smp.attenuation.x)
        valid = np.asarray(smp.pdf) > 0
        np.testing.assert_allclose(att[valid].mean(), 1.0, atol=2e-3)

    def test_furnace_pbr_energy_bounded(self):
        """GGX with Smith masking never gains energy: mean attenuation of a
        white PBR surface stays <= 1 (loses a little to single-scattering)."""
        for rough in (0.1, 0.4, 0.9):
            n = 65_536
            state = rng.path_seed(jnp.arange(n, dtype=jnp.uint32), 11)
            normal = Vec3.splat((0.0, 0.0, 1.0), shape=(n,))
            wo = Vec3.splat((0.2, 0.0, 0.98), shape=(n,)).normalize()
            m = lanes_material(MaterialType.MICROFACET_PBR, n,
                               basecolor=(1.0, 1.0, 1.0), roughness=rough,
                               metallic=1.0)
            _, smp = bsdf.sample_bsdf(wo, normal, m, state)
            att = np.asarray(smp.attenuation.x)
            valid = np.asarray(smp.pdf) > 0
            mean_att = np.where(valid, att, 0.0).mean()
            # never gains energy; loses to single-scattering + the
            # below-horizon kills of classic NDF sampling (40% at r=0.9 —
            # same behavior as the reference's samplePBR)
            assert mean_att <= 1.05, (rough, mean_att)
            assert mean_att > 0.35, (rough, mean_att)
