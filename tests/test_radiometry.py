"""Analytic radiometric ground truth (VERDICT round 2, missing #3).

The golden images pin the output against *itself*; these tests pin the
integrator's absolute radiometry against closed forms none of the code
under test knows about:

- direct lighting from a quad emitter vs the exact contour integral
  (Lambert's formula: E = L/2 * sum_i gamma_i (u_i . n))
- a uniform-environment furnace where every path carries EXACTLY the
  env radiance (zero-variance check, tight tolerance)
- a non-uniform environment vs dense hemisphere quadrature of the same
  bilinear map, with env NEE off (pure BSDF sampling) and on (alias-table
  sampler + MIS) — both must converge to the same integral, which pins
  the alias sampler's pdf normalization
- dielectric energy conservation: a glass sphere in a furnace returns the
  furnace radiance (reflect/refract/TIR bookkeeping loses nothing beyond
  depth truncation)

This battery found the round-3 env MIS bug: BSDF-sampled env hits were
power-heuristic down-weighted even when the complementary env-NEE
estimator was disabled (the default), silently losing energy on every
env-lit scene.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig
from tpt.core.camera import Camera, generate_camera_rays
from tpt.integrators import wavefront
from tpt.scene import procedural
from tpt.scene.envmap import build_envmap, env_radiance
from tpt.scene.host import HostMaterial, HostScene
from tpt.scene.mesh import merge_meshes
from tpt.core.vec import Vec3


def quad_irradiance(p, verts, radiance):
    """Exact irradiance at point p (normal +y) from a Lambertian quad of
    uniform radiance: the classic contour integral over the polygon edges
    (E = L/2 |sum_i gamma_i (u_i . n)|)."""
    p = np.asarray(p, np.float64)
    v = []
    for q in verts:
        x = np.asarray(q, np.float64) - p
        v.append(x / np.linalg.norm(x))
    acc = np.zeros(3)
    for i in range(len(v)):
        a, b = v[i], v[(i + 1) % len(v)]
        gamma = np.arccos(np.clip(np.dot(a, b), -1.0, 1.0))
        u = np.cross(a, b)
        u /= max(np.linalg.norm(u), 1e-20)
        acc += gamma * u
    return radiance * 0.5 * abs(acc[1])  # receiver normal (0, 1, 0)


def overhead_camera(res, height=4.0, fovy=30.0):
    return Camera.build(resolution=res, position=(0.0, height, 0.0),
                        look_at=(0.0, 0.0, 1e-5), up=(0.0, 0.0, 1.0),
                        fovy_deg=fovy)


class TestDirectLighting:
    def test_quad_light_matches_contour_integral(self):
        """Floor + one overhead quad light, nothing else: at depth 2 the
        direct (NEE) + indirect (BSDF-sampled emissive hit) channels sum
        to the full MIS estimator of L_o = albedo/pi * E."""
        albedo = 0.8
        L = 5.0
        s = HostScene()
        floor = s.add_material(HostMaterial("floor", (albedo,) * 3))
        lightm = s.add_material(HostMaterial("light", (1.0,) * 3,
                                             emittance=L))
        # light quad at y=2, winding chosen so the normal faces DOWN
        lv = [(-0.6, 2.0, -0.4), (0.6, 2.0, -0.4),
              (0.6, 2.0, 0.8), (-0.6, 2.0, 0.8)]
        s.mesh = merge_meshes([
            procedural.make_quad((-8, 0, 8), (8, 0, 8), (8, 0, -8),
                                 (-8, 0, -8), floor),
            procedural.make_quad(*lv, material_id=lightm),
        ])
        s.camera = overhead_camera((4, 4), height=1.2, fovy=50.0)
        data = s.build()
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE,
                           trace_depth=2, jitter=False)

        iters = 1500
        img = wavefront.render(data, s.camera, cfg, iterations=iters)

        # recover each pixel's (deterministic, jitter-off) floor point
        ori, d, _ = generate_camera_rays(s.camera, jnp.uint32(1),
                                         jitter=False)
        t = -np.asarray(ori.y) / np.asarray(d.y)
        px = np.asarray(ori.x) + t * np.asarray(d.x)
        pz = np.asarray(ori.z) + t * np.asarray(d.z)

        got = img.reshape(-1, 3).mean(axis=1)
        want = np.array([
            albedo / np.pi * quad_irradiance((x, 0.0, z), lv, L)
            for x, z in zip(px, pz)])
        np.testing.assert_allclose(got, want, rtol=0.04)
        # and the camera-facing pixels are genuinely lit
        assert want.min() > 0.1


def floor_scene(res=(4, 4), albedo=1.0):
    s = HostScene()
    floor = s.add_material(HostMaterial("floor", (albedo,) * 3))
    s.mesh = procedural.make_quad((-50, 0, 50), (50, 0, 50), (50, 0, -50),
                                  (-50, 0, -50), floor)
    s.camera = overhead_camera(res, height=3.0)
    return s


class TestEnvironmentRadiometry:
    def test_uniform_env_furnace_exact(self):
        """Unit-albedo floor under a uniform env of radiance c: every path
        carries exactly c (cosine sampling's f*cos/pdf == albedo), so two
        iterations suffice and the tolerance is float-tight."""
        c = 0.73
        s = floor_scene()
        s.env_map = build_envmap(np.full((16, 32, 3), c, np.float32))
        data = s.build()
        # env NEE off: the per-path-exactness argument above holds only
        # for pure BSDF sampling (NEE+MIS is exact in expectation, not
        # per path) — env_nee defaults True since the round-4 unification
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE,
                           trace_depth=2, jitter=False, env_nee=False)
        img = wavefront.render(data, s.camera, cfg, iterations=2)
        np.testing.assert_allclose(img, c, rtol=2e-5)

    @pytest.mark.parametrize("env_nee", [False, True])
    def test_gradient_env_matches_quadrature(self, env_nee):
        """Non-uniform (elevation-gradient) env: the rendered exitant
        radiance must match dense hemisphere quadrature of the SAME
        bilinear map — with env NEE off (pure BSDF sampling, weight-1 miss
        after the round-3 fix) and on (alias sampler + MIS)."""
        h, w = 16, 32
        ys = np.linspace(1.0, -1.0, h)  # texel-center elevation ramp
        rgb = np.repeat(
            (0.4 + 0.6 * (ys[:, None] * 0.5 + 0.5))[:, :, None], 3,
            axis=2).astype(np.float32)
        rgb = np.repeat(rgb, w, axis=1)
        env = build_envmap(rgb)

        # ground truth: quadrature of env_radiance over the hemisphere
        nt, np_ = 128, 256
        th = (np.arange(nt) + 0.5) / nt * (np.pi / 2)
        ph = (np.arange(np_) + 0.5) / np_ * (2 * np.pi)
        tt, pp = np.meshgrid(th, ph, indexing="ij")
        d = Vec3(jnp.asarray((np.sin(tt) * np.cos(pp)).ravel(), jnp.float32),
                 jnp.asarray(np.cos(tt).ravel(), jnp.float32),
                 jnp.asarray((np.sin(tt) * np.sin(pp)).ravel(), jnp.float32))
        L = np.asarray(env_radiance(env, d).x).reshape(nt, np_)
        w_sa = (np.sin(tt) * np.cos(tt)) * (np.pi / 2 / nt) * (2 * np.pi / np_)
        want = float((L * w_sa).sum() / np.pi)

        s = floor_scene()
        s.env_map = env
        data = s.build()
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE,
                           trace_depth=2, jitter=False, env_nee=env_nee)
        iters = 600 if env_nee else 2500
        img = wavefront.render(data, s.camera, cfg, iterations=iters)
        got = float(img.mean())
        np.testing.assert_allclose(got, want, rtol=0.02)

    def test_dielectric_furnace_energy(self):
        """Glass sphere in a uniform furnace: reflect/refract/TIR paths all
        terminate in the env, so the sphere disappears up to depth
        truncation — energy is conserved through the dielectric."""
        c = 0.6
        s = HostScene()
        from tpt.scene.structs import MaterialType

        glass = s.add_material(HostMaterial(
            "glass", (1.0, 1.0, 1.0),
            mtype=MaterialType.SPECULAR_REFRACTION, ior=1.5))
        s.mesh = procedural.make_uv_sphere((0, 0, 0), 1.0, glass,
                                           n_theta=24, n_phi=48)
        s.camera = Camera.build(resolution=(6, 6), position=(0, 0, 3.2),
                                look_at=(0, 0, 0), up=(0, 1, 0),
                                fovy_deg=30.0)
        s.env_map = build_envmap(np.full((16, 32, 3), c, np.float32))
        data = s.build()
        cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE,
                           trace_depth=24, jitter=False)
        img = wavefront.render(data, s.camera, cfg, iterations=96)
        assert img.mean() == pytest.approx(c, rel=0.02)
        assert img.min() > 0.9 * c
