"""Golden-image regression (SURVEY.md §4b): a stored 24x24 Cornell render
at fixed seed/spp pins the full light-transport output across refactors.

The golden was produced on the CPU backend; cross-platform float drift
(fusion tie-breaks at triangle edges) allows a small mismatch budget, but
any *semantic* change (sampling, MIS weights, RNG streams, BSDF math)
shifts far more pixels than the budget."""

import os

import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig
from tpt.integrators import megakernel, wavefront
from tpt.scene import procedural
from tpt.scene.structs import MaterialType

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_cornell_24_4spp.npz")


def render_current(engine):
    s = procedural.cornell_box(
        resolution=(24, 24),
        sphere_materials=(MaterialType.MICROFACET_PBR,
                          MaterialType.SPECULAR_REFRACTION))
    data = s.build()
    cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE, trace_depth=4)
    return engine.render(data, s.camera, cfg, iterations=4)


class TestGolden:
    def test_megakernel_matches_golden(self):
        golden = np.load(GOLDEN)["image"]
        img = render_current(megakernel)
        close = np.isclose(img, golden, atol=5e-3, rtol=1e-3).mean()
        assert close > 0.97, (close, float(np.abs(img - golden).max()))
        np.testing.assert_allclose(img.mean(), golden.mean(), rtol=0.02)

    def test_wavefront_matches_golden(self):
        golden = np.load(GOLDEN)["image"]
        img = render_current(wavefront)
        close = np.isclose(img, golden, atol=5e-3, rtol=1e-3).mean()
        assert close > 0.97, close
