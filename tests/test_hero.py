"""Hero-scene end-to-end test (VERDICT r1 item 9): the flagship
composition — textured + normal-mapped floor, brick wall, metal/glass/
mirror spheres, a mesh light AND an HDR sun environment — rendered
through the CLI with the BVH backend and SVGF, golden-pinned at small
resolution. Proves the full feature stack (atlas sampling, TBN normal
mapping, MTL map_Pr, env-map NEE via the alias table, light CDF NEE,
all three BSDF classes, SVGF temporal pipeline) composes in ONE render
the way the reference's bunny/Sponza hero shots do
(/root/reference/scenes/bunny_rendering.json)."""

import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = os.path.join(REPO, "scenes")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_hero_120x68.npz")


def _ensure_assets():
    """Generated textures/HDR are not tracked; (re)build them in place."""
    needed = ["hero_checker.png", "hero_bricks.png", "hero_normal.png",
              "hero_mr.png", "hero_env.hdr", "hero_studio.obj"]
    if all(os.path.exists(os.path.join(SCENES, f)) for f in needed):
        return
    spec = importlib.util.spec_from_file_location(
        "make_scenes", os.path.join(SCENES, "make_scenes.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.hero()


def _render_small(tmp_path, iterations=3):
    from tpt.cli import main

    _ensure_assets()
    doc = json.load(open(os.path.join(SCENES, "hero.json")))
    doc["Camera"]["RES"] = [120, 68]
    doc["Camera"]["ITERATIONS"] = iterations
    doc["Camera"]["DEPTH"] = 4
    doc["Environment Texture"]["FILE"] = os.path.join(SCENES, "hero_env.hdr")
    doc["Objects"][0]["FILE"] = os.path.join(SCENES, "hero_studio.obj")
    p = tmp_path / "hero_small.json"
    p.write_text(json.dumps(doc))

    out_dir = tmp_path / "out"
    rc = main([str(p), "-wave", "--backend", "bvh", "--denoise",
               "--env-nee", "--out-dir", str(out_dir)])
    assert rc == 0
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 1 and pngs[0].startswith("hero.")

    from PIL import Image

    return np.asarray(
        Image.open(out_dir / pngs[0]), dtype=np.float32) / 255.0


class TestHeroScene:
    def test_hero_end_to_end_matches_golden(self, tmp_path):
        img = _render_small(tmp_path)
        assert img.shape == (68, 120, 3)

        # feature-stack sanity before the golden: the render is lit (sun +
        # lamp), not clipped to black/white, and spatially varied (textures)
        assert 0.03 < img.mean() < 0.9
        assert img.std() > 0.05
        # checkerboard floor: bottom rows alternate in brightness
        floor = img[-12:].mean(axis=(0, 2))
        assert floor.std() > 0.01

        if not os.path.exists(GOLDEN):  # pragma: no cover - regen path
            np.savez_compressed(GOLDEN, image=img)
            pytest.skip("golden written; re-run to compare")
        golden = np.load(GOLDEN)["image"]
        close = np.isclose(img, golden, atol=2 / 255.0).mean()
        assert close > 0.97, (close, float(np.abs(img - golden).max()))
        np.testing.assert_allclose(img.mean(), golden.mean(), rtol=0.02)
