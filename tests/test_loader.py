import json
import os
import textwrap

import numpy as np
import pytest

from tpt.scene.loader import load_scene, peek_resolution
from tpt.scene.obj import load_obj, mtl_to_pbr, parse_mtl, MTLMaterial
from tpt.scene.host import HostScene
from tpt.scene.structs import MaterialType


CUBE_OBJ = textwrap.dedent("""\
    # simple cube
    mtllib cube.mtl
    v -1 -1 -1
    v  1 -1 -1
    v  1  1 -1
    v -1  1 -1
    v -1 -1  1
    v  1 -1  1
    v  1  1  1
    v -1  1  1
    usemtl red
    f 1 2 3 4
    f 5 8 7 6
    usemtl shiny
    f 1 5 6 2
    f 3 7 8 4
    f 2 6 7 3
    f 1 4 8 5
    """)

CUBE_MTL = textwrap.dedent("""\
    newmtl red
    Kd 0.8 0.1 0.1
    Ns 0
    newmtl shiny
    Kd 0.7 0.7 0.7
    Ks 0.9 0.9 0.9
    Ns 500
    Ni 1.0
    """)


@pytest.fixture
def cube_dir(tmp_path):
    (tmp_path / "cube.obj").write_text(CUBE_OBJ)
    (tmp_path / "cube.mtl").write_text(CUBE_MTL)
    return tmp_path


class TestObj:
    def test_load_cube(self, cube_dir):
        scene = HostScene()
        mesh = load_obj(str(cube_dir / "cube.obj"), scene)
        assert mesh.num_triangles == 12  # 6 quads triangulated
        assert len(scene.materials) == 2
        # bounding box
        assert mesh.positions.min() == -1.0
        assert mesh.positions.max() == 1.0
        # two material ids in use
        assert set(mesh.material_ids.tolist()) == {0, 1}

    def test_material_override(self, cube_dir):
        scene = HostScene()
        from tpt.scene.host import HostMaterial

        override = scene.add_material(HostMaterial("override", (0, 1, 0)))
        mesh = load_obj(str(cube_dir / "cube.obj"), scene,
                        material_override=override)
        assert set(mesh.material_ids.tolist()) == {override}

    def test_transform(self, cube_dir):
        import numpy as np
        from tpt.core.mathutil import build_trs_matrix

        scene = HostScene()
        trs = build_trs_matrix([10, 0, 0], [0, 0, 0], [2, 2, 2])
        mesh = load_obj(str(cube_dir / "cube.obj"), scene, trs=trs)
        assert abs(mesh.positions[:, 0].max() - 12.0) < 1e-5
        assert abs(mesh.positions[:, 0].min() - 8.0) < 1e-5
        # normals stay unit length under uniform scale
        np.testing.assert_allclose(np.linalg.norm(mesh.normals, axis=-1), 1.0,
                                   rtol=1e-5)

    def test_negative_indices(self, tmp_path):
        obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
        (tmp_path / "t.obj").write_text(obj)
        scene = HostScene()
        mesh = load_obj(str(tmp_path / "t.obj"), scene)
        assert mesh.num_triangles == 1


class TestMtlHeuristics:
    def test_emissive(self):
        m = mtl_to_pbr(MTLMaterial("l", ke=(5.0, 4.0, 3.0)))
        assert m.emittance == 5.0
        np.testing.assert_allclose(m.basecolor, (1.0, 0.8, 0.6))

    def test_refractive_by_illum(self):
        m = mtl_to_pbr(MTLMaterial("g", illum=7, ni=1.5))
        assert m.mtype == MaterialType.SPECULAR_REFRACTION

    def test_refractive_by_dissolve(self):
        m = mtl_to_pbr(MTLMaterial("g", ni=1.4, d=0.3))
        assert m.mtype == MaterialType.SPECULAR_REFRACTION

    def test_shiny_is_pbr(self):
        m = mtl_to_pbr(MTLMaterial("s", ks=(0.8, 0.8, 0.8), ns=300))
        assert m.mtype == MaterialType.MICROFACET_PBR
        assert m.roughness < 0.6
        assert m.metallic > 0.5

    def test_flat_is_diffuse(self):
        m = mtl_to_pbr(MTLMaterial("d", kd=(0.5, 0.5, 0.5)))
        assert m.mtype == MaterialType.DIFFUSE

    def test_mirror(self):
        m = mtl_to_pbr(MTLMaterial("m", ks=(1, 1, 1), ns=10000, ni=1.0))
        assert m.mtype == MaterialType.SPECULAR_REFLECTION


class TestJsonScene:
    def test_full_scene(self, cube_dir):
        doc = {
            "Camera": {
                "RES": [320, 240], "FOVY": 45.0, "ITERATIONS": 10,
                "DEPTH": 6, "FILE": "out",
                "EYE": [0, 1, -5], "LOOKAT": [0, 0, 0], "UP": [0, 1, 0],
            },
            "Materials": {
                "gold": {"basecolor": [1.0, 0.8, 0.3], "metallic": 1.0,
                         "roughness": 0.2, "Type": "MicrofacetPBR"},
            },
            "Objects": [
                {"TRANS": [0, 0, 0], "ROTAT": [0, 45, 0], "SCALE": [1, 1, 1],
                 "FILE": "cube.obj", "MATERIAL": "gold"},
            ],
        }
        path = cube_dir / "scene.json"
        path.write_text(json.dumps(doc))
        assert peek_resolution(str(path)) == (320, 240)
        scene = load_scene(str(path))
        assert scene.camera.resolution == (320, 240)
        assert scene.iterations == 10
        assert scene.trace_depth == 6
        assert scene.mesh.num_triangles == 12
        gold = scene.material_id("gold")
        assert set(scene.mesh.material_ids.tolist()) == {gold}
        data = scene.build(with_bvh=True)
        assert data.bvh is not None

    def test_missing_object_raises(self, tmp_path):
        doc = {
            "Camera": {"RES": [64, 64], "FOVY": 45, "ITERATIONS": 1,
                       "DEPTH": 2, "FILE": "x", "EYE": [0, 0, -1],
                       "LOOKAT": [0, 0, 0], "UP": [0, 1, 0]},
            "Objects": [{"FILE": "nope.obj"}],
        }
        p = tmp_path / "s.json"
        p.write_text(json.dumps(doc))
        with pytest.raises(FileNotFoundError):
            load_scene(str(p))


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
