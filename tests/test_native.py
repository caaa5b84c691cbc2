import os

import numpy as np
import pytest

from tpt.scene import native
from tpt.scene.host import HostScene
from tpt.scene.obj import load_obj

HAVE_NATIVE = native.available()

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native library unavailable")

CUBE_OBJ = """\
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
"""

CUBE_MTL = """\
newmtl red
Kd 0.8 0.1 0.1
newmtl shiny
Kd 0.7 0.7 0.7
Ks 0.9 0.9 0.9
Ns 500
"""


@pytest.fixture
def cube_dir(tmp_path):
    (tmp_path / "cube.obj").write_text(CUBE_OBJ)
    (tmp_path / "cube.mtl").write_text(CUBE_MTL)
    return tmp_path


class TestNativeParser:
    def test_matches_python_parser(self, cube_dir):
        s_n = HostScene()
        m_n = load_obj(str(cube_dir / "cube.obj"), s_n, use_native=True)
        s_p = HostScene()
        m_p = load_obj(str(cube_dir / "cube.obj"), s_p, use_native=False)
        assert m_n.num_triangles == m_p.num_triangles == 12
        assert len(s_n.materials) == len(s_p.materials) == 2
        # same triangle soup (dedup strategies differ, geometry must not)
        soup_n = np.sort(m_n.positions[m_n.indices].reshape(-1, 9), axis=0)
        soup_p = np.sort(m_p.positions[m_p.indices].reshape(-1, 9), axis=0)
        np.testing.assert_allclose(soup_n, soup_p)

    def test_raw_api(self, cube_dir):
        parsed = native.parse_obj_native(str(cube_dir / "cube.obj"))
        pos, nrm, uv, idx, mat, names, mtls = parsed
        assert idx.shape == (12, 3)
        assert set(names) == {"red", "shiny"}
        assert mtls == ["cube.mtl"]
        assert pos.shape[0] == 8  # cube corners dedup to 8 verts (no vn/vt)

    def test_negative_indices(self, tmp_path):
        (tmp_path / "t.obj").write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        parsed = native.parse_obj_native(str(tmp_path / "t.obj"))
        assert parsed[3].shape == (1, 3)

    def test_missing_file(self, tmp_path):
        with pytest.raises(IOError):
            native.parse_obj_native(str(tmp_path / "nope.obj"))

    def test_hdr_rle_decode(self, tmp_path):
        from tpt.io.image import save_hdr
        from tpt.scene.envmap import read_hdr

        img = (np.random.default_rng(0).random((16, 32, 3)) * 4).astype(np.float32)
        save_hdr(str(tmp_path / "t.hdr"), img)
        back = read_hdr(str(tmp_path / "t.hdr"))
        assert back.shape == (16, 32, 3)
        assert np.abs(back - img).max() / img.max() < 0.01


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
