"""Terminal live viewer (tpt/term_viewer.py): ANSI half-block frame
encoding, escape-sequence key decoding, and a scripted end-to-end
session driving the real render loop headless — the reference's
interactive preview contract (preview.cpp:131-198, main.cpp:347-408)
without a display server."""

import io

import numpy as np
import pytest

from tpt.config import RayCastBackend, RenderConfig
from tpt.engine import Renderer
from tpt.scene import procedural
from tpt.term_viewer import (_KeyReader, _downsample, ansi_frame,
                             run_term_viewer)


@pytest.fixture(scope="module")
def cornell():
    scene = procedural.cornell_box(resolution=(32, 32), spheres=False)
    return scene, scene.build()


def _renderer(cornell, depth=2):
    scene, data = cornell
    cfg = RenderConfig(backend=RayCastBackend.BRUTE_FORCE,
                       trace_depth=depth, denoiser_on=False)
    return Renderer(data, scene.camera, cfg)


class TestAnsiFrame:
    def test_colors_map_to_pixels(self):
        # 2x2 image: red/green on top row, blue/white below ->
        # one text line, fg=top pixel, bg=bottom pixel
        img = np.array([[[1.0, 0, 0], [0, 1.0, 0]],
                        [[0, 0, 1.0], [1.0, 1.0, 1.0]]], np.float32)
        s = ansi_frame(img, cols=2, rows=1, gamma=1.0)
        assert s.count("▀") == 2
        assert "\x1b[38;2;255;0;0m" in s      # fg cell 0 = top-left red
        assert "\x1b[48;2;0;0;255m" in s      # bg cell 0 = bottom-left blue
        assert "\x1b[38;2;0;255;0m" in s      # fg cell 1 = green
        assert "\x1b[48;2;255;255;255m" in s  # bg cell 1 = white
        assert s.endswith("\x1b[0m")

    def test_sgr_runs_are_deduplicated(self):
        img = np.ones((2, 8, 3), np.float32)  # constant white
        s = ansi_frame(img, cols=8, rows=1, gamma=1.0)
        # one fg + one bg code for the whole run, not one per cell
        assert s.count("\x1b[38;2;") == 1
        assert s.count("\x1b[48;2;") == 1
        assert s.count("▀") == 8

    def test_downsample_shapes(self):
        img = np.random.default_rng(0).random((64, 48, 3)).astype(np.float32)
        small = _downsample(img, 16, 12)
        assert small.shape == (16, 12, 3)
        # block mean preserves the global mean
        np.testing.assert_allclose(small.mean(), img.mean(), atol=2e-2)
        # upscale fallback (terminal larger than image)
        big = _downsample(img, 128, 96)
        assert big.shape == (128, 96, 3)


class TestKeyReader:
    def test_plain_and_arrows(self):
        r = _KeyReader()
        assert r.feed(b"wq") == ["w", "q"]
        assert r.feed(b"\x1b[A\x1b[D") == ["up", "left"]

    def test_escape_split_across_reads(self):
        r = _KeyReader()
        assert r.feed(b"\x1b") == []
        assert r.feed(b"[") == []
        assert r.feed(b"C") == ["right"]

    def test_lone_escape_dropped(self):
        r = _KeyReader()
        assert r.feed(b"\x1bzw") == ["z", "w"]


class TestScriptedSession:
    def test_renders_max_frames(self, cornell, tmp_path):
        r = _renderer(cornell)
        out = io.StringIO()
        n = run_term_viewer(r, max_frames=2, out_dir=str(tmp_path),
                            preview_scale=1, in_stream=io.BytesIO(b""),
                            out_stream=out, size=(64, 8))
        assert n == 2
        s = out.getvalue()
        assert s.count("\x1b[H") == 2          # one home per frame
        assert "▀" in s and "MRays/s" in s

    def test_quit_key_stops_immediately(self, cornell, tmp_path):
        r = _renderer(cornell)
        n = run_term_viewer(r, max_frames=5, out_dir=str(tmp_path),
                            preview_scale=1, in_stream=io.BytesIO(b"q"),
                            out_stream=io.StringIO(), size=(16, 8))
        assert n == 0

    def test_move_key_moves_camera_and_uses_preview(self, cornell, tmp_path):
        r = _renderer(cornell)
        pos0 = np.asarray(r.cam.position)
        out = io.StringIO()
        n = run_term_viewer(r, max_frames=2, out_dir=str(tmp_path),
                            preview_scale=2, in_stream=io.BytesIO(b"w"),
                            out_stream=out, size=(64, 8))
        assert n == 2
        assert not np.allclose(np.asarray(r.cam.position), pos0)
        assert "preview" in out.getvalue()     # nav frames from the
        # 1/2-res engine (zero-recompile retarget path)

    def test_look_key_rotates_view(self, cornell, tmp_path):
        r = _renderer(cornell)
        view0 = np.asarray(r.cam.view)
        run_term_viewer(r, max_frames=1, out_dir=str(tmp_path),
                        preview_scale=1, in_stream=io.BytesIO(b"\x1b[C"),
                        out_stream=io.StringIO(), size=(16, 8))
        assert not np.allclose(np.asarray(r.cam.view), view0)

    def test_save_and_channel_keys(self, cornell, tmp_path):
        r = _renderer(cornell)
        run_term_viewer(r, max_frames=1, out_dir=str(tmp_path),
                        preview_scale=1, in_stream=io.BytesIO(b"2s"),
                        out_stream=io.StringIO(), size=(16, 8))
        assert (tmp_path / "viewer_save.png").exists()
        assert int(r.gui.display_mode) == 1
