"""Interactive-ish preview — the TPU-host analogue of the reference's
GLFW/ImGui viewer (/root/reference/src/preview.cpp): progressive rendering
with FPS-style camera controls, display-channel switching, denoiser toggle
and an analytics readout, driving matplotlib when a display exists and
falling back to periodic PNG snapshots headless.

The reference's CUDA<->OpenGL PBO interop (main.cpp:328-334) has no TPU
analogue — frames come back over the host link; the real-time path keeps
that to one device_get of the final uint8-able image per frame.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from .config import DisplayMode
from .engine import Renderer
from .io.image import save_png, tonemap


def run_viewer(renderer: Renderer, max_frames: int = 0,
               out_dir: str = ".", snapshot_every: int = 10,
               interactive: Optional[bool] = None) -> None:
    """Progressive render loop. Keyboard (interactive matplotlib):
    1-5 display channels, d toggles denoiser, s saves, q quits —
    mirroring the reference key bindings (main.cpp:347-408)."""
    if interactive is None:
        interactive = bool(os.environ.get("DISPLAY"))

    if not interactive:
        frame_count = 0
        while max_frames <= 0 or frame_count < max_frames:
            img = renderer.frame()
            frame_count += 1
            if frame_count % snapshot_every == 0:
                save_png(os.path.join(out_dir, "preview.png"), img[:, ::-1])
                g = renderer.gui
                print(f"[viewer] frame {frame_count}  {g.frame_ms:.1f} ms  "
                      f"{g.mrays_per_sec:.2f} MRays/s")
            if max_frames <= 0 and frame_count >= 1000:
                break
        return

    import matplotlib

    matplotlib.use("TkAgg" if os.environ.get("DISPLAY") else "Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    fig.canvas.manager.set_window_title("tpt viewer")
    state = {"quit": False}

    def move_camera(forward=0.0, right=0.0, up=0.0):
        """FPS-style camera translation (reference main.cpp:271-301);
        resets accumulation like the reference's camera edits."""
        import numpy as np_

        cam = renderer.cam
        speed = 0.02 * np_.linalg.norm(
            np_.asarray(cam.look_at) - np_.asarray(cam.position)) + 1.0
        delta = (np_.asarray(cam.view) * forward
                 + np_.asarray(cam.right) * right
                 + np_.asarray(cam.true_up) * up) * speed
        renderer.move_camera(cam.moved(
            position=tuple(np_.asarray(cam.position) + delta),
            look_at=tuple(np_.asarray(cam.look_at) + delta)))

    def on_key(event):
        k = event.key
        if k == "q":
            state["quit"] = True
        elif k == "d":
            renderer.gui.denoiser_on = not renderer.gui.denoiser_on
            renderer.reset()
        elif k == "s":
            save_png(os.path.join(out_dir, "viewer_save.png"),
                     renderer.frame()[:, ::-1])
        elif k in "123456":
            renderer.gui.display_mode = DisplayMode(int(k) - 1)
        elif k == "w":
            move_camera(forward=1.0)
        elif k == "x":
            move_camera(forward=-1.0)
        elif k == "a":
            move_camera(right=-1.0)
        elif k == "e":
            move_camera(right=1.0)
        elif k == "r":
            move_camera(up=1.0)
        elif k == "f":
            move_camera(up=-1.0)
        elif k == " ":
            # camera parameter dump for scene authoring (main.cpp:360-376)
            cam = renderer.cam
            print(f'"EYE": {list(cam.position)},')
            print(f'"LOOKAT": {list(cam.look_at)},')
            print(f'"UP": {list(cam.up)},')

    fig.canvas.mpl_connect("key_press_event", on_key)
    handle = ax.imshow(np.zeros((8, 8, 3), np.uint8))
    ax.axis("off")
    plt.ion()
    plt.show()

    frame_count = 0
    while not state["quit"] and (max_frames <= 0 or frame_count < max_frames):
        img = renderer.frame()
        frame_count += 1
        handle.set_data(tonemap(img[:, ::-1]))
        g = renderer.gui
        ax.set_title(f"iter {frame_count} | {g.frame_ms:.1f} ms | "
                     f"{g.mrays_per_sec:.2f} MRays/s | "
                     f"{'SVGF on' if g.denoiser_on else 'accumulating'}")
        fig.canvas.draw_idle()
        plt.pause(0.001)
