"""Renderer façade: the reference's 4-function engine contract
(PathtraceInit / Pathtrace / PathtraceFree / InitDataContainer,
/root/reference/src/main.cpp:18-70) as an explicit-state TPU engine.

Init == build jitted functions + zero state pytrees; a frame == one jit
call; free == drop references. Adds the reference GUI's per-frame
analytics (traced depth, MRays/s, frame ms) and display-channel selection
(result/normal/depth/albedo/motion — common/utilities.h:21-27).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import DisplayMode, RenderConfig, RenderMode
from .core.camera import Camera, camera_arrays
from .core.vec import Vec3
from .denoise.svgf import SVGFState, run_svgf
from .integrators import megakernel, wavefront
from .scene.structs import SceneData


@dataclass
class GuiData:
    """Analytics mirror of the reference GuiDataContainer."""

    traced_depth: int = 0
    mrays_per_sec: float = 0.0
    frame_ms: float = 0.0
    denoiser_on: bool = False
    display_mode: DisplayMode = DisplayMode.RESULT


class Renderer:
    """Stateful wrapper (host side): owns accumulators + SVGF history.

    frame(iteration) -> float32 [H, W, 3] image for display/save.
    """

    def __init__(self, scene: SceneData, cam: Camera, cfg: RenderConfig):
        self.scene = scene
        self.cam = cam
        self.cfg = cfg
        self.gui = GuiData(denoiser_on=cfg.denoiser_on, display_mode=cfg.display)
        w, h = cam.resolution
        self._shape = (h, w)
        # opt-in frame pipelining (viewers enable it on the nav preview):
        # frame() dispatches frame N but returns frame N-1, so the device
        # renders while the host displays — hides one relay round-trip per
        # frame at the cost of one frame of display latency
        self.pipeline = False
        # opt-in device-side tonemap: frame() returns display-ready uint8
        # (clip + 1/gamma + quantize run ON DEVICE), fetching 1/4 the
        # bytes over the relay and skipping the host-side pow() on this
        # 1-core host. io.image.tonemap passes u8 through, so viewers
        # need no changes beyond setting the flag (the nav preview does).
        self.display_u8 = False
        _tm = lambda x: (jnp.clip(jnp.nan_to_num(x), 0.0, 1.0)
                         ** (1.0 / cfg.gamma) * 255.0 + 0.5
                         ).astype(jnp.uint8)
        self._u8_fn = jax.jit(_tm)
        # megakernel display math fused into ONE program per flavor:
        # eager `(acc * inv).stacked()` + the u8 pass is 4-5 separate
        # tiny dispatches, each paying the relay's submit latency — on
        # the nav hot path that chatter rivals the render itself
        # (queue 22 preview probe)
        self._disp_mega_f32 = jax.jit(lambda acc, inv: (acc * inv).stacked())
        self._disp_mega_u8 = jax.jit(
            lambda acc, inv: _tm((acc * inv).stacked()))
        self.reset()

        self._camv = camera_arrays(cam)
        if cfg.mode == RenderMode.MEGAKERNEL:
            self._mega_step = megakernel.make_sample_fn(scene, cam, cfg)
            self._frame_fn = None
        else:
            self._frame_fn, self._vp = wavefront.make_frame_fn(scene, cam, cfg)
            self._prev_vp = self._vp
            self._svgf_fn = jax.jit(
                lambda st, out: self._svgf_impl(st, out))

    # -- state ---------------------------------------------------------------
    def reset(self):
        """Camera moved / first frame: clear accumulation (the reference
        re-inits the whole tracer — main.cpp:310-321; here it is just
        zeroing pytrees). Allocation is LAZY: move_camera calls reset()
        on EVERY nav move, and the viewers move BOTH engines per frame —
        eager device zeros cost a relay dispatch per plane for a full-res
        engine that will not render until the camera rests (queue 22
        preview probe: the nav frame's non-compute share is host
        dispatch chatter)."""
        self.iteration = 0
        self._state_alloc = False
        # a pending pipelined frame predates the reset (and possibly the
        # resolution) — drop it
        self._pending = None

    def _ensure_state(self):
        if getattr(self, "_state_alloc", False):
            return
        n = self.cam.num_pixels
        h, w = self._shape
        self.acc_direct = Vec3.zeros((n,))
        self.acc_indirect = Vec3.zeros((n,))
        self.acc_mega = Vec3.zeros((n,))
        self.svgf_state = SVGFState.zeros(h, w)
        self._state_alloc = True

    def move_camera(self, cam: Camera):
        """Re-target the camera: a ZERO-RECOMPILE state update when the
        resolution is unchanged (the camera rides the jitted programs as a
        runtime CamArrays argument — core/camera.py). The previous
        view-projection is kept so SVGF motion vectors bridge the move.
        Resolution changes alter array shapes and rebuild the programs
        (the reference re-inits the tracer on every move, main.cpp:310-321
        — free on CUDA, minutes of XLA recompile if done here)."""
        same_res = cam.resolution == self.cam.resolution
        self.cam = cam
        self._camv = camera_arrays(cam)
        if self.cfg.mode == RenderMode.MEGAKERNEL:
            if not same_res:
                self._mega_step = megakernel.make_sample_fn(
                    self.scene, cam, self.cfg)
        else:
            prev = getattr(self, "_vp", None)
            if not same_res:
                self._frame_fn, _ = wavefront.make_frame_fn(
                    self.scene, cam, self.cfg)
            self._vp = self._camv.view_proj
            self._prev_vp = prev if prev is not None else self._vp
        if not same_res:
            w, h = cam.resolution
            self._shape = (h, w)
        # a pipelined in-flight frame survives same-res camera moves (the
        # nav hot path retargets EVERY frame — dropping it there would
        # disable pipelining exactly where it matters); displaying one
        # pre-move frame is the pipeline's normal 1-frame latency
        pending = self._pending if same_res else None
        self.reset()
        self._pending = pending

    # -- svgf glue -------------------------------------------------------------
    def _svgf_impl(self, st: SVGFState, out):
        h, w = self._shape
        plane = lambda a: a.reshape(h, w)
        p3 = lambda v: Vec3(plane(v.x), plane(v.y), plane(v.z))
        rgb, new_state = run_svgf(
            self.cfg.svgf, st,
            p3(out.direct), p3(out.indirect),
            p3(out.gbuf.albedo), plane(out.gbuf.depth), p3(out.gbuf.normal),
            plane(out.gbuf.mat_id), plane(out.gbuf.motion_u),
            plane(out.gbuf.motion_v))
        return rgb, new_state

    # -- frame -----------------------------------------------------------------
    def frame(self) -> np.ndarray:
        # the wavefront frame fn consumes spp_batch consecutive iteration
        # numbers per call (one per sample in the pool); iteration counts
        # SAMPLES so seeds never overlap across frames and the
        # accumulator normalization below stays exact
        step = (1 if self.cfg.mode == RenderMode.MEGAKERNEL
                else max(1, self.cfg.spp_batch))
        self._ensure_state()
        it = jnp.uint32(self.iteration + 1)
        self.iteration += step
        h, w = self._shape
        t0 = time.perf_counter()

        if self.cfg.mode == RenderMode.MEGAKERNEL:
            self.acc_mega = self._mega_step(it, self.acc_mega,
                                            camv=self._camv)
            inv = 1.0 / self.iteration
            img_dev = (self._disp_mega_u8(self.acc_mega, inv)
                       if self.display_u8
                       else self._disp_mega_f32(self.acc_mega, inv))
            rays = self.cam.num_pixels * self.cfg.trace_depth
        else:
            if self.gui.denoiser_on:
                # real-time mode: 1 spp per frame, no accumulation
                self.acc_direct = Vec3.zeros((self.cam.num_pixels,))
                self.acc_indirect = Vec3.zeros((self.cam.num_pixels,))
            out, self.acc_direct, self.acc_indirect = self._frame_fn(
                it, self._prev_vp, self.acc_direct, self.acc_indirect,
                camv=self._camv)
            self._prev_vp = self._vp
            rays = out.rays_traced  # device scalar; fetched with the image

            if self.gui.denoiser_on:
                rgb, self.svgf_state = self._svgf_fn(self.svgf_state, out)
                img_dev = rgb.stacked()
            else:
                img_dev = self._display_device(out)

        if (self.display_u8 and img_dev is not None
                and not isinstance(img_dev, np.ndarray)
                and img_dev.dtype != jnp.uint8):
            img_dev = self._u8_fn(img_dev)

        if self.pipeline and img_dev is not None:
            # swap: return the previous dispatch's frame; this one stays
            # in flight on the device until the next call fetches it
            # (u8 conversion above happens pre-swap, so the pending slot
            # holds the small display buffer, not the f32 plane)
            prev = self._pending
            self._pending = (img_dev, rays, (h, w))
            if prev is not None:
                img_dev, rays, (h, w) = prev
        img = (img_dev if isinstance(img_dev, np.ndarray)
               else jax.device_get(img_dev))

        dt = time.perf_counter() - t0
        self.gui.frame_ms = dt * 1000.0
        self.gui.mrays_per_sec = int(rays) / dt / 1e6
        self.gui.traced_depth = self.cfg.trace_depth
        return np.asarray(img).reshape(h, w, 3)

    def bvh_heatmap(self) -> np.ndarray:
        """Traversal-cost temperature map for primary rays (the reference's
        ShowBVH debug view — bvh.cu:518-641 + pathtrace_wavefront.cu:244-267).
        Requires a BVH-built scene."""
        from .bvh.traverse import traversal_cost
        from .core.camera import generate_camera_rays

        if self.scene.bvh is None:
            raise ValueError("bvh_heatmap requires a scene built with_bvh=True")
        h, w = self._shape
        ori, d, _ = generate_camera_rays(self.cam, jnp.uint32(1), jitter=False)
        cost = np.asarray(
            jax.device_get(traversal_cost(self.scene.mesh, self.scene.bvh,
                                          ori, d))).reshape(h, w)
        t = np.clip(cost / max(1.0, float(np.percentile(cost, 98))), 0.0, 1.0)
        # blue -> green -> red temperature ramp
        r = np.clip(2.0 * t - 1.0, 0, 1)
        g = 1.0 - np.abs(2.0 * t - 1.0)
        b = np.clip(1.0 - 2.0 * t, 0, 1)
        return np.stack([r, g, b], axis=-1).astype(np.float32)

    def save_checkpoint(self, path: str):
        """Snapshot render state (accumulators, SVGF history, iteration) —
        the pytree-state design makes resume trivial (SURVEY.md §5)."""
        self._ensure_state()
        flat = {}
        for name, tree in (("acc_direct", self.acc_direct),
                           ("acc_indirect", self.acc_indirect),
                           ("acc_mega", self.acc_mega),
                           ("svgf", self.svgf_state)):
            leaves, _ = jax.tree_util.tree_flatten(tree)
            for i, leaf in enumerate(leaves):
                flat[f"{name}_{i}"] = np.asarray(jax.device_get(leaf))
        flat["iteration"] = np.int64(self.iteration)
        np.savez_compressed(path, **flat)

    def load_checkpoint(self, path: str):
        self._ensure_state()
        data = np.load(path)
        self.iteration = int(data["iteration"])

        def restore(name, template):
            leaves, treedef = jax.tree_util.tree_flatten(template)
            new = [jnp.asarray(data[f"{name}_{i}"]) for i in range(len(leaves))]
            return jax.tree_util.tree_unflatten(treedef, new)

        self.acc_direct = restore("acc_direct", self.acc_direct)
        self.acc_indirect = restore("acc_indirect", self.acc_indirect)
        self.acc_mega = restore("acc_mega", self.acc_mega)
        self.svgf_state = restore("svgf", self.svgf_state)

    def _display_device(self, out):
        """Display-channel selection (pathtrace_wavefront.cu:82-109).
        Returns the selected channel as a DEVICE array (frame() fetches —
        possibly one frame later, when pipelining); the BVH heatmap debug
        view is host-computed and comes back as numpy."""
        h, w = self._shape
        mode = self.gui.display_mode
        if mode == DisplayMode.BVH_HEATMAP:
            return self.bvh_heatmap()
        if mode == DisplayMode.NORMAL:
            img = (out.gbuf.normal * 0.5 + 0.5).stacked()
        elif mode == DisplayMode.DEPTH:
            d = jnp.clip(out.gbuf.depth / 1000.0, 0.0, 1.0)
            img = jnp.stack([d, d, d], axis=-1)
        elif mode == DisplayMode.ALBEDO:
            img = out.gbuf.albedo.stacked()
        elif mode == DisplayMode.MOTION_VECTOR:
            mu = jnp.abs(out.gbuf.motion_u) / 8.0
            mv = jnp.abs(out.gbuf.motion_v) / 8.0
            img = jnp.stack([mu, mv, jnp.zeros_like(mu)], axis=-1)
        else:
            acc = (self.acc_direct + self.acc_indirect) * (1.0 / self.iteration)
            img = acc.stacked()
        return img
