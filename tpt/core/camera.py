"""Pinhole camera with the reference's derived-vector conventions
(/root/reference/src/scene.cpp:541-577) and jittered primary-ray generation
(/root/reference/src/kernels/ray_gen.cu:15-79) as one lane-parallel pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rng
from .vec import Vec3


@dataclass(frozen=True)
class Camera:
    """Host-side camera description (static; baked into the jitted frame fn)."""

    resolution: Tuple[int, int]  # (width, height)
    position: Tuple[float, float, float]
    look_at: Tuple[float, float, float]
    up: Tuple[float, float, float]
    fovy_deg: float

    # derived (filled by `build`)
    view: Tuple[float, float, float] = (0.0, 0.0, -1.0)
    right: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    true_up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    pixel_length: Tuple[float, float] = (0.0, 0.0)
    fovx_deg: float = 0.0

    @staticmethod
    def build(resolution, position, look_at, up, fovy_deg) -> "Camera":
        w, h = int(resolution[0]), int(resolution[1])
        pos = np.asarray(position, np.float64)
        tgt = np.asarray(look_at, np.float64)
        upv = np.asarray(up, np.float64)

        yscaled = math.tan(math.radians(fovy_deg * 0.5))
        xscaled = yscaled * w / h
        fovx = math.degrees(math.atan(xscaled)) * 2.0

        view = tgt - pos
        view /= np.linalg.norm(view)
        right = np.cross(view, upv)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, view)
        true_up /= np.linalg.norm(true_up)

        return Camera(
            resolution=(w, h),
            position=tuple(float(v) for v in pos),
            look_at=tuple(float(v) for v in tgt),
            up=tuple(float(v) for v in upv),
            fovy_deg=float(fovy_deg),
            view=tuple(float(v) for v in view),
            right=tuple(float(v) for v in right),
            true_up=tuple(float(v) for v in true_up),
            pixel_length=(2.0 * xscaled / w, 2.0 * yscaled / h),
            fovx_deg=float(fovx),
        )

    @property
    def num_pixels(self) -> int:
        return self.resolution[0] * self.resolution[1]

    def moved(self, position=None, look_at=None) -> "Camera":
        return Camera.build(
            self.resolution,
            position if position is not None else self.position,
            look_at if look_at is not None else self.look_at,
            self.up,
            self.fovy_deg,
        )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CamArrays:
    """Runtime camera values: every per-move quantity the jitted frame fn
    needs, as a pytree of small arrays. Passing these as ARGUMENTS (instead
    of baking them into the trace as constants) makes a camera move a
    zero-recompile state update — the reference re-inits the whole tracer
    on a move (/root/reference/src/main.cpp:310-321), which is free on CUDA
    but would be a multi-minute XLA recompile per move on TPU. Resolution
    stays static (it sets array shapes)."""

    position: jnp.ndarray      # [3] f32
    view: jnp.ndarray          # [3]
    right: jnp.ndarray         # [3]
    true_up: jnp.ndarray       # [3]
    pixel_length: jnp.ndarray  # [2]
    view_proj: jnp.ndarray     # [4, 4] (motion vectors / SVGF reprojection)


def camera_arrays(cam: Camera) -> CamArrays:
    from .mathutil import perspective_look_at

    w, h = cam.resolution
    vp = jnp.asarray(
        perspective_look_at(cam.position, cam.look_at, cam.up, cam.fovy_deg,
                            w / h), jnp.float32)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return CamArrays(position=f32(cam.position), view=f32(cam.view),
                     right=f32(cam.right), true_up=f32(cam.true_up),
                     pixel_length=f32(cam.pixel_length), view_proj=vp)


def generate_camera_rays(cam: Camera, iteration: jnp.ndarray,
                         jitter: bool = True, pix=None,
                         camv: "CamArrays | None" = None):
    """Primary rays for every pixel (or for the given pixel-index array —
    used by the megakernel's tiled dispatch).

    Returns (origin: Vec3[N], direction: Vec3[N], rng_state: uint32[N]) with
    N = W*H, pixel index = y*W + x. The jitter is derived by re-hashing the
    path seed (two extra wang_hash rounds) so the RNG stream used for shading
    stays aligned with the reference's.
    """
    w, h = cam.resolution
    n = w * h
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.uint32)
    else:
        pix = pix.astype(jnp.uint32)
        n = pix.shape[0]
    x = (pix % jnp.uint32(w)).astype(jnp.float32)
    y = (pix // jnp.uint32(w)).astype(jnp.float32)

    seed = rng.path_seed(pix, iteration)
    if jitter:
        s1 = rng.wang_hash(seed)
        s2 = rng.wang_hash(s1)
        jx = rng.hash_to_unit_float(s1) - 0.5
        jy = rng.hash_to_unit_float(s2) - 0.5
    else:
        jx = jnp.zeros_like(x)
        jy = jnp.zeros_like(y)

    src = cam if camv is None else camv
    view = Vec3.splat(src.view)
    right = Vec3.splat(src.right)
    up = Vec3.splat(src.true_up)
    plx, ply = src.pixel_length[0], src.pixel_length[1]

    d = (
        view
        + right * (plx * (x + jx - 0.5 * w))
        - up * (ply * (y + jy - 0.5 * h))
    ).normalize()

    origin = Vec3.splat(src.position, shape=(n,))
    return origin, d, seed
