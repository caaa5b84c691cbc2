"""Texture atlas: host packing of LDR images into one RGBA sheet, plus
lane-parallel bilinear wrap sampling.

Replaces the reference's bindless cudaTextureObject handles
(/root/reference/src/scene.h:94-145, scene.cpp:130-181) with one padded
atlas and gathers — TPU has no HW samplers, and a single atlas means one
gather source for every lane regardless of which texture it needs (no
per-lane table indirection beyond the placement arrays).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from .structs import TextureAtlas


@dataclass
class AtlasBuilder:
    """Host-side accumulation of textures; shelf-packing into one sheet."""

    images: List[np.ndarray] = field(default_factory=list)  # each [h, w, 4] f32
    paths: dict = field(default_factory=dict)  # path -> tex id (dedup cache)

    def add(self, img: np.ndarray, path: Optional[str] = None) -> int:
        """Register an RGBA float image (values 0..1); returns texture id."""
        if path is not None and path in self.paths:
            return self.paths[path]
        if img.ndim == 2:
            img = np.repeat(img[..., None], 4, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        tex_id = len(self.images)
        self.images.append(np.ascontiguousarray(img, np.float32))
        if path is not None:
            self.paths[path] = tex_id
        return tex_id

    def build(self) -> TextureAtlas:
        if not self.images:
            return TextureAtlas.empty()
        # simple shelf packer: sort by height desc, fill rows of fixed sheet width
        order = sorted(range(len(self.images)), key=lambda i: -self.images[i].shape[0])
        sheet_w = max(128, max(int(im.shape[1]) for im in self.images))
        sheet_w = int(np.ceil(sheet_w / 128) * 128)
        x = y = shelf_h = 0
        place = [None] * len(self.images)
        for i in order:
            h, w = self.images[i].shape[:2]
            if x + w > sheet_w:
                y += shelf_h
                x = 0
                shelf_h = 0
            place[i] = (x, y)
            x += w
            shelf_h = max(shelf_h, h)
        sheet_h = y + shelf_h
        sheet_h = int(np.ceil(max(sheet_h, 8) / 8) * 8)

        sheet = np.zeros((sheet_h, sheet_w, 4), np.float32)
        x0s, y0s, ws, hs = [], [], [], []
        for i, im in enumerate(self.images):
            px, py = place[i]
            h, w = im.shape[:2]
            sheet[py:py + h, px:px + w] = im
            x0s.append(px)
            y0s.append(py)
            ws.append(w)
            hs.append(h)
        return TextureAtlas(
            r=jnp.asarray(sheet[..., 0]),
            g=jnp.asarray(sheet[..., 1]),
            b=jnp.asarray(sheet[..., 2]),
            a=jnp.asarray(sheet[..., 3]),
            x0=jnp.asarray(np.array(x0s, np.int32)),
            y0=jnp.asarray(np.array(y0s, np.int32)),
            width=jnp.asarray(np.array(ws, np.int32)),
            height=jnp.asarray(np.array(hs, np.int32)),
        )


def _gather2d(plane: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather plane[iy, ix] lane-parallel via flat take (single gather)."""
    w = plane.shape[1]
    return jnp.take(plane.reshape(-1), iy * w + ix, mode="clip")


def sample_atlas(atlas: TextureAtlas, tex_id: jnp.ndarray, u: jnp.ndarray,
                 v: jnp.ndarray) -> Tuple[Vec3, jnp.ndarray]:
    """Bilinear, wrap-mode texture fetch per lane.

    `tex_id < 0` lanes return (1,1,1,1) — callers multiply, so "no texture"
    is the identity, same net effect as the reference's branch.
    Matches cudaTextureObject setup: normalized coords, wrap address mode,
    linear filter (scene.h:118-126).
    """
    valid = tex_id >= 0
    tid = jnp.clip(tex_id, 0, atlas.num_textures - 1)
    tw = jnp.take(atlas.width, tid, mode="clip").astype(jnp.float32)
    th = jnp.take(atlas.height, tid, mode="clip").astype(jnp.float32)
    tx0 = jnp.take(atlas.x0, tid, mode="clip")
    ty0 = jnp.take(atlas.y0, tid, mode="clip")

    # wrap to [0,1)
    uw = u - jnp.floor(u)
    vw = v - jnp.floor(v)

    # texel space, CUDA linear-filter convention: sample at coord*size - 0.5
    fx = uw * tw - 0.5
    fy = vw * th - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = fx - x0
    ay = fy - y0

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    xi0 = wrap(x0, tw)
    xi1 = wrap(x0 + 1, tw)
    yi0 = wrap(y0, th)
    yi1 = wrap(y0 + 1, th)

    gx0 = tx0 + xi0
    gx1 = tx0 + xi1
    gy0 = ty0 + yi0
    gy1 = ty0 + yi1

    w00 = (1 - ax) * (1 - ay)
    w10 = ax * (1 - ay)
    w01 = (1 - ax) * ay
    w11 = ax * ay

    def bilinear(plane):
        return (
            _gather2d(plane, gy0, gx0) * w00
            + _gather2d(plane, gy0, gx1) * w10
            + _gather2d(plane, gy1, gx0) * w01
            + _gather2d(plane, gy1, gx1) * w11
        )

    r = bilinear(atlas.r)
    g = bilinear(atlas.g)
    b = bilinear(atlas.b)
    a = bilinear(atlas.a)
    one = jnp.ones_like(r)
    rgb = Vec3(jnp.where(valid, r, one), jnp.where(valid, g, one), jnp.where(valid, b, one))
    return rgb, jnp.where(valid, a, one)
