"""Image output: PNG with gamma correction, HDR floats — parity with the
reference's saveImage pipeline (/root/reference/src/main.cpp:239-269 and
src/image.cpp): divide-by-samples happens upstream; here we clamp, apply
1/gamma, and write 8-bit PNG (PIL) or float .hdr/.npy.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional

import numpy as np


def tonemap(img: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """Linear radiance [H,W,3] float -> uint8 sRGB-ish with pow(1/gamma).
    uint8 input passes through: it is already display-ready (the device-
    side tonemap path — engine.Renderer.display_u8 — fetches gamma'd u8
    over the relay at 1/4 the f32 bytes)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    img = np.clip(np.nan_to_num(img.astype(np.float32)), 0.0, 1.0)
    img = np.power(img, 1.0 / gamma)
    return (img * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray, gamma: float = 2.2) -> str:
    from PIL import Image

    Image.fromarray(tonemap(img, gamma)).save(path)
    return path


def save_hdr(path: str, img: np.ndarray) -> str:
    """Radiance RGBE writer (flat scanlines)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    maxc = img.max(axis=-1)
    exp = np.zeros((h, w), np.int32)
    mant = np.frexp(np.maximum(maxc, 1e-32))
    frac, e = mant
    scale = np.where(maxc > 1e-32, frac * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = np.clip(img[..., 0] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 1] = np.clip(img[..., 1] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 2] = np.clip(img[..., 2] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode("ascii"))
        f.write(rgbe.tobytes())
    return path


def timestamped_name(base: str, samples: int, ext: str = "png") -> str:
    """<FILE>.<UTCtime>.<N>samp.png like the reference (main.cpp:263-268)."""
    ts = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d_%H-%M-%Sz")
    return f"{base}.{ts}.{samples}samp.{ext}"
