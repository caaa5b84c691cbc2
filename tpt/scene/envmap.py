"""HDR environment map: load, PDF map + Vose alias table build (host), and
lane-parallel equirect radiance / pdf evaluation + O(1) alias-method
direction sampling (device).

Parity with buildEnvMapAliasTable (/root/reference/src/scene.cpp:183-300):
flux weights are luminance * sin(theta), the precomputed pdf map stores
solid-angle pdfs with factor N / (totalEnergy * 2 * pi^2), and directions
use the Y-up lat-long mapping (logic.cu:76-103). Unlike the reference —
whose device-side alias sampler is dead code — `sample_env` here is live
and drives optional environment NEE.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core.mathutil import INV_PI, INV_TWO_PI, PI, TWO_PI
from ..core.vec import Vec3
from .structs import EnvMap


def read_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr (RGBE) file -> float32 [H, W, 3].

    Pure-numpy RLE decoder (capability of stb_image's HDR path used by the
    reference loader); falls back to imageio for other formats."""
    if not path.lower().endswith(".hdr"):
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(path), np.float32)
        return img[..., :3]

    with open(path, "rb") as f:
        data = f.read()

    # header
    pos = data.index(b"\n\n") + 2 if b"\n\n" in data else 0
    if pos == 0:
        # some writers use \n \n with headers; scan line by line
        lines_end = 0
        while True:
            nl = data.index(b"\n", lines_end)
            if nl == lines_end:
                pos = nl + 1
                break
            lines_end = nl + 1
    res_end = data.index(b"\n", pos)
    res_line = data[pos:res_end].decode("ascii").split()
    # expect: -Y H +X W
    h = int(res_line[1])
    w = int(res_line[3])
    payload = data[res_end + 1:]

    # native RLE decoder when available (scene/native.py)
    try:
        from .native import decode_hdr_rle_native

        native = decode_hdr_rle_native(payload, w, h)
    except Exception:
        native = None
    if native is not None:
        rgbe = native
        exp = rgbe[..., 3].astype(np.int32)
        scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136))
        return (rgbe[..., :3].astype(np.float32) * scale[..., None]
                ).astype(np.float32)

    raw = np.frombuffer(payload, np.uint8)

    rgbe = np.zeros((h, w, 4), np.uint8)
    off = 0
    for y in range(h):
        if off + 4 <= raw.size and raw[off] == 2 and raw[off + 1] == 2 and \
                (int(raw[off + 2]) << 8 | int(raw[off + 3])) == w:
            # adaptive RLE scanline
            off += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = int(raw[off]); off += 1
                    if count > 128:
                        count -= 128
                        rgbe[y, x:x + count, c] = raw[off]
                        off += 1
                    else:
                        rgbe[y, x:x + count, c] = raw[off:off + count]
                        off += count
                    x += count
        else:
            # flat scanline
            row = raw[off:off + w * 4].reshape(w, 4)
            rgbe[y] = row
            off += w * 4

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136))  # 2^(e-128-8)
    rgb = rgbe[..., :3].astype(np.float32) * scale[..., None]
    return rgb.astype(np.float32)


def build_vose_alias(weights: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vose's O(N) alias-table construction. Returns (alias, prob)."""
    n = weights.size
    total = weights.sum()
    if total <= 0:
        return np.zeros(n, np.int32), np.ones(n, np.float32)
    p = weights.astype(np.float64) * (n / total)
    alias = np.zeros(n, np.int64)
    prob = np.ones(n, np.float64)
    small = list(np.nonzero(p < 1.0)[0][::-1])
    large = list(np.nonzero(p >= 1.0)[0][::-1])
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    for l in large:
        prob[l] = 1.0
    for s in small:
        prob[s] = 1.0
    return alias.astype(np.int32), prob.astype(np.float32)


def build_envmap(rgb: np.ndarray) -> EnvMap:
    """Build the full EnvMap pytree from an equirect float image."""
    h, w = rgb.shape[:2]
    lum = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    theta = (np.arange(h, dtype=np.float64) + 0.5) / h * math.pi
    sin_theta = np.sin(theta)
    flux = lum.astype(np.float64) * sin_theta[:, None]
    total = flux.sum()
    n = h * w
    # solid-angle pdf per texel direction: pdf(w) = flux / (total * texel_solid_angle)
    # texel_solid_angle = (2 pi / w)(pi / h) sin(theta) -> pdf map factor
    # N / (total * 2 * pi^2) * lum  (matches the reference's precomputed map)
    pdf = (lum.astype(np.float64) * n / max(total, 1e-20) / (2.0 * math.pi ** 2))
    alias, prob = build_vose_alias(flux.ravel())
    return EnvMap(
        r=jnp.asarray(rgb[..., 0]),
        g=jnp.asarray(rgb[..., 1]),
        b=jnp.asarray(rgb[..., 2]),
        pdf=jnp.asarray(pdf.astype(np.float32)),
        alias=jnp.asarray(alias),
        prob=jnp.asarray(prob),
        enabled=True,
    )


def load_envmap(path: str) -> EnvMap:
    return build_envmap(read_hdr(path))


# ---------------------------------------------------------------------------
# Device-side evaluation
# ---------------------------------------------------------------------------

def _dir_to_uv(d: Vec3):
    phi = jnp.arctan2(d.z, d.x)
    phi = jnp.where(phi < 0, phi + TWO_PI, phi)
    theta = jnp.arccos(jnp.clip(d.y, -1.0, 1.0))
    return phi * INV_TWO_PI, theta * INV_PI


def _bilinear(plane: jnp.ndarray, u, v):
    h, w = plane.shape
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = fx - x0
    ay = fy - y0
    xi0 = jnp.mod(x0.astype(jnp.int32), w)
    xi1 = jnp.mod(x0.astype(jnp.int32) + 1, w)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    yi1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    flat = plane.reshape(-1)

    def g(yi, xi):
        return jnp.take(flat, yi * w + xi, mode="clip")

    return (
        g(yi0, xi0) * (1 - ax) * (1 - ay)
        + g(yi0, xi1) * ax * (1 - ay)
        + g(yi1, xi0) * (1 - ax) * ay
        + g(yi1, xi1) * ax * ay
    )


def env_radiance(env: EnvMap, d: Vec3) -> Vec3:
    """Equirect lookup of the environment radiance along direction `d`."""
    u, v = _dir_to_uv(d)
    return Vec3(_bilinear(env.r, u, v), _bilinear(env.g, u, v), _bilinear(env.b, u, v))


def env_pdf(env: EnvMap, d: Vec3) -> jnp.ndarray:
    u, v = _dir_to_uv(d)
    return _bilinear(env.pdf, u, v)


def sample_env(env: EnvMap, u1: jnp.ndarray, u2: jnp.ndarray):
    """O(1) alias-method direction sample per lane.

    Returns (dir: Vec3, radiance: Vec3, pdf). Uses u1 for the (slot, coin)
    pair like the reference's dead-code sampler (interactions.cu:447-488)."""
    h, w = env.shape
    n = h * w
    scaled = u1 * n
    slot = jnp.clip(scaled.astype(jnp.int32), 0, n - 1)
    xi = scaled - slot.astype(jnp.float32)
    prob = jnp.take(env.prob, slot, mode="clip")
    alias = jnp.take(env.alias, slot, mode="clip")
    texel = jnp.where(xi < prob, slot, alias)

    py = texel // w
    px = texel % w
    u = (px.astype(jnp.float32) + 0.5) / w
    v = (py.astype(jnp.float32) + 0.5) / h
    phi = u * TWO_PI
    theta = v * PI
    sin_t = jnp.sin(theta)
    d = Vec3(sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi))
    pdf = _bilinear(env.pdf, u, v)
    rad = Vec3(_bilinear(env.r, u, v), _bilinear(env.g, u, v), _bilinear(env.b, u, v))
    return d, rad, pdf
