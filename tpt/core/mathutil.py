"""Shared math: constants, transforms, sampling frames, MIS heuristics.

Constants mirror the reference conventions (/root/reference/src/common/
utilities.h:12-19) — EPSILON ray-offset and the PDF_DIRAC_DELTA sentinel are
load-bearing for image parity and for the MIS delta-lobe bypass.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .vec import Vec3

PI = 3.14159265358979323846
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
INV_TWO_PI = 1.0 / TWO_PI
EPSILON = 1e-3  # geometric ray-offset epsilon
PDF_DIRAC_DELTA = 1e10  # sentinel pdf marking delta (perfect-specular) lobes
DELTA_THRESHOLD = 1e9  # pdf above this is treated as a delta lobe


def power_heuristic(f: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (beta=2) with the reference's tie-break epsilon
    (/root/reference/src/common/cuda_utilities.h:193-197)."""
    f2 = f * f
    return f2 / (f2 + g * g + 1e-5)


def build_trs_matrix(translation, rotation_deg, scale) -> np.ndarray:
    """Host-side 4x4 TRS (T * Rx * Ry * Rz * S), row-major numpy; matches the
    reference scene convention (/root/reference/src/common/utilities.cpp:85-93).
    """
    tx, ty, tz = translation
    rx, ry, rz = (math.radians(r) for r in rotation_deg)
    sx, sy, sz = scale

    def rot_x(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], np.float64)

    def rot_y(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], np.float64)

    def rot_z(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)

    t = np.eye(4)
    t[:3, 3] = [tx, ty, tz]
    s = np.diag([sx, sy, sz, 1.0])
    return (t @ rot_x(rx) @ rot_y(ry) @ rot_z(rz) @ s).astype(np.float32)


def build_onb(n: Vec3):
    """Orthonormal basis around normal `n` -> (tangent, bitangent).

    Branchless pick of the helper axis (the reference branches on |n.x|>0.9;
    here a lane-parallel select keeps the VPU happy)."""
    use_y = jnp.abs(n.x) > 0.9
    helper = Vec3(
        jnp.where(use_y, 0.0, 1.0).astype(n.x.dtype),
        jnp.where(use_y, 1.0, 0.0).astype(n.x.dtype),
        jnp.zeros_like(n.x),
    )
    t = helper.cross(n).normalize()
    b = n.cross(t)
    return t, b


def to_world(local: Vec3, t: Vec3, b: Vec3, n: Vec3) -> Vec3:
    return t * local.x + b * local.y + n * local.z


def reflect(d: Vec3, n: Vec3) -> Vec3:
    """Mirror direction; `d` points *into* the surface."""
    return d - n * (2.0 * d.dot(n))


def refract(d: Vec3, n: Vec3, eta: jnp.ndarray):
    """Snell refraction of incident `d` about `n` with relative IOR `eta`
    (n_i/n_t). Returns (dir, total_internal_reflection_mask)."""
    cos_i = jnp.clip((-1.0 * d).dot(n), -1.0, 1.0)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    out = d * eta + n * (eta * cos_i - cos_t)
    return out, tir


def perspective_look_at(eye, center, up, fovy_deg, aspect, znear=0.1, zfar=1000.0) -> np.ndarray:
    """view_proj = perspective(fovy) @ lookAt — host-side numpy, GL clip
    conventions, used for SVGF motion vectors (the reference builds the same
    matrix with glm — /root/reference/src/kernels/ray_gen.cu:92-103)."""
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)

    f = center - eye
    f /= np.linalg.norm(f)
    s = np.cross(f, up)
    s /= np.linalg.norm(s)
    u = np.cross(s, f)
    view = np.eye(4)
    view[0, :3] = s
    view[1, :3] = u
    view[2, :3] = -f
    view[0, 3] = -s.dot(eye)
    view[1, 3] = -u.dot(eye)
    view[2, 3] = f.dot(eye)

    t = math.tan(math.radians(fovy_deg) / 2.0)
    proj = np.zeros((4, 4))
    proj[0, 0] = 1.0 / (aspect * t)
    proj[1, 1] = 1.0 / t
    proj[2, 2] = -(zfar + znear) / (zfar - znear)
    proj[2, 3] = -(2.0 * zfar * znear) / (zfar - znear)
    proj[3, 2] = -1.0
    return (proj @ view).astype(np.float32)


def project_to_screen_uv(p: Vec3, view_proj: jnp.ndarray):
    """World point -> [0,1]^2 screen UV under `view_proj` (4x4). Returns
    (u, v, valid) with v flipped to image convention like the reference's
    GetScreenUV (/root/reference/src/kernels/logic.cu:21-28)."""
    cx = view_proj[0, 0] * p.x + view_proj[0, 1] * p.y + view_proj[0, 2] * p.z + view_proj[0, 3]
    cy = view_proj[1, 0] * p.x + view_proj[1, 1] * p.y + view_proj[1, 2] * p.z + view_proj[1, 3]
    cw = view_proj[3, 0] * p.x + view_proj[3, 1] * p.y + view_proj[3, 2] * p.z + view_proj[3, 3]
    valid = jnp.abs(cw) > 1e-8
    inv_w = jnp.where(valid, 1.0 / jnp.where(valid, cw, 1.0), 0.0)
    u = cx * inv_w * 0.5 + 0.5
    v = 1.0 - (cy * inv_w * 0.5 + 0.5)
    return u, v, valid
