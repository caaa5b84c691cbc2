"""Vec3: a structure-of-arrays 3-vector pytree.

TPU-first design note: XLA/TPU tiles the *last two* array dimensions onto
(8 sublanes x 128 lanes) vector registers. An ``(N, 3)`` float32 array wastes
125/128 lanes; storing each component as its own ``(N,)`` (or ``(H, W)``)
array keeps every lane busy. All renderer math therefore runs on this SoA
Vec3 instead of trailing-dim-3 arrays (the reference packs its path state the
same SoA way in CUDA float4s — /root/reference/src/scene_structs.h:97-117 —
for coalescing; on TPU the motivation is lane occupancy instead).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Union

import jax
import jax.numpy as jnp

Scalar = Union[float, int, jnp.ndarray]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Vec3:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # ---- constructors -------------------------------------------------
    @staticmethod
    def of(x: Scalar, y: Scalar, z: Scalar, dtype=jnp.float32) -> "Vec3":
        return Vec3(jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype))

    @staticmethod
    def full(shape, value: Scalar, dtype=jnp.float32) -> "Vec3":
        v = jnp.full(shape, value, dtype)
        return Vec3(v, v, v)

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Vec3":
        return Vec3.full(shape, 0.0, dtype)

    @staticmethod
    def ones(shape, dtype=jnp.float32) -> "Vec3":
        return Vec3.full(shape, 1.0, dtype)

    @staticmethod
    def splat(v, shape=None) -> "Vec3":
        """Broadcast a length-3 constant (tuple/list/np array) to `shape`."""
        x, y, z = (jnp.asarray(c, jnp.float32) for c in (v[0], v[1], v[2]))
        if shape is not None:
            x = jnp.broadcast_to(x, shape)
            y = jnp.broadcast_to(y, shape)
            z = jnp.broadcast_to(z, shape)
        return Vec3(x, y, z)

    @staticmethod
    def from_stacked(arr: jnp.ndarray) -> "Vec3":
        """(..., 3) array -> Vec3 of (...,) components."""
        return Vec3(arr[..., 0], arr[..., 1], arr[..., 2])

    def stacked(self) -> jnp.ndarray:
        """Vec3 -> (..., 3) array (for IO / interop only; avoid in hot code)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # ---- basic properties ---------------------------------------------
    @property
    def shape(self):
        return jnp.shape(self.x)

    @property
    def dtype(self):
        return jnp.result_type(self.x)

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))

    # ---- arithmetic ----------------------------------------------------
    def _bin(self, other, op) -> "Vec3":
        if isinstance(other, Vec3):
            return Vec3(op(self.x, other.x), op(self.y, other.y), op(self.z, other.z))
        return Vec3(op(self.x, other), op(self.y, other), op(self.z, other))

    def __add__(self, o): return self._bin(o, jnp.add)
    def __radd__(self, o): return self._bin(o, jnp.add)
    def __sub__(self, o): return self._bin(o, jnp.subtract)
    def __rsub__(self, o): return self._bin(o, lambda a, b: jnp.subtract(b, a))
    def __mul__(self, o): return self._bin(o, jnp.multiply)
    def __rmul__(self, o): return self._bin(o, jnp.multiply)
    def __truediv__(self, o): return self._bin(o, jnp.divide)
    def __rtruediv__(self, o): return self._bin(o, lambda a, b: jnp.divide(b, a))
    def __neg__(self): return Vec3(-self.x, -self.y, -self.z)

    # ---- geometry ------------------------------------------------------
    def dot(self, o: "Vec3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_sq(self) -> jnp.ndarray:
        return self.dot(self)

    def length(self) -> jnp.ndarray:
        return jnp.sqrt(self.length_sq())

    def normalize(self, eps: float = 1e-20) -> "Vec3":
        inv = jax.lax.rsqrt(jnp.maximum(self.length_sq(), eps))
        return self * inv

    def abs(self) -> "Vec3":
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def reciprocal(self) -> "Vec3":
        return Vec3(1.0 / self.x, 1.0 / self.y, 1.0 / self.z)

    def max_component(self) -> jnp.ndarray:
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def min_component(self) -> jnp.ndarray:
        return jnp.minimum(self.x, jnp.minimum(self.y, self.z))

    def sum(self) -> jnp.ndarray:
        return self.x + self.y + self.z

    def mean(self) -> jnp.ndarray:
        return self.sum() * (1.0 / 3.0)

    def clamp(self, lo, hi) -> "Vec3":
        return Vec3(jnp.clip(self.x, lo, hi), jnp.clip(self.y, lo, hi), jnp.clip(self.z, lo, hi))

    def luminance(self) -> jnp.ndarray:
        return 0.2126 * self.x + 0.7152 * self.y + 0.0722 * self.z

    # ---- structural ops -------------------------------------------------
    def take(self, idx, mode="clip") -> "Vec3":
        """Gather components at `idx` (full-lane gathers, one per component)."""
        return Vec3(
            jnp.take(self.x, idx, mode=mode),
            jnp.take(self.y, idx, mode=mode),
            jnp.take(self.z, idx, mode=mode),
        )

    def reshape(self, *shape) -> "Vec3":
        return Vec3(self.x.reshape(*shape), self.y.reshape(*shape), self.z.reshape(*shape))

    def __getitem__(self, k) -> "Vec3":
        return Vec3(self.x[k], self.y[k], self.z[k])

    def at_set(self, idx, v: "Vec3") -> "Vec3":
        return Vec3(self.x.at[idx].set(v.x), self.y.at[idx].set(v.y), self.z.at[idx].set(v.z))

    def at_add(self, idx, v: "Vec3", **kw) -> "Vec3":
        return Vec3(self.x.at[idx].add(v.x, **kw), self.y.at[idx].add(v.y, **kw),
                    self.z.at[idx].add(v.z, **kw))

    def map(self, fn) -> "Vec3":
        return Vec3(fn(self.x), fn(self.y), fn(self.z))


def where(mask, a: Vec3, b: Vec3) -> Vec3:
    """Componentwise select between two Vec3."""
    return Vec3(jnp.where(mask, a.x, b.x), jnp.where(mask, a.y, b.y), jnp.where(mask, a.z, b.z))


def vmin(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y), jnp.minimum(a.z, b.z))


def vmax(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y), jnp.maximum(a.z, b.z))


def lerp(a: Vec3, b: Vec3, t) -> Vec3:
    return a + (b - a) * t
