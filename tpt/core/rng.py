"""Counter-based, stateful-per-path RNG as pure JAX functions.

Semantics match the reference's deterministic scheme so renders are
bit-reproducible per (pixel, iteration) seed: a Wang-hash seeds a per-path
xorshift32 stream (/root/reference/src/rng.h:6-27 — public-domain hash
constructions). All ops are uint32 lane-parallel on the VPU; no host RNG,
no jax.random key plumbing in the per-bounce hot loop (each path carries its
uint32 state in the PathState SoA exactly like the reference's
``rng_state`` field).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

UINT = jnp.uint32
_INV_2_32 = 2.3283064365386963e-10  # 1 / 2^32 (python float: no device op at import)


def wang_hash(seed: jnp.ndarray) -> jnp.ndarray:
    """Wang hash over uint32 lanes."""
    seed = jnp.asarray(seed, UINT)
    seed = (seed ^ jnp.uint32(61)) ^ (seed >> 16)
    seed = seed * jnp.uint32(9)
    seed = seed ^ (seed >> 4)
    seed = seed * jnp.uint32(0x27D4EB2D)
    seed = seed ^ (seed >> 15)
    return seed


def path_seed(pixel_idx: jnp.ndarray, iteration) -> jnp.ndarray:
    """Per-path stream seed; same mixing constants as the reference
    (/root/reference/src/kernels/ray_gen.cu:41) so seeds decorrelate the
    same way across pixels/iterations. Zero seeds are bumped to 1 because
    xorshift32 has a fixed point at 0."""
    pix = jnp.asarray(pixel_idx, UINT)
    it = jnp.asarray(iteration, UINT)
    seed = wang_hash(pix * jnp.uint32(19990303) + it * jnp.uint32(719393))
    return jnp.where(seed == 0, jnp.uint32(1), seed)


def xorshift32(state: jnp.ndarray) -> jnp.ndarray:
    state = jnp.asarray(state, UINT)
    state = state ^ (state << 13)
    state = state ^ (state >> 17)
    state = state ^ (state << 5)
    return state


def rand_float(state: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Advance each lane's stream; return (new_state, uniform in [0, 1))."""
    state = xorshift32(state)
    return state, state.astype(jnp.float32) * _INV_2_32


def rand_float2(state):
    state, u1 = rand_float(state)
    state, u2 = rand_float(state)
    return state, u1, u2


def rand_float3(state):
    state, u1 = rand_float(state)
    state, u2 = rand_float(state)
    state, u3 = rand_float(state)
    return state, u1, u2, u3


def hash_to_unit_float(seed: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> [0,1) float without advancing a stream (for camera jitter,
    which the reference derives by re-hashing the seed —
    /root/reference/src/kernels/ray_gen.cu:48-57)."""
    return jnp.asarray(seed, UINT).astype(jnp.float32) * _INV_2_32


def halton(index: jnp.ndarray, base: int, n_digits: int = 16) -> jnp.ndarray:
    """Radical-inverse low-discrepancy sequence (fixed digit count so the
    loop is static-shape for XLA)."""
    idx = jnp.asarray(index, jnp.int32)
    f = jnp.float32(1.0)
    r = jnp.zeros_like(idx, dtype=jnp.float32)
    inv_b = jnp.float32(1.0 / base)
    for _ in range(n_digits):
        f = f * inv_b
        r = r + f * (idx % base).astype(jnp.float32)
        idx = idx // base
    return r
