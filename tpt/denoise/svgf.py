"""SVGF spatiotemporal denoiser (Schied 2017) over separate direct and
indirect channels — full parity with the reference pipeline
(/root/reference/src/kernels/svgf.cu): demodulation, motion-vector
temporal reprojection with consistency-tested 2x2 bilinear taps and
EMA alpha = max(0.1, 1/history), temporal variance from moments when
history >= 4 with a 7x7 geometry-weighted spatial fallback, 3x3 gaussian
variance blur, 5 sparse-3x3 a-trous iterations (step 1<<i) with
edge-stopping weights (sigma_z=1, sigma_n=128, sigma_l=4; the normal
weight is applied twice, matching the reference's EdgeStoppingWeights),
albedo re-modulation, and the reference's exact ping-pong: the *4th*
a-trous iteration output becomes next frame's temporal history.

TPU design: all spatial passes are static pad+slice stencils on (H, W)
planes (XLA fuses them into VPU loops; no gathers). The only gather is
temporal reprojection's 4 bilinear taps — unavoidable per-pixel indexing,
done as 4 flat takes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SVGFConfig
from ..core.vec import Vec3, where as vwhere


# ---------------------------------------------------------------------------
# plane helpers
# ---------------------------------------------------------------------------

def _shift(p: jnp.ndarray, dy: int, dx: int, fill: float = 0.0) -> jnp.ndarray:
    """out[y, x] = p[y + dy, x + dx]; out-of-range reads produce `fill`."""
    if dy == 0 and dx == 0:
        return p
    h, w = p.shape
    k = max(abs(dy), abs(dx))
    padded = jnp.pad(p, ((k, k), (k, k)), constant_values=fill)
    return jax.lax.slice(padded, (k + dy, k + dx), (k + dy + h, k + dx + w))


def _shift_valid(shape, dy: int, dx: int) -> jnp.ndarray:
    h, w = shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + dy
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + dx
    return (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)


def _luminance(v: Vec3) -> jnp.ndarray:
    return 0.2126 * v.x + 0.7152 * v.y + 0.0722 * v.z


def _shift_vec3(v: Vec3, dy, dx) -> Vec3:
    return Vec3(_shift(v.x, dy, dx), _shift(v.y, dy, dx), _shift(v.z, dy, dx))


# ---------------------------------------------------------------------------
# state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SVGFState:
    """Cross-frame history (the reference's ping-pong + prev buffers,
    svgf.h:29-72) as one pytree — snapshot/resume friendly."""

    hist_direct: Vec3       # [H, W] integrated direct illumination
    hist_direct_var: jnp.ndarray
    hist_indirect: Vec3
    hist_indirect_var: jnp.ndarray
    m1_dir: jnp.ndarray     # moment buffers (lum, lum^2 per channel)
    m1_ind: jnp.ndarray
    m2_dir: jnp.ndarray
    m2_ind: jnp.ndarray
    history_len: jnp.ndarray  # [H, W] int32
    prev_depth: jnp.ndarray
    prev_normal: Vec3
    prev_matid: jnp.ndarray

    @staticmethod
    def zeros(h: int, w: int) -> "SVGFState":
        z = jnp.zeros((h, w))
        return SVGFState(
            hist_direct=Vec3.zeros((h, w)), hist_direct_var=z,
            hist_indirect=Vec3.zeros((h, w)), hist_indirect_var=z,
            m1_dir=z, m1_ind=z, m2_dir=z, m2_ind=z,
            history_len=jnp.zeros((h, w), jnp.int32),
            prev_depth=jnp.full((h, w), -1000.0),
            prev_normal=Vec3.zeros((h, w)),
            prev_matid=jnp.full((h, w), -1, jnp.int32),
        )


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def _demodulate(raw: Vec3, albedo: Vec3, sky: jnp.ndarray,
                threshold: float) -> Vec3:
    def dem(c, a):
        return jnp.where(a > threshold, c / jnp.where(a > threshold, a, 1.0), c)

    out = Vec3(dem(raw.x, albedo.x), dem(raw.y, albedo.y), dem(raw.z, albedo.z))
    return vwhere(sky, raw, out)


_CHANNELS = ("dir_r", "dir_g", "dir_b", "dvar", "ind_r", "ind_g", "ind_b",
             "ivar", "m1d", "m1i", "m2d", "m2i")


def _reproject_taps(state: SVGFState, motion_u, motion_v, normal: Vec3,
                    depth, matid):
    """2x2 consistency-tested bilinear fetch of all history buffers at
    (x - mu, y - mv). Returns (weighted sums dict, valid_weight_sum).

    All 17 history channels are packed into ONE [H*W, 17] matrix so each
    bilinear tap is a single row-gather (4 gathers total). An
    optimization_barrier fences the packed matrix and the tap results:
    without it XLA's fusion duplicates the gathers into every consumer
    chain (measured 170x blowup: 256 s vs 1.5 s at 1080p)."""
    h, w = depth.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = xs - motion_u
    sy = ys - motion_v
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    flat = lambda p: p.reshape(-1)
    packed = jnp.stack([
        flat(state.hist_direct.x), flat(state.hist_direct.y),
        flat(state.hist_direct.z), flat(state.hist_direct_var),
        flat(state.hist_indirect.x), flat(state.hist_indirect.y),
        flat(state.hist_indirect.z), flat(state.hist_indirect_var),
        flat(state.m1_dir), flat(state.m1_ind),
        flat(state.m2_dir), flat(state.m2_ind),
        flat(state.prev_normal.x), flat(state.prev_normal.y),
        flat(state.prev_normal.z), flat(state.prev_depth),
        flat(state.prev_matid).astype(jnp.float32),
    ], axis=-1)
    packed = jax.lax.optimization_barrier(packed)

    sums = {k: jnp.zeros((h, w)) for k in _CHANNELS}
    wsum = jnp.zeros((h, w))

    for j in (0, 1):
        for i in (0, 1):
            tx = x0 + i
            ty = y0 + j
            wbil = (jnp.where(i, fx, 1.0 - fx)) * (jnp.where(j, fy, 1.0 - fy))
            inb = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
            idx = (jnp.clip(ty, 0, h - 1) * w + jnp.clip(tx, 0, w - 1)
                   ).astype(jnp.int32).reshape(-1)

            tap = jax.lax.optimization_barrier(
                jnp.take(packed, idx, axis=0))  # [H*W, 17], ONE gather
            ch = {k: tap[:, c].reshape(h, w) for c, k in enumerate(_CHANNELS)}
            tap_n = Vec3(tap[:, 12].reshape(h, w), tap[:, 13].reshape(h, w),
                         tap[:, 14].reshape(h, w))
            tap_d = tap[:, 15].reshape(h, w)
            tap_m = tap[:, 16].reshape(h, w)
            consistent = (
                inb & (wbil > 1e-6)
                & (normal.dot(tap_n) > 0.95)
                & (jnp.abs(depth - tap_d) < 2.0)
                & (matid.astype(jnp.float32) == tap_m)
            )
            wv = jnp.where(consistent, wbil, 0.0)
            wsum = wsum + wv
            for key in _CHANNELS:
                sums[key] = sums[key] + wv * ch[key]
    sums = {k: jax.lax.optimization_barrier(v) for k, v in sums.items()}
    return sums, wsum


def _spatial_variance(m1d, m1i, m2d, m2i, depth, normal: Vec3,
                      cfg: SVGFConfig):
    """7x7 geometry-weighted moment average -> variance (fallback path)."""
    h, w = depth.shape
    eps = 1e-6
    dzdx = _shift(depth, 0, 1, fill=0.0) - depth
    dzdy = _shift(depth, 1, 0, fill=0.0) - depth

    sum_w = jnp.ones((h, w))
    s1d, s1i, s2d, s2i = m1d, m1i, m2d, m2i
    r = 3
    for j in range(-r, r + 1):
        for i in range(-r, r + 1):
            if i == 0 and j == 0:
                continue
            valid = _shift_valid((h, w), j, i)
            nd = _shift(depth, j, i)
            nn = _shift_vec3(normal, j, i)
            dz = jnp.abs(depth - nd)
            thr = jnp.abs(dzdx * i + dzdy * j) + eps
            w_z = jnp.exp(-dz / (cfg.sigma_z * thr))
            w_n = jnp.maximum(0.0, normal.dot(nn)) ** cfg.sigma_n
            wv = jnp.where(valid, w_z * w_n, 0.0)
            sum_w = sum_w + wv
            s1d = s1d + wv * _shift(m1d, j, i)
            s1i = s1i + wv * _shift(m1i, j, i)
            s2d = s2d + wv * _shift(m2d, j, i)
            s2i = s2i + wv * _shift(m2i, j, i)
    sum_w = jnp.maximum(sum_w, eps)
    a1d, a1i, a2d, a2i = s1d / sum_w, s1i / sum_w, s2d / sum_w, s2i / sum_w
    return (jnp.maximum(0.0, a2d - a1d * a1d),
            jnp.maximum(0.0, a2i - a1i * a1i))


def _gaussian3(var: jnp.ndarray) -> jnp.ndarray:
    k = [(0.0625, -1, -1), (0.125, -1, 0), (0.0625, -1, 1),
         (0.125, 0, -1), (0.25, 0, 0), (0.125, 0, 1),
         (0.0625, 1, -1), (0.125, 1, 0), (0.0625, 1, 1)]
    # edge-clamped like the CUDA kernel (min/max indexing)
    h, w = var.shape
    out = jnp.zeros((h, w))
    for wgt, dy, dx in k:
        tap = _shift(var, dy, dx)
        valid = _shift_valid((h, w), dy, dx)
        clamped = jnp.where(valid, tap, var)  # clamp == center fallback
        out = out + wgt * clamped
    return out


def _atrous_once(illum_d: Vec3, var_d, illum_i: Vec3, var_i,
                 depth, normal: Vec3, step: int, cfg: SVGFConfig):
    h, w = depth.shape
    eps = 1e-6
    sky = depth < 0.0

    lum_d = _luminance(illum_d)
    lum_i = _luminance(illum_i)
    denom_d = 1.0 / (cfg.sigma_l * jnp.sqrt(jnp.maximum(0.0, var_d)) + eps)
    denom_i = 1.0 / (cfg.sigma_l * jnp.sqrt(jnp.maximum(0.0, var_i)) + eps)

    # edge-clamped gradient (reference: idx_r = min(x+1, w-1))
    dzdx = jnp.where(_shift_valid((h, w), 0, 1), _shift(depth, 0, 1) - depth, 0.0)
    dzdy = jnp.where(_shift_valid((h, w), 1, 0), _shift(depth, 1, 0) - depth, 0.0)
    dzdx = jnp.where(jnp.abs(dzdx) < eps, eps, dzdx)
    dzdy = jnp.where(jnp.abs(dzdy) < eps, eps, dzdy)

    sum_wd = jnp.ones((h, w))
    sum_wi = jnp.ones((h, w))
    acc_d = illum_d
    acc_vd = var_d
    acc_i = illum_i
    acc_vi = var_i

    for j in (-1, 0, 1):
        for i in (-1, 0, 1):
            if i == 0 and j == 0:
                continue
            dy, dx = j * step, i * step
            valid = _shift_valid((h, w), dy, dx)
            nd = _shift(depth, dy, dx)
            nn = _shift_vec3(normal, dy, dx)
            n_ill_d = _shift_vec3(illum_d, dy, dx)
            n_var_d = _shift(var_d, dy, dx)
            n_ill_i = _shift_vec3(illum_i, dy, dx)
            n_var_i = _shift(var_i, dy, dx)

            d_approx = dzdx * dx + dzdy * dy
            w_z = jnp.exp(-jnp.abs(depth - nd)
                          / (cfg.sigma_z * jnp.abs(d_approx) + eps))
            w_n = jnp.maximum(0.0, normal.dot(nn)) ** cfg.sigma_n
            n_lum_d = _luminance(n_ill_d)
            n_lum_i = _luminance(n_ill_i)
            # reference applies w_n twice (EdgeStoppingWeightsWithDenom)
            w_l_d = w_n * jnp.exp(-jnp.abs(lum_d - n_lum_d) * denom_d)
            w_l_i = w_n * jnp.exp(-jnp.abs(lum_i - n_lum_i) * denom_i)
            w_d = jnp.where(valid, w_z * w_n * w_l_d, 0.0)
            w_i = jnp.where(valid, w_z * w_n * w_l_i, 0.0)

            sum_wd = sum_wd + w_d
            acc_d = acc_d + n_ill_d * w_d
            acc_vd = acc_vd + n_var_d * w_d
            sum_wi = sum_wi + w_i
            acc_i = acc_i + n_ill_i * w_i
            acc_vi = acc_vi + n_var_i * w_i

    out_d = acc_d * (1.0 / sum_wd)
    out_vd = acc_vd / sum_wd
    out_i = acc_i * (1.0 / sum_wi)
    out_vi = acc_vi / sum_wi
    # sky passthrough
    out_d = vwhere(sky, illum_d, out_d)
    out_vd = jnp.where(sky, var_d, out_vd)
    out_i = vwhere(sky, illum_i, out_i)
    out_vi = jnp.where(sky, var_i, out_vi)
    return out_d, out_vd, out_i, out_vi


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def run_svgf(cfg: SVGFConfig, state: SVGFState,
             raw_direct: Vec3, raw_indirect: Vec3,
             albedo: Vec3, depth: jnp.ndarray, normal: Vec3,
             matid: jnp.ndarray, motion_u: jnp.ndarray, motion_v: jnp.ndarray
             ) -> Tuple[Vec3, SVGFState]:
    """One denoised frame. All inputs are (H, W) planes.

    Returns (final rgb Vec3[H, W], next SVGFState)."""
    h, w = depth.shape
    sky = depth < 0.0

    # 1. demodulation
    ill_d = _demodulate(raw_direct, albedo, sky, cfg.demodulate_threshold)
    ill_i = _demodulate(raw_indirect, albedo, sky, cfg.demodulate_threshold)

    # 2. temporal reprojection + EMA
    lum_d = _luminance(ill_d)
    lum_i = _luminance(ill_i)
    m1d_c, m1i_c = lum_d, lum_i
    m2d_c, m2i_c = lum_d * lum_d, lum_i * lum_i

    if cfg.use_pallas_reproject:
        from .pallas_reproject import reproject_pallas

        sums, wsum = reproject_pallas(state, motion_u, motion_v, normal,
                                      depth, matid,
                                      radius=cfg.reproject_radius)
    else:
        sums, wsum = _reproject_taps(state, motion_u, motion_v, normal,
                                     depth, matid)
    valid = (wsum > 1e-4) & ~sky
    inv_w = 1.0 / jnp.maximum(wsum, 1e-8)

    hist_len = jnp.where(valid, state.history_len + 1, 0)
    alpha = jnp.maximum(cfg.temporal_alpha_min,
                        1.0 / jnp.maximum(hist_len.astype(jnp.float32), 1.0))

    def ema(prev_sum, cur):
        prev = prev_sum * inv_w
        mixed = prev + (cur - prev) * alpha
        return jnp.where(valid, mixed, cur)

    ill_d = Vec3(ema(sums["dir_r"], ill_d.x), ema(sums["dir_g"], ill_d.y),
                 ema(sums["dir_b"], ill_d.z))
    ill_i = Vec3(ema(sums["ind_r"], ill_i.x), ema(sums["ind_g"], ill_i.y),
                 ema(sums["ind_b"], ill_i.z))
    m1d = ema(sums["m1d"], m1d_c)
    m1i = ema(sums["m1i"], m1i_c)
    m2d = ema(sums["m2d"], m2d_c)
    m2i = ema(sums["m2i"], m2i_c)

    enough_history = valid & (hist_len >= cfg.history_threshold)
    var_d = jnp.where(enough_history, jnp.maximum(0.0, m2d - m1d * m1d), 1.0)
    var_i = jnp.where(enough_history, jnp.maximum(0.0, m2i - m1i * m1i), 1.0)
    var_d = jnp.where(sky, 1.0, var_d)
    var_i = jnp.where(sky, 1.0, var_i)

    # 3. spatial variance fallback for short history. Guarded: the 7x7
    # XLA stencil costs ~100 ms at 1080p (BENCHMARKS §5), so frames with
    # no short-history pixel (steady state) skip it entirely — lax.cond
    # executes one branch, and the selected values are bit-identical
    # because need_spatial masks every lane the fallback would write.
    need_spatial = ~enough_history & ~sky

    def with_spatial(args):
        vd, vi = args
        sp_var_d, sp_var_i = _spatial_variance(m1d, m1i, m2d, m2i, depth,
                                               normal, cfg)
        return (jnp.where(need_spatial, sp_var_d, vd),
                jnp.where(need_spatial, sp_var_i, vi))

    var_d, var_i = jax.lax.cond(jnp.any(need_spatial), with_spatial,
                                lambda a: a, (var_d, var_i))

    # 4. gaussian blur on variance
    var_d = jax.lax.optimization_barrier(_gaussian3(var_d))
    var_i = jax.lax.optimization_barrier(_gaussian3(var_i))
    ill_d = jax.lax.optimization_barrier(ill_d)
    ill_i = jax.lax.optimization_barrier(ill_i)

    # 5. a-trous iterations; capture the reference's history tap (the output
    # of iteration index 3, i.e. the buffer last written to the ping slot).
    # Barriers fence each iteration: XLA fusion would otherwise duplicate
    # the whole upstream graph into each of the 8 taps of the next pass.
    if cfg.use_pallas_atrous:
        from .pallas_stencil import atrous_pallas

        def one_pass(ill_d, var_d, ill_i, var_i, step):
            return atrous_pallas(ill_d, var_d, ill_i, var_i, depth, normal,
                                 step, cfg.sigma_z, cfg.sigma_n, cfg.sigma_l)
    else:
        def one_pass(ill_d, var_d, ill_i, var_i, step):
            return _atrous_once(ill_d, var_d, ill_i, var_i, depth, normal,
                                step, cfg)

    hist_tap = None
    for it in range(cfg.atrous_iterations):
        ill_d, var_d, ill_i, var_i = jax.lax.optimization_barrier(
            one_pass(ill_d, var_d, ill_i, var_i, 1 << it))
        if it == cfg.atrous_iterations - 2:
            hist_tap = (ill_d, var_d, ill_i, var_i)
    if hist_tap is None:
        hist_tap = (ill_d, var_d, ill_i, var_i)

    # 6. modulation (+ sky passthrough of indirect)
    rgb = (ill_d + ill_i) * albedo
    rgb = vwhere(sky, ill_i, rgb)

    new_state = SVGFState(
        hist_direct=hist_tap[0], hist_direct_var=hist_tap[1],
        hist_indirect=hist_tap[2], hist_indirect_var=hist_tap[3],
        m1_dir=m1d, m1_ind=m1i, m2_dir=m2d, m2_ind=m2i,
        history_len=hist_len,
        prev_depth=depth, prev_normal=normal, prev_matid=matid,
    )
    return rgb, new_state
