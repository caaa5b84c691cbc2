"""Pallas à-trous stencil kernel for SVGF.

The XLA pad+slice formulation of one à-trous pass costs ~36 ms at 1080p
(every one of the 8 taps materializes shifted copies of ~12 planes through
HBM). This kernel processes the image in row bands: one DMA stages each
plane's haloed window into VMEM, all 8 taps then run on-chip — traffic
drops to (read 12 + write 8) planes per pass, the HBM floor.

Host-side wrapper pads the planes by the halo (edge rows/cols carry an
out-of-image marker via explicit valid masks computed from global
coordinates in-kernel) and pads W to a lane multiple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SVGFConfig
from ..core.vec import Vec3

BAND = 64        # output rows per grid step
MAX_HALO = 16    # max a-trous step (1 << 4)
N_IN = 12        # ill_d rgb, var_d, ill_i rgb, var_i, depth, normal xyz
N_OUT = 8


def _lum(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def _make_kernel(step: int, h: int, w: int, wp: int, sigma_z: float,
                 sigma_n: float, sigma_l: float):
    # fixed 8-aligned staging window: inputs are padded by MAX_HALO on every
    # side, so the window [band*BAND, +ROWS) is always in bounds and its
    # start (a multiple of 64) is sublane-aligned — Mosaic rejects
    # dynamic-sliced DMA windows with unaligned row counts
    halo = MAX_HALO
    rows = BAND + 2 * MAX_HALO  # 96, a multiple of 8

    def kernel(*refs):
        in_refs = refs[:N_IN]
        out_refs = refs[N_IN:N_IN + N_OUT]
        scratch = refs[N_IN + N_OUT]
        sems = refs[N_IN + N_OUT + 1]

        band = pl.program_id(0)
        y0 = band * BAND  # into the halo-padded array; center starts at +halo

        # stage all planes' windows into VMEM
        for p in range(N_IN):
            pltpu.make_async_copy(
                in_refs[p].at[pl.ds(y0, rows), :],
                scratch.at[p], sems.at[p]).start()
        for p in range(N_IN):
            pltpu.make_async_copy(
                in_refs[p].at[pl.ds(y0, rows), :],
                scratch.at[p], sems.at[p]).wait()

        def center(p):
            return scratch[p, halo:halo + BAND, :]

        # memoized taps: the 8 taps x 12 planes share 3 row offsets and 3
        # column shifts, so caching (p, dy) slices and (p, dy, dx) rolls
        # cuts the slice/roll op count ~40% (a python-level CSE Mosaic is
        # not guaranteed to do); cached values are the same traced ops, so
        # the XLA-parity test stays bit-exact
        _slice_memo = {}
        _roll_memo = {}

        def tap2(p, dy, dx):
            if (p, dy) not in _slice_memo:
                _slice_memo[(p, dy)] = scratch[
                    p, halo + dy:halo + dy + BAND, :]
            if dx == 0:
                return _slice_memo[(p, dy)]
            if (p, dy, dx) not in _roll_memo:
                _roll_memo[(p, dy, dx)] = _xshift(_slice_memo[(p, dy)], dx)
            return _roll_memo[(p, dy, dx)]

        def _xshift(a, dx):
            # static roll (wrapped columns land in the pad region, masked by
            # the valid mask); pltpu.roll requires a non-negative shift
            return pltpu.roll(a, (-dx) % wp, 1)

        eps = 1e-6
        ill_d = [center(0), center(1), center(2)]
        var_d = center(3)
        ill_i = [center(4), center(5), center(6)]
        var_i = center(7)
        depth = center(8)
        nx, ny, nz = center(9), center(10), center(11)
        sky = depth < -999.0

        lum_d = _lum(*ill_d)
        lum_i = _lum(*ill_i)
        denom_d = 1.0 / (sigma_l * jnp.sqrt(jnp.maximum(0.0, var_d)) + eps)
        denom_i = 1.0 / (sigma_l * jnp.sqrt(jnp.maximum(0.0, var_i)) + eps)

        # global coordinates of this band's center rows (for border masks)
        gy = (jax.lax.broadcasted_iota(jnp.int32, (BAND, wp), 0)
              + y0)  # 0 .. h-1 in padded-origin coords == image row index
        gx = jax.lax.broadcasted_iota(jnp.int32, (BAND, wp), 1) - MAX_HALO

        # edge-clamped gradient (reference: idx_r = min(x+1, w-1))
        dzdx = jnp.where(gx + 1 < w, tap2(8, 0, 1) - depth, 0.0)
        dzdy = jnp.where(gy + 1 < h, tap2(8, 1, 0) - depth, 0.0)
        dzdx = jnp.where(jnp.abs(dzdx) < eps, eps, dzdx)
        dzdy = jnp.where(jnp.abs(dzdy) < eps, eps, dzdy)

        sum_wd = jnp.ones((BAND, wp))
        sum_wi = jnp.ones((BAND, wp))
        acc_d = [ill_d[0], ill_d[1], ill_d[2]]
        acc_vd = var_d
        acc_i = [ill_i[0], ill_i[1], ill_i[2]]
        acc_vi = var_i

        for jdy in (-1, 0, 1):
            for jdx in (-1, 0, 1):
                if jdy == 0 and jdx == 0:
                    continue
                dy, dx = jdy * step, jdx * step
                valid = ((gy + dy >= 0) & (gy + dy < h)
                         & (gx + dx >= 0) & (gx + dx < w))
                nd = tap2(8, dy, dx)
                nnx = tap2(9, dy, dx)
                nny = tap2(10, dy, dx)
                nnz = tap2(11, dy, dx)
                d_approx = dzdx * dx + dzdy * dy
                w_z = jnp.exp(-jnp.abs(depth - nd)
                              / (sigma_z * jnp.abs(d_approx) + eps))
                ndotn = jnp.maximum(0.0, nx * nnx + ny * nny + nz * nnz)
                if float(sigma_n).is_integer() and (
                        int(sigma_n) & (int(sigma_n) - 1)) == 0:
                    # x**128 as 7 squarings: Mosaic lowers a float pow as
                    # exp(n*log(x)) — two slow transcendentals per tap
                    w_n = ndotn
                    for _ in range(int(sigma_n).bit_length() - 1):
                        w_n = w_n * w_n
                else:
                    w_n = ndotn ** sigma_n
                t_ill_d = [tap2(0, dy, dx), tap2(1, dy, dx), tap2(2, dy, dx)]
                t_var_d = tap2(3, dy, dx)
                t_ill_i = [tap2(4, dy, dx), tap2(5, dy, dx), tap2(6, dy, dx)]
                t_var_i = tap2(7, dy, dx)
                n_lum_d = _lum(*t_ill_d)
                n_lum_i = _lum(*t_ill_i)
                w_l_d = w_n * jnp.exp(-jnp.abs(lum_d - n_lum_d) * denom_d)
                w_l_i = w_n * jnp.exp(-jnp.abs(lum_i - n_lum_i) * denom_i)
                w_d = jnp.where(valid, w_z * w_n * w_l_d, 0.0)
                w_i = jnp.where(valid, w_z * w_n * w_l_i, 0.0)
                sum_wd = sum_wd + w_d
                sum_wi = sum_wi + w_i
                for c in range(3):
                    acc_d[c] = acc_d[c] + t_ill_d[c] * w_d
                    acc_i[c] = acc_i[c] + t_ill_i[c] * w_i
                acc_vd = acc_vd + t_var_d * w_d
                acc_vi = acc_vi + t_var_i * w_i

        inv_d = 1.0 / sum_wd
        inv_i = 1.0 / sum_wi
        outs = [acc_d[0] * inv_d, acc_d[1] * inv_d, acc_d[2] * inv_d,
                acc_vd * inv_d,
                acc_i[0] * inv_i, acc_i[1] * inv_i, acc_i[2] * inv_i,
                acc_vi * inv_i]
        centers = [ill_d[0], ill_d[1], ill_d[2], var_d,
                   ill_i[0], ill_i[1], ill_i[2], var_i]
        for o in range(N_OUT):
            out_refs[o][:, :] = jnp.where(sky, centers[o], outs[o])

    return kernel


@functools.partial(jax.jit, static_argnames=("step", "sigma_z", "sigma_n",
                                             "sigma_l"))
def atrous_pallas(ill_d: Vec3, var_d, ill_i: Vec3, var_i, depth, normal: Vec3,
                  step: int, sigma_z: float, sigma_n: float, sigma_l: float):
    """One à-trous pass; drop-in for svgf._atrous_once on TPU."""
    h, w = depth.shape
    halo = MAX_HALO
    h_pad = -(-h // BAND) * BAND
    wp = -(-(w + 2 * MAX_HALO) // 128) * 128

    def prep(p):
        # pad: top/bottom halo rows + band remainder; left MAX_HALO; right to wp
        p = jnp.pad(p, ((halo, halo + (h_pad - h)),
                        (MAX_HALO, wp - w - MAX_HALO)))
        return p

    planes = [ill_d.x, ill_d.y, ill_d.z, var_d,
              ill_i.x, ill_i.y, ill_i.z, var_i,
              depth, normal.x, normal.y, normal.z]
    # pad depth with sky marker so halo rows never pass the sky test as hits
    padded = []
    for i, p in enumerate(planes):
        if i == 8:
            base = jnp.pad(p, ((halo, halo + (h_pad - h)),
                               (MAX_HALO, wp - w - MAX_HALO)),
                           constant_values=-1000.0)
        else:
            base = prep(p)
        padded.append(base)

    kernel = _make_kernel(step, h, w, wp, sigma_z, sigma_n, sigma_l)
    n_bands = h_pad // BAND
    in_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out_spec = pl.BlockSpec((BAND, wp), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[in_spec] * N_IN,
        out_specs=[out_spec] * N_OUT,
        out_shape=[jax.ShapeDtypeStruct((h_pad, wp), jnp.float32)] * N_OUT,
        scratch_shapes=[
            pltpu.VMEM((N_IN, BAND + 2 * MAX_HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((N_IN,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*padded)

    crop = lambda a: a[:h, MAX_HALO:MAX_HALO + w]
    return (Vec3(crop(outs[0]), crop(outs[1]), crop(outs[2])), crop(outs[3]),
            Vec3(crop(outs[4]), crop(outs[5]), crop(outs[6])), crop(outs[7]))
