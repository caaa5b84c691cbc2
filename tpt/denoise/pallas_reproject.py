"""Pallas temporal-reprojection kernel for SVGF.

The XLA formulation of the 2x2 consistency-tested bilinear history fetch
(svgf._reproject_taps) is 4 row-gathers of a packed [H*W, 17] matrix —
measured ~370 ms of the 391 ms SVGF frame at 1080p (TPU gathers run
~30 ms per 2M elements; BENCHMARKS.md §6). This kernel replaces the
gathers with dense shift-select arithmetic, which the VPU does at line
rate:

- the image is processed in row bands; every history plane's haloed
  window (band + 2R rows) is DMA-staged into VMEM,
- per-lane *row* selection is a sum of (ry == a) masked static row
  slices over a in [-R, R],
- per-lane *column* selection is a sum of (rx == b) masked lane-rolls
  (pltpu.roll) over b in [-R, R]; the x+1 bilinear corner reuses each
  roll with the (rx == b-1) mask,
- the four corner taps then run the reference's consistency test
  (normal dot > 0.95, |dz| < 2, same material id —
  /root/reference/src/kernels/svgf.cu:94-116) and accumulate the
  bilinear-weighted channel sums exactly like the XLA path.

Design bounds (documented TPU trade-offs, both degrading into SVGF's
spatial-variance fallback rather than artifacts):
- motion beyond +-R pixels (R = reproject_radius, default 24) marks the
  tap inconsistent — the same graceful degradation the reference
  exhibits on disocclusion;
- the row/column shifts are separable, so a lane whose *row* offset
  differs from that of the lane `rx` columns over picks the neighbour's
  row — exact whenever the motion field's vertical component is locally
  constant over the horizontal shift distance (true for camera-driven
  fields away from disocclusion edges, where the consistency test
  already rejects taps). Tests pin Pallas == XLA for smooth in-range
  motion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import Vec3

BAND = 32

# history channels staged through the shift machinery (dvar/ivar history
# is carried in SVGFState but never consumed by run_svgf, so not tapped)
HIST = ("dir_r", "dir_g", "dir_b", "ind_r", "ind_g", "ind_b",
        "m1d", "m1i", "m2d", "m2i", "pnx", "pny", "pnz", "pdepth", "pmatid")
N_HIST = len(HIST)
DATA_KEYS = ("dir_r", "dir_g", "dir_b", "ind_r", "ind_g", "ind_b",
             "m1d", "m1i", "m2d", "m2i")
N_CUR = 7  # motion_u, motion_v, depth, nx, ny, nz, matid


def _make_kernel(h: int, w: int, wp: int, radius: int):
    R = radius
    rows_win = BAND + 2 * R
    assert rows_win % 8 == 0

    def kernel(*refs):
        hist_refs = refs[:N_HIST]
        cur_refs = refs[N_HIST:N_HIST + N_CUR]
        out_refs = refs[N_HIST + N_CUR:N_HIST + N_CUR + len(DATA_KEYS) + 1]
        scratch = refs[-2]
        sems = refs[-1]

        band = pl.program_id(0)
        y0 = band * BAND  # top output row; window starts at the same row
        # of the R-top-padded arrays, so window row r maps to image row
        # y0 + r - R

        for p in range(N_HIST):
            pltpu.make_async_copy(
                hist_refs[p].at[pl.ds(y0, rows_win), :],
                scratch.at[p, pl.ds(0, rows_win), :], sems.at[p]).start()

        mu = cur_refs[0][:, :]
        mv = cur_refs[1][:, :]
        depth = cur_refs[2][:, :]
        nx = cur_refs[3][:, :]
        ny = cur_refs[4][:, :]
        nz = cur_refs[5][:, :]
        matid = cur_refs[6][:, :]

        gy = (jax.lax.broadcasted_iota(jnp.int32, (BAND, wp), 0)
              + y0).astype(jnp.float32)
        gx = (jax.lax.broadcasted_iota(jnp.int32, (BAND, wp), 1)
              - R).astype(jnp.float32)
        sx = gx - mu
        sy = gy - mv
        x0f = jnp.floor(sx)
        y0f = jnp.floor(sy)
        fx = sx - x0f
        fy = sy - y0f
        ry = (y0f - gy).astype(jnp.int32)   # corner (0,0) row offset
        rx = (x0f - gx).astype(jnp.int32)
        # shift-machinery range (the +1 corners need one more step)
        ry_ok = (ry >= -R) & (ry <= R - 1)
        rx_ok = (rx >= -R) & (rx <= R - 1)
        ry_c = jnp.clip(ry, -R, R - 1)
        rx_c = jnp.clip(rx, -R, R - 1)

        for p in range(N_HIST):
            pltpu.make_async_copy(
                hist_refs[p].at[pl.ds(y0, rows_win), :],
                scratch.at[p, pl.ds(0, rows_win), :], sems.at[p]).wait()

        zeros = jnp.zeros((BAND, wp))

        n_blk = (2 * R + 8) // 8  # 8 offsets per fori iteration

        # motion-adaptive block culling: a coarse block whose 8 offsets
        # all fall outside the band's actual [min, max] row/col offset
        # range selects nothing — skip it. Typical camera motion spans a
        # few pixels, so ~2 of the 7 blocks do all the work and kernel
        # cost scales with |motion|, not with the R=24 worst case.
        ry_lo = jnp.min(ry_c)
        ry_hi = jnp.max(ry_c)
        rx_lo = jnp.min(rx_c)
        rx_hi = jnp.max(rx_c)

        def tap_channel(p):
            """4 corner taps of history plane p: fori loops unrolled by 8
            inside. Three measured failure modes bound this design:
            full static unroll spills one scoped VMEM buffer per produced
            value (283 MB > the 128 MB space at 1080p, round 1 of this
            kernel); scalar fori (one offset/iteration) pays ~2 us loop
            overhead per iteration (114 ms whole-kernel); and Mosaic
            rejects unaligned dynamic sublane slices — so the row phase
            loads an 8-aligned dynamic window (i*8 is provably aligned)
            and statically sub-slices it, and the column phase composes
            one dynamic coarse roll with 8 static fine rolls."""
            # row phase: window row for output row r at offset o is
            # r + R + o; slice rows i*8+f feed offset o = i*8 + f - R for
            # the y0f corners (mask o) and o-1 for the y0f+1 corners.
            # Offsets beyond R select nothing (ry_c is clipped to R-1).
            def row_blk(i, carry):
                acc0, acc1 = carry
                base = scratch[p, pl.ds(i * 8, BAND + 8), :]
                for f in range(8):
                    sl = base[f:f + BAND]
                    off = i * 8 + f - R
                    acc0 = jnp.where(ry_c == off, sl, acc0)
                    acc1 = jnp.where(ry_c == off - 1, sl, acc1)
                return acc0, acc1

            def row_body(i, carry):
                # block offsets [i*8-R, i*8+7-R]; acc1 also matches off-1
                live = ((i * 8 - R <= ry_hi + 1) & (i * 8 + 7 - R >= ry_lo))
                return jax.lax.cond(live, lambda c, i=i: row_blk(i, c),
                                    lambda c: c, carry)

            acc0, acc1 = jax.lax.fori_loop(0, n_blk, row_body,
                                           (zeros, zeros))

            # column phase: shift for offset b is (-b) % wp with
            # b = i*8 + f - R; coarse dynamic roll by (R - i*8) % wp, then
            # static fine rolls by wp - f compose to it. Shared rolls feed
            # both the x (mask b) and x+1 (mask b-1) corners.
            def col_blk(i, carry):
                t00, t01, t10, t11 = carry
                coarse = jnp.mod(R - i * 8, wp)
                c0 = pltpu.roll(acc0, coarse, 1)
                c1 = pltpu.roll(acc1, coarse, 1)
                for f in range(8):
                    r0 = pltpu.roll(c0, (wp - f) % wp, 1)
                    r1 = pltpu.roll(c1, (wp - f) % wp, 1)
                    b = i * 8 + f - R
                    m0 = rx_c == b
                    m1 = rx_c == b - 1
                    t00 = jnp.where(m0, r0, t00)
                    t01 = jnp.where(m1, r0, t01)
                    t10 = jnp.where(m0, r1, t10)
                    t11 = jnp.where(m1, r1, t11)
                return t00, t01, t10, t11

            def col_body(i, carry):
                live = ((i * 8 - R <= rx_hi + 1) & (i * 8 + 7 - R >= rx_lo))
                return jax.lax.cond(live, lambda c, i=i: col_blk(i, c),
                                    lambda c: c, carry)

            t00, t01, t10, t11 = jax.lax.fori_loop(
                0, n_blk, col_body, (zeros, zeros, zeros, zeros))
            return (t00, t01, t10, t11)  # corner = j * 2 + i

        # ---- guide channels -> per-corner consistency weights -------------
        guides = {g: tap_channel(HIST.index(g))
                  for g in ("pnx", "pny", "pnz", "pdepth", "pmatid")}
        wvs = []
        wsum = zeros
        for j in (0, 1):
            for i in (0, 1):
                c = j * 2 + i
                tx = x0f + i
                ty = y0f + j
                wbil = (jnp.where(i, fx, 1.0 - fx)
                        * jnp.where(j, fy, 1.0 - fy))
                inb = ((tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
                       & ry_ok & rx_ok)
                consistent = (
                    inb & (wbil > 1e-6)
                    & (nx * guides["pnx"][c] + ny * guides["pny"][c]
                       + nz * guides["pnz"][c] > 0.95)
                    & (jnp.abs(depth - guides["pdepth"][c]) < 2.0)
                    & (matid == guides["pmatid"][c])
                )
                wv = jnp.where(consistent, wbil, 0.0)
                wvs.append(wv)
                wsum = wsum + wv
        del guides

        # ---- data channels streamed one at a time --------------------------
        for o, k in enumerate(DATA_KEYS):
            taps = tap_channel(HIST.index(k))
            out_refs[o][:, :] = (wvs[0] * taps[0] + wvs[1] * taps[1]
                                 + wvs[2] * taps[2] + wvs[3] * taps[3])
        out_refs[len(DATA_KEYS)][:, :] = wsum

    return kernel


@functools.partial(jax.jit, static_argnames=("radius",))
def reproject_pallas(state, motion_u, motion_v, normal: Vec3, depth, matid,
                     radius: int = 24):
    """Drop-in for svgf._reproject_taps (minus the unused dvar/ivar keys).

    Returns (sums dict over DATA_KEYS, wsum)."""
    h, w = depth.shape
    R = radius
    assert (BAND + 2 * R) % 8 == 0, "radius must keep the window 8-aligned"
    h_pad = -(-h // BAND) * BAND
    wp = -(-(w + 2 * R) // 128) * 128

    hist_planes = {
        "dir_r": state.hist_direct.x, "dir_g": state.hist_direct.y,
        "dir_b": state.hist_direct.z,
        "ind_r": state.hist_indirect.x, "ind_g": state.hist_indirect.y,
        "ind_b": state.hist_indirect.z,
        "m1d": state.m1_dir, "m1i": state.m1_ind,
        "m2d": state.m2_dir, "m2i": state.m2_ind,
        "pnx": state.prev_normal.x, "pny": state.prev_normal.y,
        "pnz": state.prev_normal.z, "pdepth": state.prev_depth,
        "pmatid": state.prev_matid.astype(jnp.float32),
    }

    def pad_hist(p):
        return jnp.pad(p, ((R, R + (h_pad - h)), (R, wp - w - R)))

    def pad_cur(p):
        return jnp.pad(p.astype(jnp.float32), ((0, h_pad - h), (R, wp - w - R)))

    hist = [pad_hist(hist_planes[k]) for k in HIST]
    cur = [pad_cur(p) for p in
           (motion_u, motion_v, depth, normal.x, normal.y, normal.z, matid)]

    kernel = _make_kernel(h, w, wp, R)
    n_bands = h_pad // BAND
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    blk_spec = pl.BlockSpec((BAND, wp), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[any_spec] * N_HIST + [blk_spec] * N_CUR,
        out_specs=[blk_spec] * (len(DATA_KEYS) + 1),
        out_shape=[jax.ShapeDtypeStruct((h_pad, wp), jnp.float32)]
        * (len(DATA_KEYS) + 1),
        scratch_shapes=[
            # +8 rows: the row phase's unroll-by-8 window reads up to 8
            # rows past the DMA'd region (masked — offsets beyond R never
            # select)
            pltpu.VMEM((N_HIST, BAND + 2 * R + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((N_HIST,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*hist, *cur)

    crop = lambda a: a[:h, R:R + w]
    sums = {k: crop(outs[o]) for o, k in enumerate(DATA_KEYS)}
    return sums, crop(outs[len(DATA_KEYS)])
