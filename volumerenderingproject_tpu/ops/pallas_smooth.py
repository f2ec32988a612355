"""Fused differentiable SMOOTH-mode ray march: trilinear intensities +
sigmoid transfer function, with volume-field gradients at kernel speed.

The smooth mode (``config.interp = TRILINEAR`` + ``classify_smooth``) is
the framework's differentiable extension of the reference's piecewise-
constant pipeline (SURVEY.md §7 "offer optional smooth modes"): nearest-
neighbor sampling and the interval TF have zero gradients a.e. w.r.t. the
volume and the interval bounds, so density-field / bound optimization
REQUIRES this path.  Until round 3 it existed only at XLA-scan speed
(~8.6 ns/sample-gather floor, DESIGN.md §2); this module is its fused
Pallas forward + backward (VERDICT round-2 item 4).

Forward (per 16x16-ray tile, 4 samples x 256 rays per [8,128] register):

  vox   = (ray(t) + 0.5) * L + (dims/2 - L/2)      (modelAux + toVolumeSpace)
  v     = trilinear(volume, vox)                    (zero-padded, floor corners
                                                     — ops/sampling.
                                                     trilinear_intensity_sample)
  vn    = v / cal_max                               (float header value)
  w_k   = sigmoid(s*(vn - lo_k)) * sigmoid(s*(hi_k - vn)),  k = 1..K-1
  rgba  = colors[0] + sum_k w_k (colors[k] - colors[0])     (classify_smooth)
  march: C += T a rgba_rgb,  T *= 1 - a             (front-to-back (C, T))

Backward (custom_vjp): a two-pass re-march kernel (the pass-A/pass-B
prefix-suffix scheme of ops/pallas_march_vjp) computing per sample

  dL/drgba_s  ->  dL/dcolors [K, 4], dL/dlo_k, dL/dhi_k   (per-tile sums)
                  dL/dvn_s                                 (per-sample field)

The per-sample ``dL/dvn`` plane is written to HBM ([tiles, chunks*8, 128],
one VMEM block per tile) and a chunked XLA epilogue splats it into the
volume cotangent through the trilinear adjoint (8 corner scatter-adds per
sample, `lax.scan` over sample chunks so memory stays O(rays)).  This is
the piece that makes "differentiable volume renderer" mean more than TF
recoloring: dL/dvolume enables density-field fits from rendered targets.

Gradients exposed: tf.colors, tf.lower, tf.upper, volume.data.  (Camera
gradients still require the XLA renderer; a global density scale folds
into the alpha column externally, as in diff/fit.py — classify_smooth is
linear in ``colors``.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ingest.volume import Volume
from ..scene.camera import Camera
from ..scene.transfer_function import TransferFunction
from ..utils.config import Interp, RenderConfig
from .pallas_march import STEPS, TILE_PX, TILE_PY, _BIG, _iota, _pad_to

_f32 = jnp.float32
_i32 = jnp.int32


def _ray_setup(scal_ref, conic, width, height, tile):
    """Shared per-tile ray origins/directions (mirrors _march_kernel)."""
    tpx, tpy, steps = tile
    nrays = tpx * tpy
    E = nrays * steps // 128
    pos = [scal_ref[5 + c] for c in range(3)]
    front = [scal_ref[8 + c] for c in range(3)]
    right = [scal_ref[11 + c] for c in range(3)]
    up = [scal_ref[14 + c] for c in range(3)]
    tl = [scal_ref[17 + c] for c in range(3)]
    rsw = scal_ref[20]
    rsh = scal_ref[21]

    tx = pl.program_id(0)
    ty = pl.program_id(1)
    e = _iota(0, E) * 128 + _iota(1, E)
    s_idx = e // nrays
    f = e % nrays
    u = f // tpy
    v = f % tpy
    pxi = tx * tpx + u
    pyi = ty * tpy + v
    pix_ok = (pxi < width) & (pyi < height)
    px = pxi.astype(_f32)
    py = pyi.astype(_f32)

    xt = [((px * rsw) / np.float32(width)) * right[c] for c in range(3)]
    yt = [((py * rsh) / np.float32(height)) * (-up[c]) for c in range(3)]
    if conic:
        o = [jnp.zeros((E, 128), _f32) + pos[c] for c in range(3)]
        rd = [tl[c] + xt[c] + yt[c] - pos[c] for c in range(3)]
        inv = jax.lax.rsqrt(rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2])
        d = [rd[c] * inv for c in range(3)]
    else:
        o = [(tl[c] + xt[c]) + yt[c] for c in range(3)]
        d = [jnp.zeros((E, 128), _f32) + front[c] for c in range(3)]
    return o, d, s_idx, pix_ok


def _sample_smooth(scal_ref, lower_ref, upper_ref, colors_ref, vol_ref,
                   o, d, s_idx, pix_ok, ci, dims, num_intervals, tile,
                   zpack=None):
    """One chunk's smooth sample: returns (rgb[3], a, vn, sig1[K-1],
    sig2[K-1], w[K-1]) as [E,128] registers.

    ``zpack`` (zw, ypack, nyg): ``vol_ref`` holds 10-bit affine-quantized
    intensities, three z-values per i32 word, ``ypack`` y-columns per
    128-lane row (smooth_packed_geometry) — lifts the z <= 128 / 12 MB
    f32-row limits so MNI-1mm-class (182x218x182) smooth-mode fits run
    fused (VERDICT r3 item 4).  Dequantization affine rides
    scal[26]/[27]; the forward (and hence the custom backward, which
    re-marches the same grid) optimizes the quantized forward model —
    self-consistent gradients, model error <= (data range)/1023/2 per
    tap (~5e-4 of cal_max: below the smooth classify's resolution for
    reference sharpness values)."""
    d1, d2, d3 = dims
    tpx, tpy, steps = tile
    E = tpx * tpy * steps // 128
    ds = scal_ref[0]
    clip = scal_ref[1]
    cal = scal_ref[2]
    sharp = scal_ref[4]
    L = scal_ref[25]
    voff = [scal_ref[22 + c] for c in range(3)]

    i_f = (ci * steps + s_idx).astype(_f32)
    ti = i_f * ds + clip  # kernel.cu:54,59
    # modelAux (+0.5) then toVolumeSpace — same op order as the XLA path
    vox = [((o[c] + ti * d[c]) + 0.5) * L + voff[c] for c in range(3)]

    bx = jnp.floor(vox[0])
    by = jnp.floor(vox[1])
    bz = jnp.floor(vox[2])
    fx = vox[0] - bx
    fy = vox[1] - by
    fz = vox[2] - bz
    ix = bx.astype(_i32)
    iy = by.astype(_i32)
    iz = bz.astype(_i32)

    def cornmeta(ox, oy):
        cx = ix + ox
        cy = iy + oy
        okxy = pix_ok & (cx >= 0) & (cx < d1) & (cy >= 0) & (cy < d2)
        row = jnp.where(okxy, cx * d2 + cy, -1)
        return row, okxy

    row00, ok00 = cornmeta(0, 0)
    row01, ok01 = cornmeta(0, 1)
    row10, ok10 = cornmeta(1, 0)
    row11, ok11 = cornmeta(1, 1)
    okz = (iz >= 0) & (iz < d3)
    okz1 = (iz + 1 >= 0) & (iz + 1 < d3)
    lz = jnp.clip(iz, 0, d3 - 1)
    lz1 = jnp.clip(iz + 1, 0, d3 - 1)

    anyok = ok00 | ok11
    rxmin = jnp.min(jnp.where(ok00 | ok01, ix, _BIG))
    rxmin = jnp.minimum(rxmin, jnp.min(
        jnp.where(ok10 | ok11, ix + 1, _BIG)))
    rxmax = jnp.max(jnp.where(ok10 | ok11, ix + 1, -1))
    rxmax = jnp.maximum(rxmax, jnp.max(jnp.where(ok00 | ok01, ix, -1)))
    rymin = jnp.min(jnp.where(ok00 | ok10, iy, _BIG))
    rymin = jnp.minimum(rymin, jnp.min(
        jnp.where(ok01 | ok11, iy + 1, _BIG)))
    rymax = jnp.max(jnp.where(ok01 | ok11, iy + 1, -1))
    rymax = jnp.maximum(rymax, jnp.max(jnp.where(ok00 | ok10, iy, -1)))
    del anyok

    if zpack is None:
        def fx_loop(dxi, accs):
            cx = rxmin + dxi

            def fy_loop(dyi, acc8):
                cy = rymin + dyi
                crow = cx * d2 + cy
                rowv = vol_ref[pl.ds(crow, 1), :]
                bc = jnp.broadcast_to(rowv, (E, 128))
                gz = jnp.take_along_axis(bc, lz, axis=1)
                gz1 = jnp.take_along_axis(bc, lz1, axis=1)
                return (
                    jnp.where(row00 == crow, gz, acc8[0]),
                    jnp.where(row00 == crow, gz1, acc8[1]),
                    jnp.where(row01 == crow, gz, acc8[2]),
                    jnp.where(row01 == crow, gz1, acc8[3]),
                    jnp.where(row10 == crow, gz, acc8[4]),
                    jnp.where(row10 == crow, gz1, acc8[5]),
                    jnp.where(row11 == crow, gz, acc8[6]),
                    jnp.where(row11 == crow, gz1, acc8[7]),
                )

            return jax.lax.fori_loop(0, rymax - rymin + 1, fy_loop, accs)

        zeros8 = tuple(jnp.zeros((E, 128), _f32) for _ in range(8))
        c = jax.lax.fori_loop(0, jnp.maximum(rxmax - rxmin + 1, 0),
                              fx_loop, zeros8)
    else:
        # ---- 10-bit packed fetch: row per (x, y-group), three z per
        # word.  Small // divisions take the +-1 floor correction (Mosaic
        # lowers vector i32 division through f32 reciprocals).
        zw, ypack, nyg = zpack
        q_min = scal_ref[26]
        q_step = scal_ref[27]
        corners = ((0, row00, ok00), (1, row01, ok01),
                   (0, row10, ok10), (1, row11, ok11))
        taps = []
        for ci_idx, (oy, rowf, ok) in enumerate(corners):
            cxv = ix + (0 if ci_idx < 2 else 1)
            cyv = jnp.where(ok, iy + oy, 0)
            g = cyv // ypack
            g = jnp.where(cyv >= (g + 1) * ypack, g + 1, g)
            g = jnp.where(cyv < g * ypack, g - 1, g)
            base_lane = (cyv - g * ypack) * zw
            growid = jnp.where(ok, cxv * nyg + g, -1)
            for lzv in (lz, lz1):
                zi = lzv // 3
                zi = jnp.where(lzv >= (zi + 1) * 3, zi + 1, zi)
                zi = jnp.where(lzv < zi * 3, zi - 1, zi)
                lane = jnp.where(ok, base_lane + zi, 0)
                shift = (lzv - zi * 3) * 10
                taps.append((growid, lane, shift, g))

        # Group bounds from RAW iy / iy+1 under the union masks — exactly
        # mirroring how rymin/rymax use raw ix/iy above.  Deriving them
        # from the per-corner ok-zeroed cyv (as the taps do for their own
        # lane math) loses the true g(iy) for lanes where only the x+1
        # corners are valid (ix == -1 entry-face band): pg_loop would
        # skip the row group and the valid x=0 corners would fetch 0.
        def _grp(y):
            g = y // ypack
            g = jnp.where(y >= (g + 1) * ypack, g + 1, g)
            g = jnp.where(y < g * ypack, g - 1, g)
            return g

        gy = _grp(iy)
        gy1 = _grp(iy + 1)
        gmin = jnp.min(jnp.where(ok00 | ok10, gy, _BIG))
        gmin = jnp.minimum(gmin, jnp.min(
            jnp.where(ok01 | ok11, gy1, _BIG)))
        gmax = jnp.max(jnp.where(ok01 | ok11, gy1, -1))
        gmax = jnp.maximum(gmax, jnp.max(
            jnp.where(ok00 | ok10, gy, -1)))
        nrows_grid = vol_ref.shape[0]

        def px_loop(dxi, accs):
            cx = rxmin + dxi

            def pg_loop(dgi, accs):
                cg = gmin + dgi
                crow = cx * nyg + cg
                crowc = jnp.clip(crow, 0, nrows_grid - 1)
                rowv = vol_ref[pl.ds(crowc, 1), :]
                bc = jnp.broadcast_to(rowv, (E, 128))
                out = []
                for acc, (growid, lane, shift, _) in zip(accs, taps):
                    wrd = jnp.take_along_axis(bc, lane, axis=1)
                    q = jax.lax.shift_right_logical(wrd, shift) & 1023
                    out.append(jnp.where(growid == crow, q, acc))
                return tuple(out)

            return jax.lax.fori_loop(0, gmax - gmin + 1, pg_loop, accs)

        zeros8i = tuple(jnp.zeros((E, 128), _i32) for _ in range(8))
        qs = jax.lax.fori_loop(0, jnp.maximum(rxmax - rxmin + 1, 0),
                               px_loop, zeros8i)
        c = tuple(q.astype(_f32) * q_step + q_min for q in qs)

    okzf = okz.astype(_f32)
    okz1f = okz1.astype(_f32)
    vals = (
        c[0] * ok00.astype(_f32) * okzf, c[1] * ok00.astype(_f32) * okz1f,
        c[2] * ok01.astype(_f32) * okzf, c[3] * ok01.astype(_f32) * okz1f,
        c[4] * ok10.astype(_f32) * okzf, c[5] * ok10.astype(_f32) * okz1f,
        c[6] * ok11.astype(_f32) * okzf, c[7] * ok11.astype(_f32) * okz1f,
    )
    # trilinear_intensity_sample mix order: z, then y, then x
    c00 = vals[0] * (1 - fz) + vals[1] * fz
    c01 = vals[2] * (1 - fz) + vals[3] * fz
    c10 = vals[4] * (1 - fz) + vals[5] * fz
    c11 = vals[6] * (1 - fz) + vals[7] * fz
    c0m = c00 * (1 - fy) + c01 * fy
    c1m = c10 * (1 - fy) + c11 * fy
    v_tri = c0m * (1 - fx) + c1m * fx
    vn = v_tri / cal

    sig1, sig2, w = [], [], []
    for k in range(1, num_intervals):
        s1 = jax.nn.sigmoid(sharp * (vn - lower_ref[k]))
        s2 = jax.nn.sigmoid(sharp * (upper_ref[k] - vn))
        sig1.append(s1)
        sig2.append(s2)
        w.append(s1 * s2)

    rgba = [jnp.zeros((E, 128), _f32) + colors_ref[0, ch] for ch in range(4)]
    for k in range(1, num_intervals):
        dk = [colors_ref[k, ch] - colors_ref[0, ch] for ch in range(4)]
        for ch in range(4):
            rgba[ch] = rgba[ch] + w[k - 1] * dk[ch]
    return rgba, vn, sig1, sig2, w


def _smooth_fwd_kernel(scal_ref, lower_ref, upper_ref, colors_ref, vol_ref,
                       out_r_ref, out_g_ref, out_b_ref, out_t_ref,
                       *, dims, num_intervals, width, height, spr, conic,
                       tile, zpack=None):
    tpx, tpy, steps = tile
    RT = (tpx * tpy) // 128
    nchunks = -(-spr // steps)
    eps = scal_ref[3]
    o, d, s_idx, pix_ok = _ray_setup(scal_ref, conic, width, height, tile)

    def chunk_body(carry):
        ci, cr, cg, cb, t = carry
        rgba, _, _, _, _ = _sample_smooth(
            scal_ref, lower_ref, upper_ref, colors_ref, vol_ref,
            o, d, s_idx, pix_ok, ci, dims, num_intervals, tile, zpack)
        sr, sg, sb, sa = rgba
        for s in range(steps):
            lo = RT * s
            a_s = sa[lo:lo + RT, :]
            if spr % steps:
                gate = ((ci * steps + s) < spr).astype(_f32)
                a_s = a_s * gate
            w_s = t * a_s
            cr = cr + w_s * sr[lo:lo + RT, :]
            cg = cg + w_s * sg[lo:lo + RT, :]
            cb = cb + w_s * sb[lo:lo + RT, :]
            t = t * (1.0 - a_s)
        return ci + 1, cr, cg, cb, t

    def chunk_cond(carry):
        ci, _, _, _, t = carry
        return (ci < nchunks) & (jnp.max(t) > eps)

    zeros = jnp.zeros((RT, 128), _f32)
    ones = jnp.ones((RT, 128), _f32)
    _, cr, cg, cb, t = jax.lax.while_loop(
        chunk_cond, chunk_body,
        (jnp.asarray(0, _i32), zeros, zeros, zeros, ones))
    out_r_ref[0, 0] = cr
    out_g_ref[0, 0] = cg
    out_b_ref[0, 0] = cb
    out_t_ref[0, 0] = t


def _smooth_bwd_kernel(scal_ref, lower_ref, upper_ref, colors_ref, vol_ref,
                       g_r_ref, g_g_ref, g_b_ref, g_t_ref,
                       dcol_ref, dvn_ref,
                       *, dims, num_intervals, width, height, spr, conic,
                       krows, tile, zpack=None):
    """Two-pass backward: per-tile [krows, 128] gradient rows (columns
    0-3 = dL/dcolors, 4 = dL/dlower, 5 = dL/dupper) + the per-sample
    dL/dvn field [nchunks*E, 128] for the XLA trilinear-adjoint splat."""
    tpx, tpy, steps = tile
    RT = (tpx * tpy) // 128
    E = RT * steps
    nchunks = -(-spr // steps)
    o, d, s_idx, pix_ok = _ray_setup(scal_ref, conic, width, height, tile)
    sharp = scal_ref[4]

    g_r = g_r_ref[0, 0]
    g_g = g_g_ref[0, 0]
    g_b = g_b_ref[0, 0]
    g_t = g_t_ref[0, 0]
    gr4 = jnp.concatenate([g_r] * steps, axis=0)
    gg4 = jnp.concatenate([g_g] * steps, axis=0)
    gb4 = jnp.concatenate([g_b] * steps, axis=0)

    def sample(ci):
        rgba, vn, sig1, sig2, w = _sample_smooth(
            scal_ref, lower_ref, upper_ref, colors_ref, vol_ref,
            o, d, s_idx, pix_ok, ci, dims, num_intervals, tile, zpack)
        sr, sg, sb, sa = rgba
        live = ((ci * steps + s_idx) < spr).astype(_f32)
        sa = sa * live
        gdotc = gr4 * sr + gg4 * sg + gb4 * sb
        return sa, gdotc, (sr, sg, sb), vn, sig1, sig2, w, live

    # ---- pass A: totals -------------------------------------------------
    def pass_a(ci, carry):
        t, tot = carry
        a_all, gdotc_all, _, _, _, _, _, _ = sample(ci)
        for s in range(steps):
            sl = slice(RT * s, RT * s + RT)
            a = a_all[sl]
            tot = tot + (t * a) * gdotc_all[sl]
            t = t * (1.0 - a)
        return t, tot

    ones = jnp.ones((RT, 128), _f32)
    zeros = jnp.zeros((RT, 128), _f32)
    t_final, total = jax.lax.fori_loop(0, nchunks, pass_a, (ones, zeros))
    bg_term = t_final * g_t

    row_i = _iota(0, krows)
    col_i = _iota(1, krows)

    # ---- pass B: per-sample grads + scatter rows ------------------------
    def pass_b(ci, carry):
        t, pfx, dc = carry
        a_all, gdotc_all, (sr, sg, sb), vn, sig1, sig2, w, live = sample(ci)
        w_list, da_list = [], []
        for s in range(steps):
            sl = slice(RT * s, RT * s + RT)
            a = a_all[sl]
            gd = gdotc_all[sl]
            ws = t * a
            pfx = pfx + ws * gd
            suffix = total - pfx
            denom = 1.0 - a
            num = suffix + bg_term
            da = t * gd - jnp.where(denom != 0.0, num / denom, 0.0)
            w_list.append(ws)
            da_list.append(da)
            t = t * denom
        w_all = jnp.concatenate(w_list, axis=0)
        da_all = jnp.concatenate(da_list, axis=0) * live

        # dL/d(w_k), then vn / bounds / color chains
        dvn = jnp.zeros((E, 128), _f32)
        wsum = jnp.zeros((E, 128), _f32)
        for k in range(1, num_intervals):
            dkr = colors_ref[k, 0] - colors_ref[0, 0]
            dkg = colors_ref[k, 1] - colors_ref[0, 1]
            dkb = colors_ref[k, 2] - colors_ref[0, 2]
            dka = colors_ref[k, 3] - colors_ref[0, 3]
            dLdw = (w_all * (gr4 * dkr + gg4 * dkg + gb4 * dkb)
                    + da_all * dka)
            wk = w[k - 1]
            s1 = sig1[k - 1]
            s2 = sig2[k - 1]
            # dw/dvn = s * w * (s2 - s1) ... careful: derivation gives
            # s*w*((1-s1) - (1-s2)) = s*w*(s2 - s1)
            dvn = dvn + dLdw * sharp * wk * (s2 - s1)
            wsum = wsum + wk
            dlo = jnp.sum(dLdw * (-sharp) * wk * (1.0 - s1))
            dhi = jnp.sum(dLdw * (-sharp) * wk * (1.0 - s2) * (-1.0))
            # color grads: dL/dcol_k = sum_s w_k(s) * (w_s g | da_s)
            dr = jnp.sum(wk * w_all * gr4 * live)
            dg = jnp.sum(wk * w_all * gg4 * live)
            db = jnp.sum(wk * w_all * gb4 * live)
            dal = jnp.sum(wk * da_all)
            upd = jnp.where(
                col_i == 0, dr,
                jnp.where(col_i == 1, dg,
                          jnp.where(col_i == 2, db,
                                    jnp.where(col_i == 3, dal,
                                              jnp.where(col_i == 4, dlo,
                                                        jnp.where(col_i == 5,
                                                                  dhi,
                                                                  0.0))))))
            dc = dc + jnp.where(row_i == k, upd, 0.0)
        # base color (interval 0): coefficient (1 - sum_k w_k)
        base = 1.0 - wsum
        dr0 = jnp.sum(base * w_all * gr4 * live)
        dg0 = jnp.sum(base * w_all * gg4 * live)
        db0 = jnp.sum(base * w_all * gb4 * live)
        da0 = jnp.sum(base * da_all)
        upd0 = jnp.where(
            col_i == 0, dr0,
            jnp.where(col_i == 1, dg0,
                      jnp.where(col_i == 2, db0,
                                jnp.where(col_i == 3, da0, 0.0))))
        dc = dc + jnp.where(row_i == 0, upd0, 0.0)

        dvn_ref[0, pl.ds(ci * E, E), :] = dvn * live
        return t, pfx, dc

    _, _, dc = jax.lax.fori_loop(
        0, nchunks, pass_b,
        (ones, zeros, jnp.zeros((krows, 128), _f32)))
    dcol_ref[0, 0] = dc


def _splat_volume_grad(dvn_tiles, tile, camera, config, volume_dims,
                       cal_max):
    """XLA epilogue: trilinear-adjoint scatter of the per-sample dL/dvn
    field into the volume cotangent, `lax.scan` over sample chunks."""
    d1, d2, d3 = volume_dims
    tpx, tpy, steps = tile
    nrays = tpx * tpy
    E = nrays * steps // 128
    w, h = config.width, config.height
    ntx = -(-w // tpx)
    nty = -(-h // tpy)
    nchunks = -(-config.samples_per_ray // steps)

    # static slot-decode arrays for the [E, 128] register layout
    e = np.arange(E)[:, None] * 128 + np.arange(128)[None, :]
    s_idx = (e // nrays).astype(np.int32)  # step within chunk
    f = e % nrays
    u = (f // tpy).astype(np.int32)
    v = (f % tpy).astype(np.int32)
    px = (np.arange(ntx)[:, None, None, None] * tpx
          + u[None, None]).astype(np.float32)  # [ntx,1,E,128]
    py = (np.arange(nty)[None, :, None, None] * tpy
          + v[None, None]).astype(np.float32)  # [1,nty,E,128]
    px = jnp.asarray(np.broadcast_to(px, (ntx, nty, E, 128)))
    py = jnp.asarray(np.broadcast_to(py, (ntx, nty, E, 128)))
    s_idx = jnp.asarray(np.broadcast_to(s_idx[None, None],
                                        (ntx, nty, E, 128)))

    rsw = np.float32(config.real_screen_width)
    rsh = np.float32(config.real_screen_height)
    xt = ((px * rsw) / np.float32(w))[..., None] * camera.right
    yt = ((py * rsh) / np.float32(h))[..., None] * (-camera.up)
    top_left = camera.top_left
    if config.conic and config.conic_corrected:
        top_left = top_left + jnp.asarray(
            config.viewplane_distance, _f32) * camera.front
    if config.conic:
        o = jnp.broadcast_to(camera.position, xt.shape)
        rd = top_left + xt + yt - camera.position
        dvec = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    else:
        o = (top_left + xt) + yt
        dvec = jnp.broadcast_to(camera.front, xt.shape)

    L = np.float32(max(volume_dims))
    voff = jnp.asarray([dims_c / 2.0 - L / 2.0 for dims_c in volume_dims],
                       _f32)
    ds = np.float32(config.sample_distance)
    clip = np.float32(config.front_clip)

    dvn_tiles = dvn_tiles.reshape(ntx, nty, nchunks, E, 128)

    # one fused scatter for small workloads (fewer XLA scatter launches:
    # measured faster than the chunked scan at fit scales); the chunked
    # scan bounds memory for big renders
    single = ntx * nty * nchunks * E * 128 <= 4_000_000

    def corner_updates(ci):
        """(flats [8, N], vals [8, N]) for chunk ci's trilinear adjoint."""
        i_f = (ci * steps + s_idx).astype(_f32)
        ti = i_f * ds + clip
        vox = ((o + ti[..., None] * dvec) + 0.5) * L + voff
        b = jnp.floor(vox)
        fr = vox - b
        bi = b.astype(_i32)
        dvn = dvn_tiles[:, :, ci] / cal_max  # chain vn = v_tri / cal
        flats, vals = [], []
        for ox in (0, 1):
            wx = fr[..., 0] if ox else (1.0 - fr[..., 0])
            cx = bi[..., 0] + ox
            for oy in (0, 1):
                wy = fr[..., 1] if oy else (1.0 - fr[..., 1])
                cy = bi[..., 1] + oy
                for oz in (0, 1):
                    wz = fr[..., 2] if oz else (1.0 - fr[..., 2])
                    cz = bi[..., 2] + oz
                    ok = ((cx >= 0) & (cx < d1) & (cy >= 0) & (cy < d2)
                          & (cz >= 0) & (cz < d3))
                    flat = (jnp.clip(cx, 0, d1 - 1) * (d2 * d3)
                            + jnp.clip(cy, 0, d2 - 1) * d3
                            + jnp.clip(cz, 0, d3 - 1))
                    val = jnp.where(ok, dvn * wx * wy * wz, 0.0)
                    flats.append(flat.reshape(-1))
                    vals.append(val.reshape(-1))
        return jnp.stack(flats), jnp.stack(vals)

    acc0 = jnp.zeros((d1 * d2 * d3,), _f32)
    if single:
        flats, vals = jax.vmap(corner_updates)(
            jnp.arange(nchunks, dtype=_i32))
        acc = acc0.at[flats.reshape(-1)].add(vals.reshape(-1))
    else:
        def chunk(acc, ci):
            flats, vals = corner_updates(ci)
            return acc.at[flats.reshape(-1)].add(vals.reshape(-1)), None

        acc, _ = jax.lax.scan(chunk, acc0, jnp.arange(nchunks, dtype=_i32))
    return acc.reshape(d1, d2, d3)


@functools.lru_cache(maxsize=32)
def _make_smooth_core(dims, num_intervals, width, height, spr, conic,
                      rows, interpret, tile, zpack=None):
    tpx, tpy, steps = tile
    RT = (tpx * tpy) // 128
    E = RT * steps
    ntx = -(-width // tpx)
    nty = -(-height // tpy)
    nchunks = -(-spr // steps)
    krows = 8 if num_intervals <= 8 else 16

    fwd_kernel = functools.partial(
        _smooth_fwd_kernel, dims=dims, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=conic, tile=tile,
        zpack=zpack)
    bwd_kernel = functools.partial(
        _smooth_bwd_kernel, dims=dims, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=conic, krows=krows,
        tile=tile, zpack=zpack)

    fwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntx, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
            pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RT, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )
    tile_shape = [jax.ShapeDtypeStruct((ntx, nty, RT, 128), _f32)
                  for _ in range(4)]

    bwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntx, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, 1, RT, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, krows, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchunks * E, 128), lambda i, j: (i * nty + j,
                                                              0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def forward_tiles(colors, lower, upper, scal, vol_rows):
        return tuple(pl.pallas_call(
            fwd_kernel,
            grid_spec=fwd_grid_spec,
            out_shape=tile_shape,
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows))

    def backward_tiles(colors, lower, upper, scal, vol_rows, g):
        return pl.pallas_call(
            bwd_kernel,
            grid_spec=bwd_grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((ntx, nty, krows, 128), _f32),
                jax.ShapeDtypeStruct((ntx * nty, nchunks * E, 128), _f32),
            ],
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows, *g)

    return forward_tiles, backward_tiles, krows


def smooth_f32_feasible(dims) -> bool:
    """f32-row layout: z <= 128 and the rows within the 12 MB budget."""
    return (dims[2] <= 128
            and _pad_to(dims[0] * dims[1], 8) * 128 * 4 <= 12 * 2**20)


def smooth_packed_geometry(dims) -> Tuple[int, int, int] | None:
    """(zw, ypack, nyg) for the 10-bit quantized intensity grid (three
    z-values per i32 word, ``ypack`` y-columns per row), or None when it
    cannot apply (z > 384 or rows beyond the 12 MB budget).  MNI-1mm
    182x218x182: (61, 2, 109) -> 10.2 MB (vs 20.3 MB f32 — VERDICT r3
    item 4's smooth-mode scale cliff)."""
    d1, d2, d3 = dims
    zw = -(-d3 // 3)
    if zw > 128:
        return None
    ypack = min(128 // zw, d2)
    nyg = -(-d2 // ypack)
    if _pad_to(d1 * nyg, 8) * 128 * 4 > 12 * 2**20:
        return None
    return zw, ypack, nyg


def pack_smooth10(data3d: jnp.ndarray, zp: Tuple[int, int, int],
                  q_min: jnp.ndarray, q_step: jnp.ndarray) -> jnp.ndarray:
    """Quantize intensities to 10 bits (affine [q_min, q_min + 1023 *
    q_step]) and pack three z-values per i32 word in the (zw, ypack,
    nyg) row layout (see _sample_smooth's zpack fetch)."""
    zw, ypack, nyg = zp
    d1, d2, d3 = data3d.shape
    q = jnp.clip(jnp.round((data3d - q_min) / q_step), 0, 1023).astype(_i32)
    q = jnp.pad(q, ((0, 0), (0, nyg * ypack - d2), (0, zw * 3 - d3)))
    shifts = jnp.arange(3, dtype=_i32) * 10
    words = jnp.sum(
        jnp.left_shift(q.reshape(d1, nyg, ypack, zw, 3), shifts), axis=-1
    ).astype(_i32)
    rows = _pad_to(d1 * nyg, 8)
    grid = jnp.zeros((rows, 128), _i32)
    return grid.at[: d1 * nyg, : ypack * zw].set(
        words.reshape(d1 * nyg, ypack * zw))


def smooth_pallas_eligible(volume: Volume, tf: TransferFunction,
                           config: RenderConfig) -> bool:
    """Static predicate for the fused smooth-mode diff kernels: f32 rows
    (z <= 128, 12 MB) or the 10-bit packed grid (z <= 384, MNI-1mm)."""
    return (
        jax.default_backend() == "tpu"
        and volume.channels == 1
        and (smooth_f32_feasible(volume.dims)
             or smooth_packed_geometry(volume.dims) is not None)
        and config.interp is Interp.TRILINEAR
        and tf.num_intervals <= 16
        and config.density_scale == 1.0  # fold density externally
        and not config.lighting
        and not config.scattering
        and not config.tf_lut
    )


def render_vrc_smooth_pallas(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    tile: Tuple[int, int, int] | None = None,
    early_eps: float | None = None,
    volume_grad: bool = True,
) -> jnp.ndarray:
    """Smooth-mode a1 render -> [W, H, 4], differentiable w.r.t. the TF
    colors AND interval bounds AND the volume data through fused Pallas
    forward/backward kernels (+ an XLA trilinear-adjoint splat for the
    volume cotangent).

    ``volume_grad=False`` (round-4 VERDICT item 10) guarantees the
    adjoint splat — the scatter-bound ~6 ns/index floor of full smooth
    fit steps (DESIGN §4c) — is never built: the volume enters as a
    constant and only TF colors/bounds receive gradients.  TF/bound-only
    fits (diff/fit.py — FitParams has no volume field) use this mode.

    Value-identical (<= ~1e-5) to ``render_vrc(..., mode="fast")`` with
    ``config.interp = TRILINEAR`` **when the f32 row layout is selected**
    (z <= 128); when ``smooth_packed_geometry`` routes larger volumes
    through the 10-bit packed grid, each tap carries a quantization
    error of ~(data range)/1023/2 (~5e-4 of cal_max — onchip parity uses
    2e-2 on the image).  Gradients match ``jax.grad`` through the XLA
    scan (of the same — possibly quantized — forward model).  A static ``config.density_scale`` is not supported —
    fold density into the alpha column externally (diff/fit.py does).

    ``early_eps`` overrides ``config.early_termination`` for the forward
    march.  NOTE: the forward's early termination is value-exact to
    within eps, but the backward passes re-march all chunks
    unconditionally, so with eps > 0 the gradients correspond to the
    un-terminated render (mismatch bounded by eps).  Training callers
    should pass ``early_eps=0.0`` for exact forward/backward agreement
    (diff/fit.py does)."""
    d1, d2, d3 = volume.dims
    if volume.channels != 1:
        raise ValueError("smooth pallas path supports single-channel volumes")
    if config.interp is not Interp.TRILINEAR:
        raise ValueError("smooth pallas path is Interp.TRILINEAR only")
    # f32 rows when they fit; the 10-bit packed grid otherwise (z <= 384)
    zpack = None
    if not smooth_f32_feasible(volume.dims):
        zpack = smooth_packed_geometry(volume.dims)
        if zpack is None:
            raise ValueError(
                f"smooth pallas path: dims {volume.dims} fit neither the "
                "f32 rows (z <= 128, 12 MB) nor the 10-bit packed grid "
                "(z <= 384); use the XLA renderer")
    if tf.num_intervals > 16:
        raise ValueError("smooth pallas path supports at most 16 intervals")
    if config.density_scale != 1.0:
        raise ValueError(
            "fold density_scale into the TF alpha column for the smooth "
            "pallas path (see diff/fit.py)")
    if config.lighting or config.scattering or config.tf_lut:
        raise ValueError(
            "smooth pallas path is the plain smooth classify (no "
            "lighting/scattering/LUT); use the XLA renderer")

    w, h = config.width, config.height
    rows = _pad_to(d1 * (d2 if zpack is None else zpack[2]), 8)
    if tile is None:
        # on-chip sweep (tpu_round4_results r4f_*): 16x16 rays x 16 steps
        # beats the legacy (16, 16, 4) 1.7x on forward, 1.35x on the
        # volume-grad step at 128^3/128^2
        tile = (TILE_PX, TILE_PY, 16)
    tpx, tpy, steps = tile
    if (tpx * tpy) % 128 or (tpx * tpy * steps) % 1024:
        raise ValueError(f"tile {tile}: rays must fill 128-lane rows and "
                         "rays*steps must fill full registers")

    top_left = camera.top_left
    if config.conic and config.conic_corrected:
        top_left = top_left + jnp.asarray(
            config.viewplane_distance, _f32) * camera.front

    L = float(max(volume.dims))
    scal = jnp.concatenate([
        jnp.asarray([config.sample_distance, config.front_clip], _f32),
        jnp.asarray(volume.cal_max, _f32).reshape(1),
        jnp.asarray([config.early_termination if early_eps is None
                     else early_eps, config.tf_sharpness], _f32),
        camera.position.astype(_f32),
        camera.front.astype(_f32),
        camera.right.astype(_f32),
        camera.up.astype(_f32),
        top_left.astype(_f32),
        jnp.asarray([config.real_screen_width, config.real_screen_height],
                    _f32),
        jnp.asarray([volume.dims[c] / 2.0 - L / 2.0 for c in range(3)],
                    _f32),
        jnp.asarray([L], _f32),
    ])

    forward_tiles, backward_tiles, krows = _make_smooth_core(
        volume.dims, tf.num_intervals, w, h, config.samples_per_ray,
        bool(config.conic), rows, bool(interpret), tile, zpack)

    def _stage(scal_, data3d):
        """(vol_rows, scal + quant affine).  The packed grid quantizes to
        the CURRENT data range — recomputed per step in volume-field
        fits, so forward and backward always share one grid."""
        if zpack is None:
            vol_rows = jnp.zeros((rows, 128), _f32).at[
                : d1 * d2, :d3].set(data3d.reshape(d1 * d2, d3))
            return vol_rows, scal_
        q_min = jnp.min(data3d)
        rng_ = jnp.max(data3d) - q_min
        q_step = jnp.where(rng_ > 0, rng_ / 1023.0, 1.0)
        vol_rows = pack_smooth10(data3d, zpack, q_min, q_step)
        return vol_rows, jnp.concatenate(
            [scal_, q_min[None], q_step[None]])

    def _bwd_common(colors, lower, upper, scal_, data3d, g):
        vol_rows, scal2 = _stage(scal_, data3d)
        dcol_tiles, dvn_tiles = backward_tiles(
            colors, lower, upper, scal2, vol_rows, g)
        summed = dcol_tiles.sum(axis=(0, 1))
        k = tf.num_intervals
        return summed[:k, :4], summed[:k, 4], summed[:k, 5], dvn_tiles

    if volume_grad:
        @jax.custom_vjp
        def core(colors, lower, upper, scal_, data3d):
            vol_rows, scal2 = _stage(scal_, data3d)
            return forward_tiles(colors, lower, upper, scal2, vol_rows)

        def core_fwd(colors, lower, upper, scal_, data3d):
            return (core(colors, lower, upper, scal_, data3d),
                    (colors, lower, upper, scal_, data3d))

        def core_bwd(res, g):
            colors, lower, upper, scal_, data3d = res
            dcolors, dlower, dupper, dvn_tiles = _bwd_common(
                colors, lower, upper, scal_, data3d, g)
            dvol = _splat_volume_grad(
                dvn_tiles, tile, camera, config, volume.dims,
                jnp.asarray(volume.cal_max, _f32))
            return (dcolors, dlower, dupper, jnp.zeros_like(scal_), dvol)

        core.defvjp(core_fwd, core_bwd)
        cr, cg, cb, t = core(tf.colors, tf.lower, tf.upper, scal,
                             volume.data.reshape(volume.dims))
    else:
        data_const = jax.lax.stop_gradient(
            volume.data.reshape(volume.dims))

        @jax.custom_vjp
        def core_nv(colors, lower, upper, scal_):
            vol_rows, scal2 = _stage(scal_, data_const)
            return forward_tiles(colors, lower, upper, scal2, vol_rows)

        def core_nv_fwd(colors, lower, upper, scal_):
            return (core_nv(colors, lower, upper, scal_),
                    (colors, lower, upper, scal_))

        def core_nv_bwd(res, g):
            colors, lower, upper, scal_ = res
            dcolors, dlower, dupper, _ = _bwd_common(
                colors, lower, upper, scal_, data_const, g)
            return (dcolors, dlower, dupper, jnp.zeros_like(scal_))

        core_nv.defvjp(core_nv_fwd, core_nv_bwd)
        cr, cg, cb, t = core_nv(tf.colors, tf.lower, tf.upper, scal)

    ntx = -(-w // tpx)
    nty = -(-h // tpy)

    def unpack(a):
        a = a.reshape(ntx, nty, tpx, tpy)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * tpx, nty * tpy)
        return a[:w, :h]

    bg = jnp.asarray(config.background, _f32)
    t2 = unpack(t)
    rgb = [unpack(c) + t2 * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)
