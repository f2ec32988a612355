"""Fused Pallas TPU kernel for the a5/TEST direct-trilinear pipeline.

One kernel fuses the reference's a5 frame (getColorFromNF kernel.cu:72-187
+ blendSampleColors kernel.cu:194-225): per 16x16-pixel tile it builds the
camera-space sample grid, pushes it through the three stage matrices
(modelCam -> inverseView -> toVolumeTransform, kernel.cu:1177-1217),
fetches the 8 corner voxels, classifies each corner through the transfer
function, trilinearly interpolates the *colors* (y->x->z mix order,
kernel.cu:161-175), and front-to-back composites — no W*H*spr sample
buffer, no HBM round trips between stages.

Same register scheme as the a1 kernel (ops/pallas_march.py): the volume
lives in VMEM as rows [d1*d2 (+wrap margin), 128] with z on lanes; each
loop iteration marches 4 consecutive samples of 256 rays as one [8,128]
register; voxel fetch loops over the tile-chunk's (x, y) row footprint
(extended +1 for the corner taps) with one VMEM row read + two lane
gathers (z and z+1) + eight row-id selects per row.

Reference quirks replicated (matching models/raycast.render_test +
ops/sampling.trilinear_color_sample expression for expression):

  * corner indices are per-axis truncations of pos + offset in FLOAT
    (kernel.cu:129-159) — ix1 = trunc(x+1), not trunc(x)+1;
  * the only corner bound guard is ``flat < totaldim``, so a z+1 tap at
    z == d3-1 WRAPS into the next row's first voxel — the row staging
    stores that neighbor in lane d3 so the wrap reproduces exactly;
  * normalization uses the FLOAT header cal_max (a1 truncates it to int,
    kernel.cu:42; a5 does not — see PARITY.md C4);
  * samples outside [0, dims) get TF(0)'s color (kernel.cu:117).

Early ray termination (chunk loop stops when every ray's transmittance
is below ``early_eps``) is this kernel's only skip: a5 has no
octree/empty-space structure in the reference either, and its default
materials are opaque enough (alpha .3-.7 per sample) that termination
alone removes most of the march.
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
from ..utils.config import RenderConfig
from ..utils import transforms as T
from .pallas_march import STEPS, TILE_PX, TILE_PY, _BIG, _iota, _pad_to

# default a5 chunk depth (samples per [E=2*steps, 128] register chunk).
# Round-5 on-chip sweep (/tmp and DESIGN §8e): 4 -> 16 steps is
# value-IDENTICAL (per-sample in-order math) and amortizes the
# per-chunk scalar bounds/loop fixed costs: MNI-1mm unlit 92.4 -> 71.9
# ms, lit 271.6 -> 195.9 ms, 512^3 id-stream 2100 -> 1736 ms.
A5_STEPS = 16

_f32 = jnp.float32
_i32 = jnp.int32


def _a5_kernel(
    # SMEM
    scal_ref,  # [24] f32: stage-matrix + config scalars (see layout below)
    tf_lower_ref,  # [K]
    tf_upper_ref,  # [K]
    tf_colors_ref,  # [K, 4]
    # VMEM
    vol_ref,  # [rows, 128] volume rows, z on lanes, +wrap margin
    *rest,  # [mg_ref, sg_ref (baked_light)] out_r/g/b/t_ref [1, 1, 2, 128]
    dims: Tuple[int, int, int],
    num_intervals: int,
    width: int,
    height: int,
    spr: int,
    baked_light: bool = False,
    zpack: Tuple[int, int, int] | None = None,
    local_width: int | None = None,
    ms_stream: bool = False,
    ms_nzr: int = 1,
    ms_brm: int = 0,
    nxb: int = 0,
    block_x: int = 0,
    id_stream: bool = False,
    id_brm: int = 0,
    steps: int = STEPS,
):
    """``baked_light``: Blinn-Phong on the containing voxel's gradient
    normal (models/raycast._a5_sample_fn lit branch) via per-voxel (M, S)
    factor grids baked in XLA (ops/pallas_march.bake_light_grids) — exact
    for ANY a5 camera because the a5 view direction is the camera front
    for every ray (kernel.cu:1190; raycast.py view_dir = -camera.front).

    ``zpack`` (zw, ypack, nyg): packed mode — ``vol_ref`` holds 4-bit
    per-voxel TF-interval ids (a5_pack_id_grid: z-major incl. the z-wrap
    slot at index d3, ``ypack`` y-columns per 128-lane row).  Lifts the
    z <= 127 f32 limit to z <= 1023 (MNI-1mm-class a5, VERDICT item 3);
    exact because the a5 classify is per-CORNER, so corner ids + the color
    table reproduce corner colors bit-for-bit, including the flat-index
    wraps (a y-wrap normalizes through rid // d2 before the group
    decomposition; the z-wrap reads the packed slot at z == d3).

    ``ms_stream`` (packed mode): LIT/SCATTERED packed a5 (VERDICT r3
    item 2, the MNI-1mm-class default dataset).  The u8-quantized (M, S)
    factor pack (ops/pallas_march.pack_ms_grid) cannot fit VMEM at
    182x218x182 (2 B/voxel = 14.4 MB + the 4.1 MB id grid), so it stays
    in HBM and streams per x-block with double-buffered manual DMA —
    legal because a5's sample x is AFFINE in the sample index with a
    shared per-frame slope (x = A_ray + B*i, B = iv[0][2]*s3*L for every
    ray), so each ray's samples cross blocks monotonically and per-block
    (C, T) segments compose in one global visibility order, exactly like
    the a1 manual stream.  Each block marches only the chunk range its
    x-interval maps to (the inverse affine), shades owned samples from
    the block's (M, S) slot, and masks non-owned samples to the over
    identity.

    ``id_stream`` (packed mode, round-4 VERDICT item 4): the 4-bit id
    GRID ITSELF stays in HBM and streams per x-block through the same
    double-buffered manual-DMA block loop (512^3-class a5 renders, whose
    id grid exceeds the resident VMEM budget).  Each block's slot holds
    ``block_x + 1`` x planes (the corner taps reach x+1, one plane into
    the next block); ownership masks non-owned samples exactly as
    ms_stream does.  Composes with ms_stream (lit/scattered 512^3 a5 —
    both grids ride the same block index)."""
    rest = list(rest)
    ms_sem_ref = rest.pop() if ms_stream else None
    ms_bufs_ref = rest.pop() if ms_stream else None
    id_sem_ref = rest.pop() if id_stream else None
    id_bufs_ref = rest.pop() if id_stream else None
    mg_ref = rest.pop(0) if baked_light else None
    sg_ref = rest.pop(0) if baked_light else None
    ms_hbm_ref = rest.pop(0) if ms_stream else None
    out_r_ref, out_g_ref, out_b_ref, out_t_ref = rest
    d1, d2, d3 = dims
    total = d1 * d2 * d3
    # ``steps`` samples march per [E, 128] register chunk (256 rays/tile;
    # E = 2*steps sublane rows).  Deeper chunks amortize the per-chunk
    # scalar bounds/loop fixed costs — the value math is per-sample and
    # in-order, so results are IDENTICAL for any depth.
    E = 2 * steps
    nchunks = -(-spr // steps)
    df = [np.float32(d) for d in dims]
    packed = zpack is not None
    if packed:
        zw, ypack, nyg = zpack

    s1 = scal_ref[0]  # real_screen_width / width
    s2 = scal_ref[1]  # real_screen_height / height
    s3 = scal_ref[2]  # -viewplane_distance / spr
    o1 = scal_ref[3]  # -real_screen_width / 2
    o2 = scal_ref[4]  # -real_screen_height / 2
    cal = scal_ref[5]  # float cal_max (a5 keeps the header float, PARITY C4)
    eps = scal_ref[6]
    iv = [[scal_ref[7 + 4 * r + c] for c in range(4)] for r in range(3)]
    m3 = [scal_ref[19 + c] for c in range(3)]  # toVolume translation (baked)
    L = scal_ref[22]
    x_off_i = scal_ref[24].astype(_i32)  # ray-column offset (segments)
    s_start_i = scal_ref[25].astype(_i32)  # global index of local sample 0
    lw = width if local_width is None else local_width

    tx = pl.program_id(0)
    ty = pl.program_id(1)

    # ---- slot decode (shared scheme with _march_kernel) -----------------
    e = _iota(0, E) * 128 + _iota(1, E)
    s_idx = e // 256
    f = e % 256
    u = f // TILE_PY
    v = f % TILE_PY
    lxp = tx * TILE_PX + u  # local pixel column
    pxi = lxp + x_off_i  # the a5 grid is indexed by GLOBAL pixel coords
    pyi = ty * TILE_PY + v
    pix_ok = (lxp < lw) & (pyi < height)
    px = pxi.astype(_f32)
    py = pyi.astype(_f32)

    # modelCam apply (kernel.cu:1177-1192): scale then translate; the x/y
    # parts are i-independent, so the inverseView xy contribution hoists
    p1x = px * s1 + o1
    p1y = py * s2 + o2
    q = [p1x * iv[c][0] + p1y * iv[c][1] for c in range(3)]

    # TF(0) color for out-of-volume samples (kernel.cu:117): scalar
    # last-match-wins scan at intensity 0
    c0 = [tf_colors_ref[0, c] for c in range(4)]
    for k in range(num_intervals):
        m = (tf_lower_ref[k] <= 0.0) & (tf_upper_ref[k] >= 0.0)
        c0 = [jnp.where(m, tf_colors_ref[k, c], c0[c]) for c in range(4)]

    def classify(vn):
        """Ascending last-match-wins scan (TransferFunction.cu:46-55)."""
        out = [jnp.full((E, 128), tf_colors_ref[0, c], _f32) for c in range(4)]
        for k in range(num_intervals):
            m = (vn >= tf_lower_ref[k]) & (vn <= tf_upper_ref[k])
            for c in range(4):
                out[c] = jnp.where(m, tf_colors_ref[k, c], out[c])
        return out

    # ms_stream/id_stream: per-block march context, set by march_range
    # before each while_loop trace (chunk_body is re-traced per call, so
    # the cell's current values bind into that trace — no carry-threading)
    ms_cell = [None, None]  # [ms slot ref, block x0]
    id_cell = [None]  # [id slot ref] (block x0 shared via ms_cell[1])

    def chunk_body(carry):
        ci, cr, cg, cb, t = carry
        i_f = (s_start_i + ci * steps + s_idx).astype(_f32)
        p1z = i_f * s3
        p2 = [(q[c] + p1z * iv[c][2]) + iv[c][3] for c in range(3)]
        p3 = [p2[c] * L + m3[c] for c in range(3)]  # toVolume, baked affine

        inside = pix_ok
        for c in range(3):
            inside &= (p3[c] >= 0.0) & (p3[c] < df[c])

        # per-axis float truncation of pos and pos+1 (kernel.cu:129-159)
        ix = jnp.trunc(p3[0])
        iy = jnp.trunc(p3[1])
        iz = jnp.trunc(p3[2])
        ix1 = jnp.trunc(p3[0] + 1.0)
        iy1 = jnp.trunc(p3[1] + 1.0)
        iz1 = jnp.trunc(p3[2] + 1.0)
        fx = p3[0] - ix  # `difference` kernel.cu:127
        fy = p3[1] - iy
        fz = p3[2] - iz
        ixi, iyi, izi = [a.astype(_i32) for a in (ix, iy, iz)]
        ix1i, iy1i, iz1i = [a.astype(_i32) for a in (ix1, iy1, iz1)]

        valid = inside
        neg1 = jnp.full((E, 128), -1, _i32)
        rid00 = jnp.where(valid, ixi * d2 + iyi, neg1)
        rid01 = jnp.where(valid, ixi * d2 + iy1i, neg1)
        rid10 = jnp.where(valid, ix1i * d2 + iyi, neg1)
        rid11 = jnp.where(valid, ix1i * d2 + iy1i, neg1)
        rids = (rid00, rid01, rid10, rid11)

        # only-guard-is-flat<total, incl. the z-wrap (kernel.cu:129-159)
        flats = (
            rid00 * d3 + izi, rid00 * d3 + iz1i,
            rid01 * d3 + izi, rid01 * d3 + iz1i,
            rid10 * d3 + izi, rid10 * d3 + iz1i,
            rid11 * d3 + izi, rid11 * d3 + iz1i,
        )

        if not packed:
            lz = jnp.where(valid, jnp.clip(izi, 0, 127), 0)
            lz1 = jnp.where(valid, jnp.clip(iz1i, 0, 127), 0)

            rxmin = jnp.min(jnp.where(valid, ixi, _BIG))
            rymin = jnp.min(jnp.where(valid, iyi, _BIG))
            rxmax = jnp.max(jnp.where(valid, ix1i, -1))
            rymax = jnp.max(jnp.where(valid, iy1i, -1))

            # ---- fetch: one row read + 2 lane gathers + 8 selects/row --
            # (+2 reads/gathers for the baked shading factors at the
            # containing voxel, which is exactly corner 00's row/lane)
            def fx_loop(dxi, accs):
                cx = rxmin + dxi

                def fy_loop(dyi, accs):
                    acc8 = accs[:8]
                    cy = rymin + dyi
                    crow = cx * d2 + cy
                    rowv = vol_ref[pl.ds(crow, 1), :]
                    bc = jnp.broadcast_to(rowv, (E, 128))
                    gz = jnp.take_along_axis(bc, lz, axis=1)
                    gz1 = jnp.take_along_axis(bc, lz1, axis=1)
                    out = (
                        jnp.where(rid00 == crow, gz, acc8[0]),
                        jnp.where(rid00 == crow, gz1, acc8[1]),
                        jnp.where(rid01 == crow, gz, acc8[2]),
                        jnp.where(rid01 == crow, gz1, acc8[3]),
                        jnp.where(rid10 == crow, gz, acc8[4]),
                        jnp.where(rid10 == crow, gz1, acc8[5]),
                        jnp.where(rid11 == crow, gz, acc8[6]),
                        jnp.where(rid11 == crow, gz1, acc8[7]),
                    )
                    if baked_light:
                        # M/S rows have no wrap margin: clip the access
                        # (the rid00 == crow select rejects misreads)
                        crowc = jnp.clip(crow, 0, d1 * d2 - 1)
                        bm = jnp.broadcast_to(
                            mg_ref[pl.ds(crowc, 1), :], (E, 128))
                        bs = jnp.broadcast_to(
                            sg_ref[pl.ds(crowc, 1), :], (E, 128))
                        out = out + (
                            jnp.where(rid00 == crow,
                                      jnp.take_along_axis(bm, lz, axis=1),
                                      accs[8]),
                            jnp.where(rid00 == crow,
                                      jnp.take_along_axis(bs, lz, axis=1),
                                      accs[9]),
                        )
                    return out

                return jax.lax.fori_loop(0, rymax - rymin + 1, fy_loop, accs)

            nacc = 10 if baked_light else 8
            zeros8 = tuple(jnp.zeros((E, 128), _f32) for _ in range(nacc))
            accs = jax.lax.fori_loop(0, rxmax - rxmin + 1, fx_loop, zeros8)
            acc8 = accs[:8]

            inten = [jnp.where(fl < total, a, 0.0)
                     for a, fl in zip(acc8, flats)]

            # classify corners, then mix COLORS y->x->z (kernel.cu:161-175)
            cols = [classify(it / cal) for it in inten]  # 8 x [4 x (8,128)]
        else:
            # ---- packed 4-bit id fetch ---------------------------------
            # normalize the y-wrap first: a corner's y index can only be
            # d2 (iy1 at the boundary), in which case its flat row IS
            # (x+1, 0); the z-wrap reads the packed slot at z == d3
            # (a5_pack_id_grid).  NOTE: no rid // d2 here — Mosaic lowers
            # vector i32 division through f32 reciprocals, which is
            # inexact for large numerators (measured on-chip), so the
            # wrap is decided by comparison and the small // ypack gets
            # a +-1 floor correction.
            id0k = scal_ref[23].astype(_i32)
            corners_xy = ((ixi, iyi), (ixi, iy1i), (ix1i, iyi),
                          (ix1i, iy1i))
            taps = []
            for (cxi, cyi), rid in zip(corners_xy, rids):
                wrapn = (cyi == d2).astype(_i32)
                rx = cxi + wrapn
                ry = jnp.where(wrapn == 1, 0, cyi)
                ry = jnp.where(rid >= 0, ry, 0)
                g = ry // ypack
                g = jnp.where(ry >= (g + 1) * ypack, g + 1, g)
                g = jnp.where(ry < g * ypack, g - 1, g)
                growid = jnp.where(rid >= 0, rx * nyg + g, -1)
                base_lane = (ry - g * ypack) * zw
                for izv in (izi, iz1i):
                    izc = jnp.where(valid, jnp.clip(izv, 0, d3), 0)
                    lane = jnp.where(valid, base_lane + (izc >> 3), 0)
                    shift = (izc & 7) * 4
                    taps.append((growid, lane, shift, rx, g))

            # row/group ranges: rid11 has the max rx; groups come from the
            # two distinct y rows (g(10) == g(00), g(11) == g(01)), and a
            # y-wrapped corner 01 can land in group 0 BELOW g(00), so both
            # bounds consider both
            rxmin = jnp.min(jnp.where(valid, taps[0][3], _BIG))
            rxmax = jnp.max(jnp.where(valid, taps[6][3], -1))
            gmin = jnp.min(
                jnp.where(valid, jnp.minimum(taps[0][4], taps[2][4]), _BIG))
            gmax = jnp.max(
                jnp.where(valid, jnp.maximum(taps[0][4], taps[2][4]), -1))
            if id_stream:
                # rows come from the block's VMEM slot ([block_x + 2]
                # planes starting at bx0 — +1 for corner taps, +1 more
                # for the y-wrap quirk's x+2 reach): clamp the tap x
                # range to the
                # slot — non-owned samples' taps outside it fetch 0 and
                # are alpha-masked by the ownership gate below
                id_ref = id_cell[0]
                bx0s = ms_cell[1]
                rowbase = bx0s * nyg
                rxmin_l = jnp.clip(rxmin - bx0s, 0, block_x + 1)
                rxmax_l = jnp.clip(rxmax - bx0s, 0, block_x + 1)
                nrows_grid = id_brm

                def px_loop(dxi, accs):
                    cx = rxmin_l + dxi

                    def pg_loop(dgi, accs):
                        cg = gmin + dgi
                        crow = cx * nyg + cg
                        crowc = jnp.clip(crow, 0, nrows_grid - 1)
                        rowv = id_ref[pl.ds(crowc, 1), :]
                        bc = jnp.broadcast_to(rowv, (E, 128))
                        out = []
                        for acc, (growid, lane, shift, _, _) in zip(
                                accs, taps):
                            w = jnp.take_along_axis(bc, lane, axis=1)
                            mid = jax.lax.shift_right_logical(
                                w, shift) & 15
                            out.append(jnp.where(
                                growid == crow + rowbase, mid, acc))
                        return tuple(out)

                    return jax.lax.fori_loop(
                        0, gmax - gmin + 1, pg_loop, accs)

                nx_iters = rxmax_l - rxmin_l + 1
            else:
                nrows_grid = vol_ref.shape[0]

                def px_loop(dxi, accs):
                    cx = rxmin + dxi

                    def pg_loop(dgi, accs):
                        cg = gmin + dgi
                        crow = cx * nyg + cg
                        # rx == d1 rows (always flat-guarded) may exceed
                        # the grid: clamp the read; the growid select
                        # rejects it
                        crowc = jnp.clip(crow, 0, nrows_grid - 1)
                        rowv = vol_ref[pl.ds(crowc, 1), :]
                        bc = jnp.broadcast_to(rowv, (E, 128))
                        out = []
                        for acc, (growid, lane, shift, _, _) in zip(
                                accs, taps):
                            w = jnp.take_along_axis(bc, lane, axis=1)
                            mid = jax.lax.shift_right_logical(
                                w, shift) & 15
                            out.append(jnp.where(growid == crow, mid, acc))
                        return tuple(out)

                    return jax.lax.fori_loop(
                        0, gmax - gmin + 1, pg_loop, accs)

                nx_iters = rxmax - rxmin + 1

            zeros8i = tuple(jnp.zeros((E, 128), _i32) for _ in range(8))
            ids8 = jax.lax.fori_loop(0, nx_iters, px_loop, zeros8i)
            ids8 = [jnp.where(fl < total, m, id0k)
                    for m, fl in zip(ids8, flats)]

            def classify_id(mid):
                out = [jnp.full((E, 128), tf_colors_ref[0, c], _f32)
                       for c in range(4)]
                for k in range(1, num_intervals):
                    m = mid == k
                    for c in range(4):
                        out[c] = jnp.where(m, tf_colors_ref[k, c], out[c])
                return out

            cols = [classify_id(m) for m in ids8]
        mixed = []
        for c in range(4):
            cy1 = cols[0][c] * (1.0 - fy) + cols[2][c] * fy
            cy2 = cols[1][c] * (1.0 - fy) + cols[3][c] * fy
            cy3 = cols[4][c] * (1.0 - fy) + cols[6][c] * fy
            cy4 = cols[5][c] * (1.0 - fy) + cols[7][c] * fy
            cz1 = cy1 * (1.0 - fx) + cy3 * fx
            cz2 = cy2 * (1.0 - fx) + cy4 * fx
            mixed.append(cz1 * (1.0 - fz) + cz2 * fz)

        sr, sg, sb, sa = [
            jnp.where(inside, mixed[c], c0[c]) for c in range(4)
        ]
        if baked_light:
            # out_rgb = rgb * M + S; outside samples shade as w = 0
            # (normal 0): M = 1, S = 0 keeps the TF(0) color unshaded
            mval = jnp.where(inside, accs[8], 1.0)
            sval = jnp.where(inside, accs[9], 0.0)
            sr = sr * mval + sval
            sg = sg * mval + sval
            sb = sb * mval + sval
        if ms_stream or id_stream:
            bx0 = ms_cell[1]
            # every sample is owned by exactly ONE block: the block of
            # its containing voxel's x (outside samples by the clipped x,
            # so they render once with TF(0)'s color when its alpha > 0)
            oxi = jnp.clip(ixi, 0, d1 - 1)
            owned = (oxi >= bx0) & (oxi < bx0 + block_x)
        if ms_stream:
            ms_ref = ms_cell[0]
            shade_ok = inside & owned
            # (M, S) tap at the containing voxel from the block slot:
            # u8 pair per voxel, 2 voxels per word (pack_ms_grid layout)
            izc = jnp.where(inside, jnp.clip(izi, 0, d3 - 1), 0)
            lxb = jnp.where(shade_ok, ixi - bx0, 0)
            iyc = jnp.where(shade_ok, iyi, 0)
            rowid_ms = jnp.where(
                shade_ok, (lxb * d2 + iyc) * ms_nzr + (izc >> 8), -1)
            lane_ms = jnp.where(inside, (izc >> 1) & 127, 0)
            shift_ms = (izc & 1) * 16
            rmsxmin = jnp.min(jnp.where(shade_ok, lxb, _BIG))
            rmsymin = jnp.min(jnp.where(shade_ok, iyc, _BIG))
            rmsxmax = jnp.max(jnp.where(shade_ok, lxb, -1))
            rmsymax = jnp.max(jnp.where(shade_ok, iyc, -1))

            def _ms_fetch(crow, acc):
                crowc = jnp.clip(crow, 0, ms_brm - 1)
                bm = jnp.broadcast_to(
                    ms_ref[pl.ds(crowc, 1), :], (E, 128))
                w16 = jax.lax.shift_right_logical(
                    jnp.take_along_axis(bm, lane_ms, axis=1),
                    shift_ms) & 0xFFFF
                return jnp.where(rowid_ms == crow, w16, acc)

            def msx(dxi, acc):
                cx = rmsxmin + dxi

                def msy(dyi, acc):
                    cy = rmsymin + dyi
                    if ms_nzr == 1:
                        # d3 <= 256 (the MNI-1mm class): one z-row per
                        # (x, y) column — skip the inner loop entirely
                        # (Mosaic scalar loop overhead is real, and this
                        # sits in the hot lit-a5 path; round-4 VERDICT
                        # item 5)
                        return _ms_fetch(cx * d2 + cy, acc)

                    def msz(zr, acc):
                        return _ms_fetch((cx * d2 + cy) * ms_nzr + zr,
                                         acc)

                    return jax.lax.fori_loop(0, ms_nzr, msz, acc)

                return jax.lax.fori_loop(
                    0, rmsymax - rmsymin + 1, msy, acc)

            w16 = jax.lax.fori_loop(
                0, rmsxmax - rmsxmin + 1, msx, jnp.zeros((E, 128), _i32))
            mval = jnp.where(
                shade_ok,
                (w16 & 255).astype(_f32) * scal_ref[27] + scal_ref[26],
                1.0)
            sval = jnp.where(
                shade_ok,
                (jax.lax.shift_right_logical(w16, 8) & 255).astype(_f32)
                * scal_ref[29] + scal_ref[28],
                0.0)
            sr = sr * mval + sval
            sg = sg * mval + sval
            sb = sb * mval + sval
        if ms_stream or id_stream:
            # non-owned samples are the over identity for this block
            sa = sa * owned.astype(_f32)

        # ---- blend the 4 steps in order (front-to-back (C, T)) ----------
        for s in range(steps):
            lo = 2 * s
            a_s = sa[lo:lo + 2, :]
            if spr % steps:
                gate = ((ci * steps + s) < spr).astype(_f32)
                a_s = a_s * gate
            w_s = t * a_s
            cr = cr + w_s * sr[lo:lo + 2, :]
            cg = cg + w_s * sg[lo:lo + 2, :]
            cb = cb + w_s * sb[lo:lo + 2, :]
            t = t * (1.0 - a_s)
        return ci + 1, cr, cg, cb, t

    zeros = jnp.zeros((2, 128), _f32)
    ones = jnp.ones((2, 128), _f32)

    def march_range(c_lo, c_hi, ms_ref=None, bx0=None, id_ref=None):
        ms_cell[0] = ms_ref
        ms_cell[1] = bx0
        id_cell[0] = id_ref

        def cond(carry):
            ci, _, _, _, t = carry
            return (ci < c_hi) & (jnp.max(t) > eps)

        def body(carry):
            # fresh function object per march_range call: lax.while_loop
            # caches traced bodies by function identity, and chunk_body's
            # trace depends on the ms_cell/id_cell contents
            return chunk_body(carry)

        _, cr, cg, cb, t = jax.lax.while_loop(
            cond, body, (c_lo, zeros, zeros, zeros, ones))
        return cr, cg, cb, t

    if not (ms_stream or id_stream):
        cr, cg, cb, t = march_range(jnp.asarray(0, _i32), nchunks)
        out_r_ref[0, 0] = cr
        out_g_ref[0, 0] = cg
        out_b_ref[0, 0] = cb
        out_t_ref[0, 0] = t
        return

    # ---- ms_stream block loop: visibility-ordered x-blocks with manual
    # double-buffered (M, S) DMA, mirroring _march_kernel manual_stream.
    # Along any a5 ray, x = A_ray + B*i with the SAME B for every ray
    # (the sample lattice is a sheared affine grid), so blocks are
    # visited front-to-back in sign(B) order and each block's chunk
    # range is the inverse affine image of its x-interval.
    Bstep = iv[0][2] * s3 * L  # x advance per sample index (scalar)
    fwdb = Bstep >= 0.0
    big = jnp.asarray(3.4e38, _f32)
    A = (q[0] + iv[0][3]) * L + m3[0]  # per-ray x at sample i = 0
    Amin = jnp.min(jnp.where(pix_ok, A, big))
    Amax = jnp.max(jnp.where(pix_ok, A, -big))
    alpha0_pos = c0[3] > 0.0

    def bk_of(kvis):
        return jnp.clip(jnp.where(fwdb, kvis, nxb - 1 - kvis),
                        0, nxb - 1).astype(_i32)

    def ms_dma(slot, kvis):
        bk = bk_of(kvis)
        return pltpu.make_async_copy(
            ms_hbm_ref.at[pl.ds(bk * ms_brm, ms_brm), :],
            ms_bufs_ref.at[slot],
            ms_sem_ref.at[slot],
        )

    def id_dma(slot, kvis):
        # [block_x + 1] x planes: corner taps reach one plane past the
        # block (consecutive block ranges overlap by nyg rows — fine)
        bk = bk_of(kvis)
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(bk * block_x * nyg, id_brm), :],
            id_bufs_ref.at[slot],
            id_sem_ref.at[slot],
        )

    class _Dma:
        def __init__(self, slot, kvis):
            self.slot, self.kvis = slot, kvis

        def start(self):
            if ms_stream:
                ms_dma(self.slot, self.kvis).start()
            if id_stream:
                id_dma(self.slot, self.kvis).start()

        def wait(self):
            if ms_stream:
                ms_dma(self.slot, self.kvis).wait()
            if id_stream:
                id_dma(self.slot, self.kvis).wait()

    def dma(slot, kvis):
        return _Dma(slot, kvis)

    def crange(bk):
        """This block's chunk interval [c_lo, c_hi) — the inverse affine
        of its owned-x interval, +-1-chunk margin for float slop; the
        x-edge blocks extend to the clipped outside owners when
        TF(0).alpha > 0 (outside samples render and are owned by them)."""
        bx0f = bk.astype(_f32) * np.float32(block_x)
        xlo = bx0f - 1.0
        xhi = bx0f + np.float32(block_x) + 1.0
        xlo = jnp.where(alpha0_pos & (bk == 0), -big, xlo)
        xhi = jnp.where(alpha0_pos & (bk == nxb - 1), big, xhi)
        safe = jnp.abs(Bstep) > 1e-9
        bdiv = jnp.where(safe, Bstep, 1.0)
        cands = [(xlo - Amin) / bdiv, (xlo - Amax) / bdiv,
                 (xhi - Amin) / bdiv, (xhi - Amax) / bdiv]
        i_lo = jnp.minimum(jnp.minimum(cands[0], cands[1]),
                           jnp.minimum(cands[2], cands[3]))
        i_hi = jnp.maximum(jnp.maximum(cands[0], cands[1]),
                           jnp.maximum(cands[2], cands[3]))
        # |B| ~ 0: every sample sits at x ~ A — full range if the block
        # intersects [Amin, Amax] (+- the trunc margin), else empty
        isect = (Amax >= xlo) & (Amin <= xhi)
        # clamp to an i32-safe range before the int cast; |B| ~ 0 takes
        # the full local range when the block intersects [Amin, Amax]
        lim = np.float32(1e7)
        i_lo = jnp.clip(jnp.where(safe, i_lo - 1.0,
                                  jnp.where(isect, -lim, lim)), -lim, lim)
        i_hi = jnp.clip(jnp.where(safe, i_hi + 1.0,
                                  jnp.where(isect, lim, -lim)), -lim, lim)
        # global sample index -> local chunk (i_local = i - s_start)
        c_lo = jnp.clip(
            (jnp.floor(i_lo).astype(_i32) - s_start_i) // steps - 1,
            0, nchunks)
        c_hi = jnp.clip(
            (jnp.ceil(i_hi).astype(_i32) - s_start_i) // steps + 2,
            0, nchunks)
        return c_lo, c_hi

    def march_blk(slot, kvis, carry):
        cr, cg, cb, t = carry
        bk = bk_of(kvis)
        c_lo, c_hi = crange(bk)
        bcr, bcg, bcb, bt = march_range(
            c_lo, c_hi,
            ms_ref=ms_bufs_ref.at[slot] if ms_stream else None,
            bx0=bk * block_x,
            id_ref=id_bufs_ref.at[slot] if id_stream else None)
        # visit order == visibility order: the accumulator is in front
        return (cr + t * bcr, cg + t * bcg, cb + t * bcb, t * bt)

    def maybe_march(slot, kvis, carry):
        bk = bk_of(kvis)
        c_lo, c_hi = crange(bk)
        live = (kvis < nxb) & (c_lo < c_hi) & (jnp.max(carry[3]) > eps)
        return jax.lax.cond(
            live, lambda c: march_blk(slot, kvis, c), lambda c: c, carry)

    dma(0, 0).start()

    def body(it, carry):
        k0 = it * 2
        k1 = it * 2 + 1

        @pl.when(k1 < nxb)
        def _():
            dma(1, k1).start()

        dma(0, k0).wait()
        carry = maybe_march(0, k0, carry)

        @pl.when(k1 + 1 < nxb)
        def _():
            dma(0, k1 + 1).start()

        @pl.when(k1 < nxb)
        def _():
            dma(1, k1).wait()

        return maybe_march(1, k1, carry)

    npairs = -(-nxb // 2)
    cr, cg, cb, t = jax.lax.fori_loop(
        0, npairs, body, (zeros, zeros, zeros, ones))
    out_r_ref[0, 0] = cr
    out_g_ref[0, 0] = cg
    out_b_ref[0, 0] = cb
    out_t_ref[0, 0] = t


def _stage_rows_a5(volume: Volume) -> jnp.ndarray:
    """Volume as VMEM rows [pad8(d1*d2 + d2 + 1), 128], z on lanes, with
    lane d3 holding the NEXT row's first voxel so a z+1 tap at z == d3-1
    reproduces the reference's flat-index wrap (kernel.cu:129-159)."""
    d1, d2, d3 = volume.dims
    nrows = d1 * d2
    # +d2+1 margin: corner rows reach (ix+1, iy+1) one past the last voxel
    rows = _pad_to(nrows + d2 + 1, 8)
    flat2d = volume.data.reshape(nrows, d3)
    vol_rows = jnp.zeros((rows, 128), _f32)
    vol_rows = vol_rows.at[:nrows, :d3].set(flat2d)
    if d3 < 128:
        vol_rows = vol_rows.at[: nrows - 1, d3].set(flat2d[1:, 0])
    return vol_rows


def a5_packed_geometry(
    dims: Tuple[int, int, int], num_intervals: int
) -> Tuple[int, int, int] | None:
    """(zw, ypack, nyg) for the a5 4-bit interval-id grid, or None when it
    cannot apply.  The z column packs d3 + 1 nibbles (the extra slot holds
    the z-wrap value, cf. _stage_rows_a5's lane-d3 margin), 8 per i32
    word, ``ypack`` y columns per 128-lane row."""
    d1, d2, d3 = dims
    if num_intervals > 16:
        return None
    zw = -(-(d3 + 1) // 8)
    if zw > 128:
        return None  # d3 > 1023
    ypack = min(128 // zw, d2)
    nyg = -(-d2 // ypack)
    if _pad_to(d1 * nyg, 8) * 128 * 4 > 12 * 2**20:  # VMEM budget
        return None
    return zw, ypack, nyg


def a5_pack_id_grid(
    volume: Volume,
    tf: TransferFunction,
    zpack: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rows [pad8(d1*nyg), 128] i32, id0 f32): per-voxel a5 TF-interval
    ids, 4-bit packed z-major with the z-wrap slot at index d3.

    a5 value semantics (PARITY C4): classify(v / FLOAT cal_max), no
    negative clamp; no-match falls back to interval 0.  The wrap slot of
    row r holds row r+1's first voxel's id, so a z+1 corner tap at
    z == d3 - 1 reproduces the reference's flat-index wrap
    (kernel.cu:129-159) from the packed grid."""
    d1, d2, d3 = volume.dims
    zw, ypack, nyg = zpack
    vn = volume.data.reshape(d1, d2, d3) / volume.cal_max
    ids = jnp.zeros((d1, d2, d3), _i32)
    id0 = jnp.zeros((), _i32)
    for k in range(tf.num_intervals):
        m = (vn >= tf.lower[k]) & (vn <= tf.upper[k])
        ids = jnp.where(m, k, ids)
        id0 = jnp.where((tf.lower[k] <= 0.0) & (tf.upper[k] >= 0.0), k, id0)
    # wrap slot: the NEXT flat row's first id (last row's slot reads 0 —
    # its wrap tap has flat == total, which the kernel guards to id0)
    flat_ids = ids.reshape(d1 * d2, d3)
    wrap = jnp.concatenate(
        [flat_ids[1:, 0], jnp.zeros((1,), _i32)])[:, None]
    ext = jnp.concatenate([flat_ids, wrap], axis=1)  # [d1*d2, d3+1]
    ext = ext.reshape(d1, d2, d3 + 1)
    ext = jnp.pad(
        ext, ((0, 0), (0, nyg * ypack - d2), (0, zw * 8 - (d3 + 1))))
    shifts = jnp.arange(8, dtype=_i32) * 4
    words = jnp.sum(
        jnp.left_shift(ext.reshape(d1, nyg, ypack, zw, 8), shifts), axis=-1
    ).astype(_i32)
    rows = _pad_to(d1 * nyg, 8)
    grid = jnp.zeros((rows, 128), _i32)
    grid = grid.at[: d1 * nyg, : ypack * zw].set(
        words.reshape(d1 * nyg, ypack * zw))
    return grid, id0.astype(_f32)


# total VMEM budget for the streamed-a5 double buffers (id + (M, S)
# slots together).  On-chip sweep at 512^3 (tpu_round5_results2.json
# j3b): slot 3 MB -> 2379 ms, 5 MB -> 2100, 8 MB -> 2024 (bigger blocks
# re-march fewer boundary chunks per tile); 10 MB total keeps ~6 MB of
# compute headroom and caps the LIT case (where the ms pack shares the
# budget) at the proven block size.
_A5_STREAM_BUDGET = 10 * 2**20


def a5_stream_geometry(
    dims: Tuple[int, int, int], num_intervals: int, lit: bool = False
) -> Tuple[int, int, int, int, int] | None:
    """(zw, ypack, nyg, block_x, nxb) for STREAMING the 4-bit a5 id grid
    per x-block (round-4 VERDICT item 4: 512^3-class a5 whose id grid
    exceeds the resident a5_packed_geometry budget), or None when the
    packed layout itself cannot apply (z > 1023 / K > 16).  ``lit``
    shares the budget with the u8 (M, S) block slots (they ride the
    same block index)."""
    d1, d2, d3 = dims
    if num_intervals > 16:
        return None
    zw = -(-(d3 + 1) // 8)
    if zw > 128:
        return None  # d3 > 1023
    ypack = min(128 // zw, d2)
    nyg = -(-d2 // ypack)
    per_plane = nyg * 128 * 4
    if lit:
        per_plane += d2 * (-(-d3 // 256)) * 512  # pack_ms_grid bytes
    block_x = max(8, (_A5_STREAM_BUDGET // (2 * per_plane) - 2)
                  // 8 * 8)
    block_x = min(block_x, _pad_to(d1, 8))
    d1p = _pad_to(d1, block_x)
    return zw, ypack, nyg, block_x, d1p // block_x


def a5_baked_light_feasible(dims: Tuple[int, int, int]) -> bool:
    """Static predicate: do the volume rows plus the two per-voxel Phong
    factor grids fit the a5 kernel's VMEM budget?  (a5 lighting always
    bakes — its view direction is camera.front for every ray, so there is
    no per-ray shading term to compute in-kernel.)"""
    d1, d2, d3 = dims
    if d3 > 127:
        return False
    vol_bytes = _pad_to(d1 * d2 + d2 + 1, 8) * 128 * 4
    f32_bytes = _pad_to(d1 * d2, 8) * 128 * 4
    return vol_bytes + 2 * f32_bytes <= _A5_BAKED_BUDGET


_A5_BAKED_BUDGET = 15 * 2**20 + 2**19  # ~15.5 MB of the ~16 MB VMEM
# ms_stream (M, S) slot budget: larger blocks mean fewer boundary chunks
# re-marched (each block re-marches its x-interval's chunk range) and
# fewer DMA waits, at 2 slots x budget of VMEM alongside the id grid.
# On-chip MNI-1mm lit sweep: 2 MB -> 331.9 ms, 3.5 MB -> 260.9 ms,
# 5 MB -> 260.6 (saturated); 3.5 MB keeps ~3 MB VMEM headroom.
_A5_MS_SLOT_BUDGET = int(3.5 * 2**20)


def render_test_pallas(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    early_eps: float = 1e-3,
    interpret: bool = False,
    light=None,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    segment: bool = False,
    id_stream_block: int | None = None,
    steps: int | None = None,
) -> jnp.ndarray:
    """a5/TEST render via the fused Pallas kernel -> [W, H, 4].
    ``steps`` = samples per register chunk (default STEPS; deeper chunks
    amortize per-chunk fixed costs — value-identical, A/B on chip).

    Matches ``render_test(..., mode="fast")`` up to the early-termination
    epsilon and compiler float reassociation (``early_eps=0`` for exact
    structural agreement).  Volumes with z <= 127 stage f32 rows (z on
    lanes + the wrap slot); larger volumes (z <= 1023, MNI-1mm-class) use
    the packed 4-bit interval-id grid (a5_pack_id_grid — bit-exact: the
    a5 classify is per corner, so corner ids reproduce corner colors,
    VERDICT item 3).  Single channel only — the dispatcher falls back to
    the XLA renderer otherwise.  ``config.lighting`` runs through baked
    per-voxel Phong factor grids (any gradient filter; needs a uniform
    light color, the a5_baked_light_feasible VMEM budget, and the f32
    layout — packed volumes render unlit).

    Id grids beyond the resident a5_packed_geometry budget (512^3-class,
    round-4 VERDICT item 4) STREAM per x-block with manual double-
    buffered DMA (a5_stream_geometry; ``id_stream_block`` overrides the
    block size for tests); lit/scattered renders stream the (M, S) pack
    alongside on the same block index."""
    d1, d2, d3 = volume.dims
    zpack = None
    id_mode = False
    id_bx = id_nxb = 0
    if d3 > 127:
        zpack = a5_packed_geometry(volume.dims, tf.num_intervals)
        if zpack is None or id_stream_block is not None:
            geo = a5_stream_geometry(
                volume.dims, tf.num_intervals,
                lit=(bool(config.lighting) or bool(config.scattering)
                     or light is not None))
            if geo is None:
                raise ValueError(
                    f"a5 pallas path: dims {volume.dims} / "
                    f"{tf.num_intervals} intervals fit neither the f32 "
                    "rows (z <= 127) nor the packed id grid (z <= 1023); "
                    "use the XLA renderer")
            zw_, yp_, nyg_, id_bx, id_nxb = geo
            if id_stream_block is not None:
                if id_stream_block % 8:
                    raise ValueError("id_stream_block must be 8-aligned")
                id_bx = id_stream_block
                id_nxb = _pad_to(d1, id_bx) // id_bx
            zpack = (zw_, yp_, nyg_)
            id_mode = True
    if volume.channels != 1:
        raise ValueError("a5 pallas path supports single-channel volumes")
    baked = (bool(config.lighting) or bool(config.scattering)
             or light is not None)
    # lit/scattered packed a5 (z > 127, MNI-1mm-class): the (M, S) grids
    # stream from HBM per x-block instead of residing in VMEM
    ms_mode = baked and zpack is not None
    if baked:
        from . import phong
        from .pallas_march import (
            _stage_f32_rows,
            _uniform_light_color,
            bake_light_grids,
            bake_scatter_grid,
            pack_ms_grid,
        )

        lg = light if light is not None else phong.default_light()
        if not _uniform_light_color(light):
            raise ValueError(
                "a5 fused lighting needs a statically-uniform light color "
                "(the per-voxel M grid folds it in) — pass light=None for "
                "the default light, or use the XLA path")
        if not ms_mode and not a5_baked_light_feasible(volume.dims):
            raise ValueError(
                "a5 fused lighting exceeds the VMEM budget for this "
                "volume; use the XLA path")

    w, h = config.width, config.height
    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count
    ntx = -(-w_local // TILE_PX)
    nty = -(-h // TILE_PY)

    import dataclasses as _dc

    id0 = jnp.zeros((), _f32)
    id_brm = 0
    if zpack is None:
        vol_rows = _stage_rows_a5(volume)
    elif id_mode:
        # pad x to the block grid + 1 margin plane (corner taps reach
        # x+1 across the block boundary); padded voxels are flat-guarded
        d1p_id = id_nxb * id_bx
        # +2 margin planes: a corner tap reaches x+1, and the reference's
        # y-wrap quirk (kernel.cu:129-159) can push it to x+2
        pad_x = d1p_id + 2 - d1
        data_p = jnp.pad(volume.data.reshape(volume.dims),
                         ((0, pad_x), (0, 0), (0, 0)))
        vol_pad = _dc.replace(volume, data=data_p,
                              dims=(d1p_id + 2, d2, d3))
        vol_rows, id0 = a5_pack_id_grid(vol_pad, tf, zpack)
        id_brm = (id_bx + 2) * zpack[2]
    else:
        vol_rows, id0 = a5_pack_id_grid(volume, tf, zpack)
    rows = vol_rows.shape[0]

    extra_args = []
    extra_specs = []
    ms_q = None
    ms_brm = nxb = bx = 0
    nzr = 1
    if id_mode:
        bx = id_bx
        nxb = id_nxb
    if baked:
        data3d = volume.data.reshape(volume.dims)
        if config.lighting or (light is not None and not config.scattering):
            mgrid, sgrid = bake_light_grids(data3d, config, lg,
                                            -camera.front)
        else:
            mgrid = jnp.ones(volume.dims, _f32)
            sgrid = jnp.zeros(volume.dims, _f32)
        if config.scattering:
            # the a5 march direction is camera.front for every ray; the
            # a5 material (g) lookup normalizes by the FLOAT cal_max
            # (PARITY C4) while the transmittance alpha uses trunc
            sgrid = sgrid + bake_scatter_grid(
                data3d, tf, config, lg, camera.front,
                jnp.asarray(volume.cal_max, _f32),
                jnp.trunc(jnp.asarray(volume.cal_max, _f32)))
        if ms_mode:
            # u8-quantized (M, S) pack streamed per x-block (~2 MB/slot);
            # with a streamed id grid both ride the SAME block index
            nzr = -(-d3 // 256)
            if id_mode:
                bx = id_bx
                d1p = id_nxb * id_bx
                nxb = id_nxb
            else:
                ms_pp = d2 * nzr * 512  # bytes per x plane
                bx = max(8, min((_A5_MS_SLOT_BUDGET // ms_pp) // 8 * 8,
                                64))
                d1p = _pad_to(d1, bx)
                nxb = d1p // bx
            ms_rows, ms_q, nzr = pack_ms_grid(mgrid, sgrid, d1p)
            ms_brm = bx * d2 * nzr
            extra_args.append(ms_rows)
            extra_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            for g in (mgrid, sgrid):
                grows = _stage_f32_rows(g, d1, d2, d3)
                extra_args.append(grows)
                extra_specs.append(
                    pl.BlockSpec((grows.shape[0], 128),
                                 lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM))

    # stage matrices exactly as models/raycast._a5_positions builds them
    iv = T.inverse(camera.look_at_origin_view())  # kernel.cu:1197-1198
    L = float(volume.longest_dimension)
    # toVolume = Translation(dims/2 - L/2) @ Scaling(L) @ Translation(.5):
    # net affine p*L + (tr + L/2) — bake the translation like T.apply does
    m3 = [volume.dims[c] / 2.0 - L / 2.0 + 0.5 * L for c in range(3)]

    scal = jnp.concatenate([
        jnp.asarray([
            config.real_screen_width / config.width,
            config.real_screen_height / config.height,
            -config.viewplane_distance / config.samples_per_ray,
            -config.real_screen_width / 2.0,
            -config.real_screen_height / 2.0,
        ], _f32),
        jnp.asarray(volume.cal_max, _f32).reshape(1),
        jnp.asarray([early_eps], _f32),
        iv[:3, :4].reshape(-1).astype(_f32),
        jnp.asarray(m3, _f32),
        jnp.asarray([L], _f32),
        id0.reshape(1),  # [23] classify-index of vn=0 (packed mode)
        jnp.asarray(x_offset, _f32).reshape(1),  # [24] ray-column offset
        jnp.asarray(s_start, _f32).reshape(1),  # [25] first sample index
    ])
    if ms_mode:
        # [26..29]: (M, S) dequantization affine (pack_ms_grid)
        scal = jnp.concatenate(
            [scal] + [jnp.asarray(v, _f32).reshape(1) for v in ms_q])

    kernel = functools.partial(
        _a5_kernel,
        dims=volume.dims,
        num_intervals=tf.num_intervals,
        width=w,
        height=h,
        spr=s_count,  # the LOCAL sample count; i = s_start + local
        baked_light=baked and not ms_mode,
        zpack=zpack,
        local_width=w_local,
        ms_stream=ms_mode,
        ms_nzr=nzr,
        ms_brm=ms_brm,
        nxb=nxb,
        block_x=bx,
        id_stream=id_mode,
        id_brm=id_brm,
        steps=A5_STEPS if steps is None else steps,
    )

    vol_spec = (
        pl.BlockSpec(memory_space=pl.ANY)  # id grid streams from HBM
        if id_mode else
        pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM)
    )
    # scratch order matches the kernel's pops: [id bufs, id sem] then
    # [ms bufs, ms sem] (ms popped last)
    scratch = []
    if id_mode:
        scratch += [pltpu.VMEM((2, id_brm, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,))]
    if ms_mode:
        scratch += [pltpu.VMEM((2, ms_brm, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntx, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
            vol_spec,  # volume / id grid
        ] + extra_specs,  # [M, S rows (baked)] | [(M, S) pack (ms HBM)]
        out_specs=[
            pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        scratch_shapes=scratch,
    )
    out_shape = [jax.ShapeDtypeStruct((ntx, nty, 2, 128), _f32)
                 for _ in range(4)]
    cr, cg, cb, t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, tf.lower, tf.upper, tf.colors, vol_rows, *extra_args)

    def unpack(a):
        a = a.reshape(ntx, nty, TILE_PX, TILE_PY)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * TILE_PX, nty * TILE_PY)
        return a[:w_local, :h]

    t2 = unpack(t)
    if segment:
        # raw front-to-back (C, T) pair — the associative compositing
        # unit for shard_map segments (ops/composite.segment_compose)
        c3 = jnp.stack([unpack(c) for c in (cr, cg, cb)], axis=-1)
        return c3, t2[..., None]
    bg = jnp.asarray(config.background, _f32)
    rgb = [unpack(c) + t2 * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w_local, h), _f32)], axis=-1)


def _a5_bwd_kernel(
    # SMEM
    scal_ref,
    tf_lower_ref,
    tf_upper_ref,
    tf_colors_ref,
    # VMEM
    vol_ref,
    g_r_ref, g_g_ref, g_b_ref, g_t_ref,
    dcol_ref,
    *,
    dims: Tuple[int, int, int],
    num_intervals: int,
    width: int,
    height: int,
    spr: int,
    zpack: Tuple[int, int, int] | None,
    krows: int,
    local_width: int | None = None,
):
    """Two-pass backward for the a5 pipeline, emitting dL/d(tf colors).

    The a5 sample color is LINEAR in the color table — each corner
    classifies to one interval and the trilinear mix only weights them —
    so the a1 backward's prefix/suffix scheme (ops/pallas_march_vjp)
    transfers: per sample, the interval-k coefficient is
    sum_corners wtri_c * [id_c == k] (outside samples contribute the
    TF(0) interval with weight 1), and the alpha-gradient chain is
    unchanged.  Bounds/volume cotangents are zero a.e. (piecewise-
    constant classify) and are not emitted."""
    d1, d2, d3 = dims
    total = d1 * d2 * d3
    nchunks = -(-spr // STEPS)
    df = [np.float32(d) for d in dims]
    packed = zpack is not None
    if packed:
        zw, ypack, nyg = zpack

    s1 = scal_ref[0]
    s2 = scal_ref[1]
    s3 = scal_ref[2]
    o1 = scal_ref[3]
    o2 = scal_ref[4]
    cal = scal_ref[5]
    iv = [[scal_ref[7 + 4 * r + c] for c in range(4)] for r in range(3)]
    m3 = [scal_ref[19 + c] for c in range(3)]
    L = scal_ref[22]
    id0k = scal_ref[23].astype(_i32)
    x_off_i = scal_ref[24].astype(_i32)
    s_start_i = scal_ref[25].astype(_i32)

    tx = pl.program_id(0)
    ty = pl.program_id(1)
    e = _iota(0) * 128 + _iota(1)
    s_idx = e // 256
    f = e % 256
    u = f // TILE_PY
    v = f % TILE_PY
    lw = width if local_width is None else local_width
    lxp = tx * TILE_PX + u
    pxi = lxp + x_off_i
    pyi = ty * TILE_PY + v
    # same live-ray mask as the forward _a5_kernel (lxp < lw): segment
    # work units narrower than the global width agree on the ray set
    pix_ok = (lxp < lw) & (pyi < height)
    px = pxi.astype(_f32)
    py = pyi.astype(_f32)
    p1x = px * s1 + o1
    p1y = py * s2 + o2
    q = [p1x * iv[c][0] + p1y * iv[c][1] for c in range(3)]

    # TF(0)'s winning interval (f32 mode recomputes the ascending scan)
    id0_f = jnp.asarray(0, _i32)
    for k in range(num_intervals):
        m0 = (tf_lower_ref[k] <= 0.0) & (tf_upper_ref[k] >= 0.0)
        id0_f = jnp.where(m0, k, id0_f)
    id0_use = id0k if packed else id0_f

    g_r = g_r_ref[0, 0]
    g_g = g_g_ref[0, 0]
    g_b = g_b_ref[0, 0]
    g_t = g_t_ref[0, 0]
    gr4 = jnp.concatenate([g_r] * STEPS, axis=0)
    gg4 = jnp.concatenate([g_g] * STEPS, axis=0)
    gb4 = jnp.concatenate([g_b] * STEPS, axis=0)

    nrows_grid = vol_ref.shape[0]

    def sample_chunk(ci):
        """(a, gdotc, coeffs[K], live) for chunk ci — mirrors the forward
        chunk_body's fetch + classify, reduced to interval coefficients."""
        i_f = (s_start_i + ci * STEPS + s_idx).astype(_f32)
        p1z = i_f * s3
        p2 = [(q[c] + p1z * iv[c][2]) + iv[c][3] for c in range(3)]
        p3 = [p2[c] * L + m3[c] for c in range(3)]
        inside = pix_ok
        for c in range(3):
            inside &= (p3[c] >= 0.0) & (p3[c] < df[c])
        ix = jnp.trunc(p3[0]); iy = jnp.trunc(p3[1]); iz = jnp.trunc(p3[2])
        ix1 = jnp.trunc(p3[0] + 1.0)
        iy1 = jnp.trunc(p3[1] + 1.0)
        iz1 = jnp.trunc(p3[2] + 1.0)
        fx = p3[0] - ix
        fy = p3[1] - iy
        fz = p3[2] - iz
        ixi, iyi, izi = [a.astype(_i32) for a in (ix, iy, iz)]
        ix1i, iy1i, iz1i = [a.astype(_i32) for a in (ix1, iy1, iz1)]
        valid = inside
        neg1 = jnp.full((8, 128), -1, _i32)
        rid00 = jnp.where(valid, ixi * d2 + iyi, neg1)
        rid01 = jnp.where(valid, ixi * d2 + iy1i, neg1)
        rid10 = jnp.where(valid, ix1i * d2 + iyi, neg1)
        rid11 = jnp.where(valid, ix1i * d2 + iy1i, neg1)
        rids = (rid00, rid01, rid10, rid11)
        flats = (
            rid00 * d3 + izi, rid00 * d3 + iz1i,
            rid01 * d3 + izi, rid01 * d3 + iz1i,
            rid10 * d3 + izi, rid10 * d3 + iz1i,
            rid11 * d3 + izi, rid11 * d3 + iz1i,
        )

        if not packed:
            lz = jnp.where(valid, jnp.clip(izi, 0, 127), 0)
            lz1 = jnp.where(valid, jnp.clip(iz1i, 0, 127), 0)
            rxmin = jnp.min(jnp.where(valid, ixi, _BIG))
            rymin = jnp.min(jnp.where(valid, iyi, _BIG))
            rxmax = jnp.max(jnp.where(valid, ix1i, -1))
            rymax = jnp.max(jnp.where(valid, iy1i, -1))

            def fx_loop(dxi, accs):
                cx = rxmin + dxi

                def fy_loop(dyi, acc8):
                    cy = rymin + dyi
                    crow = cx * d2 + cy
                    rowv = vol_ref[pl.ds(crow, 1), :]
                    bc = jnp.broadcast_to(rowv, (8, 128))
                    gz = jnp.take_along_axis(bc, lz, axis=1)
                    gz1 = jnp.take_along_axis(bc, lz1, axis=1)
                    return (
                        jnp.where(rid00 == crow, gz, acc8[0]),
                        jnp.where(rid00 == crow, gz1, acc8[1]),
                        jnp.where(rid01 == crow, gz, acc8[2]),
                        jnp.where(rid01 == crow, gz1, acc8[3]),
                        jnp.where(rid10 == crow, gz, acc8[4]),
                        jnp.where(rid10 == crow, gz1, acc8[5]),
                        jnp.where(rid11 == crow, gz, acc8[6]),
                        jnp.where(rid11 == crow, gz1, acc8[7]),
                    )

                return jax.lax.fori_loop(0, rymax - rymin + 1, fy_loop, accs)

            zeros8 = tuple(jnp.zeros((8, 128), _f32) for _ in range(8))
            acc8 = jax.lax.fori_loop(0, rxmax - rxmin + 1, fx_loop, zeros8)
            inten = [jnp.where(fl < total, a, 0.0)
                     for a, fl in zip(acc8, flats)]
            ids8 = []
            for it in inten:
                vn = it / cal
                idc = jnp.zeros((8, 128), _i32)
                for k in range(num_intervals):
                    m = (vn >= tf_lower_ref[k]) & (vn <= tf_upper_ref[k])
                    idc = jnp.where(m, k, idc)
                ids8.append(idc)
        else:
            id0_pk = id0k
            corners_xy = ((ixi, iyi), (ixi, iy1i), (ix1i, iyi),
                          (ix1i, iy1i))
            taps = []
            for (cxi, cyi), rid in zip(corners_xy, rids):
                wrapn = (cyi == d2).astype(_i32)
                rx = cxi + wrapn
                ry = jnp.where(wrapn == 1, 0, cyi)
                ry = jnp.where(rid >= 0, ry, 0)
                g = ry // ypack
                g = jnp.where(ry >= (g + 1) * ypack, g + 1, g)
                g = jnp.where(ry < g * ypack, g - 1, g)
                growid = jnp.where(rid >= 0, rx * nyg + g, -1)
                base_lane = (ry - g * ypack) * zw
                for izv in (izi, iz1i):
                    izc = jnp.where(valid, jnp.clip(izv, 0, d3), 0)
                    lane = jnp.where(valid, base_lane + (izc >> 3), 0)
                    shift = (izc & 7) * 4
                    taps.append((growid, lane, shift, rx, g))
            rxmin = jnp.min(jnp.where(valid, taps[0][3], _BIG))
            rxmax = jnp.max(jnp.where(valid, taps[6][3], -1))
            gmin = jnp.min(jnp.where(
                valid, jnp.minimum(taps[0][4], taps[2][4]), _BIG))
            gmax = jnp.max(jnp.where(
                valid, jnp.maximum(taps[0][4], taps[2][4]), -1))

            def px_loop(dxi, accs):
                cx = rxmin + dxi

                def pg_loop(dgi, accs):
                    cg = gmin + dgi
                    crow = cx * nyg + cg
                    crowc = jnp.clip(crow, 0, nrows_grid - 1)
                    rowv = vol_ref[pl.ds(crowc, 1), :]
                    bc = jnp.broadcast_to(rowv, (8, 128))
                    out = []
                    for acc, (growid, lane, shift, _, _) in zip(accs, taps):
                        wv = jnp.take_along_axis(bc, lane, axis=1)
                        mid = jax.lax.shift_right_logical(wv, shift) & 15
                        out.append(jnp.where(growid == crow, mid, acc))
                    return tuple(out)

                return jax.lax.fori_loop(0, gmax - gmin + 1, pg_loop, accs)

            zeros8i = tuple(jnp.zeros((8, 128), _i32) for _ in range(8))
            ids8 = list(jax.lax.fori_loop(
                0, rxmax - rxmin + 1, px_loop, zeros8i))
            ids8 = [jnp.where(fl < total, m, id0_pk)
                    for m, fl in zip(ids8, flats)]

        # trilinear weights in corner order (00z,00z1,01z,01z1,10z,...)
        wts = (
            (1 - fy) * (1 - fx) * (1 - fz), (1 - fy) * (1 - fx) * fz,
            fy * (1 - fx) * (1 - fz), fy * (1 - fx) * fz,
            (1 - fy) * fx * (1 - fz), (1 - fy) * fx * fz,
            fy * fx * (1 - fz), fy * fx * fz,
        )
        live = ((ci * STEPS + s_idx) < spr).astype(_f32)
        insf = inside.astype(_f32)
        coeffs = []
        for k in range(num_intervals):
            ck = jnp.zeros((8, 128), _f32)
            for idc, wt in zip(ids8, wts):
                ck = ck + jnp.where(idc == k, wt, 0.0)
            ck = ck * insf + (1.0 - insf) * (id0_use == k).astype(_f32)
            coeffs.append(ck * live)
        a = jnp.zeros((8, 128), _f32)
        r = jnp.zeros((8, 128), _f32)
        gc = jnp.zeros((8, 128), _f32)
        b = jnp.zeros((8, 128), _f32)
        for k in range(num_intervals):
            r = r + coeffs[k] * tf_colors_ref[k, 0]
            gc = gc + coeffs[k] * tf_colors_ref[k, 1]
            b = b + coeffs[k] * tf_colors_ref[k, 2]
            a = a + coeffs[k] * tf_colors_ref[k, 3]
        gdotc = gr4 * r + gg4 * gc + gb4 * b
        return a, gdotc, coeffs

    # ---- pass A ---------------------------------------------------------
    def pass_a(ci, carry):
        t, tot = carry
        a_all, gdotc_all, _ = sample_chunk(ci)
        for s in range(STEPS):
            sl = slice(2 * s, 2 * s + 2)
            a = a_all[sl]
            tot = tot + (t * a) * gdotc_all[sl]
            t = t * (1.0 - a)
        return t, tot

    ones = jnp.ones((2, 128), _f32)
    zeros = jnp.zeros((2, 128), _f32)
    t_final, totalw = jax.lax.fori_loop(0, nchunks, pass_a, (ones, zeros))
    bg_term = t_final * g_t

    row_i = _iota(0, krows)
    col_i = _iota(1, krows)

    # ---- pass B ---------------------------------------------------------
    def pass_b(ci, carry):
        t, pfx, dc = carry
        a_all, gdotc_all, coeffs = sample_chunk(ci)
        w_list, da_list = [], []
        for s in range(STEPS):
            sl = slice(2 * s, 2 * s + 2)
            a = a_all[sl]
            gd = gdotc_all[sl]
            w = t * a
            pfx = pfx + w * gd
            suffix = totalw - pfx
            denom = 1.0 - a
            num = suffix + bg_term
            da = t * gd - jnp.where(denom != 0.0, num / denom, 0.0)
            w_list.append(w)
            da_list.append(da)
            t = t * denom
        w_all = jnp.concatenate(w_list, axis=0)
        da_all = jnp.concatenate(da_list, axis=0)
        for k in range(num_intervals):
            ck = coeffs[k]
            dr = jnp.sum(ck * w_all * gr4)
            dg = jnp.sum(ck * w_all * gg4)
            db = jnp.sum(ck * w_all * gb4)
            dal = jnp.sum(ck * da_all)
            upd = jnp.where(
                col_i == 0, dr,
                jnp.where(col_i == 1, dg,
                          jnp.where(col_i == 2, db,
                                    jnp.where(col_i == 3, dal, 0.0))))
            dc = dc + jnp.where(row_i == k, upd, 0.0)
        return t, pfx, dc

    _, _, dc = jax.lax.fori_loop(
        0, nchunks, pass_b, (ones, zeros, jnp.zeros((krows, 128), _f32)))
    dcol_ref[0, 0] = dc


def _a5_streamed_bwd_kernel(
    # SMEM
    scal_ref,
    tf_lower_ref,
    tf_upper_ref,
    tf_colors_ref,
    # HBM
    vol_hbm_ref,  # [pad8((nxb*block_x + 2) * nyg), 128] i32 packed ids
    # VMEM
    g_r_ref, g_g_ref, g_b_ref, g_t_ref,
    dcol_ref,
    bufs_ref,  # scratch VMEM [2, id_brm, 128] i32
    dma_sem_ref,  # scratch DMA sems [2]
    *,
    dims: Tuple[int, int, int],
    num_intervals: int,
    width: int,
    height: int,
    spr: int,
    zpack: Tuple[int, int, int],
    krows: int,
    block_x: int,
    nxb: int,
    id_brm: int,
    local_width: int | None = None,
):
    """Beyond-VMEM a5 backward: the id-streaming twin of
    ``_a5_bwd_kernel`` (packed grids only — streaming exists exactly for
    grids past the resident ``a5_packed_geometry`` budget).

    The 4-bit interval-id grid stays in HBM and x-blocks stream through a
    double-buffered VMEM scratch in visibility order (sign of the shared
    per-frame x slope B = iv[0][2]*s3*L) — TWICE: pass A accumulates the
    per-ray totals, pass B re-streams for the prefix re-march and the
    per-interval gradient scatter.  Per-sample ownership is the forward
    id_stream rule (the containing voxel's clipped x), so every sample —
    including out-of-volume ones, which scatter into TF(0)'s interval —
    is processed by exactly ONE block in global march order.  Unlike the
    forward's ``crange``, the edge blocks extend to the clamp side
    UNCONDITIONALLY (no TF(0).alpha gating): parameter gradients are
    nonzero where values are not.  Matches
    /root/reference/kernel.cu:72-187 at the kernel.cu:1036-1043 scale
    point (the 3.92 GB sample buffer)."""
    d1, d2, d3 = dims
    total = d1 * d2 * d3
    nchunks = -(-spr // STEPS)
    df = [np.float32(d) for d in dims]
    zw, ypack, nyg = zpack

    s1 = scal_ref[0]
    s2 = scal_ref[1]
    s3 = scal_ref[2]
    o1 = scal_ref[3]
    o2 = scal_ref[4]
    iv = [[scal_ref[7 + 4 * r + c] for c in range(4)] for r in range(3)]
    m3 = [scal_ref[19 + c] for c in range(3)]
    L = scal_ref[22]
    id0k = scal_ref[23].astype(_i32)
    x_off_i = scal_ref[24].astype(_i32)
    s_start_i = scal_ref[25].astype(_i32)

    tx = pl.program_id(0)
    ty = pl.program_id(1)
    e = _iota(0) * 128 + _iota(1)
    s_idx = e // 256
    f = e % 256
    u = f // TILE_PY
    v = f % TILE_PY
    lw = width if local_width is None else local_width
    lxp = tx * TILE_PX + u
    pxi = lxp + x_off_i
    pyi = ty * TILE_PY + v
    pix_ok = (lxp < lw) & (pyi < height)
    px = pxi.astype(_f32)
    py = pyi.astype(_f32)
    p1x = px * s1 + o1
    p1y = py * s2 + o2
    q = [p1x * iv[c][0] + p1y * iv[c][1] for c in range(3)]

    g_r = g_r_ref[0, 0]
    g_g = g_g_ref[0, 0]
    g_b = g_b_ref[0, 0]
    g_t = g_t_ref[0, 0]
    gr4 = jnp.concatenate([g_r] * STEPS, axis=0)
    gg4 = jnp.concatenate([g_g] * STEPS, axis=0)
    gb4 = jnp.concatenate([g_b] * STEPS, axis=0)

    # ---- block geometry: x = A_ray + B*i, shared slope (forward's
    # ms/id_stream decomposition) -----------------------------------------
    Bstep = iv[0][2] * s3 * L
    fwdb = Bstep >= 0.0
    big = jnp.asarray(3.4e38, _f32)
    A = (q[0] + iv[0][3]) * L + m3[0]
    Amin = jnp.min(jnp.where(pix_ok, A, big))
    Amax = jnp.max(jnp.where(pix_ok, A, -big))

    def bk_of(kvis):
        return jnp.clip(jnp.where(fwdb, kvis, nxb - 1 - kvis),
                        0, nxb - 1).astype(_i32)

    def dma(slot, kvis):
        bk = bk_of(kvis)
        return pltpu.make_async_copy(
            vol_hbm_ref.at[pl.ds(bk * block_x * nyg, id_brm), :],
            bufs_ref.at[slot],
            dma_sem_ref.at[slot],
        )

    def crange(bk):
        """[c_lo, c_hi) chunks this block might OWN — the inverse affine
        of its ownership x interval.  Edge blocks open on the clamp side
        ALWAYS (the backward keeps out-of-volume samples' TF(0) grads)."""
        bx0f = bk.astype(_f32) * np.float32(block_x)
        xlo = bx0f - 1.0
        xhi = bx0f + np.float32(block_x) + 1.0
        xlo = jnp.where(bk == 0, -big, xlo)
        xhi = jnp.where(bk == nxb - 1, big, xhi)
        safe = jnp.abs(Bstep) > 1e-9
        bdiv = jnp.where(safe, Bstep, 1.0)
        cands = [(xlo - Amin) / bdiv, (xlo - Amax) / bdiv,
                 (xhi - Amin) / bdiv, (xhi - Amax) / bdiv]
        i_lo = jnp.minimum(jnp.minimum(cands[0], cands[1]),
                           jnp.minimum(cands[2], cands[3]))
        i_hi = jnp.maximum(jnp.maximum(cands[0], cands[1]),
                           jnp.maximum(cands[2], cands[3]))
        isect = (Amax >= xlo) & (Amin <= xhi)
        lim = np.float32(1e7)
        i_lo = jnp.clip(jnp.where(safe, i_lo - 1.0,
                                  jnp.where(isect, -lim, lim)), -lim, lim)
        i_hi = jnp.clip(jnp.where(safe, i_hi + 1.0,
                                  jnp.where(isect, lim, -lim)), -lim, lim)
        c_lo = jnp.clip(
            (jnp.floor(i_lo).astype(_i32) - s_start_i) // STEPS - 1,
            0, nchunks)
        c_hi = jnp.clip(
            (jnp.ceil(i_hi).astype(_i32) - s_start_i) // STEPS + 2,
            0, nchunks)
        c_hi = jnp.maximum(c_hi, c_lo)
        return c_lo, c_hi

    def sample_chunk(ci, id_ref, bx0):
        """(a, gdotc, coeffs[K]) for chunk ci against block bx0 — the
        packed branch of _a5_bwd_kernel.sample_chunk with the block's
        VMEM slot as the row source and the id_stream ownership gate."""
        i_f = (s_start_i + ci * STEPS + s_idx).astype(_f32)
        p1z = i_f * s3
        p2 = [(q[c] + p1z * iv[c][2]) + iv[c][3] for c in range(3)]
        p3 = [p2[c] * L + m3[c] for c in range(3)]
        inside = pix_ok
        for c in range(3):
            inside &= (p3[c] >= 0.0) & (p3[c] < df[c])
        ix = jnp.trunc(p3[0]); iy = jnp.trunc(p3[1]); iz = jnp.trunc(p3[2])
        ix1 = jnp.trunc(p3[0] + 1.0)
        iy1 = jnp.trunc(p3[1] + 1.0)
        iz1 = jnp.trunc(p3[2] + 1.0)
        fx = p3[0] - ix
        fy = p3[1] - iy
        fz = p3[2] - iz
        ixi, iyi, izi = [a.astype(_i32) for a in (ix, iy, iz)]
        ix1i, iy1i, iz1i = [a.astype(_i32) for a in (ix1, iy1, iz1)]
        # ownership: the containing voxel's clipped x (forward id_stream
        # rule — out-of-volume samples belong to the edge blocks)
        oxi = jnp.clip(ixi, 0, d1 - 1)
        owned = pix_ok & (oxi >= bx0) & (oxi < bx0 + block_x)
        valid = inside & owned
        neg1 = jnp.full((8, 128), -1, _i32)
        rid00 = jnp.where(valid, ixi * d2 + iyi, neg1)
        rid01 = jnp.where(valid, ixi * d2 + iy1i, neg1)
        rid10 = jnp.where(valid, ix1i * d2 + iyi, neg1)
        rid11 = jnp.where(valid, ix1i * d2 + iy1i, neg1)
        rids = (rid00, rid01, rid10, rid11)
        flats = (
            rid00 * d3 + izi, rid00 * d3 + iz1i,
            rid01 * d3 + izi, rid01 * d3 + iz1i,
            rid10 * d3 + izi, rid10 * d3 + iz1i,
            rid11 * d3 + izi, rid11 * d3 + iz1i,
        )

        corners_xy = ((ixi, iyi), (ixi, iy1i), (ix1i, iyi),
                      (ix1i, iy1i))
        taps = []
        for (cxi, cyi), rid in zip(corners_xy, rids):
            wrapn = (cyi == d2).astype(_i32)
            rx = cxi + wrapn
            ry = jnp.where(wrapn == 1, 0, cyi)
            ry = jnp.where(rid >= 0, ry, 0)
            g = ry // ypack
            g = jnp.where(ry >= (g + 1) * ypack, g + 1, g)
            g = jnp.where(ry < g * ypack, g - 1, g)
            growid = jnp.where(rid >= 0, rx * nyg + g, -1)
            base_lane = (ry - g * ypack) * zw
            for izv in (izi, iz1i):
                izc = jnp.where(valid, jnp.clip(izv, 0, d3), 0)
                lane = jnp.where(valid, base_lane + (izc >> 3), 0)
                shift = (izc & 7) * 4
                taps.append((growid, lane, shift, rx, g))
        rxmin = jnp.min(jnp.where(valid, taps[0][3], _BIG))
        rxmax = jnp.max(jnp.where(valid, taps[6][3], -1))
        gmin = jnp.min(jnp.where(
            valid, jnp.minimum(taps[0][4], taps[2][4]), _BIG))
        gmax = jnp.max(jnp.where(
            valid, jnp.maximum(taps[0][4], taps[2][4]), -1))
        # block-local rows: owned samples' taps reach at most x+2 (the
        # y-wrap quirk), i.e. local plane block_x+1 — inside the slot
        rowbase = bx0 * nyg
        rxmin_l = jnp.clip(rxmin - bx0, 0, block_x + 1)
        rxmax_l = jnp.clip(rxmax - bx0, 0, block_x + 1)

        def px_loop(dxi, accs):
            cx = rxmin_l + dxi

            def pg_loop(dgi, accs):
                cg = gmin + dgi
                crow = cx * nyg + cg
                crowc = jnp.clip(crow, 0, id_brm - 1)
                rowv = id_ref[pl.ds(crowc, 1), :]
                bc = jnp.broadcast_to(rowv, (8, 128))
                out = []
                for acc, (growid, lane, shift, _, _) in zip(accs, taps):
                    wv = jnp.take_along_axis(bc, lane, axis=1)
                    mid = jax.lax.shift_right_logical(wv, shift) & 15
                    out.append(jnp.where(
                        growid == crow + rowbase, mid, acc))
                return tuple(out)

            return jax.lax.fori_loop(0, gmax - gmin + 1, pg_loop, accs)

        zeros8i = tuple(jnp.zeros((8, 128), _i32) for _ in range(8))
        ids8 = list(jax.lax.fori_loop(
            0, rxmax_l - rxmin_l + 1, px_loop, zeros8i))
        ids8 = [jnp.where(fl < total, m, id0k)
                for m, fl in zip(ids8, flats)]

        wts = (
            (1 - fy) * (1 - fx) * (1 - fz), (1 - fy) * (1 - fx) * fz,
            fy * (1 - fx) * (1 - fz), fy * (1 - fx) * fz,
            (1 - fy) * fx * (1 - fz), (1 - fy) * fx * fz,
            fy * fx * (1 - fz), fy * fx * fz,
        )
        live = (((ci * STEPS + s_idx) < spr) & owned).astype(_f32)
        insf = inside.astype(_f32)
        coeffs = []
        for k in range(num_intervals):
            ck = jnp.zeros((8, 128), _f32)
            for idc, wt in zip(ids8, wts):
                ck = ck + jnp.where(idc == k, wt, 0.0)
            ck = ck * insf + (1.0 - insf) * (id0k == k).astype(_f32)
            coeffs.append(ck * live)
        a = jnp.zeros((8, 128), _f32)
        r = jnp.zeros((8, 128), _f32)
        gc = jnp.zeros((8, 128), _f32)
        b = jnp.zeros((8, 128), _f32)
        for k in range(num_intervals):
            r = r + coeffs[k] * tf_colors_ref[k, 0]
            gc = gc + coeffs[k] * tf_colors_ref[k, 1]
            b = b + coeffs[k] * tf_colors_ref[k, 2]
            a = a + coeffs[k] * tf_colors_ref[k, 3]
        gdotc = gr4 * r + gg4 * gc + gb4 * b
        return a, gdotc, coeffs

    def block_sweep(per_block, carry0):
        dma(0, 0).start()

        def body(it, carry):
            k0 = it * 2
            k1 = it * 2 + 1

            @pl.when(k1 < nxb)
            def _():
                dma(1, k1).start()

            dma(0, k0).wait()
            carry = per_block(0, k0, carry)

            @pl.when(k1 + 1 < nxb)
            def _():
                dma(0, k1 + 1).start()

            @pl.when(k1 < nxb)
            def _():
                dma(1, k1).wait()

            def late(c):
                return per_block(1, k1, c)

            return jax.lax.cond(k1 < nxb, late, lambda c: c, carry)

        npairs = -(-nxb // 2)
        return jax.lax.fori_loop(0, npairs, body, carry0)

    ones = jnp.ones((2, 128), _f32)
    zeros = jnp.zeros((2, 128), _f32)

    # ---- pass A: totals -------------------------------------------------
    def block_a(slot, kvis, carry):
        bk = bk_of(kvis)
        bx0 = bk * block_x
        c_lo, c_hi = crange(bk)

        def chunk_a(ci, carry):
            t, tot = carry
            a_all, gdotc_all, _ = sample_chunk(
                ci, bufs_ref.at[slot], bx0)
            for s in range(STEPS):
                sl = slice(2 * s, 2 * s + 2)
                a = a_all[sl]
                tot = tot + (t * a) * gdotc_all[sl]
                t = t * (1.0 - a)
            return t, tot

        def run(c):
            return jax.lax.fori_loop(c_lo, c_hi, chunk_a, c)

        live = jnp.max(carry[0]) > 0.0
        return jax.lax.cond(live, run, lambda c: c, carry)

    t_final, totalw = block_sweep(block_a, (ones, zeros))
    bg_term = t_final * g_t

    row_i = _iota(0, krows)
    col_i = _iota(1, krows)

    # ---- pass B: prefix re-march + scatter ------------------------------
    def block_b(slot, kvis, carry):
        bk = bk_of(kvis)
        bx0 = bk * block_x
        c_lo, c_hi = crange(bk)

        def chunk_b(ci, carry):
            t, pfx, dc = carry
            a_all, gdotc_all, coeffs = sample_chunk(
                ci, bufs_ref.at[slot], bx0)
            w_list, da_list = [], []
            for s in range(STEPS):
                sl = slice(2 * s, 2 * s + 2)
                a = a_all[sl]
                gd = gdotc_all[sl]
                w = t * a
                pfx = pfx + w * gd
                suffix = totalw - pfx
                denom = 1.0 - a
                num = suffix + bg_term
                da = t * gd - jnp.where(denom != 0.0, num / denom, 0.0)
                w_list.append(w)
                da_list.append(da)
                t = t * denom
            w_all = jnp.concatenate(w_list, axis=0)
            da_all = jnp.concatenate(da_list, axis=0)
            for k in range(num_intervals):
                ck = coeffs[k]
                dr = jnp.sum(ck * w_all * gr4)
                dg = jnp.sum(ck * w_all * gg4)
                db = jnp.sum(ck * w_all * gb4)
                dal = jnp.sum(ck * da_all)
                upd = jnp.where(
                    col_i == 0, dr,
                    jnp.where(col_i == 1, dg,
                              jnp.where(col_i == 2, db,
                                        jnp.where(col_i == 3, dal, 0.0))))
                dc = dc + jnp.where(row_i == k, upd, 0.0)
            return t, pfx, dc

        def run(c):
            return jax.lax.fori_loop(c_lo, c_hi, chunk_b, c)

        live = jnp.max(carry[0]) > 0.0
        return jax.lax.cond(live, run, lambda c: c, carry)

    _, _, dc = block_sweep(
        block_b, (ones, zeros, jnp.zeros((krows, 128), _f32)))
    dcol_ref[0, 0] = dc


def a5_diff_config_ok(volume: Volume, tf: TransferFunction,
                      config: RenderConfig) -> bool:
    """Backend-independent half of the a5 diff eligibility: plain a5
    classify on a layout the diff kernels implement.  Shared with the
    sharded predicate (parallel/render_dist._diff_segment_eligible),
    which substitutes its own backend/interpret check."""
    return (
        volume.channels == 1
        and not config.lighting
        and not config.scattering
        and tf.num_intervals <= 16
        and (volume.dims[2] <= 127
             or a5_packed_geometry(volume.dims, tf.num_intervals)
             is not None)
    )


def a5_diff_pallas_eligible(volume: Volume, tf: TransferFunction,
                            config: RenderConfig) -> bool:
    """Static predicate for the fused differentiable a5 path (TF-color
    gradients; bounds/volume grads are zero a.e. for the piecewise-
    constant per-corner classify)."""
    return (jax.default_backend() == "tpu"
            and a5_diff_config_ok(volume, tf, config))


@functools.lru_cache(maxsize=32)
def _make_a5_core(dims, num_intervals, width, height, spr, zpack, rows,
                  interpret, local_width=None):
    ntx = -(-(width if local_width is None else local_width) // TILE_PX)
    nty = -(-height // TILE_PY)
    krows = 8 if num_intervals <= 8 else 16

    fwd_kernel = functools.partial(
        _a5_kernel, dims=dims, num_intervals=num_intervals, width=width,
        height=height, spr=spr, baked_light=False, zpack=zpack,
        local_width=local_width)
    bwd_kernel = functools.partial(
        _a5_bwd_kernel, dims=dims, num_intervals=num_intervals,
        width=width, height=height, spr=spr, zpack=zpack, krows=krows,
        local_width=local_width)

    smem = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(4)]
    vol_spec = pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec = [pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    tile_shape = [jax.ShapeDtypeStruct((ntx, nty, 2, 128), _f32)
                  for _ in range(4)]

    def forward_tiles(colors, lower, upper, scal, vol_rows):
        return tuple(pl.pallas_call(
            fwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(ntx, nty),
                in_specs=smem + [vol_spec], out_specs=tile_spec),
            out_shape=tile_shape,
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows))

    @jax.custom_vjp
    def core(colors, lower, upper, scal, vol_rows):
        return forward_tiles(colors, lower, upper, scal, vol_rows)

    def core_fwd(colors, lower, upper, scal, vol_rows):
        return (forward_tiles(colors, lower, upper, scal, vol_rows),
                (colors, lower, upper, scal, vol_rows))

    def core_bwd(res, g):
        colors, lower, upper, scal, vol_rows = res
        dtiles = pl.pallas_call(
            bwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(ntx, nty),
                in_specs=smem + [vol_spec] + [
                    pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(4)
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, krows, 128), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((ntx, nty, krows, 128), _f32),
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows, *g)
        dcolors = dtiles.sum(axis=(0, 1))[:num_intervals, :4]
        z = jnp.zeros_like
        dvol = (np.zeros(vol_rows.shape, jax.dtypes.float0)
                if jnp.issubdtype(vol_rows.dtype, jnp.integer)
                else jnp.zeros_like(vol_rows))
        return (dcolors, z(lower), z(upper), z(scal), dvol)

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.lru_cache(maxsize=32)
def _make_a5_streamed_core(dims, num_intervals, width, height, spr, zpack,
                           block_x, nxb, id_brm, interpret,
                           local_width=None):
    """custom_vjp'd ID-STREAMING a5 tile renderer (beyond-VMEM a5
    training): (colors, lower, upper, scal, vol_rows) -> 4 tiles.  The
    packed id grid stays in HBM (pl.ANY) and streams per x-block through
    a double-buffered VMEM scratch — the forward is the existing
    id_stream _a5_kernel (early_eps = 0 via scal[6]); the backward is
    _a5_streamed_bwd_kernel, which streams every block TWICE."""
    w_local = width if local_width is None else local_width
    ntx = -(-w_local // TILE_PX)
    nty = -(-height // TILE_PY)
    krows = 8 if num_intervals <= 8 else 16

    fwd_kernel = functools.partial(
        _a5_kernel, dims=dims, num_intervals=num_intervals, width=width,
        height=height, spr=spr, baked_light=False, zpack=zpack,
        local_width=local_width, id_stream=True, id_brm=id_brm,
        nxb=nxb, block_x=block_x)
    bwd_kernel = functools.partial(
        _a5_streamed_bwd_kernel, dims=dims, num_intervals=num_intervals,
        width=width, height=height, spr=spr, zpack=zpack, krows=krows,
        block_x=block_x, nxb=nxb, id_brm=id_brm, local_width=local_width)

    smem = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(4)]
    vol_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_spec = [pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    tile_shape = [jax.ShapeDtypeStruct((ntx, nty, 2, 128), _f32)
                  for _ in range(4)]
    scratch = [pltpu.VMEM((2, id_brm, 128), jnp.int32),
               pltpu.SemaphoreType.DMA((2,))]

    def forward_tiles(colors, lower, upper, scal, vol_rows):
        return tuple(pl.pallas_call(
            fwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(ntx, nty),
                in_specs=smem + [vol_spec], out_specs=tile_spec,
                scratch_shapes=scratch),
            out_shape=tile_shape,
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows))

    @jax.custom_vjp
    def core(colors, lower, upper, scal, vol_rows):
        return forward_tiles(colors, lower, upper, scal, vol_rows)

    def core_fwd(colors, lower, upper, scal, vol_rows):
        return (forward_tiles(colors, lower, upper, scal, vol_rows),
                (colors, lower, upper, scal, vol_rows))

    def core_bwd(res, g):
        colors, lower, upper, scal, vol_rows = res
        dtiles = pl.pallas_call(
            bwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(ntx, nty),
                in_specs=smem + [vol_spec] + [
                    pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(4)
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, krows, 128), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch),
            out_shape=jax.ShapeDtypeStruct((ntx, nty, krows, 128), _f32),
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows, *g)
        dcolors = dtiles.sum(axis=(0, 1))[:num_intervals, :4]
        z = jnp.zeros_like
        dvol = np.zeros(vol_rows.shape, jax.dtypes.float0)
        return (dcolors, z(lower), z(upper), z(scal), dvol)

    core.defvjp(core_fwd, core_bwd)
    return core


def _a5_diff_tiles(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
):
    """Shared differentiable a5 driver -> (cr, cg, cb, t) tiles of the
    ray-column x sample-segment work unit (full render: offsets 0).
    Offsets may be traced (axis_index-derived); shapes are static."""
    d1, d2, d3 = volume.dims
    if volume.channels != 1:
        raise ValueError("a5 diff path supports single-channel volumes")
    if config.lighting or config.scattering:
        raise ValueError("a5 diff path is the plain a5 classify")
    if tf.num_intervals > 16:
        raise ValueError("a5 diff path supports at most 16 TF intervals")
    sg = jax.lax.stop_gradient

    zpack = None
    id0 = jnp.zeros((), _f32)
    if d3 > 127:
        zpack = a5_packed_geometry(volume.dims, tf.num_intervals)
        if zpack is None:
            raise ValueError(
                f"dims {volume.dims} fit neither a5 layout")
        tf_sg = TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                                 colors=sg(tf.colors), hg_g=tf.hg_g)
        vol_rows, id0 = a5_pack_id_grid(volume, tf_sg, zpack)
    else:
        vol_rows = _stage_rows_a5(volume)
    rows = vol_rows.shape[0]

    w, h = config.width, config.height
    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count
    iv = T.inverse(camera.look_at_origin_view())
    L = float(volume.longest_dimension)
    m3 = [volume.dims[c] / 2.0 - L / 2.0 + 0.5 * L for c in range(3)]
    scal = jnp.concatenate([
        jnp.asarray([
            config.real_screen_width / config.width,
            config.real_screen_height / config.height,
            -config.viewplane_distance / config.samples_per_ray,
            -config.real_screen_width / 2.0,
            -config.real_screen_height / 2.0,
        ], _f32),
        jnp.asarray(volume.cal_max, _f32).reshape(1),
        jnp.zeros((1,), _f32),  # early_eps pinned to 0
        iv[:3, :4].reshape(-1).astype(_f32),
        jnp.asarray(m3, _f32),
        jnp.asarray([L], _f32),
        id0.reshape(1),
        jnp.asarray(x_offset, _f32)[None],  # [24] ray-column offset
        jnp.asarray(s_start, _f32)[None],  # [25] sample-segment start
    ])

    core = _make_a5_core(
        volume.dims, tf.num_intervals, w, h, s_count,
        zpack, rows, bool(interpret), local_width)
    cr, cg, cb, t = core(tf.colors, tf.lower, tf.upper, scal, vol_rows)

    ntx = -(-w_local // TILE_PX)
    nty = -(-h // TILE_PY)

    def unpack(a):
        a = a.reshape(ntx, nty, TILE_PX, TILE_PY)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * TILE_PX, nty * TILE_PY)
        return a[:w_local, :h]

    return unpack(cr), unpack(cg), unpack(cb), unpack(t)


def render_test_pallas_diff_segment(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    interpret: bool = False,
):
    """Shard_map-friendly DIFFERENTIABLE fused a5 work unit -> (C, T)
    segment — the a5 twin of
    ops/pallas_march_vjp.render_vrc_pallas_diff_segment (round-4 VERDICT
    item 3): marches ray columns [x_offset, x_offset + local_width) x
    samples [s_start, s_start + s_count) through the custom_vjp a5 core,
    so ``jax.grad`` of a sharded a5 loss runs the fused forward AND
    backward kernels on every device (rays/samples axes; volume slabs
    stay on the XLA scan segments).  Matches
    /root/reference/kernel.cu:72-187 under shard_map transposition."""
    cr, cg, cb, t = _a5_diff_tiles(
        volume, tf, camera, config, interpret=interpret,
        x_offset=x_offset, local_width=local_width,
        s_start=s_start, s_count=s_count)
    return jnp.stack([cr, cg, cb], axis=-1), t[..., None]


def a5_diff_streamed_eligible(volume: Volume, tf: TransferFunction,
                              config: RenderConfig) -> bool:
    """Static predicate for the ID-STREAMING differentiable a5 path:
    beyond-VMEM a5 volumes (packed id grid past the resident
    a5_packed_geometry budget, 512^3-class) train through the manual-DMA
    custom_vjp core instead of falling to the XLA scan.  The resident
    tier (a5_diff_pallas_eligible) is preferred when it fits; fit.py
    tries it first."""
    return (
        jax.default_backend() == "tpu"
        and volume.channels == 1
        and not config.lighting
        and not config.scattering
        and tf.num_intervals <= 16
        and volume.dims[2] > 127
        and a5_packed_geometry(volume.dims, tf.num_intervals) is None
        and a5_stream_geometry(volume.dims, tf.num_intervals) is not None
    )


def _a5_streamed_diff_tiles(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    id_stream_block: int | None = None,
):
    """Differentiable ID-STREAMING a5 driver -> (cr, cg, cb, t) tiles.
    ``id_stream_block`` overrides the auto block size (tests force
    multi-block streaming on small volumes).

    Packs the 4-bit interval-id grid once from the x-padded volume
    (block grid + 2 margin planes, exactly as the forward id_stream
    staging in render_test_pallas) with stop-gradient bounds — the grid
    depends only on gradient-inert interval bounds, so TF-color
    gradients through the custom_vjp core are exact.  The forward
    streams each block once, the backward twice.  Matches
    /root/reference/kernel.cu:72-187 + kernel.cu:1036-1043."""
    d1, d2, d3 = volume.dims
    if volume.channels != 1:
        raise ValueError("a5 diff path supports single-channel volumes")
    if config.lighting or config.scattering:
        raise ValueError("a5 diff path is the plain a5 classify")
    if tf.num_intervals > 16:
        raise ValueError("a5 diff path supports at most 16 TF intervals")
    if d3 <= 127:
        raise ValueError(
            "z <= 127 volumes use the resident f32 a5 diff path")
    geo = a5_stream_geometry(volume.dims, tf.num_intervals)
    if geo is None:
        raise ValueError(
            f"dims {volume.dims} / {tf.num_intervals} intervals do not "
            "fit the packed id layout (z <= 1023)")
    zw_, yp_, nyg_, bx, nxb = geo
    if id_stream_block is not None:
        if id_stream_block % 8:
            raise ValueError("id_stream_block must be 8-aligned")
        bx = id_stream_block
        nxb = _pad_to(d1, bx) // bx
    zpack = (zw_, yp_, nyg_)

    import dataclasses as _dc

    sg = jax.lax.stop_gradient
    tf_sg = TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(tf.colors), hg_g=tf.hg_g)
    d1p = nxb * bx
    pad_x = d1p + 2 - d1
    data_p = jnp.pad(volume.data.reshape(volume.dims),
                     ((0, pad_x), (0, 0), (0, 0)))
    vol_pad = _dc.replace(volume, data=data_p, dims=(d1p + 2, d2, d3))
    vol_rows, id0 = a5_pack_id_grid(vol_pad, tf_sg, zpack)
    id_brm = (bx + 2) * zpack[2]

    w, h = config.width, config.height
    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count
    iv = T.inverse(camera.look_at_origin_view())
    L = float(volume.longest_dimension)
    m3 = [volume.dims[c] / 2.0 - L / 2.0 + 0.5 * L for c in range(3)]
    scal = jnp.concatenate([
        jnp.asarray([
            config.real_screen_width / config.width,
            config.real_screen_height / config.height,
            -config.viewplane_distance / config.samples_per_ray,
            -config.real_screen_width / 2.0,
            -config.real_screen_height / 2.0,
        ], _f32),
        jnp.asarray(volume.cal_max, _f32).reshape(1),
        jnp.zeros((1,), _f32),  # early_eps pinned to 0
        iv[:3, :4].reshape(-1).astype(_f32),
        jnp.asarray(m3, _f32),
        jnp.asarray([L], _f32),
        id0.reshape(1),
        jnp.asarray(x_offset, _f32)[None],
        jnp.asarray(s_start, _f32)[None],
    ])

    core = _make_a5_streamed_core(
        volume.dims, tf.num_intervals, w, h, s_count, zpack,
        bx, nxb, id_brm, bool(interpret), local_width)
    cr, cg, cb, t = core(tf.colors, tf.lower, tf.upper, scal, vol_rows)

    ntx = -(-w_local // TILE_PX)
    nty = -(-h // TILE_PY)

    def unpack(a):
        a = a.reshape(ntx, nty, TILE_PX, TILE_PY)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * TILE_PX, nty * TILE_PY)
        return a[:w_local, :h]

    return unpack(cr), unpack(cg), unpack(cb), unpack(t)


def render_test_pallas_diff_streamed(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    id_stream_block: int | None = None,
) -> jnp.ndarray:
    """Beyond-VMEM a5 render -> [W, H, 4], differentiable w.r.t.
    ``tf.colors`` through the ID-STREAMING custom_vjp core
    (_make_a5_streamed_core): the 4-bit id grid stays in HBM, the
    forward streams each x-block once and the backward twice —
    512^3-class a5 fits leave the XLA scan floor.

    Value-identical to ``render_test_pallas(..., early_eps=0,
    id_stream_block=...)``; gradients match ``jax.grad`` through the XLA
    a5 scan (a == 1 caveat as the a1 diff kernel).  No lighting/
    scattering (fit those via the XLA path)."""
    w, h = config.width, config.height
    cr, cg, cb, t = _a5_streamed_diff_tiles(
        volume, tf, camera, config, interpret=interpret,
        id_stream_block=id_stream_block)
    bg = jnp.asarray(config.background, _f32)
    rgb = [c + t * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)


def render_test_pallas_diff_streamed_segment(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    interpret: bool = False,
    id_stream_block: int | None = None,
):
    """Shard_map-friendly DIFFERENTIABLE id-streaming a5 work unit ->
    (C, T) segment — the beyond-VMEM twin of
    ``render_test_pallas_diff_segment``: a rays/samples-axis mesh fit of
    a 512^3-class a5 volume runs the manual-DMA custom_vjp core on every
    device instead of the XLA scan segments.  Matches
    /root/reference/kernel.cu:72-187 + kernel.cu:1036-1043 under
    shard_map transposition."""
    cr, cg, cb, t = _a5_streamed_diff_tiles(
        volume, tf, camera, config, interpret=interpret,
        x_offset=x_offset, local_width=local_width,
        s_start=s_start, s_count=s_count,
        id_stream_block=id_stream_block)
    return jnp.stack([cr, cg, cb], axis=-1), t[..., None]


def render_test_pallas_diff(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """a5/TEST render -> [W, H, 4], differentiable w.r.t. ``tf.colors``
    through fused Pallas forward AND backward kernels (f32 rows for
    z <= 127, the packed 4-bit interval-id grid otherwise — the grid
    depends only on gradient-inert bounds, so color gradients are exact).

    Value-identical to ``render_test_pallas(..., early_eps=0)``; gradients
    match ``jax.grad`` through the XLA a5 scan (a == 1 caveat as the a1
    diff kernel).  No lighting/scattering (fit those via the XLA path)."""
    w, h = config.width, config.height
    cr, cg, cb, t = _a5_diff_tiles(
        volume, tf, camera, config, interpret=interpret)
    bg = jnp.asarray(config.background, _f32)
    rgb = [c + t * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)
