"""Differentiable fused Pallas ray-march: custom forward + backward kernels.

BASELINE.json's north star asks for "fused differentiable Pallas
forward+backward kernels" with gradients w.r.t. transfer-function
parameters and density.  The plain XLA scan renderer (models/raycast.py)
is differentiable but slow; the fused forward kernel (ops/pallas_march.py)
is ~25x faster but ``pallas_call`` has no autodiff rule.  This module
closes the gap with ``jax.custom_vjp``:

  forward  = the existing fused march (_march_kernel), early_eps = 0
  backward = a handwritten Pallas kernel (_march_bwd_kernel) that
             re-marches each ray tile twice and emits dL/d(tf colors)

Backward math (front-to-back "over" in (C, T) form, the transmittance
rewrite of blendSampleColors kernel.cu:194-225):

  forward:  w_s = T_s a_s,  C += w_s c_s,  T_{s+1} = T_s (1 - a_s)
  output:   rgb = C + T_N * bg                    (alpha forced 1)

With upstream cotangents g (per ray, rgb) and gT (for the T output):

  dL/dc_s      = g * T_s a_s                                  (per channel)
  dL/da_s      = T_s (g . c_s) - (S_{>s} + T_N gT) / (1 - a_s)
  where S_{>s} = sum_{j>s} T_j a_j (g . c_j)   (suffix of weighted colors)

computed in two passes per tile: pass A accumulates the total
sum_j T_j a_j (g . c_j) and T_N; pass B re-marches keeping the prefix P_s
so S_{>s} = total - P_s needs no per-sample storage (O(1) memory per ray,
same trick as the forward's streaming rewrite of the reference's 3.92 GB
sample buffer).  Per-sample gradients scatter into the [K, 4] color table
through the last-match-wins interval masks (TransferFunction.cu:46-55);
per-tile [K, 4] partials are summed across tiles in XLA.

Exactness: matches jax.grad through the XLA scan renderer (mode="fast")
up to float reassociation, EXCEPT at a_s == 1 exactly, where the
(1 - a_s) division is gated to 0 (the true limit needs a third pass; no
reference material has alpha 1 — Material.cpp:5-67 maxes at 0.7 — and
optimization states hitting exactly 1.0f are measure-zero).

Unlike the forward, the backward marches ALL samples (no box clipping, no
occupancy-brick skip): a sample with alpha 0 still carries a non-zero
alpha-gradient (raising its opacity would add color), so empty-space
skips that are exact for values are NOT exact for parameter gradients.
Early ray termination (T == 0) stays exact in both directions and is
what the backward's suffix arithmetic degrades to gracefully.

Gradients are exposed for ``tf.colors`` (and, by chain rule through an
external alpha-column fold, a global density scale — diff/fit.py) and,
when a traced light is passed, for the 10 Blinn-Phong light parameters
through the baked-light path (``_make_lit_core``: the render is linear
in the baked (M, S) grids, so dL/dlight is computed with tangent forward
kernel calls).  Cotangents for the volume, camera, and TF bounds are
zero through this path: volume/bounds grads are zero a.e. anyway under
nearest-neighbor sampling + a piecewise-constant TF (SURVEY.md §7
"differentiability of non-smooth ops"); camera grads require the XLA
renderer.
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
from .pallas_march import (
    STEPS,
    TILE_PX,
    TILE_PY,
    _BIG,
    _iota,
    _march_kernel,
    _pad_to,
)

_f32 = jnp.float32
_i32 = jnp.int32


def _march_bwd_kernel(
    # SMEM
    scal_ref,  # [32] f32 (same layout as _march_kernel)
    tf_lower_ref,  # [K]
    tf_upper_ref,  # [K]
    tf_colors_ref,  # [K, 4]
    # VMEM
    vol_ref,  # [pad8(d1*d2), 128] f32 rows, or the packed material grid
    *rest,  # [mg_ref, sg_ref (baked_light)] g_r/g/b/t_ref, dcol_ref
    dims: Tuple[int, int, int],
    depth: int,
    num_intervals: int,
    width: int,
    height: int,
    spr: int,
    conic: bool,
    zpack: Tuple[int, int, int] | None = None,
    krows: int = 8,
    baked_light: bool = False,
    local_width: int | None = None,
    slab_x: int | None = None,
    lut_n: int = 0,
    mc_grids: int = 0,
):
    """``spr`` is the LOCAL sample count of this segment (the global
    sample index is ``scal[30] + local``) and ``local_width``/``scal[29]``
    carry the ray-column tile, exactly as in the forward ``_march_kernel``
    — full renders pass x_offset = s_start = 0 so the two coincide.  The
    same prefix/suffix math applies per segment because the custom_vjp
    core's outputs ARE the (C, T) segment pair: ``g_t`` is the upstream
    cotangent of the segment-final transmittance, whether that flows from
    the caller's ``+ T * bg`` (full render) or from transposing
    ops/composite.segment_compose (sharded segments).

    ``slab_x``/``scal[31]`` carry a volume x-slab exactly as in the
    forward: ``vol_ref`` (and the baked (M, S) rows) hold only the
    slab's rows, every sample is owned by the slab of its x-clamped
    voxel (ops/sampling.octree_nn_sample_slab), and non-owned samples
    are the over identity — their alpha is forced 0 AND their interval
    scatter is dropped (an outside-volume sample owned by this slab
    still scatters into TF(0)'s interval, exactly like the replicated
    backward).  Summed over slabs (shard_map's psum), the gradients
    equal the replicated backward's because ownership partitions the
    sample set.

    ``baked_light``: the forward shades classified colors with baked
    per-voxel factors, c' = c * M + S (ops/pallas_march.bake_light_grids).
    M and S are volume-only quantities — constants w.r.t. the TF colors —
    so the chain rule just scales the rgb scatter by the sample's M
    (dC/dc_k = w * M) and routes the alpha gradient through the SHADED
    g.c' (the (M, S) grids themselves get zero cotangents).

    ``mc_grids``: 4-D multi-channel mode (round-5) — the sample's rgb
    comes from the normalized channel grids (data-only, zero color
    cotangents) and only its ALPHA classifies (packed mean-id grid), so
    the color table receives alpha-column gradients only."""
    rest = list(rest)
    mg_ref = rest.pop(0) if baked_light else None
    sg_ref = rest.pop(0) if baked_light else None
    mc_refs = tuple(rest.pop(0) for _ in range(mc_grids))
    g_r_ref, g_g_ref, g_b_ref, g_t_ref, dcol_ref = rest
    d1, d2, d3 = dims
    packed = zpack is not None
    if packed:
        zw, ypack, nyg = zpack
    L = np.float32(max(dims))
    n = np.float32(2**depth)
    nchunks = -(-spr // STEPS)
    hg = [np.float32(L / 2) - np.float32(d / 2) for d in dims]
    hg_hi = [np.float32(hg[c] + np.float32(dims[c])) for c in range(3)]
    halfd = [np.float32(d / 2) for d in dims]
    halfL = np.float32(L / 2)

    ds = scal_ref[0]
    clip = scal_ref[1]
    cal_max = scal_ref[2]
    pos = [scal_ref[5 + c] for c in range(3)]
    front = [scal_ref[8 + c] for c in range(3)]
    right = [scal_ref[11 + c] for c in range(3)]
    up = [scal_ref[14 + c] for c in range(3)]
    tl = [scal_ref[17 + c] for c in range(3)]
    rsw = scal_ref[20]
    rsh = scal_ref[21]
    x_off_i = scal_ref[29].astype(_i32)  # ray-column offset (segments)
    s_start_i = scal_ref[30].astype(_i32)  # global index of local sample 0
    x0_i = scal_ref[31].astype(_i32)  # volume-slab x offset (slab mode)
    lw = width if local_width is None else local_width
    slab = slab_x is not None

    tx = pl.program_id(0)
    ty = pl.program_id(1)

    # ---- ray setup: identical expressions to _march_kernel ------------
    e = _iota(0) * 128 + _iota(1)
    s_idx = e // 256
    f = e % 256
    u = f // TILE_PY
    v = f % TILE_PY
    lxp = tx * TILE_PX + u  # local pixel column
    pxi = lxp + x_off_i  # global pixel column (ray math uses global)
    pyi = ty * TILE_PY + v
    pix_ok = (lxp < lw) & (pyi < height)
    px = pxi.astype(_f32)
    py = pyi.astype(_f32)

    xt = [((px * rsw) / np.float32(width)) * right[c] for c in range(3)]
    yt = [((py * rsh) / np.float32(height)) * (-up[c]) for c in range(3)]
    if conic:
        o = [jnp.zeros((8, 128), _f32) + pos[c] for c in range(3)]
        rd = [tl[c] + xt[c] + yt[c] - pos[c] for c in range(3)]
        inv = jax.lax.rsqrt(rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2])
        d = [rd[c] * inv for c in range(3)]
    else:
        o = [(tl[c] + xt[c]) + yt[c] for c in range(3)]
        d = [jnp.zeros((8, 128), _f32) + front[c] for c in range(3)]

    # upstream cotangents per ray, broadcast to the 4-step register rows
    g_r = g_r_ref[0, 0]  # [2, 128]
    g_g = g_g_ref[0, 0]
    g_b = g_b_ref[0, 0]
    g_t = g_t_ref[0, 0]
    gr4 = jnp.concatenate([g_r] * STEPS, axis=0)
    gg4 = jnp.concatenate([g_g] * STEPS, axis=0)
    gb4 = jnp.concatenate([g_b] * STEPS, axis=0)

    def sample_chunk(ci):
        """(a, r, g, b, gdotc) [8,128] for chunk ci's 4 steps x 256 rays.

        Mirrors _march_kernel's ``work`` fetch (same dyadic-snap index
        chain, ops/sampling.py semantics) minus the T>eps footprint drop —
        zero-T samples carry zero gradient regardless of classification,
        so fetching their true value is equally exact and branch-free.
        """
        i_f = (s_start_i + ci * STEPS + s_idx).astype(_f32)
        ti = i_f * ds + clip  # kernel.cu:54,59
        p = [(o[c] + ti * d[c]) + 0.5 for c in range(3)]  # modelAux
        inside = pix_ok
        for c in range(3):
            inside &= (p[c] >= 0.0) & (p[c] < 1.0)
        res = [(jnp.floor(p[c] * n) / n) * L for c in range(3)]
        valid = inside
        for c in range(3):
            valid &= (res[c] >= hg[c]) & (res[c] < hg_hi[c])
        ijk = [jnp.trunc((res[c] + halfd[c]) - halfL).astype(_i32)
               for c in range(3)]
        if slab:
            # ownership: the slab of the sample's x-clamped voxel (same
            # clamp as the forward _march_kernel slab mode); non-owned
            # samples contribute NOTHING to this device's gradients
            gx = jnp.clip(ijk[0], 0, d1 - 1)
            owned = (gx >= x0_i) & (gx < x0_i + slab_x)
            valid &= owned
            lxv = ijk[0] - x0_i
        else:
            owned = None
            lxv = ijk[0]
        if packed:
            # material-id grid fetch (mirrors _march_kernel's packed mode)
            ygrp = jnp.where(valid, ijk[1] // ypack, 0)
            rowid = jnp.where(valid, lxv * nyg + ygrp, -1)
            iz = jnp.where(
                valid, (ijk[1] - ygrp * ypack) * zw + ijk[2] // 8, 0)
            ry = ygrp
            stride = nyg
            acc_dtype = _i32
        else:
            rowid = jnp.where(valid, lxv * d2 + ijk[1], -1)
            iz = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
            ry = ijk[1]
            stride = d2
            acc_dtype = _f32
        rxmin = jnp.min(jnp.where(valid, lxv, _BIG))
        rymin = jnp.min(jnp.where(valid, ry, _BIG))
        rxmax = jnp.max(jnp.where(valid, lxv, -1))
        rymax = jnp.max(jnp.where(valid, ry, -1))

        def fx(dx, acc):
            cx = rxmin + dx

            def fy(dy, acc):
                cy = rymin + dy
                crow = cx * stride + cy
                rowv = vol_ref[pl.ds(crow, 1), :]
                bc = jnp.broadcast_to(rowv, (8, 128))
                g = jnp.take_along_axis(bc, iz, axis=1)
                return jnp.where(rowid == crow, g, acc)

            return jax.lax.fori_loop(0, rymax - rymin + 1, fy, acc)

        acc = jax.lax.fori_loop(
            0, rxmax - rxmin + 1, fx, jnp.zeros((8, 128), acc_dtype))

        # last-match-wins interval masks (TransferFunction.cu:46-55)
        if packed:
            sh = (ijk[2] & 7) * 4
            mid = jax.lax.shift_right_logical(acc, sh) & 15
            id0 = scal_ref[28].astype(_i32)
            mid = jnp.where(valid, mid, id0)
            matches = [mid == k for k in range(num_intervals)]
        else:
            vn = jnp.maximum(acc, 0.0) / cal_max
            if lut_n:
                # dense-LUT classify (round-4 VERDICT item 7): the LUT
                # entry at idx = round(vn * (N-1)) IS colors[k(idx/(N-1))]
                # (tf.to_lut), so quantizing vn to the grid point before
                # the interval scan reproduces the forward's selection —
                # per-sample gradients scatter into the true interval
                idx = jnp.clip(
                    jnp.round(vn * np.float32(lut_n - 1)), 0.0,
                    np.float32(lut_n - 1))
                vn = idx / np.float32(lut_n - 1)
            matches = []
            seen = jnp.zeros((8, 128), jnp.bool_)
            for k in range(num_intervals - 1, -1, -1):
                m = (vn >= tf_lower_ref[k]) & (vn <= tf_upper_ref[k])
                matches.append(m & ~seen)
                seen = seen | m
            matches.reverse()
            matches[0] = matches[0] | ~seen  # no-match fallback -> interval 0

        out = [jnp.zeros((8, 128), _f32) for _ in range(4)]
        for k in range(num_intervals):
            mf = matches[k].astype(_f32)
            for c in range(4):
                out[c] = out[c] + mf * tf_colors_ref[k, c]
        a, r, g, b = out[3], out[0], out[1], out[2]
        mval = jnp.ones((8, 128), _f32)
        if mc_grids:
            # multichannel: rgb comes from the normalized channel grids
            # (data-only — zero cotangents), valid-masked to 0 outside,
            # exactly as the forward's fetch_f32_grids; the classify
            # above supplied only the alpha column
            rowid_f = jnp.where(valid, lxv * d2 + ijk[1], -1)
            iz_f = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
            rfxmin = jnp.min(jnp.where(valid, lxv, _BIG))
            rfymin = jnp.min(jnp.where(valid, ijk[1], _BIG))
            rfxmax = jnp.max(jnp.where(valid, lxv, -1))
            rfymax = jnp.max(jnp.where(valid, ijk[1], -1))

            def cfx(dxi, accs):
                cx = rfxmin + dxi

                def cfy(dyi, accs):
                    crow = cx * d2 + (rfymin + dyi)
                    sel = rowid_f == crow
                    out2 = []
                    for ref, acc2 in zip(mc_refs, accs):
                        bm = jnp.broadcast_to(
                            ref[pl.ds(crow, 1), :], (8, 128))
                        out2.append(jnp.where(
                            sel,
                            jnp.take_along_axis(bm, iz_f, axis=1),
                            acc2))
                    return tuple(out2)

                return jax.lax.fori_loop(
                    0, rfymax - rfymin + 1, cfy, accs)

            vals = jax.lax.fori_loop(
                0, rfxmax - rfxmin + 1, cfx,
                tuple(jnp.zeros((8, 128), _f32) for _ in mc_refs))
            vals = [jnp.where(valid, v, 0.0) for v in vals]
            if mc_grids == 1:
                r = g = b = vals[0]
            else:
                r, g, b = vals
        if baked_light:
            # fetch the baked (M, S) factors at the sample voxel (f32 row
            # layout regardless of the main grid's packing) and shade:
            # c' = c * M + S — mirrors _march_kernel's baked_light block
            rowid_f = jnp.where(valid, lxv * d2 + ijk[1], -1)
            iz_f = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
            rfxmin = jnp.min(jnp.where(valid, lxv, _BIG))
            rfymin = jnp.min(jnp.where(valid, ijk[1], _BIG))
            rfxmax = jnp.max(jnp.where(valid, lxv, -1))
            rfymax = jnp.max(jnp.where(valid, ijk[1], -1))

            def bfx(dxi, accs2):
                cx = rfxmin + dxi

                def bfy(dyi, accs2):
                    am, asp = accs2
                    crow = cx * d2 + (rfymin + dyi)
                    sel = rowid_f == crow
                    bm = jnp.broadcast_to(
                        mg_ref[pl.ds(crow, 1), :], (8, 128))
                    am = jnp.where(
                        sel, jnp.take_along_axis(bm, iz_f, axis=1), am)
                    bs = jnp.broadcast_to(
                        sg_ref[pl.ds(crow, 1), :], (8, 128))
                    asp = jnp.where(
                        sel, jnp.take_along_axis(bs, iz_f, axis=1), asp)
                    return am, asp

                return jax.lax.fori_loop(0, rfymax - rfymin + 1, bfy, accs2)

            zf2 = jnp.zeros((8, 128), _f32)
            am, asp = jax.lax.fori_loop(
                0, rfxmax - rfxmin + 1, bfx, (zf2, zf2))
            mval = jnp.where(valid, am, 1.0)
            sval = jnp.where(valid, asp, 0.0)
            r = r * mval + sval
            g = g * mval + sval
            b = b * mval + sval
        # mask steps beyond spr in the last chunk (matches the forward gate)
        live = (ci * STEPS + s_idx) < spr
        if slab:
            # non-owned samples are the over identity on this device:
            # zero alpha in the march recurrence AND no interval scatter
            # (live gates both below)
            live &= owned
        a = a * live.astype(_f32)
        gdotc = gr4 * r + gg4 * g + gb4 * b
        return a, gdotc, matches, live, mval

    # ---- pass A: total weighted-color sum + final transmittance -------
    def pass_a(ci, carry):
        t, tot = carry
        a_all, gdotc_all, _, _, _ = sample_chunk(ci)
        for s in range(STEPS):
            sl = slice(2 * s, 2 * s + 2)
            a = a_all[sl]
            w = t * a
            tot = tot + w * gdotc_all[sl]
            t = t * (1.0 - a)
        return t, tot

    ones = jnp.ones((2, 128), _f32)
    zeros = jnp.zeros((2, 128), _f32)
    t_final, total = jax.lax.fori_loop(0, nchunks, pass_a, (ones, zeros))
    bg_term = t_final * g_t  # d(rgb)/dT_N routed through the caller's + T*bg

    row_i = _iota(0, krows)
    col_i = _iota(1, krows)

    # ---- pass B: prefix re-march + per-interval gradient scatter ------
    def pass_b(ci, carry):
        t, pfx, dc = carry
        a_all, gdotc_all, matches, live, mval = sample_chunk(ci)
        w_list, da_list = [], []
        for s in range(STEPS):
            sl = slice(2 * s, 2 * s + 2)
            a = a_all[sl]
            gd = gdotc_all[sl]
            w = t * a
            pfx = pfx + w * gd  # same op order as pass A => suffix exact
            suffix = total - pfx
            denom = 1.0 - a
            num = suffix + bg_term
            da = t * gd - jnp.where(denom != 0.0, num / denom, 0.0)
            w_list.append(w)
            da_list.append(da)
            t = t * denom
        w_all = jnp.concatenate(w_list, axis=0)
        da_all = jnp.concatenate(da_list, axis=0)
        # dC/dc_k = w (x M when the forward shades c' = c * M + S);
        # multichannel rgb comes from the data grids -> zero rgb scatter
        wc = w_all * mval if baked_light else w_all
        zscat = jnp.zeros((), _f32)
        for k in range(num_intervals):
            mf = (matches[k] & live).astype(_f32)
            if mc_grids:
                dr = dg = db = zscat
            else:
                dr = jnp.sum(mf * wc * gr4)
                dg = jnp.sum(mf * wc * gg4)
                db = jnp.sum(mf * wc * gb4)
            dal = jnp.sum(mf * da_all)
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


@functools.lru_cache(maxsize=32)
def _make_core(dims, depth, num_intervals, width, height, spr, conic,
               nb, rows, interpret, zpack=None, baked=False,
               local_width=None, slab_x=None, lut_n=0, lut_rows_n=0):
    """Build (and cache per static config) the custom_vjp'd tile renderer:
    (colors, lower, upper, scal, vol_rows, occ, mg, sgd)
    -> (cr, cg, cb, t) tiles.

    ``local_width``/``spr`` describe the LOCAL work unit (a ray-column
    tile x a sample segment) for shard_map use; the traced offsets ride
    ``scal[29]``/``scal[30]``.  Full renders leave local_width=None and
    offsets 0.

    ``occ``/``scal[4]`` are skip-control inputs (they affect which chunks
    are marched, never the value — all skips are alpha=0-exact), computed
    by the caller under stop_gradient; their cotangents are zero.  With
    ``zpack`` set, ``vol_rows`` is the packed material-id grid (i32) and
    both kernels run in packed mode (z <= 1024, bit-exact vs f32).  With
    ``baked``, ``mg``/``sgd`` are the per-voxel Phong factor grids (f32
    rows; volume-only quantities, zero cotangents) and both kernels shade
    c' = c * M + S; otherwise they are ignored dummies."""
    ntx = -(-(width if local_width is None else local_width) // TILE_PX)
    nty = -(-height // TILE_PY)
    krows = 8 if num_intervals <= 8 else 16
    # baked (M, S) rows cover the slab only in slab mode (like vol_rows)
    mrows = _pad_to((slab_x if slab_x is not None else dims[0])
                    * dims[1], 8)

    fwd_kernel = functools.partial(
        _march_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=conic,
        density_scale=1.0, nbricks=nb, zpack=zpack, baked_light=baked,
        local_width=local_width, slab_x=slab_x, lut_n=lut_n,
    )
    bwd_kernel = functools.partial(
        _march_bwd_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=conic,
        zpack=zpack, krows=krows, baked_light=baked,
        local_width=local_width, slab_x=slab_x, lut_n=lut_n,
    )

    # forward-only extras: dense LUT rows (the backward re-derives the
    # interval from the quantized vn instead)
    lut_specs = [
        pl.BlockSpec((lut_rows_n, 128), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM)
    ] if lut_n else []
    baked_specs = [
        pl.BlockSpec((mrows, 128), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(2)
    ] if baked else []

    fwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntx, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
            pl.BlockSpec(memory_space=pltpu.SMEM),  # occupancy bricks
            pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + lut_specs + baked_specs,  # [LUT rows] [M rows, S rows]
        out_specs=[
            pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )
    tile_shape = [jax.ShapeDtypeStruct((ntx, nty, 2, 128), _f32)
                  for _ in range(4)]

    bwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntx, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
            pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # volume
        ] + baked_specs + [
            pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)  # 4 cotangent tile arrays
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec((1, 1, krows, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def forward_tiles(colors, lower, upper, scal, vol_rows, occ, mg, sgd,
                      lut_rows):
        extra = ((lut_rows,) if lut_n else ()) + ((mg, sgd) if baked
                                                 else ())
        out = pl.pallas_call(
            fwd_kernel,
            grid_spec=fwd_grid_spec,
            out_shape=tile_shape,
            interpret=interpret,
        )(scal, lower, upper, colors, occ, vol_rows, *extra)
        return tuple(out)

    @jax.custom_vjp
    def core9(colors, lower, upper, scal, vol_rows, occ, mg, sgd,
              lut_rows):
        return forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                             mg, sgd, lut_rows)

    def core_fwd(colors, lower, upper, scal, vol_rows, occ, mg, sgd,
                 lut_rows):
        out = forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                            mg, sgd, lut_rows)
        return out, (colors, lower, upper, scal, vol_rows, occ, mg, sgd,
                     lut_rows)

    def _zero_cot(x):
        # integer primals (packed material grid, occupancy bricks) take
        # float0 cotangents per the custom_vjp contract
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    def core_bwd(res, g):
        colors, lower, upper, scal, vol_rows, occ, mg, sgd, lut_rows = res
        g_cr, g_cg, g_cb, g_t = g
        extra = (mg, sgd) if baked else ()
        dtiles = pl.pallas_call(
            bwd_kernel,
            grid_spec=bwd_grid_spec,
            out_shape=jax.ShapeDtypeStruct((ntx, nty, krows, 128), _f32),
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows, *extra,
          g_cr, g_cg, g_cb, g_t)
        dcolors = dtiles.sum(axis=(0, 1))[:num_intervals, :4]
        z = jnp.zeros_like
        return (dcolors, z(lower), z(upper), z(scal), _zero_cot(vol_rows),
                _zero_cot(occ), z(mg), z(sgd), z(lut_rows))

    core9.defvjp(core_fwd, core_bwd)

    def core(colors, lower, upper, scal, vol_rows, occ, mg, sgd,
             lut_rows=None):
        if lut_rows is None:
            lut_rows = jnp.zeros((8, 128), _f32)  # unused dummy primal
        return core9(colors, lower, upper, scal, vol_rows, occ, mg, sgd,
                     lut_rows)

    return core


def _march_streamed_bwd_kernel(
    # SMEM
    scal_ref,  # [32] f32 (same layout as _march_kernel)
    tf_lower_ref,  # [K]
    tf_upper_ref,  # [K]
    tf_colors_ref,  # [K, 4]
    bown_ref,  # [2 * nxb] f32 per-block OWNERSHIP x extents (ray space)
    # HBM
    vol_hbm_ref,  # [nxb * block_rows, 128] staged rows (ANY)
    # VMEM
    g_r_ref, g_g_ref, g_b_ref, g_t_ref,  # cotangent tiles
    dcol_ref,  # out [1, 1, krows, 128]
    bufs_ref,  # scratch VMEM [2, block_rows, 128]
    dma_sem_ref,  # scratch DMA sems [2]
    *,
    dims: Tuple[int, int, int],
    depth: int,
    num_intervals: int,
    width: int,
    height: int,
    spr: int,
    zpack: Tuple[int, int, int] | None,
    krows: int,
    block_x: int,
    nxb: int,
    local_width: int | None = None,
):
    """Beyond-VMEM backward: the manual-DMA streamed twin of
    ``_march_bwd_kernel`` (round-4 VERDICT item 1b).

    The volume stays in HBM; x-blocks stream through a double-buffered
    VMEM scratch in VISIBILITY order (sign(front.x)) — twice: pass A
    accumulates the per-ray totals (final transmittance + the weighted
    gdotc sum), pass B re-streams to run the prefix re-march and the
    per-interval gradient scatter.  Per-sample ownership is the
    x-clamped-voxel rule, so every sample (including out-of-volume ones,
    which clamp into the first/last blocks and scatter into TF(0)'s
    interval) is processed by exactly ONE block — marching blocks
    front-to-back therefore applies each sample's (1 - a) factor exactly
    once in global order, and the prefix/suffix math is unchanged from
    the resident backward.  Per-(tile, block) chunk ranges come from the
    OWNERSHIP x extents in ``bown_ref`` (block 0 / block nxb-1 extend to
    -inf/+inf on the clamp side) — geometry only, no occupancy or
    alpha0 gating: parameter gradients are nonzero where values are not
    (module docstring).  Matches the reference's one-GPU backward-less
    pipeline scale point: the 3.92 GB sample buffer
    /root/reference/kernel.cu:1036-1043."""
    d1, d2, d3 = dims
    packed = zpack is not None
    if packed:
        zw, ypack, nyg = zpack
    L = np.float32(max(dims))
    n = np.float32(2**depth)
    nchunks = -(-spr // STEPS)
    hg = [np.float32(L / 2) - np.float32(d / 2) for d in dims]
    hg_hi = [np.float32(hg[c] + np.float32(dims[c])) for c in range(3)]
    halfd = [np.float32(d / 2) for d in dims]
    halfL = np.float32(L / 2)
    block_rows = bufs_ref.shape[1]

    ds = scal_ref[0]
    clip = scal_ref[1]
    cal_max = scal_ref[2]
    front = [scal_ref[8 + c] for c in range(3)]
    up = [scal_ref[14 + c] for c in range(3)]
    right = [scal_ref[11 + c] for c in range(3)]
    tl = [scal_ref[17 + c] for c in range(3)]
    rsw = scal_ref[20]
    rsh = scal_ref[21]
    x_off_i = scal_ref[29].astype(_i32)
    s_start_i = scal_ref[30].astype(_i32)
    lw = width if local_width is None else local_width

    tx = pl.program_id(0)
    ty = pl.program_id(1)

    # ---- ray setup (ortho only; streamed rejects conic) ----------------
    e = _iota(0) * 128 + _iota(1)
    s_idx = e // 256
    f = e % 256
    u = f // TILE_PY
    v = f % TILE_PY
    lxp = tx * TILE_PX + u
    pxi = lxp + x_off_i
    pyi = ty * TILE_PY + v
    pix_ok = (lxp < lw) & (pyi < height)
    px = pxi.astype(_f32)
    py = pyi.astype(_f32)
    xt = [((px * rsw) / np.float32(width)) * right[c] for c in range(3)]
    yt = [((py * rsh) / np.float32(height)) * (-up[c]) for c in range(3)]
    o = [(tl[c] + xt[c]) + yt[c] for c in range(3)]
    d0 = front[0]

    g_r = g_r_ref[0, 0]
    g_g = g_g_ref[0, 0]
    g_b = g_b_ref[0, 0]
    g_t = g_t_ref[0, 0]
    gr4 = jnp.concatenate([g_r] * STEPS, axis=0)
    gg4 = jnp.concatenate([g_g] * STEPS, axis=0)
    gb4 = jnp.concatenate([g_b] * STEPS, axis=0)

    fwd = d0 >= 0.0

    def bk_of(kvis):
        bk = jnp.where(fwd, kvis, nxb - 1 - kvis)
        return jnp.clip(bk, 0, nxb - 1).astype(_i32)

    def chunk_range(bk):
        """[c_lo, c_hi) chunks whose samples this block might OWN —
        per-ray preimage of the ownership x extent under x(t), reduced
        over the tile.  Exact coverage: out-of-range rays (d0 == 0 with
        o.x outside the extent) produce empty per-ray intervals and are
        owned elsewhere."""
        blo = bown_ref[2 * bk]
        bhi = bown_ref[2 * bk + 1]
        inf = jnp.asarray(3.0e38, _f32)
        d_safe = jnp.abs(d0) > 1e-12
        dv = jnp.where(d_safe, d0, 1.0)
        ta = (blo - o[0]) / dv
        tb = (bhi - o[0]) / dv
        in_x = (o[0] >= blo) & (o[0] <= bhi)
        t_lo = jnp.where(d_safe, jnp.minimum(ta, tb),
                         jnp.where(in_x, -inf, inf))
        t_hi = jnp.where(d_safe, jnp.maximum(ta, tb),
                         jnp.where(in_x, inf, -inf))
        hit = (t_hi >= t_lo) & pix_ok
        t_enter = jnp.min(jnp.where(hit, t_lo, inf))
        t_exit = jnp.max(jnp.where(hit, t_hi, -inf))
        # clamp in FLOAT before the i32 cast (3e38 would overflow i32);
        # subtract the segment's global sample offset FIRST so later
        # sample segments keep their full local range
        spf = np.float32(spr + STEPS + 2)
        s0f = s_start_i.astype(_f32)
        i_lo_f = jnp.clip((t_enter - clip) / ds - s0f, -2.0, spf)
        i_hi_f = jnp.clip((t_exit - clip) / ds - s0f, -2.0, spf)
        i_lo = jnp.floor(i_lo_f).astype(_i32) - 1
        i_hi = jnp.ceil(i_hi_f).astype(_i32) + 1
        c_lo = jnp.clip(i_lo // STEPS, 0, nchunks)
        c_hi = jnp.clip(i_hi // STEPS + 1, 0, nchunks)
        c_hi = jnp.maximum(c_hi, c_lo)
        return c_lo, c_hi

    def sample_chunk(ci, vol_ref, x0b):
        """(a, gdotc, matches, live) for chunk ci against block x0b —
        the slab-ownership sample_chunk of _march_bwd_kernel with the
        block's VMEM buffer as the row source."""
        i_f = (s_start_i + ci * STEPS + s_idx).astype(_f32)
        ti = i_f * ds + clip  # kernel.cu:54,59
        # ortho: d[c] is the broadcast front — identical float order to
        # _march_bwd_kernel's (o + ti * d) + 0.5
        p = [(o[c] + ti * front[c]) + 0.5 for c in range(3)]
        inside = pix_ok
        for c in range(3):
            inside &= (p[c] >= 0.0) & (p[c] < 1.0)
        res = [(jnp.floor(p[c] * n) / n) * L for c in range(3)]
        valid = inside
        for c in range(3):
            valid &= (res[c] >= hg[c]) & (res[c] < hg_hi[c])
        ijk = [jnp.trunc((res[c] + halfd[c]) - halfL).astype(_i32)
               for c in range(3)]
        gx = jnp.clip(ijk[0], 0, d1 - 1)
        owned = pix_ok & (gx >= x0b) & (gx < x0b + block_x)
        valid &= owned
        lxv = ijk[0] - x0b
        if packed:
            ygrp = jnp.where(valid, ijk[1] // ypack, 0)
            rowid = jnp.where(valid, lxv * nyg + ygrp, -1)
            iz = jnp.where(
                valid, (ijk[1] - ygrp * ypack) * zw + ijk[2] // 8, 0)
            ry = ygrp
            stride = nyg
            acc_dtype = _i32
        else:
            rowid = jnp.where(valid, lxv * d2 + ijk[1], -1)
            iz = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
            ry = ijk[1]
            stride = d2
            acc_dtype = _f32
        rxmin = jnp.min(jnp.where(valid, lxv, _BIG))
        rymin = jnp.min(jnp.where(valid, ry, _BIG))
        rxmax = jnp.max(jnp.where(valid, lxv, -1))
        rymax = jnp.max(jnp.where(valid, ry, -1))

        def fx(dx, acc):
            cx = rxmin + dx

            def fy(dy, acc):
                cy = rymin + dy
                crow = jnp.clip(cx * stride + cy, 0, block_rows - 1)
                rowv = vol_ref[pl.ds(crow, 1), :]
                bc = jnp.broadcast_to(rowv, (8, 128))
                g = jnp.take_along_axis(bc, iz, axis=1)
                return jnp.where(rowid == cx * stride + cy, g, acc)

            return jax.lax.fori_loop(0, rymax - rymin + 1, fy, acc)

        acc = jax.lax.fori_loop(
            0, rxmax - rxmin + 1, fx, jnp.zeros((8, 128), acc_dtype))

        if packed:
            sh = (ijk[2] & 7) * 4
            mid = jax.lax.shift_right_logical(acc, sh) & 15
            id0 = scal_ref[28].astype(_i32)
            mid = jnp.where(valid, mid, id0)
            matches = [mid == k for k in range(num_intervals)]
        else:
            vn = jnp.maximum(acc, 0.0) / cal_max
            matches = []
            seen = jnp.zeros((8, 128), jnp.bool_)
            for k in range(num_intervals - 1, -1, -1):
                m = (vn >= tf_lower_ref[k]) & (vn <= tf_upper_ref[k])
                matches.append(m & ~seen)
                seen = seen | m
            matches.reverse()
            matches[0] = matches[0] | ~seen

        out = [jnp.zeros((8, 128), _f32) for _ in range(4)]
        for k in range(num_intervals):
            mf = matches[k].astype(_f32)
            for c in range(4):
                out[c] = out[c] + mf * tf_colors_ref[k, c]
        a, r, g, b = out[3], out[0], out[1], out[2]
        live = ((ci * STEPS + s_idx) < spr) & owned
        a = a * live.astype(_f32)
        gdotc = gr4 * r + gg4 * g + gb4 * b
        return a, gdotc, matches, live

    def dma(slot, kvis):
        bk = bk_of(kvis)
        return pltpu.make_async_copy(
            vol_hbm_ref.at[pl.ds(bk * block_rows, block_rows), :],
            bufs_ref.at[slot],
            dma_sem_ref.at[slot],
        )

    def block_sweep(per_block, carry0):
        """Stream every block in visibility order through the double
        buffer, folding ``per_block(slot, kvis, carry)``."""
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
                # balanced waits: every started DMA is awaited even when
                # the march below is skipped

            def late(c):
                return per_block(1, k1, c)

            return jax.lax.cond(k1 < nxb, late, lambda c: c, carry)

        npairs = -(-nxb // 2)
        return jax.lax.fori_loop(0, npairs, body, carry0)

    ones = jnp.ones((2, 128), _f32)
    zeros = jnp.zeros((2, 128), _f32)

    # ---- pass A: totals (final T + sum of weighted gdotc) --------------
    def block_a(slot, kvis, carry):
        bk = bk_of(kvis)
        x0b = bk * block_x
        c_lo, c_hi = chunk_range(bk)

        def chunk_a(ci, carry):
            t, tot = carry
            a_all, gdotc_all, _, _ = sample_chunk(
                ci, bufs_ref.at[slot], x0b)
            for s in range(STEPS):
                sl = slice(2 * s, 2 * s + 2)
                a = a_all[sl]
                w = t * a
                tot = tot + w * gdotc_all[sl]
                t = t * (1.0 - a)
            return t, tot

        def run(c):
            return jax.lax.fori_loop(c_lo, c_hi, chunk_a, c)

        live = jnp.max(carry[0]) > 0.0
        return jax.lax.cond(live, run, lambda c: c, carry)

    t_final, total = block_sweep(block_a, (ones, zeros))
    bg_term = t_final * g_t

    row_i = _iota(0, krows)
    col_i = _iota(1, krows)

    # ---- pass B: prefix re-march + per-interval scatter ----------------
    def block_b(slot, kvis, carry):
        bk = bk_of(kvis)
        x0b = bk * block_x
        c_lo, c_hi = chunk_range(bk)

        def chunk_b(ci, carry):
            t, pfx, dc = carry
            a_all, gdotc_all, matches, live = sample_chunk(
                ci, bufs_ref.at[slot], x0b)
            w_list, da_list = [], []
            for s in range(STEPS):
                sl = slice(2 * s, 2 * s + 2)
                a = a_all[sl]
                gd = gdotc_all[sl]
                w = t * a
                pfx = pfx + w * gd
                suffix = total - pfx
                denom = 1.0 - a
                num = suffix + bg_term
                da = t * gd - jnp.where(denom != 0.0, num / denom, 0.0)
                w_list.append(w)
                da_list.append(da)
                t = t * denom
            w_all = jnp.concatenate(w_list, axis=0)
            da_all = jnp.concatenate(da_list, axis=0)
            for k in range(num_intervals):
                mf = (matches[k] & live).astype(_f32)
                dr = jnp.sum(mf * w_all * gr4)
                dg = jnp.sum(mf * w_all * gg4)
                db = jnp.sum(mf * w_all * gb4)
                dal = jnp.sum(mf * da_all)
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


@functools.lru_cache(maxsize=32)
def _make_streamed_core(dims, depth, num_intervals, width, height, spr,
                        nb, block_x, nxb, block_rows, zpack, vol_dtype,
                        interpret, local_width, brick):
    """custom_vjp'd manual-DMA STREAMED tile renderer (beyond-VMEM
    training, round-4 VERDICT item 1b):
    (colors, lower, upper, scal, vol_rows, occ, bext, bown) -> 4 tiles.

    ``vol_rows`` stays in HBM (pl.ANY) and streams through a
    double-buffered VMEM scratch in both directions: the forward is the
    existing manual_stream kernel (early_eps = 0 via scal[3]); the
    backward is _march_streamed_bwd_kernel, which streams every block
    TWICE (pass A totals, pass B prefix + scatter).  ``bext`` is the
    forward's occupancy∩geometry extent table (value-exact skips);
    ``bown`` is the backward's pure-ownership extent table (no skips —
    gradients are nonzero where values are not)."""
    from .pallas_march import _march_kernel as _fwd_march_kernel

    w_local = width if local_width is None else local_width
    ntx = -(-w_local // TILE_PX)
    nty = -(-height // TILE_PY)
    krows = 8 if num_intervals <= 8 else 16
    tile = (TILE_PX, TILE_PY, STEPS)

    fwd_kernel = functools.partial(
        _fwd_march_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=False,
        density_scale=1.0, nbricks=nb, zpack=zpack, tile=tile,
        local_width=w_local, slab_x=block_x, hbm_mode=True,
        manual_stream=True, nxb=nxb, brick=brick,
    )
    bwd_kernel = functools.partial(
        _march_streamed_bwd_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, zpack=zpack, krows=krows,
        block_x=block_x, nxb=nxb, local_width=w_local,
    )

    smem = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(5)]
    out_shape = [jax.ShapeDtypeStruct((ntx, nty, 2, 128), _f32)
                 for _ in range(4)]
    scratch = [
        pltpu.VMEM((2, block_rows, 128), jnp.dtype(vol_dtype)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def forward_tiles(colors, lower, upper, scal, vol_rows, occ, bext):
        return tuple(pl.pallas_call(
            fwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(ntx, nty),
                in_specs=smem[:5] + [
                    pl.BlockSpec(memory_space=pl.ANY),  # volume in HBM
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # bext
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(4)
                ],
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(scal, lower, upper, colors, occ, vol_rows, bext))

    @jax.custom_vjp
    def core(colors, lower, upper, scal, vol_rows, occ, bext, bown):
        del bown
        return forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                             bext)

    def core_fwd(colors, lower, upper, scal, vol_rows, occ, bext, bown):
        out = forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                            bext)
        return out, (colors, lower, upper, scal, vol_rows, occ, bext,
                     bown)

    def core_bwd(res, g):
        colors, lower, upper, scal, vol_rows, occ, bext, bown = res
        dtiles = pl.pallas_call(
            bwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(ntx, nty),
                in_specs=smem[:4] + [
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # bown
                    pl.BlockSpec(memory_space=pl.ANY),  # volume in HBM
                ] + [
                    pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(4)
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, krows, 128), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((ntx, nty, krows, 128), _f32),
            interpret=interpret,
        )(scal, lower, upper, colors, bown, vol_rows, *g)
        dcolors = dtiles.sum(axis=(0, 1))[:num_intervals, :4]
        z = jnp.zeros_like
        return (dcolors, z(lower), z(upper), z(scal),
                _zero_cot_pub(vol_rows), _zero_cot_pub(occ), z(bext),
                z(bown))

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.lru_cache(maxsize=32)
def _make_lit_core(dims, depth, num_intervals, width, height, spr, conic,
                   nb, rows, interpret, zpack, gradient_filter,
                   presmooth_sigma, local_width=None):
    """Light-differentiable wrapper over the baked-light core: exposes
    gradients w.r.t. the 10-scalar light parameter vector
    (ops/phong.light_to_vec) in addition to the TF colors.

    Math: lighting only touches the rgb channels (alpha, hence every
    march weight w_s = T_s a_s, is light-independent), so the rendered
    color is EXACTLY linear in the baked (M, S) grids:

        C = sum_s w_s (c_s M_{v_s} + S_{v_s}) + T_N bg

    The backward therefore computes dL/dlight_p as an inner product of the
    upstream cotangent with a *tangent forward call*: run the unmodified
    forward kernel with (M, S) replaced by the bake's JVP grids
    (dM_p, dS_p).  One correction: samples outside the volume are shaded
    with the constants (M, S) = (1, 0) in-kernel, so the tangent call
    overcounts them by core(colors, ..., 1->?); evaluating the kernel once
    with all-zero grids isolates exactly that out-of-volume term, which is
    subtracted.  Exact for any TF table (including alpha0 > 0), at the
    cost of (n_params + 1) forward kernel calls in the backward — cheap at
    fit resolutions, and incurred only when light gradients are requested.

    The bake collapses the light color to its channel mean (identical for
    the uniform colors the baked forward requires; gives symmetric
    per-channel color gradients, so gradient descent preserves
    uniformity).  Upgrades the reference's LightInteraction stub API
    (LightInteraction.h:10-35) into a real optimizable light model.
    """
    from .pallas_march import _stage_f32_rows, bake_light_grids
    from . import phong
    from ..utils.config import RenderConfig
    import dataclasses as _dc

    core = _make_core(dims, depth, num_intervals, width, height, spr,
                      conic, nb, rows, interpret, zpack, True, local_width)
    d1, d2, d3 = dims
    bake_cfg = RenderConfig(
        gradient_filter=gradient_filter, presmooth_sigma=presmooth_sigma)

    def bake_stage(light_vec, view_dir, data3d):
        lg = phong.light_from_vec(light_vec)
        lg = _dc.replace(
            lg, color=jnp.full((3,), jnp.mean(lg.color), _f32))
        mgrid, sgrid = bake_light_grids(data3d, bake_cfg, lg, view_dir)
        return (_stage_f32_rows(mgrid, d1, d2, d3),
                _stage_f32_rows(sgrid, d1, d2, d3))

    @jax.custom_vjp
    def lit(colors, light_vec, view_dir, data3d, lower, upper, scal,
            vol_rows, occ):
        mg, sgd = bake_stage(light_vec, view_dir, data3d)
        return core(colors, lower, upper, scal, vol_rows, occ, mg, sgd)

    def lit_fwd(colors, light_vec, view_dir, data3d, lower, upper, scal,
                vol_rows, occ):
        out = lit(colors, light_vec, view_dir, data3d, lower, upper, scal,
                  vol_rows, occ)
        return out, (colors, light_vec, view_dir, data3d, lower, upper,
                     scal, vol_rows, occ)

    def lit_bwd(res, g):
        (colors, light_vec, view_dir, data3d, lower, upper, scal,
         vol_rows, occ) = res
        mg, sgd = bake_stage(light_vec, view_dir, data3d)
        _, vjp = jax.vjp(
            lambda c: core(c, lower, upper, scal, vol_rows, occ, mg, sgd),
            colors)
        (dcolors,) = vjp(g)
        g_cr, g_cg, g_cb, _g_t = g

        def dot_rgb(tiles):
            tcr, tcg, tcb, _ = tiles
            return (jnp.sum(g_cr * tcr) + jnp.sum(g_cg * tcg)
                    + jnp.sum(g_cb * tcb))

        zero_grid = jnp.zeros_like(mg)
        # out-of-volume samples read (M, S) = (1, 0) constants in-kernel;
        # the all-zero-grid call isolates exactly their tangent overcount
        oov = dot_rgb(core(colors, lower, upper, scal, vol_rows, occ,
                           zero_grid, jnp.zeros_like(sgd)))

        def one(p):
            e = jnp.zeros_like(light_vec).at[p].set(1.0)
            _, (dmg, dsgd) = jax.jvp(
                lambda lv: bake_stage(lv, view_dir, data3d),
                (light_vec,), (e,))
            return dot_rgb(core(colors, lower, upper, scal, vol_rows, occ,
                                dmg, dsgd)) - oov

        dlight = jnp.stack([one(p) for p in range(phong.N_LIGHT_PARAMS)])
        z = jnp.zeros_like
        return (dcolors, dlight, z(view_dir), z(data3d), z(lower),
                z(upper), z(scal), _zero_cot_pub(vol_rows),
                _zero_cot_pub(occ))

    lit.defvjp(lit_fwd, lit_bwd)
    return lit


def _zero_cot_pub(x):
    if jnp.issubdtype(x.dtype, jnp.integer):
        return np.zeros(x.shape, jax.dtypes.float0)
    return jnp.zeros_like(x)


@functools.lru_cache(maxsize=32)
def _make_scatter_core(dims, depth, num_intervals, width, height, spr,
                       nb, rows, interpret, zpack, lighting,
                       gradient_filter, presmooth_sigma,
                       scattering_strength, local_width=None):
    """Scattering-differentiable wrapper over the baked core (round-4
    VERDICT item 7): single-scattering rides the baked additive (S) slot
    (ops/pallas_march.bake_scatter_grid), but S depends on the TF's
    ALPHA column through the light-transmittance sweep
    (T_light = running product of (1 - alpha) along light rays — the
    XLA path differentiates through it, raycast._make_scatter), so a
    stop-gradient bake would drop that chain.  This core restores it
    exactly with tangent forward calls, like _make_lit_core: the render
    is AFFINE in the S grid at fixed colors, so

        dL/d(alpha_k) += <g_rgb, core(S -> dS/d alpha_k) - core(S -> 0)>

    and the same probe per HG-g entry (S's phase term), so both the
    alpha column AND tf.hg_g receive exact cotangents — 2K + 1 extra
    forward kernel calls in the backward (the direct classify/
    recurrence part comes from the baked core's own vjp).  Reference
    counterpart: LightInteraction.h:10-35 + the per-material HG g
    (Material.h:14-23) finally made trainable."""
    from .pallas_march import (
        _stage_f32_rows,
        bake_scatter_grid,
    )
    from ..utils.config import RenderConfig as _RC

    core = _make_core(dims, depth, num_intervals, width, height, spr,
                      False, nb, rows, interpret, zpack, True,
                      local_width)
    d1, d2, d3 = dims
    # density_scale is pinned to 1.0 here: the driver pre-folds the
    # static density into the colors' alpha column, so the classify
    # alpha inside bake_scatter_grid ALREADY carries it — passing the
    # config value through would apply it twice to T_light
    bake_cfg = _RC(gradient_filter=gradient_filter,
                   presmooth_sigma=presmooth_sigma,
                   density_scale=1.0,
                   scattering_strength=scattering_strength,
                   lighting=lighting, scattering=True)

    def S_of(colors, lower, upper, hg, data3d, light_vec, ray_dir,
             cal_g, cal_trunc, sgrid_light):
        from . import phong

        tf2 = TransferFunction(lower=lower, upper=upper, colors=colors,
                               hg_g=hg)
        lg = phong.light_from_vec(light_vec)
        return sgrid_light + bake_scatter_grid(
            data3d, tf2, bake_cfg, lg, ray_dir, cal_g, cal_trunc)

    def stage(grid):
        return _stage_f32_rows(grid, d1, d2, d3)

    @jax.custom_vjp
    def scat(colors, lower, upper, hg, scal, vol_rows, occ, data3d,
             light_vec, ray_dir, cal_g, cal_trunc, mgrid, sgrid_light):
        sgd = stage(S_of(colors, lower, upper, hg, data3d, light_vec,
                         ray_dir, cal_g, cal_trunc, sgrid_light))
        return core(colors, lower, upper, scal, vol_rows, occ,
                    stage(mgrid), sgd)

    def scat_fwd(colors, lower, upper, hg, scal, vol_rows, occ, data3d,
                 light_vec, ray_dir, cal_g, cal_trunc, mgrid,
                 sgrid_light):
        out = scat(colors, lower, upper, hg, scal, vol_rows, occ,
                   data3d, light_vec, ray_dir, cal_g, cal_trunc, mgrid,
                   sgrid_light)
        return out, (colors, lower, upper, hg, scal, vol_rows, occ,
                     data3d, light_vec, ray_dir, cal_g, cal_trunc,
                     mgrid, sgrid_light)

    def scat_bwd(res, g):
        (colors, lower, upper, hg, scal, vol_rows, occ, data3d,
         light_vec, ray_dir, cal_g, cal_trunc, mgrid, sgrid_light) = res
        mg_rows = stage(mgrid)

        def S_c(c):
            return S_of(c, lower, upper, hg, data3d, light_vec, ray_dir,
                        cal_g, cal_trunc, sgrid_light)

        sgd0 = stage(S_c(colors))
        # direct part: classify colors + the march recurrence, S fixed
        _, vjp = jax.vjp(
            lambda c: core(c, lower, upper, scal, vol_rows, occ,
                           mg_rows, sgd0), colors)
        (dcolors,) = vjp(g)
        g_cr, g_cg, g_cb, _g_t = g

        def dot_rgb(tiles):
            tcr, tcg, tcb, _ = tiles
            return (jnp.sum(g_cr * tcr) + jnp.sum(g_cg * tcg)
                    + jnp.sum(g_cb * tcb))

        # the render is affine in sgd at fixed colors; the S -> 0 call
        # is the shared base of every directional difference
        base0 = dot_rgb(core(colors, lower, upper, scal, vol_rows, occ,
                             mg_rows, jnp.zeros_like(sgd0)))

        def one(p):
            e = jnp.zeros_like(colors).at[p, 3].set(1.0)
            _, dS = jax.jvp(S_c, (colors,), (e,))
            return dot_rgb(core(colors, lower, upper, scal, vol_rows,
                                occ, mg_rows, stage(dS))) - base0

        dalpha = jnp.stack([one(p) for p in range(num_intervals)])
        dcolors = dcolors.at[:num_intervals, 3].add(dalpha)

        # the Henyey-Greenstein g table also shapes S (phase term):
        # same affine-in-S trick, one tangent probe per interval's g
        def S_hg(hg2):
            return S_of(colors, lower, upper, hg2, data3d, light_vec,
                        ray_dir, cal_g, cal_trunc, sgrid_light)

        def one_hg(p):
            e = jnp.zeros_like(hg).at[p].set(1.0)
            _, dS = jax.jvp(S_hg, (hg,), (e,))
            return dot_rgb(core(colors, lower, upper, scal, vol_rows,
                                occ, mg_rows, stage(dS))) - base0

        dhg = jnp.stack([one_hg(p) for p in range(num_intervals)])
        dhg = jnp.concatenate(
            [dhg, jnp.zeros((hg.shape[0] - num_intervals,), _f32)])
        z = jnp.zeros_like
        return (dcolors, z(lower), z(upper), dhg, z(scal),
                _zero_cot_pub(vol_rows), _zero_cot_pub(occ), z(data3d),
                z(light_vec), z(ray_dir), z(cal_g), z(cal_trunc),
                z(mgrid), z(sgrid_light))

    scat.defvjp(scat_fwd, scat_bwd)
    return scat


def diff_pallas_scatter_eligible(volume: Volume, tf: TransferFunction,
                                 config: RenderConfig,
                                 light=None) -> bool:
    """Static predicate for the scattering-differentiable fused path
    (round-4 VERDICT item 7): plain a1 classify + fused scattering via
    the baked additive slot, ortho, static uniform (or default) light,
    within the baked VMEM budget."""
    from .pallas_march import (
        _uniform_light_color,
        baked_light_feasible,
        packed_geometry,
    )

    if light is not None and (
            any(isinstance(leaf, jax.core.Tracer)
                for leaf in jax.tree.leaves(light))
            or not _uniform_light_color(light)):
        return False
    fits = (
        volume.dims[2] <= 128
        or packed_geometry(volume.dims, tf.num_intervals) is not None
    )
    return (
        jax.default_backend() == "tpu"
        and config.scattering
        and volume.channels == 1
        and not config.conic
        and not config.tf_lut
        and config.interp is Interp.NEAREST
        and tf.num_intervals <= 16
        and fits
        and baked_light_feasible(volume.dims, tf.num_intervals, config)
    )


def render_vrc_pallas_diff_scatter(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    light=None,
) -> jnp.ndarray:
    """a1 render WITH single-scattering -> [W, H, 4], differentiable
    w.r.t. ``tf.colors`` through the fused kernels + the
    transmittance-chain tangent calls (_make_scatter_core).
    Value-identical to the fused forward (render_vrc_pallas with
    scattering, early_eps = 0); gradients match ``jax.grad`` through the
    XLA scan including the dT_light/d alpha chain."""
    from . import phong
    from .pallas_march import (
        _pad_to as _p8,
        bake_light_grids,
        brick_occupancy,
        pack_material_grid,
        packed_geometry,
    )

    d1, d2, d3 = volume.dims
    if not config.scattering:
        raise ValueError("use render_vrc_pallas_diff for unscattered")
    if config.conic or config.tf_lut or volume.channels != 1:
        raise ValueError(
            "diff scattering path: ortho single-channel plain classify")
    if config.interp is not Interp.NEAREST:
        raise ValueError("diff scattering path is NEAREST sampling")
    if tf.num_intervals > 16:
        raise ValueError("diff scattering supports at most 16 intervals")
    lg = light if light is not None else phong.default_light()

    sg = jax.lax.stop_gradient
    colors = tf.colors
    if config.density_scale != 1.0:
        colors = colors.at[:, 3].set(
            jnp.clip(colors[:, 3] * np.float32(config.density_scale),
                     0.0, 1.0))
    tf_sg = TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(colors), hg_g=tf.hg_g)

    zpack = packed_geometry(volume.dims, tf.num_intervals)
    packed = zpack is not None  # baked grids take most of the budget
    cal_max_trunc = jnp.trunc(jnp.asarray(volume.cal_max, _f32))
    id0 = jnp.zeros((), _f32)
    if packed:
        vol_rows, id0 = pack_material_grid(
            volume.data.reshape(volume.dims), tf_sg, cal_max_trunc,
            zpack)
    else:
        if d3 > 128:
            raise ValueError(
                f"dims {volume.dims} fit neither layout for the diff "
                "scattering path")
        rows_n = _p8(d1 * d2, 8)
        vol_rows = jnp.zeros((rows_n, 128), _f32)
        vol_rows = vol_rows.at[: d1 * d2, :d3].set(
            volume.data.reshape(d1 * d2, d3))
    rows = vol_rows.shape[0]

    occ, nb = brick_occupancy(
        volume.data.reshape(volume.dims), tf_sg, cal_max_trunc)
    alpha0 = sg(tf_sg.classify(jnp.zeros((), _f32))[3])

    data3d = volume.data.reshape(volume.dims)
    if config.lighting:
        mgrid, sgrid_light = bake_light_grids(
            data3d, config, lg, -camera.front)
        mgrid, sgrid_light = sg(mgrid), sg(sgrid_light)
    else:
        mgrid = jnp.ones(volume.dims, _f32)
        sgrid_light = jnp.zeros(volume.dims, _f32)

    L = float(max(volume.dims))
    n = float(2**volume.octree_depth)
    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in volume.dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5
              for dim in volume.dims]
    w, h = config.width, config.height
    scal = jnp.concatenate([
        jnp.asarray([config.sample_distance, config.front_clip], _f32),
        cal_max_trunc[None],
        jnp.zeros((1,), _f32),  # early_eps = 0
        alpha0[None],
        camera.position.astype(_f32),
        camera.front.astype(_f32),
        camera.right.astype(_f32),
        camera.up.astype(_f32),
        camera.top_left.astype(_f32),
        jnp.asarray([config.real_screen_width, config.real_screen_height],
                    _f32),
        jnp.asarray(box_lo, _f32),
        jnp.asarray(box_hi, _f32),
        id0[None],
        jnp.zeros((3,), _f32),  # x_offset, s_start, slab x0
    ])

    scat = _make_scatter_core(
        volume.dims, volume.octree_depth, tf.num_intervals, w, h,
        config.samples_per_ray, nb, rows, bool(interpret), zpack,
        bool(config.lighting), config.gradient_filter,
        float(config.presmooth_sigma),
        float(config.scattering_strength))
    cr, cg, cb, t = scat(
        colors, tf.lower, tf.upper, tf.hg_g, scal, vol_rows, occ,
        data3d, phong.light_to_vec(lg), camera.front, cal_max_trunc,
        cal_max_trunc, mgrid, sgrid_light)

    ntx = -(-w // TILE_PX)
    nty = -(-h // TILE_PY)

    def unpack(a):
        a = a.reshape(ntx, nty, TILE_PX, TILE_PY)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * TILE_PX, nty * TILE_PY)
        return a[:w, :h]

    t2 = unpack(t)
    bg = jnp.asarray(config.background, _f32)
    rgb = [unpack(c) + t2 * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)


def diff_pallas_light_eligible(volume: Volume, tf: TransferFunction,
                               config: RenderConfig) -> bool:
    """Static predicate: can a fit optimize *light parameters* through the
    fused kernels?  Needs the baked-light path (ortho camera + VMEM
    budget) on top of the base diff-kernel eligibility."""
    from .pallas_march import baked_light_feasible

    return (
        diff_pallas_eligible(volume, tf, config)
        and not config.conic
        and not config.tf_lut  # the lit core has no LUT classify
        and baked_light_feasible(volume.dims, tf.num_intervals, config)
    )


def diff_pallas_eligible(volume: Volume, tf: TransferFunction,
                         config: RenderConfig) -> bool:
    """True when the fused differentiable kernel implements this render
    exactly (cf. models/raycast._pallas_eligible): plain a1 classify,
    K <= 16 intervals, and either the f32 rows (z <= 128) or the packed
    material grid (z <= 1024, MNI-1mm-class) fit VMEM.  Static
    density_scale is folded into the alpha column internally; traced
    density folds externally (diff/fit.py)."""
    from .pallas_march import baked_light_feasible, packed_geometry

    fits = (
        volume.dims[2] <= 128
        or packed_geometry(volume.dims, tf.num_intervals) is not None
    )
    # lighting trains through the baked per-voxel (M, S) factors — a
    # volume-only quantity, so TF-color gradients stay exact (dC/dc = w*M)
    lighting_ok = not config.lighting or baked_light_feasible(
        volume.dims, tf.num_intervals, config)
    # dense-LUT classify trains fused too (round-4 VERDICT item 7): the
    # LUT is linear in the colors; needs the f32 rows (z <= 128)
    lut_ok = not config.tf_lut or (
        volume.dims[2] <= 128 and 0 < int(config.tf_lut) <= 1024)
    return (
        jax.default_backend() == "tpu"
        and volume.channels == 1
        and fits
        and lighting_ok
        and config.interp is Interp.NEAREST
        and lut_ok
        and tf.num_intervals <= 16
        and not config.scattering
    )


def _diff_march_tiles(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    packed: bool | None = None,
    light=None,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    x0=0,
    slab_x: int | None = None,
    baked_grids=None,
):
    """Differentiable fused-march driver -> (cr, cg, cb, t), each
    [w_local, height] f32 — the (C, T) segment of ray columns
    [x_offset, x_offset + local_width) x samples [s_start, s_start +
    s_count), differentiable w.r.t. ``tf.colors`` (and light params when
    a traced ``light`` is passed) through the custom_vjp cores.  Offsets
    may be traced (axis_index-derived); shapes are static.  See
    render_vrc_pallas_diff for semantics and caveats.

    ``slab_x``: volume-slab work unit — ``volume.data`` holds only the
    x-slab starting at global voxel ``x0`` (traced OK), and both kernels
    apply the x-clamped ownership rule, so per-slab gradients sum (via
    shard_map's psum) to the replicated gradients exactly.  Baked
    lighting on a slab takes ``baked_grids`` = (M, S) arrays of the SLAB
    shape, computed by the caller from a halo-extended slab (gradient
    normals cross slab bounds; parallel/render_dist.py does the ppermute
    + crop) — they enter under stop_gradient, so this combination trains
    TF colors/density but not light params (use rays/samples axes for
    traced lights).

    ``config.lighting`` (or an explicit uniform-color ``light``) runs
    through the baked per-voxel Phong factors — (M, S) depend only on the
    volume, so the TF-color cotangents stay exact (the backward kernel
    scales the rgb scatter by M and routes alpha grads through the shaded
    colors); trains BASELINE config 2-style shaded fits fused.

    CAVEAT (traced lights): a light with traced leaves (FitParams.light)
    takes the light-differentiable core, whose bake collapses the light
    color to its channel mean (``_make_lit_core``).  For a NON-uniform
    traced color the fused forward therefore renders the mean-gray light,
    diverging from the XLA renderer (which shades per channel); gradients
    stay symmetric across channels, so descent from a uniform init
    preserves uniformity.  Pass a non-uniform color through the XLA path
    (``raycast.render_vrc(..., light=...)``) when exact per-channel
    shading matters.

    Value-identical to ``render_vrc_pallas(..., early_eps=0)`` ==
    ``render_vrc(..., mode="fast")``; gradients match ``jax.grad`` through
    the XLA scan (see module docstring for the a==1 caveat).  Volumes with
    z <= 128 use f32 rows; larger ones (z <= 1024, e.g. MNI-1mm 182^3
    class) use the packed material-id grid — the grid depends only on the
    TF *bounds* (gradient-inert: piecewise-constant, zero a.e.), so color
    gradients are unaffected.  A static ``config.density_scale`` is folded
    into the alpha column here; a *traced* density folds externally
    (``colors.at[:, 3].mul(density)`` — diff/fit.py), which the chain rule
    routes back automatically.
    """
    from .pallas_march import (
        _stage_f32_rows,
        bake_light_grids,
        baked_light_feasible,
        brick_occupancy,
        pack_material_grid,
        packed_geometry,
    )

    d1, d2, d3 = volume.dims
    dims_local = (slab_x if slab_x is not None else d1, d2, d3)
    lut_n = int(config.tf_lut)
    if volume.channels != 1:
        raise ValueError("diff pallas path supports single-channel volumes")
    if config.interp is not Interp.NEAREST:
        raise ValueError(
            "diff pallas path is a1 NEAREST classify; use the XLA "
            "renderer for trilinear modes")
    if lut_n and (d3 > 128 or not 0 < lut_n <= 1024):
        raise ValueError(
            "diff LUT classify needs the f32 row layout (z <= 128) and "
            "tf_lut <= 1024; use the XLA renderer")
    if tf.num_intervals > 16:
        raise ValueError("diff pallas path supports at most 16 TF intervals")
    baked = bool(config.lighting) or light is not None
    light_traced = False
    if baked:
        from . import phong
        from .pallas_march import _uniform_light_color

        lg = light if light is not None else phong.default_light()
        # a light with traced leaves (e.g. FitParams.light under jit) takes
        # the light-differentiable core: dL/d(light params) through tangent
        # forward calls (_make_lit_core); its bake collapses the color to
        # the channel mean, so the uniformity check is moot there.
        light_traced = light is not None and any(
            isinstance(leaf, jax.core.Tracer)
            for leaf in jax.tree.leaves(light))
        if slab_x is not None and light_traced:
            raise ValueError(
                "slab diff segments take the baked (M, S) grids under "
                "stop_gradient; traced-light fits need rays/samples axes")
        if slab_x is not None and baked_grids is None:
            raise ValueError(
                "slab diff segments with lighting need baked_grids "
                "computed from a halo-extended slab (render_dist does)")
        if (config.conic
                or not (light_traced or _uniform_light_color(light))
                or not baked_light_feasible(
                    dims_local, tf.num_intervals, config)):
            raise ValueError(
                "diff pallas lighting needs the baked path: ortho camera, "
                "statically-uniform light color (pass light=None for the "
                "default), z <= 128 and the VMEM budget; use the XLA "
                "renderer otherwise")
    if lut_n and baked and light_traced:
        raise ValueError(
            "diff LUT classify with a traced light is unsupported; "
            "freeze one of the two (or use the XLA renderer)")
    zpack = packed_geometry(dims_local, tf.num_intervals)
    if packed is None:
        # baked lighting prefers the packed main grid (the two f32 factor
        # grids take most of the VMEM budget); LUT classify needs the
        # f32 intensity rows
        packed = (d3 > 128 or baked) and zpack is not None and not lut_n
    if packed and zpack is None:
        raise ValueError(
            f"dims {dims_local} / {tf.num_intervals} intervals don't fit "
            "the packed material grid")
    if not packed and d3 > 128:
        raise ValueError(
            f"diff pallas path needs z <= 128 unpacked (got {d3}); packed "
            "mode requires <= 16 intervals and z <= 1024")

    sg = jax.lax.stop_gradient
    colors = tf.colors
    if config.density_scale != 1.0:
        # fold the static density into the alpha column (identical to the
        # forward kernel's per-sample clip(a * density): a_sample == a_k)
        colors = colors.at[:, 3].set(
            jnp.clip(colors[:, 3] * np.float32(config.density_scale),
                     0.0, 1.0))

    w, h = config.width, config.height
    cal_max_trunc = jnp.trunc(jnp.asarray(volume.cal_max, _f32))
    id0 = jnp.zeros((), _f32)
    if packed:
        # bounds are gradient-inert -> pack under stop_gradient
        vol_rows, id0 = pack_material_grid(
            volume.data.reshape(dims_local),
            TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(colors), hg_g=tf.hg_g),
            cal_max_trunc, zpack)
    else:
        zpack = None
        rows = _pad_to(dims_local[0] * d2, 8)
        vol_rows = jnp.zeros((rows, 128), _f32)
        vol_rows = vol_rows.at[: dims_local[0] * d2, :d3].set(
            volume.data.reshape(dims_local[0] * d2, d3))
    rows = vol_rows.shape[0]

    # dense-LUT classify (round-4 VERDICT item 7): the LUT is a LINEAR
    # map of the color table — the forward reads it, the backward
    # scatters straight into the interval table from the quantized vn
    lut_rows = None
    lut_rows_n = 0
    lut = None
    if lut_n:
        tf_live = TransferFunction(lower=tf.lower, upper=tf.upper,
                                   colors=colors, hg_g=tf.hg_g)
        lut = tf_live.to_lut(lut_n)
        rl = -(-lut_n // 128)
        lut_rows = jnp.zeros((_pad_to(4 * rl, 8), 128), _f32)
        for c in range(4):
            col = jnp.zeros((rl * 128,), _f32).at[:lut_n].set(lut[:, c])
            lut_rows = lut_rows.at[c * rl:(c + 1) * rl, :].set(
                col.reshape(rl, 128))
        lut_rows_n = lut_rows.shape[0]

    # skip-control inputs (value-inert): occupancy bricks + TF(0) alpha
    # (slab mode: slab-local bricks, matching the forward slab kernel)
    tf_sg = TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(colors), hg_g=tf.hg_g)
    occ, nb = brick_occupancy(
        volume.data.reshape(dims_local), tf_sg, cal_max_trunc,
        lut=sg(lut) if lut is not None else None)
    if lut is not None:
        alpha0 = sg(lut[0, 3])  # idx(vn=0) = 0
    else:
        alpha0 = sg(tf_sg.classify(jnp.zeros((), _f32))[3])

    L = float(max(volume.dims))
    n = float(2**volume.octree_depth)
    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in volume.dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5
              for dim in volume.dims]
    box_lo = [jnp.asarray(v, _f32) for v in box_lo]
    box_hi = [jnp.asarray(v, _f32) for v in box_hi]
    if slab_x is not None:
        # tighten the x extent to this slab (FORWARD chunk-range clipping
        # only — the backward kernel ignores box clips and marches all
        # chunks, so gradients for outside-but-owned samples are kept)
        hg0 = np.float32(L / 2) - np.float32(d1 / 2)
        x0f = jnp.asarray(x0, _f32)
        box_lo[0] = jnp.maximum(box_lo[0], (hg0 + x0f) / L - 0.5)
        box_hi[0] = jnp.minimum(
            box_hi[0], (hg0 + x0f + slab_x) / L + 1.0 / n - 0.5)

    top_left = camera.top_left
    if config.conic and config.conic_corrected:
        top_left = top_left + jnp.asarray(
            config.viewplane_distance, _f32) * camera.front

    # scal layout identical to render_vrc_pallas; early_eps pinned to 0
    # (early termination is value-exact only in the forward direction)
    scal = jnp.concatenate([
        jnp.asarray([config.sample_distance, config.front_clip], _f32),
        cal_max_trunc[None],
        jnp.zeros((1,), _f32),  # early_eps = 0
        alpha0[None],
        camera.position.astype(_f32),
        camera.front.astype(_f32),
        camera.right.astype(_f32),
        camera.up.astype(_f32),
        top_left.astype(_f32),
        jnp.asarray([config.real_screen_width, config.real_screen_height],
                    _f32),
        jnp.stack([jnp.asarray(v, _f32) for v in box_lo]),
        jnp.stack([jnp.asarray(v, _f32) for v in box_hi]),
        id0[None],  # [28] classify-index of vn=0 (packed mode)
        jnp.asarray(x_offset, _f32)[None],  # [29] ray-column offset
        jnp.asarray(s_start, _f32)[None],  # [30] sample-segment start
        jnp.asarray(x0, _f32)[None],  # [31] volume-slab x offset
    ])

    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count

    if baked and light_traced:
        from . import phong

        lit = _make_lit_core(
            volume.dims, volume.octree_depth, tf.num_intervals, w, h,
            s_count, bool(config.conic), nb, rows,
            bool(interpret), zpack, config.gradient_filter,
            float(config.presmooth_sigma), local_width,
        )
        cr, cg, cb, t = lit(
            colors, phong.light_to_vec(lg), -camera.front,
            volume.data.reshape(volume.dims), tf.lower, tf.upper, scal,
            vol_rows, occ)
    else:
        if baked:
            if baked_grids is not None:
                mgrid, sgrid = baked_grids  # slab (M, S): caller-supplied
            else:
                mgrid, sgrid = bake_light_grids(
                    volume.data.reshape(dims_local), config, lg,
                    -camera.front)
            mg = sg(_stage_f32_rows(mgrid, dims_local[0], d2, d3))
            sgd = sg(_stage_f32_rows(sgrid, dims_local[0], d2, d3))
        else:
            mg = sgd = jnp.zeros((8, 128), _f32)  # ignored dummies

        core = _make_core(
            volume.dims, volume.octree_depth, tf.num_intervals, w, h,
            s_count, bool(config.conic), nb, rows,
            bool(interpret), zpack, baked, local_width, slab_x,
            lut_n, lut_rows_n,
        )
        cr, cg, cb, t = core(colors, tf.lower, tf.upper, scal, vol_rows,
                             occ, mg, sgd, lut_rows)

    ntx = -(-w_local // TILE_PX)
    nty = -(-h // TILE_PY)

    def unpack(a):
        a = a.reshape(ntx, nty, TILE_PX, TILE_PY)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * TILE_PX, nty * TILE_PY)
        return a[:w_local, :h]

    return unpack(cr), unpack(cg), unpack(cb), unpack(t)


def render_vrc_pallas_diff(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    packed: bool | None = None,
    light=None,
) -> jnp.ndarray:
    """a1/VRC render -> [W, H, 4], differentiable w.r.t. ``tf.colors``
    through fused Pallas forward AND backward kernels.  See
    _diff_march_tiles (the shared driver) for the full mode docs; the
    docstring below is the public contract."""
    cr, cg, cb, t = _diff_march_tiles(
        volume, tf, camera, config,
        interpret=interpret, packed=packed, light=light,
    )
    w, h = config.width, config.height
    bg = jnp.asarray(config.background, _f32)
    rgb = [c + t * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)


def render_vrc_pallas_diff_segment(
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
    packed: bool | None = None,
    light=None,
    x0=0,
    slab_x: int | None = None,
    baked_grids=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shard_map-friendly DIFFERENTIABLE fused work unit -> (C, T) segment.

    The training-path twin of ops/pallas_march.render_vrc_pallas_segment:
    marches ray columns [x_offset, x_offset + local_width) x samples
    [s_start, s_start + s_count) through the custom_vjp cores, so
    ``jax.grad`` of a sharded loss (parallel/render_dist.py with
    ``differentiable=True``) runs fused forward AND backward kernels on
    every device instead of the XLA scan — the round-3 `use_pallas=False`
    training cliff (diff/fit.py) closed.  Gradients flow to ``tf.colors``
    (+ density by the external alpha fold, + light params for a traced
    ``light``); the (C, T) composition across mesh axes is plain XLA
    (ops/composite.segment_compose), so its transpose is exact and the
    rays-axis psum is inserted by shard_map's transposition as usual.
    ``slab_x``/``x0`` add VOLUME-SLAB work units (round-4 VERDICT item
    1a): ``volume.data`` holds only the x-slab, both kernels apply the
    x-clamped ownership rule, and per-slab gradients psum to the
    replicated gradients exactly — volume-sharded training at kernel
    speed.  Baked lighting on slabs takes caller-computed
    ``baked_grids`` (halo-extended bake; render_dist's ppermute + crop);
    traced lights stay on rays/samples axes.  Matches the reference
    3-kernel pipeline kernel.cu:40-70,194-225 under shard_map
    transposition.
    """
    cr, cg, cb, t = _diff_march_tiles(
        volume, tf, camera, config,
        interpret=interpret, packed=packed, light=light,
        x_offset=x_offset, local_width=local_width,
        s_start=s_start, s_count=s_count,
        x0=x0, slab_x=slab_x, baked_grids=baked_grids,
    )
    return jnp.stack([cr, cg, cb], axis=-1), t[..., None]


def diff_pallas_streamed_eligible(volume: Volume, tf: TransferFunction,
                                  config: RenderConfig) -> bool:
    """Static predicate for the STREAMED differentiable path (round-4
    VERDICT item 1b): beyond-VMEM volumes train through the manual-DMA
    custom_vjp core — plain a1 classify, ortho, single channel, K <= 16.
    The resident tier (diff_pallas_eligible) is preferred when it fits;
    fit.py tries it first."""
    from .pallas_march import streamed_geometry

    return (
        jax.default_backend() == "tpu"
        and volume.channels == 1
        and not config.conic
        and not config.lighting
        and not config.scattering
        and not config.tf_lut
        and config.interp is Interp.NEAREST
        and tf.num_intervals <= 16
        and streamed_geometry(volume.dims, tf.num_intervals,
                              block_bytes=6 * 2**20) is not None
    )


def _diff_streamed_tiles(
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
    block_x: int | None = None,
):
    """Differentiable STREAMED driver -> (cr, cg, cb, t) [w_local,
    height] tiles for beyond-VMEM volumes (round-4 VERDICT item 1b).
    ``block_x`` overrides the auto block size (tests force multi-block
    streaming on small volumes).

    Stages the padded row grid once (HBM-resident; f32 rows for
    z <= 128, the packed 4-bit id grid otherwise), computes the
    forward's occupancy∩geometry block extents (value-exact skips) AND
    the backward's pure-ownership extents (no skips), and runs the
    manual-DMA custom_vjp core — the forward streams each block once,
    the backward twice.  Gradients flow to ``tf.colors`` (+ density by
    the external alpha fold).  Matches the scale point of the
    reference's 3.92 GB sample buffer (kernel.cu:1036-1043) with O(rays)
    memory and fused gradients."""
    from .pallas_march import (
        BRICK,
        brick_occupancy,
        pack_material_grid,
        streamed_geometry,
    )

    d1, d2, d3 = volume.dims
    if volume.channels != 1:
        raise ValueError("streamed diff path supports single-channel")
    if config.conic:
        raise ValueError("streamed diff path is ortho only")
    if config.lighting or config.scattering or config.tf_lut:
        raise ValueError(
            "streamed diff path is the plain a1 classify; use the XLA "
            "renderer for streamed lit/LUT training")
    if config.interp is not Interp.NEAREST:
        raise ValueError("streamed diff path is NEAREST sampling")
    if tf.num_intervals > 16:
        raise ValueError("streamed diff path supports at most 16 intervals")

    geo = streamed_geometry(volume.dims, tf.num_intervals,
                            block_bytes=6 * 2**20)
    if geo is None:
        raise ValueError(f"volume dims {volume.dims} not streamable")
    bx_auto, zpack = geo
    if block_x is None:
        block_x = bx_auto
    if block_x % 8:
        raise ValueError(f"block_x {block_x} must be a multiple of 8")
    d1p = _pad_to(d1, block_x)
    nxb = d1p // block_x
    packed = zpack is not None

    sg = jax.lax.stop_gradient
    colors = tf.colors
    if config.density_scale != 1.0:
        colors = colors.at[:, 3].set(
            jnp.clip(colors[:, 3] * np.float32(config.density_scale),
                     0.0, 1.0))
    tf_sg = TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(colors), hg_g=tf.hg_g)

    data = volume.data.reshape(volume.dims)
    data_p = jnp.pad(data, ((0, d1p - d1), (0, 0), (0, 0)))
    cal_max_trunc = jnp.trunc(jnp.asarray(volume.cal_max, _f32))
    id0 = jnp.zeros((), _f32)
    if packed:
        vol_rows, id0 = pack_material_grid(
            data_p, tf_sg, cal_max_trunc, zpack)
        block_rows = block_x * zpack[2]
    else:
        block_rows = block_x * d2
        vol_rows = jnp.zeros((d1p * d2, 128), _f32)
        vol_rows = vol_rows.at[:, :d3].set(data_p.reshape(d1p * d2, d3))

    # occupancy bricks, y/z-coarsened to the 1 MB SMEM budget (x stays
    # BRICK for block alignment — the same rule as the forward driver)
    brick = [BRICK, BRICK, BRICK]

    def _occ_ints(b):
        return (_pad_to(d1, b[0]) // b[0]) * (_pad_to(d2, b[1]) // b[1]) \
            * (_pad_to(d3, b[2]) // b[2])

    while _occ_ints(brick) * 4 > 512 * 1024:
        brick[1] *= 2
        brick[2] *= 2
    brick = tuple(brick)
    occ, nb = brick_occupancy(data, tf_sg, cal_max_trunc, brick=brick)
    alpha0 = sg(tf_sg.classify(jnp.zeros((), _f32))[3])

    # ---- forward block extents: occupancy ∩ geometry, alpha0-gated
    # (the SAME derivation the forward streamed driver uses — shared
    # helper so the two cannot drift)
    from .pallas_march import streamed_block_extents

    L = float(max(volume.dims))
    n = float(2**volume.octree_depth)
    bext = streamed_block_extents(
        occ, nb, volume.dims, volume.octree_depth, block_x, nxb, alpha0)

    # ---- backward OWNERSHIP extents: pure block geometry with the
    # clamp sides open (no occupancy/alpha0 gating — gradients are
    # nonzero where values are not)
    karr = jnp.arange(nxb, dtype=_f32) * np.float32(block_x)
    Lf = np.float32(L)
    nf = np.float32(n)
    hg0 = np.float32(Lf / 2) - np.float32(d1 / 2)
    geo_lo = (hg0 + karr) / Lf - 0.5
    geo_hi = (hg0 + karr + np.float32(block_x)) / Lf + 1.0 / nf - 0.5
    own_lo = jnp.asarray(geo_lo).at[0].set(-3.0e38)
    own_hi = jnp.asarray(geo_hi).at[-1].set(3.0e38)
    bown = jnp.stack([own_lo, own_hi], axis=-1).reshape(-1)

    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in volume.dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5
              for dim in volume.dims]

    w, h = config.width, config.height
    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count

    scal = jnp.concatenate([
        jnp.asarray([config.sample_distance, config.front_clip], _f32),
        cal_max_trunc[None],
        jnp.zeros((1,), _f32),  # early_eps = 0
        alpha0[None],
        camera.position.astype(_f32),
        camera.front.astype(_f32),
        camera.right.astype(_f32),
        camera.up.astype(_f32),
        camera.top_left.astype(_f32),
        jnp.asarray([config.real_screen_width, config.real_screen_height],
                    _f32),
        jnp.asarray(box_lo, _f32),
        jnp.asarray(box_hi, _f32),
        id0[None],  # [28] classify-index of vn=0 (packed mode)
        jnp.asarray(x_offset, _f32)[None],  # [29] ray-column offset
        jnp.asarray(s_start, _f32)[None],  # [30] sample-segment start
        jnp.zeros((1,), _f32),  # [31] block x0 base (kernel adds bk)
    ])

    core = _make_streamed_core(
        volume.dims, volume.octree_depth, tf.num_intervals, w, h,
        s_count, nb, block_x, nxb, block_rows, zpack,
        vol_rows.dtype.name, bool(interpret), local_width, brick)
    cr, cg, cb, t = core(colors, tf.lower, tf.upper, scal, vol_rows,
                         occ, bext, bown)

    ntx = -(-w_local // TILE_PX)
    nty = -(-h // TILE_PY)

    def unpack(a):
        a = a.reshape(ntx, nty, TILE_PX, TILE_PY)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * TILE_PX, nty * TILE_PY)
        return a[:w_local, :h]

    return unpack(cr), unpack(cg), unpack(cb), unpack(t)


def render_vrc_pallas_diff_streamed(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
    block_x: int | None = None,
) -> jnp.ndarray:
    """Beyond-VMEM a1 render -> [W, H, 4], differentiable w.r.t.
    ``tf.colors`` through the STREAMED custom_vjp core (see
    _diff_streamed_tiles).  Value-identical to
    ``render_vrc_pallas_streamed(..., early_eps=0)``; gradients match
    ``jax.grad`` through the XLA scan."""
    cr, cg, cb, t = _diff_streamed_tiles(
        volume, tf, camera, config, interpret=interpret, block_x=block_x)
    w, h = config.width, config.height
    bg = jnp.asarray(config.background, _f32)
    rgb = [c + t * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)


def render_vrc_pallas_diff_streamed_segment(
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shard_map-friendly DIFFERENTIABLE streamed work unit -> (C, T)
    segment: rays/samples axes over a beyond-VMEM volume (each device
    streams from its own HBM copy), fused forward AND backward kernels
    per device (round-4 VERDICT item 1b, sharded flavor)."""
    cr, cg, cb, t = _diff_streamed_tiles(
        volume, tf, camera, config, interpret=interpret,
        x_offset=x_offset, local_width=local_width,
        s_start=s_start, s_count=s_count)
    return jnp.stack([cr, cg, cb], axis=-1), t[..., None]


@functools.lru_cache(maxsize=32)
def _make_mc_core(dims, depth, num_intervals, width, height, spr, nb,
                  rows, ngrids, grows_n, interpret, zpack,
                  local_width=None):
    """custom_vjp'd MULTICHANNEL tile renderer (round-5): rgb from the
    normalized channel grids (data-only), alpha from the packed mean-id
    classify — so the color table receives exact ALPHA-column gradients
    and zero rgb gradients (the multichannel sampler takes rgb from the
    data, models/raycast._vrc_sample_rgba_multichannel)."""
    ntx = -(-(width if local_width is None else local_width) // TILE_PX)
    nty = -(-height // TILE_PY)
    krows = 8 if num_intervals <= 8 else 16
    tile = (TILE_PX, TILE_PY, STEPS)

    fwd_kernel = functools.partial(
        _march_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=False,
        density_scale=1.0, nbricks=nb, zpack=zpack, tile=tile,
        local_width=local_width, mc_grids=ngrids,
    )
    bwd_kernel = functools.partial(
        _march_bwd_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=False,
        zpack=zpack, krows=krows, local_width=local_width,
        mc_grids=ngrids,
    )

    smem = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(5)]
    vol_spec = pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    mc_specs = [pl.BlockSpec((grows_n, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(ngrids)]
    tile_spec = [pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    tile_shape = [jax.ShapeDtypeStruct((ntx, nty, 2, 128), _f32)
                  for _ in range(4)]

    def forward_tiles(colors, lower, upper, scal, vol_rows, occ, mcg):
        return tuple(pl.pallas_call(
            fwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(ntx, nty),
                in_specs=smem + [vol_spec] + mc_specs,
                out_specs=tile_spec),
            out_shape=tile_shape,
            interpret=interpret,
        )(scal, lower, upper, colors, occ, vol_rows, *mcg))

    @jax.custom_vjp
    def core(colors, lower, upper, scal, vol_rows, occ, *mcg):
        return forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                             mcg)

    def core_fwd(colors, lower, upper, scal, vol_rows, occ, *mcg):
        return (forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                              mcg),
                (colors, lower, upper, scal, vol_rows, occ) + mcg)

    def core_bwd(res, g):
        colors, lower, upper, scal, vol_rows, occ = res[:6]
        mcg = res[6:]
        dtiles = pl.pallas_call(
            bwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(ntx, nty),
                in_specs=smem[:4] + [vol_spec] + mc_specs + [
                    pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(4)
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, krows, 128), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((ntx, nty, krows, 128), _f32),
            interpret=interpret,
        )(scal, lower, upper, colors, vol_rows, *mcg, *g)
        dcolors = dtiles.sum(axis=(0, 1))[:num_intervals, :4]
        z = jnp.zeros_like
        return (dcolors, z(lower), z(upper), z(scal),
                _zero_cot_pub(vol_rows), _zero_cot_pub(occ)
                ) + tuple(z(m) for m in mcg)

    core.defvjp(core_fwd, core_bwd)
    return core


def diff_pallas_mc_eligible(volume: Volume, tf: TransferFunction,
                            config: RenderConfig) -> bool:
    """Static predicate for the MULTICHANNEL differentiable fused path
    (round-5): 4-D volumes train their TF alpha column at kernel speed
    (rgb is data-derived; no rgb cotangents exist)."""
    from .pallas_march import multichannel_feasible

    return (
        jax.default_backend() == "tpu"
        and volume.channels > 1
        and not config.conic
        and not config.scattering
        and config.algorithm.name == "VRC"
        and tf.num_intervals <= 16
        and multichannel_feasible(
            volume.dims, volume.channels, tf.num_intervals, config)
    )


def render_vrc_pallas_diff_multichannel(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-channel a1 render -> [W, H, 4], differentiable w.r.t. the TF
    ALPHA column through fused Pallas forward+backward kernels (rgb is
    data-derived — its color-table cotangents are identically zero, which
    the backward reproduces exactly).  Value-identical to the fused
    multichannel forward == the XLA multichannel scan."""
    from .pallas_march import (
        _stage_f32_rows,
        brick_occupancy,
        multichannel_feasible,
        pack_material_grid,
        packed_geometry,
    )

    d1, d2, d3 = volume.dims
    if volume.channels < 2:
        raise ValueError("use render_vrc_pallas_diff for single-channel")
    if config.conic or config.scattering:
        raise ValueError("mc diff path is ortho, unscattered")
    if not multichannel_feasible(
            volume.dims, volume.channels, tf.num_intervals, config):
        raise ValueError(
            "multichannel pallas path infeasible for this config "
            "(needs plain NN classify + the VMEM budget)")
    sg = jax.lax.stop_gradient
    colors = tf.colors
    if config.density_scale != 1.0:
        colors = colors.at[:, 3].set(
            jnp.clip(colors[:, 3] * np.float32(config.density_scale),
                     0.0, 1.0))
    tf_sg = TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(colors), hg_g=tf.hg_g)

    zpack = packed_geometry(volume.dims, tf.num_intervals)
    cal_raw = jnp.asarray(volume.cal_max, _f32)
    norm4 = jnp.maximum(
        volume.data.reshape(volume.dims + (volume.channels,)), 0.0
    ) / cal_raw
    meanv = jnp.mean(norm4, axis=-1)
    one = jnp.ones((), _f32)
    vol_rows, id0 = pack_material_grid(meanv, tf_sg, one, zpack)
    rows = vol_rows.shape[0]
    occ, nb = brick_occupancy(meanv, tf_sg, one)
    alpha0 = sg(tf_sg.classify(jnp.zeros((), _f32))[3])

    ngrids = 1 if volume.channels < 3 else 3
    mcg = tuple(_stage_f32_rows(norm4[..., ci], d1, d2, d3)
                for ci in range(ngrids))
    grows_n = mcg[0].shape[0]

    L = float(max(volume.dims))
    n = float(2**volume.octree_depth)
    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in volume.dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5
              for dim in volume.dims]
    w, h = config.width, config.height
    scal = jnp.concatenate([
        jnp.asarray([config.sample_distance, config.front_clip], _f32),
        jnp.trunc(cal_raw)[None],
        jnp.zeros((1,), _f32),  # early_eps = 0
        alpha0[None],
        camera.position.astype(_f32),
        camera.front.astype(_f32),
        camera.right.astype(_f32),
        camera.up.astype(_f32),
        camera.top_left.astype(_f32),
        jnp.asarray([config.real_screen_width, config.real_screen_height],
                    _f32),
        jnp.asarray(box_lo, _f32),
        jnp.asarray(box_hi, _f32),
        id0[None],
        jnp.zeros((3,), _f32),  # x_offset, s_start, slab x0
    ])

    core = _make_mc_core(
        volume.dims, volume.octree_depth, tf.num_intervals, w, h,
        config.samples_per_ray, nb, rows, ngrids, grows_n,
        bool(interpret), zpack)
    cr, cg, cb, t = core(colors, tf.lower, tf.upper, scal, vol_rows,
                         occ, *mcg)

    ntx = -(-w // TILE_PX)
    nty = -(-h // TILE_PY)

    def unpack(a):
        a = a.reshape(ntx, nty, TILE_PX, TILE_PY)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * TILE_PX, nty * TILE_PY)
        return a[:w, :h]

    t2 = unpack(t)
    bg = jnp.asarray(config.background, _f32)
    rgb = [unpack(c) + t2 * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)
