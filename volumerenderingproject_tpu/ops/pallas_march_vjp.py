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

    ``baked_light``: the forward shades classified colors with baked
    per-voxel factors, c' = c * M + S (ops/pallas_march.bake_light_grids).
    M and S are volume-only quantities — constants w.r.t. the TF colors —
    so the chain rule just scales the rgb scatter by the sample's M
    (dC/dc_k = w * M) and routes the alpha gradient through the SHADED
    g.c' (the (M, S) grids themselves get zero cotangents)."""
    rest = list(rest)
    mg_ref = rest.pop(0) if baked_light else None
    sg_ref = rest.pop(0) if baked_light else None
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
    lw = width if local_width is None else local_width

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
        if packed:
            # material-id grid fetch (mirrors _march_kernel's packed mode)
            ygrp = jnp.where(valid, ijk[1] // ypack, 0)
            rowid = jnp.where(valid, ijk[0] * nyg + ygrp, -1)
            iz = jnp.where(
                valid, (ijk[1] - ygrp * ypack) * zw + ijk[2] // 8, 0)
            ry = ygrp
            stride = nyg
            acc_dtype = _i32
        else:
            rowid = jnp.where(valid, ijk[0] * d2 + ijk[1], -1)
            iz = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
            ry = ijk[1]
            stride = d2
            acc_dtype = _f32
        rxmin = jnp.min(jnp.where(valid, ijk[0], _BIG))
        rymin = jnp.min(jnp.where(valid, ry, _BIG))
        rxmax = jnp.max(jnp.where(valid, ijk[0], -1))
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
        if baked_light:
            # fetch the baked (M, S) factors at the sample voxel (f32 row
            # layout regardless of the main grid's packing) and shade:
            # c' = c * M + S — mirrors _march_kernel's baked_light block
            rowid_f = jnp.where(valid, ijk[0] * d2 + ijk[1], -1)
            iz_f = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
            rfxmin = jnp.min(jnp.where(valid, ijk[0], _BIG))
            rfymin = jnp.min(jnp.where(valid, ijk[1], _BIG))
            rfxmax = jnp.max(jnp.where(valid, ijk[0], -1))
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
        # dC/dc_k = w (x M when the forward shades c' = c * M + S)
        wc = w_all * mval if baked_light else w_all
        for k in range(num_intervals):
            mf = (matches[k] & live).astype(_f32)
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
               local_width=None):
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
    mrows = _pad_to(dims[0] * dims[1], 8)

    fwd_kernel = functools.partial(
        _march_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=conic,
        density_scale=1.0, nbricks=nb, zpack=zpack, baked_light=baked,
        local_width=local_width,
    )
    bwd_kernel = functools.partial(
        _march_bwd_kernel,
        dims=dims, depth=depth, num_intervals=num_intervals,
        width=width, height=height, spr=spr, conic=conic,
        zpack=zpack, krows=krows, baked_light=baked,
        local_width=local_width,
    )

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
        ] + baked_specs,  # [M rows, S rows]
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

    def forward_tiles(colors, lower, upper, scal, vol_rows, occ, mg, sgd):
        extra = (mg, sgd) if baked else ()
        out = pl.pallas_call(
            fwd_kernel,
            grid_spec=fwd_grid_spec,
            out_shape=tile_shape,
            interpret=interpret,
        )(scal, lower, upper, colors, occ, vol_rows, *extra)
        return tuple(out)

    @jax.custom_vjp
    def core(colors, lower, upper, scal, vol_rows, occ, mg, sgd):
        return forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                             mg, sgd)

    def core_fwd(colors, lower, upper, scal, vol_rows, occ, mg, sgd):
        out = forward_tiles(colors, lower, upper, scal, vol_rows, occ,
                            mg, sgd)
        return out, (colors, lower, upper, scal, vol_rows, occ, mg, sgd)

    def _zero_cot(x):
        # integer primals (packed material grid, occupancy bricks) take
        # float0 cotangents per the custom_vjp contract
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    def core_bwd(res, g):
        colors, lower, upper, scal, vol_rows, occ, mg, sgd = res
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
                _zero_cot(occ), z(mg), z(sgd))

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


def diff_pallas_light_eligible(volume: Volume, tf: TransferFunction,
                               config: RenderConfig) -> bool:
    """Static predicate: can a fit optimize *light parameters* through the
    fused kernels?  Needs the baked-light path (ortho camera + VMEM
    budget) on top of the base diff-kernel eligibility."""
    from .pallas_march import baked_light_feasible

    return (
        diff_pallas_eligible(volume, tf, config)
        and not config.conic
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
    return (
        jax.default_backend() == "tpu"
        and volume.channels == 1
        and fits
        and lighting_ok
        and config.interp is Interp.NEAREST
        and not config.tf_lut
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
):
    """Differentiable fused-march driver -> (cr, cg, cb, t), each
    [w_local, height] f32 — the (C, T) segment of ray columns
    [x_offset, x_offset + local_width) x samples [s_start, s_start +
    s_count), differentiable w.r.t. ``tf.colors`` (and light params when
    a traced ``light`` is passed) through the custom_vjp cores.  Offsets
    may be traced (axis_index-derived); shapes are static.  See
    render_vrc_pallas_diff for semantics and caveats.

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
    if volume.channels != 1:
        raise ValueError("diff pallas path supports single-channel volumes")
    if config.tf_lut or config.interp is not Interp.NEAREST:
        raise ValueError(
            "diff pallas path is the plain a1 classify (no LUT/"
            "trilinear); use the XLA renderer")
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
        if (config.conic
                or not (light_traced or _uniform_light_color(light))
                or not baked_light_feasible(
                    volume.dims, tf.num_intervals, config)):
            raise ValueError(
                "diff pallas lighting needs the baked path: ortho camera, "
                "statically-uniform light color (pass light=None for the "
                "default), z <= 128 and the VMEM budget; use the XLA "
                "renderer otherwise")
    zpack = packed_geometry(volume.dims, tf.num_intervals)
    if packed is None:
        # baked lighting prefers the packed main grid (the two f32 factor
        # grids take most of the VMEM budget)
        packed = (d3 > 128 or baked) and zpack is not None
    if packed and zpack is None:
        raise ValueError(
            f"dims {volume.dims} / {tf.num_intervals} intervals don't fit "
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
            volume.data.reshape(volume.dims),
            TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(colors), hg_g=tf.hg_g),
            cal_max_trunc, zpack)
    else:
        zpack = None
        rows = _pad_to(d1 * d2, 8)
        vol_rows = jnp.zeros((rows, 128), _f32)
        vol_rows = vol_rows.at[: d1 * d2, :d3].set(
            volume.data.reshape(d1 * d2, d3))
    rows = vol_rows.shape[0]

    # skip-control inputs (value-inert): occupancy bricks + TF(0) alpha
    tf_sg = TransferFunction(lower=sg(tf.lower), upper=sg(tf.upper),
                             colors=sg(colors), hg_g=tf.hg_g)
    occ, nb = brick_occupancy(
        volume.data.reshape(volume.dims), tf_sg, cal_max_trunc)
    alpha0 = sg(tf_sg.classify(jnp.zeros((), _f32))[3])

    L = float(max(volume.dims))
    n = float(2**volume.octree_depth)
    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in volume.dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5
              for dim in volume.dims]

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
        jnp.asarray(box_lo, _f32),
        jnp.asarray(box_hi, _f32),
        id0[None],  # [28] classify-index of vn=0 (packed mode)
        jnp.asarray(x_offset, _f32)[None],  # [29] ray-column offset
        jnp.asarray(s_start, _f32)[None],  # [30] sample-segment start
        jnp.zeros((1,), _f32),  # [31] slab x0 (diff path: full volume)
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
            mgrid, sgrid = bake_light_grids(
                volume.data.reshape(volume.dims), config, lg, -camera.front)
            mg = sg(_stage_f32_rows(mgrid, d1, d2, d3))
            sgd = sg(_stage_f32_rows(sgrid, d1, d2, d3))
        else:
            mg = sgd = jnp.zeros((8, 128), _f32)  # ignored dummies

        core = _make_core(
            volume.dims, volume.octree_depth, tf.num_intervals, w, h,
            s_count, bool(config.conic), nb, rows,
            bool(interpret), zpack, baked, local_width,
        )
        cr, cg, cb, t = core(colors, tf.lower, tf.upper, scal, vol_rows,
                             occ, mg, sgd)

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
    Volume slabs are NOT supported here (the backward's footprint runs on
    the full grid); render_dist keeps volume-sharded training on the XLA
    scan segments.  Matches the reference 3-kernel pipeline
    kernel.cu:40-70,194-225 under shard_map transposition.
    """
    cr, cg, cb, t = _diff_march_tiles(
        volume, tf, camera, config,
        interpret=interpret, packed=packed, light=light,
        x_offset=x_offset, local_width=local_width,
        s_start=s_start, s_count=s_count,
    )
    return jnp.stack([cr, cg, cb], axis=-1), t[..., None]
