"""Fused Pallas TPU ray-march kernel for the a1/VRC pipeline.

One kernel fuses the reference's three-kernel pipeline (ray setup ->
per-sample classify -> composite, kernel.cu:20-225) per tile of rays:
ray setup, octree-equivalent NN indexing, transfer-function classification,
and front-to-back (C, T) accumulation all stay in registers/VMEM — no
materialized W*H*spr sample buffer (the reference allocates 3.92 GB at
700^2x500, kernel.cu:1036-1043) and no HBM round trips between stages.

Why this shape.  XLA's per-element gather on TPU tops out at ~1.5e8
elements/s (measured; it is the entire cost of the scan renderer at
~93% of frame time).  The TPU's fast data-dependent primitive is the
per-lane dynamic gather (``take_along_axis`` axis=-1 on an [8,128] tile,
~tens of cycles for 1024 elements), plus dynamically-addressed VMEM row
reads.  The kernel is built around them:

  * The volume lives fully in VMEM as rows [d1*d2 (pad 8), 128] with z on
    lanes (requires d3 <= 128; bigger volumes use the XLA scan renderer).
  * Rays are processed in pixel tiles (default 32x32 = 1024 rays); each
    kernel-loop iteration marches ``steps`` (default 16) consecutive
    samples of every ray in the tile, packed as an [E,128] element grid
    (slot e = step*nrays + ray).  The (tile_px, tile_py, steps) shape is
    a tunable; DEFAULT_TILE was swept on hardware.
  * The voxel fetch loops over the tile-chunk's *voxel footprint*
    (dynamic [ix_min..ix_max] x [iy_min..iy_max] ranges, typically ~8x8
    for coherent tiles): one VMEM row read + one lane-gather by z + one
    row-id compare/select per (ix, iy).  Cost tracks ray coherence, not
    volume size.

Work skipping (the reference's octree empty-space skip, done the
tile-uniform TPU way — SURVEY.md §7 "divergence-free skipping"):

  * Per-tile sample-range clipping: rays are intersected with the dataset
    box in-kernel; whole chunks before entry / after exit are never
    marched (the default orbit camera wastes ~40% of its samples in front
    of the volume).
  * Brick occupancy skip: an 8^3-brick bitmap of "any voxel classifies to
    alpha > 0 under this TF" (built in XLA per call, staged in SMEM)
    lets the kernel skip chunks whose footprint is transparent — the
    min==max early-out of Octree.cu:162-183 generalized to the actual TF.
  * Early ray termination: the chunk loop stops when every ray in the
    tile has transmittance below ``early_eps`` (front-to-back order makes
    this possible; the reference's back-to-front blend cannot).

All skips are exact (skipped samples provably contribute alpha=0), except
``early_eps`` which bounds the error by eps * max color; ``early_eps=0``
matches ``render_vrc(..., mode="fast")`` bit-for-bit: float op order below
mirrors models/raycast.py + ops/sampling.py expression by expression.
When TF(0).alpha > 0 (out-of-volume samples visible) every skip except
early termination disables itself — see ``alpha0`` below.

Packed material-grid mode (``packed=True``, the default where eligible):
the a1 pipeline only ever uses a voxel's intensity through the
transfer-function classify (kernel.cu:64-67: intensity -> material ->
RGBA), so the kernel can march a *material-id grid* instead of the f32
volume.  The ids (the TF's last-match-wins interval index, computed
exactly in XLA at f32 precision per call) are packed 8-per-i32-word
(4 bits each, <= 16 intervals) and ``ypack`` y-rows share one 128-lane
VMEM row.  This is bit-exact vs the f32 path by construction, shrinks
VMEM residency ~8-10x (MNI152-1mm-class 182x218x182 volumes fit: ~4 MB
vs 40 MB f32, which cannot), lifts the z<=128 lane limit to z<=1024,
and cuts the footprint fetch loop by the ypack factor.
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

_f32 = jnp.float32
_i32 = jnp.int32

TILE_PX = 16  # pixel-tile width (legacy default, shared by a5/vjp kernels)
TILE_PY = 16  # pixel-tile height (256 rays/tile)
STEPS = 4  # samples marched per [8,128] register (legacy default)
# Forward-kernel default (swept on a v5e chip at 700^2 spr500: 2.4x the
# 16x16x4 legacy shape — deeper step batching amortizes each footprint
# row-read over 16 samples and wider tiles amortize per-chunk scalar work):
DEFAULT_TILE = (32, 32, 16)
BRICK = 8  # occupancy brick edge (voxels)
_BIG = 2**30  # "invalid" sentinel for footprint mins


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _iota(dim: int, rows: int = 8) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(_i32, (rows, 128), dim)


def _march_kernel(
    # SMEM
    scal_ref,  # [32] f32: geometry + camera scalars (see _SCAL_* below)
    tf_lower_ref,  # [K]
    tf_upper_ref,  # [K]
    tf_colors_ref,  # [K, 4]
    occ_ref,  # [nbx*nby*nbz] i32 brick occupancy
    # VMEM
    vol_ref,  # [pad8(d1*d2), 128] volume rows, z on lanes
    *rest,  # [light_ref (SMEM [10])] [lut_ref (VMEM)] out_r/g/b/t_ref
    dims: Tuple[int, int, int],
    depth: int,
    num_intervals: int,
    width: int,
    height: int,
    spr: int,
    conic: bool,
    density_scale: float,
    nbricks: Tuple[int, int, int],
    zpack: Tuple[int, int, int] | None = None,
    tile: Tuple[int, int, int] = (TILE_PX, TILE_PY, STEPS),
    local_width: int | None = None,
    slab_x: int | None = None,
    hbm_mode: bool = False,
    lighting: bool = False,
    lut_n: int = 0,
):
    """``spr`` is the LOCAL sample count of this segment; the global sample
    index is ``scal[30] + local`` (full renders pass s_start=0 so the two
    coincide).  ``local_width``/``scal[29]`` and ``slab_x``/``scal[31]``
    likewise carry the ray-column tile and the volume x-slab for sharded
    segments (parallel/render_dist.py) — see render_vrc_pallas_segment.

    ``hbm_mode``: the volume stays in HBM and grid dim 2 streams it through
    VMEM one x-block (``slab_x`` planes) at a time — Pallas double-buffers
    the block DMA against compute.  Each (tile, block) invocation marches
    only its block's samples (slab ownership) into a local (C, T) segment
    and composes it into the persistent output block in visibility order
    (sign(front.x)); see render_vrc_pallas_streamed.

    ``lighting``: Blinn-Phong gradient shading fused in-kernel (BASELINE
    config 2): central-difference normals computed from neighbor rows/lanes
    during the footprint fetch (5 row reads per cell instead of 1), exactly
    the semantics of ops/phong.phong_shade on conv3d gradients.  Needs the
    f32 row layout (packed ids carry no intensities).  ``lut_n``: classify
    through a dense round-to-nearest LUT (config.tf_lut) staged in VMEM as
    [4 * ceil(N/128), 128] channel-major rows."""
    rest = list(rest)
    light_ref = rest.pop(0) if lighting else None
    lut_ref = rest.pop(0) if lut_n else None
    out_r_ref, out_g_ref, out_b_ref, out_t_ref = rest
    d1, d2, d3 = dims
    lw = width if local_width is None else local_width
    slab = slab_x is not None
    dx_local = slab_x if slab else d1  # x extent of the staged rows
    tpx, tpy, steps = tile  # pixel-tile width/height, samples per register
    nrays = tpx * tpy
    E = nrays * steps // 128  # sublane rows of the full element grid
    RT = nrays // 128  # sublane rows of one ray set
    packed = zpack is not None
    if packed:
        zw, ypack, nyg = zpack  # i32-words/z-column, y-rows/VMEM-row, y-groups
    L = np.float32(max(dims))
    n = np.float32(2**depth)
    nchunks = -(-spr // steps)
    nbx, nby, nbz = nbricks
    # centered-dataset constants, f32-exact (all /2 of representables)
    hg = [np.float32(L / 2) - np.float32(d / 2) for d in dims]
    hg_hi = [np.float32(hg[c] + np.float32(dims[c])) for c in range(3)]
    halfd = [np.float32(d / 2) for d in dims]
    halfL = np.float32(L / 2)

    ds = scal_ref[0]
    clip = scal_ref[1]
    cal_max = scal_ref[2]
    eps = scal_ref[3]
    alpha0_pos = scal_ref[4] > 0.0  # TF(0).alpha > 0 => skipping unsafe
    pos = [scal_ref[5 + c] for c in range(3)]
    front = [scal_ref[8 + c] for c in range(3)]
    right = [scal_ref[11 + c] for c in range(3)]
    up = [scal_ref[14 + c] for c in range(3)]
    tl = [scal_ref[17 + c] for c in range(3)]  # conic: corrected corner
    rsw = scal_ref[20]
    rsh = scal_ref[21]
    box_lo = [scal_ref[22 + c] for c in range(3)]  # dataset box, pos space
    box_hi = [scal_ref[25 + c] for c in range(3)]
    x_off_i = scal_ref[29].astype(_i32)  # ray-column offset (segments)
    s_start_i = scal_ref[30].astype(_i32)  # global index of local sample 0
    x0_i = scal_ref[31].astype(_i32)  # volume-slab x offset (slab mode)

    tx = pl.program_id(0)
    ty = pl.program_id(1)
    if hbm_mode:
        # grid dim 2 streams x-blocks of the volume; this invocation owns
        # the block starting at global voxel x0
        kblk = pl.program_id(2)
        x0_i = x0_i + kblk * slab_x
        # tighten the chunk-range box to this block's x extent (the
        # sharded-segment wrapper does this on the host; here x0 varies
        # per grid step).  hg/L constants are compile-time f32.
        x0f = x0_i.astype(_f32)
        blk_lo = (hg[0] + x0f) / L - 0.5
        blk_hi = (hg[0] + (x0f + np.float32(slab_x))) / L + 1.0 / n - 0.5
        box_lo = [jnp.maximum(box_lo[0], blk_lo), box_lo[1], box_lo[2]]
        box_hi = [jnp.minimum(box_hi[0], blk_hi), box_hi[1], box_hi[2]]

    # ---- slot decode: e = step*nrays + u*tpy + v -----------------------
    e = _iota(0, E) * 128 + _iota(1, E)
    s_idx = e // nrays  # step-in-chunk 0..steps-1
    f = e % nrays
    u = f // tpy
    v = f % tpy
    lxp = tx * tpx + u  # local pixel column
    pxi = lxp + x_off_i  # global pixel column (ray math uses global)
    pyi = ty * tpy + v
    pix_ok = (lxp < lw) & (pyi < height)
    px = pxi.astype(_f32)
    py = pyi.astype(_f32)

    # ---- ray setup (rayDirectionKernel kernel.cu:20-38 float order) ----
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

    # ---- per-tile chunk-range from ray/dataset-box intersection --------
    # conservative slab test; a +-1-chunk margin absorbs float slop
    t_lo = jnp.full((E, 128), -jnp.inf, _f32)
    t_hi = jnp.full((E, 128), jnp.inf, _f32)
    for c in range(3):
        safe = jnp.abs(d[c]) > 1e-12
        dv = jnp.where(safe, d[c], 1.0)
        ta = (box_lo[c] - o[c]) / dv
        tb = (box_hi[c] - o[c]) / dv
        inside_c = (o[c] >= box_lo[c]) & (o[c] <= box_hi[c])
        lo_c = jnp.where(safe, jnp.minimum(ta, tb),
                         jnp.where(inside_c, -jnp.inf, jnp.inf))
        hi_c = jnp.where(safe, jnp.maximum(ta, tb),
                         jnp.where(inside_c, jnp.inf, -jnp.inf))
        t_lo = jnp.maximum(t_lo, lo_c)
        t_hi = jnp.minimum(t_hi, hi_c)
    hit = (t_hi >= t_lo) & pix_ok
    big = jnp.asarray(3.4e38, _f32)
    t_enter = jnp.min(jnp.where(hit, t_lo, big))
    t_exit = jnp.max(jnp.where(hit, t_hi, -big))
    i_lo = jnp.floor((t_enter - clip) / ds).astype(_i32) - 1 - s_start_i
    i_hi = jnp.ceil((t_exit - clip) / ds).astype(_i32) + 1 - s_start_i
    chunk_lo = jnp.clip(i_lo // steps, 0, nchunks)
    chunk_hi = jnp.clip(i_hi // steps + 1, 0, nchunks)
    # TF(0).alpha > 0: out-of-volume samples are visible, march everything
    chunk_lo = jnp.where(alpha0_pos, 0, chunk_lo)
    chunk_hi = jnp.where(alpha0_pos, nchunks, chunk_hi)

    def classify(vn):
        """Ascending last-match-wins interval scan (TransferFunction.cu:46-55)."""
        out = [jnp.full((E, 128), tf_colors_ref[0, c], _f32) for c in range(4)]
        for k in range(num_intervals):
            m = (vn >= tf_lower_ref[k]) & (vn <= tf_upper_ref[k])
            for c in range(4):
                out[c] = jnp.where(m, tf_colors_ref[k, c], out[c])
        return out

    def classify_id(mid):
        """Packed mode: the interval scan already ran in XLA; mid *is* the
        selected interval index — just look the RGBA up."""
        out = [jnp.full((E, 128), tf_colors_ref[0, c], _f32) for c in range(4)]
        for k in range(1, num_intervals):
            m = mid == k
            for c in range(4):
                out[c] = jnp.where(m, tf_colors_ref[k, c], out[c])
        return out

    def classify_lut(vn):
        """Dense-LUT classify (models/raycast.py lut branch): round vn to
        the nearest of lut_n entries, fetch RGBA by per-lane gather over
        the channel-major LUT rows."""
        R = -(-lut_n // 128)
        idx = jnp.clip(
            jnp.round(vn * np.float32(lut_n - 1)).astype(_i32),
            0, lut_n - 1)
        rid = idx // 128
        lane = idx % 128
        out = []
        for c in range(4):
            o = jnp.zeros((E, 128), _f32)
            for r in range(R):
                bc = jnp.broadcast_to(
                    lut_ref[pl.ds(c * R + r, 1), :], (E, 128))
                o = jnp.where(rid == r,
                              jnp.take_along_axis(bc, lane, axis=1), o)
            out.append(o)
        return out

    # ---- per-tile scalar ray bounds (for the cheap chunk box test) -----
    big = jnp.asarray(3.4e38, _f32)
    o_min = [jnp.min(jnp.where(pix_ok, o[c], big)) for c in range(3)]
    o_max = [jnp.max(jnp.where(pix_ok, o[c], -big)) for c in range(3)]
    d_min = [jnp.min(jnp.where(pix_ok, d[c], big)) for c in range(3)]
    d_max = [jnp.max(jnp.where(pix_ok, d[c], -big)) for c in range(3)]

    def chunk_body(carry):
        ci, cr, cg, cb, t = carry

        # ---- scalar interval box for this chunk (conservative) ---------
        # every transform below is monotone, so pushing the widened bounds
        # through the exact index chain bounds the chunk's voxel footprint;
        # the 1e-5 margin dominates any 1-ulp reassociation difference
        t0s = (s_start_i + ci * steps).astype(_f32) * ds + clip
        t1s = (s_start_i + ci * steps + (steps - 1)).astype(_f32) * ds + clip
        blo, bhi = [], []
        box_ok = jnp.asarray(True)
        for c in range(3):
            prods = [t0s * d_min[c], t0s * d_max[c],
                     t1s * d_min[c], t1s * d_max[c]]
            plo = o_min[c] + jnp.minimum(
                jnp.minimum(prods[0], prods[1]),
                jnp.minimum(prods[2], prods[3])) + 0.5 - 1e-5
            phi = o_max[c] + jnp.maximum(
                jnp.maximum(prods[0], prods[1]),
                jnp.maximum(prods[2], prods[3])) + 0.5 + 1e-5
            alo = jnp.maximum(plo, 0.0)
            ahi = jnp.minimum(phi, np.float32(1.0 - 2.0**-24))
            box_ok &= alo <= ahi
            rlo = jnp.maximum((jnp.floor(alo * n) / n) * L, hg[c])
            rhi = jnp.minimum((jnp.floor(ahi * n) / n) * L, hg_hi[c])
            box_ok &= rlo < hg_hi[c]
            box_ok &= rhi >= hg[c]
            ilo = jnp.trunc((rlo + halfd[c]) - halfL).astype(_i32)
            ihi = jnp.trunc((rhi + halfd[c]) - halfL).astype(_i32)
            if c == 0 and slab:
                # occupancy bricks live on the slab's local x grid
                ilo = ilo - x0_i
                ihi = ihi - x0_i
                box_ok &= ihi >= 0
                box_ok &= ilo < slab_x
            ext = dx_local if c == 0 else dims[c]
            blo.append(jnp.clip(ilo, 0, ext - 1) // BRICK)
            bhi.append(jnp.clip(ihi, 0, ext - 1) // BRICK)

        # ---- brick occupancy: any alpha>0 voxel in the box? ------------
        zero_i = jnp.asarray(0, _i32)
        # hbm_mode streams blocks against the GLOBAL brick map (block_x is
        # a multiple of BRICK, so local brick x + x0/BRICK is exact); the
        # sharded slab path passes slab-local bricks (no offset)
        bx_off = (x0_i // BRICK) if hbm_mode else jnp.asarray(0, _i32)

        def occ_x(bx, acc):
            def occ_y(by, acc):
                def occ_z(bz, acc):
                    return acc | occ_ref[((bx + bx_off) * nby + by) * nbz + bz]
                return jax.lax.fori_loop(blo[2], bhi[2] + 1, occ_z, acc)
            return jax.lax.fori_loop(blo[1], bhi[1] + 1, occ_y, acc)

        occupied = jax.lax.cond(
            box_ok,
            lambda: jax.lax.fori_loop(blo[0], bhi[0] + 1, occ_x, zero_i),
            lambda: zero_i,
        )
        do_work = alpha0_pos | (occupied > 0)

        def work(args):
            cr, cg, cb, t = args
            i_f = (s_start_i + ci * steps + s_idx).astype(_f32)
            ti = i_f * ds + clip  # kernel.cu:54,59
            p = [(o[c] + ti * d[c]) + 0.5 for c in range(3)]  # modelAux

            # rays whose transmittance is already below eps can't change the
            # output by more than eps — drop them from the footprint (for
            # eps=0 this only drops exact-zero-T rays: still bit-exact)
            tt = jnp.concatenate([t] * steps, axis=0) if steps > 1 else t
            inside = pix_ok & (tt > jnp.maximum(eps, 0.0))
            for c in range(3):
                inside &= (p[c] >= 0.0) & (p[c] < 1.0)
            # dyadic snap -> centered voxel index (ops/sampling)
            res = [(jnp.floor(p[c] * n) / n) * L for c in range(3)]
            valid = inside
            for c in range(3):
                valid &= (res[c] >= hg[c]) & (res[c] < hg_hi[c])
            ijk = [jnp.trunc((res[c] + halfd[c]) - halfL).astype(_i32)
                   for c in range(3)]
            if slab:
                # ownership: every sample belongs to exactly one slab — the
                # one owning its x-clamped voxel (matches the XLA slab path,
                # ops/sampling.octree_nn_sample_slab); non-owned samples
                # contribute the over identity (alpha forced 0 below)
                gx = jnp.clip(ijk[0], 0, d1 - 1)
                owned = (gx >= x0_i) & (gx < x0_i + slab_x)
                valid &= owned
                lxv = ijk[0] - x0_i
            else:
                lxv = ijk[0]
            if packed:
                # material-id grid: row = (ix, iy//ypack), lane =
                # (iy%ypack)*zw + iz//8, nibble = (iz%8)*4
                ygrp = jnp.where(valid, ijk[1] // ypack, 0)
                rowid = jnp.where(valid, lxv * nyg + ygrp, -1)
                iz = jnp.where(
                    valid, (ijk[1] - ygrp * ypack) * zw + ijk[2] // 8, 0)
                ry = ygrp
                stride = nyg
            else:
                rowid = jnp.where(valid, lxv * d2 + ijk[1], -1)
                iz = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
                ry = ijk[1]
                stride = d2
            rxmin = jnp.min(jnp.where(valid, lxv, _BIG))
            rymin = jnp.min(jnp.where(valid, ry, _BIG))
            rxmax = jnp.max(jnp.where(valid, lxv, -1))
            rymax = jnp.max(jnp.where(valid, ry, -1))

            # ---- fetch: footprint loop, one row per (ix, iy[-group]) ---
            acc_dtype = _i32 if packed else _f32
            vrows = vol_ref.shape[0]

            if lighting:
                # fetch the sample's value AND its 6 neighbors' values for
                # the central-difference normal (conv3d zero padding ==
                # the boundary masks below); z+-1 are lane shifts of the
                # center row, x/y+-1 are adjacent rows
                def rowat(r):
                    rc = jnp.clip(r, 0, vrows - 1)
                    return jnp.broadcast_to(
                        vol_ref[pl.ds(rc, 1), :], (E, 128))

                def fx(dx, accs):
                    cx = rxmin + dx

                    def fy(dy, accs):
                        acc, agx, agy, agz = accs
                        cy = rymin + dy
                        crow = cx * stride + cy
                        sel = rowid == crow
                        bc = rowat(crow)
                        acc = jnp.where(
                            sel, jnp.take_along_axis(bc, iz, axis=1), acc)
                        izp = jnp.clip(iz + 1, 0, 127)
                        izm = jnp.clip(iz - 1, 0, 127)
                        vzp = jnp.where(
                            ijk[2] + 1 < d3,
                            jnp.take_along_axis(bc, izp, axis=1), 0.0)
                        vzm = jnp.where(
                            ijk[2] - 1 >= 0,
                            jnp.take_along_axis(bc, izm, axis=1), 0.0)
                        agz = jnp.where(sel, 0.5 * (vzp - vzm), agz)
                        vxp = jnp.where(
                            ijk[0] + 1 < d1,
                            jnp.take_along_axis(
                                rowat(crow + stride), iz, axis=1), 0.0)
                        vxm = jnp.where(
                            ijk[0] - 1 >= 0,
                            jnp.take_along_axis(
                                rowat(crow - stride), iz, axis=1), 0.0)
                        agx = jnp.where(sel, 0.5 * (vxp - vxm), agx)
                        vyp = jnp.where(
                            ijk[1] + 1 < d2,
                            jnp.take_along_axis(
                                rowat(crow + 1), iz, axis=1), 0.0)
                        vym = jnp.where(
                            ijk[1] - 1 >= 0,
                            jnp.take_along_axis(
                                rowat(crow - 1), iz, axis=1), 0.0)
                        agy = jnp.where(sel, 0.5 * (vyp - vym), agy)
                        return acc, agx, agy, agz

                    return jax.lax.fori_loop(0, rymax - rymin + 1, fy, accs)

                zf = jnp.zeros((E, 128), _f32)
                acc, agx, agy, agz = jax.lax.fori_loop(
                    0, rxmax - rxmin + 1, fx, (zf, zf, zf, zf))
            else:
                def fx(dx, acc):
                    cx = rxmin + dx

                    def fy(dy, acc):
                        cy = rymin + dy
                        crow = cx * stride + cy
                        rowv = vol_ref[pl.ds(crow, 1), :]
                        bc = jnp.broadcast_to(rowv, (E, 128))
                        g = jnp.take_along_axis(bc, iz, axis=1)
                        return jnp.where(rowid == crow, g, acc)

                    return jax.lax.fori_loop(0, rymax - rymin + 1, fy, acc)

                acc = jax.lax.fori_loop(
                    0, rxmax - rxmin + 1, fx, jnp.zeros((E, 128), acc_dtype))
            if packed:
                # unpack the nibble, fall back to TF-id-of-0 off-volume
                sh = (ijk[2] & 7) * 4  # always in [0, 28]
                mid = jax.lax.shift_right_logical(acc, sh) & 15
                id0 = scal_ref[28].astype(_i32)  # classify-index of vn=0
                mid = jnp.where(valid, mid, id0)
                sr, sg, sb, sa = classify_id(mid)
            else:
                v = jnp.maximum(acc, 0.0)  # descent drops negatives
                vn = v / cal_max  # int-truncated cal_max (kernel.cu:42)
                if lut_n:
                    sr, sg, sb, sa = classify_lut(vn)
                else:
                    sr, sg, sb, sa = classify(vn)

            if lighting:
                # Blinn-Phong on the central-difference normal
                # (ops/phong.phong_shade semantics, elementwise)
                l0, l1, l2 = light_ref[0], light_ref[1], light_ref[2]
                lcr, lcg, lcb = light_ref[3], light_ref[4], light_ref[5]
                amb = light_ref[6]
                dif = light_ref[7]
                spe = light_ref[8]
                shin = light_ref[9]
                nn = jnp.sqrt(agx * agx + agy * agy + agz * agz)
                ninv = 1.0 / jnp.maximum(nn, 1e-8)
                nux, nuy, nuz = agx * ninv, agy * ninv, agz * ninv
                ndotl = jnp.abs(nux * l0 + nuy * l1 + nuz * l2)
                # view dir = -d (unit); half vector h = l + v
                hx, hy, hz = l0 - d[0], l1 - d[1], l2 - d[2]
                hinv = 1.0 / jnp.maximum(
                    jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-8)
                ndoth = jnp.abs((nux * hx + nuy * hy + nuz * hz) * hinv)
                specular = spe * ndoth ** shin
                w = jnp.clip(nn * np.float32(1e3), 0.0, 1.0)  # /1e-3 thresh
                sr = w * (amb * sr + dif * ndotl * sr * lcr
                          + specular * lcr) + (1.0 - w) * sr
                sg = w * (amb * sg + dif * ndotl * sg * lcg
                          + specular * lcg) + (1.0 - w) * sg
                sb = w * (amb * sb + dif * ndotl * sb * lcb
                          + specular * lcb) + (1.0 - w) * sb
            if density_scale != 1.0:
                sa = jnp.clip(sa * np.float32(density_scale), 0.0, 1.0)
            if slab:
                # non-owned samples are the over identity for this device
                sa = jnp.where(owned, sa, 0.0)

            # ---- blend the 4 steps in order (front-to-back (C,T)) ------
            for s in range(steps):
                lo = RT * s
                a_s = sa[lo:lo + RT, :]
                if spr % steps:
                    # mask steps beyond spr in the last chunk
                    gate = ((ci * steps + s) < spr).astype(_f32)
                    a_s = a_s * gate
                w_s = t * a_s
                cr = cr + w_s * sr[lo:lo + RT, :]
                cg = cg + w_s * sg[lo:lo + RT, :]
                cb = cb + w_s * sb[lo:lo + RT, :]
                t = t * (1.0 - a_s)
            return cr, cg, cb, t

        cr, cg, cb, t = jax.lax.cond(
            do_work, work, lambda args: args, (cr, cg, cb, t))
        return ci + 1, cr, cg, cb, t

    def chunk_cond(carry):
        ci, _, _, _, t = carry
        return (ci < chunk_hi) & (jnp.max(t) > eps)

    zeros = jnp.zeros((RT, 128), _f32)
    ones = jnp.ones((RT, 128), _f32)
    if not hbm_mode:
        _, cr, cg, cb, t = jax.lax.while_loop(
            chunk_cond, chunk_body, (chunk_lo, zeros, zeros, zeros, ones))
        out_r_ref[0, 0] = cr
        out_g_ref[0, 0] = cg
        out_b_ref[0, 0] = cb
        out_t_ref[0, 0] = t
        return

    # ---- hbm_mode: compose this block's segment into the persistent ----
    # output block (index map ignores grid dim 2, so it stays resident
    # across the block sweep).  Visit order is +x (k ascending); the over
    # operator composes front-to-back, so for front.x >= 0 the accumulator
    # is the front segment, otherwise the block is.
    @pl.when(kblk == 0)
    def _():
        out_r_ref[0, 0] = zeros
        out_g_ref[0, 0] = zeros
        out_b_ref[0, 0] = zeros
        out_t_ref[0, 0] = ones

    acc_t = out_t_ref[0, 0]
    fwd = front[0] >= 0.0
    # early termination across blocks: when marching front-to-back and the
    # whole tile is saturated, later blocks cannot change the output by
    # more than eps
    do_k = jnp.logical_not(fwd & (jnp.max(acc_t) <= eps))

    def march(_):
        _, cr, cg, cb, t = jax.lax.while_loop(
            chunk_cond, chunk_body, (chunk_lo, zeros, zeros, zeros, ones))
        return cr, cg, cb, t

    cr, cg, cb, t = jax.lax.cond(
        do_k, march, lambda _: (zeros, zeros, zeros, ones), None)

    acc_r = out_r_ref[0, 0]
    acc_g = out_g_ref[0, 0]
    acc_b = out_b_ref[0, 0]
    # fwd:  (C, T) = (C_acc + T_acc*C_blk, T_acc*T_blk)
    # bwd:  block is nearer the camera: (C_blk + T_blk*C_acc, same T)
    out_r_ref[0, 0] = jnp.where(fwd, acc_r + acc_t * cr, cr + t * acc_r)
    out_g_ref[0, 0] = jnp.where(fwd, acc_g + acc_t * cg, cg + t * acc_g)
    out_b_ref[0, 0] = jnp.where(fwd, acc_b + acc_t * cb, cb + t * acc_b)
    out_t_ref[0, 0] = acc_t * t


def brick_occupancy(
    data: jnp.ndarray | Volume,
    tf: TransferFunction,
    cal_max_trunc: jnp.ndarray,
    lut: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """[nbx*nby*nbz] i32: 1 where any voxel in the 8^3 brick classifies to
    alpha > 0 (a1 value semantics: negatives clamped, /trunc(cal_max)).

    ``data`` is a [X, Y, Z] array (possibly an x-slab of a sharded volume)
    or a Volume.  With ``lut`` ([N, 4], config.tf_lut), bricks are judged
    by the LUT's alpha instead of the interval scan (the kernel classifies
    through the LUT, so skips must match its alpha support)."""
    if isinstance(data, Volume):
        data = data.data
    d1, d2, d3 = data.shape
    vn = jnp.maximum(data, 0.0) / cal_max_trunc
    if lut is not None:
        nlut = lut.shape[0]
        idx = jnp.clip(
            jnp.round(vn * (nlut - 1)).astype(_i32), 0, nlut - 1)
        alpha = jnp.take(lut[:, 3], idx, axis=0)
    else:
        alpha = tf.classify(vn)[..., 3]
    occ = (alpha > 0.0).astype(_f32)
    pd = [_pad_to(x, BRICK) for x in (d1, d2, d3)]
    occ = jnp.pad(occ, [(0, pd[c] - (d1, d2, d3)[c]) for c in range(3)])
    nb = tuple(p // BRICK for p in pd)
    occ = occ.reshape(nb[0], BRICK, nb[1], BRICK, nb[2], BRICK)
    occ = occ.max(axis=(1, 3, 5))
    return occ.reshape(-1).astype(_i32), nb


def packed_geometry(
    dims: Tuple[int, int, int], num_intervals: int
) -> Tuple[int, int, int] | None:
    """(zw, ypack, nyg) for the material-id grid layout, or None when the
    volume/TF cannot use it (ids must fit a nibble; a z column must fit a
    128-lane row)."""
    d1, d2, d3 = dims
    if num_intervals > 16:
        return None
    zw = -(-d3 // 8)  # i32 words per z column (8 nibbles/word)
    if zw > 128:
        return None  # d3 > 1024
    ypack = min(128 // zw, d2)
    nyg = -(-d2 // ypack)
    if _pad_to(d1 * nyg, 8) * 128 * 4 > 12 * 2**20:  # VMEM budget
        return None
    return zw, ypack, nyg


def pack_material_grid(
    data: jnp.ndarray | Volume,
    tf: TransferFunction,
    cal_max_trunc: jnp.ndarray,
    zpack: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rows [pad8(d1*nyg), 128] i32, id0 scalar f32): the TF's
    last-match-wins interval index per voxel (a1 value semantics:
    negatives clamped, / trunc(cal_max) — kernel.cu:42,64-66), 8 ids per
    i32 word (4-bit nibbles, z-major), ``ypack`` y-rows per 128-lane row;
    plus the classify index of intensity 0 (the off-volume fallback).

    ``data`` is a [X, Y, Z] array (possibly an x-slab) or a Volume."""
    if isinstance(data, Volume):
        data = data.data
    d1, d2, d3 = data.shape
    zw, ypack, nyg = zpack
    vn = jnp.maximum(data, 0.0) / cal_max_trunc
    ids = jnp.zeros((d1, d2, d3), _i32)
    id0 = jnp.zeros((), _i32)
    for k in range(tf.num_intervals):
        m = (vn >= tf.lower[k]) & (vn <= tf.upper[k])
        ids = jnp.where(m, k, ids)
        id0 = jnp.where((tf.lower[k] <= 0.0) & (tf.upper[k] >= 0.0), k, id0)
    ids = jnp.pad(ids, ((0, 0), (0, nyg * ypack - d2), (0, zw * 8 - d3)))
    shifts = jnp.arange(8, dtype=_i32) * 4
    words = jnp.sum(
        jnp.left_shift(ids.reshape(d1, nyg, ypack, zw, 8), shifts), axis=-1
    ).astype(_i32)
    rows = _pad_to(d1 * nyg, 8)
    grid = jnp.zeros((rows, 128), _i32)
    grid = grid.at[: d1 * nyg, : ypack * zw].set(
        words.reshape(d1 * nyg, ypack * zw))
    return grid, id0.astype(_f32)


def _check_eligible(
    dims_local: Tuple[int, int, int],
    channels: int,
    num_intervals: int,
    config: RenderConfig,
    packed: bool | None,
) -> Tuple[bool, Tuple[int, int, int] | None]:
    """Validate the config against kernel capabilities; resolve packed mode."""
    d1, d2, d3 = dims_local
    zpack = packed_geometry(dims_local, num_intervals)
    if packed is None:
        packed = zpack is not None
    if packed and zpack is None:
        raise ValueError(
            "packed pallas path needs <= 16 TF intervals, z <= 1024, and a "
            f"material grid within the VMEM budget (dims {dims_local}, "
            f"{num_intervals} intervals)")
    if not packed and d3 > 128:
        raise ValueError(
            f"unpacked pallas path needs z dim <= 128 (got {d3}); "
            "use packed mode or the XLA renderer for larger volumes")
    if channels != 1:
        raise ValueError("pallas path supports single-channel volumes")
    if config.interp is not Interp.NEAREST:
        raise ValueError("pallas path is nearest-neighbor (a1) only")
    if config.lighting or config.tf_lut:
        # gradient normals / LUT indices need intensities, which the
        # packed material-id grid doesn't carry
        if d3 > 128:
            raise ValueError(
                "lighting/LUT in the fused kernel need the f32 row layout "
                f"(z <= 128, got {d3}); use the XLA renderer")
        packed = False
    if config.lighting and (
        config.gradient_filter != "central" or config.presmooth_sigma != 0.0
    ):
        raise ValueError(
            "fused lighting computes central-difference normals on the raw "
            "density; sobel/presmooth modes use the XLA renderer")
    if config.tf_lut and not 0 < config.tf_lut <= 1024:
        raise ValueError(f"tf_lut size {config.tf_lut} not in (0, 1024]")
    return packed, (zpack if packed else None)


def _scal_vector(camera, config, cal_max_trunc, early_eps, alpha0,
                 box_lo, box_hi, id0, x_offset, s_start, x0):
    """The kernel's 32-slot SMEM scalar vector (layout in _march_kernel)."""
    top_left = camera.top_left
    if config.conic and config.conic_corrected:
        top_left = top_left + jnp.asarray(
            config.viewplane_distance, _f32) * camera.front
    return jnp.concatenate([
        jnp.asarray([config.sample_distance, config.front_clip], _f32),
        cal_max_trunc[None],
        jnp.asarray([early_eps], _f32),
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
        jnp.asarray(id0, _f32)[None],  # [28] classify-index of vn=0 (packed)
        jnp.asarray(x_offset, _f32)[None],  # [29] ray-column offset
        jnp.asarray(s_start, _f32)[None],  # [30] sample-segment start
        jnp.asarray(x0, _f32)[None],  # [31] volume-slab x offset
    ])


def _march_tiles(
    data: jnp.ndarray,
    dims: Tuple[int, int, int],
    depth: int,
    cal_max: jnp.ndarray,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    early_eps: float,
    interpret: bool,
    packed: bool | None,
    tile: Tuple[int, int, int] | None,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    x0=0,
    slab_x: int | None = None,
    light=None,
):
    """Shared kernel driver -> (cr, cg, cb, t), each [w_local, height] f32.

    ``data`` is the full [X, Y, Z] volume, or an x-slab of it when
    ``slab_x`` is set (``x0`` = the slab's global x offset, traced OK).
    ``x_offset``/``local_width`` select a ray-column tile and
    ``s_start``/``s_count`` a sample segment — all static-shape, traced
    offsets, so the call is shard_map-friendly.
    """
    d1, d2, d3 = dims
    dims_local = (slab_x if slab_x is not None else d1, d2, d3)
    packed, zpack = _check_eligible(
        dims_local, 1, tf.num_intervals, config, packed)

    w, h = config.width, config.height
    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count
    if tile is None:
        tile = DEFAULT_TILE
    tpx, tpy, steps = tile
    if (tpx * tpy) % 128 or (tpx * tpy * steps) % 1024:
        raise ValueError(f"tile {tile}: rays must fill 128-lane rows and "
                         "rays*steps must fill [8,128] registers")
    ntx = -(-w_local // tpx)
    nty = -(-h // tpy)
    rt = (tpx * tpy) // 128

    cal_max_trunc = jnp.trunc(jnp.asarray(cal_max, _f32))
    id0 = jnp.zeros((), _f32)
    if packed:
        vol_rows, id0 = pack_material_grid(data, tf, cal_max_trunc, zpack)
    else:
        rows = _pad_to(dims_local[0] * d2, 8)
        vol_rows = jnp.zeros((rows, 128), _f32)
        vol_rows = vol_rows.at[: dims_local[0] * d2, :d3].set(
            data.reshape(dims_local[0] * d2, d3))
    rows = vol_rows.shape[0]

    lut = tf.to_lut(config.tf_lut) if config.tf_lut else None
    occ, nb = brick_occupancy(data, tf, cal_max_trunc, lut=lut)

    if lut is not None:
        alpha0 = lut[0, 3]  # idx(vn=0) = 0
    else:
        alpha0 = tf.classify(jnp.zeros((), _f32))[3]
    if config.density_scale != 1.0:
        alpha0 = jnp.clip(alpha0 * np.float32(config.density_scale), 0.0, 1.0)

    extra_args = []
    extra_specs = []
    if config.lighting:
        from . import phong

        lg = light if light is not None else phong.default_light()
        ldir = lg.direction / jnp.linalg.norm(lg.direction)
        light_arr = jnp.concatenate([
            ldir.astype(_f32),
            lg.color.astype(_f32),
            jnp.stack([
                jnp.asarray(lg.ambient, _f32),
                jnp.asarray(lg.diffuse, _f32),
                jnp.asarray(lg.specular, _f32),
                jnp.asarray(lg.shininess, _f32),
            ]),
        ])
        extra_args.append(light_arr)
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if lut is not None:
        nl = lut.shape[0]
        rl = -(-nl // 128)
        lut_rows = jnp.zeros((_pad_to(4 * rl, 8), 128), _f32)
        for c in range(4):
            col = jnp.zeros((rl * 128,), _f32).at[:nl].set(lut[:, c])
            lut_rows = lut_rows.at[c * rl:(c + 1) * rl, :].set(
                col.reshape(rl, 128))
        extra_args.append(lut_rows)
        extra_specs.append(
            pl.BlockSpec((lut_rows.shape[0], 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM))

    L = float(max(dims))
    # dataset box in ray space (p = pos + 0.5 in [hg/L, (hg+dim)/L + 1/n]),
    # intersected with the root cube; conservative by half a voxel
    n = float(2**depth)
    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5 for dim in dims]
    box_lo = [jnp.asarray(v, _f32) for v in box_lo]
    box_hi = [jnp.asarray(v, _f32) for v in box_hi]
    if slab_x is not None:
        # tighten the x extent to this slab (chunk-range clipping only;
        # with TF(0).alpha > 0 the kernel full-marches regardless)
        hg0 = np.float32(L / 2) - np.float32(d1 / 2)
        x0f = jnp.asarray(x0, _f32)
        box_lo[0] = jnp.maximum(box_lo[0], (hg0 + x0f) / L - 0.5)
        box_hi[0] = jnp.minimum(
            box_hi[0], (hg0 + x0f + slab_x) / L + 1.0 / n - 0.5)

    scal = _scal_vector(camera, config, cal_max_trunc, early_eps, alpha0,
                        box_lo, box_hi, id0, x_offset, s_start, x0)

    kernel = functools.partial(
        _march_kernel,
        dims=dims,
        depth=depth,
        num_intervals=tf.num_intervals,
        width=w,
        height=h,
        spr=s_count,
        conic=bool(config.conic),
        density_scale=float(config.density_scale),
        nbricks=nb,
        zpack=zpack,
        tile=tile,
        local_width=w_local,
        slab_x=slab_x,
        lighting=bool(config.lighting),
        lut_n=int(config.tf_lut),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntx, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
            pl.BlockSpec(memory_space=pltpu.SMEM),  # occupancy bricks
            pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # volume
        ] + extra_specs,  # [light SMEM] [lut VMEM]
        out_specs=[
            pl.BlockSpec((1, 1, rt, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((ntx, nty, rt, 128), _f32)
                 for _ in range(4)]
    cr, cg, cb, t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, tf.lower, tf.upper, tf.colors, occ, vol_rows, *extra_args)

    def unpack(a):
        a = a.reshape(ntx, nty, tpx, tpy)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * tpx, nty * tpy)
        return a[:w_local, :h]

    return unpack(cr), unpack(cg), unpack(cb), unpack(t)


def render_vrc_pallas(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    early_eps: float = 1e-3,
    interpret: bool = False,
    packed: bool | None = None,
    tile: Tuple[int, int, int] | None = None,
    light=None,
) -> jnp.ndarray:
    """a1/VRC render via the fused Pallas kernel -> [W, H, 4].

    Matches ``render_vrc(..., mode="fast")`` up to the early-termination
    epsilon (``early_eps=0`` for exact agreement).  Requires a single
    channel; trilinear modes fall back to the XLA renderer.  The default
    packed material-grid mode handles z up to 1024 (MNI-1mm-class
    volumes); the f32 mode (``packed=False``) needs dims[2] <= 128, and is
    what ``config.lighting`` (fused Blinn-Phong on central-difference
    normals) and ``config.tf_lut`` (fused dense-LUT classify) run on —
    BASELINE config 2's fast path.
    """
    if volume.channels != 1:
        raise ValueError("pallas path supports single-channel volumes")
    cr, cg, cb, t = _march_tiles(
        volume.data.reshape(volume.dims),
        volume.dims,
        volume.octree_depth,
        volume.cal_max,
        tf,
        camera,
        config,
        early_eps=early_eps,
        interpret=interpret,
        packed=packed,
        tile=tile,
        light=light,
    )
    bg = jnp.asarray(config.background, _f32)
    w, h = config.width, config.height
    rgb = [c + t * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)


def render_vrc_pallas_segment(
    data: jnp.ndarray,
    dims: Tuple[int, int, int],
    depth: int,
    cal_max: jnp.ndarray,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    x0=0,
    slab_x: int | None = None,
    early_eps: float = 0.0,
    interpret: bool = False,
    packed: bool | None = None,
    tile: Tuple[int, int, int] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shard_map-friendly fused-kernel work unit -> (C, T) segment.

    Marches ray columns [x_offset, x_offset + local_width) x samples
    [s_start, s_start + s_count) and returns the front-to-back
    (C [w, h, 3], T [w, h, 1]) pair — the associative compositing unit of
    ops/composite.segment_compose, so segments from the rays / samples /
    volume mesh axes compose exactly like the XLA scan path's
    (parallel/render_dist.py).  When ``slab_x`` is set, ``data`` is this
    device's x-slab [slab_x, Y, Z] of the global ``dims`` volume starting
    at global voxel x ``x0``; non-owned samples contribute the over
    identity (the fused-kernel mirror of ops/sampling.octree_nn_sample_slab).
    Offsets may be traced (e.g. axis_index-derived); shapes are static.
    """
    cr, cg, cb, t = _march_tiles(
        data,
        dims,
        depth,
        cal_max,
        tf,
        camera,
        config,
        early_eps=early_eps,
        interpret=interpret,
        packed=packed,
        tile=tile,
        x_offset=x_offset,
        local_width=local_width,
        s_start=s_start,
        s_count=s_count,
        x0=x0,
        slab_x=slab_x,
    )
    return jnp.stack([cr, cg, cb], axis=-1), t[..., None]


def streamed_geometry(
    dims: Tuple[int, int, int], num_intervals: int,
    block_bytes: int = 4 * 2**20,
) -> Tuple[int, Tuple[int, int, int] | None] | None:
    """(block_x, zpack) for the HBM-streamed march, or None when even
    streaming can't express the volume (z > 1024 packed / > 128 unpacked).

    ``zpack`` is None for the f32 row layout.  block_x is a multiple of
    BRICK sized so one block (double-buffered by the pipeline) fits the
    VMEM budget."""
    d1, d2, d3 = dims
    if num_intervals <= 16 and -(-d3 // 8) <= 128:
        zw = -(-d3 // 8)
        ypack = min(128 // zw, d2)
        nyg = -(-d2 // ypack)
        row_bytes = nyg * 128 * 4  # i32 rows per x plane
        zp = (zw, ypack, nyg)
    elif d3 <= 128:
        row_bytes = d2 * 128 * 4  # f32 rows per x plane
        zp = None
    else:
        return None
    per_plane = max(1, row_bytes)
    block_x = max(BRICK, (block_bytes // per_plane) // BRICK * BRICK)
    block_x = min(block_x, _pad_to(d1, BRICK))
    return block_x, zp


def render_vrc_pallas_streamed(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    early_eps: float = 1e-3,
    interpret: bool = False,
    block_x: int | None = None,
    tile: Tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """a1/VRC render with the volume streamed from HBM -> [W, H, 4].

    For volumes whose (packed) row grid exceeds the resident kernel's VMEM
    budget (f32 >= ~256^3, MNI-1mm multi-channel, 512^3-class data —
    DESIGN.md §4 roadmap item 1): grid dim 2 sweeps x-blocks of the volume
    and Pallas pipelines each block's HBM->VMEM copy against the previous
    block's march (automatic double buffering); per-(tile, block) segments
    compose in visibility order with early termination across blocks.
    Ortho cameras only (one global slab visit order, like the volume mesh
    axis); matches render_vrc(..., mode="fast") to the early_eps bound.
    """
    if volume.channels != 1:
        raise ValueError("streamed pallas path supports single-channel")
    if config.conic:
        raise ValueError(
            "streamed pallas path needs one global block visit order; "
            "conic rays can disagree on sign(dir.x)")
    if config.lighting or config.interp is not Interp.NEAREST or config.tf_lut:
        raise ValueError("streamed pallas path is the plain a1 classify only")
    d1, d2, d3 = volume.dims
    geo = streamed_geometry(volume.dims, tf.num_intervals)
    if geo is None:
        raise ValueError(f"volume dims {volume.dims} not streamable")
    bx_auto, zpack = geo
    if block_x is None:
        block_x = bx_auto
    if block_x % BRICK:
        raise ValueError(f"block_x {block_x} must be a multiple of {BRICK}")
    d1p = _pad_to(d1, block_x)
    nxb = d1p // block_x
    packed = zpack is not None

    w, h = config.width, config.height
    if tile is None:
        tile = DEFAULT_TILE
    tpx, tpy, steps = tile
    if (tpx * tpy) % 128 or (tpx * tpy * steps) % 1024:
        raise ValueError(f"tile {tile}: rays must fill 128-lane rows and "
                         "rays*steps must fill [8,128] registers")
    ntx = -(-w // tpx)
    nty = -(-h // tpy)
    rt = (tpx * tpy) // 128

    data = volume.data.reshape(volume.dims)
    data_p = jnp.pad(data, ((0, d1p - d1), (0, 0), (0, 0)))
    cal_max_trunc = jnp.trunc(jnp.asarray(volume.cal_max, _f32))
    id0 = jnp.zeros((), _f32)
    if packed:
        vol_rows, id0 = pack_material_grid(data_p, tf, cal_max_trunc, zpack)
        nyg = zpack[2]
        block_rows = block_x * nyg
    else:
        block_rows = block_x * d2
        vol_rows = jnp.zeros((d1p * d2, 128), _f32)
        vol_rows = vol_rows.at[:, :d3].set(data_p.reshape(d1p * d2, d3))
    assert vol_rows.shape[0] == nxb * block_rows, (
        vol_rows.shape, nxb, block_rows)

    occ, nb = brick_occupancy(data, tf, cal_max_trunc)  # global bricks

    alpha0 = tf.classify(jnp.zeros((), _f32))[3]
    if config.density_scale != 1.0:
        alpha0 = jnp.clip(alpha0 * np.float32(config.density_scale), 0.0, 1.0)

    L = float(max(volume.dims))
    n = float(2**volume.octree_depth)
    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in volume.dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5
              for dim in volume.dims]
    scal = _scal_vector(camera, config, cal_max_trunc, early_eps, alpha0,
                        box_lo, box_hi, id0, 0, 0, 0)

    kernel = functools.partial(
        _march_kernel,
        dims=volume.dims,
        depth=volume.octree_depth,
        num_intervals=tf.num_intervals,
        width=w,
        height=h,
        spr=config.samples_per_ray,
        conic=False,
        density_scale=float(config.density_scale),
        nbricks=nb,
        zpack=zpack,
        tile=tile,
        slab_x=block_x,
        hbm_mode=True,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntx, nty, nxb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
            pl.BlockSpec(memory_space=pltpu.SMEM),  # occupancy bricks
            pl.BlockSpec((block_rows, 128), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),  # streamed volume block
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rt, 128), lambda i, j, k: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((ntx, nty, rt, 128), _f32)
                 for _ in range(4)]
    cr, cg, cb, t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, tf.lower, tf.upper, tf.colors, occ, vol_rows)

    def unpack(a):
        a = a.reshape(ntx, nty, tpx, tpy)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * tpx, nty * tpy)
        return a[:w, :h]

    bg = jnp.asarray(config.background, _f32)
    t2 = unpack(t)
    rgb = [unpack(c) + t2 * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w, h), _f32)], axis=-1)
