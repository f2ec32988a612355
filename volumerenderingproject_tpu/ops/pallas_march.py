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
    pack_bits: int = 4,
    lut_packed: bool = False,
    baked_light: bool = False,
    mc_grids: int = 0,
    vis_ref=None,
    block_major: bool = False,
    manual_stream: bool = False,
    mbm: bool = False,
    nxb: int = 0,
    ms_stream: bool = False,
    ms_nzr: int = 1,
    ms_brm: int = 0,
    brick: Tuple[int, int, int] = (BRICK, BRICK, BRICK),
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
    [4 * ceil(N/128), 128] channel-major rows.

    ``pack_bits``/``lut_packed``: the packed grid's id width — 4-bit TF
    interval ids (8/word) or, with ``lut_packed``, 16-bit LUT indices
    (2/word, z <= 256) whose RGBA still comes from ``lut_ref``.

    ``baked_light``: ortho fast path for Blinn-Phong — the shading factors
    are precomputed per voxel in XLA (bake_light_grids: out_rgb =
    rgb * M + S, exact because ortho view direction is ray-independent)
    and fetched from two extra f32 row grids (2 row reads + 2 lane-gathers
    per footprint cell instead of in-kernel gradients' 5 reads + 7
    gathers), composing with any main-grid layout including packed ids.

    ``ms_stream`` (manual_stream only): the baked (M, S) factors are
    STREAMED from HBM block-by-block alongside the volume blocks —
    affine-quantized to u8 each and packed two voxels per i32 word
    (pack_ms_grid), so a 512^3-class lit/scattered render stays fused
    (VERDICT r3 item 3; the bake runs on the FULL volume in XLA before
    packing, so shading normals need no halo exchange).  Dequantization
    ranges ride scal[32..35]; per-voxel error <= range/510 per factor —
    below the 8-bit output floor for reference-scale lights.  ``ms_nzr``
    = z-rows per (x, y) column (ceil(d3/256)); ``ms_brm`` = ms rows per
    block."""
    rest = list(rest)
    state_ref = rest.pop() if block_major else None  # trailing scratch
    ms_sem_ref = rest.pop() if ms_stream else None
    ms_bufs_ref = rest.pop() if ms_stream else None
    dma_sem_ref = rest.pop() if manual_stream else None
    bufs_ref = rest.pop() if manual_stream else None
    light_ref = rest.pop(0) if lighting else None
    lut_ref = rest.pop(0) if lut_n else None
    mg_ref = rest.pop(0) if baked_light else None
    sg_ref = rest.pop(0) if baked_light else None
    mc_refs = tuple(rest.pop(0) for _ in range(mc_grids))
    ms_hbm_ref = rest.pop(0) if ms_stream else None
    # per-block occupied-x ray-space extents (manual mode, SMEM [2*nxb]):
    # geometry ∩ occupancy, alpha0-gated on the host — empty blocks carry
    # an inverted interval so the whole block march is skipped
    bext_ref = rest.pop(0) if manual_stream else None
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

    if block_major:
        # block-major streaming: grid = (nxb, ntx, nty) — the block index
        # is OUTERMOST, so Pallas's consecutive-index elision copies each
        # volume block from HBM exactly once per frame (the tile-major
        # grid re-copied every block per tile); per-tile (C, T) state
        # lives in a persistent VMEM scratch across the whole sweep.
        tx = pl.program_id(1)
        ty = pl.program_id(2)
    elif mbm:
        # grid (1,): tile indices are LOOP variables (txv/tyv)
        tx = ty = jnp.asarray(0, _i32)
    else:
        tx = pl.program_id(0)
        ty = pl.program_id(1)
    if hbm_mode and not manual_stream:
        # the streaming grid dim sweeps x-blocks of the volume; this
        # invocation owns the block starting at global voxel x0
        kblk = pl.program_id(0) if block_major else pl.program_id(2)
        x0_i = x0_i + kblk * slab_x
        # tighten the chunk-range box to this block's x extent (the
        # sharded-segment wrapper does this on the host; here x0 varies
        # per grid step).  hg/L constants are compile-time f32.
        x0f = x0_i.astype(_f32)
        blk_lo = (hg[0] + x0f) / L - 0.5
        blk_hi = (hg[0] + (x0f + np.float32(slab_x))) / L + 1.0 / n - 0.5
        box_lo = [jnp.maximum(box_lo[0], blk_lo), box_lo[1], box_lo[2]]
        box_hi = [jnp.minimum(box_hi[0], blk_hi), box_hi[1], box_hi[2]]

    zeros = jnp.zeros((RT, 128), _f32)
    ones = jnp.ones((RT, 128), _f32)

    def _compute_ct(vol_ref=vol_ref, x0_i=x0_i, box_lo=box_lo,
                    box_hi=box_hi, ms_ref=None, txv=None, tyv=None):
        """Slot decode, ray setup, box clip and the chunk march — the
        per-invocation heavy work, deferred so hbm_mode can gate it
        behind the (tile, block) visibility bit.  The default arguments
        re-bind the enclosing values; manual_stream overrides them per
        block (a VMEM buffer slot + that block's x offset/box), and the
        mbm mode passes LOOP tile indices (txv/tyv) instead of the
        program ids."""
        txl = tx if txv is None else txv
        tyl = ty if tyv is None else tyv
        # ---- slot decode: e = step*nrays + u*tpy + v -----------------------
        e = _iota(0, E) * 128 + _iota(1, E)
        s_idx = e // nrays  # step-in-chunk 0..steps-1
        f = e % nrays
        u = f // tpy
        v = f % tpy
        lxp = txl * tpx + u  # local pixel column
        pxi = lxp + x_off_i  # global pixel column (ray math uses global)
        pyi = tyl * tpy + v
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

        def classify_lut_idx(idx):
            """Fetch RGBA for precomputed LUT indices by per-lane gather
            over the channel-major LUT rows."""
            R = -(-lut_n // 128)
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

        def classify_lut(vn):
            """Dense-LUT classify (models/raycast.py lut branch): round vn to
            the nearest of lut_n entries, fetch its RGBA."""
            idx = jnp.clip(
                jnp.round(vn * np.float32(lut_n - 1)).astype(_i32),
                0, lut_n - 1)
            return classify_lut_idx(idx)

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
                blo.append(jnp.clip(ilo, 0, ext - 1) // brick[c])
                bhi.append(jnp.clip(ihi, 0, ext - 1) // brick[c])

            # ---- brick occupancy: any alpha>0 voxel in the box? ------------
            zero_i = jnp.asarray(0, _i32)
            # hbm_mode streams blocks against the GLOBAL brick map (block_x is
            # a multiple of brick, so local brick x + x0/brick is exact); the
            # sharded slab path passes slab-local bricks (no offset)
            bx_off = (x0_i // brick[0]) if hbm_mode else jnp.asarray(0, _i32)

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
                    # id grid: row = (ix, iy//ypack), lane =
                    # (iy%ypack)*zw + iz//pw, field = (iz%pw)*pack_bits
                    # (pw ids per i32 word: 8 nibbles or 2 LUT shorts)
                    pw = 32 // pack_bits
                    ygrp = jnp.where(valid, ijk[1] // ypack, 0)
                    rowid = jnp.where(valid, lxv * nyg + ygrp, -1)
                    iz = jnp.where(
                        valid, (ijk[1] - ygrp * ypack) * zw + ijk[2] // pw, 0)
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
                    # unpack the id field, fall back to id-of-vn=0 off-volume
                    pw = 32 // pack_bits
                    sh = (ijk[2] % pw) * pack_bits  # within [0, 32)
                    mid = (jax.lax.shift_right_logical(acc, sh)
                           & ((1 << pack_bits) - 1))
                    id0 = scal_ref[28].astype(_i32)  # classify-index of vn=0
                    mid = jnp.where(valid, mid, id0)
                    if lut_packed:
                        sr, sg, sb, sa = classify_lut_idx(mid)
                    else:
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
                def fetch_f32_grids(refs):
                    """Per-sample values from f32 row grids (z on lanes)
                    at the sample's voxel — one footprint loop over
                    (ix, iy) with len(refs) row reads + lane-gathers per
                    cell.  Used by the baked-lighting factors and the
                    multichannel rgb grids; the f32 layout applies even
                    when the main grid is packed, so this is a separate
                    loop from the main fetch."""
                    rowid_f = jnp.where(valid, lxv * d2 + ijk[1], -1)
                    iz_f = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
                    rfxmin = jnp.min(jnp.where(valid, lxv, _BIG))
                    rfymin = jnp.min(jnp.where(valid, ijk[1], _BIG))
                    rfxmax = jnp.max(jnp.where(valid, lxv, -1))
                    rfymax = jnp.max(jnp.where(valid, ijk[1], -1))

                    def bfx(dxi, accs):
                        cx = rfxmin + dxi

                        def bfy(dyi, accs):
                            crow = cx * d2 + (rfymin + dyi)
                            sel = rowid_f == crow
                            out = []
                            for ref, acc in zip(refs, accs):
                                bm = jnp.broadcast_to(
                                    ref[pl.ds(crow, 1), :], (E, 128))
                                out.append(jnp.where(
                                    sel,
                                    jnp.take_along_axis(bm, iz_f, axis=1),
                                    acc))
                            return tuple(out)

                        return jax.lax.fori_loop(
                            0, rfymax - rfymin + 1, bfy, accs)

                    zf2 = tuple(
                        jnp.zeros((E, 128), _f32) for _ in refs)
                    return jax.lax.fori_loop(
                        0, rfxmax - rfxmin + 1, bfx, zf2)

                if mc_grids:
                    # multichannel: rgb comes straight from the staged
                    # normalized channel grids (raycast multichannel
                    # semantics: rgb = norm[..., :3], or channel 0
                    # broadcast to gray); the packed grid supplies alpha
                    # only (classify of the channel mean)
                    vals = [jnp.where(valid, v, 0.0)
                            for v in fetch_f32_grids(mc_refs)]
                    if mc_grids == 1:
                        sr = sg = sb = vals[0]
                    else:
                        sr, sg, sb = vals
                if baked_light:
                    # per-voxel shading factors: out_rgb = rgb * M + S;
                    # off-volume fetches shade as w = 0 (M = 1, S = 0)
                    mval, sval = fetch_f32_grids((mg_ref, sg_ref))
                    mval = jnp.where(valid, mval, 1.0)
                    sval = jnp.where(valid, sval, 0.0)
                    sr = sr * mval + sval
                    sg = sg * mval + sval
                    sb = sb * mval + sval
                if ms_stream:
                    # streamed u8-quantized baked factors: one i32 word
                    # holds (M|S<<8) for voxels z and z+1 (pack_ms_grid);
                    # one row read + one gather per footprint cell x z-row
                    izf = jnp.where(valid, jnp.clip(ijk[2], 0, d3 - 1), 0)
                    rowid_ms = jnp.where(
                        valid, (lxv * d2 + ijk[1]) * ms_nzr + (izf >> 8),
                        -1)
                    lane_ms = jnp.where(valid, (izf >> 1) & 127, 0)
                    shift_ms = (izf & 1) * 16

                    rfxmin = jnp.min(jnp.where(valid, lxv, _BIG))
                    rfymin = jnp.min(jnp.where(valid, ijk[1], _BIG))
                    rfxmax = jnp.max(jnp.where(valid, lxv, -1))
                    rfymax = jnp.max(jnp.where(valid, ijk[1], -1))
                    ms_rows_n = ms_brm if ms_brm else 1

                    def msx(dxi, acc):
                        cx = rfxmin + dxi

                        def msy(dyi, acc):
                            cy = rfymin + dyi

                            def msz(zr, acc):
                                crow = (cx * d2 + cy) * ms_nzr + zr
                                crowc = jnp.clip(crow, 0, ms_rows_n - 1)
                                bm = jnp.broadcast_to(
                                    ms_ref[pl.ds(crowc, 1), :], (E, 128))
                                w16 = jax.lax.shift_right_logical(
                                    jnp.take_along_axis(
                                        bm, lane_ms, axis=1),
                                    shift_ms) & 0xFFFF
                                return jnp.where(rowid_ms == crow, w16,
                                                 acc)

                            return jax.lax.fori_loop(0, ms_nzr, msz, acc)

                        return jax.lax.fori_loop(
                            0, rfymax - rfymin + 1, msy, acc)

                    w16 = jax.lax.fori_loop(
                        0, rfxmax - rfxmin + 1, msx,
                        jnp.zeros((E, 128), _i32))
                    mval = (w16 & 255).astype(_f32) * scal_ref[33] \
                        + scal_ref[32]
                    sval = (jax.lax.shift_right_logical(w16, 8)
                            & 255).astype(_f32) * scal_ref[35] \
                        + scal_ref[34]
                    mval = jnp.where(valid, mval, 1.0)
                    sval = jnp.where(valid, sval, 0.0)
                    sr = sr * mval + sval
                    sg = sg * mval + sval
                    sb = sb * mval + sval
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
        _, cr, cg, cb, t = jax.lax.while_loop(
            chunk_cond, chunk_body, (chunk_lo, zeros, zeros, zeros, ones))
        return cr, cg, cb, t


    if not hbm_mode:
        cr, cg, cb, t = _compute_ct()
        out_r_ref[0, 0] = cr
        out_g_ref[0, 0] = cg
        out_b_ref[0, 0] = cb
        out_t_ref[0, 0] = t
        return

    if mbm:
        # ---- manual BLOCK-MAJOR: ONE invocation total (grid (1,)).
        # The tile-major manual mode re-fetches every block once per ray
        # tile — at 512^3 that block re-fetch is ~123 ms of the 177 ms
        # frame (DESIGN §7).  Here the block loop is OUTERMOST: each
        # block is DMA'd from HBM exactly once per frame (double-
        # buffered), and an inner fori over ray tiles marches it into
        # per-tile (C, T) state held directly in the VMEM output
        # blocks.  Blocks are visited in visibility order, so the
        # compose keeps the accumulator in front and saturated tiles
        # skip the march (per-tile early termination).
        block_rows = bufs_ref.shape[1]
        fwd = front[0] >= 0.0
        ntx_s = -(-lw // tpx)
        nty_s = -(-height // tpy)
        ntiles = ntx_s * nty_s
        srows = out_t_ref.shape[0]  # pad8(ntiles * RT)

        def bk_of(kvis):
            bk = jnp.where(fwd, kvis, nxb - 1 - kvis)
            return jnp.clip(bk, 0, nxb - 1).astype(_i32)

        def dma(slot, kvis):
            bk = bk_of(kvis)
            return pltpu.make_async_copy(
                vol_ref.at[pl.ds(bk * block_rows, block_rows), :],
                bufs_ref.at[slot],
                dma_sem_ref.at[slot],
            )

        def ms_dma(slot, kvis):
            bk = bk_of(kvis)
            return pltpu.make_async_copy(
                ms_hbm_ref.at[pl.ds(bk * ms_brm, ms_brm), :],
                ms_bufs_ref.at[slot],
                ms_sem_ref.at[slot],
            )

        def start(slot, kvis):
            dma(slot, kvis).start()
            if ms_stream:
                ms_dma(slot, kvis).start()

        def wait(slot, kvis):
            dma(slot, kvis).wait()
            if ms_stream:
                ms_dma(slot, kvis).wait()

        # init the persistent per-tile states (the output blocks)
        out_r_ref[:, :] = jnp.zeros((srows, 128), _f32)
        out_g_ref[:, :] = jnp.zeros((srows, 128), _f32)
        out_b_ref[:, :] = jnp.zeros((srows, 128), _f32)
        out_t_ref[:, :] = jnp.ones((srows, 128), _f32)

        def march_block(slot, kvis):
            bk = bk_of(kvis)
            x0b = x0_i + bk * slab_x
            blk_lo = bext_ref[2 * bk]
            blk_hi = bext_ref[2 * bk + 1]
            bl = [jnp.maximum(box_lo[0], blk_lo), box_lo[1], box_lo[2]]
            bh = [jnp.minimum(box_hi[0], blk_hi), box_hi[1], box_hi[2]]
            nonempty = blk_lo <= blk_hi

            @pl.when((kvis < nxb) & nonempty)
            def _():
                def tile_body(lin, _):
                    txv = lin // nty_s
                    tyv = lin % nty_s
                    base = lin * RT
                    acc_t = out_t_ref[pl.ds(base, RT), :]
                    live = jnp.logical_not(jnp.max(acc_t) <= eps)

                    @pl.when(live)
                    def _():
                        bcr, bcg, bcb, bt = _compute_ct(
                            vol_ref=bufs_ref.at[slot], x0_i=x0b,
                            box_lo=bl, box_hi=bh,
                            ms_ref=(ms_bufs_ref.at[slot]
                                    if ms_stream else None),
                            txv=txv, tyv=tyv)
                        # visit order == visibility order: accumulator
                        # is in front of the block
                        acc_r = out_r_ref[pl.ds(base, RT), :]
                        acc_g = out_g_ref[pl.ds(base, RT), :]
                        acc_b = out_b_ref[pl.ds(base, RT), :]
                        out_r_ref[pl.ds(base, RT), :] = (
                            acc_r + acc_t * bcr)
                        out_g_ref[pl.ds(base, RT), :] = (
                            acc_g + acc_t * bcg)
                        out_b_ref[pl.ds(base, RT), :] = (
                            acc_b + acc_t * bcb)
                        out_t_ref[pl.ds(base, RT), :] = acc_t * bt

                    return 0

                jax.lax.fori_loop(0, ntiles, tile_body, 0)

        start(0, 0)

        def body(it, carry):
            k0 = it * 2
            k1 = it * 2 + 1

            @pl.when(k1 < nxb)
            def _():
                start(1, k1)

            wait(0, k0)
            march_block(0, k0)

            @pl.when(k1 + 1 < nxb)
            def _():
                start(0, k1 + 1)

            @pl.when(k1 < nxb)
            def _():
                wait(1, k1)
                march_block(1, k1)

            return carry

        jax.lax.fori_loop(0, -(-nxb // 2), body, 0)
        return

    if manual_stream:
        # ---- one invocation per tile: in-kernel block loop with manual
        # double-buffered DMA.  The grid-based streamed variants pay a
        # full kernel invocation (~10-30 us of ray setup, box clips and
        # pipeline overhead) per (tile, block) pair; here that fixed cost
        # is paid once per tile and each block costs a semaphore wait + a
        # conditional march.  Blocks are VISITED in visibility order
        # (sign(front.x)), so the compose is always front-to-back and
        # early ray termination skips every remaining block's march.
        block_rows = bufs_ref.shape[1]
        fwd = front[0] >= 0.0

        def bk_of(kvis):
            bk = jnp.where(fwd, kvis, nxb - 1 - kvis)
            return jnp.clip(bk, 0, nxb - 1).astype(_i32)

        def dma(slot, kvis):
            bk = bk_of(kvis)
            return pltpu.make_async_copy(
                vol_ref.at[pl.ds(bk * block_rows, block_rows), :],
                bufs_ref.at[slot],
                dma_sem_ref.at[slot],
            )

        def ms_dma(slot, kvis):
            bk = bk_of(kvis)
            return pltpu.make_async_copy(
                ms_hbm_ref.at[pl.ds(bk * ms_brm, ms_brm), :],
                ms_bufs_ref.at[slot],
                ms_sem_ref.at[slot],
            )

        def start(slot, kvis):
            dma(slot, kvis).start()
            if ms_stream:
                ms_dma(slot, kvis).start()

        def wait(slot, kvis):
            dma(slot, kvis).wait()
            if ms_stream:
                ms_dma(slot, kvis).wait()

        def march(slot, kvis, carry):
            cr, cg, cb, t = carry
            bk = bk_of(kvis)
            x0b = x0_i + bk * slab_x
            # the host precomputed geometry ∩ occupied-x extent per block
            blk_lo = bext_ref[2 * bk]
            blk_hi = bext_ref[2 * bk + 1]
            bl = [jnp.maximum(box_lo[0], blk_lo), box_lo[1], box_lo[2]]
            bh = [jnp.minimum(box_hi[0], blk_hi), box_hi[1], box_hi[2]]
            bcr, bcg, bcb, bt = _compute_ct(
                vol_ref=bufs_ref.at[slot], x0_i=x0b, box_lo=bl, box_hi=bh,
                ms_ref=ms_bufs_ref.at[slot] if ms_stream else None)
            # visit order == visibility order: accumulator is in front
            return (cr + t * bcr, cg + t * bcg, cb + t * bcb, t * bt)

        def maybe_march(slot, kvis, carry):
            bk = bk_of(kvis)
            nonempty = bext_ref[2 * bk] <= bext_ref[2 * bk + 1]
            live = (kvis < nxb) & nonempty & (jnp.max(carry[3]) > eps)
            return jax.lax.cond(
                live, lambda c: march(slot, kvis, c),
                lambda c: c, carry)

        start(0, 0)

        def body(it, carry):
            k0 = it * 2
            k1 = it * 2 + 1

            @pl.when(k1 < nxb)
            def _():
                start(1, k1)

            wait(0, k0)
            carry = maybe_march(0, k0, carry)

            @pl.when(k1 + 1 < nxb)
            def _():
                start(0, k1 + 1)

            @pl.when(k1 < nxb)
            def _():
                wait(1, k1)

            return maybe_march(1, k1, carry)

        npairs = -(-nxb // 2)
        cr, cg, cb, t = jax.lax.fori_loop(
            0, npairs, body, (zeros, zeros, zeros, ones))
        out_r_ref[0, 0] = cr
        out_g_ref[0, 0] = cg
        out_b_ref[0, 0] = cb
        out_t_ref[0, 0] = t
        return

    if block_major:
        # per-tile (C, T) accumulator rows in the persistent scratch:
        # [r | g | b | t] stacked as 4*RT rows per tile
        lin = tx * pl.num_programs(2) + ty
        base = lin * (4 * RT)

        @pl.when(kblk == 0)
        def _():
            state_ref[pl.ds(base, RT), :] = zeros
            state_ref[pl.ds(base + RT, RT), :] = zeros
            state_ref[pl.ds(base + 2 * RT, RT), :] = zeros
            state_ref[pl.ds(base + 3 * RT, RT), :] = ones

        acc_t0 = state_ref[pl.ds(base + 3 * RT, RT), :]
        fwd = front[0] >= 0.0
        do_k = jnp.logical_not(fwd & (jnp.max(acc_t0) <= eps))

        @pl.when(do_k)
        def _():
            cr, cg, cb, t = _compute_ct()
            acc_r = state_ref[pl.ds(base, RT), :]
            acc_g = state_ref[pl.ds(base + RT, RT), :]
            acc_b = state_ref[pl.ds(base + 2 * RT, RT), :]
            acc_t = state_ref[pl.ds(base + 3 * RT, RT), :]
            # fwd:  (C, T) = (C_acc + T_acc*C_blk, T_acc*T_blk)
            # bwd:  the block is nearer the camera
            state_ref[pl.ds(base, RT), :] = jnp.where(
                fwd, acc_r + acc_t * cr, cr + t * acc_r)
            state_ref[pl.ds(base + RT, RT), :] = jnp.where(
                fwd, acc_g + acc_t * cg, cg + t * acc_g)
            state_ref[pl.ds(base + 2 * RT, RT), :] = jnp.where(
                fwd, acc_b + acc_t * cb, cb + t * acc_b)
            state_ref[pl.ds(base + 3 * RT, RT), :] = acc_t * t

        # every visit writes the running state; the final visit's flush
        # (kblk == nxb-1) is what lands in HBM
        out_r_ref[0, 0] = state_ref[pl.ds(base, RT), :]
        out_g_ref[0, 0] = state_ref[pl.ds(base + RT, RT), :]
        out_b_ref[0, 0] = state_ref[pl.ds(base + 2 * RT, RT), :]
        out_t_ref[0, 0] = state_ref[pl.ds(base + 3 * RT, RT), :]
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

    # (tile, block) visibility: the host-side conservative bitmap
    # (_streamed_visibility) proves most pairs can't contribute — skipping
    # them here skips ALL the per-invocation fixed work (ray setup, box
    # intersect, scalar reductions), the measured streamed-mode bottleneck
    # (DESIGN.md §6 item 1).
    visible = jnp.asarray(True)
    if vis_ref is not None:
        nty_g = pl.num_programs(1)
        nxb_g = pl.num_programs(2)
        visible = vis_ref[(tx * nty_g + ty) * nxb_g + kblk] > 0

    acc_t0 = out_t_ref[0, 0]
    fwd = front[0] >= 0.0
    # early termination across blocks: when marching front-to-back and the
    # whole tile is saturated, later blocks cannot change the output by
    # more than eps.  Skipped invocations leave the accumulator untouched
    # (composing with the (0, 1) identity segment is a no-op).
    do_k = visible & jnp.logical_not(fwd & (jnp.max(acc_t0) <= eps))

    @pl.when(do_k)
    def _():
        cr, cg, cb, t = _compute_ct()
        acc_r = out_r_ref[0, 0]
        acc_g = out_g_ref[0, 0]
        acc_b = out_b_ref[0, 0]
        acc_t = out_t_ref[0, 0]
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
    brick: Tuple[int, int, int] = (BRICK, BRICK, BRICK),
) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """[nbx*nby*nbz] i32: 1 where any voxel in the brick-shaped cell
    classifies to alpha > 0 (a1 value semantics: negatives clamped,
    /trunc(cal_max)).  ``brick`` is per-axis; the streamed driver
    coarsens the y/z bricks for volumes whose 8^3 map would overflow the
    1 MB SMEM budget (512^3: 64^3 ints = 1.05 MB — the round-4 SMEM
    OOM), keeping the x bricks at 8 so block alignment and the bext
    extents are unchanged.

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
    pd = [_pad_to(x, b) for x, b in zip((d1, d2, d3), brick)]
    occ = jnp.pad(occ, [(0, pd[c] - (d1, d2, d3)[c]) for c in range(3)])
    nb = tuple(p // b for p, b in zip(pd, brick))
    occ = occ.reshape(nb[0], brick[0], nb[1], brick[1], nb[2], brick[2])
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


def packed_lut_geometry(
    dims: Tuple[int, int, int], lut_n: int
) -> Tuple[int, int, int] | None:
    """(zw, ypack, nyg) for the 16-bit LUT-index grid (2 ids per i32 word),
    or None when it cannot apply (z > 256, or over the VMEM budget)."""
    d1, d2, d3 = dims
    if lut_n > 65536:
        return None
    zw = -(-d3 // 2)
    if zw > 128:
        return None  # d3 > 256
    ypack = min(128 // zw, d2)
    nyg = -(-d2 // ypack)
    if _pad_to(d1 * nyg, 8) * 128 * 4 > 12 * 2**20:  # VMEM budget
        return None
    return zw, ypack, nyg


def pack_lut_grid(
    data: jnp.ndarray | Volume,
    lut_n: int,
    cal_max_trunc: jnp.ndarray,
    zpack: Tuple[int, int, int],
) -> jnp.ndarray:
    """Rows [pad8(d1*nyg), 128] i32 of per-voxel dense-LUT indices
    (round-to-nearest of vn * (N-1), exactly the kernel's classify_lut
    index — ids are exact integers, so the packed grid is bit-exact), two
    16-bit ids per word, z-major.  The id of vn=0 is 0 (the off-volume
    fallback), so callers pass id0 = 0."""
    if isinstance(data, Volume):
        data = data.data
    d1, d2, d3 = data.shape
    zw, ypack, nyg = zpack
    vn = jnp.maximum(data, 0.0) / cal_max_trunc
    ids = jnp.clip(
        jnp.round(vn * np.float32(lut_n - 1)).astype(_i32), 0, lut_n - 1)
    ids = jnp.pad(ids, ((0, 0), (0, nyg * ypack - d2), (0, zw * 2 - d3)))
    shifts = jnp.arange(2, dtype=_i32) * 16
    words = jnp.sum(
        jnp.left_shift(ids.reshape(d1, nyg, ypack, zw, 2), shifts), axis=-1
    ).astype(_i32)
    rows = _pad_to(d1 * nyg, 8)
    grid = jnp.zeros((rows, 128), _i32)
    grid = grid.at[: d1 * nyg, : ypack * zw].set(
        words.reshape(d1 * nyg, ypack * zw))
    return grid


def bake_light_grids(
    data: jnp.ndarray,
    config: RenderConfig,
    light,
    view_dir: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-voxel Blinn-Phong factors (M, S), each [X, Y, Z] f32, such that
    shading a classified color is ``rgb * M + S`` — the exact per-voxel
    value of ops/phong.phong_shade on conv3d.gradient_field normals
    (models/raycast.py lit branch), legal because for ortho cameras the
    view direction (hence the half vector) is ray-independent and every
    shading input is a per-voxel quantity.  Requires a uniform
    ``light.color`` so M collapses to one channel-independent grid.
    Supports every gradient_filter / presmooth_sigma (the bake runs the
    same XLA convolution the scan renderer uses)."""
    from . import conv3d

    grad = conv3d.gradient_field(
        data, config.gradient_filter, config.presmooth_sigma)  # [X,Y,Z,3]
    return bake_light_grids_from_grad(grad, light, view_dir)


def bake_light_grids_from_grad(
    grad: jnp.ndarray,
    light,
    view_dir: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The shading half of :func:`bake_light_grids`, taking a precomputed
    gradient field [..., 3] — used by volume-slab callers whose gradients
    come from a halo-extended slab (parallel/render_dist.py diff slab
    segments) rather than the replicated volume."""
    from . import phong

    ldir = light.direction / jnp.linalg.norm(light.direction)
    n_norm = jnp.linalg.norm(grad, axis=-1)
    nn = grad / jnp.maximum(n_norm[..., None], 1e-8)
    ndotl = jnp.abs(jnp.sum(nn * ldir, axis=-1))
    v = view_dir / jnp.maximum(jnp.linalg.norm(view_dir), 1e-8)
    h = ldir + v
    h = h / jnp.maximum(jnp.linalg.norm(h), 1e-8)
    ndoth = jnp.abs(jnp.sum(nn * h, axis=-1))
    w = jnp.clip(n_norm / np.float32(1e-3), 0.0, 1.0)  # grad_threshold
    lc = light.color[0]
    m = 1.0 - w + w * (light.ambient + light.diffuse * ndotl * lc)
    s = w * light.specular * phong.safe_pow(ndoth, light.shininess) * lc
    return m, s


def bake_scatter_grid(
    data: jnp.ndarray,
    tf: TransferFunction,
    config: RenderConfig,
    light,
    ray_dir: jnp.ndarray,
    cal_for_g: jnp.ndarray,
    cal_max_trunc: jnp.ndarray,
) -> jnp.ndarray:
    """Per-voxel single-scattering radiance S_scat [X, Y, Z] f32.

    For ortho marches the whole scattering add
    (models/raycast._apply_scattering) is a per-voxel quantity:
    ``strength * HG(cos t; g_voxel) * T_light(voxel) * light_color`` —
    cos t = dot(ray_dir, light_dir) is ray-independent and T_light is the
    ops/phong.light_transmittance_grid sweep — so it folds into the baked
    additive (S) slot of the kernels' ``rgb * M + S`` shading, exactly
    like the Blinn-Phong bake.  ``cal_for_g`` is the normalization used
    for the material (g) lookup: trunc(cal_max) on the a1 path, the float
    header value on a5 (PARITY C4); the transmittance alpha always uses
    trunc (one _make_scatter in raycast.py serves both).  Requires a
    uniform light color (single grid serves all three channels)."""
    from . import phong

    vn_g = jnp.maximum(data, 0.0) / cal_for_g
    gk = jnp.take(tf.hg_g, tf.classify_index(vn_g), axis=0)
    alpha = tf.classify(
        jnp.maximum(data, 0.0) / cal_max_trunc)[..., 3]
    alpha = jnp.clip(
        alpha * jnp.asarray(config.density_scale, _f32), 0.0, 1.0)
    tgrid = phong.light_transmittance_grid(alpha, light.direction)
    rdir = ray_dir / jnp.maximum(jnp.linalg.norm(ray_dir), 1e-8)
    ldir = light.direction / jnp.maximum(
        jnp.linalg.norm(light.direction), 1e-8)
    cos_t = jnp.sum(rdir * ldir)
    ph = phong.henyey_greenstein(cos_t, gk)
    return (jnp.asarray(config.scattering_strength, _f32)
            * ph * tgrid * light.color[0])


def pack_ms_grid(
    mgrid: jnp.ndarray,
    sgrid: jnp.ndarray,
    d1p: int,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], int]:
    """Quantize + pack the baked (M, S) factor grids for HBM streaming.

    Returns (rows [d1p * d2 * nzr, 128] i32, (m_min, m_step, s_min,
    s_step), nzr).  Each u8-affine-quantized voxel pair (Mq | Sq << 8)
    packs two consecutive-z voxels per i32 word: lane = (z >> 1) & 127,
    z-row = z >> 8, shift = (z & 1) * 16 — 2 bytes/voxel, so a
    512^3-class factor volume streams in ~256 KB blocks/plane instead of
    the 2 x f32 grids that can never fit VMEM (ops/pallas_march
    ms_stream).  Per-factor error <= (max - min) / 510; for
    reference-scale lights (M in ~[0.1, 1.1], S in ~[0, 0.5]) that is
    ~2e-3 — below the 1/255 8-bit output floor.  The bake itself runs on
    the FULL volume in XLA first, so gradient normals see no block
    boundaries."""
    d1, d2, d3 = mgrid.shape
    nzr = -(-d3 // 256)

    def quant(g):
        lo = jnp.min(g)
        rng = jnp.max(g) - lo
        step = jnp.where(rng > 0, rng / 255.0, 1.0)
        q = jnp.round((g - lo) / step).astype(_i32)
        return jnp.clip(q, 0, 255), lo, step

    mq, m_min, m_step = quant(mgrid)
    sq, s_min, s_step = quant(sgrid)
    both = mq | (sq << 8)  # [d1, d2, d3] u16 in i32
    both = jnp.pad(
        both, ((0, d1p - d1), (0, 0), (0, nzr * 256 - d3)))
    pairs = both.reshape(d1p, d2, nzr, 128, 2)
    words = (pairs[..., 0] | (pairs[..., 1] << 16)).astype(_i32)
    rows = words.reshape(d1p * d2 * nzr, 128)
    return rows, (m_min, m_step, s_min, s_step), nzr


_BAKED_BUDGET = 13 * 2**20  # main grid + two f32 factor grids (VMEM ~16 MB)
_MC_BUDGET = 15 * 2**20 + 2**19  # id grid + rgb channel grids (a5-proven)


def multichannel_feasible(
    dims: Tuple[int, int, int], channels: int, num_intervals: int,
    config: RenderConfig,
) -> bool:
    """Static predicate: can a 4-D multi-channel volume render through the
    fused kernel?  Needs the packed mean-id grid (alpha), one (C < 3,
    gray) or three (C >= 3) normalized f32 channel grids for rgb within
    the VMEM budget, plain classify (no lighting/LUT — those stay on the
    XLA multichannel path), and nearest-neighbor sampling."""
    d1, d2, d3 = dims
    if channels < 2 or config.lighting or config.tf_lut:
        return False
    if config.interp is not Interp.NEAREST:
        return False
    if d3 > 128:
        return False
    zp = packed_geometry(dims, num_intervals)
    if zp is None:
        return False
    ngrids = 1 if channels < 3 else 3
    main = _pad_to(d1 * zp[2], 8) * 128 * 4
    f32b = _pad_to(d1 * d2, 8) * 128 * 4
    return main + ngrids * f32b <= _MC_BUDGET


def baked_light_feasible(
    dims: Tuple[int, int, int], num_intervals: int, config: RenderConfig
) -> bool:
    """Static predicate: can this render's lighting run through the baked
    per-voxel path (render dispatch mirrors _resolve_kernel_mode)?"""
    d1, d2, d3 = dims
    if config.conic or d3 > 128:
        return False
    f32_bytes = _pad_to(d1 * d2, 8) * 128 * 4
    if config.tf_lut:
        zp = packed_lut_geometry(dims, int(config.tf_lut))
    else:
        zp = packed_geometry(dims, num_intervals)
    main_bytes = (_pad_to(d1 * zp[2], 8) * 128 * 4 if zp is not None
                  else f32_bytes)
    return main_bytes + 2 * f32_bytes <= _BAKED_BUDGET


def _resolve_kernel_mode(
    dims_local: Tuple[int, int, int],
    channels: int,
    num_intervals: int,
    config: RenderConfig,
    packed: bool | None,
    bakeable: bool,
) -> Tuple[bool, Tuple[int, int, int] | None, int, bool, bool]:
    """Validate the config against kernel capabilities and pick the grid
    layout -> (packed, zpack, pack_bits, lut_packed, baked).

    ``bakeable`` says the caller's camera/light admit per-voxel shading
    (ortho + uniform concrete light color + full volume); this resolver
    adds the geometry/VMEM conditions and falls back to in-kernel
    gradient shading (f32 rows, central/raw only) when baking is out."""
    d1, d2, d3 = dims_local
    if channels != 1:
        raise ValueError("pallas path supports single-channel volumes")
    if config.interp is not Interp.NEAREST:
        raise ValueError("pallas path is nearest-neighbor (a1) only")
    if config.tf_lut and not 0 < config.tf_lut <= 1024:
        raise ValueError(f"tf_lut size {config.tf_lut} not in (0, 1024]")

    f32_bytes = _pad_to(d1 * d2, 8) * 128 * 4
    if config.tf_lut:
        zp = packed_lut_geometry(dims_local, int(config.tf_lut))
        pack_bits, lut_packed = 16, True
    else:
        zp = packed_geometry(dims_local, num_intervals)
        pack_bits, lut_packed = 4, False
    use_packed = (zp is not None) if packed is None else packed
    if use_packed and zp is None:
        raise ValueError(
            "packed pallas path needs z <= 1024 with <= 16 TF intervals "
            "(or z <= 256 for LUT ids) and a grid within the VMEM budget "
            f"(dims {dims_local}, {num_intervals} intervals, "
            f"lut {config.tf_lut})")
    if not use_packed:
        pack_bits, lut_packed = 4, False
        if d3 > 128:
            raise ValueError(
                f"unpacked pallas path needs z dim <= 128 (got {d3}); "
                "use packed mode or the XLA renderer for larger volumes")
        main_bytes = f32_bytes
    else:
        main_bytes = _pad_to(d1 * zp[2], 8) * 128 * 4

    baked = False
    if config.lighting or config.scattering:
        if (bakeable and d3 <= 128
                and main_bytes + 2 * f32_bytes <= _BAKED_BUDGET):
            baked = True
        elif config.scattering:
            raise ValueError(
                "fused scattering rides the baked per-voxel path (ortho "
                "camera, uniform light color, z <= 128, VMEM budget, "
                "full volume); use the XLA renderer otherwise")
        else:
            # in-kernel gradient shading needs intensities: f32 rows only
            if d3 > 128:
                raise ValueError(
                    "lighting in the fused kernel needs z <= 128 "
                    f"(got {d3}); use the XLA renderer")
            if (config.gradient_filter != "central"
                    or config.presmooth_sigma != 0.0):
                raise ValueError(
                    "fused in-kernel lighting computes central-difference "
                    "normals on the raw density; sobel/presmooth need the "
                    "baked path (ortho, uniform light color) or the XLA "
                    "renderer")
            use_packed, zp, pack_bits, lut_packed = False, None, 4, False
    return use_packed, (zp if use_packed else None), pack_bits, lut_packed, \
        baked


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


def _uniform_light_color(light) -> bool:
    """Static predicate for the per-voxel shading bake: is the light's
    color channel-uniform, decidable at trace time?  ``None`` selects the
    default light (uniform white by construction); an explicit light
    qualifies only when its color is concrete — under ``jit`` every
    in-trace array is a Tracer, so explicit lights fall back to the
    in-kernel gradient path (pass light=None to keep the fast path)."""
    if light is None:
        return True
    col = light.color
    if isinstance(col, jax.core.Tracer):
        return False
    c = np.asarray(col)
    return c.shape == (3,) and bool(c[0] == c[1] == c[2])


def _stage_f32_rows(arr: jnp.ndarray, d1_: int, d2_: int,
                    d3_: int) -> jnp.ndarray:
    """[X, Y, Z] f32 -> padded [pad8(X*Y), 128] VMEM rows, z on lanes."""
    rows = _pad_to(d1_ * d2_, 8)
    out = jnp.zeros((rows, 128), _f32)
    return out.at[: d1_ * d2_, :d3_].set(arr.reshape(d1_ * d2_, d3_))


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
    channels: int = 1,
):
    """Shared kernel driver -> (cr, cg, cb, t), each [w_local, height] f32.

    ``data`` is the full [X, Y, Z] volume ([X, Y, Z, C] when
    ``channels`` > 1), or an x-slab of it when ``slab_x`` is set
    (``x0`` = the slab's global x offset, traced OK).
    ``x_offset``/``local_width`` select a ray-column tile and
    ``s_start``/``s_count`` a sample segment — all static-shape, traced
    offsets, so the call is shard_map-friendly.
    """
    d1, d2, d3 = dims
    dims_local = (slab_x if slab_x is not None else d1, d2, d3)
    mc = channels > 1
    if mc:
        if not multichannel_feasible(
                dims_local, channels, tf.num_intervals, config):
            raise ValueError(
                "multichannel pallas path needs plain NN classify, the "
                "packed mean-id grid, and the rgb channel grids within "
                f"VMEM (dims {dims_local}, {channels} channels)")
        # slab_x is supported: the mean-id pack and channel-grid staging
        # are pointwise per voxel (NN sampling needs no halo), and both
        # the packed fetch and fetch_f32_grids index by the slab-local x

    lg = None
    if config.lighting or config.scattering:
        from . import phong

        lg = light if light is not None else phong.default_light()
    # per-voxel shading bake needs: ortho (ray-independent view), a
    # uniform light color known STATICALLY (M collapses to one grid),
    # and the full volume (gradients cross slab bounds).  light=None
    # means the default light — uniform white by construction — which
    # matters under jit, where even trace-constant arrays are Tracers
    # and a value check would always fail.
    bakeable = (
        (config.lighting or config.scattering)
        and not config.conic
        and slab_x is None
        and _uniform_light_color(light)
    )
    if mc:
        zpack = packed_geometry(dims_local, tf.num_intervals)
        packed, pack_bits, lut_packed, baked = True, 4, False, False
    else:
        packed, zpack, pack_bits, lut_packed, baked = _resolve_kernel_mode(
            dims_local, 1, tf.num_intervals, config, packed, bakeable)

    w, h = config.width, config.height
    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count
    if tile is None:
        # lit kernels (baked or in-kernel) prefer smaller tiles: the
        # footprint shrinks faster than the per-chunk fixed work grows
        # (v5e sweep, benchmarks/tpu_round3_results.json: 25 ms at
        # 16x16x16 vs 54 ms at DEFAULT_TILE for 304^2x300 lit renders)
        tile = (16, 16, 16) if config.lighting else DEFAULT_TILE
    tpx, tpy, steps = tile
    if (tpx * tpy) % 128 or (tpx * tpy * steps) % 1024:
        raise ValueError(f"tile {tile}: rays must fill 128-lane rows and "
                         "rays*steps must fill [8,128] registers")
    ntx = -(-w_local // tpx)
    nty = -(-h // tpy)
    rt = (tpx * tpy) // 128

    cal_max_trunc = jnp.trunc(jnp.asarray(cal_max, _f32))
    id0 = jnp.zeros((), _f32)
    norm4 = None
    if mc:
        # multichannel value semantics (_vrc_sample_rgba_multichannel):
        # clamp, normalize by the RAW float cal_max, rgb from channels,
        # alpha from TF(channel mean) — the mean's classify index packs
        # into the 4-bit id grid (normalization 1.0: meanv is already
        # normalized), the rgb channels stage as f32 row grids below
        cal_raw = jnp.asarray(cal_max, _f32)
        norm4 = jnp.maximum(
            data.reshape(dims_local + (channels,)), 0.0) / cal_raw
        meanv = jnp.mean(norm4, axis=-1)
        one = jnp.ones((), _f32)
        vol_rows, id0 = pack_material_grid(meanv, tf, one, zpack)
    elif packed and lut_packed:
        vol_rows = pack_lut_grid(
            data, int(config.tf_lut), cal_max_trunc, zpack)
        # id0 stays 0: round(0 * (N-1)) = 0 is the off-volume LUT index
    elif packed:
        vol_rows, id0 = pack_material_grid(data, tf, cal_max_trunc, zpack)
    else:
        vol_rows = _stage_f32_rows(data, dims_local[0], d2, d3)
    rows = vol_rows.shape[0]

    lut = tf.to_lut(config.tf_lut) if config.tf_lut else None
    if mc:
        occ, nb = brick_occupancy(meanv, tf, one)
    else:
        occ, nb = brick_occupancy(data, tf, cal_max_trunc, lut=lut)

    if lut is not None:
        alpha0 = lut[0, 3]  # idx(vn=0) = 0
    else:
        alpha0 = tf.classify(jnp.zeros((), _f32))[3]
    if config.density_scale != 1.0:
        alpha0 = jnp.clip(alpha0 * np.float32(config.density_scale), 0.0, 1.0)

    extra_args = []
    extra_specs = []
    if config.lighting and not baked:
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
    if baked:
        data3d = data.reshape(dims_local)
        if config.lighting:
            mgrid, sgrid = bake_light_grids(data3d, config, lg,
                                            -camera.front)
        else:
            mgrid = jnp.ones(dims_local, _f32)
            sgrid = jnp.zeros(dims_local, _f32)
        if config.scattering:
            # the scattering add folds into the additive slot: the a1
            # march direction is camera.front for every ortho ray, and
            # the a1 material lookup normalizes by trunc(cal_max)
            sgrid = sgrid + bake_scatter_grid(
                data3d, tf, config, lg, camera.front,
                cal_max_trunc, cal_max_trunc)
        for g in (mgrid, sgrid):
            grows = _stage_f32_rows(g, dims_local[0], d2, d3)
            extra_args.append(grows)
            extra_specs.append(
                pl.BlockSpec((grows.shape[0], 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM))
    mc_grids = 0
    if mc:
        mc_grids = 1 if channels < 3 else 3
        for ci in range(mc_grids):
            grows = _stage_f32_rows(norm4[..., ci], dims_local[0], d2, d3)
            extra_args.append(grows)
            extra_specs.append(
                pl.BlockSpec((grows.shape[0], 128), lambda i, j: (0, 0),
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
        lighting=bool(config.lighting) and not baked,
        lut_n=int(config.tf_lut),
        pack_bits=pack_bits,
        lut_packed=lut_packed,
        baked_light=baked,
        mc_grids=mc_grids,
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
    epsilon (``early_eps=0`` for exact agreement).  4-D multi-channel
    volumes run fused when ``multichannel_feasible`` (packed mean-id grid
    for alpha + normalized rgb channel grids); trilinear modes fall back
    to the XLA renderer.  Grid layouts
    (_resolve_kernel_mode): 4-bit packed material ids by default
    (z <= 1024, MNI-1mm-class volumes), 16-bit packed LUT indices for
    ``config.tf_lut`` (z <= 256), f32 rows otherwise (z <= 128).
    ``config.lighting`` runs baked (per-voxel Phong factor grids — ortho
    + uniform light color, any gradient filter; BASELINE config 2's fast
    path) or in-kernel (central-difference normals, conic-capable) —
    see _march_kernel's ``baked_light``/``lighting`` docs.
    """
    c = volume.channels
    shape = volume.dims + (c,) if c > 1 else volume.dims
    cr, cg, cb, t = _march_tiles(
        volume.data.reshape(shape),
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
        channels=c,
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
    channels: int = 1,
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
        channels=channels,
    )
    return jnp.stack([cr, cg, cb], axis=-1), t[..., None]


def streamed_geometry(
    dims: Tuple[int, int, int], num_intervals: int,
    block_bytes: int = 8 * 2**20,
    lut_n: int = 0,
) -> Tuple[int, Tuple[int, int, int] | None] | None:
    """(block_x, zpack) for the HBM-streamed march, or None when even
    streaming can't express the volume (z > 1024 packed / > 128 unpacked).

    ``zpack`` is None for the f32 row layout.  With ``lut_n`` the packed
    layout holds 16-bit LUT indices (2/word, z <= 256) instead of 4-bit
    material ids.  block_x is a multiple of BRICK sized so one block
    (double-buffered by the pipeline) fits the VMEM budget."""
    d1, d2, d3 = dims
    if lut_n:
        zw = -(-d3 // 2)
        if lut_n <= 65536 and zw <= 128:
            ypack = min(128 // zw, d2)
            nyg = -(-d2 // ypack)
            row_bytes = nyg * 128 * 4
            zp = (zw, ypack, nyg)
        elif d3 <= 128:
            row_bytes = d2 * 128 * 4  # f32 rows; LUT classify from vn
            zp = None
        else:
            return None
    elif num_intervals <= 16 and -(-d3 // 8) <= 128:
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


def _streamed_visibility(
    camera: Camera,
    config: RenderConfig,
    dims: Tuple[int, int, int],
    depth: int,
    occ: jnp.ndarray,
    nb: Tuple[int, int, int],
    block_x: int,
    nxb: int,
    tile: Tuple[int, int, int],
    alpha0: jnp.ndarray,
    box_lo,
    box_hi,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conservative per-(ray-tile, x-block) visibility for the streamed
    march -> (vis [ntx*nty*nxb] i32, eff [ntx*nty*nxb] i32).

    ``vis`` is 1 whenever the kernel invocation for that pair could
    contribute: some ray of the tile crosses the block's x extent inside
    the marched t-range AND the block holds an occupied brick inside the
    tile's (conservatively widened) y/z voxel footprint.  The math mirrors
    _march_kernel's box-intersection and chunk-box index chain with wider
    (1e-4 + one-brick) margins, so vis=0 provably implies the invocation
    composes the identity segment.  TF(0).alpha > 0 forces all-visible
    (out-of-volume samples render, exactly as the in-kernel skips disable).

    ``eff`` remaps each grid step's volume-block index to the last visible
    block at or before it (cummax), so Pallas's pipeline elides the
    HBM->VMEM copy for skipped steps (consecutive equal indices fetch
    nothing).  Ortho cameras only — the caller rejects conic."""
    d1, d2, d3 = dims
    w, h = config.width, config.height
    tpx, tpy, steps = tile
    ntx = -(-w // tpx)
    nty = -(-h // tpy)
    L = np.float32(max(dims))
    n = np.float32(2**depth)
    nbx, nby, nbz = nb
    hg = [np.float32(L / 2) - np.float32(d / 2) for d in dims]
    hg_hi = [np.float32(hg[c] + np.float32(dims[c])) for c in range(3)]
    halfd = [np.float32(d / 2) for d in dims]
    halfL = np.float32(L / 2)

    # ---- per-pixel ortho origins (kernel float order), padded grid ------
    px = jnp.arange(ntx * tpx, dtype=_f32)[:, None]
    py = jnp.arange(nty * tpy, dtype=_f32)[None, :]
    rsw = jnp.asarray(config.real_screen_width, _f32)
    rsh = jnp.asarray(config.real_screen_height, _f32)
    o = [camera.top_left[c] + ((px * rsw) / np.float32(w)) * camera.right[c]
         + ((py * rsh) / np.float32(h)) * (-camera.up[c])
         for c in range(3)]
    d = [camera.front[c] for c in range(3)]
    pix_ok = (px < w) & (py < h)

    # ---- per-pixel t-range vs the dataset box (mirrors the kernel) ------
    t_lo = jnp.full(o[0].shape, -jnp.inf, _f32)
    t_hi = jnp.full(o[0].shape, jnp.inf, _f32)
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

    def treduce(x, fill, fn):
        x = jnp.where(hit, x, fill)
        return fn(fn(x.reshape(ntx, tpx, nty, tpy), axis=3), axis=1)

    t_enter = treduce(t_lo, big, jnp.min)  # [ntx, nty]
    t_exit = treduce(t_hi, -big, jnp.max)
    any_hit = jnp.any(hit.reshape(ntx, tpx, nty, tpy), axis=(1, 3))

    # clamp to the marched sample range, widen by a chunk + slack
    ds = jnp.asarray(config.sample_distance, _f32)
    clip = jnp.asarray(config.front_clip, _f32)
    spr = config.samples_per_ray
    margin = (np.float32(steps + 2)) * ds + np.float32(1e-4)
    t_enter = jnp.maximum(t_enter, clip) - margin
    t_exit = jnp.minimum(t_exit, clip + np.float32(spr) * ds) + margin

    # ---- per-(tile, block) t overlap with the block's x extent ----------
    oxm = treduce(o[0], big, jnp.min)[..., None]  # [ntx, nty, 1]
    oxM = treduce(o[0], -big, jnp.max)[..., None]
    ks = jnp.arange(nxb, dtype=_f32)
    blk_lo = (hg[0] + ks * np.float32(block_x)) / L - 0.5 - np.float32(1e-4)
    blk_hi = ((hg[0] + (ks + 1.0) * np.float32(block_x)) / L
              + np.float32(1.0) / n - 0.5 + np.float32(1e-4))
    dx = d[0]
    safe_x = jnp.abs(dx) > 1e-12
    dv = jnp.where(safe_x, dx, 1.0)
    cands = [(blk_lo - oxm) / dv, (blk_lo - oxM) / dv,
             (blk_hi - oxm) / dv, (blk_hi - oxM) / dv]
    tb_lo = jnp.minimum(jnp.minimum(cands[0], cands[1]),
                        jnp.minimum(cands[2], cands[3]))
    tb_hi = jnp.maximum(jnp.maximum(cands[0], cands[1]),
                        jnp.maximum(cands[2], cands[3]))
    overlap0 = (oxM >= blk_lo) & (oxm <= blk_hi)
    tb_lo = jnp.where(safe_x, tb_lo,
                      jnp.where(overlap0, -jnp.inf, jnp.inf))
    tb_hi = jnp.where(safe_x, tb_hi,
                      jnp.where(overlap0, jnp.inf, -jnp.inf))
    tt_lo = jnp.maximum(tb_lo, t_enter[..., None])  # [ntx, nty, nxb]
    tt_hi = jnp.minimum(tb_hi, t_exit[..., None])
    vis = (tt_hi >= tt_lo) & any_hit[..., None]
    tt_lo = jnp.clip(tt_lo, -1e4, 1e4)
    tt_hi = jnp.clip(tt_hi, -1e4, 1e4)

    # ---- tile footprint -> brick ranges (chunk_body's index chain) ------
    ok = vis
    brange = []
    for c in range(3):
        om = treduce(o[c], big, jnp.min)[..., None]
        oM = treduce(o[c], -big, jnp.max)[..., None]
        pmin = jnp.minimum(tt_lo * d[c], tt_hi * d[c])
        pmax = jnp.maximum(tt_lo * d[c], tt_hi * d[c])
        plo = om + pmin + 0.5 - np.float32(1e-4)
        phi = oM + pmax + 0.5 + np.float32(1e-4)
        alo = jnp.maximum(plo, 0.0)
        ahi = jnp.minimum(phi, np.float32(1.0 - 2.0**-24))
        ok &= alo <= ahi
        rlo = jnp.maximum((jnp.floor(alo * n) / n) * L, hg[c])
        rhi = jnp.minimum((jnp.floor(ahi * n) / n) * L, hg_hi[c])
        ok &= rlo < hg_hi[c]
        ok &= rhi >= hg[c]
        ilo = jnp.trunc((rlo + halfd[c]) - halfL).astype(_i32)
        ihi = jnp.trunc((rhi + halfd[c]) - halfL).astype(_i32)
        # one-brick slack each side absorbs any residual float skew
        blo = jnp.clip(jnp.clip(ilo, 0, dims[c] - 1) // BRICK - 1,
                       0, nb[c] - 1)
        bhi = jnp.clip(jnp.clip(ihi, 0, dims[c] - 1) // BRICK + 1,
                       0, nb[c] - 1)
        brange.append((blo, bhi))

    # ---- occupied brick inside the (block, y-range, z-range) rect? ------
    bpb = block_x // BRICK
    occ3 = occ.reshape(nbx, nby, nbz)
    occ3 = jnp.pad(occ3, ((0, nxb * bpb - nbx), (0, 0), (0, 0)))
    occ_b = occ3.reshape(nxb, bpb, nby, nbz).max(axis=1)  # [nxb, nby, nbz]
    sat = jnp.cumsum(jnp.cumsum(occ_b, axis=1), axis=2)
    sat = jnp.pad(sat, ((0, 0), (1, 0), (1, 0)))  # [nxb, nby+1, nbz+1]
    kk = jnp.broadcast_to(jnp.arange(nxb), vis.shape)
    (y0, y1), (z0, z1) = brange[1], brange[2]
    rect = (sat[kk, y1 + 1, z1 + 1] - sat[kk, y0, z1 + 1]
            - sat[kk, y1 + 1, z0] + sat[kk, y0, z0])
    vis = vis & ok & (rect > 0)

    # TF(0).alpha > 0: everything renders, nothing may be skipped
    vis = vis | (alpha0 > 0.0)
    vis_i = vis.astype(_i32)

    # eff[k] = last visible block <= k (block 0 when none yet): consecutive
    # equal indices make Pallas elide the block's HBM->VMEM copy
    eff = jax.lax.cummax(jnp.where(vis, kk, -1), axis=2)
    eff = jnp.maximum(eff, 0).astype(_i32)
    return vis_i.reshape(-1), eff.reshape(-1)


def streamed_block_extents(
    occ: jnp.ndarray,
    nb: Tuple[int, int, int],
    dims: Tuple[int, int, int],
    depth: int,
    block_x: int,
    nxb: int,
    alpha0: jnp.ndarray,
) -> jnp.ndarray:
    """Per-block ray-space x extents [2 * nxb] for the manual-DMA block
    loops: block geometry ∩ the occupied brick range, alpha0-gated (when
    TF(0).alpha > 0 every sample renders and nothing may be clipped) —
    sparse scenes skip whole blocks (inverted interval) and shrink the
    chunk range of the rest.  Shared by the forward streamed driver and
    the streamed diff core (ops/pallas_march_vjp._diff_streamed_tiles)
    so the two float-sensitive derivations cannot drift."""
    d1 = dims[0]
    nbx_b = nb[0]
    bpb = block_x // BRICK
    occ_any = (occ.reshape(nb).max(axis=(1, 2)) > 0)
    occ_any = jnp.pad(occ_any, (0, nxb * bpb - nbx_b))
    rb = occ_any.reshape(nxb, bpb)
    bidx = jnp.arange(bpb)
    has = jnp.any(rb, axis=1)
    first = jnp.min(jnp.where(rb, bidx, bpb), axis=1)
    last = jnp.max(jnp.where(rb, bidx, -1), axis=1)
    karr = jnp.arange(nxb, dtype=_f32) * np.float32(block_x)
    Lf = np.float32(max(dims))
    nf = np.float32(2.0 ** depth)
    hg0 = np.float32(Lf / 2) - np.float32(d1 / 2)
    xlo = karr + first.astype(_f32) * np.float32(BRICK)
    xhi = karr + (last + 1).astype(_f32) * np.float32(BRICK)
    geo_lo = (hg0 + karr) / Lf - 0.5
    geo_hi = (hg0 + karr + np.float32(block_x)) / Lf + 1.0 / nf - 0.5
    occ_lo = (hg0 + xlo) / Lf - 0.5
    occ_hi = (hg0 + xhi) / Lf + 1.0 / nf - 0.5
    unsafe = alpha0 > 0.0
    lo_r = jnp.where(unsafe, geo_lo,
                     jnp.where(has, jnp.maximum(occ_lo, geo_lo), 1e9))
    hi_r = jnp.where(unsafe, geo_hi,
                     jnp.where(has, jnp.minimum(occ_hi, geo_hi), -1e9))
    return jnp.stack([lo_r, hi_r], axis=-1).reshape(-1)


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
    use_vis: bool = False,
    remap_dma: bool = False,
    block_major: bool = False,
    manual: bool = True,
    manual_block_major: bool | None = None,
    light=None,
    x_offset=0,
    local_width: int | None = None,
    s_start=0,
    s_count: int | None = None,
    segment: bool = False,
) -> jnp.ndarray:
    """a1/VRC render with the volume streamed from HBM -> [W, H, 4].

    ``segment=True`` (manual mode): shard_map-friendly work unit — march
    ray columns [x_offset, x_offset + local_width) x samples [s_start,
    s_start + s_count) and return the (C [w, h, 3], T [w, h, 1]) pair of
    ops/composite.segment_compose, so rays/samples-sharded rendering of
    beyond-VMEM volumes (incl. streamed lighting/scattering) keeps
    fused-kernel throughput per device (parallel/render_dist.py).  The
    volume-axis is NOT supported here (each device already streams the
    full volume from its own HBM copy).

    ``config.lighting`` / ``config.scattering`` (manual mode only,
    VERDICT r3 item 3): the baked per-voxel (M, S) shading factors are
    u8-quantized, packed two voxels per word (pack_ms_grid), and
    STREAMED from HBM block-by-block in lockstep with the volume blocks
    — BASELINE config 4 at 512^3-class scale runs fused instead of
    falling to the XLA scan.  Accuracy: the quantization bounds the
    per-channel output error by ~(M range + S range)/510 (~2e-3 for
    reference lights, below the 8-bit floor); everything else matches
    render_vrc(..., mode="fast", lighting) exactly.

    For volumes whose (packed) row grid exceeds the resident kernel's VMEM
    budget (f32 >= ~256^3, MNI-1mm multi-channel, 512^3-class data —
    DESIGN.md §4 roadmap item 1): grid dim 2 sweeps x-blocks of the volume
    and Pallas pipelines each block's HBM->VMEM copy against the previous
    block's march (automatic double buffering); per-(tile, block) segments
    compose in visibility order with early termination across blocks.
    Ortho cameras only (one global slab visit order, like the volume mesh
    axis); matches render_vrc(..., mode="fast") to the early_eps bound.

    ``use_vis``: gate each (tile, block) invocation on a host-computed
    conservative visibility bitmap (_streamed_visibility), optionally
    (``remap_dma``) remapping skipped steps' block index to elide their
    HBM copies.  Exact (tested bit-equal) but measured SLOWER on a v5e
    chip in every regime — +15-20 ms/frame at 320^3/304^2 even on a
    scene where 80% of blocks are empty (benchmarks/tpu_round3_results
    r3b_streamed_*: static 25.0/44.1 ms vs vis 45.1/59.4 ms sparse/dense)
    — the scalar-prefetch grid spec plus the conditional kernel body
    defeat the pipeline's lookahead by more than the skipped work saves.
    Default off; kept for A/B measurement (tile-major grid only).

    ``block_major``: grid (nxb, ntx, nty) with the block index OUTERMOST,
    so each volume block is DMA'd from HBM exactly once per frame;
    per-tile (C, T) accumulators persist in a VMEM scratch.  Measured
    round 4: no win over tile-major (36.9 vs 35.2 ms dense 320^3 —
    packed-grid DMA was never the bottleneck; the per-(tile, block)
    invocation fixed cost is).  Kept for A/B.

    ``manual`` (default, VERDICT round-2 item 2): ONE kernel invocation
    per ray tile; the kernel loops over x-blocks itself with manual
    double-buffered HBM->VMEM DMA, visiting blocks in visibility order —
    the per-block cost drops to a semaphore wait + a conditional march,
    and cross-block early termination skips whole blocks of work.
    """
    if volume.channels != 1:
        raise ValueError("streamed pallas path supports single-channel")
    if config.conic:
        raise ValueError(
            "streamed pallas path needs one global block visit order; "
            "conic rays can disagree on sign(dir.x)")
    if config.interp is not Interp.NEAREST:
        raise ValueError(
            "streamed pallas path is a1 classify (plain or LUT) only")
    if config.tf_lut and not 0 < config.tf_lut <= 1024:
        raise ValueError(f"tf_lut size {config.tf_lut} not in (0, 1024]")
    d1, d2, d3 = volume.dims
    lut_n = int(config.tf_lut)
    if use_vis or block_major:
        manual = False
        manual_block_major = False
    if use_vis:
        block_major = False  # the bitmap indexes the tile-major grid
    if manual_block_major:
        manual = True  # same arg layout; the kernel branches on mbm
    if segment and not manual:
        raise ValueError("streamed segments run in the manual-DMA modes")
    lit = bool(config.lighting) or bool(config.scattering)
    if lit and not manual:
        raise ValueError(
            "streamed lighting/scattering runs in the manual-DMA mode "
            "(the default); the grid-streamed A/B variants are unlit")
    if lit and not _uniform_light_color(light):
        raise ValueError(
            "streamed lighting needs a statically-uniform light color "
            "(the quantized M grid folds it in); pass light=None for "
            "the default light")

    w, h = config.width, config.height
    w_local = w if local_width is None else local_width
    s_count = config.samples_per_ray if s_count is None else s_count
    if tile is None:
        # streamed sweep (benchmarks/tpu_round3_results.json r3d_streamed):
        # larger VMEM blocks (fewer k steps) + 16x16 ray tiles (tighter
        # per-chunk footprints) beat DEFAULT_TILE: 31.9 ms vs 39.8 at
        # 320^3/304^2
        tile = (16, 16, 16)
    tpx, tpy, steps = tile
    if (tpx * tpy) % 128 or (tpx * tpy * steps) % 1024:
        raise ValueError(f"tile {tile}: rays must fill 128-lane rows and "
                         "rays*steps must fill [8,128] registers")
    ntx = -(-w_local // tpx)
    nty = -(-h // tpy)
    rt = (tpx * tpy) // 128

    if manual_block_major is None:
        # round-5 on-chip A/B (tpu_round5_results2.json j2_*): mbm wins
        # or ties tile-major manual everywhere measured (320^3 plain
        # +8%, lit +6%; 512^3 lit -24%, plain tie) — default to it
        # whenever its per-tile state leaves the block buffers room
        state_bytes = 4 * _pad_to(ntx * nty * rt, 8) * 128 * 4
        manual_block_major = manual and state_bytes <= 4 * 2**20
    if block_major:
        # the per-tile (C, T) scratch shares VMEM with the double-buffered
        # block: shrink the block budget accordingly
        state_bytes = ntx * nty * 4 * rt * 128 * 4
        bb = max(2**20, (13 * 2**20 - state_bytes) // 2)
    elif manual_block_major:
        # per-tile states live in the VMEM output blocks; budget what's
        # left for the two block buffers
        state_bytes = 4 * _pad_to(ntx * nty * rt, 8) * 128 * 4
        bb = max(2**20, (12 * 2**20 - state_bytes) // 2)
    elif manual:
        bb = 6 * 2**20  # two explicit buffers + compute headroom
    else:
        bb = 8 * 2**20
    geo = streamed_geometry(volume.dims, tf.num_intervals,
                            block_bytes=bb, lut_n=lut_n)
    if geo is None:
        raise ValueError(f"volume dims {volume.dims} not streamable")
    bx_auto, zpack = geo
    nzr_ms = -(-d3 // 256)
    if lit:
        # the (M, S) blocks share the VMEM budget with the volume blocks
        vol_pp = (zpack[2] if zpack is not None else d2) * 512
        ms_pp = d2 * nzr_ms * 512
        bx_auto = min(bx_auto, max(
            BRICK, (bb // (vol_pp + ms_pp)) // BRICK * BRICK))
    if block_x is None:
        block_x = bx_auto
    # coarsen the y/z occupancy bricks until the map fits the 1 MB SMEM
    # budget (512^3 at 8^3 bricks = 64^3 ints = 1.05 MB: the round-4
    # SMEM OOM); the x bricks stay 8 so block alignment and the bext
    # extents are untouched
    brick = [BRICK, BRICK, BRICK]
    def _occ_ints(b):
        return (_pad_to(d1, b[0]) // b[0]) * (_pad_to(d2, b[1]) // b[1]) \
            * (_pad_to(d3, b[2]) // b[2])
    while _occ_ints(brick) * 4 > 512 * 1024:
        brick[1] *= 2
        brick[2] *= 2
    brick = tuple(brick)
    if brick != (BRICK, BRICK, BRICK) and use_vis:
        raise ValueError(
            "use_vis (A/B instrumentation) assumes 8^3 bricks; this "
            "volume needs coarser bricks — use the default modes")
    if block_x % BRICK:
        raise ValueError(f"block_x {block_x} must be a multiple of {BRICK}")
    d1p = _pad_to(d1, block_x)
    nxb = d1p // block_x
    packed = zpack is not None

    data = volume.data.reshape(volume.dims)
    data_p = jnp.pad(data, ((0, d1p - d1), (0, 0), (0, 0)))
    cal_max_trunc = jnp.trunc(jnp.asarray(volume.cal_max, _f32))
    lut = tf.to_lut(lut_n) if lut_n else None
    id0 = jnp.zeros((), _f32)
    if packed and lut_n:
        vol_rows = pack_lut_grid(data_p, lut_n, cal_max_trunc, zpack)
        # id0 stays 0: the off-volume LUT index
        nyg = zpack[2]
        block_rows = block_x * nyg
    elif packed:
        vol_rows, id0 = pack_material_grid(data_p, tf, cal_max_trunc, zpack)
        nyg = zpack[2]
        block_rows = block_x * nyg
    else:
        block_rows = block_x * d2
        vol_rows = jnp.zeros((d1p * d2, 128), _f32)
        vol_rows = vol_rows.at[:, :d3].set(data_p.reshape(d1p * d2, d3))
    assert vol_rows.shape[0] == nxb * block_rows, (
        vol_rows.shape, nxb, block_rows)

    occ, nb = brick_occupancy(data, tf, cal_max_trunc, lut=lut,
                              brick=brick)

    ms_rows = None
    ms_brm = 0
    ms_q = None
    if lit:
        from . import phong

        lg = light if light is not None else phong.default_light()
        if config.lighting:
            mgrid, sgrid = bake_light_grids(data, config, lg,
                                            -camera.front)
        else:
            mgrid = jnp.ones(volume.dims, _f32)
            sgrid = jnp.zeros(volume.dims, _f32)
        if config.scattering:
            sgrid = sgrid + bake_scatter_grid(
                data, tf, config, lg, camera.front,
                cal_max_trunc, cal_max_trunc)
        ms_rows, ms_q, nzr_ms = pack_ms_grid(mgrid, sgrid, d1p)
        ms_brm = block_x * d2 * nzr_ms
        assert ms_rows.shape[0] == nxb * ms_brm, (
            ms_rows.shape, nxb, ms_brm)

    if lut is not None:
        alpha0 = lut[0, 3]  # idx(vn=0) = 0
    else:
        alpha0 = tf.classify(jnp.zeros((), _f32))[3]
    if config.density_scale != 1.0:
        alpha0 = jnp.clip(alpha0 * np.float32(config.density_scale), 0.0, 1.0)

    extra_args = []
    extra_specs_static = []
    extra_specs_prefetch = []
    if lut is not None:
        nl = lut.shape[0]
        rl = -(-nl // 128)
        lut_rows = jnp.zeros((_pad_to(4 * rl, 8), 128), _f32)
        for c in range(4):
            col = jnp.zeros((rl * 128,), _f32).at[:nl].set(lut[:, c])
            lut_rows = lut_rows.at[c * rl:(c + 1) * rl, :].set(
                col.reshape(rl, 128))
        extra_args.append(lut_rows)
        extra_specs_static.append(
            pl.BlockSpec((lut_rows.shape[0], 128), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM))
        extra_specs_prefetch.append(
            pl.BlockSpec((lut_rows.shape[0], 128),
                         lambda i, j, k, vis_s, eff_s: (0, 0),
                         memory_space=pltpu.VMEM))

    L = float(max(volume.dims))
    n = float(2**volume.octree_depth)
    box_lo = [max(0.0, (L / 2 - dim / 2) / L) - 0.5 for dim in volume.dims]
    box_hi = [min(1.0, (L / 2 + dim / 2) / L + 1.0 / n) - 0.5
              for dim in volume.dims]
    scal = _scal_vector(camera, config, cal_max_trunc, early_eps, alpha0,
                        box_lo, box_hi, id0, x_offset, s_start, 0)
    if lit:
        # [32..35]: (M, S) dequantization affine (pack_ms_grid)
        scal = jnp.concatenate(
            [scal] + [jnp.asarray(v, _f32).reshape(1) for v in ms_q])

    base_kernel = functools.partial(
        _march_kernel,
        dims=volume.dims,
        depth=volume.octree_depth,
        num_intervals=tf.num_intervals,
        width=w,
        height=h,
        spr=s_count,
        conic=False,
        density_scale=float(config.density_scale),
        nbricks=nb,
        zpack=zpack,
        tile=tile,
        local_width=w_local,
        slab_x=block_x,
        hbm_mode=True,
        lut_n=lut_n,
        pack_bits=16 if (packed and lut_n) else 4,
        lut_packed=bool(packed and lut_n),
        ms_stream=lit,
        ms_nzr=nzr_ms,
        ms_brm=ms_brm,
        brick=brick,
    )

    base_in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
        pl.BlockSpec(memory_space=pltpu.SMEM),  # occupancy bricks
    ]
    out_shape = [jax.ShapeDtypeStruct((ntx, nty, rt, 128), _f32)
                 for _ in range(4)]

    if use_vis:
        vis, eff = _streamed_visibility(
            camera, config, volume.dims, volume.octree_depth, occ, nb,
            block_x, nxb, tile, alpha0,
            [jnp.asarray(v, _f32) for v in box_lo],
            [jnp.asarray(v, _f32) for v in box_hi])

        def kernel(vis_ref, eff_ref, *args):
            del eff_ref  # consumed by the volume index map only
            base_kernel(*args, vis_ref=vis_ref)

        if remap_dma:
            # invisible (tile, block) steps remap to the previous visible
            # block so consecutive equal indices elide the HBM->VMEM copy.
            # (Measured SLOWER on-chip than fetching every block — the
            # remap defeats the pipeline's lookahead; kept for A/B runs.)
            def vol_map(i, j, k, vis_s, eff_s):
                return (eff_s[(i * nty + j) * nxb + k], 0)
        else:
            def vol_map(i, j, k, vis_s, eff_s):
                return (k, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # vis bitmap + effective-block remap
            grid=(ntx, nty, nxb),
            in_specs=base_in_specs + [
                pl.BlockSpec((block_rows, 128), vol_map,
                             memory_space=pltpu.VMEM)]
            + extra_specs_prefetch,  # [LUT rows]
            out_specs=[
                pl.BlockSpec((1, 1, rt, 128),
                             lambda i, j, k, vis_s, eff_s: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(4)
            ],
        )
        cr, cg, cb, t = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(vis, eff, scal, tf.lower, tf.upper, tf.colors, occ, vol_rows,
          *extra_args)
    elif manual:
        # one invocation per tile; the kernel streams blocks itself with
        # double-buffered DMA (see _march_kernel manual_stream).
        bext = streamed_block_extents(
            occ, nb, volume.dims, volume.octree_depth, block_x, nxb,
            alpha0)

        ms_in = ([pl.BlockSpec(memory_space=pl.ANY)] if lit else [])
        ms_scratch = ([
            pltpu.VMEM((2, ms_brm, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ] if lit else [])
        ms_args = ([ms_rows] if lit else [])
        if manual_block_major:
            # grid (1,): ONE invocation; blocks outer (each DMA'd once),
            # tiles inner, per-tile (C, T) state in the flat VMEM outputs
            srows = _pad_to(ntx * nty * rt, 8)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(1,),
                in_specs=base_in_specs + [
                    pl.BlockSpec(memory_space=pl.ANY)]  # volume in HBM
                + [pl.BlockSpec((a.shape[0], 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for a in extra_args]  # [LUT rows]
                + ms_in
                + [pl.BlockSpec(memory_space=pltpu.SMEM)],  # extents
                out_specs=[
                    pl.BlockSpec((srows, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(4)
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, block_rows, 128), vol_rows.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ] + ms_scratch,
            )
            cr, cg, cb, t = pl.pallas_call(
                functools.partial(base_kernel, manual_stream=True,
                                  mbm=True, nxb=nxb),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((srows, 128), _f32)
                           for _ in range(4)],
                interpret=interpret,
            )(scal, tf.lower, tf.upper, tf.colors, occ, vol_rows,
              *extra_args, *ms_args, bext)
            # flat rows [lin * rt + r] -> the (ntx, nty, rt, 128) layout
            # the shared unpack expects
            cr, cg, cb, t = (
                a[: ntx * nty * rt].reshape(ntx, nty, rt, 128)
                for a in (cr, cg, cb, t))
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(ntx, nty),
                in_specs=base_in_specs + [
                    pl.BlockSpec(memory_space=pl.ANY)]  # volume in HBM
                + [pl.BlockSpec((a.shape[0], 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
                   for a in extra_args]  # [LUT rows]
                + ms_in  # [(M, S) rows stay in HBM too]
                + [pl.BlockSpec(memory_space=pltpu.SMEM)],  # block extents
                out_specs=[
                    pl.BlockSpec((1, 1, rt, 128),
                                 lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(4)
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, block_rows, 128), vol_rows.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ] + ms_scratch,
            )
            cr, cg, cb, t = pl.pallas_call(
                functools.partial(base_kernel, manual_stream=True,
                                  nxb=nxb),
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=interpret,
            )(scal, tf.lower, tf.upper, tf.colors, occ, vol_rows,
              *extra_args, *ms_args, bext)
    elif block_major:
        # block OUTERMOST: the volume block index changes only when grid
        # dim 0 advances, so Pallas's consecutive-index elision copies
        # each block exactly once per frame; per-tile (C, T) accumulators
        # persist in the VMEM scratch across the sweep
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nxb, ntx, nty),
            in_specs=base_in_specs + [
                pl.BlockSpec((block_rows, 128), lambda k, i, j: (k, 0),
                             memory_space=pltpu.VMEM)]
            + extra_specs_static,  # [LUT rows] (index map ignores args)
            out_specs=[
                pl.BlockSpec((1, 1, rt, 128), lambda k, i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(4)
            ],
            scratch_shapes=[
                pltpu.VMEM((ntx * nty * 4 * rt, 128), _f32)],
        )
        cr, cg, cb, t = pl.pallas_call(
            functools.partial(base_kernel, block_major=True),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(scal, tf.lower, tf.upper, tf.colors, occ, vol_rows, *extra_args)
    else:
        # no prefetch args at all: the static index map keeps the DMA
        # pipeline's lookahead fully effective
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ntx, nty, nxb),
            in_specs=base_in_specs + [
                pl.BlockSpec((block_rows, 128), lambda i, j, k: (k, 0),
                             memory_space=pltpu.VMEM)]
            + extra_specs_static,  # [LUT rows]
            out_specs=[
                pl.BlockSpec((1, 1, rt, 128), lambda i, j, k: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(4)
            ],
        )
        cr, cg, cb, t = pl.pallas_call(
            base_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(scal, tf.lower, tf.upper, tf.colors, occ, vol_rows, *extra_args)

    def unpack(a):
        a = a.reshape(ntx, nty, tpx, tpy)
        a = a.transpose(0, 2, 1, 3).reshape(ntx * tpx, nty * tpy)
        return a[:w_local, :h]

    t2 = unpack(t)
    if segment:
        c3 = jnp.stack([unpack(c) for c in (cr, cg, cb)], axis=-1)
        return c3, t2[..., None]
    bg = jnp.asarray(config.background, _f32)
    rgb = [unpack(c) + t2 * bg[i] for i, c in enumerate((cr, cg, cb))]
    return jnp.stack(rgb + [jnp.ones((w_local, h), _f32)], axis=-1)
