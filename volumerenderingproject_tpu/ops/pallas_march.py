"""Fused Pallas TPU ray-march kernel for the a1/VRC pipeline.

One kernel fuses the reference's three-kernel pipeline (ray setup ->
per-sample classify -> composite, kernel.cu:20-225) per tile of rays:
positions, octree-equivalent NN indexing, transfer-function classification,
and front-to-back (C, T) accumulation all stay in registers/VMEM — no
materialized W*H*spr sample buffer (the reference allocates 3.92 GB at
700^2x500, kernel.cu:1036-1043) and no HBM round trips between stages.

Layout: the volume is staged in VMEM as rows [d1*d2 (padded to 8), 128]
with z on lanes (requires d3 <= 128; larger volumes fall back to the XLA
scan renderer, models/raycast.py).  Rays are processed in tiles of
8 x 128 = 1024; each tile marches all samples in a while_loop with
early ray termination (stop when the tile's max transmittance drops below
``early_eps`` — the optimization the reference's back-to-front order
cannot do).

The voxel fetch uses the only data-parallel lookup TPU hardware offers:
per-lane dynamic gather (``take_along_axis`` axis=1).  Each candidate row in
the tile's [rmin, rmax] row-range is broadcast and lane-gathered by the
per-sample z index, selected where the sample's row matches.  The row-range
loop bound is dynamic (scalar min/max of the tile's row indices), so cost
tracks ray coherence.  Planned upgrades (see PLAN in this docstring) keep
the same structure: per-chunk box staging via async DMA + grouped sublane
dynamic-gather + occupancy-bitmap skipping via PrefetchScalarGridSpec.

NOTE on this environment: the axon TPU relay executes Pallas kernels in an
emulation path (~55 us per loop iteration measured), so this kernel cannot
win benchmarks here; it is validated for correctness (vs the XLA renderer
and the loop oracle) and designed for real-TPU deployment.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ingest.volume import Volume
from ..scene.camera import Camera
from ..scene.transfer_function import TransferFunction
from ..utils.config import RenderConfig
from ..models import raycast

_f32 = jnp.float32

TILE_S = 8  # sublanes (rays)
TILE_L = 128  # lanes (rays)
TILE = TILE_S * TILE_L


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _march_kernel(
    # SMEM scalar params
    scalars_ref,  # [8]: ds, clip, cal_max, bg_r, bg_g, bg_b, early_eps, spr
    tf_lower_ref,  # [K] SMEM
    tf_upper_ref,  # [K] SMEM
    tf_colors_ref,  # [K, 4] SMEM
    # VMEM tiles
    ox_ref, oy_ref, oz_ref,  # [1, 8, 128] ray origins
    dx_ref, dy_ref, dz_ref,  # [1, 8, 128] ray directions
    vol_ref,  # [R, 128] volume rows (z on lanes)
    out_r_ref, out_g_ref, out_b_ref, out_t_ref,  # [1, 8, 128]
    *,
    dims: Tuple[int, int, int],
    depth: int,
    num_intervals: int,
):
    d1, d2, d3 = dims
    L = float(max(dims))
    n = float(2**depth)

    ds = scalars_ref[0]
    clip = scalars_ref[1]
    cal_max = scalars_ref[2]
    early_eps = scalars_ref[6]
    spr = scalars_ref[7].astype(jnp.int32)

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    def classify(v_norm):
        """TransferFunction scan: inclusive bounds, last match wins
        (TransferFunction.cu:46-55); unrolled over the K intervals."""
        chans = []
        for c in range(4):
            acc = jnp.full((TILE_S, TILE_L), tf_colors_ref[0, c], _f32)
            for k in range(num_intervals):
                match = (v_norm >= tf_lower_ref[k]) & (v_norm <= tf_upper_ref[k])
                acc = jnp.where(match, tf_colors_ref[k, c], acc)
            chans.append(acc)
        return chans  # r, g, b, a as [8, 128]

    def fetch(row, lane, valid):
        """out[s,l] = vol[row[s,l], lane[s,l]] via broadcast + lane-gather
        over the tile's dynamic row range."""
        row = jnp.where(valid, row, 0)
        lane = jnp.where(valid, lane, 0)
        rmin = jnp.min(row)
        rmax = jnp.max(row)

        def body(j, acc):
            rowv = vol_ref[pl.ds(j, 1), :]  # [1, 128]
            bc = jnp.broadcast_to(rowv, (TILE_S, TILE_L))
            vals = jnp.take_along_axis(bc, lane, axis=1)
            return jnp.where(row == j, vals, acc)

        out = jnp.zeros((TILE_S, TILE_L), _f32)
        out = jax.lax.fori_loop(rmin, rmax + 1, body, out)
        return jnp.where(valid, out, 0.0)

    def step_fn(carry):
        i, cr, cg, cb, t = carry
        ti = i.astype(_f32) * ds + clip
        px = (ox + ti * dx) + 0.5  # modelAux (+0.5), kernel.cu:1050
        py = (oy + ti * dy) + 0.5
        pz = (oz + ti * dz) + 0.5

        inside = (
            (px >= 0.0) & (px < 1.0)
            & (py >= 0.0) & (py < 1.0)
            & (pz >= 0.0) & (pz < 1.0)
        )
        # dyadic snap -> centered voxel index (Octree.cu:85-108 semantics)
        resx = (jnp.floor(px * n) / n) * L
        resy = (jnp.floor(py * n) / n) * L
        resz = (jnp.floor(pz * n) / n) * L
        okx = (resx >= L / 2.0 - d1 / 2.0) & (resx < L / 2.0 + d1 / 2.0)
        oky = (resy >= L / 2.0 - d2 / 2.0) & (resy < L / 2.0 + d2 / 2.0)
        okz = (resz >= L / 2.0 - d3 / 2.0) & (resz < L / 2.0 + d3 / 2.0)
        valid = inside & okx & oky & okz
        ix = jnp.trunc((resx + d1 / 2.0) - L / 2.0).astype(jnp.int32)
        iy = jnp.trunc((resy + d2 / 2.0) - L / 2.0).astype(jnp.int32)
        iz = jnp.trunc((resz + d3 / 2.0) - L / 2.0).astype(jnp.int32)

        v = fetch(ix * d2 + iy, iz, valid)
        v = jnp.maximum(v, 0.0)  # descent drops negatives (Octree.cu:172-177)
        v = jnp.where(valid, v, 0.0)

        sr, sg, sb, sa = classify(v / cal_max)
        # front-to-back transmittance accumulation (ops/composite.py)
        cr = cr + t * sa * sr
        cg = cg + t * sa * sg
        cb = cb + t * sa * sb
        t = t * (1.0 - sa)
        return i + 1, cr, cg, cb, t

    def cond_fn(carry):
        i, _, _, _, t = carry
        return (i < spr) & (jnp.max(t) > early_eps)

    zeros = jnp.zeros((TILE_S, TILE_L), _f32)
    ones = jnp.ones((TILE_S, TILE_L), _f32)
    _, cr, cg, cb, t = jax.lax.while_loop(
        cond_fn, step_fn, (jnp.asarray(0, jnp.int32), zeros, zeros, zeros, ones)
    )
    out_r_ref[0] = cr
    out_g_ref[0] = cg
    out_b_ref[0] = cb
    out_t_ref[0] = t


def render_vrc_pallas(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    early_eps: float = 1e-3,
    interpret: bool = False,
) -> jnp.ndarray:
    """a1/VRC render via the fused Pallas kernel -> [W, H, 4].

    Matches ``render_vrc(..., mode="fast")`` up to early-termination epsilon
    (set ``early_eps=0`` for exact agreement).  Requires dims[2] <= 128.
    """
    d1, d2, d3 = volume.dims
    if d3 > TILE_L:
        raise ValueError(
            f"pallas path needs z dim <= {TILE_L} (got {d3}); "
            "use the XLA renderer for larger volumes"
        )
    if volume.channels != 1:
        raise ValueError("pallas path supports single-channel volumes")

    w, h = config.width, config.height
    n_rays = w * h
    n_pad = _pad_to(n_rays, TILE)
    n_tiles = n_pad // TILE

    origins = raycast.ray_origins(camera, config).reshape(n_rays, 3)
    dirs = raycast.primary_ray_dirs(camera, config).reshape(n_rays, 3)

    def tile_arr(a):
        a = jnp.pad(a, ((0, n_pad - n_rays),))
        return a.reshape(n_tiles, TILE_S, TILE_L)

    comps = [tile_arr(origins[:, c]) for c in range(3)] + [
        tile_arr(dirs[:, c]) for c in range(3)
    ]

    # volume rows [pad8(d1*d2), 128] with z on lanes
    rows = _pad_to(d1 * d2, TILE_S)
    vol_rows = jnp.zeros((rows, TILE_L), _f32)
    vol_rows = vol_rows.at[: d1 * d2, :d3].set(volume.data.reshape(d1 * d2, d3))

    scalars = jnp.asarray(
        [
            config.sample_distance,
            config.front_clip,
            # int-truncated like the a1 kernel param (kernel.cu:42)
            float(int(jnp.asarray(volume.cal_max))),
            config.background[0],
            config.background[1],
            config.background[2],
            early_eps,
            float(config.samples_per_ray),
        ],
        _f32,
    )

    kernel = functools.partial(
        _march_kernel,
        dims=volume.dims,
        depth=volume.octree_depth,
        num_intervals=tf.num_intervals,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf lower
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf upper
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf colors
        ]
        + [
            pl.BlockSpec(
                (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(6)
        ]
        + [
            pl.BlockSpec(
                (rows, TILE_L), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(4)
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), _f32) for _ in range(4)
    ]
    cr, cg, cb, t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, tf.lower, tf.upper, tf.colors, *comps, vol_rows)

    bg = jnp.asarray(config.background, _f32)
    rgb = jnp.stack(
        [
            cr.reshape(-1)[:n_rays] + t.reshape(-1)[:n_rays] * bg[0],
            cg.reshape(-1)[:n_rays] + t.reshape(-1)[:n_rays] * bg[1],
            cb.reshape(-1)[:n_rays] + t.reshape(-1)[:n_rays] * bg[2],
            jnp.ones(n_rays, _f32),
        ],
        axis=-1,
    )
    return rgb.reshape(w, h, 4)
