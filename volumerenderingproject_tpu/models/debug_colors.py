"""Debug voxel colorers for the point-splat mode.

Vectorized ports of the reference's development fixtures
(myApp.cu:1319-1398): intensity-band false color (`niftiColorTest`),
intensity-green with axis-plane markers (`niftiColorTest2`, the one marked
"IN USE"), and the octant-colored sphere (`sphereTest`).  Each returns a
per-voxel RGBA array [N, 4] to pass to
``models.point_splat.render_points(..., rgba=...)`` in place of the
transfer-function colors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ingest.volume import Volume

_f32 = jnp.float32


def _grids(volume: Volume):
    d1, d2, d3 = volume.dims
    x = jax.lax.broadcasted_iota(jnp.int32, (d1, d2, d3), 0).reshape(-1)
    y = jax.lax.broadcasted_iota(jnp.int32, (d1, d2, d3), 1).reshape(-1)
    z = jax.lax.broadcasted_iota(jnp.int32, (d1, d2, d3), 2).reshape(-1)
    return x, y, z


def nifti_color_test(volume: Volume) -> jnp.ndarray:
    """Intensity-band false color (myApp.cu:1319-1338): six hand-picked
    bands over intensity/cal_max, transparent black elsewhere."""
    v = (volume.data if volume.channels == 1 else volume.data[..., 0])
    inten = v.reshape(-1) / volume.cal_max
    bands = [  # (lo, hi, rgba); hi exclusive except the last (<= 1.0)
        (0.1, 0.3, (0.1, 0.1, 0.1, 1.0)),
        (0.3, 0.4, (0.0, 0.0, 0.8, 1.0)),
        (0.4, 0.5, (0.8, 0.8, 0.4, 1.0)),
        (0.5, 0.6, (0.1, 0.5, 0.5, 1.0)),
        (0.6, 0.7, (0.5, 0.5, 0.5, 1.0)),
    ]
    rgba = jnp.zeros((inten.shape[0], 4), _f32)
    for lo, hi, c in bands:
        m = (inten >= lo) & (inten < hi)
        rgba = jnp.where(m[:, None], jnp.asarray(c, _f32), rgba)
    m = (inten >= 0.7) & (inten <= 1.0)
    rgba = jnp.where(m[:, None], jnp.asarray((0.9, 0.5, 0.5, 1.0), _f32),
                     rgba)
    return rgba


def nifti_color_test2(volume: Volume) -> jnp.ndarray:
    """Green-by-intensity with magenta/yellow/cyan x=0/y=0/z=0 planes
    (myApp.cu:1341-1360, marked IN USE upstream).  Note the reference's
    ``intensity * 255`` overflows [0,1] — replicated (GL clamps)."""
    v = (volume.data if volume.channels == 1 else volume.data[..., 0])
    inten = v.reshape(-1) / volume.cal_max
    x, y, z = _grids(volume)
    rgba = jnp.zeros((inten.shape[0], 4), _f32)
    g = jnp.clip(inten * 255.0, 0.0, 1.0)
    pos_m = (inten > 0.0)[:, None]
    rgba = jnp.where(
        pos_m,
        jnp.stack([jnp.zeros_like(g), g, jnp.zeros_like(g),
                   jnp.ones_like(g)], axis=-1),
        rgba)
    for axis, c in ((x, (1.0, 0.0, 1.0, 1.0)), (y, (1.0, 1.0, 0.0, 1.0)),
                    (z, (0.0, 1.0, 1.0, 1.0))):
        rgba = jnp.where((axis == 0)[:, None], jnp.asarray(c, _f32), rgba)
    return rgba


def sphere_octants(volume: Volume, background=(0.2, 0.2, 0.2)) -> jnp.ndarray:
    """Octant-colored inscribed sphere with inverted-background end caps
    (sphereTest myApp.cu:1363-1398)."""
    d1, d2, d3 = volume.dims
    x, y, z = _grids(volume)
    cx, cy, cz = d1 / 2.0, d2 / 2.0, d3 / 2.0
    r2 = (d1 / 2.0) ** 2
    xf, yf, zf = x.astype(_f32), y.astype(_f32), z.astype(_f32)
    inside = (xf - cx) ** 2 + (yf - cy) ** 2 + (zf - cz) ** 2 <= r2
    octant_colors = jnp.asarray([
        (0.0, 0.0, 0.0, 1.0),  # x<=,y<=,z<=
        (1.0, 1.0, 1.0, 1.0),  # x<=,y<=,z>
        (0.0, 1.0, 1.0, 1.0),  # x<=,y>,z<=
        (1.0, 0.0, 1.0, 1.0),  # x<=,y>,z>
        (1.0, 1.0, 0.0, 1.0),  # x>,y<=,z<=
        (0.0, 0.0, 1.0, 1.0),  # x>,y<=,z>
        (0.0, 1.0, 0.0, 1.0),  # x>,y>,z<=
        (1.0, 0.0, 0.0, 1.0),  # x>,y>,z>
    ], _f32)
    oct_id = (
        (xf > cx).astype(jnp.int32) * 4
        + (yf > cy).astype(jnp.int32) * 2
        + (zf > cz).astype(jnp.int32)
    )
    rgba = jnp.where(
        inside[:, None], jnp.take(octant_colors, oct_id, axis=0), 0.0)
    bg = jnp.asarray(background, _f32)
    cap = jnp.concatenate([1.0 - bg[:3], jnp.ones((1,), _f32)])
    caps = (z == 0) | (z == d3 - 1)
    return jnp.where(caps[:, None], cap, rgba)
