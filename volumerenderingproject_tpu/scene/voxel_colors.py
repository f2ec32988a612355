"""Voxel-cloud coloring schemes from the reference app (myApp.cu).

Used by the POINT/a0 pipeline's CPU voxel-color pass
(volumePrepareForPipeline / prepareVolumeColors, myApp.cu:1254-1316):

  * :func:`tf_colors`         — prepareVolumeColors: TF color per voxel
    (the scheme the app actually uses).
  * :func:`intensity_bands`   — niftiColorTest (myApp.cu:1319-1338):
    hardcoded intensity-band colors.
  * :func:`intensity_green`   — niftiColorTest2 (myApp.cu:1341-1360):
    green-scaled intensity with colored axis planes.

All vectorized over the whole volume (the reference loops per voxel on the
host at startup).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ingest.volume import Volume
from .transfer_function import TransferFunction

_f32 = jnp.float32


def tf_colors(volume: Volume, tf: TransferFunction) -> jnp.ndarray:
    """[X, Y, Z, 4] RGBA per voxel via the transfer function
    (prepareVolumeColors myApp.cu:1306-1312)."""
    data = volume.data if volume.channels == 1 else volume.data[..., 0]
    return tf.classify(data / volume.cal_max)


def intensity_bands(volume: Volume) -> jnp.ndarray:
    """niftiColorTest's hardcoded bands (myApp.cu:1325-1336); intensities
    outside every band are transparent black."""
    data = volume.data if volume.channels == 1 else volume.data[..., 0]
    v = data / volume.cal_max
    bands = [
        (0.1, 0.3, (0.1, 0.1, 0.1, 1.0)),
        (0.3, 0.4, (0.0, 0.0, 0.8, 1.0)),
        (0.4, 0.5, (0.8, 0.8, 0.4, 1.0)),
        (0.5, 0.6, (0.1, 0.5, 0.5, 1.0)),
        (0.6, 0.7, (0.5, 0.5, 0.5, 1.0)),
    ]
    out = jnp.zeros(v.shape + (4,), _f32)
    for lo, hi, c in bands:
        match = (v >= lo) & (v < hi)
        out = jnp.where(match[..., None], jnp.asarray(c, _f32), out)
    # last band is inclusive on both ends (myApp.cu:1335)
    match = (v >= 0.7) & (v <= 1.0)
    out = jnp.where(match[..., None], jnp.asarray((0.9, 0.5, 0.5, 1.0), _f32), out)
    return out


def intensity_green(volume: Volume) -> jnp.ndarray:
    """niftiColorTest2 (myApp.cu:1341-1360): green channel = intensity*255
    (the reference's unclamped quirk preserved), axis-zero planes painted
    magenta/yellow/cyan with x overriding y overriding z... reversed: the
    reference's later ifs win, so z==0 wins over y==0 over x==0."""
    data = volume.data if volume.channels == 1 else volume.data[..., 0]
    v = data / volume.cal_max
    out = jnp.zeros(v.shape + (4,), _f32)
    pos = v > 0.0
    green = jnp.stack(
        [jnp.zeros_like(v), v * 255.0, jnp.zeros_like(v), jnp.ones_like(v)],
        axis=-1,
    )
    out = jnp.where(pos[..., None], green, out)
    d1, d2, d3 = data.shape
    x = jax.lax.broadcasted_iota(jnp.int32, data.shape, 0)
    y = jax.lax.broadcasted_iota(jnp.int32, data.shape, 1)
    z = jax.lax.broadcasted_iota(jnp.int32, data.shape, 2)
    out = jnp.where((x == 0)[..., None], jnp.asarray((1.0, 0.0, 1.0, 1.0), _f32), out)
    out = jnp.where((y == 0)[..., None], jnp.asarray((1.0, 1.0, 0.0, 1.0), _f32), out)
    out = jnp.where((z == 0)[..., None], jnp.asarray((0.0, 1.0, 1.0, 1.0), _f32), out)
    return out
