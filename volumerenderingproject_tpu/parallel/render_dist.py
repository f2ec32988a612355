"""Multi-device rendering with shard_map: ray DP + sample SP + volume slabs.

Design (SURVEY.md §2 parallelism mandate, §5 long-context analog):

  * ``rays`` axis: the pixel grid's x (column) dimension is block-sharded;
    forward needs zero communication (the reference's embarrassingly
    parallel pixel loop, kernel.cu:40-70, mapped onto devices instead of
    CUDA blocks).  Gradients all-reduce over this axis in backward — XLA
    inserts the psum when differentiating through shard_map.
  * ``samples`` axis: the sample (spr) axis is split into contiguous
    segments; each device folds its segment into a (C, T) pair and the
    pairs compose front-to-back with the associative over operator
    (ops/composite.segment_compose) after an all_gather along the axis —
    the renderer's exact analog of blockwise/ring attention.
  * ``volume`` axis: the voxel grid's x extent is block-sharded (volume
    slabs).  Every device marches all its rays' samples but classifies only
    samples landing in its slab (others are the over-identity, alpha = 0).
    Because an orthographic ray's x coordinate is monotone in t, each
    slab's samples form one contiguous run along the ray, so per-slab
    (C, T) pairs compose exactly in slab order — front-to-back order given
    by sign(front.x).  (Conic cameras whose rays disagree on sign(dir.x)
    are not supported on this axis.)

All three compose: mesh ("rays", "samples", "volume").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ingest.volume import Volume
from ..scene.camera import Camera
from ..scene.transfer_function import TransferFunction
from ..utils.config import RenderConfig
from ..models import raycast
from ..ops import composite as comp
from ..ops import sampling

_f32 = jnp.float32


def _fold_segments_front_to_back(segs_c, segs_t, reverse_pred):
    """Fold [K, ...] gathered segments with segment_compose; ``reverse_pred``
    (traced bool) flips the fold order (used for slab visibility order)."""
    k = segs_c.shape[0]
    seg = comp.segment_identity(segs_c.shape[1:-1])

    def body(i, seg):
        idx = jnp.where(reverse_pred, k - 1 - i, i)
        nxt = (
            jax.lax.dynamic_index_in_dim(segs_c, idx, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(segs_t, idx, 0, keepdims=False),
        )
        return comp.segment_compose(seg, nxt)

    return jax.lax.fori_loop(0, k, body, seg)


def render_vrc_sharded(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    *,
    remat: bool = True,
) -> jnp.ndarray:
    """Distributed a1/VRC render over a ("rays", "samples", "volume") mesh.

    The volume's data is expected replicated unless the mesh's "volume"
    axis is > 1, in which case data is x-slab-sharded by shard_map's
    in_spec.  Returns the full [W, H, 4] image (columns sharded over
    "rays" in the output sharding).
    """
    n_rays = mesh.shape["rays"]
    n_samp = mesh.shape["samples"]
    n_vol = mesh.shape["volume"]
    if config.width % n_rays:
        raise ValueError(f"width {config.width} % rays axis {n_rays} != 0")
    if config.samples_per_ray % n_samp:
        raise ValueError(
            f"spr {config.samples_per_ray} % samples axis {n_samp} != 0"
        )
    if volume.dims[0] % n_vol:
        raise ValueError(f"dim x {volume.dims[0]} % volume axis {n_vol} != 0")
    if n_vol > 1 and volume.channels > 1:
        raise NotImplementedError(
            "volume-axis sharding of multi-channel volumes is not supported "
            "yet; shard multi-channel renders over rays/samples instead"
        )
    if n_vol > 1 and config.conic:
        raise NotImplementedError(
            "volume-axis sharding requires a consistent slab visit order; "
            "conic rays can disagree on sign(dir.x) — use rays/samples axes"
        )
    from ..utils.config import Algorithm, Interp

    if config.algorithm is Algorithm.TEST and n_vol > 1:
        raise NotImplementedError(
            "a5/TEST sharding supports rays/samples axes (trilinear taps "
            "cross slab boundaries)"
        )
    if n_vol > 1 and (config.lighting or config.interp is not Interp.NEAREST):
        raise NotImplementedError(
            "volume-axis sharding supports the nearest-neighbor unlit path; "
            "use rays/samples axes for lighting or interpolation modes"
        )
    w_local = config.width // n_rays
    s_local = config.samples_per_ray // n_samp

    def tile_fn(vol_data, cal_max, tf_, cam):
        ri = jax.lax.axis_index("rays")
        si = jax.lax.axis_index("samples")
        vol_local = Volume(
            data=vol_data,
            cal_max=cal_max,
            cal_min=volume.cal_min,
            pixdim=volume.pixdim,
            dims=volume.dims,
            channels=volume.channels,
        )
        if n_vol == 1:
            from ..utils.config import Algorithm as _Alg

            segment_fn = (
                raycast.render_test_segment
                if config.algorithm is _Alg.TEST
                else raycast.render_vrc_segment
            )
            seg = segment_fn(
                vol_local,
                tf_,
                cam,
                config,
                x_offset=ri * w_local,
                local_width=w_local,
                s_start=si * s_local,
                s_count=s_local,
                remat=remat,
            )
        else:
            seg = _render_segment_volume_slab(
                vol_data,
                cal_max,
                tf_,
                cam,
                config,
                x_offset=ri * w_local,
                local_width=w_local,
                s_start=si * s_local,
                s_count=s_local,
                dims=volume.dims,
                depth=volume.octree_depth,
                remat=remat,
            )
            # compose slabs in visibility order: front.x >= 0 means rays
            # move toward +x, so slab 0 is nearest the camera.
            segs_c = jax.lax.all_gather(seg[0], "volume")
            segs_t = jax.lax.all_gather(seg[1], "volume")
            seg = _fold_segments_front_to_back(
                segs_c, segs_t, reverse_pred=cam.front[0] < 0
            )

        # compose sample segments front-to-back (device si=0 is nearest)
        segs_c = jax.lax.all_gather(seg[0], "samples")
        segs_t = jax.lax.all_gather(seg[1], "samples")
        seg = _fold_segments_front_to_back(
            segs_c, segs_t, reverse_pred=jnp.asarray(False)
        )
        return comp.segment_finalize(seg, jnp.asarray(config.background, _f32))

    vol_spec = P("volume") if n_vol > 1 else P()
    fn = shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(vol_spec, P(), P(), P()),
        out_specs=P("rays"),
        check_vma=False,
    )
    return fn(volume.data, volume.cal_max, tf, camera)


def _render_segment_volume_slab(
    vol_slab: jnp.ndarray,
    cal_max: jnp.ndarray,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    *,
    x_offset,
    local_width: int,
    s_start,
    s_count: int,
    dims: Tuple[int, int, int],
    depth: int,
    remat: bool,
):
    """March a ray/sample tile against one x-slab of the volume.

    Samples whose nearest voxel lies outside this slab classify as the
    over-identity (alpha 0 via intensity 0 -> TF interval 0; for TF tables
    whose interval 0 is not transparent this would be wrong, so we force the
    identity explicitly)."""
    vi = jax.lax.axis_index("volume")
    slab_x = vol_slab.shape[0]
    x0 = vi * slab_x

    origins = raycast.ray_origins(camera, config, x_offset, local_width)
    dirs = raycast.primary_ray_dirs(camera, config, x_offset, local_width)
    ds = jnp.asarray(config.sample_distance, _f32)
    clip = jnp.asarray(config.front_clip, _f32)
    slab_flat = vol_slab.reshape(-1) if vol_slab.ndim == 3 else vol_slab[..., 0].reshape(-1)

    def sample_rgba(i):
        t = i * ds + clip
        pos = origins + t * dirs
        p = pos + jnp.asarray(0.5, _f32)
        v, owned = sampling.octree_nn_sample_slab(
            slab_flat, dims, depth, p, x0, slab_x
        )
        # int-truncated cal_max: kernel.cu:42 `int max_intensity`
        rgba = tf.classify(v / jnp.trunc(cal_max))
        if config.density_scale != 1.0:
            a = jnp.clip(
                rgba[..., 3:4] * jnp.asarray(config.density_scale, _f32),
                0.0,
                1.0,
            )
            rgba = jnp.concatenate([rgba[..., :3], a], axis=-1)
        # identity (all-zero rgba) for samples another slab owns
        return jnp.where(owned[..., None], rgba, jnp.zeros_like(rgba))

    return raycast._march(
        sample_rgba,
        config,
        "segment",
        remat,
        shape=(local_width, config.height),
        s_start=s_start,
        s_count=s_count,
    )


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "remat")
)
def render_vrc_sharded_jit(
    volume: Volume,
    tf: TransferFunction,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    remat: bool = True,
) -> jnp.ndarray:
    return render_vrc_sharded(
        volume, tf, camera, config, mesh, remat=remat
    )
