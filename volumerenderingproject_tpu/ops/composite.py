"""Alpha compositing — the "over" operator in reference and associative forms.

The reference composites back-to-front with the over operator, seeded at the
background color, output alpha forced to 1 (blendSampleColors kernel.cu:194-225):

    F = background
    for i = spr-1 .. 0:  F.rgb = F.rgb * (1 - a_i) + c_i.rgb * a_i
    out = (F.rgb, 1)

Front-to-back transmittance form (mathematically identical, enables early
termination and O(1)-memory streaming):

    C = 0; T = 1
    for i = 0 .. spr-1:  C += T * a_i * c_i.rgb ; T *= (1 - a_i)
    out = (C + T * background.rgb, 1)

Segment form (associative — the renderer's analog of blockwise/ring attention,
used for sample-axis sharding across devices, SURVEY.md §5): a ray segment
reduces to (C_seg, T_seg); two adjacent segments compose front-to-back as

    C = C_a + T_a * C_b ;  T = T_a * T_b.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_f32 = jnp.float32


def over_step_btf(acc_rgb: jnp.ndarray, rgba: jnp.ndarray) -> jnp.ndarray:
    """One back-to-front over step: acc*(1-a) + c*a (kernel.cu:211-215)."""
    a = rgba[..., 3:4]
    return acc_rgb * (1.0 - a) + rgba[..., :3] * a


def composite_back_to_front(samples: jnp.ndarray, background) -> jnp.ndarray:
    """Composite materialized samples [..., S, 4] -> [..., 4], iterating
    i = S-1 .. 0 exactly like the reference kernel."""
    bg = jnp.asarray(background, _f32)
    batch = samples.shape[:-2]
    acc0 = jnp.broadcast_to(bg[..., :3], batch + (3,))

    def step(acc, rgba):
        return over_step_btf(acc, rgba), None

    # scan over the sample axis, reversed
    sw = jnp.moveaxis(samples, -2, 0)  # [S, ..., 4]
    acc, _ = jax.lax.scan(step, acc0, sw, reverse=True)
    alpha = jnp.ones(batch + (1,), _f32)
    return jnp.concatenate([acc, alpha], axis=-1)


def composite_front_to_back(samples: jnp.ndarray, background) -> jnp.ndarray:
    """Transmittance-form composite of materialized samples (same result)."""
    bg = jnp.asarray(background, _f32)
    batch = samples.shape[:-2]
    c0 = jnp.zeros(batch + (3,), _f32)
    t0 = jnp.ones(batch + (1,), _f32)

    def step(carry, rgba):
        c, t = carry
        a = rgba[..., 3:4]
        c = c + t * a * rgba[..., :3]
        t = t * (1.0 - a)
        return (c, t), None

    sw = jnp.moveaxis(samples, -2, 0)
    (c, t), _ = jax.lax.scan(step, (c0, t0), sw)
    rgb = c + t * bg[..., :3]
    alpha = jnp.ones(batch + (1,), _f32)
    return jnp.concatenate([rgb, alpha], axis=-1)


def segment_identity(batch_shape) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, T) identity element: C = 0, T = 1."""
    return (
        jnp.zeros(batch_shape + (3,), _f32),
        jnp.ones(batch_shape + (1,), _f32),
    )


def segment_update(carry, rgba):
    """Absorb one sample (front-to-back) into a (C, T) segment state."""
    c, t = carry
    a = rgba[..., 3:4]
    return (c + t * a * rgba[..., :3], t * (1.0 - a))


def segment_compose(front, back):
    """Compose two (C, T) segments, ``front`` closer to the camera."""
    cf, tf_ = front
    cb, tb = back
    return (cf + tf_ * cb, tf_ * tb)


def segment_finalize(seg, background) -> jnp.ndarray:
    """Resolve a (C, T) segment against the background; alpha forced to 1."""
    c, t = seg
    bg = jnp.asarray(background, _f32)
    rgb = c + t * bg[..., :3]
    alpha = jnp.ones(c.shape[:-1] + (1,), _f32)
    return jnp.concatenate([rgb, alpha], axis=-1)
