"""Volumetric lighting: Phong gradient shading + Henyey-Greenstein phase.

The reference *declares* a radiative-transfer API but every body is a stub
returning 0 (C16, LightInteraction.cpp:5-80); the only working piece is an
isotropic HG phase function with g = 0 (myApp.cu:1721-1728).  BASELINE.json
names "Phong/gradient lighting" as a first-class capability of the new
framework, so this module implements it for real:

  * Normals: the normalized density gradient (ops/conv3d gradient filters),
    sampled per ray sample.
  * Phong: ambient + diffuse + specular against a directional light,
    applied to the classified sample color before compositing.
  * HG phase: the full Henyey-Greenstein distribution with per-material g
    (the reference stores g on Material but never uses it; Material.h:14-23).

Everything is differentiable — light parameters join the optimizable set.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_f32 = jnp.float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Light:
    """Directional light + Phong coefficients."""

    direction: jnp.ndarray  # [3], world space, need not be normalized
    color: jnp.ndarray  # [3]
    ambient: jnp.ndarray  # scalar
    diffuse: jnp.ndarray  # scalar
    specular: jnp.ndarray  # scalar
    shininess: jnp.ndarray  # scalar


def default_light() -> Light:
    return Light(
        direction=jnp.asarray([0.5, 1.0, 0.75], _f32),
        color=jnp.asarray([1.0, 1.0, 1.0], _f32),
        ambient=jnp.asarray(0.35, _f32),
        diffuse=jnp.asarray(0.55, _f32),
        specular=jnp.asarray(0.25, _f32),
        shininess=jnp.asarray(16.0, _f32),
    )


def random_directions(key, n: int) -> jnp.ndarray:
    """n uniformly distributed unit vectors [n, 3] (the TPU-native
    counterpart of the reference's rejection-sampled getRandomDirection /
    initialize_random_directions, myApp.cu:1693-1710) — used for stochastic
    scattering directions with the HG phase function."""
    import jax

    v = jax.random.normal(key, (n, 3), _f32)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def henyey_greenstein(cos_theta: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """HG phase function p(cos θ; g) = (1-g²) / (4π (1+g²-2g cosθ)^{3/2}).

    g = 0 reduces to the isotropic 1/4π — exactly the reference's
    Henyey_Greenstein_Phaze_Function (myApp.cu:1721-1728).
    """
    g = jnp.asarray(g, _f32)
    denom = 1.0 + g * g - 2.0 * g * jnp.asarray(cos_theta, _f32)
    return (1.0 - g * g) / (4.0 * jnp.pi * jnp.maximum(denom, 1e-8) ** 1.5)


def phong_shade(
    rgb: jnp.ndarray,
    normal: jnp.ndarray,
    view_dir: jnp.ndarray,
    light: Light,
    grad_mag: jnp.ndarray | None = None,
    grad_threshold: float = 1e-3,
) -> jnp.ndarray:
    """Shade sample colors [..., 3] with normals [..., 3].

    ``view_dir`` points from the sample toward the camera ([..., 3] or [3]).
    Where the gradient magnitude is below ``grad_threshold`` (homogeneous
    media have no meaningful surface normal), shading falls back to the
    unshaded color.
    """
    l = light.direction / jnp.linalg.norm(light.direction)
    n = normal
    n_norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(n_norm, 1e-8)

    ndotl = jnp.abs(jnp.sum(n * l, axis=-1, keepdims=True))
    # Blinn-Phong half vector
    v = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8
    )
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    ndoth = jnp.abs(jnp.sum(n * h, axis=-1, keepdims=True))

    shaded = (
        light.ambient * rgb
        + light.diffuse * ndotl * rgb * light.color
        + light.specular * (ndoth**light.shininess) * light.color
    )
    mag = n_norm if grad_mag is None else grad_mag[..., None]
    w = jnp.clip(mag / grad_threshold, 0.0, 1.0)
    return w * shaded + (1.0 - w) * rgb
