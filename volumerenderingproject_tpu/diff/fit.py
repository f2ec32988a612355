"""Differentiable-rendering optimization: fit TF / density to target images.

The reference has no training loop (SURVEY.md: "no autodiff — all of that is
the new framework's mandate").  This module provides the canonical use case:
given target renders, optimize transfer-function colors (and optionally a
global density scale) by gradient descent through the renderer.

Single-device and sharded (mesh) variants share one loss; under a mesh the
renderer runs through shard_map (parallel/render_dist.py) and XLA inserts
the gradient all-reduce over the rays axis when differentiating.

Checkpointing via orbax (the reference persists nothing but an in-memory
camera preset, myApp.cu:1160-1186).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ingest.volume import Volume
from ..scene.camera import Camera
from ..scene.transfer_function import TransferFunction
from ..utils.config import RenderConfig
from ..models import raycast

_f32 = jnp.float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FitParams:
    """Optimizable render parameters.

    The full parameter set named by BASELINE.json's north star: transfer
    function (colors and, in smooth mode, interval bounds), density, and
    lighting.  ``tf_lower``/``tf_upper``/``light`` default to ``None``
    (excluded from the optimizable set; ``None`` is an empty pytree so
    optax simply skips them).  Bounds gradients are nonzero only through
    the smooth classify (``config.interp = TRILINEAR``) — the reference's
    piecewise-constant table (TransferFunction.cu:19-23) has zero bound
    gradients a.e., so fitting bounds *requires* the smooth relaxation.
    ``light`` is an ops.phong.Light; its gradients flow through the fused
    baked-light kernels when eligible (ops/pallas_march_vjp) and through
    the XLA scan otherwise.
    """

    tf_colors: jnp.ndarray  # [K, 4]
    density_scale: jnp.ndarray  # scalar
    tf_lower: Optional[jnp.ndarray] = None  # [K] (smooth-mode bound fits)
    tf_upper: Optional[jnp.ndarray] = None  # [K]
    light: Optional[Any] = None  # ops.phong.Light

    @staticmethod
    def init(
        tf: TransferFunction,
        *,
        fit_bounds: bool = False,
        light=None,
    ) -> "FitParams":
        return FitParams(
            tf_colors=tf.colors,
            density_scale=jnp.asarray(1.0, _f32),
            tf_lower=tf.lower if fit_bounds else None,
            tf_upper=tf.upper if fit_bounds else None,
            light=light,
        )


def _apply_params(
    tf: TransferFunction, params: FitParams
) -> TransferFunction:
    return TransferFunction(
        lower=tf.lower if params.tf_lower is None else params.tf_lower,
        upper=tf.upper if params.tf_upper is None else params.tf_upper,
        colors=params.tf_colors,
        hg_g=tf.hg_g,
    )


def render_loss(
    params: FitParams,
    tf: TransferFunction,
    volume: Volume,
    camera: Camera,
    target: jnp.ndarray,
    config: RenderConfig,
    mesh=None,
) -> jnp.ndarray:
    """MSE between the differentiable render and the target image."""
    tf2 = _apply_params(tf, params)
    density = jnp.clip(params.density_scale, 0.0, None)
    if mesh is None:
        img = _render_with_density(
            volume, tf2, camera, config, density, params.light)
    else:
        from ..parallel.render_dist import render_vrc_sharded

        # fold the density knob into the TF alphas so the sharded path
        # trains it identically to the single-device path
        tf3 = TransferFunction(
            lower=tf2.lower,
            upper=tf2.upper,
            colors=tf2.colors.at[:, 3].mul(density),
            hg_g=tf2.hg_g,
        )
        # differentiable=True: per-device work units run the custom_vjp
        # segment kernels when eligible (plain a1 on rays/samples axes,
        # optional baked lighting with trainable light params), so the
        # sharded fit keeps single-chip kernel speed; ineligible configs
        # (volume slabs, trilinear modes, LUT, scattering) differentiate
        # through the XLA scan segments.  Light and bound gradients
        # all-reduce over the mesh exactly like the colors (XLA inserts
        # the psum when transposing shard_map).
        img = render_vrc_sharded(volume, tf3, camera, config, mesh,
                                 differentiable=True, light=params.light)
    return jnp.mean((img[..., :3] - target[..., :3]) ** 2)


def _render_with_density(volume, tf, camera, config, density, light=None):
    # scale TF alphas by the (traced) density knob, then render
    tf2 = TransferFunction(
        lower=tf.lower,
        upper=tf.upper,
        colors=tf.colors.at[:, 3].mul(density),
        hg_g=tf.hg_g,
    )
    from ..utils.config import Algorithm

    if config.algorithm is Algorithm.TEST:
        # a5 fits optimize the a5 forward model (fused diff kernels when
        # eligible, the XLA scan otherwise)
        from ..ops.pallas_a5 import (
            a5_diff_pallas_eligible,
            a5_diff_streamed_eligible,
            render_test_pallas_diff,
            render_test_pallas_diff_streamed,
        )

        if light is None and a5_diff_pallas_eligible(volume, tf2, config):
            return render_test_pallas_diff(volume, tf2, camera, config)
        if light is None and a5_diff_streamed_eligible(volume, tf2, config):
            # beyond-VMEM a5 training: the 4-bit id grid streams per
            # x-block through the custom_vjp core (forward once,
            # backward twice) — 512^3-class a5 fits leave the XLA scan
            return render_test_pallas_diff_streamed(
                volume, tf2, camera, config)
        return raycast.render_test(
            volume, tf2, camera, config, mode="fast", light=light)
    from ..ops.pallas_march_vjp import (
        diff_pallas_eligible,
        diff_pallas_light_eligible,
        render_vrc_pallas_diff,
    )

    if volume.channels > 1:
        # 4-D multichannel fits run fused (round-5): the TF alpha column
        # trains at kernel speed (rgb is data-derived — zero cotangents)
        from ..ops.pallas_march_vjp import (
            diff_pallas_mc_eligible,
            render_vrc_pallas_diff_multichannel,
        )

        if light is None and diff_pallas_mc_eligible(volume, tf2, config):
            return render_vrc_pallas_diff_multichannel(
                volume, tf2, camera, config)
        return raycast.render_vrc(
            volume, tf2, camera, config, mode="fast", light=light)
    if config.scattering:
        # scattering-mode fits run fused (round-4 VERDICT item 7): the
        # additive-slot bake + tangent calls keep the dT_light/d alpha
        # chain exact; traced lights fall back to the XLA scan
        from ..ops.pallas_march_vjp import (
            diff_pallas_scatter_eligible,
            render_vrc_pallas_diff_scatter,
        )

        if diff_pallas_scatter_eligible(volume, tf2, config, light):
            return render_vrc_pallas_diff_scatter(
                volume, tf2, camera, config, light=light)
        return raycast.render_vrc(
            volume, tf2, camera, config, mode="fast", light=light)
    if light is not None:
        # optimizable light: fused baked-light kernels when eligible
        # (dL/dlight via tangent forward calls), XLA Phong scan otherwise
        if diff_pallas_light_eligible(volume, tf2, config):
            return render_vrc_pallas_diff(
                volume, tf2, camera, config, light=light)
        return raycast.render_vrc(
            volume, tf2, camera, config, mode="fast", light=light)
    from ..ops.pallas_smooth import (
        render_vrc_smooth_pallas,
        smooth_pallas_eligible,
    )

    if smooth_pallas_eligible(volume, tf2, config):
        # fused smooth-mode kernels: TF color + bound gradients at kernel
        # speed (ops/pallas_smooth.py); early_eps pinned to 0 — the
        # smooth backward re-marches all chunks, so a nonzero forward eps
        # would make gradients eps-inconsistent.  volume_grad=False
        # (round-4 VERDICT item 10): FitParams has no volume field, so
        # the scatter-bound adjoint splat — the ~6 ns/index floor of
        # full smooth steps — is never built; volume-FIELD fits call
        # render_vrc_smooth_pallas directly with the default.
        return render_vrc_smooth_pallas(
            volume, tf2, camera, config, early_eps=0.0,
            volume_grad=False)
    if diff_pallas_eligible(volume, tf2, config):
        # fused Pallas forward+backward (ops/pallas_march_vjp.py); the
        # alpha-column density fold above routes d/d density by chain rule
        return render_vrc_pallas_diff(volume, tf2, camera, config)
    from ..ops.pallas_march_vjp import (
        diff_pallas_streamed_eligible,
        render_vrc_pallas_diff_streamed,
    )

    if diff_pallas_streamed_eligible(volume, tf2, config):
        # beyond-VMEM training (round-4 VERDICT item 1b): the manual-DMA
        # streamed custom_vjp core — forward streams each x-block once,
        # backward twice; 512^3-class fits leave the XLA gather floor
        return render_vrc_pallas_diff_streamed(volume, tf2, camera, config)
    return raycast.render_vrc(volume, tf2, camera, config, mode="fast")


def make_train_step(
    tf: TransferFunction,
    config: RenderConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
):
    """Build a jitted train step: (params, opt_state, volume, camera, target)
    -> (params, opt_state, loss)."""

    def step(params, opt_state, volume, camera, target):
        loss, grads = jax.value_and_grad(render_loss)(
            params, tf, volume, camera, target, config, mesh
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def fit_transfer_function(
    volume: Volume,
    camera: Camera,
    target: jnp.ndarray,
    tf: TransferFunction,
    config: RenderConfig,
    *,
    steps: int = 100,
    learning_rate: float = 1e-2,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    fit_bounds: bool = False,
    light=None,
) -> Tuple[FitParams, list]:
    """Optimize TF colors + density (and optionally interval bounds and
    light parameters) against a target image.

    ``fit_bounds=True`` adds tf_lower/tf_upper to the optimizable set
    (meaningful with ``config.interp = TRILINEAR``, the smooth classify);
    ``light`` (an ops.phong.Light) adds the 10 light parameters.

    ``resume=True`` restores the latest checkpoint in ``checkpoint_dir``
    (params AND optimizer state, so the continued trajectory is identical
    to an uninterrupted run) and continues until ``steps`` total steps."""
    params = FitParams.init(tf, fit_bounds=fit_bounds, light=light)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    start = 0
    if resume and checkpoint_dir:
        latest = latest_checkpoint_step(checkpoint_dir)
        if latest is not None:
            params, opt_state = load_checkpoint(
                checkpoint_dir, latest, opt_state_like=opt_state)
            start = latest
    train_step = make_train_step(tf, config, optimizer, mesh)

    losses = []
    for i in range(start, steps):
        params, opt_state, loss = train_step(
            params, opt_state, volume, camera, target
        )
        losses.append(float(loss))
        if checkpoint_dir and checkpoint_every and (i + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_dir, i + 1, params, opt_state)
    return params, losses


# -- checkpoint / resume -----------------------------------------------------


def save_checkpoint(directory: str, step: int, params: FitParams,
                    opt_state=None) -> None:
    """Persist params (and optionally the optax state) at ``step``."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    # drop the optional fields that are not being fitted (None is an empty
    # pytree; orbax round-trips are cleaner without the keys entirely)
    pdict = {
        k: v
        for k, v in dataclasses.asdict(params).items()
        if v is not None
    }
    state = {"params": pdict}
    if opt_state is not None:
        import jax as _jax

        state["opt"] = {
            f"l{i}": x for i, x in enumerate(_jax.tree.leaves(opt_state))
        }
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def latest_checkpoint_step(directory: str) -> Optional[int]:
    import os
    import re

    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(directory)
        if (m := re.fullmatch(r"step_(\d+)", d))
    ]
    return max(steps) if steps else None


def load_checkpoint(directory: str, step: int, opt_state_like=None):
    """Restore a checkpoint.  Without ``opt_state_like``: -> FitParams
    (params only, also reads round-1-format checkpoints).  With it (a
    pytree of the optimizer state's structure/shapes): ->
    (FitParams, opt_state)."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(path)
    p = restored.get("params", restored)  # round-1 files stored flat
    light = None
    if p.get("light") is not None:
        from ..ops.phong import Light

        light = Light(**{k: jnp.asarray(v) for k, v in p["light"].items()})
    params = FitParams(
        tf_colors=jnp.asarray(p["tf_colors"]),
        density_scale=jnp.asarray(p["density_scale"]),
        tf_lower=(None if p.get("tf_lower") is None
                  else jnp.asarray(p["tf_lower"])),
        tf_upper=(None if p.get("tf_upper") is None
                  else jnp.asarray(p["tf_upper"])),
        light=light,
    )
    if opt_state_like is None:
        return params
    import jax as _jax

    treedef = _jax.tree.structure(opt_state_like)
    n = len(_jax.tree.leaves(opt_state_like))
    leaves = [jnp.asarray(restored["opt"][f"l{i}"]) for i in range(n)]
    return params, _jax.tree.unflatten(treedef, leaves)
