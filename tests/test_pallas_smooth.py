"""Fused smooth-mode diff kernels (ops/pallas_smooth.py) vs the XLA scan:
values + TF-color/bound/volume gradients (VERDICT round-2 item 4).

Interpret mode on the CPU test mesh; the same code compiles for TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumerenderingproject_tpu import (
    Camera,
    RenderConfig,
    default_transfer_function,
    make_volume,
)
from volumerenderingproject_tpu.models.raycast import render_vrc
from volumerenderingproject_tpu.ops.pallas_smooth import (
    render_vrc_smooth_pallas,
)
from volumerenderingproject_tpu.utils.config import Interp


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    vol = make_volume(
        rng.uniform(0.0, 255.0, size=(9, 11, 10)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=18, height=13, samples_per_ray=30,
                       interp=Interp.TRILINEAR, tf_sharpness=60.0)
    target = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(18, 13, 4)).astype(np.float32))
    return vol, tf, cam, cfg, target


def _grads(render_fn, scene_):
    vol, tf, cam, cfg, target = scene_

    def loss(colors, lower, upper, data):
        tf2 = dataclasses.replace(
            tf, colors=colors, lower=lower, upper=upper)
        v2 = dataclasses.replace(vol, data=data)
        img = render_fn(v2, tf2, cam, cfg)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    return jax.grad(loss, argnums=(0, 1, 2, 3))(
        tf.colors, tf.lower, tf.upper, vol.data)


def test_smooth_forward_matches_xla(scene):
    vol, tf, cam, cfg, _ = scene
    want = np.asarray(render_vrc(vol, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_smooth_pallas(vol, tf, cam, cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_smooth_grads_match_xla(scene):
    """Color, bound, AND volume-field gradients through the fused
    kernels + trilinear-adjoint splat == jax.grad through the XLA scan."""
    gp = _grads(
        lambda v, t, c, f: render_vrc_smooth_pallas(
            v, t, c, f, interpret=True), scene)
    gx = _grads(
        lambda v, t, c, f: render_vrc(v, t, c, f, mode="fast"), scene)
    names = ("colors", "lower", "upper", "volume")
    for name, a, b in zip(names, gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(
            a, b, rtol=5e-3, atol=scale * 1e-4, err_msg=name)
        assert np.abs(b).max() > 0.0, f"{name} grads vacuous"


def test_smooth_conic(scene):
    vol, tf, cam, cfg, target = scene
    cfg_c = cfg.replace(conic=True)
    want = np.asarray(render_vrc(vol, tf, cam, cfg_c, mode="fast"))
    got = np.asarray(
        render_vrc_smooth_pallas(vol, tf, cam, cfg_c, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss(fn):
        def g(data):
            v2 = dataclasses.replace(vol, data=data)
            img = fn(v2)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        return g

    gp = np.asarray(jax.grad(loss(
        lambda v: render_vrc_smooth_pallas(
            v, tf, cam, cfg_c, interpret=True)))(vol.data))
    gx = np.asarray(jax.grad(loss(
        lambda v: render_vrc(v, tf, cam, cfg_c, mode="fast")))(vol.data))
    np.testing.assert_allclose(
        gp, gx, rtol=5e-3, atol=(np.abs(gx).max() + 1e-12) * 1e-4)


def test_smooth_density_field_fit_step(scene):
    """One adam step of a density-field fit through the fused kernels
    reduces the loss (the full on-chip convergence run lives in
    benchmarks/tpu_round4_job2.py)."""
    import optax

    vol, tf, cam, cfg, _ = scene
    target = render_vrc(vol, tf, cam, cfg, mode="fast")
    rng = np.random.default_rng(3)
    data0 = jnp.asarray(
        np.asarray(vol.data)
        + rng.normal(0, 25, np.asarray(vol.data).shape).astype(np.float32))

    def loss(data):
        v2 = dataclasses.replace(vol, data=jnp.clip(data, 0.0, 255.0))
        img = render_vrc_smooth_pallas(v2, tf, cam, cfg, interpret=True)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    opt = optax.adam(2.0)
    state = opt.init(data0)
    l0, g = jax.value_and_grad(loss)(data0)
    up, state = opt.update(g, state, data0)
    data1 = optax.apply_updates(data0, up)
    l1 = loss(data1)
    assert float(l1) < float(l0), (float(l0), float(l1))


def test_smooth_fit_routes_through_kernel(scene, monkeypatch):
    """diff/fit.py routes smooth-mode fits to the fused path when
    eligible (checked by spying on the entry point; on the CPU test mesh
    eligibility is False, so the route is exercised via the predicate)."""
    from volumerenderingproject_tpu.ops import pallas_smooth

    vol, tf, cam, cfg, _ = scene
    # CPU backend -> ineligible (kernel needs the TPU backend)
    assert not pallas_smooth.smooth_pallas_eligible(vol, tf, cfg)
    # but all static conditions other than the backend hold
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pallas_smooth.smooth_pallas_eligible(vol, tf, cfg)
    assert not pallas_smooth.smooth_pallas_eligible(
        vol, tf, cfg.replace(interp=Interp.NEAREST))
    assert not pallas_smooth.smooth_pallas_eligible(
        vol, tf, cfg.replace(lighting=True))


def test_smooth_packed10_forward_and_grads():
    """The 10-bit packed smooth mode (z > 128, VERDICT r3 item 4):
    forward within the quantization bound of the XLA trilinear render,
    and colors/bounds/volume gradients consistent with jax.grad through
    an identically-quantized XLA forward (the fused kernels optimize the
    quantized forward model exactly)."""
    import dataclasses

    from volumerenderingproject_tpu.models.raycast import render_vrc
    from volumerenderingproject_tpu.ops.pallas_smooth import (
        render_vrc_smooth_pallas,
        smooth_packed_geometry,
    )
    from volumerenderingproject_tpu.utils.config import Interp

    rng = np.random.default_rng(47)
    volume = make_volume(
        rng.uniform(0.0, 255.0, size=(10, 8, 140)).astype(np.float32))
    assert smooth_packed_geometry(volume.dims) is not None
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=16, height=12, samples_per_ray=24,
                       interp=Interp.TRILINEAR, tf_sharpness=40.0)
    target = jnp.asarray(
        rng.uniform(0, 1, size=(16, 12, 4)).astype(np.float32))

    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(render_vrc_smooth_pallas(
        volume, tf, cam, cfg, interpret=True))
    # 10-bit quantization of the intensities: vn error <= ~5e-4, then
    # through sharpness-40 sigmoids -> per-channel output bound ~2e-2
    np.testing.assert_allclose(got, want, atol=2e-2)

    # gradients: compare against an XLA forward over the SAME quantized
    # volume (the model the kernels optimize); tolerances are then pure
    # float-reassociation scale
    q_min = float(volume.data.min())
    step = (float(volume.data.max()) - q_min) / 1023.0
    dq = np.clip(np.round(
        (np.asarray(volume.data) - q_min) / step), 0, 1023) * step + q_min
    vol_q = dataclasses.replace(
        volume, data=jnp.asarray(dq.astype(np.float32)))

    def loss_p(colors, lower, upper, data):
        tf2 = dataclasses.replace(tf, colors=colors, lower=lower,
                                  upper=upper)
        v2 = dataclasses.replace(volume, data=data)
        img = render_vrc_smooth_pallas(v2, tf2, cam, cfg, interpret=True,
                                       early_eps=0.0)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    def loss_x(colors, lower, upper, data):
        tf2 = dataclasses.replace(tf, colors=colors, lower=lower,
                                  upper=upper)
        v2 = dataclasses.replace(vol_q, data=data)
        img = render_vrc(v2, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(
        tf.colors, tf.lower, tf.upper, volume.data)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(
        tf.colors, tf.lower, tf.upper, vol_q.data)
    for nm, a, b in zip(("colors", "lower", "upper", "volume"), gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=6e-3,
                                   err_msg=nm)
    assert float(np.abs(np.asarray(gx[3])).max()) > 0.0


def test_no_volume_grad_mode_matches():
    """volume_grad=False (round-4 VERDICT item 10): identical forward and
    identical TF color/bound gradients, with the adjoint splat never
    built (FitParams-style TF/bound-only fits)."""
    import dataclasses

    import jax

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.ops.pallas_smooth import (
        render_vrc_smooth_pallas,
    )
    from volumerenderingproject_tpu.utils.config import Interp

    rng = np.random.default_rng(7)
    volume = make_volume(
        rng.uniform(0, 255, size=(9, 11, 10)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=18, height=13, samples_per_ray=30,
                       interp=Interp.TRILINEAR, tf_sharpness=60.0)
    target = jnp.asarray(
        rng.uniform(0, 1, size=(18, 13, 4)).astype(np.float32))

    def loss(colors, lower, upper, volume_grad):
        tf2 = dataclasses.replace(tf, colors=colors, lower=lower,
                                  upper=upper)
        img = render_vrc_smooth_pallas(
            volume, tf2, cam, cfg, interpret=True, early_eps=0.0,
            volume_grad=volume_grad)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g_full = jax.grad(loss, argnums=(0, 1, 2))(
        tf.colors, tf.lower, tf.upper, True)
    g_nv = jax.grad(loss, argnums=(0, 1, 2))(
        tf.colors, tf.lower, tf.upper, False)
    for a, b in zip(g_full, g_nv):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    f1 = np.asarray(render_vrc_smooth_pallas(
        volume, tf, cam, cfg, interpret=True, volume_grad=False))
    f2 = np.asarray(render_vrc_smooth_pallas(
        volume, tf, cam, cfg, interpret=True))
    np.testing.assert_array_equal(f1, f2)
