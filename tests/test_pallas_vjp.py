"""Differentiable fused Pallas march (ops/pallas_march_vjp.py) vs jax.grad
through the XLA scan renderer — values and TF-color/density gradients.

Runs the kernels in interpret mode on the CPU test mesh (conftest.py);
the same code compiles for TPU (exercised by bench/fit on hardware).
"""

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
from volumerenderingproject_tpu.ops.pallas_march_vjp import (
    render_vrc_pallas_diff,
)
from volumerenderingproject_tpu.scene.transfer_function import (
    TransferFunction,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    vol_np = rng.uniform(0.0, 255.0, size=(9, 11, 10)).astype(np.float32)
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=18, height=13, samples_per_ray=30)
    # a target that keeps every pixel's gradient non-trivial
    target = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(18, 13, 4)).astype(np.float32))
    return volume, tf, cam, cfg, target


def _with_colors(tf, colors):
    return TransferFunction(
        lower=tf.lower, upper=tf.upper, colors=colors, hg_g=tf.hg_g)


def test_diff_forward_matches_xla(scene):
    volume, tf, cam, cfg, _ = scene
    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_diff(volume, tf, cam, cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_color_grads_match_xla(scene):
    volume, tf, cam, cfg, target = scene

    def loss_pallas(colors):
        img = render_vrc_pallas_diff(
            volume, _with_colors(tf, colors), cam, cfg, interpret=True)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    def loss_xla(colors):
        img = render_vrc(
            volume, _with_colors(tf, colors), cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    l_p, g_p = jax.value_and_grad(loss_pallas)(tf.colors)
    l_x, g_x = jax.value_and_grad(loss_xla)(tf.colors)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6)
    assert float(jnp.max(jnp.abs(g_p))) > 0.0  # non-degenerate test


def test_density_grad_via_alpha_fold(scene):
    volume, tf, cam, cfg, target = scene

    def loss(density, render):
        colors = tf.colors.at[:, 3].mul(density)
        img = render(_with_colors(tf, colors))
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g_p = jax.grad(loss)(
        jnp.asarray(1.3, jnp.float32),
        lambda t2: render_vrc_pallas_diff(
            volume, t2, cam, cfg, interpret=True),
    )
    g_x = jax.grad(loss)(
        jnp.asarray(1.3, jnp.float32),
        lambda t2: render_vrc(volume, t2, cam, cfg, mode="fast"),
    )
    np.testing.assert_allclose(float(g_p), float(g_x), rtol=1e-4)
    assert abs(float(g_x)) > 0.0


def test_color_grads_conic(scene):
    volume, tf, cam, cfg, target = scene
    import dataclasses

    cfg_c = dataclasses.replace(cfg, conic=True)

    def loss(colors, render):
        img = render(_with_colors(tf, colors))
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g_p = jax.grad(loss)(
        tf.colors,
        lambda t2: render_vrc_pallas_diff(
            volume, t2, cam, cfg_c, interpret=True),
    )
    g_x = jax.grad(loss)(
        tf.colors,
        lambda t2: render_vrc(volume, t2, cam, cfg_c, mode="fast"),
    )
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6)


def test_packed_diff_values_and_grads(scene):
    """Packed material-grid mode (z > 128): value + color grads vs the XLA
    scan — the MNI-1mm-class geometry that round 1's diff kernel rejected."""
    rng = np.random.default_rng(21)
    volume = make_volume(
        rng.uniform(0.0, 255.0, size=(8, 10, 140)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=16, height=8, samples_per_ray=20)
    target = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(16, 8, 4)).astype(np.float32))

    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_diff(volume, tf, cam, cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss(render):
        def f(colors):
            img = render(_with_colors(tf, colors))
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)
        return f

    g_pallas = np.asarray(jax.grad(loss(
        lambda tf2: render_vrc_pallas_diff(
            volume, tf2, cam, cfg, interpret=True)))(tf.colors))
    g_xla = np.asarray(jax.grad(loss(
        lambda tf2: render_vrc(volume, tf2, cam, cfg, mode="fast")))(
            tf.colors))
    assert np.abs(g_xla).sum() > 0
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-7)


def test_static_density_fold(scene):
    """config.density_scale != 1 now folds into the alpha column inside
    render_vrc_pallas_diff (round 1 rejected it)."""
    volume, tf, cam, cfg, target = scene
    cfg_d = cfg.replace(density_scale=0.6)
    want = np.asarray(render_vrc(volume, tf, cam, cfg_d, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_diff(volume, tf, cam, cfg_d, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss(render):
        def f(colors):
            img = render(_with_colors(tf, colors))
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)
        return f

    g_pallas = np.asarray(jax.grad(loss(
        lambda tf2: render_vrc_pallas_diff(
            volume, tf2, cam, cfg_d, interpret=True)))(tf.colors))
    g_xla = np.asarray(jax.grad(loss(
        lambda tf2: render_vrc(volume, tf2, cam, cfg_d, mode="fast")))(
            tf.colors))
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-7)


def test_wide_tf_table_grads(scene):
    """K = 12 intervals (> the old 8 cap) exercises the 16-row gradient
    register."""
    volume, _, cam, cfg, target = scene
    rng = np.random.default_rng(5)
    k = 12
    lo = np.sort(rng.uniform(0.0, 0.9, k)).astype(np.float32)
    hi = np.clip(lo + rng.uniform(0.05, 0.3, k).astype(np.float32), 0, 1.0)
    lo[0], hi[0] = 0.0, 1.0  # interval 0 spans everything (reference style)
    colors = rng.uniform(0.0, 1.0, (k, 4)).astype(np.float32)
    colors[0, 3] = 0.0  # transparent base
    tf = TransferFunction(
        lower=jnp.asarray(lo), upper=jnp.asarray(hi),
        colors=jnp.asarray(colors), hg_g=jnp.zeros((k,), jnp.float32))

    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_diff(volume, tf, cam, cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss(render):
        def f(colors):
            img = render(_with_colors(tf, colors))
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)
        return f

    g_pallas = np.asarray(jax.grad(loss(
        lambda tf2: render_vrc_pallas_diff(
            volume, tf2, cam, cfg, interpret=True)))(tf.colors))
    g_xla = np.asarray(jax.grad(loss(
        lambda tf2: render_vrc(volume, tf2, cam, cfg, mode="fast")))(
            tf.colors))
    assert np.abs(g_xla).sum() > 0
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-7)


def test_color_grads_with_baked_lighting(scene):
    """config.lighting through the diff kernels: forward parity and
    dL/d(colors) vs jax.grad of the XLA lit scan (the baked (M, S) grids
    are volume-only, so color cotangents gain exactly a per-sample M)."""
    volume, tf, cam, cfg, target = scene
    cfg_lit = cfg.replace(lighting=True)

    want = np.asarray(render_vrc(volume, tf, cam, cfg_lit, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_diff(volume, tf, cam, cfg_lit, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss_pallas(colors):
        img = render_vrc_pallas_diff(
            volume, _with_colors(tf, colors), cam, cfg_lit, interpret=True)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    def loss_xla(colors):
        img = render_vrc(
            volume, _with_colors(tf, colors), cam, cfg_lit, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    l_p, g_p = jax.value_and_grad(loss_pallas)(tf.colors)
    l_x, g_x = jax.value_and_grad(loss_xla)(tf.colors)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-3, atol=1e-6)
    assert float(jnp.max(jnp.abs(g_p))) > 0.0

    # lit grads must differ from unlit grads (shading is really in play)
    def loss_unlit(colors):
        img = render_vrc_pallas_diff(
            volume, _with_colors(tf, colors), cam, cfg, interpret=True)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g_u = jax.grad(loss_unlit)(tf.colors)
    assert float(jnp.max(jnp.abs(g_p - g_u))) > 1e-6


def test_streamed_diff_matches_xla(scene):
    """Beyond-VMEM training tier (round-4 VERDICT item 1b): the manual-DMA
    streamed custom_vjp core — forward values AND TF-color grads match
    the XLA scan across multi-block decompositions, both march
    directions, and the front.x == 0 clamp edge."""
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_streamed,
    )

    _, tf, _, _, _ = scene
    rng = np.random.default_rng(11)
    volume = make_volume(
        rng.uniform(0.0, 255.0, size=(24, 10, 9)).astype(np.float32))
    cfg = RenderConfig(width=16, height=6, samples_per_ray=32)
    target = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(16, 6, 4)).astype(np.float32))

    for campos in ((0.4, 0.3, 0.9), (-0.6, 0.2, 0.7), (0.9, 0.1, 0.05),
                   (0.0, 0.95, 0.1)):
        cam = Camera.initial(position=campos)

        def loss_xla(colors):
            img = render_vrc(
                volume, _with_colors(tf, colors), cam, cfg, mode="fast")
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        def loss_streamed(colors):
            img = render_vrc_pallas_diff_streamed(
                volume, _with_colors(tf, colors), cam, cfg,
                interpret=True, block_x=8)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(render_vrc_pallas_diff_streamed(
            volume, tf, cam, cfg, interpret=True, block_x=8))
        np.testing.assert_allclose(got, want, atol=1e-5)
        g1 = np.asarray(jax.grad(loss_xla)(tf.colors))
        g2 = np.asarray(jax.grad(loss_streamed)(tf.colors))
        assert np.abs(g1).sum() > 0
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-6)


def test_streamed_diff_alpha0_outside_samples(scene):
    """TF(0).alpha > 0: out-of-volume samples clamp into the boundary
    blocks and scatter into TF(0)'s interval — gradient parity holds."""
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_streamed,
    )

    _, tf0, _, _, _ = scene
    colors = np.asarray(tf0.colors).copy()
    colors[0, 3] = 0.1
    tf = _with_colors(tf0, jnp.asarray(colors))
    rng = np.random.default_rng(3)
    volume = make_volume(
        rng.uniform(0.0, 255.0, size=(24, 10, 9)).astype(np.float32))
    cfg = RenderConfig(width=16, height=6, samples_per_ray=32)
    target = jnp.zeros((16, 6, 4), jnp.float32)
    cam = Camera.initial(position=(0.4, 0.3, 0.9))

    def loss(colors, streamed):
        tf2 = _with_colors(tf, colors)
        if streamed:
            img = render_vrc_pallas_diff_streamed(
                volume, tf2, cam, cfg, interpret=True, block_x=8)
        else:
            img = render_vrc(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss)(tf.colors, False))
    g2 = np.asarray(jax.grad(loss)(tf.colors, True))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-6)


def test_scatter_diff_matches_xla(scene):
    """Scattering-mode fits run fused (round-4 VERDICT item 7): TF-color
    gradients through the scatter core match jax.grad through the XLA
    scan INCLUDING the dT_light/d alpha transmittance chain (the bake's
    additive slot depends on the alpha column; tangent forward calls
    restore that chain exactly)."""
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_scatter,
    )

    volume, tf0, cam, cfg0, target = scene
    hg = np.asarray(tf0.hg_g).copy()
    hg[:] = ([0.0, 0.3, -0.2, 0.5] * 4)[: hg.shape[0]]
    tf = TransferFunction(tf0.lower, tf0.upper, tf0.colors,
                          jnp.asarray(hg))
    for kw in (dict(scattering=True),
               dict(scattering=True, lighting=True)):
        cfg = cfg0.replace(**kw)

        def loss(colors, fused):
            tf2 = _with_colors(tf, colors)
            if fused:
                img = render_vrc_pallas_diff_scatter(
                    volume, tf2, cam, cfg, interpret=True)
            else:
                img = render_vrc(volume, tf2, cam, cfg, mode="fast")
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(render_vrc_pallas_diff_scatter(
            volume, tf, cam, cfg, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)
        g1 = np.asarray(jax.grad(loss)(tf.colors, False))
        g2 = np.asarray(jax.grad(loss)(tf.colors, True))
        assert np.abs(g1).sum() > 0
        np.testing.assert_allclose(
            g2, g1, rtol=1e-4, atol=float(np.abs(g1).max()) * 1e-4)


def test_lut_diff_matches_xla(scene):
    """Dense-LUT classify trains fused (round-4 VERDICT item 7): the
    forward reads the (linear-in-colors) LUT rows; the backward scatters
    into the interval table from the quantized vn — grads match jax.grad
    through the XLA LUT scan."""
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff,
    )

    volume, tf, cam, cfg0, target = scene
    for kw in (dict(tf_lut=64), dict(tf_lut=256),
               dict(tf_lut=64, lighting=True)):
        cfg = cfg0.replace(**kw)

        def loss(colors, fused):
            tf2 = _with_colors(tf, colors)
            if fused:
                img = render_vrc_pallas_diff(
                    volume, tf2, cam, cfg, interpret=True)
            else:
                img = render_vrc(volume, tf2, cam, cfg, mode="fast")
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(render_vrc_pallas_diff(
            volume, tf, cam, cfg, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)
        g1 = np.asarray(jax.grad(loss)(tf.colors, False))
        g2 = np.asarray(jax.grad(loss)(tf.colors, True))
        assert np.abs(g1).sum() > 0
        np.testing.assert_allclose(
            g2, g1, rtol=1e-4, atol=float(np.abs(g1).max()) * 1e-4)


def test_multichannel_diff_matches_xla(scene):
    """4-D multichannel fits run fused (round-5): TF alpha-column
    gradients match jax.grad through the XLA multichannel scan, and the
    rgb columns' gradients are structurally zero on both paths (rgb is
    data-derived)."""
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_multichannel,
    )

    _, tf, cam, cfg, _ = scene
    rng = np.random.default_rng(13)
    for nc in (2, 3):
        volume = make_volume(
            rng.uniform(0, 255, size=(9, 11, 10, nc)).astype(np.float32))
        target = jnp.asarray(
            rng.uniform(0, 1, size=(cfg.width, cfg.height, 4))
            .astype(np.float32))

        def loss(colors, fused):
            tf2 = _with_colors(tf, colors)
            if fused:
                img = render_vrc_pallas_diff_multichannel(
                    volume, tf2, cam, cfg, interpret=True)
            else:
                img = render_vrc(volume, tf2, cam, cfg, mode="fast")
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(render_vrc_pallas_diff_multichannel(
            volume, tf, cam, cfg, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)
        g1 = np.asarray(jax.grad(loss)(tf.colors, False))
        g2 = np.asarray(jax.grad(loss)(tf.colors, True))
        assert np.abs(g1[:, 3]).sum() > 0
        assert np.abs(g1[:, :3]).max() == 0.0  # rgb is data-derived
        np.testing.assert_allclose(
            g2, g1, rtol=1e-4, atol=float(np.abs(g1).max()) * 1e-4)


def test_scatter_diff_density_scale_and_hg(scene):
    """Round-5 review regressions: (a) a static density_scale != 1 must
    not double-apply in the scatter bake's T_light (the driver pre-folds
    it into the alpha column; the bake runs at density 1); (b) tf.hg_g
    receives exact cotangents through the phase term (tangent probes).
    The empty interval's folded alpha sits exactly at the clip boundary,
    where max/min tie-breaking makes subgradient choices differ ~1e-3
    relative between the two compositions — a.e.-equal, tolerated."""
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_scatter,
    )

    volume, tf0, cam, cfg0, target = scene
    hg = np.asarray(tf0.hg_g).copy()
    hg[:] = ([0.0, 0.3, -0.2, 0.5] * 4)[: hg.shape[0]]
    tf = TransferFunction(tf0.lower, tf0.upper, tf0.colors,
                          jnp.asarray(hg))
    cfg = cfg0.replace(scattering=True, density_scale=1.7)

    def loss(colors, hgv, fused):
        tf2 = TransferFunction(tf.lower, tf.upper, colors, hgv)
        if fused:
            img = render_vrc_pallas_diff_scatter(
                volume, tf2, cam, cfg, interpret=True)
        else:
            img = render_vrc(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(render_vrc_pallas_diff_scatter(
        volume, tf, cam, cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
    gc1, gh1 = jax.grad(loss, argnums=(0, 1))(tf.colors, tf.hg_g, False)
    gc2, gh2 = jax.grad(loss, argnums=(0, 1))(tf.colors, tf.hg_g, True)
    np.testing.assert_allclose(
        np.asarray(gc2), np.asarray(gc1), rtol=2e-3,
        atol=float(np.abs(np.asarray(gc1)).max()) * 1e-4)
    assert np.abs(np.asarray(gh1)).max() > 0
    np.testing.assert_allclose(
        np.asarray(gh2), np.asarray(gh1), rtol=1e-4,
        atol=float(np.abs(np.asarray(gh1)).max()) * 1e-4)
