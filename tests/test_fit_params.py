"""Lighting + TF-bound parameter gradients (VERDICT round-2 item 1).

BASELINE.json's north star names gradients w.r.t. transfer-function
parameters, density, AND lighting.  These tests cover:

  * light-parameter gradients through the fused baked-light kernels
    (ops/pallas_march_vjp._make_lit_core, interpret mode) vs jax.grad
    through the XLA Phong scan,
  * a fit that recovers a perturbed light (ambient/direction) and
    perturbed TF interval bounds (smooth mode),
  * sharded (mesh) light/bound gradients matching single-device.
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
from volumerenderingproject_tpu.diff.fit import (
    FitParams,
    fit_transfer_function,
    render_loss,
)
from volumerenderingproject_tpu.models.raycast import render_vrc
from volumerenderingproject_tpu.ops import phong
from volumerenderingproject_tpu.ops.pallas_march_vjp import (
    render_vrc_pallas_diff,
)
from volumerenderingproject_tpu.utils.config import Interp


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    vol_np = rng.uniform(0.0, 255.0, size=(9, 11, 10)).astype(np.float32)
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=18, height=13, samples_per_ray=30)
    target = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(18, 13, 4)).astype(np.float32))
    return volume, tf, cam, cfg, target


def _loss_of(img, target):
    return jnp.mean((img[..., :3] - target[..., :3]) ** 2)


def test_light_vec_roundtrip():
    lg = phong.default_light()
    v = phong.light_to_vec(lg)
    assert v.shape == (phong.N_LIGHT_PARAMS,)
    lg2 = phong.light_from_vec(v)
    for f in ("direction", "color", "ambient", "diffuse", "specular",
              "shininess"):
        np.testing.assert_allclose(
            np.asarray(getattr(lg, f)), np.asarray(getattr(lg2, f)))


def test_light_grads_fused_vs_xla(scene):
    """dL/d(light params) through the fused lit kernels == jax.grad
    through the XLA Phong scan (same math, baked per voxel)."""
    volume, tf, cam, cfg, target = scene

    def loss_pallas(lvec):
        lg = phong.light_from_vec(lvec)
        img = render_vrc_pallas_diff(
            volume, tf, cam, cfg, interpret=True, light=lg)
        return _loss_of(img, target)

    def loss_xla(lvec):
        lg = phong.light_from_vec(lvec)
        img = render_vrc(volume, tf, cam, cfg, mode="fast", light=lg)
        return _loss_of(img, target)

    lvec = phong.light_to_vec(phong.default_light())
    # make the light-vec traced (the fused path dispatches on tracer-ness)
    g_p = np.asarray(jax.jit(jax.grad(loss_pallas))(lvec))
    g_x = np.asarray(jax.grad(loss_xla)(lvec))
    # direction + ambient/diffuse/specular/shininess match elementwise;
    # tolerances cover float reassociation across the two pipelines
    keep = [0, 1, 2, 6, 7, 8, 9]
    np.testing.assert_allclose(g_p[keep], g_x[keep], rtol=2e-3, atol=2e-5)
    # the fused bake mean-projects the color, so per-channel color grads
    # redistribute symmetrically — their SUM is preserved exactly
    np.testing.assert_allclose(
        g_p[3:6].sum(), g_x[3:6].sum(), rtol=2e-3, atol=2e-5)
    assert np.any(np.abs(g_x) > 1e-6)  # the test is non-vacuous


def test_light_color_grads_symmetric(scene):
    """The fused bake collapses light color to its channel mean, so the
    three color gradients are equal — gradient descent preserves the
    uniformity the baked forward requires."""
    volume, tf, cam, cfg, target = scene

    def loss_pallas(lvec):
        lg = phong.light_from_vec(lvec)
        img = render_vrc_pallas_diff(
            volume, tf, cam, cfg, interpret=True, light=lg)
        return _loss_of(img, target)

    g = np.asarray(
        jax.jit(jax.grad(loss_pallas))(phong.light_to_vec(
            phong.default_light())))
    np.testing.assert_allclose(g[3], g[4], rtol=1e-6)
    np.testing.assert_allclose(g[3], g[5], rtol=1e-6)


def test_tf_color_grads_with_traced_light(scene):
    """Color gradients through the lit core match the XLA scan when the
    light is traced (the nested core vjp path)."""
    volume, tf, cam, cfg, target = scene
    lvec = phong.light_to_vec(phong.default_light())

    def loss_pallas(colors, lvec):
        tf2 = dataclasses.replace(tf, colors=colors)
        img = render_vrc_pallas_diff(
            volume, tf2, cam, cfg, interpret=True,
            light=phong.light_from_vec(lvec))
        return _loss_of(img, target)

    def loss_xla(colors, lvec):
        tf2 = dataclasses.replace(tf, colors=colors)
        img = render_vrc(volume, tf2, cam, cfg, mode="fast",
                         light=phong.light_from_vec(lvec))
        return _loss_of(img, target)

    g_p = np.asarray(jax.jit(jax.grad(loss_pallas))(tf.colors, lvec))
    g_x = np.asarray(jax.grad(loss_xla)(tf.colors, lvec))
    np.testing.assert_allclose(g_p, g_x, rtol=2e-4, atol=1e-6)


def test_render_loss_routes_light_and_bounds(scene):
    """render_loss exposes nonzero light gradients and, in smooth mode,
    nonzero bound gradients through FitParams."""
    volume, tf, cam, cfg, target = scene
    params = FitParams.init(tf, light=phong.default_light())
    g = jax.grad(render_loss)(params, tf, volume, cam, target, cfg)
    assert float(jnp.abs(g.light.ambient)) > 0.0
    assert g.tf_lower is None and g.tf_upper is None

    cfg_s = dataclasses.replace(cfg, interp=Interp.TRILINEAR)
    params_b = FitParams.init(tf, fit_bounds=True)
    g_b = jax.grad(render_loss)(params_b, tf, volume, cam, target, cfg_s)
    assert float(jnp.max(jnp.abs(g_b.tf_lower))) > 0.0
    assert float(jnp.max(jnp.abs(g_b.tf_upper))) > 0.0


def test_fit_recovers_perturbed_light(scene):
    """A fit from a perturbed light converges toward the target render's
    light (ambient + direction recovery through the XLA scan path)."""
    volume, tf, cam, cfg, _ = scene
    true_light = phong.default_light()
    target = render_vrc(volume, tf, cam, cfg, mode="fast",
                        light=true_light)

    start = dataclasses.replace(
        true_light,
        ambient=jnp.asarray(0.7, jnp.float32),
        diffuse=jnp.asarray(0.2, jnp.float32),
    )
    params, losses = fit_transfer_function(
        volume, cam, target, tf, cfg, steps=150, learning_rate=2e-2,
        light=start)
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])
    # ambient moved toward the true value
    a0 = abs(0.7 - float(true_light.ambient))
    a1 = abs(float(params.light.ambient) - float(true_light.ambient))
    assert a1 < 0.5 * a0, (a1, a0)


def test_fit_recovers_perturbed_bounds(scene):
    """Smooth-mode fit recovers perturbed TF interval bounds (the
    differentiable upgrade of the reference's static interval table,
    TransferFunction.cu:19-23)."""
    volume, tf, cam, cfg, _ = scene
    cfg_s = dataclasses.replace(
        cfg, interp=Interp.TRILINEAR, tf_sharpness=40.0)
    target = render_vrc(volume, tf, cam, cfg_s, mode="fast")

    tf_pert = dataclasses.replace(
        tf,
        lower=tf.lower + jnp.asarray([0.0, 0.06, -0.05, 0.04], jnp.float32),
        upper=tf.upper + jnp.asarray([0.0, -0.06, 0.05, -0.04], jnp.float32),
    )
    params, losses = fit_transfer_function(
        volume, cam, target, tf_pert, cfg_s, steps=80, learning_rate=5e-3,
        fit_bounds=True)
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])
    err0 = float(jnp.mean(jnp.abs(tf_pert.lower - tf.lower)))
    err1 = float(jnp.mean(jnp.abs(params.tf_lower - tf.lower)))
    assert err1 < err0, (err1, err0)


def test_sharded_light_grads_match_single_device(scene):
    """Light/bound/color gradients through the mesh (shard_map + psum)
    equal the single-device XLA gradients."""
    from jax.sharding import Mesh

    volume, tf, cam, cfg, target = scene
    devs = np.array(jax.devices()[:4]).reshape(2, 2, 1)
    mesh = Mesh(devs, ("rays", "samples", "volume"))
    cfg2 = dataclasses.replace(cfg, width=16, samples_per_ray=30)
    target2 = target[:16]
    params = FitParams.init(tf, light=phong.default_light())

    g_single = jax.grad(render_loss)(
        params, tf, volume, cam, target2, cfg2)
    g_mesh = jax.grad(render_loss)(
        params, tf, volume, cam, target2, cfg2, mesh)
    np.testing.assert_allclose(
        np.asarray(g_mesh.tf_colors), np.asarray(g_single.tf_colors),
        rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(phong.light_to_vec(g_mesh.light)),
        np.asarray(phong.light_to_vec(g_single.light)),
        rtol=2e-4, atol=1e-6)

    # smooth-mode interval-bound gradients shard identically too
    cfg_s = dataclasses.replace(cfg2, interp=Interp.TRILINEAR,
                                tf_sharpness=40.0)
    params_b = FitParams.init(tf, fit_bounds=True)
    gb_single = jax.grad(render_loss)(
        params_b, tf, volume, cam, target2, cfg_s)
    gb_mesh = jax.grad(render_loss)(
        params_b, tf, volume, cam, target2, cfg_s, mesh)
    for name in ("tf_lower", "tf_upper"):
        np.testing.assert_allclose(
            np.asarray(getattr(gb_mesh, name)),
            np.asarray(getattr(gb_single, name)),
            rtol=2e-4, atol=1e-6, err_msg=name)


def test_checkpoint_roundtrip_new_fields(tmp_path, scene):
    """save/load_checkpoint round-trips the new optional fields."""
    from volumerenderingproject_tpu.diff.fit import (
        load_checkpoint,
        save_checkpoint,
    )

    _, tf, _, _, _ = scene
    params = FitParams.init(
        tf, fit_bounds=True, light=phong.default_light())
    save_checkpoint(str(tmp_path), 3, params)
    back = load_checkpoint(str(tmp_path), 3)
    np.testing.assert_allclose(
        np.asarray(back.tf_lower), np.asarray(params.tf_lower))
    np.testing.assert_allclose(
        np.asarray(phong.light_to_vec(back.light)),
        np.asarray(phong.light_to_vec(params.light)))


def test_a5_fit_routes_to_a5_forward(scene):
    """A fit with config.algorithm = TEST optimizes the a5 forward model
    (the round-3 routing fix: fits previously always rendered a1)."""
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.utils.config import Algorithm

    volume, tf, cam, cfg, _ = scene
    cfg5 = dataclasses.replace(cfg, algorithm=Algorithm.TEST)
    # target rendered with perturbed colors; fit must converge toward it
    tf_true = dataclasses.replace(
        tf, colors=jnp.clip(tf.colors + 0.12, 0.0, 1.0))
    target = render_test(volume, tf_true, cam, cfg5, mode="fast")
    params, losses = fit_transfer_function(
        volume, cam, target, tf, cfg5, steps=40, learning_rate=2e-2)
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])
    # and the loss is measured against the a5 render, not a1
    img_fit = render_test(
        volume, dataclasses.replace(tf, colors=params.tf_colors),
        cam, cfg5, mode="fast")
    err_fit = float(jnp.mean((img_fit[..., :3] - target[..., :3]) ** 2))
    assert abs(err_fit - losses[-1]) < max(5e-3, 0.5 * losses[-1])


def test_mesh_kernel_fit_grads_match_single(scene):
    """The mesh x kernel fit path (VERDICT round-3 item 1): the exact
    loss composition diff/fit.render_loss builds for a mesh — density
    folded into the TF alpha column, traced colors + density + light —
    differentiated through the custom_vjp SEGMENT kernels
    (render_vrc_sharded differentiable=True) matches the single-device
    gradients.  On TPU, render_loss takes this path automatically
    (_diff_segment_eligible); here the kernels run in interpret mode."""
    from jax.sharding import Mesh
    from volumerenderingproject_tpu.parallel.render_dist import (
        render_vrc_sharded,
    )
    from volumerenderingproject_tpu.scene.transfer_function import (
        TransferFunction,
    )

    volume, tf, cam, cfg, target = scene
    devs = np.array(jax.devices()[:4]).reshape(2, 2, 1)
    mesh = Mesh(devs, ("rays", "samples", "volume"))
    cfg2 = dataclasses.replace(cfg, width=16, samples_per_ray=30)
    target2 = target[:16]
    lvec0 = phong.light_to_vec(phong.default_light())

    def loss_mesh(colors, density, lvec):
        tf3 = TransferFunction(
            lower=tf.lower, upper=tf.upper,
            colors=colors.at[:, 3].mul(jnp.clip(density, 0.0, None)),
            hg_g=tf.hg_g)
        img = render_vrc_sharded(
            volume, tf3, cam, dataclasses.replace(cfg2, lighting=True),
            mesh, differentiable=True, use_pallas=True,
            pallas_interpret=True, light=phong.light_from_vec(lvec))
        return _loss_of(img, target2)

    def loss_single(colors, density, lvec):
        tf3 = TransferFunction(
            lower=tf.lower, upper=tf.upper,
            colors=colors.at[:, 3].mul(jnp.clip(density, 0.0, None)),
            hg_g=tf.hg_g)
        img = render_vrc(
            volume, tf3, cam, dataclasses.replace(cfg2, lighting=True),
            mode="fast", light=phong.light_from_vec(lvec))
        return _loss_of(img, target2)

    args = (tf.colors, jnp.asarray(1.0, jnp.float32), lvec0)
    gm = jax.grad(loss_mesh, argnums=(0, 1, 2))(*args)
    gs = jax.grad(loss_single, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(
        np.asarray(gm[0]), np.asarray(gs[0]), rtol=2e-4, atol=1e-6)
    assert abs(float(gs[1])) > 0.0
    np.testing.assert_allclose(float(gm[1]), float(gs[1]), rtol=2e-4)
    gm2, gs2 = np.asarray(gm[2]), np.asarray(gs[2])
    keep = [0, 1, 2, 6, 7, 8, 9]  # color grads symmetrize (mean-collapse)
    np.testing.assert_allclose(gm2[keep], gs2[keep], rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(
        gm2[3:6].sum(), gs2[3:6].sum(), rtol=2e-3, atol=2e-5)


def test_a5_mesh_fit_grads_match_single(scene):
    """a5 fits over a mesh (round-4 VERDICT item 3): render_loss with a
    TEST-algorithm config + mesh produces the same color/density grads
    as the single-device path (the fused a5 diff segments carry the
    sharded side in interpret/TPU runs; CPU runs the XLA scan — either
    way the mesh must not change gradients)."""
    from jax.sharding import Mesh

    from volumerenderingproject_tpu.utils.config import Algorithm

    volume, tf, cam, cfg, target = scene
    devs = np.array(jax.devices()[:4]).reshape(2, 2, 1)
    mesh = Mesh(devs, ("rays", "samples", "volume"))
    cfg5 = dataclasses.replace(cfg, width=16, samples_per_ray=30,
                               algorithm=Algorithm.TEST)
    target2 = target[:16]
    params = FitParams.init(tf)

    g_single = jax.grad(render_loss)(
        params, tf, volume, cam, target2, cfg5)
    g_mesh = jax.grad(render_loss)(
        params, tf, volume, cam, target2, cfg5, mesh)
    assert float(jnp.abs(g_single.tf_colors).sum()) > 0
    np.testing.assert_allclose(
        np.asarray(g_mesh.tf_colors), np.asarray(g_single.tf_colors),
        rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_mesh.density_scale),
        np.asarray(g_single.density_scale), rtol=2e-4, atol=1e-6)


def test_volume_mesh_fit_grads_match_single(scene):
    """Volume-axis mesh fits (round-4 VERDICT item 1a): render_loss over
    a ("rays", "samples", "volume") mesh with volume > 1 matches the
    single-device gradients (the slab diff segments carry the sharded
    side on TPU/interpret; CPU runs the XLA slab scan)."""
    from jax.sharding import Mesh

    from volumerenderingproject_tpu import make_volume

    _, tf, cam, cfg, target = scene
    rng = np.random.default_rng(5)
    volume = make_volume(  # even x so the axis divides it
        rng.uniform(0, 255, size=(8, 11, 10)).astype(np.float32))
    devs = np.array(jax.devices()[:4]).reshape(2, 1, 2)
    mesh = Mesh(devs, ("rays", "samples", "volume"))
    cfg2 = dataclasses.replace(cfg, width=16, samples_per_ray=30)
    target2 = target[:16]
    params = FitParams.init(tf)

    g_single = jax.grad(render_loss)(
        params, tf, volume, cam, target2, cfg2)
    g_mesh = jax.grad(render_loss)(
        params, tf, volume, cam, target2, cfg2, mesh)
    np.testing.assert_allclose(
        np.asarray(g_mesh.tf_colors), np.asarray(g_single.tf_colors),
        rtol=2e-4, atol=1e-6)
