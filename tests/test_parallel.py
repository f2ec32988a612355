import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volumerenderingproject_tpu import (
    Camera,
    RenderConfig,
    default_transfer_function,
    make_volume,
)
from volumerenderingproject_tpu.models.raycast import render_vrc
from volumerenderingproject_tpu.parallel.mesh import make_mesh
from volumerenderingproject_tpu.parallel.render_dist import render_vrc_sharded


@pytest.fixture(scope="module")
def scene(rng=None):
    rng = np.random.default_rng(7)
    vol_np = rng.uniform(0.0, 255.0, size=(8, 10, 9)).astype(np.float32)
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.4, 0.3, 0.9))
    cfg = RenderConfig(width=16, height=6, samples_per_ray=24)
    return volume, tf, cam, cfg


def _single(volume, tf, cam, cfg):
    return np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))


def test_rays_axis_matches_single(scene):
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=8, samples=1, volume=1)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg, mesh))
    np.testing.assert_allclose(got, _single(volume, tf, cam, cfg), atol=1e-6)


def test_samples_axis_matches_single(scene):
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=2, samples=4, volume=1)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg, mesh))
    np.testing.assert_allclose(got, _single(volume, tf, cam, cfg), atol=1e-5)


def test_volume_axis_matches_single(scene):
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=2, samples=1, volume=4)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg, mesh))
    np.testing.assert_allclose(got, _single(volume, tf, cam, cfg), atol=1e-5)


def test_volume_axis_negative_front_x(scene):
    volume, tf, cam, cfg = scene
    cam2 = Camera.initial(position=(-0.6, 0.2, 0.7))  # front.x > 0... mirrored
    assert float(cam2.front[0]) > 0
    cam3 = Camera.initial(position=(0.6, 0.2, 0.7))
    assert float(cam3.front[0]) < 0
    mesh = make_mesh(rays=1, samples=1, volume=8)
    for cam_i in (cam2, cam3):
        got = np.asarray(render_vrc_sharded(volume, tf, cam_i, cfg, mesh))
        np.testing.assert_allclose(
            got, _single(volume, tf, cam_i, cfg), atol=1e-5
        )


def test_full_3d_mesh(scene):
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=2, samples=2, volume=2)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg, mesh))
    np.testing.assert_allclose(got, _single(volume, tf, cam, cfg), atol=1e-5)


def test_sharded_gradients_match_single(scene):
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=2, samples=2, volume=1)
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)

    def loss_single(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_vrc(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    def loss_sharded(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_vrc_sharded(volume, tf2, cam, cfg, mesh)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(tf.colors))
    g2 = np.asarray(jax.grad(loss_sharded)(tf.colors))
    assert np.abs(g1).sum() > 0
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_mesh_validation(scene):
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=8, samples=1, volume=1)
    bad_cfg = cfg.replace(width=16, height=5)
    bad_cfg = bad_cfg.replace(width=15)  # not divisible by 8
    with pytest.raises(ValueError):
        render_vrc_sharded(volume, tf, cam, bad_cfg, mesh)


def test_a5_sharded_matches_single(scene):
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.utils.config import Algorithm

    volume, tf, cam, cfg = scene
    cfg5 = cfg.replace(algorithm=Algorithm.TEST)
    mesh = make_mesh(rays=4, samples=2, volume=1)
    single = np.asarray(render_test(volume, tf, cam, cfg5, mode="fast"))
    sharded = np.asarray(render_vrc_sharded(volume, tf, cam, cfg5, mesh))
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_conic_volume_sharding_matches_single(scene):
    """Round-4: conic + volume axis supported — the slab fold runs in
    both orders and selects per ray by sign(dir.x) (rays on either side
    of the camera axis disagree on the slab visit order)."""
    volume, tf, _, cfg = scene
    mesh = make_mesh(rays=1, samples=1, volume=8)
    cfg_c = cfg.replace(conic=True)
    # near-perpendicular cameras: the conic fan straddles sign(dir.x)
    for pos in ((0.05, 0.3, 1.2), (0.3, 0.2, 1.1)):
        cam = Camera.initial(position=pos)
        want = _single(volume, tf, cam, cfg_c)
        got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg_c, mesh))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(pos))
        # the fan genuinely disagrees on sign(dir.x) in the first case
    from volumerenderingproject_tpu.models.raycast import primary_ray_dirs

    dirs = primary_ray_dirs(Camera.initial(position=(0.05, 0.3, 1.2)),
                            cfg_c)
    signs = np.sign(np.asarray(dirs[..., 0]))
    assert (signs > 0).any() and (signs < 0).any()


def test_config_validation():
    from volumerenderingproject_tpu.utils.config import RenderConfig

    with pytest.raises(ValueError):
        RenderConfig(width=0)
    with pytest.raises(ValueError):
        RenderConfig(samples_per_ray=-1)
    with pytest.raises(ValueError):
        RenderConfig(front_clip=5.0)


def test_pallas_segments_all_axes(scene):
    """The fused Pallas kernel under shard_map (interpret mode) must match
    the single-device XLA render on every mesh-axis combination."""
    volume, tf, cam, cfg = scene
    want = _single(volume, tf, cam, cfg)
    for axes in (
        dict(rays=8, samples=1, volume=1),
        dict(rays=2, samples=4, volume=1),
        dict(rays=2, samples=1, volume=4),
        dict(rays=2, samples=2, volume=2),
    ):
        mesh = make_mesh(**axes)
        got = np.asarray(
            render_vrc_sharded(
                volume, tf, cam, cfg, mesh,
                use_pallas=True, pallas_interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(axes))


def test_pallas_segments_lit_and_lut(scene):
    """Lighting (baked per-voxel Phong) and dense-LUT classify now run on
    the fused segment kernel for rays/samples meshes (full-volume work
    units) and must match the single-device XLA render."""
    volume, tf, cam, cfg = scene
    for kw in (dict(lighting=True), dict(tf_lut=64),
               dict(lighting=True, tf_lut=64)):
        cfg2 = cfg.replace(**kw)
        want = _single(volume, tf, cam, cfg2)
        mesh = make_mesh(rays=2, samples=2, volume=1)
        got = np.asarray(
            render_vrc_sharded(
                volume, tf, cam, cfg2, mesh,
                use_pallas=True, pallas_interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(kw))

    # volume-sharded lighting stays on the halo-exchange scan fallback
    from volumerenderingproject_tpu.parallel.render_dist import (
        _pallas_segment_eligible,
    )

    assert not _pallas_segment_eligible(
        volume, tf, cfg.replace(lighting=True), slab_x=4)
    assert _pallas_segment_eligible(
        volume, tf, cfg.replace(lighting=True), slab_x=None)
    assert _pallas_segment_eligible(
        volume, tf, cfg.replace(tf_lut=64), slab_x=4)


def test_pallas_segment_slab_negative_front_x(scene):
    """Slab visibility-order fold composes correctly for both ray x signs
    when segments come from the fused kernel."""
    volume, tf, _, cfg = scene
    mesh = make_mesh(rays=1, samples=1, volume=4)
    for pos in ((-0.6, 0.2, 0.7), (0.6, 0.2, 0.7)):
        cam = Camera.initial(position=pos)
        got = np.asarray(
            render_vrc_sharded(
                volume, tf, cam, cfg, mesh,
                use_pallas=True, pallas_interpret=True,
            )
        )
        np.testing.assert_allclose(
            got, _single(volume, tf, cam, cfg), atol=1e-5
        )


def test_pallas_auto_falls_back_when_ineligible(scene):
    """Lighting is outside the fused kernel's semantics: auto mode must
    route to the XLA scan segments (and still match the single render)."""
    from volumerenderingproject_tpu.models.raycast import render_vrc as _rv

    volume, tf, cam, cfg = scene
    cfg_lit = cfg.replace(lighting=True)
    mesh = make_mesh(rays=2, samples=2, volume=1)
    got = np.asarray(
        render_vrc_sharded(volume, tf, cam, cfg_lit, mesh,
                           pallas_interpret=True)
    )
    want = np.asarray(_rv(volume, tf, cam, cfg_lit, mode="fast"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_volume_axis_halo_trilinear_color(scene):
    """Volume-axis slabs with a one-voxel halo must reproduce the a1
    trilinear-color interp exactly (taps cross slab boundaries)."""
    from volumerenderingproject_tpu.utils.config import Interp

    volume, tf, cam, cfg = scene
    cfg2 = cfg.replace(interp=Interp.TRILINEAR_COLOR)
    want = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
    mesh = make_mesh(rays=1, samples=1, volume=4)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg2, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_volume_axis_halo_trilinear_smooth(scene):
    from volumerenderingproject_tpu.utils.config import Interp

    volume, tf, cam, cfg = scene
    cfg2 = cfg.replace(interp=Interp.TRILINEAR)
    want = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
    mesh = make_mesh(rays=2, samples=1, volume=2)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg2, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_volume_axis_halo_lighting(scene):
    """Gradient-normal Phong shading on slabs: central differences read
    through the exchanged halo."""
    volume, tf, cam, cfg = scene
    cfg2 = cfg.replace(lighting=True)
    want = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
    mesh = make_mesh(rays=1, samples=2, volume=4)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg2, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_volume_axis_a5(scene):
    """a5/TEST sharding over volume slabs (corner fetches through the halo,
    incl. the reference's flat-index wrap semantics)."""
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.utils.config import Algorithm

    volume, tf, cam, cfg = scene
    cfg5 = cfg.replace(algorithm=Algorithm.TEST)
    want = np.asarray(render_test(volume, tf, cam, cfg5, mode="fast"))
    mesh = make_mesh(rays=2, samples=1, volume=2)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg5, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)
    cfg5l = cfg5.replace(lighting=True)
    want = np.asarray(render_test(volume, tf, cam, cfg5l, mode="fast"))
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg5l, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_segments_conic_rays_samples(scene):
    """Conic cameras shard over rays/samples through the fused kernel
    (the volume axis rejects conic — slab visit order is undefined)."""
    volume, tf, cam, cfg = scene
    cfg_c = cfg.replace(conic=True)
    want = np.asarray(render_vrc(volume, tf, cam, cfg_c, mode="fast"))
    mesh = make_mesh(rays=2, samples=2, volume=1)
    got = np.asarray(
        render_vrc_sharded(volume, tf, cam, cfg_c, mesh,
                           use_pallas=True, pallas_interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_segments_multichannel_slab(scene):
    """Volume-sharded 4-D multichannel through the fused segment kernel
    (VERDICT round-2 item 9): the mean-id + channel grids stage per
    x-slab (NN needs no halo); parity vs the single-device XLA render."""
    from volumerenderingproject_tpu.parallel.render_dist import (
        _pallas_segment_eligible,
    )

    _, tf, cam, cfg = scene
    rng = np.random.default_rng(11)
    vol_np = rng.uniform(0.0, 255.0, size=(8, 10, 9, 3)).astype(np.float32)
    volume = make_volume(vol_np)
    assert volume.channels == 3
    assert _pallas_segment_eligible(volume, tf, cfg, slab_x=4)
    want = _single(volume, tf, cam, cfg)
    for mesh in (make_mesh(rays=1, samples=1, volume=2),
                 make_mesh(rays=2, samples=2, volume=2)):
        got = np.asarray(
            render_vrc_sharded(volume, tf, cam, cfg, mesh,
                               use_pallas=True, pallas_interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_segments_a5(scene):
    """Fused a5 segments under shard_map (rays/samples axes) match the
    single-device XLA a5 render — plain, lit, and packed (z > 127)."""
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.utils.config import Algorithm

    volume, tf, cam, cfg = scene
    for kw in ({}, {"lighting": True}):
        cfg5 = cfg.replace(algorithm=Algorithm.TEST, **kw)
        want = np.asarray(render_test(volume, tf, cam, cfg5, mode="fast"))
        mesh = make_mesh(rays=2, samples=2, volume=1)
        got = np.asarray(
            render_vrc_sharded(volume, tf, cam, cfg5, mesh,
                               use_pallas=True, pallas_interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(kw))

    rng = np.random.default_rng(23)
    volp = make_volume(
        rng.uniform(0, 255, size=(8, 10, 150)).astype(np.float32))
    cfg5 = cfg.replace(algorithm=Algorithm.TEST)
    want = np.asarray(render_test(volp, tf, cam, cfg5, mode="fast"))
    mesh = make_mesh(rays=2, samples=2, volume=1)
    got = np.asarray(
        render_vrc_sharded(volp, tf, cam, cfg5, mesh,
                           use_pallas=True, pallas_interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_diff_segments_grads_match_single(scene):
    """The custom_vjp segment kernels (differentiable=True) produce the
    same TF-color gradients as the single-device XLA scan — sharded
    training at kernel speed (round-3 VERDICT item 1)."""
    volume, tf, cam, cfg = scene
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)

    def loss_single(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_vrc(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(tf.colors))
    assert np.abs(g1).sum() > 0

    for axes in ((2, 2, 1), (4, 1, 1), (1, 4, 1)):
        mesh = make_mesh(rays=axes[0], samples=axes[1], volume=axes[2])

        def loss_sharded(colors):
            tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
            img = render_vrc_sharded(
                volume, tf2, cam, cfg, mesh,
                differentiable=True, use_pallas=True,
                pallas_interpret=True)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        g2 = np.asarray(jax.grad(loss_sharded)(tf.colors))
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_diff_segments_forward_matches_single(scene):
    """differentiable=True is value-identical to the plain forward."""
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=2, samples=2, volume=1)
    got = np.asarray(render_vrc_sharded(
        volume, tf, cam, cfg, mesh, differentiable=True,
        use_pallas=True, pallas_interpret=True))
    np.testing.assert_allclose(got, _single(volume, tf, cam, cfg), atol=1e-5)


def test_diff_segments_auto_fallback_volume_axis(scene):
    """differentiable=True on a volume-sharded mesh auto-routes to the
    SLAB diff kernels (round-4 VERDICT item 1a) — grads still match."""
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=2, samples=1, volume=4)
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)

    def loss_single(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_vrc(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    def loss_sharded(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_vrc_sharded(
            volume, tf2, cam, cfg, mesh, differentiable=True,
            pallas_interpret=True)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(tf.colors))
    g2 = np.asarray(jax.grad(loss_sharded)(tf.colors))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_diff_segments_lit_light_grads(scene):
    """Baked-lighting diff segments: TF-color AND light-parameter
    gradients through the lit core match the XLA scan on a mesh."""
    from volumerenderingproject_tpu.ops import phong

    volume, tf, cam, cfg = scene
    cfg2 = cfg.replace(lighting=True)
    mesh = make_mesh(rays=2, samples=2, volume=1)
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)
    light = phong.default_light()
    lvec = phong.light_to_vec(light)

    def loss(colors, lv, sharded):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        lgt = phong.light_from_vec(lv)
        if sharded:
            img = render_vrc_sharded(
                volume, tf2, cam, cfg2, mesh, differentiable=True,
                use_pallas=True, pallas_interpret=True, light=lgt)
        else:
            img = render_vrc(volume, tf2, cam, cfg2, mode="fast", light=lgt)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gc1, gl1 = jax.grad(loss, argnums=(0, 1))(tf.colors, lvec, False)
    gc2, gl2 = jax.grad(loss, argnums=(0, 1))(tf.colors, lvec, True)
    assert np.abs(np.asarray(gc1)).sum() > 0
    np.testing.assert_allclose(np.asarray(gc2), np.asarray(gc1),
                               rtol=1e-4, atol=1e-7)
    gl1, gl2 = np.asarray(gl1), np.asarray(gl2)
    # direction + ambient/diffuse/specular/shininess grads are exact
    np.testing.assert_allclose(gl2[:3], gl1[:3], rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(gl2[6:], gl1[6:], rtol=2e-3, atol=1e-6)
    # light-color grads are SYMMETRIZED by the lit core's mean-collapse
    # (ops/pallas_march_vjp._make_lit_core): each channel gets the mean
    # of the XLA per-channel grads — the sum (the descent direction along
    # the uniform-color subspace the bake lives on) is preserved
    np.testing.assert_allclose(gl2[3:6], np.full(3, gl1[3:6].mean()),
                               rtol=2e-3, atol=1e-6)


def test_diff_segments_volume_slab(scene):
    """Volume-slab diff segments (round-4 VERDICT item 1a): forward and
    TF-color gradients through the slab custom_vjp kernels match the
    single-device XLA scan — volume-sharded training at kernel speed."""
    volume, tf, cam, cfg = scene
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)
    ref = _single(volume, tf, cam, cfg)

    def loss_single(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_vrc(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(tf.colors))
    assert np.abs(g1).sum() > 0

    for axes in ((1, 1, 4), (2, 1, 2), (1, 2, 2)):
        mesh = make_mesh(rays=axes[0], samples=axes[1], volume=axes[2])

        def loss_sharded(colors):
            tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
            img = render_vrc_sharded(
                volume, tf2, cam, cfg, mesh, differentiable=True,
                use_pallas=True, pallas_interpret=True)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        got = np.asarray(render_vrc_sharded(
            volume, tf, cam, cfg, mesh, differentiable=True,
            use_pallas=True, pallas_interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5)
        g2 = np.asarray(jax.grad(loss_sharded)(tf.colors))
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_diff_segments_volume_slab_lit(scene):
    """Slab diff segments with baked lighting: the (M, S) bake from a
    halo-extended slab (ppermute + crop) reproduces the replicated lit
    gradients for central, sobel, AND presmoothed normals."""
    volume, tf, cam, cfg = scene
    mesh = make_mesh(rays=1, samples=1, volume=4)
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)
    for extra in ({}, {"gradient_filter": "sobel"},
                  {"presmooth_sigma": 1.0}):
        cfg2 = cfg.replace(lighting=True, **extra)

        def loss(colors, sharded):
            tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
            if sharded:
                img = render_vrc_sharded(
                    volume, tf2, cam, cfg2, mesh, differentiable=True,
                    use_pallas=True, pallas_interpret=True)
            else:
                img = render_vrc(volume, tf2, cam, cfg2, mode="fast")
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        g1 = np.asarray(jax.grad(loss)(tf.colors, False))
        g2 = np.asarray(jax.grad(loss)(tf.colors, True))
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-6)
        ref = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
        got = np.asarray(render_vrc_sharded(
            volume, tf, cam, cfg2, mesh, differentiable=True,
            use_pallas=True, pallas_interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_diff_segments_a5(scene):
    """Fused differentiable a5 segments (round-4 VERDICT item 3): a5
    mesh-fit gradients match the single-device XLA a5 scan."""
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.utils.config import Algorithm

    volume, tf, cam, cfg = scene
    cfg5 = cfg.replace(algorithm=Algorithm.TEST)
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)
    ref = np.asarray(render_test(volume, tf, cam, cfg5, mode="fast"))

    def loss_single(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_test(volume, tf2, cam, cfg5, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(tf.colors))
    assert np.abs(g1).sum() > 0

    for axes in ((2, 2, 1), (1, 4, 1)):
        mesh = make_mesh(rays=axes[0], samples=axes[1], volume=axes[2])

        def loss_sharded(colors):
            tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
            img = render_vrc_sharded(
                volume, tf2, cam, cfg5, mesh, differentiable=True,
                use_pallas=True, pallas_interpret=True)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        got = np.asarray(render_vrc_sharded(
            volume, tf, cam, cfg5, mesh, differentiable=True,
            use_pallas=True, pallas_interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5)
        g2 = np.asarray(jax.grad(loss_sharded)(tf.colors))
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_volume_sharded_scattering_matches_single(scene):
    """Scattering on a volume-slab mesh (VERDICT r3 item 5): the sharded
    light-transmittance sweep (phong.light_transmittance_grid_slab)
    stitches per-slab partials with ppermute — parity vs the replicated
    render across all three sweep branches (dominant axis x / y / z,
    both signs, nonzero x-shear)."""
    import dataclasses

    from volumerenderingproject_tpu.ops import phong

    volume, tf, cam, cfg = scene
    cfg_s = cfg.replace(scattering=True)
    mesh = make_mesh(rays=1, samples=1, volume=4)
    for ldir in ((0.5, 1.0, 0.75),    # y-dominant, x-shear (default)
                 (1.0, 0.3, -0.2),    # x-dominant, +x
                 (-1.0, 0.1, 0.4),    # x-dominant, -x
                 (0.4, -0.3, -1.0),   # z-dominant, -z, x-shear
                 (0.0, 1.0, 0.2)):    # y-dominant, zero x-shear
        light = dataclasses.replace(
            phong.default_light(),
            direction=jnp.asarray(ldir, jnp.float32))
        want = np.asarray(render_vrc(
            volume, tf, cam, cfg_s, mode="fast", light=light))
        got = np.asarray(render_vrc_sharded(
            volume, tf, cam, cfg_s, mesh, light=light))
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=str(ldir))


def test_sharded_sweep_matches_replicated_grid():
    """light_transmittance_grid_slab == light_transmittance_grid on the
    slab, directly (the op-level parity behind the render test)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from volumerenderingproject_tpu.ops import phong

    rng = np.random.default_rng(5)
    alpha = jnp.asarray(
        rng.uniform(0, 0.9, size=(16, 10, 9)).astype(np.float32))
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("volume",))
    for ldir in ((1.0, 0.4, 0.1), (-0.2, -1.0, 0.3), (0.3, 0.2, 1.0)):
        d = jnp.asarray(ldir, jnp.float32)
        want = np.asarray(phong.light_transmittance_grid(alpha, d))

        fn = shard_map(
            partial(phong.light_transmittance_grid_slab,
                    light_dir=np.asarray(ldir, np.float32)),
            mesh=mesh, in_specs=P("volume"), out_specs=P("volume"),
            check_vma=False)
        got = np.asarray(fn(alpha))
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=str(ldir))


def test_streamed_segments_lit_rays_samples(scene):
    """Beyond-resident configs on rays/samples meshes route to the
    manual-DMA STREAMED kernel as the per-device work unit (round-4:
    large-volume lit renders shard at kernel speed instead of the XLA
    scan) — parity vs the single-device XLA render within the u8 (M, S)
    quantization bound."""
    from volumerenderingproject_tpu.parallel.render_dist import (
        _pallas_segment_eligible,
        _streamed_segment_eligible,
    )

    _, tf, cam, cfg = scene
    rng = np.random.default_rng(51)
    vol = make_volume(rng.uniform(0, 255, (18, 12, 140)).astype(np.float32))
    cfg2 = cfg.replace(lighting=True)
    # resident segment kernel refuses lit z > 128; streamed tier takes it
    assert not _pallas_segment_eligible(vol, tf, cfg2, None)
    assert _streamed_segment_eligible(vol, tf, cfg2)

    want = np.asarray(render_vrc(vol, tf, cam, cfg2, mode="fast"))
    mesh = make_mesh(rays=2, samples=2, volume=1)
    got = np.asarray(render_vrc_sharded(
        vol, tf, cam, cfg2, mesh, pallas_interpret=True))
    np.testing.assert_allclose(got, want, atol=6e-3)


def test_volume_axis_presmooth_lighting(scene):
    """Round-4: presmoothed gradient shading on a volume-slab mesh — the
    x-halo widens to the Gaussian radius + 1 so smoothed normals match
    the replicated render exactly."""
    volume, tf, cam, cfg = scene
    cfg_p = cfg.replace(lighting=True, presmooth_sigma=1.2,
                        gradient_filter="sobel")
    mesh = make_mesh(rays=1, samples=1, volume=4)
    want = _single(volume, tf, cam, cfg_p)
    got = np.asarray(render_vrc_sharded(volume, tf, cam, cfg_p, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_diff_segments_streamed_tier(scene, monkeypatch):
    """Beyond-VMEM differentiable work units (round-4 VERDICT item 1b):
    with the resident diff tier forced off, differentiable=True routes to
    the STREAMED custom_vjp segments on rays/samples axes — forward and
    grads still match the single-device scan."""
    from volumerenderingproject_tpu.parallel import render_dist as rd

    monkeypatch.setattr(rd, "_diff_segment_eligible",
                        lambda *a, **k: False)
    volume, tf, cam, cfg = scene
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)
    ref = _single(volume, tf, cam, cfg)

    def loss_single(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_vrc(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(tf.colors))
    mesh = make_mesh(rays=2, samples=2, volume=1)

    def loss_sharded(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = rd.render_vrc_sharded(
            volume, tf2, cam, cfg, mesh, differentiable=True,
            pallas_interpret=True)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    got = np.asarray(rd.render_vrc_sharded(
        volume, tf, cam, cfg, mesh, differentiable=True,
        pallas_interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    g2 = np.asarray(jax.grad(loss_sharded)(tf.colors))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)


def test_diff_segments_a5_streamed(monkeypatch):
    """Beyond-VMEM a5 mesh training: when the packed id grid exceeds the
    resident budget, rays/samples-axis fits run the ID-STREAMING
    custom_vjp core (render_test_pallas_diff_streamed_segment) — grads
    match the single-device XLA a5 scan."""
    import volumerenderingproject_tpu.ops.pallas_a5 as a5mod
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.utils.config import Algorithm

    rng = np.random.default_rng(23)
    volume = make_volume(
        rng.uniform(0.0, 255.0, size=(24, 14, 150)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.4, 0.3, 0.9))
    cfg = RenderConfig(width=16, height=6, samples_per_ray=24,
                      algorithm=Algorithm.TEST)
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)

    # force the beyond-VMEM tier on a test-sized volume: the resident
    # packed grid "does not fit", and a small stream budget forces
    # multi-block id streaming (block_x = 8 -> 3 blocks at d1 = 24)
    monkeypatch.setattr(a5mod, "a5_packed_geometry",
                        lambda dims, k: None)
    monkeypatch.setattr(a5mod, "_A5_STREAM_BUDGET", 30_000)

    ref = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))

    def loss_single(colors):
        tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
        img = render_test(volume, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(tf.colors))
    assert np.abs(g1).sum() > 0

    for axes in ((2, 2, 1), (1, 4, 1)):
        mesh = make_mesh(rays=axes[0], samples=axes[1], volume=axes[2])

        def loss_sharded(colors):
            tf2 = tf.__class__(tf.lower, tf.upper, colors, tf.hg_g)
            img = render_vrc_sharded(
                volume, tf2, cam, cfg, mesh, differentiable=True,
                pallas_interpret=True)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        got = np.asarray(render_vrc_sharded(
            volume, tf, cam, cfg, mesh, differentiable=True,
            pallas_interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5)
        g2 = np.asarray(jax.grad(loss_sharded)(tf.colors))
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-7)
