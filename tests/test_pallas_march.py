import numpy as np
import pytest

from volumerenderingproject_tpu import (
    Camera,
    RenderConfig,
    default_transfer_function,
    make_volume,
)
from volumerenderingproject_tpu.ingest import synthetic
from volumerenderingproject_tpu.models.raycast import render_vrc
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    vol_np = rng.uniform(0.0, 255.0, size=(10, 12, 11)).astype(np.float32)
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=20, height=14, samples_per_ray=40)
    return volume, tf, cam, cfg


def test_pallas_matches_xla_renderer(scene):
    volume, tf, cam, cfg = scene
    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg, early_eps=0.0, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_early_termination_close(scene):
    volume, tf, cam, cfg = scene
    exact = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg, early_eps=0.0, interpret=True)
    )
    early = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg, early_eps=1e-3, interpret=True)
    )
    # NB: termination is per tile (max T), so cut contributions are bounded
    # by early_eps * max color
    np.testing.assert_allclose(early, exact, atol=2e-3)


def test_pallas_sphere_scene(scene):
    volume = synthetic.centered_sphere(32)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.3, 0.4, 0.9))
    cfg = RenderConfig(width=16, height=16, samples_per_ray=30)
    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg, early_eps=0.0, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_packed_matches_unpacked_bitwise(scene):
    """The material-grid mode is exact by construction: the TF classify it
    bakes into the grid is the same scan the f32 kernel runs per sample."""
    volume, tf, cam, cfg = scene
    unpacked = np.asarray(
        render_vrc_pallas(
            volume, tf, cam, cfg, early_eps=0.0, interpret=True, packed=False
        )
    )
    packed = np.asarray(
        render_vrc_pallas(
            volume, tf, cam, cfg, early_eps=0.0, interpret=True, packed=True
        )
    )
    np.testing.assert_array_equal(packed, unpacked)


def test_packed_large_z_matches_scan():
    """z > 128 (MNI-1mm-class geometry) only works packed — the f32 layout
    cannot put the z column on 128 lanes."""
    rng = np.random.default_rng(11)
    volume = make_volume(
        rng.uniform(0.0, 255.0, size=(8, 9, 140)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=12, height=10, samples_per_ray=24)
    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas(
            volume, tf, cam, cfg, early_eps=0.0, interpret=True, packed=True
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unpacked_rejects_large_z():
    volume = make_volume(np.zeros((4, 4, 200), np.float32))
    tf = default_transfer_function()
    cam = Camera.initial()
    cfg = RenderConfig(width=8, height=8, samples_per_ray=4)
    with pytest.raises(ValueError):
        render_vrc_pallas(volume, tf, cam, cfg, interpret=True, packed=False)


def test_rejects_z_beyond_packed_limit():
    """z > 1024 exceeds even the packed layout (8 nibbles x 128 lanes)."""
    volume = make_volume(np.zeros((2, 2, 1100), np.float32))
    tf = default_transfer_function()
    cam = Camera.initial()
    cfg = RenderConfig(width=8, height=8, samples_per_ray=4)
    with pytest.raises(ValueError):
        render_vrc_pallas(volume, tf, cam, cfg, interpret=True)


def test_segment_matches_scan_segment_bitwise(scene):
    """The fused kernel's (C, T) sample segment must equal the XLA scan
    segment exactly (same float op order, eps=0)."""
    import jax.numpy as jnp
    from volumerenderingproject_tpu.models.raycast import render_vrc_segment
    from volumerenderingproject_tpu.ops import composite as comp
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_segment,
    )

    volume, tf, cam, cfg = scene
    for s_start, s_count in ((0, 20), (20, 20)):
        c_k, t_k = render_vrc_pallas_segment(
            volume.data, volume.dims, volume.octree_depth, volume.cal_max,
            tf, cam, cfg, s_start=s_start, s_count=s_count, interpret=True,
        )
        c_s, t_s = render_vrc_segment(
            volume, tf, cam, cfg, s_start=s_start, s_count=s_count,
        )
        np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_s))
        np.testing.assert_array_equal(np.asarray(t_k), np.asarray(t_s))

    # rays-axis tiles concatenate to the full frame
    want = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg, early_eps=0.0, interpret=True)
    )
    cols = []
    for xo in (0, 10):
        c_k, t_k = render_vrc_pallas_segment(
            volume.data, volume.dims, volume.octree_depth, volume.cal_max,
            tf, cam, cfg, x_offset=xo, local_width=10, interpret=True,
        )
        cols.append(
            np.asarray(
                comp.segment_finalize((c_k, t_k),
                                      jnp.asarray(cfg.background))
            )
        )
    np.testing.assert_array_equal(np.concatenate(cols, axis=0), want)


def test_streamed_matches_resident(scene):
    """HBM-streamed block sweep (hbm_mode) must match the XLA renderer for
    both block visit directions and with early termination."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    rng = np.random.default_rng(11)
    volume = make_volume(rng.uniform(0, 255, (20, 12, 11)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=20, height=14, samples_per_ray=40)
    for pos in ((0.35, 0.45, 0.85), (-0.5, 0.3, -0.8)):
        cam = Camera.initial(position=pos)
        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(
            render_vrc_pallas_streamed(
                volume, tf, cam, cfg, early_eps=0.0, interpret=True,
                block_x=8,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
        early = np.asarray(
            render_vrc_pallas_streamed(
                volume, tf, cam, cfg, early_eps=1e-3, interpret=True,
                block_x=8,
            )
        )
        np.testing.assert_allclose(early, want, atol=2e-3)


def test_streamed_visibility_skips_and_stays_exact():
    """The host-side (tile, block) bitmap must (a) actually mark pairs
    invisible on a sparse scene, (b) never change the image vs the
    bitmap-off kernel, and (c) force all-visible when TF(0).alpha > 0."""
    import jax.numpy as jnp

    from volumerenderingproject_tpu.ops.pallas_march import (
        BRICK,
        _streamed_visibility,
        brick_occupancy,
        render_vrc_pallas_streamed,
    )

    # only x < 8 holds classifiable (bone-range) voxels -> blocks 1, 2 of
    # a block_x=8 sweep are empty and must be skipped
    vol_np = np.zeros((24, 12, 11), np.float32)
    vol_np[:8] = 50.0  # 50/255 lies in the bone interval [30/255, 80/255]
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    cfg = RenderConfig(width=24, height=16, samples_per_ray=40)
    for pos in ((0.9, 0.35, 0.45), (-0.8, 0.3, -0.5)):
        cam = Camera.initial(position=pos)
        want = np.asarray(
            render_vrc_pallas_streamed(
                volume, tf, cam, cfg, early_eps=0.0, interpret=True,
                block_x=8, use_vis=False))
        got = np.asarray(
            render_vrc_pallas_streamed(
                volume, tf, cam, cfg, early_eps=0.0, interpret=True,
                block_x=8, use_vis=True))
        np.testing.assert_array_equal(got, want)
        remapped = np.asarray(
            render_vrc_pallas_streamed(
                volume, tf, cam, cfg, early_eps=0.0, interpret=True,
                block_x=8, use_vis=True, remap_dma=True))
        np.testing.assert_array_equal(remapped, want)

    # the bitmap itself: some pair must be skipped on this sparse scene
    cam = Camera.initial(position=(0.9, 0.35, 0.45))
    cal = jnp.trunc(jnp.asarray(volume.cal_max, jnp.float32))
    occ, nb = brick_occupancy(volume.data.reshape(volume.dims), tf, cal)
    dims = volume.dims
    L = float(max(dims))
    n = float(2**volume.octree_depth)
    box_lo = [max(0.0, (L / 2 - d / 2) / L) - 0.5 for d in dims]
    box_hi = [min(1.0, (L / 2 + d / 2) / L + 1.0 / n) - 0.5 for d in dims]
    tile = (16, 16, 4)
    vis, eff = _streamed_visibility(
        cam, cfg, dims, volume.octree_depth, occ, nb, BRICK, 3, tile,
        jnp.asarray(0.0, jnp.float32),
        [jnp.asarray(v, jnp.float32) for v in box_lo],
        [jnp.asarray(v, jnp.float32) for v in box_hi])
    vis = np.asarray(vis)
    eff = np.asarray(eff)
    assert vis.min() == 0, "sparse scene should skip at least one pair"
    assert vis.max() == 1
    # eff never exceeds its own block index and repeats across skips
    k = np.tile(np.arange(3), vis.size // 3)
    assert (eff <= k).all()
    assert (eff[vis == 1] == k[vis == 1]).all()

    # TF(0).alpha > 0 disables all skipping
    vis2, _ = _streamed_visibility(
        cam, cfg, dims, volume.octree_depth, occ, nb, BRICK, 3, tile,
        jnp.asarray(0.5, jnp.float32),
        [jnp.asarray(v, jnp.float32) for v in box_lo],
        [jnp.asarray(v, jnp.float32) for v in box_hi])
    assert np.asarray(vis2).min() == 1


def test_streamed_geometry_selection():
    from volumerenderingproject_tpu.ops.pallas_march import (
        packed_geometry,
        streamed_geometry,
    )

    # MNI-1mm-class fits the resident packed kernel
    assert packed_geometry((182, 218, 182), 4) is not None
    # 512^3 exceeds the resident budget but streams
    assert packed_geometry((512, 512, 512), 4) is None
    geo = streamed_geometry((512, 512, 512), 4)
    assert geo is not None
    block_x, zpack = geo
    assert block_x % 8 == 0 and zpack is not None
    # z > 1024 can't pack; z <= 128 still streams as f32 rows
    assert streamed_geometry((64, 64, 1100), 4) is None
    bx, zp = streamed_geometry((2048, 64, 100), 20)  # >16 intervals -> f32
    assert zp is None


def test_fused_lighting_matches_xla(scene):
    """In-kernel Blinn-Phong on central-difference normals vs the XLA lit
    render (BASELINE config 2's shading on the fused path)."""
    volume, tf, cam, cfg = scene
    cfg_lit = cfg.replace(lighting=True)
    want = np.asarray(render_vrc(volume, tf, cam, cfg_lit, mode="fast"))
    got = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg_lit, early_eps=0.0,
                          interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # shading must actually change the image
    unlit = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    assert np.abs(want - unlit).max() > 1e-3


def test_fused_tf_lut_matches_xla(scene):
    """In-kernel dense-LUT classify vs the XLA LUT render, incl. an
    N > 128 LUT exercising the multi-row gather."""
    volume, tf, cam, cfg = scene
    for n in (64, 256):
        cfg_lut = cfg.replace(tf_lut=n)
        want = np.asarray(render_vrc(volume, tf, cam, cfg_lut, mode="fast"))
        got = np.asarray(
            render_vrc_pallas(volume, tf, cam, cfg_lut, early_eps=0.0,
                              interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"n={n}")


def test_fused_lut_plus_lighting(scene):
    """BASELINE config 2 exactly: TF-LUT classify + Phong shading, fused."""
    volume, tf, cam, cfg = scene
    cfg2 = cfg.replace(tf_lut=256, lighting=True)
    want = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
    got = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg2, early_eps=0.0,
                          interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kernel_mode_resolution(scene):
    """The driver must pick: baked per-voxel shading for ortho + uniform
    light, 16-bit LUT-id packing for tf_lut, and the in-kernel gradient
    path when baking is out (conic / non-uniform light color)."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        _resolve_kernel_mode,
    )

    volume, tf, cam, cfg = scene
    dims = volume.dims

    # plain: 4-bit material ids
    p, zp, bits, lutp, baked = _resolve_kernel_mode(dims, 1, 4, cfg, None,
                                                    True)
    assert p and bits == 4 and not lutp and not baked
    # LUT: 16-bit LUT-id grid
    p, zp, bits, lutp, baked = _resolve_kernel_mode(
        dims, 1, 4, cfg.replace(tf_lut=256), None, True)
    assert p and bits == 16 and lutp and not baked
    # lit + bakeable: baked, main grid stays packed
    p, zp, bits, lutp, baked = _resolve_kernel_mode(
        dims, 1, 4, cfg.replace(lighting=True), None, True)
    assert baked and p
    # lit, not bakeable (conic/non-uniform light): in-kernel f32 fallback
    p, zp, bits, lutp, baked = _resolve_kernel_mode(
        dims, 1, 4, cfg.replace(lighting=True), None, False)
    assert not baked and not p
    # lit + LUT + bakeable: LUT-id grid + baked factors
    p, zp, bits, lutp, baked = _resolve_kernel_mode(
        dims, 1, 4, cfg.replace(lighting=True, tf_lut=256), None, True)
    assert baked and p and lutp and bits == 16
    # not bakeable + sobel normals: no in-kernel fallback either
    with pytest.raises(ValueError):
        _resolve_kernel_mode(
            dims, 1, 4, cfg.replace(lighting=True, gradient_filter="sobel"),
            None, False)


def test_conic_lighting_uses_inkernel_gradients(scene):
    """Conic cameras can't bake (per-ray view dir): the in-kernel
    central-difference path must still match the XLA lit render."""
    volume, tf, _, cfg = scene
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg2 = cfg.replace(lighting=True, conic=True)
    want = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
    got = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg2, early_eps=0.0,
                          interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nonuniform_light_color_falls_back_inkernel(scene):
    """A non-uniform light color defeats the single-M-grid bake; the
    in-kernel path handles it and must match the XLA render."""
    import jax.numpy as jnp

    from volumerenderingproject_tpu.ops import phong

    volume, tf, cam, cfg = scene
    lg = phong.default_light()
    lg = phong.Light(direction=lg.direction,
                     color=jnp.asarray([1.0, 0.7, 0.4], jnp.float32),
                     ambient=lg.ambient, diffuse=lg.diffuse,
                     specular=lg.specular, shininess=lg.shininess)
    cfg2 = cfg.replace(lighting=True)
    want = np.asarray(
        render_vrc(volume, tf, cam, cfg2, mode="fast", light=lg))
    got = np.asarray(
        render_vrc_pallas(volume, tf, cam, cfg2, early_eps=0.0,
                          interpret=True, light=lg)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_baked_lighting_dispatch_under_jit(scene):
    """Under jit every in-trace array is a Tracer, so the bake decision
    must be static: light=None (the default white light) keeps the baked
    path inside jit — including non-central gradient filters, which have
    NO in-kernel fallback (regression: the uniformity check used to
    inspect runtime values and silently fell back / raised under jit)."""
    import jax

    volume, tf, cam, cfg = scene
    cfg2 = cfg.replace(lighting=True, gradient_filter="sobel")
    want = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
    got = np.asarray(
        jax.jit(
            lambda v, t, c: render_vrc_pallas(
                v, t, c, cfg2, early_eps=0.0, interpret=True)
        )(volume, tf, cam)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_baked_lighting_supports_sobel_and_presmooth(scene):
    """The bake runs the same XLA gradient convolution as the scan
    renderer, so sobel / pre-smoothed normals now run fused (previously
    XLA-only)."""
    volume, tf, cam, cfg = scene
    for kw in ({"gradient_filter": "sobel"}, {"presmooth_sigma": 1.0}):
        cfg2 = cfg.replace(lighting=True, **kw)
        want = np.asarray(render_vrc(volume, tf, cam, cfg2, mode="fast"))
        got = np.asarray(
            render_vrc_pallas(volume, tf, cam, cfg2, early_eps=0.0,
                              interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(kw))


def test_streamed_lut_matches_xla():
    """The HBM-streamed march with dense-LUT classify (16-bit packed LUT
    indices per block) must match the XLA LUT renderer."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
        streamed_geometry,
    )

    rng = np.random.default_rng(13)
    volume = make_volume(rng.uniform(0, 255, (20, 12, 11)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=20, height=14, samples_per_ray=40, tf_lut=96)
    for pos in ((0.35, 0.45, 0.85), (-0.5, 0.3, -0.8)):
        cam = Camera.initial(position=pos)
        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(
            render_vrc_pallas_streamed(
                volume, tf, cam, cfg, early_eps=0.0, interpret=True,
                block_x=8,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    # geometry: LUT ids stream up to z=256; z>256 needs f32 (z<=128)
    assert streamed_geometry((512, 64, 200), 4, lut_n=256) is not None
    assert streamed_geometry((512, 64, 300), 4, lut_n=256) is None
    bx, zp = streamed_geometry((512, 64, 100), 4, lut_n=256)
    assert zp is not None and zp[0] == 50  # 2 ids/word


def test_streamed_variants_agree():
    """All three streamed orchestrations — manual DMA (default),
    tile-major grid, block-major grid — produce the same image, for even
    and odd block counts and both visit directions."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    rng = np.random.default_rng(13)
    volume = make_volume(rng.uniform(0, 255, (24, 12, 11)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=16, height=14, samples_per_ray=36)
    for pos in ((0.35, 0.45, 0.85), (-0.5, 0.3, -0.8)):
        cam = Camera.initial(position=pos)
        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        for block_x in (8, 16):  # nxb = 3 (odd) and 2 (even)
            for kw in (dict(manual=True),
                       dict(manual=False, block_major=False),
                       dict(manual=False, block_major=True)):
                got = np.asarray(
                    render_vrc_pallas_streamed(
                        volume, tf, cam, cfg, early_eps=0.0,
                        interpret=True, block_x=block_x, **kw))
                np.testing.assert_allclose(
                    got, want, atol=1e-5,
                    err_msg=f"{pos} block_x={block_x} {kw}")


def test_streamed_manual_lut():
    """Manual-DMA streaming + dense-LUT classify (16-bit packed LUT-index
    blocks) matches the XLA LUT renderer."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    rng = np.random.default_rng(17)
    volume = make_volume(rng.uniform(0, 255, (16, 12, 11)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=16, height=14, samples_per_ray=30, tf_lut=64)
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_streamed(
            volume, tf, cam, cfg, early_eps=0.0, interpret=True,
            block_x=8, manual=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_streamed_manual_alpha0_positive_unclipped():
    """TF(0).alpha > 0 renders out-of-volume and empty-brick samples, so
    the manual-stream occupied-extent clip must disable itself."""
    import dataclasses

    import jax.numpy as jnp

    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    vol_np = np.zeros((24, 12, 11), np.float32)
    vol_np[:8] = 50.0
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    # give the fallback interval a visible alpha
    tf = dataclasses.replace(
        tf, colors=tf.colors.at[0].set(jnp.asarray([0.1, 0.2, 0.3, 0.15])))
    cfg = RenderConfig(width=16, height=14, samples_per_ray=30)
    cam = Camera.initial(position=(0.9, 0.35, 0.45))
    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_streamed(
            volume, tf, cam, cfg, early_eps=0.0, interpret=True,
            block_x=8, manual=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_streamed_lighting_matches_xla(scene):
    """Streamed baked lighting (manual DMA + u8-quantized (M, S) pack,
    VERDICT r3 item 3): matches the XLA Phong renderer within the
    documented quantization bound, both visit directions + scattering."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    rng = np.random.default_rng(23)
    volume = make_volume(rng.uniform(0, 255, (20, 12, 11)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=20, height=14, samples_per_ray=40,
                       lighting=True)
    for pos in ((0.35, 0.45, 0.85), (-0.5, 0.3, -0.8)):
        cam = Camera.initial(position=pos)
        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(
            render_vrc_pallas_streamed(
                volume, tf, cam, cfg, early_eps=0.0, interpret=True,
                block_x=8,
            )
        )
        # u8 affine quantization of (M, S): error <= ranges/510 (~2e-3
        # for the default light), below the 1/255 8-bit output floor
        np.testing.assert_allclose(got, want, atol=6e-3)

    # scattering folds into the streamed additive slot
    cfg_s = RenderConfig(width=20, height=14, samples_per_ray=40,
                         scattering=True)
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    want = np.asarray(render_vrc(volume, tf, cam, cfg_s, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_streamed(
            volume, tf, cam, cfg_s, early_eps=0.0, interpret=True,
            block_x=8,
        )
    )
    np.testing.assert_allclose(got, want, atol=6e-3)


def test_streamed_lighting_z_over_256(scene):
    """The ms pack's multi-z-row layout (nzr = ceil(d3/256) > 1): a
    z = 300 volume shades correctly through the streamed factors."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    rng = np.random.default_rng(29)
    volume = make_volume(rng.uniform(0, 255, (8, 6, 300)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=12, height=10, samples_per_ray=32,
                       lighting=True)
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_vrc_pallas_streamed(
            volume, tf, cam, cfg, early_eps=0.0, interpret=True,
            block_x=8,
        )
    )
    np.testing.assert_allclose(got, want, atol=6e-3)


def test_streamed_lit_quantization_exact_when_flat(scene):
    """With ambient=1, diffuse=specular=0 the baked factors are constant
    (M = 1, S = 0): quantization is exact and the streamed-lit render
    must match the unlit streamed render bit-for-bit — isolates the ms
    plumbing from the quantization."""
    import dataclasses

    import jax.numpy as jnp

    from volumerenderingproject_tpu.ops import phong
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    rng = np.random.default_rng(31)
    volume = make_volume(rng.uniform(0, 255, (20, 12, 11)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    flat = dataclasses.replace(
        phong.default_light(),
        ambient=jnp.asarray(1.0, jnp.float32),
        diffuse=jnp.asarray(0.0, jnp.float32),
        specular=jnp.asarray(0.0, jnp.float32),
    )
    cfg_lit = RenderConfig(width=20, height=14, samples_per_ray=40,
                           lighting=True)
    cfg_plain = RenderConfig(width=20, height=14, samples_per_ray=40)
    got = np.asarray(render_vrc_pallas_streamed(
        volume, tf, cam, cfg_lit, early_eps=0.0, interpret=True,
        block_x=8, light=flat))
    want = np.asarray(render_vrc_pallas_streamed(
        volume, tf, cam, cfg_plain, early_eps=0.0, interpret=True,
        block_x=8))
    np.testing.assert_array_equal(got, want)


def test_streamed_manual_block_major_matches(scene):
    """manual_block_major (round-4 VERDICT item 6): one invocation, blocks
    outer (each DMA'd ONCE per frame), tiles inner with per-tile (C, T)
    state in the VMEM outputs — parity vs the XLA renderer across both
    visit directions, lit/scattered (quantized bound), and LUT."""
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    rng = np.random.default_rng(11)
    volume = make_volume(
        rng.uniform(0, 255, (24, 12, 11)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=32, height=32, samples_per_ray=24)
    for pos in ((0.35, 0.45, 0.85), (-0.5, 0.3, -0.8)):
        cam = Camera.initial(position=pos)
        want = np.asarray(render_vrc(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(render_vrc_pallas_streamed(
            volume, tf, cam, cfg, early_eps=0.0, block_x=8,
            manual_block_major=True, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=str(pos))
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    for kw, tol in ((dict(lighting=True), 6e-3),
                    (dict(scattering=True), 6e-3),
                    (dict(tf_lut=64), 2e-5)):
        c = cfg.replace(**kw)
        want = np.asarray(render_vrc(volume, tf, cam, c, mode="fast"))
        got = np.asarray(render_vrc_pallas_streamed(
            volume, tf, cam, c, early_eps=0.0, block_x=8,
            manual_block_major=True, interpret=True))
        err = np.abs(got - want).max()
        assert err <= tol, (kw, err)
