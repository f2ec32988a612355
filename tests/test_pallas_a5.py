"""Fused a5/TEST Pallas kernel (ops/pallas_a5.py) vs the XLA scan renderer.

Interpret mode on the CPU test mesh; the same code compiles for TPU.
"""

import dataclasses

import numpy as np
import pytest

from volumerenderingproject_tpu import (
    Camera,
    RenderConfig,
    default_transfer_function,
    make_volume,
)
from volumerenderingproject_tpu.ingest import synthetic
from volumerenderingproject_tpu.models.raycast import render_test
from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    vol_np = rng.uniform(0.0, 255.0, size=(10, 12, 11)).astype(np.float32)
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=20, height=14, samples_per_ray=40)
    return volume, tf, cam, cfg


def test_a5_pallas_matches_xla(scene):
    volume, tf, cam, cfg = scene
    want = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                           interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_a5_pallas_sphere_and_nonsquare(scene):
    _, tf, cam, _ = scene
    volume = synthetic.centered_sphere(24)
    cfg = RenderConfig(width=33, height=17, samples_per_ray=25)
    want = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                           interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_a5_pallas_early_termination_close(scene):
    volume, tf, cam, cfg = scene
    exact = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                           interpret=True))
    early = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=1e-3,
                           interpret=True))
    assert np.abs(early - exact).max() < 2e-3  # bounded by eps * max color


def test_a5_steps_invariance(scene):
    """Chunk depth (``steps``) must be value-identical at early_eps=0:
    per-sample math is in-order, so depth only regroups the chunk loop.
    On the chip this is BIT-exact (asserted by benchmarks/
    tpu_round5_job7.py j7c_*); under interpret mode XLA:CPU contracts
    fma differently per loop structure, leaving ~1e-7 reassociation
    noise, so this guard uses a tight tolerance instead.  With early
    termination ON the exit is checked per chunk, so stop points
    quantize to the depth and depths may differ — but only by O(eps)
    (the round-5 j7 chip sweep, DESIGN §8e).  Guards both halves of
    that contract."""
    volume, tf, cam, cfg = scene
    base = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                           interpret=True, steps=16))
    for steps in (4, 24):
        got = np.asarray(
            render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                               interpret=True, steps=steps))
        np.testing.assert_allclose(got, base, atol=1e-6,
                                   err_msg=f"steps={steps}")
    et16 = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=1e-3,
                           interpret=True, steps=16))
    et24 = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=1e-3,
                           interpret=True, steps=24))
    assert np.abs(et24 - et16).max() < 2e-3  # bounded by eps * max color


def test_a5_pallas_z_wrap_quirk():
    """A sample whose z+1 corner tap falls at z == d3 must read the NEXT
    row's first voxel (the reference's flat-index wrap, kernel.cu:129-159) —
    the staging's lane-d3 slot. The XLA renderer already replicates the
    quirk, so agreement on a volume with a hot (y+1, z=0) neighbor next to
    a boundary sample proves the wrap is live."""
    tf = default_transfer_function()
    vol_np = np.zeros((6, 6, 6), np.float32)
    vol_np[2, 3, 0] = 150.0  # the wrap target of (x=2, y=2, z=5)'s z+1 tap
    vol_np[2, 2, 5] = 150.0
    volume = make_volume(vol_np)
    cam = Camera.initial(position=(0.1, 0.2, 0.95))
    cfg = RenderConfig(width=16, height=16, samples_per_ray=24)
    want = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                           interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_a5_pallas_baked_lighting_matches_xla(scene):
    """a5 + Phong via baked per-voxel (M, S) factor grids must match the
    XLA lit render for central, sobel, and pre-smoothed normals."""
    volume, tf, cam, cfg = scene
    for kw in ({}, {"gradient_filter": "sobel"}, {"presmooth_sigma": 1.0}):
        cfg2 = cfg.replace(lighting=True, **kw)
        want = np.asarray(render_test(volume, tf, cam, cfg2, mode="fast"))
        got = np.asarray(
            render_test_pallas(volume, tf, cam, cfg2, early_eps=0.0,
                               interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(kw))
    # shading must actually change the image
    unlit = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))
    assert np.abs(want - unlit).max() > 1e-3


def test_a5_baked_light_feasibility():
    from volumerenderingproject_tpu.ops.pallas_a5 import (
        a5_baked_light_feasible,
    )

    assert a5_baked_light_feasible((91, 109, 91))  # avg152
    assert not a5_baked_light_feasible((300, 300, 120))  # 3 grids >> VMEM
    assert not a5_baked_light_feasible((10, 10, 200))  # z over the lanes


def test_a5_packed_matches_xla():
    """z > 127 routes to the packed 4-bit interval-id grid (VERDICT round-2
    item 3) — exact vs the XLA renderer, including negative intensities
    (the a5 classify has no negative clamp, PARITY C4)."""
    rng = np.random.default_rng(9)
    vol_np = rng.uniform(-30.0, 255.0, size=(12, 14, 150)).astype(np.float32)
    volume = make_volume(vol_np)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=20, height=18, samples_per_ray=40)
    want = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                           interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_a5_packed_wrap_quirks():
    """Packed-grid wraps: the z+1 tap at z == d3-1 reads the wrap slot
    (next row's voxel 0) and a y+1 tap at y == d2-1 normalizes into the
    next x row — same oracle-agreement scheme as the f32 wrap test, on a
    z > 127 volume with hot voxels at the wrap targets."""
    tf = default_transfer_function()
    vol_np = np.zeros((6, 6, 130), np.float32)
    vol_np[2, 3, 0] = 150.0  # wrap target of (x=2, y=2, z=129)'s z+1 tap
    vol_np[2, 2, 129] = 150.0
    vol_np[3, 0, 64] = 150.0  # y-wrap target of (x=2, y=5, z=64)
    vol_np[2, 5, 64] = 150.0
    volume = make_volume(vol_np)
    cam = Camera.initial(position=(0.1, 0.2, 0.95))
    cfg = RenderConfig(width=16, height=16, samples_per_ray=24)
    want = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))
    got = np.asarray(
        render_test_pallas(volume, tf, cam, cfg, early_eps=0.0,
                           interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_a5_packed_geometry_mni_scale():
    from volumerenderingproject_tpu.ops.pallas_a5 import a5_packed_geometry

    zp = a5_packed_geometry((182, 218, 182), 4)  # MNI-1mm class
    assert zp is not None
    zw, ypack, nyg = zp
    assert (182 + 1) <= zw * 8 and ypack * zw <= 128
    assert a5_packed_geometry((10, 10, 1030), 4) is None  # z over 1023
    assert a5_packed_geometry((10, 10, 150), 20) is None  # ids over a nibble


def test_a5_diff_values_and_grads():
    """Fused differentiable a5 (render_test_pallas_diff): values equal the
    XLA a5 scan and TF-color gradients match jax.grad — f32 and packed."""
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu.ops.pallas_a5 import (
        render_test_pallas_diff,
    )
    from volumerenderingproject_tpu.scene.transfer_function import (
        TransferFunction,
    )

    rng = np.random.default_rng(31)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=18, height=13, samples_per_ray=30)
    target = jnp.asarray(
        rng.uniform(0, 1, size=(18, 13, 4)).astype(np.float32))

    for shape in ((9, 11, 10), (9, 11, 150)):
        volume = make_volume(
            rng.uniform(0.0, 255.0, size=shape).astype(np.float32))
        want = np.asarray(render_test(volume, tf, cam, cfg, mode="fast"))
        got = np.asarray(render_test_pallas_diff(
            volume, tf, cam, cfg, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(shape))

        def loss(render_fn):
            def f(colors):
                tf2 = TransferFunction(lower=tf.lower, upper=tf.upper,
                                       colors=colors, hg_g=tf.hg_g)
                img = render_fn(volume, tf2)
                return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

            return f

        g_p = np.asarray(jax.grad(loss(
            lambda v, t2: render_test_pallas_diff(
                v, t2, cam, cfg, interpret=True)))(tf.colors))
        g_x = np.asarray(jax.grad(loss(
            lambda v, t2: render_test(v, t2, cam, cfg, mode="fast")))(
                tf.colors))
        scale = np.abs(g_x).max() + 1e-12
        np.testing.assert_allclose(g_p, g_x, rtol=5e-3, atol=scale * 1e-4,
                                   err_msg=str(shape))
        assert np.abs(g_x).max() > 0


def test_a5_lit_packed_streamed_ms(scene):
    """Lit/scattered PACKED a5 (z > 127, VERDICT r3 item 2): the
    u8-quantized (M, S) pack streams per x-block with manual DMA while
    the 4-bit id grid stays resident — parity vs the XLA a5 renderer
    within the quantization bound."""
    import numpy as np

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas

    import volumerenderingproject_tpu.ops.pallas_a5 as a5mod

    rng = np.random.default_rng(41)
    volume = make_volume(
        rng.uniform(0, 255, (18, 12, 140)).astype(np.float32))
    tf = default_transfer_function()
    # force a small (M, S) slot so the tiny test volume spans MULTIPLE
    # blocks (the default 3.5 MB budget would make it one block and the
    # block-boundary/ownership/DMA machinery would go untested)
    saved = a5mod._A5_MS_SLOT_BUDGET
    a5mod._A5_MS_SLOT_BUDGET = 8 * 12 * 512  # 8-plane blocks -> 3 blocks
    try:
        for kw in (dict(lighting=True), dict(scattering=True),
                   dict(lighting=True, scattering=True)):
            cfg = RenderConfig(width=16, height=12, samples_per_ray=24,
                               **kw)
            for pos in ((0.35, 0.45, 0.85), (-0.5, 0.3, -0.8)):
                cam = Camera.initial(position=pos)
                want = np.asarray(render_test(volume, tf, cam, cfg,
                                              mode="fast"))
                got = np.asarray(render_test_pallas(
                    volume, tf, cam, cfg, early_eps=0.0, interpret=True))
                np.testing.assert_allclose(
                    got, want, atol=6e-3, err_msg=f"{kw} {pos}")
    finally:
        a5mod._A5_MS_SLOT_BUDGET = saved


def test_a5_lit_packed_flat_light_exact(scene):
    """Flat light (ambient=1, diffuse=specular=0): quantization is exact,
    so the ms-streamed lit render equals the unlit packed render
    bit-for-bit — isolates block/ownership/DMA plumbing."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.ops import phong
    from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas

    rng = np.random.default_rng(43)
    volume = make_volume(
        rng.uniform(0, 255, (18, 12, 140)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    flat = dataclasses.replace(
        phong.default_light(),
        ambient=jnp.asarray(1.0, jnp.float32),
        diffuse=jnp.asarray(0.0, jnp.float32),
        specular=jnp.asarray(0.0, jnp.float32),
    )
    cfg_lit = RenderConfig(width=16, height=12, samples_per_ray=24,
                           lighting=True)
    cfg_plain = RenderConfig(width=16, height=12, samples_per_ray=24)
    got = np.asarray(render_test_pallas(
        volume, tf, cam, cfg_lit, early_eps=0.0, interpret=True,
        light=flat))
    want = np.asarray(render_test_pallas(
        volume, tf, cam, cfg_plain, early_eps=0.0, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_a5_id_stream_blocks():
    """Streamed 4-bit id grid (round-4 VERDICT item 4): 512^3-class a5
    volumes whose id grid exceeds the resident VMEM budget stream it per
    x-block with manual DMA — parity vs the XLA a5 scan across block
    boundaries, both march directions, lit and scattered."""
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.ops.pallas_a5 import (
        render_test_pallas,
    )

    rng = np.random.default_rng(9)
    volume = make_volume(
        rng.uniform(-30, 255, (24, 14, 150)).astype(np.float32))
    tf = default_transfer_function()
    cfg = RenderConfig(width=32, height=32, samples_per_ray=24)
    for pos in ((0.35, 0.45, 0.85), (-0.7, 0.2, 0.6)):
        cam = Camera.initial(position=pos)
        for kw, tol in (({}, 2e-5), (dict(lighting=True), 6e-3),
                        (dict(scattering=True), 6e-3)):
            c = cfg.replace(**kw)
            want = np.asarray(render_test(volume, tf, cam, c, mode="fast"))
            got = np.asarray(render_test_pallas(
                volume, tf, cam, c, early_eps=0.0, interpret=True,
                id_stream_block=8))
            err = np.abs(got - want).max()
            assert err <= tol, (pos, kw, err)


def test_a5_streamed_diff_values_and_grads():
    """Beyond-VMEM a5 training (render_test_pallas_diff_streamed): the
    id grid streams per x-block through the custom_vjp core — values
    equal the XLA a5 scan and TF-color gradients match jax.grad, across
    multi-block decompositions, both march directions, and with
    TF(0).alpha > 0 (out-of-volume samples owned by the edge blocks)."""
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu.ops.pallas_a5 import (
        render_test_pallas_diff_streamed,
    )
    from volumerenderingproject_tpu.scene.transfer_function import (
        TransferFunction,
    )

    rng = np.random.default_rng(17)
    volume = make_volume(
        rng.uniform(-30, 255, (24, 14, 150)).astype(np.float32))
    tf0 = default_transfer_function()
    # TF(0).alpha > 0: outside samples render AND carry gradients
    colors0 = np.asarray(tf0.colors).copy()
    colors0[0, 3] = 0.05
    cfg = RenderConfig(width=20, height=14, samples_per_ray=24)
    target = jnp.asarray(
        rng.uniform(0, 1, size=(20, 14, 4)).astype(np.float32))

    def loss(render_fn, tf):
        def f(colors):
            tf2 = TransferFunction(lower=tf.lower, upper=tf.upper,
                                   colors=colors, hg_g=tf.hg_g)
            img = render_fn(tf2)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        return f

    for pos in ((0.35, 0.45, 0.85), (-0.7, 0.2, 0.6)):
        cam = Camera.initial(position=pos)
        for c0a in (None, colors0):
            tf = tf0 if c0a is None else TransferFunction(
                lower=tf0.lower, upper=tf0.upper,
                colors=jnp.asarray(c0a), hg_g=tf0.hg_g)
            want = np.asarray(render_test(volume, tf, cam, cfg,
                                          mode="fast"))
            got = np.asarray(render_test_pallas_diff_streamed(
                volume, tf, cam, cfg, interpret=True, id_stream_block=8))
            np.testing.assert_allclose(
                got, want, atol=1e-5, err_msg=str((pos, c0a is None)))

            g_s = np.asarray(jax.grad(loss(
                lambda t2: render_test_pallas_diff_streamed(
                    volume, t2, cam, cfg, interpret=True,
                    id_stream_block=8), tf))(tf.colors))
            g_x = np.asarray(jax.grad(loss(
                lambda t2: render_test(volume, t2, cam, cfg, mode="fast"),
                tf))(tf.colors))
            scale = np.abs(g_x).max() + 1e-12
            np.testing.assert_allclose(
                g_s, g_x, rtol=5e-3, atol=scale * 1e-4,
                err_msg=str((pos, c0a is None)))
            assert np.abs(g_x).max() > 0
