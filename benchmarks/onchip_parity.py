"""On-chip parity gate: every fused kernel path vs the XLA renderer.

Interpret-mode tests prove nothing about Mosaic lowering (round-4
lesson: the matmul-precision bug hid behind three rounds of green CPU
parity).  This script compiles and runs EVERY kernel path on the real
chip and asserts tight tolerances against the XLA oracle.  Run it after
any kernel change; it appends a summary to
benchmarks/onchip_parity.json.

Paths covered (one process, so the relay queue is paid once):
  a1: f32 rows, packed ids, dense-LUT, in-kernel lit (conic), baked lit,
      baked lit + LUT, scattering, lit+scattering, multichannel
  a5: f32 rows, packed ids (z > 127), baked lit, scattering, segment
      compose, diff forward + TF-color grads
  streamed: manual (default), tile-major, block-major, LUT, -x order
  smooth: forward + (colors, bounds, volume) grads vs jax.grad
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "onchip_parity.json")


def main():
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import (
        render_test,
        render_vrc,
    )
    from volumerenderingproject_tpu.ops import composite as comp
    from volumerenderingproject_tpu.ops.pallas_a5 import (
        render_test_pallas,
        render_test_pallas_diff,
    )
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas,
        render_vrc_pallas_streamed,
    )
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff,
    )
    from volumerenderingproject_tpu.ops.pallas_smooth import (
        render_vrc_smooth_pallas,
    )
    from volumerenderingproject_tpu.utils.config import Interp

    results = {}
    rng = np.random.default_rng(9)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=32, height=32, samples_per_ray=24)

    vol_small = make_volume(
        rng.uniform(-30, 255, (12, 14, 100)).astype(np.float32))
    vol_deep = make_volume(
        rng.uniform(-30, 255, (12, 14, 150)).astype(np.float32))
    vol_mc = make_volume(
        rng.uniform(0, 255, (12, 14, 10, 3)).astype(np.float32))

    def check(name, got, want, tol):
        err = float(np.abs(np.asarray(got) - np.asarray(want)).max())
        results[name] = err
        status = "OK " if err <= tol else "FAIL"
        print(f"{status} {name}: max err {err:.2e} (tol {tol:g})",
              flush=True)
        assert err <= tol, (name, err)

    # ---- a1 -------------------------------------------------------------
    for name, v, kw in (
        ("a1_f32", vol_small, {}),
        ("a1_packed", vol_deep, {}),
        ("a1_lut", vol_small, dict(tf_lut=64)),
        ("a1_lit_conic", vol_small, dict(lighting=True, conic=True)),
        ("a1_lit_baked", vol_small, dict(lighting=True)),
        ("a1_lit_lut", vol_small, dict(lighting=True, tf_lut=64)),
        ("a1_scatter", vol_small, dict(scattering=True)),
        ("a1_lit_scatter", vol_small, dict(lighting=True, scattering=True)),
        ("a1_sobel_lit", vol_small,
         dict(lighting=True, gradient_filter="sobel")),
        ("a1_multichannel", vol_mc, {}),
    ):
        c = cfg.replace(**kw)
        check(name, render_vrc_pallas(v, tf, cam, c, early_eps=0.0),
              render_vrc(v, tf, cam, c, mode="fast"), 2e-5)

    # ---- a5 -------------------------------------------------------------
    for name, v, kw in (
        ("a5_f32", vol_small, {}),
        ("a5_packed", vol_deep, {}),
        ("a5_lit_baked", vol_small, dict(lighting=True)),
        ("a5_scatter", vol_small, dict(scattering=True)),
    ):
        c = cfg.replace(**kw)
        check(name, render_test_pallas(v, tf, cam, c, early_eps=0.0),
              render_test(v, tf, cam, c, mode="fast"), 2e-5)

    # lit/scattered PACKED a5 (z > 127): the u8-quantized (M, S) pack
    # streamed per x-block (ms_stream) — quantization-bound tolerance
    for name, kw in (("a5_lit_packed_ms", dict(lighting=True)),
                     ("a5_scatter_packed_ms", dict(scattering=True))):
        c = cfg.replace(**kw)
        check(name, render_test_pallas(vol_deep, tf, cam, c, early_eps=0.0),
              render_test(vol_deep, tf, cam, c, mode="fast"), 6e-3)
    # force MULTI-block ms streaming at this scale (the default 3.5 MB
    # slot makes the small test volume one block, which would leave the
    # on-chip block-boundary/ownership/DMA machinery ungated)
    import volumerenderingproject_tpu.ops.pallas_a5 as _a5mod

    _saved_budget = _a5mod._A5_MS_SLOT_BUDGET
    _a5mod._A5_MS_SLOT_BUDGET = 8 * vol_deep.dims[1] * 512
    try:
        c = cfg.replace(lighting=True)
        check("a5_lit_packed_ms_multiblock",
              render_test_pallas(vol_deep, tf, cam, c, early_eps=0.0),
              render_test(vol_deep, tf, cam, c, mode="fast"), 6e-3)
    finally:
        _a5mod._A5_MS_SLOT_BUDGET = _saved_budget

    # streamed 4-bit id grid (round-5: 512^3-class a5) — forced small
    # blocks so the block-boundary/margin/DMA machinery is gated on chip
    for name, kw, tol in (("a5_id_stream", {}, 2e-5),
                          ("a5_id_stream_lit", dict(lighting=True), 6e-3)):
        c = cfg.replace(**kw)
        check(name,
              render_test_pallas(vol_deep, tf, cam, c, early_eps=0.0,
                                 id_stream_block=8),
              render_test(vol_deep, tf, cam, c, mode="fast"), tol)

    # a5 segments composed
    want = render_test(vol_small, tf, cam, cfg, mode="fast")
    segs = []
    for ri in range(2):
        row = [render_test_pallas(
            vol_small, tf, cam, cfg, early_eps=0.0, x_offset=ri * 16,
            local_width=16, s_start=si * 12, s_count=12, segment=True)
            for si in range(2)]
        seg = comp.segment_compose(row[0], row[1])
        segs.append(np.asarray(comp.segment_finalize(
            seg, jnp.asarray(cfg.background, jnp.float32))))
    check("a5_segments", np.concatenate(segs, axis=0), want, 2e-5)

    # a5 diff forward + grads
    target = jnp.asarray(rng.uniform(0, 1, (32, 32, 4)).astype(np.float32))
    check("a5_diff_fwd",
          render_test_pallas_diff(vol_small, tf, cam, cfg), want, 2e-5)

    def loss(fn):
        def f(colors):
            tf2 = dataclasses.replace(tf, colors=colors)
            img = fn(tf2)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        return f

    g_p = jax.jit(jax.grad(loss(
        lambda t2: render_test_pallas_diff(vol_small, t2, cam, cfg))))(
            tf.colors)
    g_x = jax.grad(loss(
        lambda t2: render_test(vol_small, t2, cam, cfg, mode="fast")))(
            tf.colors)
    scale = float(jnp.abs(g_x).max()) + 1e-12
    check("a5_diff_grads", g_p / scale, g_x / scale, 5e-3)

    # a5 STREAMED diff (beyond-VMEM a5 training): forced small blocks so
    # the backward's block-boundary/ownership/double-DMA machinery is
    # gated on chip
    from volumerenderingproject_tpu.ops.pallas_a5 import (
        render_test_pallas_diff_streamed,
    )

    want_deep = render_test(vol_deep, tf, cam, cfg, mode="fast")
    check("a5_streamed_diff_fwd",
          render_test_pallas_diff_streamed(vol_deep, tf, cam, cfg,
                                           id_stream_block=8),
          want_deep, 2e-5)
    g_p = jax.jit(jax.grad(loss(
        lambda t2: render_test_pallas_diff_streamed(
            vol_deep, t2, cam, cfg, id_stream_block=8))))(tf.colors)
    g_x = jax.grad(loss(
        lambda t2: render_test(vol_deep, t2, cam, cfg, mode="fast")))(
            tf.colors)
    scale = float(jnp.abs(g_x).max()) + 1e-12
    check("a5_streamed_diff_grads", g_p / scale, g_x / scale, 5e-3)

    # a1 diff grads (fused custom_vjp)
    wanta1 = render_vrc(vol_small, tf, cam, cfg, mode="fast")
    check("a1_diff_fwd",
          render_vrc_pallas_diff(vol_small, tf, cam, cfg), wanta1, 2e-5)
    g_p = jax.jit(jax.grad(loss(
        lambda t2: render_vrc_pallas_diff(vol_small, t2, cam, cfg))))(
            tf.colors)
    g_x = jax.grad(loss(
        lambda t2: render_vrc(vol_small, t2, cam, cfg, mode="fast")))(
            tf.colors)
    scale = float(jnp.abs(g_x).max()) + 1e-12
    check("a1_diff_grads", g_p / scale, g_x / scale, 5e-3)

    # ---- streamed -------------------------------------------------------
    vol_str = make_volume(
        rng.uniform(0, 255, (24, 12, 11)).astype(np.float32))
    for pos in ((0.35, 0.45, 0.85), (-0.5, 0.3, -0.8)):
        camd = Camera.initial(position=pos)
        wantd = render_vrc(vol_str, tf, camd, cfg, mode="fast")
        tag = "px" if pos[0] > 0 else "nx"
        for mode, kw in (("manual", dict(manual=True,
                                         manual_block_major=False)),
                         ("mbm", dict(manual_block_major=True)),
                         ("tile", dict(manual=False, block_major=False)),
                         ("block", dict(manual=False, block_major=True))):
            check(f"streamed_{mode}_{tag}",
                  render_vrc_pallas_streamed(
                      vol_str, tf, camd, cfg, early_eps=0.0, block_x=8,
                      **kw),
                  wantd, 2e-5)
    # streamed lighting/scattering (u8-quantized (M, S) pack): tolerance
    # is the documented quantization bound, not kernel drift — the flat-
    # light case below pins the plumbing itself at bit-exact
    for name, kw in (("streamed_lit", dict(lighting=True)),
                     ("streamed_scatter", dict(scattering=True)),
                     ("streamed_lit_scatter",
                      dict(lighting=True, scattering=True))):
        c = cfg.replace(**kw)
        check(name,
              render_vrc_pallas_streamed(
                  vol_str, tf, cam, c, early_eps=0.0, block_x=8,
                  manual=True),
              render_vrc(vol_str, tf, cam, c, mode="fast"), 6e-3)
    import dataclasses as _dc

    from volumerenderingproject_tpu.ops import phong as _phong

    _flat = _dc.replace(
        _phong.default_light(),
        ambient=jnp.asarray(1.0, jnp.float32),
        diffuse=jnp.asarray(0.0, jnp.float32),
        specular=jnp.asarray(0.0, jnp.float32))
    check("streamed_lit_flat_exact",
          render_vrc_pallas_streamed(
              vol_str, tf, cam, cfg.replace(lighting=True), early_eps=0.0,
              block_x=8, manual=True, light=_flat),
          render_vrc_pallas_streamed(
              vol_str, tf, cam, cfg, early_eps=0.0, block_x=8,
              manual=True), 0.0)
    check("streamed_manual_lut",
          render_vrc_pallas_streamed(
              vol_str, tf, cam, cfg.replace(tf_lut=64), early_eps=0.0,
              block_x=8, manual=True),
          render_vrc(vol_str, tf, cam, cfg.replace(tf_lut=64),
                     mode="fast"), 2e-5)

    # ---- scattering + LUT DIFF (round-5: item 7) -----------------------
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_scatter,
    )

    for name, kw, fn in (
        ("scatter_diff", dict(scattering=True),
         render_vrc_pallas_diff_scatter),
        ("lut_diff", dict(tf_lut=64), render_vrc_pallas_diff),
        ("lut_lit_diff", dict(tf_lut=64, lighting=True),
         render_vrc_pallas_diff),
    ):
        c = cfg.replace(**kw)
        wantk = render_vrc(vol_small, tf, cam, c, mode="fast")
        check(f"{name}_fwd", fn(vol_small, tf, cam, c), wantk, 2e-5)
        g_p = jax.jit(jax.grad(loss(
            lambda t2, fn=fn, c=c: fn(vol_small, t2, cam, c))))(tf.colors)
        g_x = jax.grad(loss(
            lambda t2, c=c: render_vrc(vol_small, t2, cam, c,
                                       mode="fast")))(tf.colors)
        scale = float(jnp.abs(g_x).max()) + 1e-12
        check(f"{name}_grads", g_p / scale, g_x / scale, 5e-3)

    # ---- multichannel DIFF (round-5) -----------------------------------
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_multichannel,
    )

    want_mc = render_vrc(vol_mc, tf, cam, cfg, mode="fast")
    check("mc_diff_fwd",
          render_vrc_pallas_diff_multichannel(vol_mc, tf, cam, cfg),
          want_mc, 2e-5)
    g_p = jax.jit(jax.grad(loss(
        lambda t2: render_vrc_pallas_diff_multichannel(
            vol_mc, t2, cam, cfg))))(tf.colors)
    g_x = jax.grad(loss(
        lambda t2: render_vrc(vol_mc, t2, cam, cfg, mode="fast")))(
            tf.colors)
    scale = float(jnp.abs(g_x).max()) + 1e-12
    check("mc_diff_grads", g_p / scale, g_x / scale, 5e-3)

    # ---- streamed DIFF (round-5: beyond-VMEM training tier) ------------
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_streamed,
    )

    want_str = render_vrc(vol_str, tf, cam, cfg, mode="fast")
    check("streamed_diff_fwd",
          render_vrc_pallas_diff_streamed(vol_str, tf, cam, cfg,
                                          block_x=8),
          want_str, 2e-5)
    g_p = jax.jit(jax.grad(loss(
        lambda t2: render_vrc_pallas_diff_streamed(
            vol_str, t2, cam, cfg, block_x=8))))(tf.colors)
    g_x = jax.grad(loss(
        lambda t2: render_vrc(vol_str, t2, cam, cfg, mode="fast")))(
            tf.colors)
    scale = float(jnp.abs(g_x).max()) + 1e-12
    check("streamed_diff_grads", g_p / scale, g_x / scale, 5e-3)

    # ---- slab DIFF segments (round-5: volume-sharded training) ---------
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_segment,
    )

    half = vol_str.dims[0] // 2
    # slab visibility order must be decided OUTSIDE the jit trace
    # (cam.front is a computed property -> a tracer inside)
    front_pos = float(cam.front[0]) >= 0

    def slab_img(t2):
        segs = []
        for vi in range(2):
            v2 = dataclasses.replace(
                vol_str,
                data=jax.lax.dynamic_slice_in_dim(
                    vol_str.data.reshape(vol_str.dims), vi * half, half,
                    axis=0))
            segs.append(render_vrc_pallas_diff_segment(
                v2, t2, cam, cfg, x0=vi * half, slab_x=half))
        order = segs if front_pos else segs[::-1]
        seg = comp.segment_compose(order[0], order[1])
        return comp.segment_finalize(
            seg, jnp.asarray(cfg.background, jnp.float32))

    check("slab_diff_fwd", jax.jit(slab_img)(tf), want_str, 2e-5)
    g_p = jax.jit(jax.grad(loss(slab_img)))(tf.colors)
    check("slab_diff_grads", g_p / scale, g_x / scale, 5e-3)

    # ---- a5 DIFF segments (round-5: sharded a5 training) ---------------
    from volumerenderingproject_tpu.ops.pallas_a5 import (
        render_test_pallas_diff_segment,
    )

    def a5_seg_img(t2):
        row = [render_test_pallas_diff_segment(
            vol_small, t2, cam, cfg, s_start=si * 12, s_count=12)
            for si in range(2)]
        seg = comp.segment_compose(row[0], row[1])
        return comp.segment_finalize(
            seg, jnp.asarray(cfg.background, jnp.float32))

    check("a5_diff_segments_fwd", jax.jit(a5_seg_img)(tf), want, 2e-5)
    g_p = jax.jit(jax.grad(loss(a5_seg_img)))(tf.colors)
    g_x5 = jax.grad(loss(
        lambda t2: render_test(vol_small, t2, cam, cfg, mode="fast")))(
            tf.colors)
    scale5 = float(jnp.abs(g_x5).max()) + 1e-12
    check("a5_diff_segments_grads", g_p / scale5, g_x5 / scale5, 5e-3)

    # 10-bit packed smooth mode (z > 128): quantization-bound tolerance
    cfg_sp = cfg.replace(interp=Interp.TRILINEAR, tf_sharpness=60.0)
    check("smooth_packed_fwd",
          render_vrc_smooth_pallas(vol_deep, tf, cam, cfg_sp),
          render_vrc(vol_deep, tf, cam, cfg_sp, mode="fast"), 2e-2)
    # x-dominant camera: rays enter through the x = 0 face, exercising
    # the ix == -1 boundary band whose packed y-group bounds round 5
    # fixed (ADVICE r4 medium — pallas_smooth group bounds from raw iy)
    cam_x = Camera.initial(position=(0.95, 0.1, 0.05))
    check("smooth_packed_fwd_xdom",
          render_vrc_smooth_pallas(vol_deep, tf, cam_x, cfg_sp),
          render_vrc(vol_deep, tf, cam_x, cfg_sp, mode="fast"), 2e-2)

    # ---- smooth ---------------------------------------------------------
    cfg_s = cfg.replace(interp=Interp.TRILINEAR, tf_sharpness=60.0)
    want_s = render_vrc(vol_small, tf, cam, cfg_s, mode="fast")
    check("smooth_fwd",
          render_vrc_smooth_pallas(vol_small, tf, cam, cfg_s), want_s,
          2e-5)

    def loss_s(colors, lower, upper, data):
        tf2 = dataclasses.replace(tf, colors=colors, lower=lower,
                                  upper=upper)
        v2 = dataclasses.replace(vol_small, data=data)
        img = render_vrc_smooth_pallas(v2, tf2, cam, cfg_s)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    def loss_x(colors, lower, upper, data):
        tf2 = dataclasses.replace(tf, colors=colors, lower=lower,
                                  upper=upper)
        v2 = dataclasses.replace(vol_small, data=data)
        img = render_vrc(v2, tf2, cam, cfg_s, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gp = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2, 3)))(
        tf.colors, tf.lower, tf.upper, vol_small.data)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(
        tf.colors, tf.lower, tf.upper, vol_small.data)
    for nm, a, b in zip(("colors", "lower", "upper", "volume"), gp, gx):
        scale = float(jnp.abs(b).max()) + 1e-12
        check(f"smooth_grad_{nm}", a / scale, b / scale, 5e-3)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"ALL {len(results)} paths within tolerance -> {OUT}",
          flush=True)


if __name__ == "__main__":
    main()
