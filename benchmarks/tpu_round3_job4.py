"""Round-3 TPU job 4: streamed block-size sweep + a5 baked lighting.

DESIGN §6 item 1 (take 2): attack the streamed mode's per-(tile, block)
fixed cost by shrinking the GRID — fewer, larger VMEM blocks — instead of
conditionally skipping steps (the bitmap regression, §4b).  320^3 packed:
block_x 72 (4 MB, nxb=5) vs 112 (6 MB, nxb=3) vs 160 (8.6 MB, nxb=2),
and a bigger ray tile for the streamed path.

Also the first on-chip run of the a5 kernel's baked lighting (three f32
grids ~15.4 MB on avg152 — near the VMEM edge; if Mosaic refuses, the
fallback is lowering _A5_BAKED_BUDGET so dispatch stays on XLA).

Appends to benchmarks/tpu_round3_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round3_results.json")
FRAMES = 8


def main():
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        load_nifti,
        make_volume,
    )
    from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )
    from volumerenderingproject_tpu.scene.camera import Camera

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    tf = default_transfer_function()

    def make_cams(jitter):
        thetas = np.linspace(0, 2 * np.pi, FRAMES + 1)[:FRAMES] + jitter
        cams = [Camera.initial(position=(1.2 * np.cos(t), 0.4,
                                         1.2 * np.sin(t)))
                for t in thetas]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    def bench(render_fn, v, cfg, label, reps=3, **kw):
        def orbit(v_, t_, cams):
            def frame(carry, cam):
                img = render_fn(v_, t_, cam, cfg, early_eps=1e-3, **kw)
                return carry + img[0, 0], None

            probe, _ = jax.lax.scan(
                frame, jnp.zeros((4,), jnp.float32), cams)
            return probe

        f = jax.jit(orbit)
        rng = np.random.default_rng(0)
        try:
            t0 = time.time()
            np.asarray(f(v, tf, make_cams(rng.random(FRAMES) * 1e-4)))
            print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)
        except Exception as e:  # RESOURCE_EXHAUSTED etc. — record + go on
            results[label] = {"error": str(e)[:300]}
            print(label, "FAILED:", str(e)[:200], flush=True)
            save()
            return
        ts = []
        for _ in range(reps):
            cams = make_cams(rng.random(FRAMES) * 1e-4)
            t0 = time.time()
            np.asarray(f(v, tf, cams))
            ts.append(time.time() - t0)
        ms = min(ts) / FRAMES * 1e3
        results[label] = {"ms_per_frame": ms}
        print(label, f"{ms:.2f} ms/frame", flush=True)
        save()

    # ---- streamed block-size / tile sweep (dense 320^3, static map) ----
    rng = np.random.default_rng(3)
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    s304 = RenderConfig(width=304, height=304, samples_per_ray=300)
    for bx in (72, 112, 160):
        bench(render_vrc_pallas_streamed, dense, s304,
              f"r3d_streamed_bx{bx}", block_x=bx)
    bench(render_vrc_pallas_streamed, dense, s304,
          "r3d_streamed_bx112_tile32x32x8", block_x=112,
          tile=(32, 32, 8))
    bench(render_vrc_pallas_streamed, dense, s304,
          "r3d_streamed_bx160_tile16x16x16", block_x=160,
          tile=(16, 16, 16))

    # ---- a5: unlit vs baked-lit on avg152 -------------------------------
    vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
    a5 = RenderConfig(width=304, height=304, samples_per_ray=300,
                      algorithm=5)
    bench(render_test_pallas, vol, a5, "r3d_a5_304")
    bench(render_test_pallas, vol, a5.replace(lighting=True),
          "r3d_a5_lit_304")

    # ---- TRUE baked-lit numbers ----------------------------------------
    # every earlier jitted "baked" bench silently ran the in-kernel path
    # (the uniformity check saw Tracers under jit); with the static
    # light=None rule this is the first real baked measurement.
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas,
    )

    c304 = RenderConfig(width=304, height=304, samples_per_ray=300)
    lit = c304.replace(lighting=True)
    for tile in ((16, 16, 16), (8, 16, 8), (32, 32, 16)):
        tag = f"{tile[0]}x{tile[1]}x{tile[2]}"
        bench(render_vrc_pallas, vol, lit, f"r3d_truebaked_lit_{tag}",
              tile=tile)
    bench(render_vrc_pallas, vol, c304.replace(lighting=True, tf_lut=256),
          "r3d_truebaked_lutlit")

    # BASELINE config 4 (job3 crashed here pre-fix): 700^2 x 250,
    # convolution pre-filtered normals + shading, fused via the bake
    cfg4 = RenderConfig(width=700, height=700, samples_per_ray=250,
                        lighting=True, gradient_filter="sobel")
    bench(render_vrc_pallas, vol, cfg4, "r3d_config4_700_250_sobel_lit")
    bench(render_vrc_pallas, vol,
          cfg4.replace(gradient_filter="central", presmooth_sigma=1.0),
          "r3d_config4_700_250_presmooth_lit")

    # within-process variance bound on the flagship config (job3 tail)
    big = RenderConfig(width=700, height=700, samples_per_ray=500)
    for i in range(3):
        bench(render_vrc_pallas, vol, big, f"r3d_resident_700_500_run{i}")
    print("job4 done", flush=True)


if __name__ == "__main__":
    main()
