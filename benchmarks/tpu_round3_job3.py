"""Round-3 TPU job 3: finer lit-tile sweep, BASELINE config 4, variance.

  * finer tiles around the 16x16x16 winner for baked-lit (8x16 and
    16x16 shapes, different step batching), plus plain/LUT at 16x16x16
    for a like-for-like view of the tile effect.
  * BASELINE config 4 (700^2 x 250, convolution pre-filtered normals +
    shading) — first fused measurement: sobel and presmooth gradient
    filters only run in the kernel since the baked-lighting work.
  * resident 700^2 x 500 three times in a row to bound within-process
    run-to-run variance (cross-job numbers ranged 10.3-15.5 ms on
    identical code; see tpu_round3_results r3b_resident_700_500_clean).

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
    )
    from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
    from volumerenderingproject_tpu.scene.camera import Camera

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    tf = default_transfer_function()
    vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")

    def make_cams(jitter):
        thetas = np.linspace(0, 2 * np.pi, FRAMES + 1)[:FRAMES] + jitter
        cams = [Camera.initial(position=(1.2 * np.cos(t), 0.4,
                                         1.2 * np.sin(t)))
                for t in thetas]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    def bench(cfg, label, reps=3, **kw):
        def orbit(v_, t_, cams):
            def frame(carry, cam):
                img = render_vrc_pallas(v_, t_, cam, cfg, early_eps=1e-3,
                                        **kw)
                return carry + img[0, 0], None

            probe, _ = jax.lax.scan(
                frame, jnp.zeros((4,), jnp.float32), cams)
            return probe

        f = jax.jit(orbit)
        rng = np.random.default_rng(0)
        t0 = time.time()
        np.asarray(f(vol, tf, make_cams(rng.random(FRAMES) * 1e-4)))
        print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)
        ts = []
        for _ in range(reps):
            cams = make_cams(rng.random(FRAMES) * 1e-4)
            t0 = time.time()
            np.asarray(f(vol, tf, cams))
            ts.append(time.time() - t0)
        ms = min(ts) / FRAMES * 1e3
        results[label] = {"ms_per_frame": ms, "all_reps_ms": [
            t / FRAMES * 1e3 for t in ts]}
        print(label, f"{ms:.2f} ms/frame", flush=True)
        save()

    c304 = RenderConfig(width=304, height=304, samples_per_ray=300)
    lit = c304.replace(lighting=True)
    lutlit = c304.replace(lighting=True, tf_lut=256)

    # finer sweep around the 16x16x16 winner
    for tile in ((16, 16, 8), (16, 16, 32), (8, 16, 8), (8, 16, 16)):
        tag = f"{tile[0]}x{tile[1]}x{tile[2]}"
        bench(lit, f"r3c_baked_lit_{tag}", tile=tile)
    # like-for-like: plain + LUT at the lit-optimal tile
    bench(c304, "r3c_plain_16x16x16", tile=(16, 16, 16))
    bench(c304.replace(tf_lut=256), "r3c_lut_16x16x16", tile=(16, 16, 16))
    bench(lutlit, "r3c_baked_lutlit_default")  # auto tile heuristic

    # BASELINE config 4: 700^2 x 250, pre-filtered normals + shading
    cfg4 = RenderConfig(width=700, height=700, samples_per_ray=250,
                        lighting=True, gradient_filter="sobel")
    bench(cfg4, "r3c_config4_700_250_sobel_lit")
    cfg4b = cfg4.replace(gradient_filter="central", presmooth_sigma=1.0)
    bench(cfg4b, "r3c_config4_700_250_presmooth_lit")

    # within-process variance bound on the flagship config
    big = RenderConfig(width=700, height=700, samples_per_ray=500)
    for i in range(3):
        bench(big, f"r3c_resident_700_500_run{i}", reps=3)
    print("job3 done", flush=True)


if __name__ == "__main__":
    main()
