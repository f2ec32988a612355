"""Round-4 TPU job 1: packed a5 kernel at MNI-1mm scale + parity on chip.

VERDICT round-2 item 3's done-criterion: an MNI-1mm-class (182x218x182)
a5 render within ~2x of the a1 kernel at equal workload, vs the ~1.8 s
XLA-scan cliff it replaced.  Measures (same process, min-of-reps):

  r4a_a5_packed_mni_304   fused packed a5, 182^3-class, 304^2 x 300
  r4a_a1_packed_mni_304   fused packed a1, same volume/workload
  r4a_a5_xla_mni_304      XLA scan a5 (the old fallback), 1 reps
  r4a_a5_packed_onchip_max_err   parity vs the XLA scan on chip

Appends to tpu_round4_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round4_results.json")
FRAMES = 8


def main():
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import (
        render_test,
        render_vrc,
    )
    from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas
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

    def make_cams(jitter):
        thetas = np.linspace(0, 2 * np.pi, FRAMES + 1)[:FRAMES] + jitter
        cams = [Camera.initial(position=(1.2 * np.cos(t), 0.4,
                                         1.2 * np.sin(t)))
                for t in thetas]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    def bench(render_fn, v, cfg, label, reps=3):
        def orbit(v_, t_, cams):
            def frame(carry, cam):
                img = render_fn(v_, t_, cam, cfg)
                return carry + img[0, 0], None

            probe, _ = jax.lax.scan(
                frame, jnp.zeros((4,), jnp.float32), cams)
            return probe

        f = jax.jit(orbit)
        rng = np.random.default_rng(0)
        t0 = time.time()
        np.asarray(f(v, tf, make_cams(rng.random(FRAMES) * 1e-4)))
        print(f"{label}: compile+first {time.time()-t0:.0f}s", flush=True)
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

    # MNI-1mm-class synthetic (the real file is absent from the checkout,
    # .MISSING_LARGE_BLOBS): brain-like smooth blob at 182x218x182
    x = np.linspace(-1, 1, 182, dtype=np.float32)
    y = np.linspace(-1, 1, 218, dtype=np.float32)
    z = np.linspace(-1, 1, 182, dtype=np.float32)
    r2 = (x[:, None, None] ** 2 + (0.85 * y[None, :, None]) ** 2
          + z[None, None, :] ** 2)
    vol_np = np.where(r2 < 0.8, 40.0 + 100.0 * (1.0 - r2)
                      + 30.0 * np.sin(6 * x)[:, None, None], 0.0)
    vol = make_volume(vol_np.astype(np.float32))
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300)

    bench(lambda v, t, c, cf: render_test_pallas(v, t, c, cf,
                                                 early_eps=1e-3),
          vol, cfg, "r4a_a5_packed_mni_304")
    bench(lambda v, t, c, cf: render_vrc_pallas(v, t, c, cf,
                                                early_eps=1e-3),
          vol, cfg, "r4a_a1_packed_mni_304")

    # on-chip parity (small frame: the XLA a5 scan at 304^2 is ~seconds)
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg_s = RenderConfig(width=64, height=64, samples_per_ray=60)
    want = np.asarray(render_test(vol, tf, cam, cfg_s, mode="fast"))
    got = np.asarray(render_test_pallas(vol, tf, cam, cfg_s, early_eps=0.0))
    err = float(np.abs(got - want).max())
    print("a5 packed on-chip max err:", err, flush=True)
    results["r4a_a5_packed_onchip_max_err"] = err
    save()
    assert err < 2e-3, err

    bench(lambda v, t, c, cf: render_test(v, t, c, cf, mode="fast"),
          vol, cfg, "r4a_a5_xla_mni_304", reps=1)
    print("job1 done", flush=True)


if __name__ == "__main__":
    main()
