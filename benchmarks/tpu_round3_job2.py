"""Round-3 TPU job 2: isolate the streamed-mode regression.

Job 1 measured streamed 320^3 at 33.6 ms with the scalar-prefetch grid
spec (vs 26.6 ms in round 2 with a static index map) and 58.0 ms with the
visibility bitmap + DMA remap — the "optimization" was a 2.2x regression.
This job separates the three mechanisms on a dense AND a sparse scene:

  a. use_vis=False      — static index map, no prefetch (r2 structure)
  b. use_vis, no remap  — bitmap gates compute; every block still fetched
  c. use_vis + remap    — bitmap + eff-remapped block indices

plus a clean resident 700^2 x 500 re-run (job 1 ran concurrently with a
verify drive, so its 11.2 ms may be polluted).  Appends to
benchmarks/tpu_round3_results.json.
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
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas,
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
        t0 = time.time()
        np.asarray(f(v, tf, make_cams(rng.random(FRAMES) * 1e-4)))
        print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)
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

    # dense: the job-1 sphere (most blocks visible everywhere)
    rng = np.random.default_rng(3)
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    # sparse: only x < 64 of 320 holds classifiable voxels
    sp = np.zeros((320, 320, 320), np.float32)
    sp[:64] = np.where(r2[:64] < 0.8, 50.0, 0.0)
    sparse = make_volume(sp)

    s304 = RenderConfig(width=304, height=304, samples_per_ray=300)
    for name, v in (("dense", dense), ("sparse", sparse)):
        bench(render_vrc_pallas_streamed, v, s304,
              f"r3b_streamed_{name}_static", use_vis=False)
        bench(render_vrc_pallas_streamed, v, s304,
              f"r3b_streamed_{name}_vis", use_vis=True)
        bench(render_vrc_pallas_streamed, v, s304,
              f"r3b_streamed_{name}_vis_remap", use_vis=True,
              remap_dma=True)

    # clean resident re-run (no concurrent chip work this time)
    vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
    big = RenderConfig(width=700, height=700, samples_per_ray=500)
    bench(render_vrc_pallas, vol, big, "r3b_resident_700_500_clean", reps=5)
    print("job2 done", flush=True)


if __name__ == "__main__":
    main()
