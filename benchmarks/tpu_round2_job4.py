"""Round-2 TPU job 4: tile sweep for the lit / LUT fused-kernel variants.

DEFAULT_TILE (32, 32, 16) was swept for the plain classify; the lighting
variant does 5 row reads + 7 lane-gathers per footprint cell, so its
optimum may differ (smaller step batching shrinks the per-chunk footprint).
Appends winners to benchmarks/tpu_round2_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round2_results.json")
FRAMES = 8
TILES = [(32, 32, 16), (32, 32, 4), (16, 16, 16)]


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

    def bench(cfg, tile, label, reps=3):
        def orbit(v, t, cams):
            def frame(carry, cam):
                img = render_vrc_pallas(v, t, cam, cfg, early_eps=1e-3,
                                        tile=tile)
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
        results.setdefault("tile_sweep", {})[label] = ms
        print(label, f"{ms:.2f} ms/frame", flush=True)
        save()

    lit = RenderConfig(width=304, height=304, samples_per_ray=300,
                       lighting=True)
    lut = RenderConfig(width=304, height=304, samples_per_ray=300,
                       tf_lut=256)
    for tile in TILES:
        bench(lit, tile, f"lit_{tile[0]}x{tile[1]}x{tile[2]}")
    for tile in TILES[:2]:
        bench(lut, tile, f"lut_{tile[0]}x{tile[1]}x{tile[2]}")
    print("job4 done", flush=True)


if __name__ == "__main__":
    main()
