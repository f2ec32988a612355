"""Benchmark: rays/s/chip on the BASELINE.json headline config.

Renders avg152T1 (the bundled reference dataset) with the flagship a1/VRC
streaming ray-marcher at 700x700, 500 samples/ray (the reference's maximum
demonstrated workload, BASELINE.md), on the real TPU chip, and prints ONE
JSON line:

    {"metric": "rays_per_sec_700x700_spr500", "value": N, "unit": "rays/s",
     "vs_baseline": R}

The reference publishes no numbers (BASELINE.md: README is build notes only),
so ``vs_baseline`` is measured against this repo's committed anchor
(BENCH_ANCHOR.json, recorded on the first benchmarked build) — i.e. the
round-over-round speedup factor.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ANCHOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR.json")
DATASET = "/root/reference/avg152T1_LR_nifti2.nii"


def main() -> None:
    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        load_nifti,
        render_jit,
        reset_preset,
    )
    from volumerenderingproject_tpu.ingest import synthetic
    import dataclasses

    if os.path.exists(DATASET):
        volume = load_nifti(DATASET)
    else:  # fall back to the synthetic fixture if the dataset is absent
        volume = synthetic.centered_sphere(100)
    tf = default_transfer_function()
    cam = reset_preset()
    # early_termination=1e-3 enables the fused kernel's early ray exit —
    # bounded error < 1/255 (invisible in 8-bit output), an optimization the
    # reference's back-to-front blend order cannot express (kernel.cu:194-225)
    config = RenderConfig(
        width=700, height=700, samples_per_ray=500, early_termination=1e-3
    )

    # warm up / compile
    img = render_jit(volume, tf, cam, config)
    np.asarray(img[0, 0])

    # steady-state timing; vary the camera so no caching layer can elide work
    times = []
    for k in range(5):
        cam_k = dataclasses.replace(cam, position=cam.position + 1e-6 * k)
        t0 = time.time()
        img = render_jit(volume, tf, cam_k, config)
        np.asarray(img[0, 0])  # force completion through the host
        times.append(time.time() - t0)
    best = min(times[1:]) if len(times) > 1 else times[0]
    rays_per_sec = config.num_rays / best

    if os.path.exists(ANCHOR_PATH):
        with open(ANCHOR_PATH) as f:
            anchor = json.load(f)["rays_per_sec"]
    else:
        anchor = rays_per_sec
        with open(ANCHOR_PATH, "w") as f:
            json.dump(
                {"rays_per_sec": rays_per_sec, "config": "700x700 spr500 a1"},
                f,
            )

    print(
        json.dumps(
            {
                "metric": "rays_per_sec_700x700_spr500",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / anchor, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
