"""Benchmark: rays/s/chip on the BASELINE.json headline config.

Renders avg152T1 (the bundled reference dataset) with the flagship a1/VRC
fused Pallas ray-marcher at 700x700, 500 samples/ray (the reference's
maximum demonstrated workload, BASELINE.md), on the real TPU chip, and
prints ONE JSON line:

    {"metric": "rays_per_sec_700x700_spr500", "value": N, "unit": "rays/s",
     "vs_baseline": R}

Protocol: a 32-frame camera orbit is marched inside ONE jit (lax.scan over
stacked cameras, each frame reduced on-device to its [0,0] pixel so no
frame can be elided), timed end-to-end and divided by the frame count.
This measures sustained device throughput the way the reference's render
loop consumes it (frame after frame, myApp.cu:861), and keeps host-link
round-trip latency — ~33 ms/call through the axon tunnel on this rig,
several times the actual per-frame compute — out of the number.  Each
repetition jitters the orbit angles so no caching layer (JAX or platform)
can elide work; the best of 5 repetitions is reported.

The reference publishes no numbers (BASELINE.md: README is build notes
only), so ``vs_baseline`` is measured against this repo's committed anchor
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

FRAMES = 32
REPS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        load_nifti,
    )
    from volumerenderingproject_tpu.models.raycast import render
    from volumerenderingproject_tpu.scene.camera import Camera

    if os.path.exists(DATASET):
        volume = load_nifti(DATASET)
    else:  # fall back to the synthetic fixture if the dataset is absent
        from volumerenderingproject_tpu.ingest import synthetic

        volume = synthetic.centered_sphere(100)
    tf = default_transfer_function()
    # early_termination=1e-3 enables the fused kernel's early ray exit —
    # bounded error < 1/255 (invisible in 8-bit output), an optimization the
    # reference's back-to-front blend order cannot express (kernel.cu:194-225)
    config = RenderConfig(
        width=700, height=700, samples_per_ray=500, early_termination=1e-3
    )

    def orbit_cameras(jitter: np.ndarray):
        thetas = np.linspace(0.0, 2.0 * np.pi, FRAMES + 1)[:FRAMES] + jitter
        cams = [
            Camera.initial(
                position=(
                    1.5 * np.cos(t),
                    0.4 + 0.2 * np.sin(2.0 * t),
                    1.5 * np.sin(t),
                )
            )
            for t in thetas
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    @jax.jit
    def render_orbit(volume, tf, cams):
        def frame(carry, cam):
            img = render(volume, tf, cam, config)
            return carry + img[0, 0], None

        probe, _ = jax.lax.scan(frame, jnp.zeros((4,), jnp.float32), cams)
        return probe

    config_exact = config.replace(early_termination=0.0)

    @jax.jit
    def render_orbit_exact(volume, tf, cams):
        def frame(carry, cam):
            img = render(volume, tf, cam, config_exact)
            return carry + img[0, 0], None

        probe, _ = jax.lax.scan(frame, jnp.zeros((4,), jnp.float32), cams)
        return probe

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    t_start = time.time()

    # warm up / compile
    np.asarray(render_orbit(volume, tf, orbit_cameras(rng.random(FRAMES) * 1e-4)))

    times = []
    for _ in range(REPS):
        cams = orbit_cameras(rng.random(FRAMES) * 1e-4)
        t0 = time.time()
        np.asarray(render_orbit(volume, tf, cams))  # force full completion
        times.append(time.time() - t0)
    best = min(times) / FRAMES
    rays_per_sec = config.num_rays / best

    # exact mode (early_termination=0, bit-exact vs the scan renderer):
    # tracked so the exactness-vs-speed tradeoff is visible round-over-round.
    # Skipped when the relay's compile queue already ate the time budget.
    rays_per_sec_exact = None
    if time.time() - t_start < 900:
        np.asarray(
            render_orbit_exact(volume, tf,
                               orbit_cameras(rng.random(FRAMES) * 1e-4)))
        times = []
        for _ in range(max(2, REPS - 2)):
            cams = orbit_cameras(rng.random(FRAMES) * 1e-4)
            t0 = time.time()
            np.asarray(render_orbit_exact(volume, tf, cams))
            times.append(time.time() - t0)
        rays_per_sec_exact = config.num_rays / (min(times) / FRAMES)

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

    out = {
        "metric": "rays_per_sec_700x700_spr500",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / anchor, 3),
    }
    if rays_per_sec_exact is not None:
        out["value_exact_mode"] = round(rays_per_sec_exact, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
