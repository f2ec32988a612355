"""Round-2 consolidated TPU validation job (run in background; the axon
relay queues compiles unpredictably, so everything TPU-side is serialized
here with generous patience).

1. Sharded-pallas parity + throughput vs the single-device kernel
   (VERDICT item 1 "done" criterion).
2. Golden-camera recovery for every a1/a5 golden (VERDICT item 4).

Writes benchmarks/tpu_round2_results.json incrementally.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round2_results.json")


def save(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


def main():
    import jax

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        load_nifti,
    )
    from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
    from volumerenderingproject_tpu.parallel.mesh import make_mesh
    from volumerenderingproject_tpu.parallel.render_dist import (
        render_vrc_sharded_jit,
    )
    from volumerenderingproject_tpu.scene.camera import Camera

    results = {}
    vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=700, height=700, samples_per_ray=500,
                       early_termination=1e-3)
    mesh = make_mesh(rays=1, samples=1, volume=1)

    print("== sharded vs single ==", flush=True)
    t0 = time.time()
    f_single = jax.jit(lambda v, t, c: render_vrc_pallas(
        v, t, c, cfg, early_eps=1e-3))
    a = np.asarray(f_single(vol, tf, cam))
    print("single compiled+ran", time.time() - t0, flush=True)
    t0 = time.time()
    b = np.asarray(render_vrc_sharded_jit(vol, tf, cam, cfg, mesh))
    print("sharded compiled+ran", time.time() - t0, flush=True)
    err = float(np.abs(a - b).max())

    def bench(fn, *args, reps=5):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        return min(ts)

    t_single = bench(f_single, vol, tf, cam)
    t_sharded = bench(render_vrc_sharded_jit, vol, tf, cam, cfg, mesh)
    results["sharded_vs_single"] = {
        "max_err": err,
        "t_single_ms": t_single * 1e3,
        "t_sharded_1dev_ms": t_sharded * 1e3,
        "ratio": t_sharded / t_single,
        "rays_per_sec_single": cfg.width * cfg.height / t_single,
    }
    print(results["sharded_vs_single"], flush=True)
    save(results)

    print("== camera recovery ==", flush=True)
    from volumerenderingproject_tpu.harness import camera_recovery

    camera_recovery.main([
        "--out", "goldens/recovered_cameras.json",
        "--n-dirs", "1200", "--n-rolls", "12",
    ])
    results["camera_recovery"] = "done"
    save(results)


if __name__ == "__main__":
    main()
