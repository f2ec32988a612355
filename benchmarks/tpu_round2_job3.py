"""Round-2 TPU job 3: the differentiable fused kernels compiled on-chip.

Round 1 proved the custom-vjp kernels in interpret mode and trained small
volumes on chip; round 2 widened them (packed grid, K<=16, density fold).
This job runs a real adam fit THROUGH THE COMPILED KERNELS on the chip:

  a. avg152 (z=91: f32 rows) 64x64/60spr — loss must strictly decrease.
  b. MNI-1mm-class synthetic (182x218x182: packed-grid diff path,
     impossible in round 1) 32x32/40spr — one step, finite loss+grads and
     a measurable parameter update.

Appends to benchmarks/tpu_round2_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round2_results.json")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        load_nifti,
        make_volume,
    )
    from volumerenderingproject_tpu.diff.fit import FitParams, make_train_step
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        diff_pallas_eligible,
    )
    from volumerenderingproject_tpu.scene.camera import Camera

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))

    # --- a: avg152 fit through the f32 diff kernels ---------------------
    vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
    cfg = RenderConfig(width=64, height=64, samples_per_ray=60)
    assert diff_pallas_eligible(vol, tf, cfg), "expected f32 diff path"
    target = jnp.zeros((cfg.width, cfg.height, 4), jnp.float32)
    opt = optax.adam(5e-3)
    params = FitParams.init(tf)
    state = opt.init(params)
    step = make_train_step(tf, cfg, opt)
    t0 = time.time()
    losses = []
    for i in range(6):
        params, state, loss = step(params, state, vol, cam, target)
        losses.append(float(loss))
    print("avg152 losses:", losses, "t:", time.time() - t0, flush=True)
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    results["diff_kernel_fit_avg152"] = {
        "losses": losses, "monotone_improved": losses[-1] < losses[0]}
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)

    # --- b: packed-grid diff path at MNI-1mm geometry --------------------
    rng = np.random.default_rng(5)
    mni = make_volume(
        (rng.uniform(0, 255, (182, 218, 182)) *
         (rng.uniform(0, 1, (182, 218, 182)) > 0.5)).astype(np.float32))
    cfg2 = RenderConfig(width=32, height=32, samples_per_ray=40)
    assert diff_pallas_eligible(mni, tf, cfg2), "expected packed diff path"
    target2 = jnp.zeros((cfg2.width, cfg2.height, 4), jnp.float32)
    params2 = FitParams.init(tf)
    state2 = opt.init(params2)
    step2 = make_train_step(tf, cfg2, opt)
    t0 = time.time()
    p3, _, loss2 = step2(params2, state2, mni, cam, target2)
    dcol = float(jnp.abs(p3.tf_colors - params2.tf_colors).max())
    print("mni packed step: loss", float(loss2), "dcolors", dcol,
          "t:", time.time() - t0, flush=True)
    assert np.isfinite(float(loss2)) and dcol > 0
    results["diff_kernel_packed_mni"] = {
        "loss": float(loss2), "max_color_update": dcol}
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("job3 done", flush=True)


if __name__ == "__main__":
    main()
