"""Round-3 TPU job 1: baked-lighting kernel, packed-LUT grid, and the
streamed-mode (tile, block) visibility skip, measured on-chip.

Round-2 baselines (benchmarks/tpu_round2_results.json, 304^2 x 300spr on
avg152): plain 7.8 ms, LUT 18.2 ms, lit 53.2 ms (25.4 ms at tile
16x16x16 per the job4 sweep), LUT+lit 54.4 ms; streamed 320^3 26.6 ms.
This job measures the round-3 replacements:

  * baked per-voxel Phong (bake_light_grids): 2 extra row reads + 2
    lane-gathers per footprint cell instead of in-kernel gradients'
    5 reads + 7 gathers — swept over candidate tiles.
  * 16-bit packed LUT-index grid: LUT classify without f32 rows.
  * streamed march with the host-side visibility bitmap (use_vis on/off).
  * resident 700^2 x 500 sanity (regression check after the refactor).
  * the widened differentiable kernels' fit step (round-2 job3 was starved
    by the relay; one process = one starvation, so it rides along here).

All work runs in ONE process: the axon relay intermittently queues the
first program of a fresh process for ~400-1100 s, subsequent compiles are
seconds.  Appends to benchmarks/tpu_round3_results.json.
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
    vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")

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
        rays = cfg.width * cfg.height / (ms * 1e-3)
        results[label] = {"ms_per_frame": ms, "rays_per_sec": rays}
        print(label, f"{ms:.2f} ms/frame ({rays/1e6:.1f}M rays/s)",
              flush=True)
        save()

    big = RenderConfig(width=700, height=700, samples_per_ray=500)
    c304 = RenderConfig(width=304, height=304, samples_per_ray=300)
    lit = c304.replace(lighting=True)
    lut = c304.replace(tf_lut=256)
    lutlit = c304.replace(lighting=True, tf_lut=256)

    # 1. resident sanity after the refactor (r2: 10.3 ms on this orbit)
    bench(render_vrc_pallas, vol, big, "r3_resident_700_500")
    # 2. packed-LUT grid (r2 f32-rows LUT: 17.7 ms best)
    bench(render_vrc_pallas, vol, lut, "r3_lut_packed_304")
    # 3-4. baked lighting, swept (r2 in-kernel: 25.4 ms best)
    for tile in ((32, 32, 16), (16, 16, 16), (32, 32, 4)):
        tag = f"{tile[0]}x{tile[1]}x{tile[2]}"
        bench(render_vrc_pallas, vol, lit, f"r3_baked_lit_{tag}", tile=tile)
        bench(render_vrc_pallas, vol, lutlit, f"r3_baked_lutlit_{tag}",
              tile=tile)

    # 5. streamed 320^3 with/without the visibility bitmap (r2: 26.6 ms)
    rng = np.random.default_rng(3)
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    synth = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    s304 = RenderConfig(width=304, height=304, samples_per_ray=300)
    bench(render_vrc_pallas_streamed, synth, s304, "r3_streamed_320_novis",
          use_vis=False)
    bench(render_vrc_pallas_streamed, synth, s304, "r3_streamed_320_vis",
          use_vis=True)

    # 6. differentiable kernels: adam fit through the compiled vjp path
    import optax

    from volumerenderingproject_tpu.diff.fit import (
        FitParams,
        make_train_step,
    )
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        diff_pallas_eligible,
    )

    cam = Camera.initial(position=(0.35, 0.45, 0.85))
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
    dt = time.time() - t0
    print("diff fit losses:", losses, "t:", dt, flush=True)
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    results["r3_diff_kernel_fit_avg152"] = {
        "losses": losses, "seconds_6_steps": dt,
        "monotone_improved": losses[-1] < losses[0]}
    save()

    # packed-grid diff path at MNI-1mm geometry (one step)
    rngm = np.random.default_rng(5)
    mni = make_volume(
        (rngm.uniform(0, 255, (182, 218, 182)) *
         (rngm.uniform(0, 1, (182, 218, 182)) > 0.5)).astype(np.float32))
    cfg2 = RenderConfig(width=32, height=32, samples_per_ray=40)
    assert diff_pallas_eligible(mni, tf, cfg2), "expected packed diff path"
    params2 = FitParams.init(tf)
    state2 = opt.init(params2)
    step2 = make_train_step(tf, cfg2, opt)
    t0 = time.time()
    params2b, state2, loss2 = step2(
        params2, state2, mni,
        Camera.initial(position=(0.35, 0.45, 0.85)),
        jnp.zeros((32, 32, 4), jnp.float32))
    l2 = float(loss2)
    moved = float(
        jnp.abs(params2b.tf_colors - params2.tf_colors).max())
    print("mni step loss:", l2, "max dcolor:", moved,
          "t:", time.time() - t0, flush=True)
    assert np.isfinite(l2) and moved > 0
    results["r3_diff_kernel_mni_packed_step"] = {
        "loss": l2, "max_param_update": moved}
    save()
    print("job1 done", flush=True)


if __name__ == "__main__":
    main()
