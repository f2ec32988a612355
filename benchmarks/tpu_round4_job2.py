"""Round-4 TPU job 2: block-major streaming A/B + smooth diff kernels.

1. Streamed-march redesign (VERDICT round-2 item 2): grid (nxb, ntx, nty)
   with the block index outermost DMAs each volume block once per frame
   (the tile-major grid re-copied the whole volume per tile).  Measures
   dense/sparse 320^3 at 304^2 x 300, block-major vs tile-major vs the
   avg152 VMEM-resident number at the same ray workload, plus an on-chip
   parity check (compiled, not just interpret — the packed-a5 lesson).
2. Smooth-mode fused kernels (item 4): forward/backward step time vs the
   XLA scan at 64^3 / 64^2 x 60, and a short density-field fit whose loss
   must fall monotonically on chip.

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
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render_vrc
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas,
        render_vrc_pallas_streamed,
    )
    from volumerenderingproject_tpu.ops.pallas_smooth import (
        render_vrc_smooth_pallas,
    )
    from volumerenderingproject_tpu.scene.camera import Camera
    from volumerenderingproject_tpu.utils.config import Interp

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

    # ---- 1. streamed A/B ------------------------------------------------
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense_np = np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32)
    sparse_np = np.where(r2 < 0.15, 55.0 + 60.0 * r2, 0.0).astype(np.float32)
    dense = make_volume(dense_np)
    sparse = make_volume(sparse_np)
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300)

    # compiled parity first (the packed-a5 lesson: interpret passing does
    # not imply the compiled kernel is right)
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg_s = RenderConfig(width=64, height=64, samples_per_ray=60)
    want = np.asarray(render_vrc(dense, tf, cam, cfg_s, mode="fast"))
    got = np.asarray(render_vrc_pallas_streamed(
        dense, tf, cam, cfg_s, early_eps=0.0, block_major=True))
    err = float(np.abs(got - want).max())
    print("block-major streamed on-chip max err:", err, flush=True)
    results["r4b_streamed_bm_onchip_max_err"] = err
    save()
    assert err < 2e-3, err

    for label, v in (("dense", dense), ("sparse", sparse)):
        bench(lambda v_, t_, c, cf: render_vrc_pallas_streamed(
            v_, t_, c, cf, early_eps=1e-3, block_major=True),
            v, cfg, f"r4b_streamed_bm_{label}_304")
        bench(lambda v_, t_, c, cf: render_vrc_pallas_streamed(
            v_, t_, c, cf, early_eps=1e-3, block_major=False),
            v, cfg, f"r4b_streamed_tm_{label}_304")

    # resident reference at the same ray workload (avg152 fits VMEM)
    from volumerenderingproject_tpu import load_nifti

    avg = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
    bench(lambda v_, t_, c, cf: render_vrc_pallas(
        v_, t_, c, cf, early_eps=1e-3), avg, cfg, "r4b_resident_avg152_304")

    # ---- 2. smooth diff kernels ----------------------------------------
    n = 64
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    vol_np = np.where(r2 < 0.8, 40.0 + 120.0 * (1.0 - r2), 0.0)
    vol = make_volume(vol_np.astype(np.float32))
    cfg2 = RenderConfig(width=64, height=64, samples_per_ray=60,
                        interp=Interp.TRILINEAR, tf_sharpness=60.0)
    cam2 = Camera.initial(position=(0.35, 0.45, 0.85))
    target = render_vrc(vol, tf, cam2, cfg2, mode="fast")

    def make_step(render_fn):
        def loss(data):
            v2 = dataclasses.replace(vol, data=jnp.clip(data, 0.0, 255.0))
            img = render_fn(v2, tf, cam2, cfg2)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        opt = optax.adam(2.0)

        @jax.jit
        def step(data, state):
            l, g = jax.value_and_grad(loss)(data)
            up, state = opt.update(g, state, data)
            return optax.apply_updates(data, up), state, l

        return step, opt

    rng = np.random.default_rng(3)
    data0 = jnp.asarray(vol_np + rng.normal(0, 30, vol_np.shape)
                        ).astype(jnp.float32)

    for name, fn in (
        ("fused", lambda v, t, c, cf: render_vrc_smooth_pallas(v, t, c, cf)),
        ("xla", lambda v, t, c, cf: render_vrc(v, t, c, cf, mode="fast")),
    ):
        step, opt = make_step(fn)
        state = opt.init(data0)
        d = data0
        t0 = time.time()
        d, state, l0 = step(d, state)
        jax.block_until_ready(l0)
        print(f"r4b_smooth_{name}: compile+first {time.time()-t0:.0f}s",
              flush=True)
        losses = [float(l0)]
        t0 = time.time()
        for _ in range(10):
            d, state, l = step(d, state)
        jax.block_until_ready(l)
        ms = (time.time() - t0) / 10 * 1e3
        losses.append(float(l))
        results[f"r4b_smooth_{name}_64"] = {
            "ms_per_step": ms, "loss_first": losses[0],
            "loss_after_11": losses[-1]}
        print(f"r4b_smooth_{name}_64 {ms:.1f} ms/step "
              f"loss {losses[0]:.5f} -> {losses[-1]:.5f}", flush=True)
        save()
        assert losses[-1] < losses[0], losses

    print("job2 done", flush=True)


if __name__ == "__main__":
    main()
