"""Round-3 TPU job 5: fused multichannel kernel + new streamed defaults.

The 4-D multi-channel a1 path was the last renderer still at the XLA
gather floor (~8.6 ns/index, DESIGN §2).  The fused mode stages a packed
mean-id grid (alpha) plus normalized f32 rgb channel grids and fetches
1 + C' values per footprint cell.  Measures XLA vs fused on a 3-channel
avg152-scale synthetic, plus the streamed renderer at its new defaults
(8 MB blocks, 16x16x16 tiles).  Appends to tpu_round3_results.json.
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
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render_vrc
    from volumerenderingproject_tpu.ops.pallas_march import (
        multichannel_feasible,
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
                img = render_fn(v_, t_, cam, cfg, **kw)
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

    # 3-channel avg152-scale synthetic (the RGB16_4D-class workload)
    rng = np.random.default_rng(7)
    xs = np.linspace(-1, 1, 91, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    base = np.where(r2 < 0.8, 40.0 + 80.0 * (1.0 - r2), 0.0)
    rgbvol = np.stack([base * 1.0, base * 0.7, base * 0.4], axis=-1)
    vol3 = make_volume(rgbvol.astype(np.float32))
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300)
    assert multichannel_feasible(vol3.dims, 3, tf.num_intervals, cfg)

    bench(lambda v, t, c, cf: render_vrc(v, t, c, cf, mode="fast"),
          vol3, cfg, "r3e_mc3_xla_304")
    bench(lambda v, t, c, cf: render_vrc_pallas(
        v, t, c, cf, early_eps=1e-3), vol3, cfg, "r3e_mc3_fused_304")

    # parity on-chip (not just interpret mode)
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    want = np.asarray(render_vrc(vol3, tf, cam, cfg, mode="fast"))
    got = np.asarray(render_vrc_pallas(vol3, tf, cam, cfg, early_eps=0.0))
    err = float(np.abs(got - want).max())
    print("mc3 on-chip max err:", err, flush=True)
    results["r3e_mc3_onchip_max_err"] = err
    save()
    assert err < 2e-3, err

    # streamed at the new defaults (vs r3d_streamed_bx160_tile16x16x16)
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    bench(lambda v, t, c, cf: render_vrc_pallas_streamed(
        v, t, c, cf, early_eps=1e-3), dense, cfg,
        "r3e_streamed_new_defaults")
    print("job5 done", flush=True)


if __name__ == "__main__":
    main()
