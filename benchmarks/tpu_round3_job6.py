"""Round-3 TPU job 6: streamed dense-LUT classify on-chip.

The streamed march now packs 16-bit LUT indices per block (z <= 256),
extending big-volume support to config.tf_lut renders.  Measures the
320^3 dense scene with a 256-entry LUT vs the plain-classify streamed
number (27.6 ms, r3e_streamed_new_defaults) and asserts on-chip parity
vs the XLA LUT renderer at small scale.  Appends to
tpu_round3_results.json.
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

    # parity first (small volume so the XLA reference is cheap on-chip)
    rng = np.random.default_rng(13)
    small = make_volume(rng.uniform(0, 255, (48, 24, 20)).astype(np.float32))
    cfgp = RenderConfig(width=32, height=24, samples_per_ray=40, tf_lut=256)
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    want = np.asarray(render_vrc(small, tf, cam, cfgp, mode="fast"))
    got = np.asarray(render_vrc_pallas_streamed(
        small, tf, cam, cfgp, early_eps=0.0, block_x=16))
    err = float(np.abs(got - want).max())
    print("streamed-lut on-chip max err:", err, flush=True)
    results["r3f_streamed_lut_onchip_max_err"] = err
    save()
    assert err < 2e-3, err

    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300,
                       tf_lut=256)

    def make_cams(jitter):
        thetas = np.linspace(0, 2 * np.pi, FRAMES + 1)[:FRAMES] + jitter
        cams = [Camera.initial(position=(1.2 * np.cos(t), 0.4,
                                         1.2 * np.sin(t)))
                for t in thetas]
        return jax.tree.map(lambda *xs_: jnp.stack(xs_), *cams)

    def orbit(v_, t_, cams):
        def frame(carry, c):
            img = render_vrc_pallas_streamed(v_, t_, c, cfg, early_eps=1e-3)
            return carry + img[0, 0], None

        probe, _ = jax.lax.scan(frame, jnp.zeros((4,), jnp.float32), cams)
        return probe

    f = jax.jit(orbit)
    rngj = np.random.default_rng(0)
    t0 = time.time()
    np.asarray(f(dense, tf, make_cams(rngj.random(FRAMES) * 1e-4)))
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        cams = make_cams(rngj.random(FRAMES) * 1e-4)
        t0 = time.time()
        np.asarray(f(dense, tf, cams))
        ts.append(time.time() - t0)
    ms = min(ts) / FRAMES * 1e3
    results["r3f_streamed_lut_320"] = {"ms_per_frame": ms}
    print("r3f_streamed_lut_320", f"{ms:.2f} ms/frame", flush=True)
    save()
    print("job6 done", flush=True)


if __name__ == "__main__":
    main()
