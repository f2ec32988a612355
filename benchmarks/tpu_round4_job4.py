"""Round-4 TPU job 4: component timings for the smooth diff step, the
new per-corner packed-a5 fetch, and a larger-scale smooth comparison.

job2 showed the fused smooth step only tying the XLA scan at 64^3/64^2
(42 vs 46 ms/step) — this job isolates where the time goes:

  fwd_only      fused forward kernel alone
  fwdbwd_nosplat  value_and_grad w.r.t. TF colors only (no volume splat)
  full          value_and_grad w.r.t. the volume (kernel + splat)
  xla_*         the same through the XLA scan

at both 64-scale and 128^3 / 128^2 x 120 (where the scan's gather floor
should separate).  Appends to tpu_round4_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round4_results.json")


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render_vrc
    from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas
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
    cam = Camera.initial(position=(0.35, 0.45, 0.85))

    def timeit(f, *args, reps=5, inner=4):
        # fold `inner` calls into one jit so dispatch RTT amortizes
        @jax.jit
        def many(*a):
            acc = jnp.zeros((), jnp.float32)
            for k in range(inner):
                out = f(*a, jnp.float32(1.0 + 1e-6 * k))
                acc = acc + jnp.sum(out) * 0.0 + jnp.asarray(
                    out.reshape(-1)[0] if hasattr(out, "reshape") else out)
            return acc

        np.asarray(many(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(many(*args))
            ts.append(time.time() - t0)
        return min(ts) / inner * 1e3

    for n, w, spr, tag in ((64, 64, 60, "64"), (128, 128, 120, "128")):
        xs = np.linspace(-1, 1, n, dtype=np.float32)
        r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
              + xs[None, None, :] ** 2)
        vol_np = np.where(r2 < 0.8, 40.0 + 120.0 * (1.0 - r2), 0.0)
        vol = make_volume(vol_np.astype(np.float32))
        cfg = RenderConfig(width=w, height=w, samples_per_ray=spr,
                           interp=Interp.TRILINEAR, tf_sharpness=60.0)
        target = render_vrc(vol, tf, cam, cfg, mode="fast")

        def loss_fused_vol(data, jit_salt):
            v2 = dataclasses.replace(vol, data=data * jit_salt)
            img = render_vrc_smooth_pallas(v2, tf, cam, cfg)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        def loss_fused_col(colors, jit_salt):
            tf2 = dataclasses.replace(tf, colors=colors * jit_salt)
            img = render_vrc_smooth_pallas(vol, tf2, cam, cfg)
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        def loss_xla_vol(data, jit_salt):
            v2 = dataclasses.replace(vol, data=data * jit_salt)
            img = render_vrc(v2, tf, cam, cfg, mode="fast")
            return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

        entries = {
            f"r4d_smooth{tag}_fwd_fused": lambda d, s: render_vrc_smooth_pallas(
                dataclasses.replace(vol, data=d * s), tf, cam, cfg),
            f"r4d_smooth{tag}_fwd_xla": lambda d, s: render_vrc(
                dataclasses.replace(vol, data=d * s), tf, cam, cfg,
                mode="fast"),
            f"r4d_smooth{tag}_grad_colors_fused": lambda d, s: jax.grad(
                loss_fused_col)(tf.colors, s),
            f"r4d_smooth{tag}_grad_vol_fused": lambda d, s: jax.grad(
                loss_fused_vol)(d, s),
            f"r4d_smooth{tag}_grad_vol_xla": lambda d, s: jax.grad(
                loss_xla_vol)(d, s),
        }
        for label, fn in entries.items():
            ms = timeit(fn, vol.data)
            results[label] = {"ms": ms}
            print(label, f"{ms:.2f} ms", flush=True)
            save()

    # per-corner packed-a5 fetch (new code) at MNI scale
    x = np.linspace(-1, 1, 182, dtype=np.float32)
    y = np.linspace(-1, 1, 218, dtype=np.float32)
    z = np.linspace(-1, 1, 182, dtype=np.float32)
    r2 = (x[:, None, None] ** 2 + (0.85 * y[None, :, None]) ** 2
          + z[None, None, :] ** 2)
    vol_np = np.where(r2 < 0.8, 40.0 + 100.0 * (1.0 - r2)
                      + 30.0 * np.sin(6 * x)[:, None, None], 0.0)
    mni = make_volume(vol_np.astype(np.float32))
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300)

    want = np.asarray(render_vrc(  # spot parity (bit-exact post-fix)
        mni, tf, cam, RenderConfig(width=32, height=32, samples_per_ray=24),
        mode="fast"))
    from volumerenderingproject_tpu.models.raycast import render_test
    want = np.asarray(render_test(
        mni, tf, cam, RenderConfig(width=32, height=32, samples_per_ray=24),
        mode="fast"))
    got = np.asarray(render_test_pallas(
        mni, tf, cam, RenderConfig(width=32, height=32, samples_per_ray=24),
        early_eps=0.0))
    err = float(np.abs(got - want).max())
    results["r4d_a5_pc_onchip_max_err"] = err
    print("per-corner a5 parity:", err, flush=True)
    assert err < 1e-5, err

    def orbit_probe(v_, t_, cams):
        def frame(carry, c):
            img = render_test_pallas(v_, t_, c, cfg, early_eps=1e-3)
            return carry + img[0, 0], None

        probe, _ = jax.lax.scan(frame, jnp.zeros((4,), jnp.float32), cams)
        return probe

    f = jax.jit(orbit_probe)
    FRAMES = 8
    rng = np.random.default_rng(0)

    def make_cams(jitter):
        thetas = np.linspace(0, 2 * np.pi, FRAMES + 1)[:FRAMES] + jitter
        cams = [Camera.initial(position=(1.2 * np.cos(t), 0.4,
                                         1.2 * np.sin(t)))
                for t in thetas]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    np.asarray(f(mni, tf, make_cams(rng.random(FRAMES) * 1e-4)))
    ts = []
    for _ in range(3):
        cams = make_cams(rng.random(FRAMES) * 1e-4)
        t0 = time.time()
        np.asarray(f(mni, tf, cams))
        ts.append(time.time() - t0)
    ms = min(ts) / FRAMES * 1e3
    results["r4d_a5_percorner_mni_304"] = {"ms_per_frame": ms}
    print("r4d_a5_percorner_mni_304", f"{ms:.2f} ms/frame", flush=True)
    save()
    print("job4 done", flush=True)


if __name__ == "__main__":
    main()
