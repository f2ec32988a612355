"""Round-5 chip job 1: parity gate for the new kernels + timings.

One process (the axon relay queues the first program of each process —
batch everything).  Measures:
  j1a: full onchip_parity (incl. round-5 entries: slab/streamed/a5 diff,
       scatter/LUT diff, a5 id-stream, x-dominant packed smooth)
  j1b: streamed a5 at 320^3 (id grid streams; previously the XLA cliff)
  j1c: 512^3 a5 id-stream frame (plain + lit)
  j1d: streamed DIFF fit step at 320^3 (vs the XLA-scan step and the
       forward streamed frame)
  j1e: MNI-1mm smooth TF/bound-only fit step (volume_grad=False) vs the
       full-splat step (round-4 VERDICT item 10)
Appends results to benchmarks/tpu_round5_results2.json as they land.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round5_results2.json")

results = {}


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render, render_test
    from volumerenderingproject_tpu.utils.config import Algorithm, Interp

    rng = np.random.default_rng(5)
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))

    def timed(fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    # ---- j1a: parity gate ----------------------------------------------
    import onchip_parity

    onchip_parity.main()
    with open(onchip_parity.OUT) as f:
        results["j1a_parity_paths"] = len(json.load(f))
    save()

    # ---- j1b: streamed a5 at 320^3 -------------------------------------
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    cfg5 = RenderConfig(width=304, height=304, samples_per_ray=300,
                        algorithm=Algorithm.TEST, early_termination=1e-3)
    f = jax.jit(lambda v: render(v, tf, cam, cfg5))
    t, _ = timed(f, dense)
    results["j1b_streamed_a5_320_ms"] = t * 1e3
    # the XLA fallback it replaces
    f_x = jax.jit(lambda v: render_test(v, tf, cam, cfg5, mode="fast"))
    t, _ = timed(f_x, dense, reps=2)
    results["j1b_a5_320_xla_ms"] = t * 1e3
    save()
    print("j1b", results, flush=True)

    # ---- j1c: 512^3 a5 id-stream ---------------------------------------
    xs = np.linspace(-1, 1, 512, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    big = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    t, _ = timed(jax.jit(lambda v: render(v, tf, cam, cfg5)), big, reps=2)
    results["j1c_a5_512_ms"] = t * 1e3
    t, _ = timed(jax.jit(lambda v: render(
        v, tf, cam, cfg5.replace(lighting=True))), big, reps=2)
    results["j1c_a5_512_lit_ms"] = t * 1e3
    save()
    print("j1c", results, flush=True)

    # ---- j1d: streamed DIFF fit step at 320^3 --------------------------
    from volumerenderingproject_tpu.ops.pallas_march_vjp import (
        render_vrc_pallas_diff_streamed,
    )
    from volumerenderingproject_tpu.models.raycast import render_vrc

    cfg1 = RenderConfig(width=304, height=304, samples_per_ray=300,
                        early_termination=1e-3)
    target = jnp.asarray(
        rng.uniform(0, 1, (304, 304, 4)).astype(np.float32))

    t, _ = timed(jax.jit(lambda v: render(v, tf, cam, cfg1)), dense)
    results["j1d_streamed_fwd_320_ms"] = t * 1e3

    def loss_p(colors, v):
        tf2 = dataclasses.replace(tf, colors=colors)
        img = render_vrc_pallas_diff_streamed(
            v, tf2, cam, cfg1.replace(early_termination=0.0))
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gp = jax.jit(jax.value_and_grad(loss_p))
    t, (lv, g) = timed(gp, tf.colors, dense, reps=2)
    results["j1d_streamed_diff_step_320_ms"] = t * 1e3
    results["j1d_streamed_diff_grad_sum"] = float(jnp.abs(g).sum())

    def loss_x(colors, v):
        tf2 = dataclasses.replace(tf, colors=colors)
        img = render_vrc(v, tf2, cam,
                         cfg1.replace(early_termination=0.0), mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gx = jax.jit(jax.value_and_grad(loss_x))
    t, (lv2, g2) = timed(gx, tf.colors, dense, reps=2)
    results["j1d_xla_step_320_ms"] = t * 1e3
    results["j1d_grad_match"] = float(jnp.abs(g - g2).max())
    save()
    print("j1d", results, flush=True)

    # 512^3 streamed diff step
    def loss_p512(colors, v):
        tf2 = dataclasses.replace(tf, colors=colors)
        img = render_vrc_pallas_diff_streamed(
            v, tf2, cam, cfg1.replace(early_termination=0.0))
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gp5 = jax.jit(jax.value_and_grad(loss_p512))
    t, _ = timed(gp5, tf.colors, big, reps=2)
    results["j1d_streamed_diff_step_512_ms"] = t * 1e3
    save()
    print("j1d512", results, flush=True)

    # ---- j1e: MNI-1mm smooth TF/bound-only step (item 10) --------------
    from volumerenderingproject_tpu.ops.pallas_smooth import (
        render_vrc_smooth_pallas,
        smooth_pallas_eligible,
    )

    mni = make_volume(
        rng.uniform(0, 255, (182, 218, 182)).astype(np.float32))
    cfg_s = RenderConfig(width=304, height=304, samples_per_ray=300,
                         interp=Interp.TRILINEAR, tf_sharpness=60.0)
    assert smooth_pallas_eligible(mni, tf, cfg_s)
    target2 = jnp.asarray(
        rng.uniform(0, 1, (304, 304, 4)).astype(np.float32))

    def loss_s(colors, lower, upper, data, vgrad):
        tf2 = dataclasses.replace(tf, colors=colors, lower=lower,
                                  upper=upper)
        v2 = dataclasses.replace(mni, data=data)
        img = render_vrc_smooth_pallas(
            v2, tf2, cam, cfg_s, early_eps=0.0, volume_grad=vgrad)
        return jnp.mean((img[..., :3] - target2[..., :3]) ** 2)

    # TF/bound-only (no splat)
    g_nv = jax.jit(jax.value_and_grad(
        lambda c, lo, up, d: loss_s(c, lo, up, d, False),
        argnums=(0, 1, 2)))
    t, _ = timed(g_nv, tf.colors, tf.lower, tf.upper, mni.data, reps=2)
    results["j1e_smooth_step_tf_only_mni_ms"] = t * 1e3
    # full (with splat) for the ratio
    g_full = jax.jit(jax.value_and_grad(
        lambda c, lo, up, d: loss_s(c, lo, up, d, True),
        argnums=(0, 1, 2, 3)))
    t, _ = timed(g_full, tf.colors, tf.lower, tf.upper, mni.data, reps=2)
    results["j1e_smooth_step_full_mni_ms"] = t * 1e3
    save()
    print("DONE", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
