"""Round-5 chip job 6: streamed a5 DIFF fit steps (beyond-VMEM a5
training — the last training-matrix cell).

One process (the axon relay queues the first program of each process).
Measures:
  j6a: onchip parity incl. the new a5_streamed_diff_{fwd,grads} paths
  j6b: 320^3 a5 fit step — streamed custom_vjp core vs the XLA a5 scan
       step (previously the only option at this scale), + grad match
  j6c: 512^3 a5 streamed fit step (previously: XLA floor only)
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
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
    else:
        prior = {}
    prior.update(results)
    with open(OUT, "w") as f:
        json.dump(prior, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.ops.pallas_a5 import (
        a5_diff_streamed_eligible,
        render_test_pallas_diff_streamed,
    )
    from volumerenderingproject_tpu.utils.config import Algorithm

    rng = np.random.default_rng(6)
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

    # ---- j6a: parity gate (incl. a5_streamed_diff paths) ---------------
    import onchip_parity

    onchip_parity.main()
    with open(onchip_parity.OUT) as f:
        results["j6a_parity_paths"] = len(json.load(f))
    save()
    print("j6a", results, flush=True)

    # ---- j6b: 320^3 a5 fit step ----------------------------------------
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300,
                       algorithm=Algorithm.TEST)
    assert a5_diff_streamed_eligible(dense, tf, cfg)
    target = jnp.asarray(
        rng.uniform(0, 1, (304, 304, 4)).astype(np.float32))

    def loss_p(colors, v):
        tf2 = dataclasses.replace(tf, colors=colors)
        img = render_test_pallas_diff_streamed(v, tf2, cam, cfg)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gp = jax.jit(jax.value_and_grad(loss_p))
    t, (lv, g) = timed(gp, tf.colors, dense, reps=2)
    results["j6b_a5_streamed_diff_step_320_ms"] = t * 1e3
    results["j6b_grad_sum"] = float(jnp.abs(g).sum())
    save()
    print("j6b fused", results, flush=True)

    def loss_x(colors, v):
        tf2 = dataclasses.replace(tf, colors=colors)
        img = render_test(v, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gx = jax.jit(jax.value_and_grad(loss_x))
    t, (lv2, g2) = timed(gx, tf.colors, dense, reps=1)
    results["j6b_a5_xla_step_320_ms"] = t * 1e3
    results["j6b_grad_match"] = float(jnp.abs(g - g2).max())
    results["j6b_loss_match"] = abs(float(lv) - float(lv2))
    save()
    print("j6b", results, flush=True)

    # ---- j6c: 512^3 a5 streamed fit step -------------------------------
    xs = np.linspace(-1, 1, 512, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    big = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    t, _ = timed(gp, tf.colors, big, reps=2)
    results["j6c_a5_streamed_diff_step_512_ms"] = t * 1e3
    save()
    print("j6c", results, flush=True)


if __name__ == "__main__":
    main()
