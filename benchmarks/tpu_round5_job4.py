"""Round-5 TPU job 4: MNI-1mm-class smooth-mode fit step (VERDICT r3
item 4 done-criterion: smooth_pallas_eligible admits 182x218x182 and an
on-chip fit step at that scale is recorded).

  r5d_smooth_packed_eligible_mni   the predicate admits MNI-1mm
  r5d_smooth_fwd_mni_ms            packed smooth forward, 182x218x182
  r5d_smooth_fit_step_mni_ms       full fit step (colors+bounds+volume
                                   grads incl. the trilinear-adjoint
                                   splat) at that scale
  r5d_smooth_fit_step_xla_mni_ms   the XLA cliff it replaces (1 rep)

Appends to tpu_round5_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round5_results.json")


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
    from volumerenderingproject_tpu.ops.pallas_smooth import (
        render_vrc_smooth_pallas,
        smooth_pallas_eligible,
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
    cam = Camera.initial(position=(0.9, 0.35, 0.75))
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300,
                       interp=Interp.TRILINEAR, tf_sharpness=40.0)

    rng = np.random.default_rng(7)
    dims = (182, 218, 182)
    coords = [np.arange(d, dtype=np.float32) for d in dims]
    cc = [d / 2.0 for d in dims]
    r = np.sqrt(sum(((c - m) / m) ** 2 for c, m in zip(
        np.meshgrid(*coords, indexing="ij"), cc)))
    mni = make_volume(
        np.where(r < 0.85, 40.0 + 180.0 * (1.0 - r), 0.0).astype(np.float32))

    ok = smooth_pallas_eligible(mni, tf, cfg)
    results["r5d_smooth_packed_eligible_mni"] = bool(ok)
    print("eligible:", ok, flush=True)
    assert ok

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

    fwd = jax.jit(lambda v: render_vrc_smooth_pallas(v, tf, cam, cfg))
    t, img = timed(fwd, mni)
    results["r5d_smooth_fwd_mni_ms"] = t * 1e3
    save()
    print(f"smooth fwd MNI: {t*1e3:.1f} ms", flush=True)

    target = jnp.asarray(
        rng.uniform(0, 1, (304, 304, 4)).astype(np.float32))

    def loss(colors, lower, upper, data):
        tf2 = dataclasses.replace(tf, colors=colors, lower=lower,
                                  upper=upper)
        v2 = dataclasses.replace(mni, data=data)
        img = render_vrc_smooth_pallas(v2, tf2, cam, cfg, early_eps=0.0)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    t, (lv, g) = timed(grad_fn, tf.colors, tf.lower, tf.upper, mni.data)
    results["r5d_smooth_fit_step_mni_ms"] = t * 1e3
    results["r5d_smooth_fit_step_mni_loss"] = float(lv)
    results["r5d_smooth_volume_grad_nonzero"] = bool(
        float(jnp.abs(g[3]).max()) > 0.0)
    save()
    print(f"smooth fit step MNI: {t*1e3:.1f} ms "
          f"(vol grad nonzero: {results['r5d_smooth_volume_grad_nonzero']})",
          flush=True)

    def loss_x(colors, data):
        tf2 = dataclasses.replace(tf, colors=colors)
        v2 = dataclasses.replace(mni, data=data)
        img = render_vrc(v2, tf2, cam, cfg, mode="fast")
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    gx = jax.jit(jax.value_and_grad(loss_x, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = gx(tf.colors, mni.data)
    jax.block_until_ready(out)
    results["r5d_smooth_fit_step_xla_mni_ms_incl_compile"] = (
        (time.perf_counter() - t0) * 1e3)
    save()
    t1 = time.perf_counter()
    out = gx(tf.colors, mni.data)
    jax.block_until_ready(out)
    results["r5d_smooth_fit_step_xla_mni_ms"] = (
        (time.perf_counter() - t1) * 1e3)
    save()
    print(json.dumps({k: v for k, v in sorted(results.items())
                      if k.startswith("r5d")}, indent=2))


if __name__ == "__main__":
    main()
