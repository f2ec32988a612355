"""Round-5 TPU job 1: sharded training at kernel speed (VERDICT r3 item 1).

The round-3 gap: every mesh fit set use_pallas=False (diff/fit.py), so
multi-device training ran at XLA-scan speed.  This job measures, on the
real chip, the new custom_vjp SEGMENT kernel path
(parallel/render_dist.render_vrc_sharded differentiable=True — what
diff/fit.render_loss now auto-routes through on TPU):

  r5a_step_unsharded      fused single-device diff step (the r3 baseline)
  r5a_step_mesh1_kernel   1-device-mesh diff step through segment kernels
  r5a_step_mesh1_xla      1-device-mesh diff step through the XLA scan
                          (the r3 use_pallas=False training cliff)
  r5a_grad_max_rel_err    on-chip grad parity mesh-kernel vs unsharded
  r5a_lit_*               same trio with baked lighting + traced light

Done-criterion (VERDICT): mesh-kernel step within ~1.2x the fused
unsharded step; grads allclose.  Appends to tpu_round5_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round5_results.json")
REPS = 5


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.diff.fit import (
        FitParams,
        render_loss,
    )
    from volumerenderingproject_tpu.ops import phong
    from volumerenderingproject_tpu.scene.camera import Camera

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    tf = default_transfer_function()
    rng = np.random.default_rng(42)
    # MNI-2mm-class volume (z = 91 <= 128: f32 rows in the diff kernels)
    vol_np = rng.uniform(0.0, 255.0, size=(91, 109, 91)).astype(np.float32)
    volume = make_volume(vol_np)
    cam = Camera.initial(position=(0.9, 0.35, 0.75))
    cfg = RenderConfig(width=304, height=304, samples_per_ray=300)
    target = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(304, 304, 4)).astype(np.float32))
    devs = np.array(jax.devices()[:1]).reshape(1, 1, 1)
    mesh = Mesh(devs, ("rays", "samples", "volume"))

    def timed(fn, *args):
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    def grad_fn(cfg_, mesh_, light, use_pallas=None):
        def loss(params):
            return render_loss(params, tf, volume, cam, target, cfg_, mesh_)

        g = jax.jit(jax.value_and_grad(loss))
        if use_pallas is not None:
            # route the mesh path explicitly (the XLA-cliff comparison)
            from volumerenderingproject_tpu.parallel.render_dist import (
                render_vrc_sharded,
            )
            from volumerenderingproject_tpu.scene.transfer_function import (
                TransferFunction,
            )

            def loss2(params):
                tf3 = TransferFunction(
                    lower=tf.lower, upper=tf.upper,
                    colors=params.tf_colors.at[:, 3].mul(
                        jnp.clip(params.density_scale, 0.0, None)),
                    hg_g=tf.hg_g)
                img = render_vrc_sharded(
                    volume, tf3, cam, cfg_, mesh_,
                    use_pallas=use_pallas, light=params.light)
                return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

            g = jax.jit(jax.value_and_grad(loss2))
        return g

    for tag, lighting in (("", False), ("lit_", True)):
        cfg_ = cfg.replace(lighting=lighting) if lighting else cfg
        light = phong.default_light() if lighting else None
        params = FitParams.init(tf, light=light)

        t_un, (l_un, g_un) = timed(grad_fn(cfg_, None, light), params)
        results[f"r5a_{tag}step_unsharded_ms"] = t_un * 1e3
        save()
        t_mk, (l_mk, g_mk) = timed(grad_fn(cfg_, mesh, light), params)
        results[f"r5a_{tag}step_mesh1_kernel_ms"] = t_mk * 1e3
        save()
        t_mx, _ = timed(grad_fn(cfg_, mesh, light, use_pallas=False),
                        params)
        results[f"r5a_{tag}step_mesh1_xla_ms"] = t_mx * 1e3

        gu = np.asarray(g_un.tf_colors)
        gm = np.asarray(g_mk.tf_colors)
        denom = np.maximum(np.abs(gu), 1e-8)
        results[f"r5a_{tag}grad_max_rel_err"] = float(
            np.max(np.abs(gm - gu) / denom))
        results[f"r5a_{tag}loss_abs_diff"] = abs(float(l_mk) - float(l_un))
        results[f"r5a_{tag}mesh_vs_unsharded_ratio"] = t_mk / t_un
        results[f"r5a_{tag}kernel_vs_xla_speedup"] = t_mx / t_mk
        save()
        print(f"[{tag or 'plain'}] unsharded {t_un*1e3:.1f} ms | "
              f"mesh-kernel {t_mk*1e3:.1f} ms | mesh-xla {t_mx*1e3:.1f} ms "
              f"| grad_rel_err {results[f'r5a_{tag}grad_max_rel_err']:.2e}")

    print(json.dumps({k: v for k, v in results.items()
                      if k.startswith("r5a")}, indent=2))


if __name__ == "__main__":
    main()
