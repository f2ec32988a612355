"""Round-5 TPU job 2: streamed lighting at 512^3-class scale (VERDICT r3
item 3 done-criterion: "a 512^3-class lit render runs fused").

Measures (min-of-reps, one process):

  r5b_streamed_lit_512        512^3 dense synthetic, 304^2 x 300, lighting
  r5b_streamed_plain_512      same workload unlit (the overhead ratio)
  r5b_streamed_lit_320        320^3 (the bench.py streamed_320 scale), lit
  r5b_streamed_scatter_320    320^3 scattering
  r5b_xla_lit_320             the XLA scan it replaces (1 rep; the cliff)
  r5b_streamed_lit_320_err    on-chip parity vs the XLA scan (quantization
                              bound ~6e-3 documented in pack_ms_grid)

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
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render, render_vrc
    from volumerenderingproject_tpu.scene.camera import Camera

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
                       early_termination=1e-3)

    def sphere(n):
        xs = np.linspace(-1, 1, n, dtype=np.float32)
        r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
              + xs[None, None, :] ** 2)
        return make_volume(
            np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))

    def timed(fn, *args, reps=REPS):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    render_j = jax.jit(
        lambda v, c: render(v, tf, cam, c), static_argnames="c")

    vol320 = sphere(320)
    for name, c in (
        ("r5b_streamed_plain_320", cfg),
        ("r5b_streamed_lit_320", cfg.replace(lighting=True)),
        ("r5b_streamed_scatter_320", cfg.replace(scattering=True)),
    ):
        t, out = timed(render_j, vol320, c)
        results[name + "_ms"] = t * 1e3
        save()
        print(f"{name}: {t*1e3:.1f} ms", flush=True)

    # parity at 320^3 (exact mode) vs the XLA scan — and the cliff timing
    c_lit = cfg.replace(lighting=True, early_termination=0.0)
    got = np.asarray(render_j(vol320, c_lit))
    t_x0 = time.perf_counter()
    want = np.asarray(jax.jit(
        lambda v: render_vrc(v, tf, cam, c_lit, mode="fast"))(vol320))
    t_xla = time.perf_counter() - t_x0
    results["r5b_xla_lit_320_ms_incl_compile"] = t_xla * 1e3
    err = float(np.abs(got - want).max())
    results["r5b_streamed_lit_320_err"] = err
    save()
    print(f"streamed lit 320 parity err {err:.2e}; XLA lit "
          f"{t_xla*1e3:.0f} ms (incl compile)", flush=True)
    assert err <= 6e-3, err

    vol512 = sphere(512)
    for name, c in (
        ("r5b_streamed_plain_512", cfg),
        ("r5b_streamed_lit_512", cfg.replace(lighting=True)),
    ):
        t, out = timed(render_j, vol512, c, reps=2)
        results[name + "_ms"] = t * 1e3
        save()
        print(f"{name}: {t*1e3:.1f} ms", flush=True)

    print(json.dumps({k: v for k, v in results.items()
                      if k.startswith("r5b")}, indent=2))


if __name__ == "__main__":
    main()
