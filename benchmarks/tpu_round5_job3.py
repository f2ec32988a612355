"""Round-5 TPU job 3: lit/scattered packed a5 at MNI-1mm scale (VERDICT
r3 item 2 done-criterion: a lit a5 render of a 182x218x182 volume runs
fused at <~2.5x the unlit packed time, vs the ~1.6 s XLA cliff).

  r5c_a5_packed_mni_304        unlit packed a5 (the r3 baseline path)
  r5c_a5_lit_packed_mni_304    lit packed a5 through the streamed (M, S)
  r5c_a5_scatter_packed_mni_304  scattering variant
  r5c_a5_lit_vs_unlit_ratio    the <= 2.5x done-criterion
  r5c_a5_lit_packed_err        on-chip parity vs the XLA a5 scan

Also re-times the 512^3 streamed-lit a1 cases job2 could not finish
before the conv OOM fix (r5b keys).  Appends to tpu_round5_results.json.
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
    from volumerenderingproject_tpu.models.raycast import (
        render,
        render_test,
        render_vrc,
    )
    from volumerenderingproject_tpu.scene.camera import Camera
    from volumerenderingproject_tpu.utils.config import Algorithm

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    tf = default_transfer_function()
    cam = Camera.initial(position=(0.9, 0.35, 0.75))

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

    # MNI-1mm-class synthetic (the reference's default dataset shape,
    # myApp.cu:240: 182 x 218 x 182)
    rng = np.random.default_rng(7)
    dims = (182, 218, 182)
    coords = [np.arange(d, dtype=np.float32) for d in dims]
    cc = [d / 2.0 for d in dims]
    r = np.sqrt(sum(((c - m) / m) ** 2 for c, m in zip(
        np.meshgrid(*coords, indexing="ij"), cc)))
    mni = make_volume(
        np.where(r < 0.85, 40.0 + 180.0 * (1.0 - r), 0.0).astype(np.float32))

    cfg5 = RenderConfig(width=304, height=304, samples_per_ray=300,
                        algorithm=Algorithm.TEST, early_termination=1e-3)
    for name, c in (
        ("r5c_a5_packed_mni_304", cfg5),
        ("r5c_a5_lit_packed_mni_304", cfg5.replace(lighting=True)),
        ("r5c_a5_scatter_packed_mni_304", cfg5.replace(scattering=True)),
    ):
        t, _ = timed(render_j, mni, c)
        results[name + "_ms"] = t * 1e3
        save()
        print(f"{name}: {t*1e3:.1f} ms", flush=True)
    results["r5c_a5_lit_vs_unlit_ratio"] = (
        results["r5c_a5_lit_packed_mni_304_ms"]
        / results["r5c_a5_packed_mni_304_ms"])

    # parity (exact mode, small reps) + one XLA-cliff timing
    c_lit = cfg5.replace(lighting=True, early_termination=0.0,
                         width=128, height=128, samples_per_ray=128)
    got = np.asarray(render_j(mni, c_lit))
    want = np.asarray(jax.jit(
        lambda v: render_test(v, tf, cam, c_lit, mode="fast"))(mni))
    err = float(np.abs(got - want).max())
    results["r5c_a5_lit_packed_err"] = err
    save()
    print(f"a5 lit packed parity err {err:.2e}", flush=True)
    assert err <= 6e-3, err

    # 512^3 streamed-lit a1 (job2 rerun post conv fix)
    def sphere(n):
        xs = np.linspace(-1, 1, n, dtype=np.float32)
        r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
              + xs[None, None, :] ** 2)
        return make_volume(
            np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))

    cfg = RenderConfig(width=304, height=304, samples_per_ray=300,
                       early_termination=1e-3)
    vol320 = sphere(320)
    for name, c in (
        ("r5b_streamed_lit_320", cfg.replace(lighting=True)),
        ("r5b_streamed_scatter_320", cfg.replace(scattering=True)),
    ):
        t, _ = timed(render_j, vol320, c)
        results[name + "_ms"] = t * 1e3
        save()
        print(f"{name}: {t*1e3:.1f} ms", flush=True)

    c_lit = cfg.replace(lighting=True, early_termination=0.0)
    got = np.asarray(render_j(vol320, c_lit))
    t0 = time.perf_counter()
    want = np.asarray(jax.jit(
        lambda v: render_vrc(v, tf, cam, c_lit, mode="fast"))(vol320))
    t_xla = time.perf_counter() - t0
    err = float(np.abs(got - want).max())
    results["r5b_streamed_lit_320_err"] = err
    results["r5b_xla_lit_320_ms_incl_compile"] = t_xla * 1e3
    save()
    print(f"streamed lit 320 err {err:.2e}; XLA {t_xla*1e3:.0f} ms "
          "(incl compile)", flush=True)
    assert err <= 6e-3, err

    vol512 = sphere(512)
    for name, c in (
        ("r5b_streamed_plain_512", cfg),
        ("r5b_streamed_lit_512", cfg.replace(lighting=True)),
    ):
        t, _ = timed(render_j, vol512, c, reps=2)
        results[name + "_ms"] = t * 1e3
        save()
        print(f"{name}: {t*1e3:.1f} ms", flush=True)

    print(json.dumps({k: v for k, v in sorted(results.items())
                      if k.startswith(("r5b", "r5c"))}, indent=2))


if __name__ == "__main__":
    main()
