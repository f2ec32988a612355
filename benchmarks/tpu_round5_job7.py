"""Round-5 chip job 7: a5 chunk-depth sweep beyond 16 (steps 16/24/32).

DESIGN §8e stopped the sweep at steps=16 (4 -> 8 -> 16 kept winning
monotonically); this job extends it in ONE process (same-process A/B —
the only trustworthy delta on this rig, DESIGN §7b) on:

  j7a: MNI-1mm-class (182, 218, 182) a5 unlit + lit, 304^2 x 300
  j7b: 320^3 id-stream a5 plain, 304^2 x 300
  j7c: bit-exactness of steps=24/32 vs steps=16 at early_eps=0 —
       per-sample math is in-order, so with early termination OFF any
       depth must be value-IDENTICAL (asserted, not assumed).  With
       early_eps=1e-3 the exit is checked per CHUNK, so stop points
       quantize to the chunk depth and images differ by O(eps) — the
       max abs diff is recorded (this also retroactively explains why
       the §8e sweep's bit-exact claim held: it compared at eps=0).

Appends results to benchmarks/tpu_round5_results2.json as they land.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_round5_results2.json")


def main():
    import jax

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas
    from volumerenderingproject_tpu.utils.config import Algorithm

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

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

    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    rng = np.random.default_rng(7)

    cfg5 = RenderConfig(width=304, height=304, samples_per_ray=300,
                        algorithm=Algorithm.TEST, early_termination=1e-3)

    # ---- j7c first: bit-exactness gate on a small config ----------------
    small = make_volume(
        rng.uniform(0, 255, (140, 150, 140)).astype(np.float32))
    imgs_exact, imgs_et = {}, {}
    for steps in (16, 24, 32):
        f0 = jax.jit(lambda v, s=steps: render_test_pallas(
            v, tf, cam, cfg5, early_eps=0.0, steps=s))
        f1 = jax.jit(lambda v, s=steps: render_test_pallas(
            v, tf, cam, cfg5, early_eps=cfg5.early_termination, steps=s))
        imgs_exact[steps] = np.asarray(f0(small))
        imgs_et[steps] = np.asarray(f1(small))
    for steps in (24, 32):
        same = bool(np.array_equal(imgs_exact[16], imgs_exact[steps]))
        diff = float(np.abs(imgs_et[16] - imgs_et[steps]).max())
        results[f"j7c_steps{steps}_bitexact_vs16_eps0"] = same
        results[f"j7c_steps{steps}_maxdiff_vs16_eps1e3"] = diff
        print(f"j7c steps={steps}: eps=0 bit-exact {same}, "
              f"eps=1e-3 maxdiff {diff:.2e}", flush=True)
        assert same, f"steps={steps} not value-identical at eps=0"
    save()

    # ---- j7a: MNI-1mm unlit + lit across steps --------------------------
    mni = make_volume(
        rng.uniform(0, 255, (182, 218, 182)).astype(np.float32))
    for name, kw in (("unlit", {}), ("lit", dict(lighting=True))):
        c = cfg5.replace(**kw)
        for steps in (16, 24, 32):
            f = jax.jit(lambda v, c=c, s=steps: render_test_pallas(
                v, tf, cam, c, early_eps=c.early_termination, steps=s))
            t, _ = timed(f, mni, reps=3)
            results[f"j7a_mni_{name}_steps{steps}_ms"] = t * 1e3
            save()
            print(f"j7a mni {name} steps={steps}: {t*1e3:.1f} ms",
                  flush=True)

    # ---- j7b: 320^3 id-stream plain across steps ------------------------
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    for steps in (16, 24, 32):
        f = jax.jit(lambda v, s=steps: render_test_pallas(
            v, tf, cam, cfg5, early_eps=cfg5.early_termination, steps=s))
        t, _ = timed(f, dense, reps=2)
        results[f"j7b_320_idstream_steps{steps}_ms"] = t * 1e3
        save()
        print(f"j7b 320 id-stream steps={steps}: {t*1e3:.1f} ms",
              flush=True)

    print("DONE", json.dumps(
        {k: v for k, v in results.items() if k.startswith("j7")},
        indent=1), flush=True)


if __name__ == "__main__":
    main()
