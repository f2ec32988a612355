"""Round-5 chip job 2: manual-block-major A/B (round-4 VERDICT item 6).

Same-process A/B of the streamed variants at 512^3 and 320^3 (plain,
lit, LUT): tile-major manual (current default) vs manual_block_major
(one invocation, each block DMA'd once per frame).  Also re-checks mbm
parity on-chip at small scale before timing.  Appends to
benchmarks/tpu_round5_results2.json.
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
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render_vrc
    from volumerenderingproject_tpu.ops.pallas_march import (
        render_vrc_pallas_streamed,
    )

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

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

    # on-chip parity of mbm at small scale first (gates the timings)
    vol_s = make_volume(rng.uniform(0, 255, (24, 12, 11)).astype(np.float32))
    cfg_s = RenderConfig(width=32, height=32, samples_per_ray=24)
    want = render_vrc(vol_s, tf, cam, cfg_s, mode="fast")
    got = render_vrc_pallas_streamed(
        vol_s, tf, cam, cfg_s, early_eps=0.0, block_x=8,
        manual_block_major=True)
    err = float(jnp.abs(got - want).max())
    results["j2_mbm_parity_err"] = err
    save()
    assert err <= 2e-5, err
    print("j2 parity ok", err, flush=True)

    def vol_of(nn):
        xs = np.linspace(-1, 1, nn, dtype=np.float32)
        r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
              + xs[None, None, :] ** 2)
        return make_volume(
            np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))

    for nn in (320, 512):
        vol = vol_of(nn)
        cfg = RenderConfig(width=304, height=304, samples_per_ray=300,
                           early_termination=1e-3)
        for name, kw in (
            ("plain", {}),
            ("lit", dict(lighting=True)),
        ):
            c = cfg.replace(**kw)
            for mode, mkw in (("manual", dict(manual=True)),
                              ("mbm", dict(manual_block_major=True))):
                f = jax.jit(lambda v, c=c, mkw=mkw: render_vrc_pallas_streamed(
                    v, tf, cam, c, early_eps=c.early_termination, **mkw))
                t, _ = timed(f, vol, reps=3)
                results[f"j2_{nn}_{name}_{mode}_ms"] = t * 1e3
                save()
                print(f"j2 {nn} {name} {mode}: {t*1e3:.1f} ms", flush=True)

    # ---- lit a5 at MNI-1mm: the ms_nzr==1 flattened fetch (item 5) -----
    from volumerenderingproject_tpu.models.raycast import render_test
    from volumerenderingproject_tpu.utils.config import Algorithm

    mni = make_volume(
        rng.uniform(0, 255, (182, 218, 182)).astype(np.float32))
    cfg5 = RenderConfig(width=304, height=304, samples_per_ray=300,
                        algorithm=Algorithm.TEST, early_termination=1e-3)
    from volumerenderingproject_tpu.ops.pallas_a5 import render_test_pallas

    for name, kw in (("unlit", {}), ("lit", dict(lighting=True))):
        c = cfg5.replace(**kw)
        f = jax.jit(lambda v, c=c: render_test_pallas(
            v, tf, cam, c, early_eps=c.early_termination))
        t, _ = timed(f, mni, reps=3)
        results[f"j2_a5_mni_{name}_ms"] = t * 1e3
        save()
        print(f"j2 a5 mni {name}: {t*1e3:.1f} ms", flush=True)
    results["j2_a5_lit_ratio"] = (results["j2_a5_mni_lit_ms"]
                                  / results["j2_a5_mni_unlit_ms"])
    save()
    print("DONE", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
