"""Round-5 chip job 4 (final): parity at HEAD + streamed-a5 re-measure
with the shared-budget block sizing (a5_stream_geometry round-5 tune).
Appends j4_* to benchmarks/tpu_round5_results2.json.
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
    from volumerenderingproject_tpu.utils.config import Algorithm
    from volumerenderingproject_tpu.models.raycast import render

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    import onchip_parity

    onchip_parity.main()
    with open(onchip_parity.OUT) as f:
        results["j4_parity_paths"] = len(json.load(f))
    save()

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

    def vol_of(nn):
        xs = np.linspace(-1, 1, nn, dtype=np.float32)
        r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
              + xs[None, None, :] ** 2)
        return make_volume(
            np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))

    cfg5 = RenderConfig(width=304, height=304, samples_per_ray=300,
                        algorithm=Algorithm.TEST, early_termination=1e-3)
    for nn in (320, 512):
        vol = vol_of(nn)
        for name, kw in (("plain", {}), ("lit", dict(lighting=True))):
            c = cfg5.replace(**kw)
            f = jax.jit(lambda v, c=c: render(v, tf, cam, c))
            t, _ = timed(f, vol, reps=2)
            results[f"j4_a5_{nn}_{name}_ms"] = t * 1e3
            save()
            print(f"j4 a5 {nn} {name}: {t*1e3:.1f} ms", flush=True)

    print("DONE", json.dumps(
        {k: v for k, v in results.items() if k.startswith("j4")},
        indent=1), flush=True)


if __name__ == "__main__":
    main()
