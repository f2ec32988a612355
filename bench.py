"""Benchmark: rays/s/chip on the BASELINE.json config matrix.

Headline: the flagship a1/VRC fused Pallas ray-marcher on avg152T1 (the
bundled reference dataset) at 700x700, 500 samples/ray (the reference's
maximum demonstrated workload, BASELINE.md), on the real TPU chip.

Also regression-gates the rest of the BASELINE config matrix (VERDICT
round-2 item 7) so the numbers can't rot silently between rounds:

  * lut_phong_300:    300^2 x 300, dense-LUT classify + fused Phong
                      (BASELINE config 2)
  * sobel_lit_700:    700^2 x 250, Sobel gradient prefilter + shading
                      (BASELINE config 4)
  * streamed_320:     320^3 synthetic (beyond the VMEM-resident budget),
                      304^2 x 300, HBM-streamed kernel (BASELINE config 3
                      at large-volume scale)
  * multichannel_304: 3-channel avg152-scale 4-D volume, 304^2 x 300,
                      fused multichannel kernel (BASELINE config 5)

Prints ONE JSON line:

    {"metric": "rays_per_sec_700x700_spr500", "value": N, "unit": "rays/s",
     "vs_baseline": R, "value_exact_mode": N2, "configs": {...}}

Protocol: per config, a camera orbit is marched inside ONE jit (lax.scan
over stacked cameras, each frame reduced on-device to its [0,0] pixel so
no frame can be elided), timed end-to-end and divided by the frame count.
This measures sustained device throughput the way the reference's render
loop consumes it (frame after frame, myApp.cu:861), and keeps host-link
round-trip latency — ~33 ms/call through the axon tunnel on this rig,
several times the actual per-frame compute — out of the number.  Each
repetition jitters the orbit angles so no caching layer (JAX or platform)
can elide work; the best repetition is reported.  The secondary configs
are time-gated so a slow relay compile queue can't starve the headline.

The reference publishes no numbers (BASELINE.md: README is build notes
only), so ``vs_baseline`` is measured against this repo's committed anchor
(BENCH_ANCHOR.json, recorded on the first benchmarked build) — i.e. the
round-over-round speedup factor.

GATING (round-4: VERDICT r3 item 6 — "bench.py records but never gates"):
``FLOORS`` commits a floor per metric (75% of the best recorded headline,
70% of the best recorded matrix value — under the ±20% cross-program rig
variance DESIGN §4b documents, a pass below floor is a real regression,
not noise).  Any metric below floor, any config error, and any on-chip
parity failure lands in ``"regressed"`` and the process EXITS NONZERO.
Time-budget skips are reported in ``"skipped"`` (visible, not fatal: the
relay queue is outside this repo's control).  The on-chip parity gate
(benchmarks/onchip_parity.py — the suite that caught the two
hardware-only bf16-MXU precision bugs in round 3) is folded into every
run so that bug class cannot silently return.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ANCHOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR.json")
DATASET = "/root/reference/avg152T1_LR_nifti2.nii"

FRAMES = 32
REPS = 5
MATRIX_FRAMES = 8
MATRIX_REPS = 3
TIME_BUDGET_S = 2100  # stop starting new configs past this

# Committed regression floors (rays/s): 0.75 x best recorded headline
# (64.48M, benchmarks/bench_r5_trial.json — the round-5 record run;
# exact 54.18M same run), 0.70 x best recorded matrix values.  Update
# alongside any intentional protocol change; raising a floor requires a
# recorded run above it.  A below-floor headline/exact is NOT fatal when
# the automated same-rhythm A/B (out["ab"]) proves rig noise.
FLOORS = {
    "headline": 48.4e6,
    "exact": 40.6e6,
    # 0.70 x best on record (benchmarks/bench_r5_trial.json): lut_phong
    # 4.18M, sobel_lit 14.97M, streamed 3.58M, streamed_lit 0.82M,
    # multichannel 3.61M, streamed_a5 0.36M; a5 2.48M (BENCH_r03)
    "lut_phong_300": 2.92e6,
    "sobel_lit_700": 10.5e6,
    "a5_500": 1.73e6,
    "streamed_320": 2.51e6,
    "streamed_lit_320": 0.58e6,
    "streamed_a5_320": 0.25e6,
    "multichannel_304": 2.53e6,
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        RenderConfig,
        default_transfer_function,
        load_nifti,
        make_volume,
    )
    from volumerenderingproject_tpu.models.raycast import render
    from volumerenderingproject_tpu.scene.camera import Camera

    if os.path.exists(DATASET):
        volume = load_nifti(DATASET)
    else:  # fall back to the synthetic fixture if the dataset is absent
        from volumerenderingproject_tpu.ingest import synthetic

        volume = synthetic.centered_sphere(100)
    tf = default_transfer_function()
    # early_termination=1e-3 enables the fused kernel's early ray exit —
    # bounded error < 1/255 (invisible in 8-bit output), an optimization the
    # reference's back-to-front blend order cannot express (kernel.cu:194-225)
    config = RenderConfig(
        width=700, height=700, samples_per_ray=500, early_termination=1e-3
    )

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    t_start = time.time()

    def orbit_cameras(frames, jitter: np.ndarray, radius=1.5):
        thetas = np.linspace(0.0, 2.0 * np.pi, frames + 1)[:frames] + jitter
        cams = [
            Camera.initial(
                position=(
                    radius * np.cos(t),
                    0.4 + 0.2 * np.sin(2.0 * t),
                    radius * np.sin(t),
                )
            )
            for t in thetas
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    def bench_config(vol, cfg, frames, reps):
        """Best-of-reps rays/s through the render() dispatcher (which
        routes to the fused / streamed / multichannel kernels)."""

        @jax.jit
        def render_orbit(volume_, tf_, cams):
            def frame(carry, cam):
                img = render(volume_, tf_, cam, cfg)
                return carry + img[0, 0], None

            probe, _ = jax.lax.scan(
                frame, jnp.zeros((4,), jnp.float32), cams)
            return probe

        np.asarray(render_orbit(
            vol, tf, orbit_cameras(frames, rng.random(frames) * 1e-4)))
        times = []
        for _ in range(reps):
            cams = orbit_cameras(frames, rng.random(frames) * 1e-4)
            t0 = time.time()
            np.asarray(render_orbit(vol, tf, cams))
            times.append(time.time() - t0)
        return cfg.num_rays / (min(times) / frames)

    # ---- headline: a1 700x700 spr500 -----------------------------------
    rays_per_sec = bench_config(volume, config, FRAMES, REPS)

    # exact mode (early_termination=0, bit-exact vs the scan renderer):
    # tracked so the exactness-vs-speed tradeoff is visible round-over-round
    rays_per_sec_exact = None
    if time.time() - t_start < 900:
        rays_per_sec_exact = bench_config(
            volume, config.replace(early_termination=0.0),
            FRAMES, max(2, REPS - 2))

    # ---- BASELINE config matrix (time-gated) ---------------------------
    configs = {}

    regressed = []
    skipped = []
    matrix_inputs = {}

    def matrix(name, vol, cfg):
        matrix_inputs[name] = (vol, cfg)
        if time.time() - t_start > TIME_BUDGET_S:
            configs[name] = None  # skipped: time budget
            skipped.append(name)
            return
        try:
            configs[name] = round(
                bench_config(vol, cfg, MATRIX_FRAMES, MATRIX_REPS), 1)
        except Exception as e:  # record the failure AND gate on it
            configs[name] = f"error: {type(e).__name__}"
            regressed.append(f"{name}: {type(e).__name__}: {e}")

    matrix(
        "lut_phong_300",
        volume,
        RenderConfig(width=300, height=300, samples_per_ray=300,
                     tf_lut=256, lighting=True, early_termination=1e-3),
    )
    matrix(
        "sobel_lit_700",
        volume,
        RenderConfig(width=700, height=700, samples_per_ray=250,
                     lighting=True, gradient_filter="sobel",
                     early_termination=1e-3),
    )
    from volumerenderingproject_tpu.utils.config import Algorithm

    matrix(
        "a5_500",
        volume,
        RenderConfig(width=500, height=500, samples_per_ray=500,
                     algorithm=Algorithm.TEST, early_termination=1e-3),
    )

    # 320^3 dense synthetic: beyond the VMEM-resident budget -> streamed
    xs = np.linspace(-1, 1, 320, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    dense = make_volume(
        np.where(r2 < 0.8, 55.0 + 60.0 * r2, 0.0).astype(np.float32))
    matrix(
        "streamed_320",
        dense,
        RenderConfig(width=304, height=304, samples_per_ray=300,
                     early_termination=1e-3),
    )
    # round-4: streamed baked lighting (BASELINE config 4 at large-volume
    # scale — the u8-quantized (M, S) pack streamed with the id blocks)
    matrix(
        "streamed_lit_320",
        dense,
        RenderConfig(width=304, height=304, samples_per_ray=300,
                     lighting=True, early_termination=1e-3),
    )

    # streamed a5 (round-5: the 4-bit id grid itself streams per x-block
    # — 320^3's id grid exceeds the resident a5 VMEM budget)
    matrix(
        "streamed_a5_320",
        dense,
        RenderConfig(width=304, height=304, samples_per_ray=300,
                     algorithm=Algorithm.TEST, early_termination=1e-3),
    )

    # 3-channel avg152-scale synthetic (the RGB16_4D-class workload)
    xs = np.linspace(-1, 1, 91, dtype=np.float32)
    r2 = (xs[:, None, None] ** 2 + xs[None, :, None] ** 2
          + xs[None, None, :] ** 2)
    base = np.where(r2 < 0.8, 40.0 + 80.0 * (1.0 - r2), 0.0)
    vol3 = make_volume(
        np.stack([base, base * 0.7, base * 0.4], axis=-1).astype(np.float32))
    matrix(
        "multichannel_304",
        vol3,
        RenderConfig(width=304, height=304, samples_per_ray=300,
                     early_termination=1e-3),
    )

    if os.path.exists(ANCHOR_PATH):
        with open(ANCHOR_PATH) as f:
            anchor = json.load(f)["rays_per_sec"]
    else:
        anchor = rays_per_sec
        with open(ANCHOR_PATH, "w") as f:
            json.dump(
                {"rays_per_sec": rays_per_sec, "config": "700x700 spr500 a1"},
                f,
            )

    out = {
        "metric": "rays_per_sec_700x700_spr500",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / anchor, 3),
    }
    if rays_per_sec_exact is not None:
        out["value_exact_mode"] = round(rays_per_sec_exact, 1)
    out["configs"] = configs

    # ---- floors + on-chip parity gate ----------------------------------
    # Round-4 finding: this rig's cross-process throughput swings up to
    # ~2.5x on minutes-scale (measured 28 -> 70 M rays/s back-to-back on
    # identical code), so a single below-floor measurement is weak
    # evidence.  Any breached value is RE-MEASURED at the end of the run
    # (max of the two counts) before being declared a regression.
    def retry_headline(cfg_, frames, reps):
        try:
            return bench_config(volume, cfg_, frames, reps)
        except Exception:
            return 0.0

    if rays_per_sec < FLOORS["headline"] and \
            time.time() - t_start < TIME_BUDGET_S + 900:
        rays_per_sec = max(rays_per_sec, retry_headline(
            config, FRAMES, max(2, REPS - 2)))
        out["value"] = round(rays_per_sec, 1)
        out["vs_baseline"] = round(rays_per_sec / anchor, 3)
    if rays_per_sec < FLOORS["headline"]:
        regressed.append(
            f"headline: {rays_per_sec:.3g} < floor {FLOORS['headline']:.3g}")
    if rays_per_sec_exact is not None and rays_per_sec_exact < FLOORS["exact"]:
        if time.time() - t_start < TIME_BUDGET_S + 900:
            rays_per_sec_exact = max(rays_per_sec_exact, retry_headline(
                config.replace(early_termination=0.0), FRAMES, 2))
            out["value_exact_mode"] = round(rays_per_sec_exact, 1)
        if rays_per_sec_exact < FLOORS["exact"]:
            regressed.append(
                f"exact: {rays_per_sec_exact:.3g} < floor "
                f"{FLOORS['exact']:.3g}")

    # matrix floors, with one end-of-run retry per breached config
    for name, val in list(configs.items()):
        floor = FLOORS.get(name)
        if floor is None or not isinstance(val, (int, float)) or val is None:
            continue
        if val < floor and time.time() - t_start < TIME_BUDGET_S + 900:
            try:
                vol_i, cfg_i = matrix_inputs[name]
                val = max(val, round(bench_config(
                    vol_i, cfg_i, MATRIX_FRAMES, MATRIX_REPS), 1))
                configs[name] = val
            except Exception:
                pass
        if val < floor:
            regressed.append(f"{name}: {val:.3g} < floor {floor:.3g}")

    # re-run the on-chip parity suite every bench (the class of bug it
    # catches — hardware-only precision drift — is invisible to every
    # CPU/interpret test); skipped only if the time budget is exhausted
    if time.time() - t_start < TIME_BUDGET_S + 600:
        try:
            import sys as _sys

            _sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
            import onchip_parity

            onchip_parity.main()
            with open(onchip_parity.OUT) as f:
                out["parity"] = {"ok": True, "paths": len(json.load(f))}
        except Exception as e:
            out["parity"] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            regressed.append(f"onchip_parity: {type(e).__name__}: {e}")
    else:
        out["parity"] = None
        skipped.append("onchip_parity")

    # ---- automated A/B ratchet (VERDICT r4 item 8) ---------------------
    # Whenever the headline lands below the PRIOR ROUND's recorded value
    # (not just below floor), settle rig-noise-vs-drift with the DESIGN
    # §7b method: alternate headline-only subprocesses between HEAD and a
    # git worktree of the commit the prior bench actually measured, same
    # process rhythm for both.  Recorded in out["ab"] either way the
    # verdict goes; 2.5x cross-process variance can no longer masquerade
    # as (or mask) real drift.
    if time.time() - t_start < TIME_BUDGET_S:
        try:
            ab = _ab_against_prior_round(rays_per_sec)
        except Exception as e:  # A/B is evidence, never a crash source
            ab = {"error": f"{type(e).__name__}: {e}"}
        if ab is not None:
            out["ab"] = ab
            if ab.get("verdict") == "rig_noise":
                # the same-rhythm A/B proved the old code reads the same
                # on this rig right now — but it only MEASURES the
                # headline path, so only the headline/exact floor gates
                # may be waived by it; matrix-config regressions (their
                # kernels are disjoint from the headline's) still fail
                def _waivable(r):
                    return ("< floor" in r
                            and (r.startswith("headline:")
                                 or r.startswith("exact:")))

                kept = [r for r in regressed if not _waivable(r)]
                if len(kept) != len(regressed):
                    out["below_floor_rig_noise"] = [
                        r for r in regressed if _waivable(r)]
                regressed = kept

    out["regressed"] = regressed
    out["skipped"] = skipped
    print(json.dumps(out))
    if regressed:
        raise SystemExit(1)


def _repo_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _prior_round_record():
    """(path, value, code_commit) of the newest BENCH_r*.json, where
    code_commit is the parent of the commit that added the JSON — i.e.
    the tree the driver actually benched."""
    import glob
    import re
    import subprocess

    repo = _repo_dir()
    benches = sorted(
        glob.glob(os.path.join(repo, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not benches:
        return None
    path = benches[-1]
    try:
        value = json.load(open(path)).get("parsed", {}).get("value")
    except Exception:
        return None
    if not isinstance(value, (int, float)):
        return None
    rev = subprocess.run(
        ["git", "-C", repo, "log", "-1", "--format=%H",
         "--", os.path.basename(path)],
        capture_output=True, text=True, timeout=60)
    if rev.returncode != 0 or not rev.stdout.strip():
        return None
    commit = rev.stdout.strip()
    parent = subprocess.run(
        ["git", "-C", repo, "rev-parse", commit + "^"],
        capture_output=True, text=True, timeout=60)
    if parent.returncode != 0:
        return None
    return path, float(value), parent.stdout.strip()


def _ab_against_prior_round(current_value: float):
    """If current headline < prior round's record, alternate headline-only
    subprocesses HEAD/old-worktree (2 runs each) and report both."""
    import subprocess
    import sys
    import tempfile

    rec = _prior_round_record()
    if rec is None:
        return None
    prior_path, prior_value, old_commit = rec
    # run whenever the headline is below the prior round's record OR the
    # committed floor (the rig-noise verdict rescues the floor gate)
    if current_value >= max(prior_value, FLOORS["headline"]):
        return None

    import shutil

    repo = _repo_dir()
    wt = tempfile.mkdtemp(prefix="bench_ab_")
    # run a COPY of this driver from a neutral dir: sys.path[0] is the
    # script's dir, which would otherwise shadow PYTHONPATH's package pick
    driver_dir = tempfile.mkdtemp(prefix="bench_ab_driver_")
    driver = os.path.join(driver_dir, "bench_ab_driver.py")
    shutil.copyfile(os.path.abspath(__file__), driver)
    ab = {
        "prior_record": {"file": os.path.basename(prior_path),
                         "value": prior_value},
        "old_commit": old_commit,
        "runs_old": [],
        "runs_new": [],
    }
    try:
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", wt,
             old_commit],
            check=True, capture_output=True, timeout=120)
        # The NEW bench driver file runs in both arms; PYTHONPATH selects
        # which package code gets imported (both are importable in place).
        for i, (arm, path) in enumerate((("old", wt), ("new", repo),
                                         ("old", wt), ("new", repo))):
            env = dict(os.environ, PYTHONPATH=path)
            try:
                r = subprocess.run(
                    [sys.executable, driver, "--headline-only"],
                    capture_output=True, text=True, timeout=1200, env=env,
                    cwd=driver_dir)
                val = json.loads(r.stdout.strip().splitlines()[-1])["value"]
            except Exception:
                val = None
            ab[f"runs_{arm}"].append(val)
            if i == 1 and not any(ab["runs_old"]) and not any(ab["runs_new"]):
                break  # relay queue is eating whole subprocesses; stop
        olds = [v for v in ab["runs_old"] if v]
        news = [v for v in ab["runs_new"] if v]
        if olds and news:
            ab["ratio_new_over_old"] = round(max(news) / max(olds), 3)
            ab["verdict"] = (
                "code_regression" if max(news) < 0.85 * max(olds)
                else "rig_noise")
    finally:
        subprocess.run(["git", "-C", repo, "worktree", "remove",
                        "--force", wt], capture_output=True, timeout=120)
        shutil.rmtree(driver_dir, ignore_errors=True)
    return ab


def _headline_only() -> None:
    """One A/B arm: measure just the headline with a reduced protocol and
    print {"value": N}.  Package code comes from PYTHONPATH (set by the
    caller to HEAD or the old worktree)."""
    import jax
    import jax.numpy as jnp

    from volumerenderingproject_tpu import (
        RenderConfig, default_transfer_function, load_nifti, make_volume)
    from volumerenderingproject_tpu.models.raycast import render
    from volumerenderingproject_tpu.scene.camera import Camera

    if os.path.exists(DATASET):
        volume = load_nifti(DATASET)
    else:
        from volumerenderingproject_tpu.ingest import synthetic

        volume = synthetic.centered_sphere(100)
    tf = default_transfer_function()
    cfg = RenderConfig(width=700, height=700, samples_per_ray=500,
                       early_termination=1e-3)
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    frames, reps = 16, 2

    def orbit(jitter):
        thetas = (np.linspace(0.0, 2.0 * np.pi, frames + 1)[:frames]
                  + jitter)
        cams = [Camera.initial(position=(1.5 * np.cos(t),
                                         0.4 + 0.2 * np.sin(2.0 * t),
                                         1.5 * np.sin(t)))
                for t in thetas]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    @jax.jit
    def render_orbit(volume_, tf_, cams):
        def frame(carry, cam):
            return carry + render(volume_, tf_, cam, cfg)[0, 0], None

        probe, _ = jax.lax.scan(frame, jnp.zeros((4,), jnp.float32), cams)
        return probe

    np.asarray(render_orbit(volume, tf, orbit(rng.random(frames) * 1e-4)))
    times = []
    for _ in range(reps):
        cams = orbit(rng.random(frames) * 1e-4)
        t0 = time.time()
        np.asarray(render_orbit(volume, tf, cams))
        times.append(time.time() - t0)
    print(json.dumps({"value": cfg.num_rays / (min(times) / frames)}))


if __name__ == "__main__":
    import sys

    if "--headline-only" in sys.argv:
        _headline_only()
    else:
        main()
