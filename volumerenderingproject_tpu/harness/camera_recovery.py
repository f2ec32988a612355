"""Recover the unrecorded cameras behind the reference's golden captures.

The reference's image_output/*.png screenshots were taken after interactive
WASD/QE wandering (myApp.cu:1078-1112) and the camera state was never
recorded (SURVEY.md §6), so round 1 could only hold goldens to structural
checks.  But the reachable camera manifold is tiny — the camera always looks
at the origin, so a state is (direction on S^2, roll about front, radius),
and radius barely matters in the orthographic mode the captures used (it
slides the fixed-length sample window along the ray).  This module searches
that manifold for the camera maximizing normalized cross-correlation with
each golden, turning the goldens into near-pixel regressions.

Search: a Fibonacci-sphere x roll coarse sweep rendered on-device (one jit,
``lax.map`` over cameras, NCC reduced on-device so only scores come back),
then coordinate-descent refinement at the golden's native resolution.

Outputs ``goldens/recovered_cameras.json`` consumed by tests/test_goldens.py.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ingest.volume import Volume
from ..scene.camera import Camera
from ..scene.transfer_function import TransferFunction
from ..utils.config import Algorithm, RenderConfig
from ..utils.imageio import from_display, load_png
from . import goldens as gold

_f32 = jnp.float32

ALGO_BY_ID = {1: Algorithm.VRC, 5: Algorithm.TEST, 0: Algorithm.POINT}


def angles_to_camera(theta, phi, roll, radius=1.0) -> Camera:
    """Build the orbit camera at spherical direction (theta from +y, phi
    around y) with ``roll`` about the view axis — the reference's reachable
    states (always looking at the origin, utils.h:41-46 basis + accumulated
    WASD roll).  Fully traceable (jit/vmap-safe)."""
    theta = jnp.asarray(theta, _f32)
    phi = jnp.asarray(phi, _f32)
    roll = jnp.asarray(roll, _f32)
    dirv = jnp.stack([
        jnp.sin(theta) * jnp.cos(phi),
        jnp.cos(theta),
        jnp.sin(theta) * jnp.sin(phi),
    ])
    pos = jnp.asarray(radius, _f32) * dirv
    front = -dirv
    wu = jnp.asarray([0.0, 1.0, 0.0], _f32)
    r0 = jnp.cross(front, wu)
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0), 1e-8)
    u0 = jnp.cross(r0, front)
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0), 1e-8)
    right = jnp.cos(roll) * r0 + jnp.sin(roll) * u0
    up = -jnp.sin(roll) * r0 + jnp.cos(roll) * u0
    top_left = pos + (-right) + up  # screen_w/2 = screen_h/2 = 1 (square)
    return Camera(pos, front, right, up, top_left)


def _golden_gray(golden_path: str, algorithm: Algorithm,
                 res: Tuple[int, int]) -> np.ndarray:
    """Golden PNG -> canonical-frame grayscale [w, h] at resolution ``res``
    (integer-factor area downsample)."""
    disp = load_png(golden_path)
    img = from_display(disp, algorithm)  # [W, H, 3]
    g = img.mean(axis=-1)
    w, h = res
    fw, fh = g.shape[0] // w, g.shape[1] // h
    if fw > 1 or fh > 1:
        g = g[: w * fw, : h * fh].reshape(w, fw, h, fh).mean(axis=(1, 3))
    return g.astype(np.float32)


def _make_score_fn(volume: Volume, tf: TransferFunction,
                   config: RenderConfig, golden_gray: np.ndarray):
    """Device-side NCC(render(cam), golden): [3]-angle vector -> scalar."""
    from ..models.raycast import render

    gc = jnp.asarray(golden_gray - golden_gray.mean(), _f32)
    g_ss = jnp.sum(gc * gc)

    def score(angles):
        cam = angles_to_camera(angles[0], angles[1], angles[2])
        img = render(volume, tf, cam, config)
        r = img[..., :3].mean(axis=-1)
        rc = r - r.mean()
        denom = jnp.sqrt(jnp.sum(rc * rc) * g_ss) + 1e-12
        return jnp.sum(rc * gc) / denom

    return score


def fibonacci_directions(n: int) -> np.ndarray:
    """[n, 2] (theta, phi) roughly uniform on the sphere."""
    i = np.arange(n, dtype=np.float64) + 0.5
    theta = np.arccos(1.0 - 2.0 * i / n)
    phi = (math.pi * (1.0 + 5.0**0.5)) * i
    return np.stack([theta, phi % (2 * math.pi)], axis=-1).astype(np.float32)


def recover_camera(
    golden_path: str,
    volume: Volume,
    tf: TransferFunction,
    *,
    n_dirs: int = 1500,
    n_rolls: int = 12,
    search_res: int = 100,
    refine_res: Optional[int] = None,
    refine_rounds: int = 3,
    view_angles: Optional[list] = None,
    verbose: bool = True,
) -> Dict:
    """Search the orbit manifold for the golden's capture camera.

    ``view_angles``: optional list of view_angle values (radians) to ALSO
    search over — some captures were made after compile-time AppData edits
    (spr=500 itself requires one, utils.h:72), and view_angle (utils.h:54)
    sets the ortho screen width, i.e. the apparent head size.

    Returns {"angles": [theta, phi, roll], "ncc_search": s,
    "ncc_refined": s2, "view_angle": va, "camera": {...}}.
    """
    meta = gold.parse_golden_name(golden_path)
    if meta is None:
        raise ValueError(f"not a golden name: {golden_path}")
    algorithm = ALGO_BY_ID[meta["algorithm"]]
    native = (meta["width"], meta["height"])
    gg = _golden_gray(golden_path, algorithm, (search_res, search_res))

    dirs = fibonacci_directions(n_dirs)
    rolls = np.linspace(0.0, 2 * math.pi, n_rolls, endpoint=False,
                        dtype=np.float32)
    cand = np.concatenate(
        [
            np.repeat(dirs, n_rolls, axis=0),
            np.tile(rolls, n_dirs)[:, None],
        ],
        axis=-1,
    )  # [n_dirs * n_rolls, 3]
    chunk = 512
    pad = (-len(cand)) % chunk
    cand_p = np.pad(cand, ((0, pad), (0, 0)))

    best, angles, best_va = -2.0, None, None
    for va in (view_angles or [math.pi / 4]):
        cfg_search = RenderConfig(
            width=search_res, height=search_res,
            samples_per_ray=meta["spr"], algorithm=algorithm,
            early_termination=1e-3, view_angle=va,
        )
        score = _make_score_fn(volume, tf, cfg_search, gg)
        score_map = jax.jit(lambda a: jax.lax.map(score, a))
        scores = []
        for i in range(0, len(cand_p), chunk):
            scores.append(
                np.asarray(score_map(jnp.asarray(cand_p[i:i + chunk]))))
            if verbose and (i // chunk) % 8 == 0:
                b = float(np.concatenate(scores).max())
                print(f"  va={va:.3f} coarse {i + chunk}/{len(cand_p)} "
                      f"best NCC {b:.4f}", flush=True)
        scores = np.concatenate(scores)[: len(cand)]
        bi = int(np.argmax(scores))
        if float(scores[bi]) > best:
            best = float(scores[bi])
            angles = cand[bi].astype(np.float64)
            best_va = va
        if verbose:
            print(f"  va={va:.3f} best NCC {float(scores[bi]):.4f}",
                  flush=True)
    ncc_coarse = best
    if verbose:
        print(f"  coarse best NCC {best:.4f} at angles {angles} "
              f"va {best_va:.3f}", flush=True)

    # --- coordinate-descent refinement at (near-)native resolution -------
    refine_res = refine_res or min(native[0], 350)
    # keep integer downsample factors for the golden
    while native[0] % refine_res:
        refine_res -= 1
    cfg_ref = RenderConfig(
        width=refine_res, height=refine_res, samples_per_ray=meta["spr"],
        algorithm=algorithm, early_termination=1e-3, view_angle=best_va,
    )
    gg_ref = _golden_gray(golden_path, algorithm, (refine_res, refine_res))
    score_ref = jax.jit(_make_score_fn(volume, tf, cfg_ref, gg_ref))
    best = float(score_ref(jnp.asarray(angles, _f32)))
    step = np.array([0.05, 0.05, 0.05])
    for r in range(refine_rounds):
        for _ in range(8):
            improved = False
            for k in range(3):
                for sgn in (1.0, -1.0):
                    trial = angles.copy()
                    trial[k] += sgn * step[k]
                    s = float(score_ref(jnp.asarray(trial, _f32)))
                    if s > best:
                        best, angles, improved = s, trial, True
            if not improved:
                break
        step /= 4.0
        if verbose:
            print(f"  refine round {r}: NCC {best:.4f}", flush=True)

    cam = angles_to_camera(*angles)
    return {
        "golden": os.path.basename(golden_path),
        "angles": [float(a) for a in angles],
        "ncc_search": ncc_coarse,
        "ncc_refined": best,
        "refine_res": refine_res,
        "view_angle": float(best_va),
        "camera": {
            k: np.asarray(getattr(cam, k)).tolist()
            for k in ("position", "front", "right", "up", "top_left")
        },
    }


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("goldens", nargs="*",
                    default=None, help="golden PNGs (default: all a1/a5)")
    ap.add_argument("--golden-dir", default="/root/reference/image_output")
    ap.add_argument("--dataset",
                    default="/root/reference/avg152T1_LR_nifti2.nii")
    ap.add_argument("--out", default="goldens/recovered_cameras.json")
    ap.add_argument("--n-dirs", type=int, default=1500)
    ap.add_argument("--n-rolls", type=int, default=12)
    args = ap.parse_args(argv)

    from ..ingest.nifti import load_nifti
    from ..scene.transfer_function import default_transfer_function

    volume = load_nifti(args.dataset)
    tf = default_transfer_function()
    paths = args.goldens or sorted(
        os.path.join(args.golden_dir, f)
        for f in os.listdir(args.golden_dir)
        if (m := gold.parse_golden_name(f)) and m["algorithm"] in (1, 5)
    )
    out: Dict[str, Dict] = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    for p in paths:
        print(f"recovering {os.path.basename(p)} ...", flush=True)
        rec = recover_camera(p, volume, tf,
                             n_dirs=args.n_dirs, n_rolls=args.n_rolls)
        out[rec["golden"]] = rec
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"  -> NCC {rec['ncc_refined']:.4f} (saved)", flush=True)


if __name__ == "__main__":
    main()
