"""AOT evidence for backward/collective overlap (VERDICT round-2 item 5).

No multi-chip hardware is attached in this environment, but the TPU
compiler is fully usable client-side: `jax.experimental.topologies`
describes an 8-chip v5e slice and `jit(...).lower(...).compile()` runs
the real XLA:TPU pipeline (including the latency-hiding scheduler) for
that topology.  This script AOT-compiles

  1. the sharded TF/light fit step (diff/fit.render_loss grad) on the
     ("rays", "samples", "volume") mesh, and
  2. a sharded smooth-mode density-field fit step (the large dL/dvolume
     psum over the rays x samples axes),

then inspects the optimized HLO for async collective pairs
(`*-start`/`*-done`) and counts the instructions scheduled between each
start and its done — nonzero in-flight counts ARE the overlap: the
scheduler placed backward compute inside the collective's live range.
Writes benchmarks/overlap_aot_report.json (the artifact cited by
DESIGN.md §3).
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "overlap_aot_report.json")


def _analyze(hlo: str):
    """Per async-collective: ops scheduled between start and done."""
    lines = hlo.splitlines()
    pairs = []
    opens = {}
    for i, l in enumerate(lines):
        m = re.search(r"%(\S*?(all-gather|all-reduce|collective-permute|"
                      r"reduce-scatter)\S*?-start[^ ]*) = ", l)
        if m:
            opens[m.group(2)] = opens.get(m.group(2), []) + [(m.group(1), i)]
        m = re.search(r"-done[^ ]* = \S+ (\S*?(all-gather|all-reduce|"
                      r"collective-permute|reduce-scatter)\S*?-done)", l)
        if "-done" in l and " = " in l:
            kind = next((k for k in ("all-gather", "all-reduce",
                                     "collective-permute", "reduce-scatter")
                         if k in l), None)
            if kind and opens.get(kind):
                name, start_i = opens[kind].pop(0)
                inflight = sum(1 for j in range(start_i + 1, i)
                               if " = " in lines[j]
                               and "-start" not in lines[j]
                               and "-done" not in lines[j]
                               and "get-tuple-element" not in lines[j])
                pairs.append({"kind": kind, "start_line": start_i,
                              "done_line": i, "ops_in_flight": inflight})
    return pairs


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    import dataclasses

    from volumerenderingproject_tpu import (
        Camera,
        RenderConfig,
        default_transfer_function,
        make_volume,
    )
    from volumerenderingproject_tpu.diff.fit import FitParams, render_loss
    from volumerenderingproject_tpu.ops import phong
    from volumerenderingproject_tpu.parallel.render_dist import (
        render_vrc_sharded,
    )
    from volumerenderingproject_tpu.utils.config import Interp

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    mesh = Mesh(np.array(topo.devices).reshape(2, 2, 2),
                ("rays", "samples", "volume"))
    mesh_rs = Mesh(np.array(topo.devices).reshape(4, 2, 1),
                   ("rays", "samples", "volume"))

    vol = make_volume(np.random.default_rng(0).uniform(
        0, 255, (16, 12, 10)).astype(np.float32))
    tf = default_transfer_function()
    cam = Camera.initial(position=(0.35, 0.45, 0.85))
    cfg = RenderConfig(width=16, height=8, samples_per_ray=8)
    target = jnp.zeros((16, 8, 4), jnp.float32)
    report = {"topology": "v5e:2x4 (AOT, no attached hardware)",
              "compiler_options": {
                  "xla_tpu_enable_latency_hiding_scheduler": "true"}}

    # 1. TF/light/density fit step on the 3-axis mesh
    params = FitParams.init(tf, light=phong.default_light())
    f1 = jax.jit(lambda p: jax.grad(render_loss)(
        p, tf, vol, cam, target, cfg, mesh))
    hlo1 = f1.lower(params).compile(compiler_options={
        "xla_tpu_enable_latency_hiding_scheduler": "true"}).as_text()
    report["fit_step_3axis_mesh"] = {
        "async_collectives": _analyze(hlo1),
        "sync_all_reduce_count": hlo1.count(" all-reduce("),
    }

    # 2. density-field fit: large dL/dvolume psum over rays x samples
    cfg_s = dataclasses.replace(cfg, interp=Interp.TRILINEAR)

    def vol_loss(data):
        v2 = dataclasses.replace(vol, data=data)
        img = render_vrc_sharded(v2, tf, cam, cfg_s, mesh_rs,
                                 use_pallas=False)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    f2 = jax.jit(jax.grad(vol_loss))
    hlo2 = f2.lower(vol.data).compile(compiler_options={
        "xla_tpu_enable_latency_hiding_scheduler": "true"}).as_text()
    report["density_fit_step_rays_samples_mesh"] = {
        "async_collectives": _analyze(hlo2),
        "sync_all_reduce_count": hlo2.count(" all-reduce("),
    }

    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    for k in ("fit_step_3axis_mesh", "density_fit_step_rays_samples_mesh"):
        ac = report[k]["async_collectives"]
        overlapped = [p for p in ac if p["ops_in_flight"] > 0]
        print(f"{k}: {len(ac)} async collectives, "
              f"{len(overlapped)} with compute in flight, "
              f"max in-flight ops "
              f"{max((p['ops_in_flight'] for p in ac), default=0)}")
    print("report ->", OUT)


if __name__ == "__main__":
    main()
