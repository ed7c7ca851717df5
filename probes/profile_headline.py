"""Capture a jax.profiler device trace of the headline workload (512^2,
pairs, d5) at reduced spp so the trace stays small, then summarize
per-op device time from the perfetto trace.json.gz.

Usage: python probes/profile_headline.py [spp] [out_dir] [k=v ...]
"""
from __future__ import annotations

import ast
import glob
import gzip
import json
import sys
from collections import defaultdict


def main() -> None:
    import jax

    from raytracinggpu_tpu.bench._timing import ensure_sync, setup_cache

    setup_cache()
    ensure_sync()

    import numpy as np

    from raytracinggpu_tpu.render.pipeline import Camera, render_frame
    from raytracinggpu_tpu.scene.presets import build_preset

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rt_prof"
    over = {}
    for a in sys.argv[3:]:
        k, v = a.split("=", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (SyntaxError, ValueError):
            over[k] = v
    cfg, tables = build_preset(
        "array_bvh", width=512, height=512, spp=spp, max_depth=5,
        traversal="pairs", **over)
    cam = Camera.fixed(cfg.camera_c)

    img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(0))
    np.asarray(img[0, 0])  # compile + warm

    jax.profiler.start_trace(out)
    img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(1))
    img.block_until_ready()
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(out + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(json.dumps({"error": "no trace", "dir": out}))
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    # Find device-side lanes (TensorFlow Op / XLA Ops threads) and sum
    # durations by op name prefix.
    by_op = defaultdict(float)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        cat = ev.get("args", {}).get("l", "") if ev.get("args") else ""
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        tid_name = ev.get("tid")
        by_op[(ev.get("pid"), ev.get("tid"))] += 0  # lane census
        key = name.split(".")[0].split("(")[0]
        by_op[key] += dur
        total += dur
    top = sorted(((v, k) for k, v in by_op.items() if isinstance(k, str)),
                 reverse=True)[:40]
    print(json.dumps({"trace": paths[-1],
                      "top_ops_ms": [[k, round(v, 2)] for v, k in top]}))


if __name__ == "__main__":
    main()
