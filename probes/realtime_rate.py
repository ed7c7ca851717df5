"""Interactive-loop rates under micro-batched dispatch (VERDICT r4 items
3/4): the run_loop period is host-dispatch-bound (~30 ms/dispatch on the
tunneled runtime) so the 512^2 spp2/d2 frame inverted against 800x600 —
frames_per_dispatch=g amortizes the dispatch g-fold.

Sweeps g over each (resolution, spp, depth) mix, including the config-5
full workload (512^2 spp20 d3 — the reference realtime demo's exact
per-frame load, realtime_render.cu:1264-1265), via the REAL run_loop
(pipelined, emit cost excluded, same protocol as the gallery interactive
rows).  Prints one JSON line per case.  Run on TPU.
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    from raytracinggpu_tpu.bench._timing import ensure_sync_async, setup_cache

    setup_cache()
    ensure_sync_async()

    from raytracinggpu_tpu.render.realtime import run_loop
    from raytracinggpu_tpu.scene.presets import build_preset

    cases = [
        ("512x512_spp2_d2", 512, 512, 2, 2, (1, 2, 4, 8)),
        ("800x600_spp2_d2", 800, 600, 2, 2, (1, 2, 4)),
        ("512x512_spp20_d3", 512, 512, 20, 3, (1, 2, 4)),  # config-5
    ]
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    n_frames = 24
    for name, w, h, spp, depth, gs in cases:
        if only and name not in only:
            continue
        cfg, tables = build_preset(
            "realtime", width=w, height=h, spp=spp, max_depth=depth)
        for g in gs:
            _, s = run_loop(tables, cfg, n_frames, print_every=0,
                            frames_per_dispatch=g)
            print(json.dumps({
                "case": name, "g": g, "frames": n_frames,
                "mean_ms": round(s["mean_ms"], 1),
                "fps": round(s["fps"], 2),
            }), flush=True)


if __name__ == "__main__":
    main()
