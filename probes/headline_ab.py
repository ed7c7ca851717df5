"""A/B the headline protocol (512^2 spp32 d5, cat, pairs) under config
overrides given as KEY=VALUE argv pairs.  Prints one JSON line per run.

Usage: python probes/headline_ab.py spp_unroll=2 chunk_unroll=2
Every override must name a RenderConfig field; values are eval'd as Python
literals.  Timing protocol matches bench.py (min of 3 steady-state frames
after a warmup + one synchronous D2H).
"""
from __future__ import annotations

import ast
import json
import sys
import time


def main() -> None:
    import jax

    from raytracinggpu_tpu.bench._timing import ensure_sync_async, setup_cache

    setup_cache()
    ensure_sync_async()

    import numpy as np

    from raytracinggpu_tpu.render.pipeline import (
        Camera,
        render_frame,
        rays_per_frame,
    )
    from raytracinggpu_tpu.scene.presets import build_preset

    over = {}
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (SyntaxError, ValueError):
            over[k] = v
    base = dict(width=512, height=512, spp=32, max_depth=5,
                traversal="pairs")
    base.update(over)
    cfg, tables = build_preset("array_bvh", **base)
    cam = Camera.fixed(cfg.camera_c)

    t0 = time.perf_counter()
    img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(0))
    np.asarray(img[0, 0])
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(3):
        t1 = time.perf_counter()
        img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(i))
        img.block_until_ready()
        times.append(time.perf_counter() - t1)
    dt = min(times)
    print(json.dumps({
        "over": over,
        "mrays": round(rays_per_frame(cfg) / dt / 1e6, 2),
        "ms": round(dt * 1e3, 1),
        "all_ms": [round(t * 1e3, 1) for t in times],
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
