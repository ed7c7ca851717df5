"""Anatomy of the interactive run_loop period (VERDICT r4 item 4: the
512^2 inversion — 37.8 ms interactive vs 13.2 ms batched at spp2/d2 while
the LARGER 800x600 frame runs 30.2 ms).

Per frame the pipelined loop pays: host dispatch of step(n+1), then a
block on step(n)'s display.  This probe times the two components
separately, per resolution, plus the same frames through the batched
steps() scan and a 2-deep pipeline variant.  Prints one JSON line per
case.  Run on TPU.
"""
from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import numpy as np

    from raytracinggpu_tpu.bench._timing import ensure_sync, setup_cache

    setup_cache()

    from raytracinggpu_tpu.render.realtime import init_state, step, steps
    from raytracinggpu_tpu.scene.presets import build_preset

    for name, w, h, spp, depth in [
        ("512x512_spp2_d2", 512, 512, 2, 2),
        ("800x600_spp2_d2", 800, 600, 2, 2),
        ("512x512_spp20_d3", 512, 512, 20, 3),
    ]:
        cfg, tables = build_preset(
            "realtime", width=w, height=h, spp=spp, max_depth=depth)

        # --- batched steps() reference (10 frames / dispatch)
        state = init_state(cfg, tables, seed=0)
        state, frames = steps(tables, cfg, 10, state)
        np.asarray(frames[0, 0, 0])
        ensure_sync()
        t0 = time.perf_counter()
        state, frames = steps(tables, cfg, 10, state)
        frames.block_until_ready()
        batched_ms = (time.perf_counter() - t0) / 10 * 1e3

        # --- per-frame step() anatomy (1-deep pipeline, run_loop's form)
        state = init_state(cfg, tables, seed=0)
        state, disp = step(tables, cfg, state)
        disp.block_until_ready()
        n = 20
        disp_ms, block_ms, period_ms = [], [], []
        pending = None
        t_start = time.perf_counter()
        for i in range(n):
            t0 = time.perf_counter()
            state, disp = step(tables, cfg, state)
            t1 = time.perf_counter()
            disp_ms.append((t1 - t0) * 1e3)
            if pending is not None:
                pending.block_until_ready()
                block_ms.append((time.perf_counter() - t1) * 1e3)
            pending = disp
        pending.block_until_ready()
        period_1deep = (time.perf_counter() - t_start) / n * 1e3

        # --- 2-deep pipeline: dispatch i and i+1 before blocking on i-1
        state = init_state(cfg, tables, seed=0)
        state, disp = step(tables, cfg, state)
        disp.block_until_ready()
        q = []
        t_start = time.perf_counter()
        for i in range(n):
            state, disp = step(tables, cfg, state)
            q.append(disp)
            if len(q) > 2:
                q.pop(0).block_until_ready()
        for d in q:
            d.block_until_ready()
        period_2deep = (time.perf_counter() - t_start) / n * 1e3

        print(json.dumps({
            "case": name,
            "batched_ms": round(batched_ms, 2),
            "dispatch_ms_mean": round(float(np.mean(disp_ms)), 2),
            "dispatch_ms_p50": round(float(np.median(disp_ms)), 2),
            "dispatch_ms_max": round(float(np.max(disp_ms)), 2),
            "block_ms_mean": round(float(np.mean(block_ms)), 2),
            "period_1deep_ms": round(period_1deep, 2),
            "period_2deep_ms": round(period_2deep, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
