"""Production-scale validation of the reference-layout oracle traversal
modes (VERDICT r4 item 8 / carryover since r2): one 512^2 spp8 d3 hardware
datapoint each for traversal='bvh' (SoA skip-links) and the 10-float AoS
node record ('aos10', the reference's exact flat layout,
/root/reference/optimized.cu:512-534).

One full-frame XLA program at this size runs ~50 device-minutes and the
runtime's execution deadline kills the worker (gallery.py note), so the
frame is rendered as host-dispatched ROW BANDS through render_rows — many
sub-deadline executions, same semantics (render_frame is itself
render_rows over all rows; RNG is keyed per (sample, row) so banding is
bitwise-identical to the monolithic frame).

Prints one JSON line per mode:
  {"mode", "size", "band_rows", "bands", "total_s", "mrays"}
Run on TPU.  Budget ~50 min device time per mode.
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import numpy as np

    from raytracinggpu_tpu.bench._timing import ensure_sync_async, setup_cache

    setup_cache()
    ensure_sync_async()

    from dataclasses import replace

    from raytracinggpu_tpu.render.pipeline import (
        Camera, render_rows, rays_per_frame)
    from raytracinggpu_tpu.scene.presets import build_preset

    W = H = 512
    spp, depth = 8, 3
    band = int(sys.argv[2]) if len(sys.argv) > 2 else 16  # rows per dispatch
    modes = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["bvh", "aos10"])

    jitted = jax.jit(render_rows, static_argnums=(1,))

    for mode in modes:
        over = ({"bvh_node_layout": "aos10"} if mode == "aos10" else {})
        cfg, tables = build_preset(
            "array_bvh", width=W, height=H, spp=spp, max_depth=depth,
            traversal="bvh", **over)
        cfg = replace(cfg, spp_fuse=1)
        cam = Camera.default(cfg)
        key = jax.random.PRNGKey(0)
        sample_ids = np.arange(spp)

        # compile once on the first band, then time the full frame
        rows0 = np.arange(band, dtype=np.int32)
        acc, _ = jitted(tables, cfg, cam, key, rows0, sample_ids)
        np.asarray(acc.x[0])  # sync (first D2H warms the tunnel)

        t0 = time.perf_counter()
        img = np.zeros((H, W, 3), np.float32)
        n_bands = 0
        for r0 in range(0, H, band):
            rows = np.arange(r0, min(r0 + band, H), dtype=np.int32)
            acc, _ = jitted(tables, cfg, cam, key, rows, sample_ids)
            col = np.stack([np.asarray(c).reshape(len(rows), W)
                            for c in (acc.x, acc.y, acc.z)], axis=-1)
            img[r0:r0 + len(rows)] = col / spp
            n_bands += 1
        dt = time.perf_counter() - t0
        mrays = rays_per_frame(cfg) / dt / 1e6
        print(json.dumps({
            "mode": mode, "size": f"{W}x{H} spp{spp} d{depth}",
            "band_rows": band, "bands": n_bands,
            "total_s": round(dt, 1), "mrays": round(mrays, 4),
            "img_mean": round(float(img.mean()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
