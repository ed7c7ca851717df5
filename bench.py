"""Headline benchmark: Mray/s on the cat-mesh flat-BVH single-frame config
(the north-star metric, BASELINE.json: >= 200 Mray/s per v5e chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting uses the reference formula (BASELINE.md): every depth level
adds one bounce ray and one shadow ray per sample, so
rays = W*H*spp*(2*depth+1) — the same convention a CUDA wall-clock benchmark
of the reference would imply.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

NORTH_STAR_MRAYS = 200.0


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Warm the device-to-host tunnel concurrently with compilation (the
    # first D2H on this runtime takes minutes; see SKILL notes).
    from raytracinggpu_tpu.bench._timing import ensure_sync_async

    ensure_sync_async()

    from raytracinggpu_tpu.render.pipeline import Camera, render_frame, rays_per_frame
    from raytracinggpu_tpu.scene.presets import build_preset

    cfg, tables = build_preset(
        "array_bvh", width=512, height=512, spp=32, max_depth=5,
        traversal="pairs",
    )
    cam = Camera.fixed(cfg.camera_c)
    key = jax.random.PRNGKey(0)

    # Warmup / compile — then force one SYNCHRONOUS device->host transfer:
    # on this runtime block_until_ready silently no-ops until the process's
    # first D2H completes, so timing without this can measure nothing.
    img, stats = render_frame(tables, cfg, cam, key)
    np.asarray(img[0, 0])

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        img, stats = render_frame(tables, cfg, cam, jax.random.PRNGKey(i))
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mrays = rays_per_frame(cfg) / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "mrays_per_sec_cat_bvh_512_spp32_d5",
                "value": round(mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "mrays_per_sec_cat_bvh_512_spp32_d5",
            "value": 0.0,
            "unit": "Mray/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(0)
