"""Big-mesh (200k-tri soup) per-cast anatomy + knob A/B (VERDICT r4 item 5).

The soup runs 4.7 Mray/s vs the cat's 228 — 48x.  Hypothesis: with
nc ~ 2053 tiles every cast pays (nc, R)-scale slab tests (culling bits +
compaction key), ~66x the cat's nc=31, and the SMEM bitmask budget shrinks
casts to ~127k rays so per-cast floors amortize worse.  This probe prints
the static geometry of the default build (tiles, W words, chunk cap,
ladder tiers, key mode), then A/Bs the levers that attack the slab term:
pairs_key_coarse (g-way union boxes shrink the KEY slab g-fold),
pairs_tile 256/512 (fewer, fatter tiles shrink BOTH slabs + supertile
count), subgroup, and compaction off.  One JSON line per case.  Run on TPU.
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

    from raytracinggpu_tpu.bench.big_mesh import soup_obj
    from raytracinggpu_tpu.render.pipeline import rays_per_frame
    from raytracinggpu_tpu import Renderer
    import os
    import tempfile

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    path = os.path.join(tempfile.gettempdir(), f"soup_{n_tris}.obj")
    if not os.path.exists(path):
        soup_obj(path, n_tris)

    CASES = [
        ("default", {}),
        ("kc8", {"pairs_key_coarse": 8}),
        ("kc32", {"pairs_key_coarse": 32}),
        ("tile256", {"pairs_tile": 256}),
        ("tile512", {"pairs_tile": 512}),
        ("tile512_kc8", {"pairs_tile": 512, "pairs_key_coarse": 8}),
        ("tile256_kc16", {"pairs_tile": 256, "pairs_key_coarse": 16}),
        ("nocompact", {"pairs_compact": 0.0, "pairs_compact2": 0.0,
                       "pairs_compact3": 0.0}),
        ("s16", {"pairs_subgroup": 16}),
        ("tile512_s16", {"pairs_tile": 512, "pairs_subgroup": 16}),
        # r5 second wave: s16 won +32%; does it compose?
        ("s8", {"pairs_subgroup": 8}),
        ("s32", {"pairs_subgroup": 32}),
        ("s16_kc32", {"pairs_subgroup": 16, "pairs_key_coarse": 32}),
        ("s16_nocompact", {"pairs_subgroup": 16, "pairs_compact": 0.0,
                           "pairs_compact2": 0.0, "pairs_compact3": 0.0}),
        ("s16_blk1024", {"pairs_subgroup": 16, "pairs_block": 1024}),
        ("s16_blk8192", {"pairs_subgroup": 16, "pairs_block": 8192}),
        # r5 third wave: the breakdown shows the full-width d0 casts pay
        # the O(nm x R) bits + kernel on every chunk; d1 casts already
        # compact (14.3% active).  Engage the d0-own tier / full ladder.
        ("s16_kc32_d0c50", {"pairs_subgroup": 16, "pairs_key_coarse": 32,
                            "pairs_compact_d0": 0.5}),
        ("s16_kc32_d0c25", {"pairs_subgroup": 16, "pairs_key_coarse": 32,
                            "pairs_compact_d0": 0.25}),
        ("s16_kc32_mind0", {"pairs_subgroup": 16, "pairs_key_coarse": 32,
                            "pairs_compact_min_depth": 0}),
    ]
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, over in CASES:
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            r = Renderer("array_bvh", obj_path=path, bvh_builder="lbvh",
                         width=512, height=512, spp=4, max_depth=2,
                         traversal="pairs", **over)
            build_s = time.time() - t0
            tab = r.scene.pairs_mesh
            from raytracinggpu_tpu.ops.pairs_trace import (
                _compact_tiers, _key_mode, smem_ray_cap)

            nc = int(tab.tile_aabb.shape[0])
            cfg = r.cfg
            cap = min(cfg.pairs_chunk,
                      smem_ray_cap(nc, cfg.pairs_subgroup, cfg.pairs_block))
            kc = cfg.pairs_key_coarse
            knc = nc if kc <= 1 else -(-nc // kc)
            tiers = _compact_tiers(
                (cfg.pairs_compact, cfg.pairs_compact2, cfg.pairs_compact3),
                knc, cap, cfg.pairs_block)
            r.render_hdr(seed=0)  # compile + tunnel warm
            times = []
            for i in range(1, 4):
                t1 = time.perf_counter()
                r.render_hdr(seed=i)
                times.append(time.perf_counter() - t1)
            dt = min(times)
            print(json.dumps({
                "case": name, "nc": nc, "W": -(-nc // 32),
                "cols": int(tab.fields.shape[1]),
                "chunk_cap": cap, "tiers": tiers,
                "key_mode": _key_mode(knc, cap)[0],
                "ms": round(dt * 1e3, 1),
                "mrays": round(rays_per_frame(cfg) / dt / 1e6, 2),
                "build_s": round(build_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps(
                {"case": name, "error": f"{type(e).__name__}: {e}"[:200]}),
                flush=True)


if __name__ == "__main__":
    main()
