"""Regenerate the measured-results gallery on real TPU hardware.

Produces (under gallery/):
- tpu_results.json — steady-state frame times + Mray/s for every reference
  launcher config (benchmark.py protocol: best of repeats after warmup),
  the config-5 realtime rows (spp20/depth3 at 512x512 and 800x600, batched
  ``steps`` so the ~29 ms/dispatch host overhead is amortized), and the
  progressive-accumulation rows (spp/frame reduced, converging display —
  the honest path to interactive rates the reference's own hardware used),
- ablations.json — named benchmark modes over the TPU-relevant axes
  (SURVEY.md §2.11 mapping): traversal kernel, pairs subgroup, pairs block,
  ray sorting, MXU precision, spp fusing, BVH builder.

Usage: python -m raytracinggpu_tpu.bench.gallery [--out gallery/] [--quick]
"""
from __future__ import annotations

import argparse
import json
import time
from dataclasses import replace

import jax
import numpy as np

from raytracinggpu_tpu.bench._timing import setup_cache

setup_cache()


def _steady(fn, repeats=3):
    """fn(i) must RETURN the frame array; the warm call is synced with an
    explicit tiny device->host read (block_until_ready silently no-ops
    before the process's first D2H on this runtime — timing without the
    sync measures nothing; see bench/_timing.ensure_sync)."""
    np.asarray(fn(0)[0, 0])  # warm/compile + synchronous tunnel warmup
    times = []
    for i in range(1, repeats + 1):
        t0 = time.perf_counter()
        fn(i).block_until_ready()
        times.append(time.perf_counter() - t0)
    return min(times)


def frame_rows(quick=False):
    from raytracinggpu_tpu.render.pipeline import (
        Camera, render_frame, rays_per_frame)
    from raytracinggpu_tpu.scene.presets import build_preset

    rows = {}
    for preset in ("cpu", "global", "optimized", "array_bvh", "showcase"):
        cfg, tables = build_preset(preset)
        if quick:
            cfg = replace(cfg, spp=4)
        cam = Camera.default(cfg)

        def run(i):
            img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(i))
            return img

        dt = _steady(run)
        rows[preset] = {
            "spp": cfg.spp, "depth": cfg.max_depth,
            "steady_s": round(dt, 3),
            "mrays_formula": round(rays_per_frame(cfg) / dt / 1e6, 1),
        }
        print(preset, rows[preset], flush=True)

    # The north-star resolution at the flagship config (balanced-chunking
    # row: 480k rays split into equal pairs_block-granular chunks).
    cfg, tables = build_preset("array_bvh", width=800, height=600)
    if quick:
        cfg = replace(cfg, spp=4)
    cam = Camera.default(cfg)

    def run800(i):
        img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(i))
        return img

    dt = _steady(run800)
    rows["array_bvh_800x600"] = {
        "spp": cfg.spp, "depth": cfg.max_depth,
        "steady_s": round(dt, 3),
        "mrays_formula": round(rays_per_frame(cfg) / dt / 1e6, 1),
    }
    print("array_bvh_800x600", rows["array_bvh_800x600"], flush=True)
    return rows


def realtime_rows(quick=False):
    """Config-5 work (spp=20, depth=3, realtime_render.cu:1264-1265) via the
    batched steps() API, plus progressive-accumulation modes."""
    from raytracinggpu_tpu.render.realtime import init_state, steps
    from raytracinggpu_tpu.scene.presets import build_preset

    rows = {}
    n = 4 if quick else 10
    cases = [
        ("realtime_512x512", 512, 512, 20, 3),
        ("realtime_800x600", 800, 600, 20, 3),
        ("progressive_512x512_spp4", 512, 512, 4, 3),
        ("progressive_800x600_spp2", 800, 600, 2, 3),
        ("progressive_800x600_spp1_d2", 800, 600, 1, 2),
        ("progressive_800x600_spp2_d2", 800, 600, 2, 2),
        ("progressive_800x600_spp1_d3", 800, 600, 1, 3),
        ("progressive_800x600_spp1_d1", 800, 600, 1, 1),
        ("realtime_batched_512_spp2_d2", 512, 512, 2, 2),
    ]
    for name, w, h, spp, depth in cases:
        cfg, tables = build_preset(
            "realtime", width=w, height=h, spp=spp, max_depth=depth)
        state = init_state(cfg, tables, seed=0)
        state, frames = steps(tables, cfg, n, state)
        np.asarray(frames[0, 0, 0])  # compile + warm + synchronous D2H
        t0 = time.perf_counter()
        state, frames = steps(tables, cfg, n, state)
        frames.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        rows[name] = {
            "spp": spp, "depth": depth,
            "ms_per_frame": round(dt * 1e3, 1),
            "fps": round(1.0 / dt, 2),
            "note": "batched steps(), progressive accumulation"
            if spp < 20 else "batched steps(), full config-5 work per frame",
        }
        print(name, rows[name], flush=True)
    return rows


# Named benchmark modes (the different-versions/*.cu analog).  The
# "bvh_skiplinks" oracle is ~400x slower than the pairs kernel on TPU
# (gather-bound lockstep walk, see ops/bvh_traverse.py): at the full
# 512^2/spp32/d5 protocol ONE XLA program would run for tens of minutes and
# the runtime's execution deadline kills the TPU worker ("kernel fault").
# It is therefore measured at a reduced size, flagged in its row.
ABLATION_MODES = {
    # production default (r3): grouped activity compaction two-tier
    # ladder (5/64 -> 17/128), subgroup 64, fully-unrolled depth scan
    # with the d0-skip compaction policy (mind=1), 512k-ray chunks,
    # morton tiles, subgroup-major walk, vpi=2
    "pairs_default(ladder_f078_f133_s64_u8_mind1_c512k)": {},
    # depth-scan axis (r3): the rolled scan's back-edge is a sequential
    # barrier — shadow(d) and closest(d+1) are data-independent but
    # cannot pipeline across it; unrolling is worth ~+8.5% headline
    "depth_scan_rolled": {"depth_unroll": 1},
    # per-depth policy axis (r3): d0 casts overflow both ladder tiers
    # (~14-15% active) so they statically skip the compact machinery;
    # mind0 compacts every depth (the rolled-scan behavior), mind2 also
    # skips d1 (collapses — d1 compaction is a ~2.6x cast win)
    "pairs_compact_all_depths": {"pairs_compact_min_depth": 0},
    "pairs_compact_mind2": {"pairs_compact_min_depth": 2},
    # compaction axis: off = the r2 form (every subgroup pays the union
    # divergence, ~14x at d>=2); single-tier rows (compact2=0) sweep the
    # capacity/fallback trade; the ladder rows sweep the second tier —
    # TIER WIDTH decides the sign (17/128 rides ~2% above the d1 cast's
    # activity and wins +13%; 1/4 pays 2.7x tier-1 sort/take and loses)
    "pairs_nocompact_s16": {"pairs_compact": 0.0, "pairs_compact2": 0.0,
                            "pairs_subgroup": 16},
    "pairs_nocompact_s64": {"pairs_compact": 0.0, "pairs_compact2": 0.0},
    "pairs_single_f0625": {"pairs_compact": 0.0625, "pairs_compact2": 0.0},
    "pairs_single_f09375": {"pairs_compact": 0.09375, "pairs_compact2": 0.0},
    "pairs_single_f125": {"pairs_compact": 0.125, "pairs_compact2": 0.0},
    "pairs_single_f15625": {"pairs_compact": 0.15625, "pairs_compact2": 0.0},
    "pairs_ladder_wide_f125_f25": {"pairs_compact": 0.125,
                                   "pairs_compact2": 0.25},
    # post-grouping subgroup sweep: compaction groups rays by active-tile
    # span, so doubling the union scope no longer doubles the union — the
    # CPU pair counts invert (s16 28460 / s32 15324 / s64 8578 / s128
    # 5055, PERF_NOTES.md) and the TPU optimum keeps moving up as the
    # grouping improves (s32 at the single-tier point, s64 under the
    # ladder + unrolled scan); s128 reverses (vreg pressure of the
    # hoisted (subg, 128) broadcasts)
    "pairs_compact_s16": {"pairs_subgroup": 16},
    "pairs_compact_s32": {"pairs_subgroup": 32},
    "pairs_compact_s128": {"pairs_subgroup": 128},
    # clustering axis (r3): cluster tree (reference midpoint vs binned
    # SAH), tile packing (morton first-fit vs full-occupancy pave), and
    # member-box granularity — bit-identical perf levers (test_clustering).
    # Measured within noise of morton tables once compaction is on.
    "pairs_sah_pave_compact": {"pairs_cluster": "sah", "pairs_pack": "pave",
                               "pairs_cut": 32},
    "pairs_sah_pave_nocompact_s16": {
        "pairs_cluster": "sah", "pairs_pack": "pave", "pairs_cut": 32,
        "pairs_compact": 0.0, "pairs_subgroup": 16},
    "pairs_blk1024": {"pairs_block": 1024},
    "pairs_blk8192": {"pairs_block": 8192},
    # cast-size axis: compaction's linear overheads (key/sort/take/scatter)
    # don't amortize with cast size, but per-cast op floors and kernel
    # ramp do; bigger casts also raise the transient HBM of the coarse
    # key slabs ((nc, R)) — ADVICE r2 flagged the near-ceiling case
    "pairs_chunk262k": {"pairs_chunk": 262144},
    "pairs_chunk1M": {"pairs_chunk": 1048576},
    "pairs_chunk64k": {"pairs_chunk": 65536},
    "pallas_tiled_s64": {"traversal": "pallas"},
    "pallas_s32": {"traversal": "pallas", "pallas_subgroup": 32},
    "pallas_raysort": {"traversal": "pallas", "ray_sort": True},
    "dense_mxu_highest": {"traversal": "dense"},
    "dense_mxu_bf16x3": {"traversal": "dense", "mxu_precision": "default"},
    "bvh_skiplinks": {"traversal": "bvh", "_size": (128, 128, 2, 2),
                      "_note": "oracle mode at 128^2/spp2/d2 — one full-"
                               "protocol program exceeds the TPU execution "
                               "deadline"},
    "bvh_aos10": {"traversal": "bvh", "bvh_node_layout": "aos10",
                  "_size": (128, 128, 2, 2),
                  "_note": "node-layout ablation: reference 10-float AoS "
                           "record, one row-gather per step (vs SoA "
                           "columns); same reduced size as bvh_skiplinks"},
    "spp_fuse1": {"spp_fuse": 1},
    "spp_fuse8": {"spp_fuse": 8},
    # walk-order axis (r3): word-major is the r2 form (one feature hoist
    # per (subgroup, word)); subgroup-major (default) hoists once per
    # subgroup and scans a W-fold shorter summary
    "pairs_wordmajor": {"pairs_sgw": 0},
    # tile-width axis (r3): fatter tiles cut scalar-walk visits but pay
    # more VPU math and vreg pressure under the hoisted broadcasts
    "pairs_tile256": {"pairs_tile": 256},
    "pairs_tile512": {"pairs_tile": 512,
                      "_note": "block auto-capped by the VMEM budget "
                               "(_blk_cap: 5 payload scratches at "
                               "tile_t=512 -> blk 1024)"},
}


_preset_cache: dict = {}

# Config keys that change the BUILT SCENE TABLES (presets.build_preset
# forwards them into build_scene_tables) — an ablation override touching
# one of these must rebuild the preset, not just replace() the config.
_TABLE_KEYS = ("tri_block", "pairs_tile", "pairs_cluster", "pairs_cut",
               "pairs_pack")


def _cached_preset(w, h, spp, depth, **table_over):
    """Scene tables per size — the in-process ablation_rows() loop reuses
    one build (OBJ parse + BVH + cluster packing + upload) across the ~13
    modes that share the default protocol size AND default tables."""
    from raytracinggpu_tpu.scene.presets import build_preset

    key = (w, h, spp, depth, tuple(sorted(table_over.items())))
    if key not in _preset_cache:
        _preset_cache[key] = build_preset(
            "array_bvh", width=w, height=h, spp=spp, max_depth=depth,
            **table_over)
    return _preset_cache[key]


def one_ablation_row(name: str, quick=False) -> dict:
    """Measure a single named mode in THIS process."""
    from raytracinggpu_tpu.render.pipeline import (
        Camera, render_frame, rays_per_frame)

    over = dict(ABLATION_MODES[name])
    note = over.pop("_note", None)
    w, h, spp, depth = over.pop("_size", (512, 512, 8 if quick else 32, 5))
    table_over = {k: over[k] for k in _TABLE_KEYS if k in over}
    cfg0, tables = _cached_preset(w, h, spp, depth, **table_over)
    cam = Camera.default(cfg0)
    cfg = replace(cfg0, **over)

    def run(i):
        img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(i))
        return img

    dt = _steady(run, repeats=2)
    mrays = rays_per_frame(cfg) / dt / 1e6
    row = {
        "steady_s": round(dt, 3),
        # sub-1 rates (the reduced-size oracle modes) keep 4 decimals so
        # they don't round to a meaningless 0.0
        "mrays": round(mrays, 1 if mrays >= 1 else 4),
    }
    if note:
        row["note"] = note
    return row


def interactive_rows(quick=False):
    """True host-loop interactive rates (pipelined run_loop: frame n+1 is
    dispatched before frame n is read back, hiding the per-dispatch host
    cost the way the reference's free-running GLUT pump does)."""
    from raytracinggpu_tpu.render.realtime import run_loop
    from raytracinggpu_tpu.scene.presets import build_preset

    rows = {}
    n = 6 if quick else 20
    for name, w, h, spp, depth in [
        ("realtime_interactive_512", 512, 512, 2, 2),
        ("realtime_interactive_800x600", 800, 600, 2, 2),
        ("realtime_interactive_800x600_spp1_d2", 800, 600, 1, 2),
    ]:
        cfg, tables = build_preset(
            "realtime", width=w, height=h, spp=spp, max_depth=depth)
        _, summary = run_loop(tables, cfg, n, print_every=0)
        rows[name] = {
            "spp": spp, "depth": depth,
            "ms_per_frame": round(summary["mean_ms"], 1),
            "fps": round(summary["fps"], 2),
            "note": "pipelined run_loop (1-frame latency), per-frame PNG "
                    "write excluded",
        }
        print(name, rows[name], flush=True)
    return rows


def ablation_rows(quick=False):
    rows = {}
    for name in ABLATION_MODES:
        try:
            rows[name] = one_ablation_row(name, quick)
        except Exception as e:  # pragma: no cover - hardware-dependent
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(name, rows[name], flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="gallery")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list: frames,realtime,ablations")
    ap.add_argument("--ablation-row", default=None,
                    help="internal: measure ONE named mode, print one JSON "
                         "line (used by the per-row subprocess isolation)")
    ap.add_argument("--ablation-rows", default=None,
                    help="internal: comma list of modes measured in ONE "
                         "process (amortizes the 130-420 s tunnel warmup), "
                         "one 'name<TAB>json' line each")
    a = ap.parse_args()

    if a.ablation_row:
        # Overlap the tunnel warmup (first D2H, 130-420 s) with the mode's
        # compile — without this a fresh per-row process serializes them.
        from raytracinggpu_tpu.bench._timing import ensure_sync_async

        ensure_sync_async()
        try:
            row = one_ablation_row(a.ablation_row, a.quick)
        except Exception as e:  # pragma: no cover - hardware-dependent
            row = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(json.dumps(row))
        return

    if a.ablation_rows:
        from raytracinggpu_tpu.bench._timing import ensure_sync_async

        ensure_sync_async()
        for name in a.ablation_rows.split(","):
            try:
                row = one_ablation_row(name, a.quick)
            except Exception as e:  # pragma: no cover - hardware-dependent
                row = {"error": f"{type(e).__name__}: {e}"[:160]}
            print(f"{name}\t{json.dumps(row)}", flush=True)
        return

    from raytracinggpu_tpu.bench._timing import ensure_sync_async

    ensure_sync_async()

    only = (a.only.split(",") if a.only
            else ["frames", "realtime", "interactive", "ablations"])
    if "frames" in only or "realtime" in only or "interactive" in only:
        results = {}
        if "frames" in only:
            results.update(frame_rows(a.quick))
        if "realtime" in only:
            results.update(realtime_rows(a.quick))
        if "interactive" in only:
            results.update(interactive_rows(a.quick))
        path = f"{a.out}/tpu_results.json"
        try:
            old = json.load(open(path))
        except Exception:
            old = {}
        old.update(results)
        json.dump(old, open(path, "w"), indent=1)
        print("wrote", path)
    if "ablations" in only:
        rows = ablation_rows(a.quick)
        json.dump(rows, open(f"{a.out}/ablations.json", "w"), indent=1)
        print("wrote ablations.json")


if __name__ == "__main__":
    main()
