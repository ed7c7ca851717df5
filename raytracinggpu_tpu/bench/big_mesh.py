"""Large custom-mesh throughput evidence (VERDICT r2 item 4).

The round-2 pairs kernel kept its whole field table VMEM-resident and fell
back to the tiled pallas kernel past 512 cluster tiles (~65k triangles),
silently losing ~45% of throughput on big ``--obj`` meshes.  Round 3
streams the field table in ST_SLOTS-wide supertile blocks over a minor
grid axis (ops/pairs_trace.py), so meshes up to MAX_SLOTS (~2M triangle
slots) stay on the production kernel.

This benchmark renders a deterministic ~200k-triangle random soup through
the PUBLIC API (Renderer + obj_path, the same path a user's ``--obj``
takes) in pairs mode and in the pallas fallback, and records both to
gallery/big_mesh.json.  Parity target: different-versions/array_bvh.cu
handles any mesh its VRAM fits; here the streamed pairs kernel must be
at least as fast as the old fallback.

Usage: python -m raytracinggpu_tpu.bench.big_mesh [--tris 200000]
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

from raytracinggpu_tpu.bench._timing import setup_cache

setup_cache()


def soup_obj(path: str, n_tris: int, seed: int = 7) -> None:
    """Write a deterministic triangle-soup OBJ inside the region the
    array_bvh preset's camera views (the cat mesh's world-space bbox,
    inflated 1.5x), so the cast actually pays full pair-math cost."""
    from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH, read_obj
    from raytracinggpu_tpu.scene.presets import _MESH_TRANSFORM
    from raytracinggpu_tpu.scene.mesh import rescale

    embed, s, off = _MESH_TRANSFORM["array_bvh"]
    obj = read_obj(CAT_OBJ_PATH, embed_transform=embed)
    if s is not None:
        obj.vertices = rescale(obj.vertices, s, off)
    lo = obj.vertices.min(axis=0)
    hi = obj.vertices.max(axis=0)
    c, half = (lo + hi) / 2, (hi - lo) / 2 * 1.5

    rng = np.random.default_rng(seed)
    A = (c + rng.uniform(-1, 1, (n_tris, 3)) * half).astype(np.float32)
    edge = float(half.min()) * 0.02
    B = A + rng.standard_normal((n_tris, 3)).astype(np.float32) * edge
    C = A + rng.standard_normal((n_tris, 3)).astype(np.float32) * edge
    with open(path, "w") as f:
        for tri in range(n_tris):
            for P in (A[tri], B[tri], C[tri]):
                f.write(f"v {P[0]:.6f} {P[1]:.6f} {P[2]:.6f}\n")
            k = 3 * tri
            f.write(f"f {k + 1} {k + 2} {k + 3}\n")


def run(n_tris: int = 200_000, out: str = "gallery/big_mesh.json",
        width: int = 512, height: int = 512, spp: int = 4,
        max_depth: int = 2) -> dict:
    import jax

    from raytracinggpu_tpu import Renderer
    from raytracinggpu_tpu.render.pipeline import rays_per_frame

    path = os.path.join(tempfile.gettempdir(), f"soup_{n_tris}.obj")
    if not os.path.exists(path):
        print(f"writing {n_tris}-tri soup -> {path}", flush=True)
        soup_obj(path, n_tris)

    rows = {
        "_": (f"{n_tris}-triangle random soup via the public Renderer "
              f"obj_path API, {width}x{height} spp={spp} depth={max_depth}, "
              "one v5e chip; pairs = streamed-supertile production kernel, "
              "pallas = the old >512-tile fallback (lbvh builder for both)"),
    }
    for traversal in ("pairs", "pallas"):
        t0 = time.time()
        r = Renderer(
            "array_bvh", obj_path=path, bvh_builder="lbvh",
            width=width, height=height, spp=spp, max_depth=max_depth,
            traversal=traversal,
        )
        build_s = time.time() - t0
        if traversal == "pairs":
            tab = r.scene.pairs_mesh
            assert tab is not None, "soup unexpectedly fell back off pairs"
            rows["pairs_tiles"] = int(tab.tile_aabb.shape[0])
            rows["pairs_field_cols"] = int(tab.fields.shape[1])

        try:
            r.render_hdr(seed=0)  # compile + synchronous tunnel warmup
            times = []
            for i in range(1, 4):
                t0 = time.perf_counter()
                r.render_hdr(seed=i)  # returns host numpy: synchronous
                times.append(time.perf_counter() - t0)
        except Exception as e:  # record DNF honestly (e.g. a compile OOM)
            rows[traversal] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(traversal, "FAILED:", rows[traversal], flush=True)
            continue
        dt = min(times)
        rows[traversal] = {
            "steady_s": round(dt, 3),
            "mrays_formula": round(rays_per_frame(r.cfg) / dt / 1e6, 1),
            "host_build_s": round(build_s, 1),
        }
        print(traversal, rows[traversal], flush=True)

    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
        print("wrote", out)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=200_000)
    ap.add_argument("--out", default="gallery/big_mesh.json")
    a = ap.parse_args()
    run(a.tris, a.out)
