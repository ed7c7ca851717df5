"""Per-cast cost split on the 200k-tri soup (VERDICT r4 item 5): reuses
bench.cast_breakdown (full cast vs kernel-only vs culling bits vs compact
glue on a REAL depth-1 wavefront) at given config overrides.

Usage: python probes/big_mesh_breakdown.py [KEY=VALUE ...]
Prints one JSON line.  Run on TPU from the repo root.
"""
from __future__ import annotations

import ast
import json
import os
import sys
import tempfile


def main() -> None:
    from raytracinggpu_tpu.bench._timing import ensure_sync_async, setup_cache

    setup_cache()
    ensure_sync_async()

    from raytracinggpu_tpu.bench.big_mesh import soup_obj
    from raytracinggpu_tpu import Renderer

    over = {}
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (SyntaxError, ValueError):
            over[k] = v
    n_tris = int(over.pop("n_tris", 200_000))
    path = os.path.join(tempfile.gettempdir(), f"soup_{n_tris}.obj")
    if not os.path.exists(path):
        soup_obj(path, n_tris)

    r = Renderer("array_bvh", obj_path=path, bvh_builder="lbvh",
                 width=512, height=512, spp=4, max_depth=2,
                 traversal="pairs", **over)

    import bench

    out = {"n_tris": n_tris, "over": over}
    out.update(bench.cast_breakdown(r.cfg, r.scene))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
