"""Microbenchmarks for the per-cast cost structure on real TPU hardware.

Times each stage of a mesh cast (tile-list construction, kernel, sphere
pass, sorting primitives) on three representative ray populations:

- primary: coherent camera rays (the cheap case),
- bounce:  cosine-hemisphere rays from mesh-surface origins (the expensive
  deep-bounce case the tile unions blow up on),
- shadow:  rays from mesh/wall surface points toward the preset light.

Measurement protocol (PERF_NOTES.md): every candidate runs inside one jitted
``lax.scan`` of N iterations so the ~29 ms host dispatch overhead washes
out; reported numbers are per-iteration device time.

Usage: python -m raytracinggpu_tpu.bench.micro [--iters 30]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracinggpu_tpu.bench._timing import scan_floor, timed_scan

from raytracinggpu_tpu.bench._timing import setup_cache

setup_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_rays(kind: str, R: int, seed: int = 0):
    """Host-side synthesis of representative ray populations."""
    rng = np.random.default_rng(seed)
    from raytracinggpu_tpu.core.vec import Vec3
    from raytracinggpu_tpu.render.pipeline import Camera, pixel_centers, raygen
    from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH, read_obj
    from raytracinggpu_tpu.scene.presets import _MESH_TRANSFORM, build_preset

    cfg, tables = build_preset("array_bvh", traversal="pallas")

    if kind == "primary":
        n_rows = -(-R // cfg.width)
        rows = np.arange(n_rows, dtype=np.int32) + (cfg.height - n_rows) // 2
        gx = rng.normal(0, 0.2, n_rows * cfg.width).astype(np.float32)
        gy = rng.normal(0, 0.2, n_rows * cfg.width).astype(np.float32)
        O, u = raygen(cfg, Camera.default(cfg), jnp.asarray(gx),
                      jnp.asarray(gy), rows=jnp.asarray(rows))
        O = Vec3(*(np.asarray(c)[:R] for c in O))
        u = Vec3(*(np.asarray(c)[:R] for c in u))
        return cfg, tables, O, u

    # Surface points: random barycentric samples on the (transformed) cat.
    embed, s, off = _MESH_TRANSFORM["array_bvh"]
    obj = read_obj(CAT_OBJ_PATH, embed_transform=embed)
    from raytracinggpu_tpu.scene.mesh import rescale

    if s is not None:
        obj.vertices = rescale(obj.vertices, s, off)
    V, F = obj.vertices, obj.vtx
    fi = rng.integers(0, F.shape[0], R)
    b1 = rng.random(R).astype(np.float32)
    b2 = rng.random(R).astype(np.float32)
    flip = b1 + b2 > 1
    b1[flip], b2[flip] = 1 - b1[flip], 1 - b2[flip]
    A, B, C = V[F[fi, 0]], V[F[fi, 1]], V[F[fi, 2]]
    P = A + b1[:, None] * (B - A) + b2[:, None] * (C - A)
    n = np.cross(B - A, C - A)
    n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-30
    P = (P + 1e-3 * n).astype(np.float32)

    if kind == "shadow":
        L = np.array([-10.0, 20.0, 40.0], np.float32)
        d = L[None, :] - P
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    else:  # bounce: cosine hemisphere around the surface normal
        r1 = rng.random(R)
        r2 = rng.random(R)
        phi = 2 * np.pi * r1
        st = np.sqrt(r2)
        lx, ly, lz = np.cos(phi) * st, np.sin(phi) * st, np.sqrt(1 - r2)
        t1 = np.cross(n, np.where(np.abs(n[:, :1]) < 0.9,
                                  [[1, 0, 0]], [[0, 1, 0]]).astype(np.float32))
        t1 /= np.linalg.norm(t1, axis=1, keepdims=True) + 1e-30
        t2 = np.cross(n, t1)
        d = (lx[:, None] * t1 + ly[:, None] * t2 + lz[:, None] * n).astype(
            np.float32
        )
    Ov = Vec3(P[:, 0].copy(), P[:, 1].copy(), P[:, 2].copy())
    uv = Vec3(d[:, 0].copy(), d[:, 1].copy(), d[:, 2].copy())
    return cfg, tables, Ov, uv


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rays", type=int, default=131072)
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of benchmark name substrings to run")
    args = ap.parse_args()

    import threading

    threading.Thread(
        target=lambda: np.asarray(jnp.zeros((2,))), daemon=True
    ).start()

    from raytracinggpu_tpu.core.vec import Vec3
    from raytracinggpu_tpu.ops import pallas_trace as ptr
    from raytracinggpu_tpu.ops.sphere import intersect_spheres

    R = args.rays
    results = {}
    print(f"scan floor: {scan_floor()*1e6:.1f} us/iter")

    def run(name, fn, fargs):
        if args.only and not any(s in name for s in args.only.split(",")):
            return
        dt = timed_scan(fn, fargs, args.iters)
        results[name] = dt
        print(f"{name:55s} {dt*1e3:8.3f} ms")

    for kind in ("primary", "bounce", "shadow"):
        cfg, tables, O, u = make_rays(kind, R)
        O = jax.device_put(O)
        u = jax.device_put(u)
        tab = tables.pallas_mesh
        n_tiles = tab.fields.shape[1] // ptr.TILE_T

        # Stage: per-(subgroup) tile lists (XLA culling)
        run(f"{kind}/lists(block_active_tiles)",
            lambda O, u, aabb: ptr._block_active_tiles(O, u, aabb, n_tiles),
            (O, u, tab.tile_aabb))

        # Stage: kernel only (lists precomputed once)
        rf = ptr._ray_features16(O, u)
        lists = ptr._block_active_tiles(O, u, tab.tile_aabb, n_tiles)
        lists = jax.device_put(jax.block_until_ready(lists))
        rf = jax.device_put(jax.block_until_ready(rf))
        run(f"{kind}/closest_kernel_only",
            lambda rf, f, l: ptr._closest_hit_call(rf, f, l, 1e-4, False),
            (rf, tab.fields, lists))
        run(f"{kind}/shadow_kernel_only",
            lambda rf, f, l: ptr._shadow_call(rf, f, l, 1e-4, False),
            (rf, tab.fields, lists))

        # Stage: full cast (unsorted / sorted)
        run(f"{kind}/full_cast_nosort",
            lambda O, u: ptr.intersect_tris_pallas(O, u, tab, 1e-4,
                                                   sort_rays=False),
            (O, u))
        run(f"{kind}/full_cast_sorted",
            lambda O, u: ptr.intersect_tris_pallas(O, u, tab, 1e-4,
                                                   sort_rays=True),
            (O, u))
        run(f"{kind}/full_shadow_nosort",
            lambda O, u: ptr.intersect_tris_shadow(O, u, tab, 1e-4,
                                                   sort_rays=False),
            (O, u))

        # Stage: sphere pass
        run(f"{kind}/spheres",
            lambda O, u: intersect_spheres(O, u, tables.spheres), (O, u))

        # Primitive costs (once is enough)
        if kind == "primary":
            key = ptr.ray_sort_key(O, u)
            key = jax.block_until_ready(key)
            run("prim/argsort_key", lambda k: jnp.argsort(k), (key,))
            perm = jnp.argsort(key).astype(jnp.int32)
            perm = jax.device_put(jax.block_until_ready(perm))
            run("prim/gather_rows_16w", lambda rf, p: rf[p], (rf, perm))
            run("prim/gather_rows_1w", lambda k, p: k[p], (key, perm))
            run("prim/scatter_rows_1w",
                lambda k, p: jnp.zeros_like(k).at[p].set(k), (key, perm))
            run("prim/scatter_min_1w",
                lambda k, p: jnp.full_like(k, 1e9).at[p].min(k), (key, perm))
            # slab tests alone, (nt, R) layout
            run("prim/slab_only",
                lambda O, u, aabb: ptr.slab_enter_exit(O, u, aabb, n_tiles),
                (O, u, tab.tile_aabb))

    print()
    for k, v in results.items():
        print(f"{k}\t{v*1e3:.3f}")


if __name__ == "__main__":
    main()
