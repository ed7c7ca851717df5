"""Itemized TPU costs of the grouped-compaction primitives.

The r3 compaction (ops/pairs_trace._compact_key/_compact_sort) cut pair
counts 7.5-10x on CPU-counted real wavefronts, yet measured ~2x SLOWER
end-to-end on TPU (gallery/ablations.json pairs_compact rows).  This
harness itemizes where the compacted cast's overhead actually goes —
the sort, the source gathers (flat vs row-form vs minor-axis take), the
scatter-back, the keying slab test — at real cast sizes, so the ledger's
conjectured remedies (row-form feature gathers, sort-free packing) are
decided by measurement instead of the row-rate folklore.

Reference analog: the CUDA per-thread early-out is free
(optimized.cu:220-240 — a thread whose ray misses the root does no
work); this file prices the TPU machinery that tries to buy the same.

Run: python -m raytracinggpu_tpu.bench.compact_micro [--rays 262144]
Prints one JSON line per probe.
"""
from __future__ import annotations

import argparse
import functools
import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp  # noqa: F401 (probes build arrays inline)

    from raytracinggpu_tpu.bench._timing import (
        ensure_sync_async, setup_cache, timed_scan)

    setup_cache()
    from raytracinggpu_tpu.core.vec import Vec3
    from raytracinggpu_tpu.ops import pairs_trace as pt

    ensure_sync_async()

    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--frac", type=float, default=0.25)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default=None)
    a = ap.parse_args()
    R, it = a.rays, a.iters
    C = int(R * a.frac)

    from raytracinggpu_tpu.scene.presets import build_preset

    cfg, tables = build_preset(
        "array_bvh", width=512, height=512, spp=1, max_depth=2,
        pairs_cluster="sah", pairs_pack="pave", pairs_cut=32,
    )
    tab = tables.pairs_mesh
    nc = tab.tile_aabb.shape[0]

    # Real depth-1 bounce wavefront (decorrelated directions) — replayed
    # the same way bench.cast_breakdown builds one.
    from raytracinggpu_tpu.bench import gallery  # noqa: F401  (cache cfg)
    from raytracinggpu_tpu.core.rng import box_muller_jitter, cosine_hemisphere
    from raytracinggpu_tpu.integrator import wavefront as wf
    from raytracinggpu_tpu.core.vec import vwhere
    from raytracinggpu_tpu.render.pipeline import Camera, raygen, row_uniforms

    cam = Camera.fixed(cfg.camera_c)

    @jax.jit
    def depth1(key):
        key_s = jax.random.fold_in(key, 0)
        rows = jnp.arange(cfg.height, dtype=jnp.int32)
        un = row_uniforms(key_s, rows, cfg.width, 2)
        gx, gy = box_muller_jitter(un[0, 0], un[0, 1], np.float32(cfg.sigma))
        O, u = raygen(cfg, cam, gx, gy, rows)
        h = wf.intersect_all(tables, cfg, O, u)
        hit = h.obj >= 0
        oid = jnp.maximum(h.obj, 0)
        mats = tables.materials
        is_mirror = hit & mats.mirror[oid]
        is_refr = hit & (~mats.mirror[oid]) & (
            mats.in_ri[oid] != mats.out_ri[oid])
        is_diff = hit & (~is_mirror) & (~is_refr)
        eps = np.float32(cfg.eps_bounce)
        u_dif = cosine_hemisphere(un[1, 0], un[1, 1], h.N)
        u_mir = u - h.N * (2.0 * u.dot(h.N))
        O1 = vwhere(is_diff | is_mirror, h.P + h.N * eps, O)
        u1 = vwhere(is_diff, u_dif, vwhere(is_mirror, u_mir, u))
        return O1, u1

    O1, u1 = jax.block_until_ready(depth1(jax.random.PRNGKey(0)))
    O1 = Vec3(*(c[:R] for c in O1))
    u1 = Vec3(*(c[:R] for c in u1))
    t_cap = jnp.full((R,), pt.INF, jnp.float32)

    rows = {}

    def probe(name, fn, *xs):
        if a.only and a.only not in name:
            return
        ms = timed_scan(fn, xs, it) * 1e3
        rows[name] = round(ms, 3)
        print(json.dumps({"probe": name, "ms": round(ms, 3),
                          "R": R, "C": C, "nc": nc}), flush=True)

    f = jnp.ones((R,), jnp.float32)
    probe("floor", lambda x: x + 1.0, f)

    # --- keying: the coarse slab test + packed key + count (both branches
    # of the overflow cond pay this when compact is on) ---
    probe("key_build", lambda Ox, Oy, Oz, ux, uy, uz: pt._compact_key(
        Vec3(Ox, Oy, Oz), Vec3(ux, uy, uz), tab.tile_aabb, nc, None, None,
        R)[0], O1.x, O1.y, O1.z, u1.x, u1.y, u1.z)

    skey, n_act, shift = jax.block_until_ready(pt._compact_key(
        O1, u1, tab.tile_aabb, nc, None, None, R))
    print(json.dumps({"n_act": int(n_act), "activity": round(
        float(n_act) / R, 4)}), flush=True)

    # --- the sort ---
    probe("lax_sort_int32", lambda k: jax.lax.sort(k)[:C], skey)
    probe("argsort_int32", lambda k: jnp.argsort(k)[:C], skey)

    src = jax.block_until_ready(pt._compact_sort(skey, C, shift))

    # --- source gathers: flat x7 (the landed form) vs row-form variants ---
    probe("gather_flat_x7", lambda s, Ox, Oy, Oz, ux, uy, uz, cp: tuple(
        jnp.take(v, s, axis=0)
        for v in (Ox, Oy, Oz, ux, uy, uz, cp)),
        src, O1.x, O1.y, O1.z, u1.x, u1.y, u1.z, t_cap)
    probe("gather_flat_x1", lambda s, Ox: jnp.take(Ox, s, axis=0), src, O1.x)

    # row-major (R, 8) source built once, one wide-row gather at C
    row8 = jnp.stack([O1.x, O1.y, O1.z, u1.x, u1.y, u1.z, t_cap, t_cap],
                     axis=1)
    row8 = jax.block_until_ready(row8)
    probe("build_row8_interleave", lambda Ox, Oy, Oz, ux, uy, uz, cp:
          jnp.stack([Ox, Oy, Oz, ux, uy, uz, cp, cp], axis=1),
          O1.x, O1.y, O1.z, u1.x, u1.y, u1.z, t_cap)
    probe("gather_rows8", lambda s, r8: jnp.take(r8, s, axis=0), src, row8)

    # minor-axis take of the (16, R) kernel feature rows
    rfT = jax.block_until_ready(pt._ray_feature_rows(O1, u1))
    probe("take_minor_16xR", lambda s, r: jnp.take(r, s, axis=1), src, rfT)
    probe("transpose_16xR", lambda r: r.T + 0.0, rfT)

    # co-sort the feature rows as lax.sort OPERANDS (one fused
    # sort-and-permute instead of sort + take — if the permutation
    # application inside sort beats the standalone gather, the compact
    # source should ride the sort)
    probe("sort_9operands", lambda k, Ox, Oy, Oz, ux, uy, uz, cp:
          tuple(v[:C] for v in jax.lax.sort(
              [k, Ox, Oy, Oz, ux, uy, uz, cp], num_keys=1)),
          skey, O1.x, O1.y, O1.z, u1.x, u1.y, u1.z, t_cap)

    # --- scatter-back of kernel outputs at C ---
    tC = jnp.ones((C,), jnp.float32)
    probe("scatter_back_x1", lambda s, t: jnp.full(
        (R,), pt.INF, jnp.float32).at[s].set(t), src, tC)
    probe("scatter_back_x5", lambda s, t: tuple(jnp.full(
        (R,), pt.INF, jnp.float32).at[s].set(t + i) for i in range(5)),
        src, tC)

    # --- sort-free packing: cumsum rank + scatter of lane ids ---
    def pack_cumsum(k):
        act = k < (np.int32(nc) << shift)  # active rays sort below marker
        pos = jnp.cumsum(act.astype(jnp.int32)) - 1
        lane = jnp.arange(R, dtype=jnp.int32)
        tgt = jnp.where(act, jnp.minimum(pos, C - 1), C - 1)
        return jnp.zeros((C,), jnp.int32).at[tgt].set(
            jnp.where(act, lane, 0), mode="drop")

    probe("pack_cumsum_scatter", pack_cumsum, skey)

    # --- the landed full compact source (key + sort + mask) ---
    probe("compact_src_full", lambda Ox, Oy, Oz, ux, uy, uz: pt._compact_src(
        Vec3(Ox, Oy, Oz), Vec3(ux, uy, uz), tab.tile_aabb, nc, None, None,
        C, R)[0], O1.x, O1.y, O1.z, u1.x, u1.y, u1.z)

    # --- savings side: full cast vs compacted cast on this wavefront ---
    interp = jax.devices()[0].platform != "tpu"
    probe("cast_full", lambda Ox, Oy, Oz, ux, uy, uz: pt.intersect_tris_pairs(
        Vec3(Ox, Oy, Oz), Vec3(ux, uy, uz), tab, float(cfg.eps_leaf),
        interpret=interp).t, O1.x, O1.y, O1.z, u1.x, u1.y, u1.z)
    probe("cast_compact", lambda Ox, Oy, Oz, ux, uy, uz:
          pt.intersect_tris_pairs(
              Vec3(Ox, Oy, Oz), Vec3(ux, uy, uz), tab, float(cfg.eps_leaf),
              interpret=interp, compact=a.frac).t,
          O1.x, O1.y, O1.z, u1.x, u1.y, u1.z)
    # kernel-only at C vs at R (pure pair-math savings, no machinery)
    OC = Vec3(*(c[:C] for c in O1))
    uC = Vec3(*(c[:C] for c in u1))
    probe("cast_at_C_unpacked", lambda Ox, Oy, Oz, ux, uy, uz:
          pt.intersect_tris_pairs(
              Vec3(Ox, Oy, Oz), Vec3(ux, uy, uz), tab, float(cfg.eps_leaf),
              interpret=interp).t, OC.x, OC.y, OC.z, uC.x, uC.y, uC.z)

    print(json.dumps({"summary": rows}), flush=True)


if __name__ == "__main__":
    main()
