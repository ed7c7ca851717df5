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

    from raytracinggpu_tpu.bench._timing import ensure_sync_async, setup_cache

    setup_cache()  # write-probed; degrades to cache-off, never aborts
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Warm the device-to-host tunnel concurrently with compilation (the
    # first D2H on this runtime takes minutes; see SKILL notes).

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

    breakdown = {}
    try:
        breakdown = cast_breakdown(cfg, tables)
    except Exception as e:  # breakdown is evidence, never a bench blocker
        breakdown = {"error": f"{type(e).__name__}: {e}"[:160]}

    print(
        json.dumps(
            {
                "metric": "mrays_per_sec_cat_bvh_512_spp32_d5",
                "value": round(mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
                "breakdown": breakdown,
            }
        )
    )


def cast_breakdown(cfg, tables) -> dict:
    """Per-cast cost split on a REAL depth-1 wavefront (512^2, one sample):
    full cast vs kernel-only vs culling bits, for closest and shadow —
    regression visibility for where the frame time goes (VERDICT r2 item
    7).  All numbers are timed_scan(iters=30) values; 'floor_ms' is the
    same harness on a trivial body (the ~29 ms dispatch amortization +
    scan overhead) — subtract it to compare kernels."""
    import jax
    import jax.numpy as jnp

    from raytracinggpu_tpu.bench._timing import timed_scan
    from raytracinggpu_tpu.core.rng import box_muller_jitter, cosine_hemisphere
    from raytracinggpu_tpu.core.vec import Vec3, vwhere
    from raytracinggpu_tpu.integrator import wavefront as wf
    from raytracinggpu_tpu.ops import pairs_trace as pt
    from raytracinggpu_tpu.ops.sphere import intersect_spheres
    from raytracinggpu_tpu.render.pipeline import Camera, raygen, row_uniforms

    import numpy as np

    cam = Camera.fixed(cfg.camera_c)

    @jax.jit
    def depth1_wavefront(key):
        """One jitted replay of depth 0 -> the depth-1 closest/shadow rays."""
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
        P_adj = h.P + h.N * eps
        Lv = tables.L - P_adj
        wl = (tables.L - h.P).normalized()
        sh_active = is_diff & (h.N.dot(wl) > 0.0)
        u_dif = cosine_hemisphere(un[1, 0], un[1, 1], h.N)
        u_mir = u - h.N * (2.0 * u.dot(h.N))
        O1 = vwhere(is_diff, P_adj, vwhere(is_mirror, h.P + h.N * eps, O))
        u1 = vwhere(is_diff, u_dif, vwhere(is_mirror, u_mir, u))
        return O1, u1, P_adj, Lv.normalized(), Lv.norm(), sh_active

    O1, u1, shO, shu, shcap, sh_active = jax.block_until_ready(
        depth1_wavefront(jax.random.PRNGKey(0)))
    out = {}
    out["floor_ms"] = round(
        timed_scan(lambda x: x + 1.0, (jnp.ones((128,)),), 30) * 1e3, 3)
    t_s, _, _ = intersect_spheres(O1, u1, tables.spheres)
    # production path as configured (compact branch when cfg enables it)
    out["closest_d1_cast_ms"] = round(timed_scan(
        lambda O, u: wf.intersect_all(tables, cfg, O, u).t, (O1, u1), 30
    ) * 1e3, 3)
    out["shadow_d1_cast_ms"] = round(timed_scan(
        lambda O, u: wf.occlusion_distance(
            tables, cfg, O, u, Vec3(shu.x * shcap, shu.y * shcap,
                                    shu.z * shcap), active=sh_active),
        (shO, shu), 30) * 1e3, 3)
    if cfg.pairs_compact:
        # the same casts at full width (the r2 form) — the compaction win
        # and its overhead are both visible in cast-vs-fullwidth deltas
        import dataclasses

        cfg_fw = dataclasses.replace(cfg, pairs_compact=0.0)
        out["closest_d1_fullwidth_ms"] = round(timed_scan(
            lambda O, u: wf.intersect_all(tables, cfg_fw, O, u).t,
            (O1, u1), 30) * 1e3, 3)
        out["shadow_d1_fullwidth_ms"] = round(timed_scan(
            lambda O, u: wf.occlusion_distance(
                tables, cfg_fw, O, u, Vec3(shu.x * shcap, shu.y * shcap,
                                           shu.z * shcap),
                active=sh_active),
            (shO, shu), 30) * 1e3, 3)
    if tables.pairs_mesh is not None and cfg.traversal == "pairs":
        tab = tables.pairs_mesh
        nc = tab.tile_aabb.shape[0]
        subg = cfg.pairs_subgroup
        # Mirror the production block shrink (intersect_tris_pairs):
        # calling the kernel at the raw configured block on a big mesh
        # (W > 8 bitmask words) would exceed the SMEM budget.
        blk = pt._blk_cap(nc, subg, cfg.pairs_block, pt.tile_width(tab),
                          5, tab.fields.shape[1])
        O2, u2, cap2, _, _, _ = pt._prep(O1, u1, t_s, blk)
        # Big meshes (W > 8 bitmask words): production chunks the cast at
        # smem_ray_cap rays per kernel call; the micro-timings below are
        # ONE such chunk (per-chunk numbers — the full cast runs
        # ceil(R/chunk) of them).  Cat-sized meshes are unaffected
        # (cap >> R).  The slice keeps whole blocks so _prep padding
        # stays valid.
        ray_cap = pt.smem_ray_cap(nc, subg, blk) // blk * blk
        if 0 < ray_cap < O2.x.shape[0]:
            sl = lambda c: c[:ray_cap]
            from raytracinggpu_tpu.core.vec import Vec3 as _V3

            O2, u2, cap2 = _V3(*map(sl, O2)), _V3(*map(sl, u2)), sl(cap2)
            out["breakdown_chunk_rays"] = ray_cap
        rfT = jax.block_until_ready(pt._ray_feature_rows(O2, u2))
        bits = jax.block_until_ready(pt._pair_bits(
            O2, u2, tab.tile_aabb, nc, subg, blk, cap=cap2,
            members=pt._members_of(tab)))
        # Time the kernel in its PRODUCTION configuration (geom payload,
        # default vpi/sgw) — the same program the full cast above runs —
        # so full-minus-kernel really is the glue.
        out["closest_d1_kernel_ms"] = round(timed_scan(
            lambda rfT, b: pt._pairs_call(
                rfT, tab.fields, b, float(cfg.eps_leaf), True, subg, blk,
                nc, False, pt.tile_width(tab), 1, pt.DEF_VPI,
                pt.DEF_SGW)[0],
            (rfT, bits), 30) * 1e3, 3)
        out["closest_d1_bits_ms"] = round(timed_scan(
            lambda O, u: pt._pair_bits(
                O, u, tab.tile_aabb, nc, subg, blk, cap=cap2,
                members=pt._members_of(tab)),
            (O2, u2), 30) * 1e3, 3)
        out["closest_d1_pairs"] = int(sum(
            int(bin(int(w) & 0xFFFFFFFF).count("1"))
            for w in np.asarray(bits).reshape(-1)))
        C = pt._compact_ok(cfg.pairs_compact, nc, O2.x.shape[0], blk)
        if C:
            # itemized compact-branch primitives on THIS real wavefront
            # (floor_ms applies to each) — where the compacted cast's
            # time goes: key slab+pack, the int32 sort, the (16,R)->(16,C)
            # row-form source move, the kernel at C, the scatter-back
            skey, n_act, shift = jax.block_until_ready(pt._compact_key(
                O2, u2, tab.tile_aabb, nc, cap2, None, O2.x.shape[0]))
            out["compact_n_act"] = int(n_act)
            out["compact_C"] = C
            out["compact_key_ms"] = round(timed_scan(
                lambda O, u: pt._compact_key(
                    O, u, tab.tile_aabb, nc, cap2, None,
                    O.x.shape[0])[0],
                (O2, u2), 30) * 1e3, 3)
            out["compact_sort_ms"] = round(timed_scan(
                lambda k: pt._compact_sort(k, C, shift), (skey,),
                30) * 1e3, 3)
            src = jax.block_until_ready(pt._compact_sort(skey, C, shift))
            out["compact_take_ms"] = round(timed_scan(
                lambda r, s: jnp.take(r, s, axis=1), (rfT, src),
                30) * 1e3, 3)
            rfc = jax.block_until_ready(jnp.take(rfT, src, axis=1))
            Oc = Vec3(rfc[6], rfc[7], rfc[8])
            uc = Vec3(rfc[0], rfc[1], rfc[2])
            bits_c = jax.block_until_ready(pt._pair_bits(
                Oc, uc, tab.tile_aabb, nc, subg, min(blk, C),
                cap=None, members=pt._members_of(tab)))
            out["kernel_at_C_ms"] = round(timed_scan(
                lambda rf, b: pt._pairs_call(
                    rf, tab.fields, b, float(cfg.eps_leaf), True, subg,
                    min(blk, C), nc, False, pt.tile_width(tab), 1,
                    pt.DEF_VPI, pt.DEF_SGW)[0],
                (rfc, bits_c), 30) * 1e3, 3)
            tC = jnp.zeros((C,), jnp.float32)
            out["compact_scatter1_ms"] = round(timed_scan(
                lambda t, s: jnp.full(
                    (O2.x.shape[0],), np.float32(np.inf),
                    jnp.float32).at[s].set(t),
                (tC, src), 30) * 1e3, 3)
    return out


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
