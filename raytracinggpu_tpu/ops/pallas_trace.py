"""Pallas TPU kernel: fused mesh closest-hit with tile-AABB culling.

This is the TPU-native replacement for the reference's per-thread BVH
traversal (the divergent pointer/int-stack loops of
global_launcher.cu:245-286 and optimized.cu:220-285).  Instead of a
per-lane stack — hostile to an 8x128 SIMD VPU — the kernel exploits the
*flat, spatially-ordered* triangle layout the BVH build produces
(contiguous leaf ranges, optimized.cu:494-534):

- triangles live in BVH (preorder leaf) order, grouped into 128-wide tiles;
  each tile's AABB is tight because neighboring triangles are spatially
  close — the tile table IS the acceleration structure, a two-level BVH
  with SIMD-width leaves,
- tile culling runs vectorized in XLA *outside* the kernel: per-ray slab
  tests reduced to per-64-ray-subgroup active-tile lists (in-kernel
  vector->scalar reductions and per-tile branches measured ~10x the
  triangle math they guard),
- each 1024-ray kernel program walks its subgroups' pre-culled lists with
  SMEM-driven fori_loops (scalar prefetch) — the block-uniform analog of
  warp-coherent traversal, with per-ray caps (nearest sphere hit, shadow
  |L-P|) tightening the lists for free,
- active tiles run Moller-Trumbore *elementwise* on (64 rays x 128 tris)
  ops: unlike the XLA matmul formulation (ops/triangle.py) there is no
  contraction-dim padding waste and every intermediate stays in
  VMEM/registers — zero HBM traffic between intersection and reduction,
- the running (t, tile) winner is tracked per lane and reduced once per
  128-ray output row (min + masked-iota lowest-index argmin, no gathers);
  the shadow variant drops winner tracking entirely.

Per-triangle constants (16 floats: Ng, e2 x A, e2, e1 x A, e1, A.Ng) are
precomputed on host and stay VMEM-resident across the whole grid (constant
index map).  Ray features are [u, w=O x u, O, 1/u] — the same factorization
as ops/triangle.py plus reciprocal directions for the slab test
(global_launcher.cu:172-183 divides per ray per node; here it's one
reciprocal per ray reused for every tile).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.triangle import TriHit

INF = 1e9 + 9
TILE_T = 128   # triangles per tile (lane dimension)
BLK_R = 1024   # rays per kernel program (8 output sublanes x 128 lanes)
SUBG = 64      # rays per culling subgroup: the active-tile union grows with
               # group size (measured on bounce rays: 64 rays -> 7.7 tiles,
               # 128 -> 10.9, 1024 -> 22.8); 64 is the smallest size whose
               # int8 [count|ids] lists still fit the 1MB SMEM prefetch
               # budget at 2^18-ray batches (rows pad to 128 bytes)
NUM_FIELDS = 16
SMEM_BUDGET_BYTES = 524288  # known-good scalar-prefetch budget (same 512 KB
                            # the pairs kernel uses; hardware SMEM is ~1 MB
                            # and over-budget operands are a COMPILE error)


def smem_ray_cap_pallas(n_tiles: int, subg: int = SUBG) -> int:
    """Largest per-call ray count whose merged [count|ids] tile lists fit
    the scalar-prefetch SMEM budget.

    The lists are (R/subg, 1 + n_tiles) rows, minor dim padded to 128
    elements, int8 up to 126 tiles else int16 — and Mosaic keeps the WHOLE
    operand SMEM-resident (scalar prefetch is not blocked over the grid).
    Big ``--obj`` meshes must therefore shrink the per-call ray count:
    a 200k-triangle soup (1563 tiles) reaches 6.5 MB at 2^17 rays, a
    compile-time OOM.  The public entry points self-chunk with this cap so
    direct callers and the render pipeline both degrade gracefully."""
    itemsize = 1 if n_tiles <= 126 else 2
    row_bytes = -(-(1 + n_tiles) // 128) * 128 * itemsize
    cap = SMEM_BUDGET_BYTES * subg // row_bytes // BLK_R * BLK_R
    if cap < BLK_R:
        # even ONE kernel block's lists blow the budget (~>16k tiles at
        # subg 64, i.e. >2M triangles): a clear error beats the compile-
        # time SMEM OOM the old max(BLK_R, ...) floor would have caused
        raise ValueError(
            f"mesh too large for the pallas kernel's scalar-prefetch tile "
            f"lists ({n_tiles} tiles: one {BLK_R}-ray block needs "
            f"{BLK_R // subg * row_bytes} B > {SMEM_BUDGET_BYTES} B SMEM) "
            f"— use traversal='dense'")
    return cap


def _chunked_rays(R: int, cap_rays: int, fn):
    """Run fn(lo, hi) over ray slices of at most cap_rays, concat results
    (mirrors pairs_trace._chunked; duplicated to keep the import DAG
    pallas_trace <- pairs_trace one-way)."""
    if R <= cap_rays:
        return fn(0, R)
    outs = [fn(lo, min(lo + cap_rays, R)) for lo in range(0, R, cap_rays)]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)


class PallasMeshTables(NamedTuple):
    """Device tables for the fused kernel.

    fields: (16, Tp) f32 per-triangle constants in BVH order:
        0-2 Ng, 3-5 e2 x A, 6-8 e2, 9-11 e1 x A, 12-14 e1, 15 A.Ng
    tile_aabb: (n_tiles, 8) f32 [mn.xyz, mx.xyz, pad, pad]
    n_tiles: static tile count (Tp // 128).
    """

    fields: jnp.ndarray
    fieldsT: jnp.ndarray  # (Tp, 16) transposed copy: winner-attribute
                          # recovery gathers ONE row per ray instead of 16
                          # separate (R,)-scale column gathers
    tile_aabb: jnp.ndarray
    n_tiles: int


def build_pallas_tables(A, B, C, pad_to: int | None = None) -> PallasMeshTables:
    """Host-side table build from BVH-ordered triangle vertices (T, 3)."""
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)
    C = np.asarray(C, np.float32)
    T = A.shape[0]
    Tp = pad_to or -(-T // TILE_T) * TILE_T
    Tp = -(-Tp // TILE_T) * TILE_T

    def pad(v):
        return np.pad(v, ((0, Tp - T), (0, 0)))

    Ap, Bp, Cp = pad(A), pad(B), pad(C)
    e1 = Bp - Ap
    e2 = Cp - Ap
    ng = np.cross(e1, e2)

    f = np.zeros((NUM_FIELDS, Tp), np.float32)
    f[0:3] = ng.T
    f[3:6] = np.cross(e2, Ap).T
    f[6:9] = e2.T
    f[9:12] = np.cross(e1, Ap).T
    f[12:15] = e1.T
    f[15] = np.einsum("td,td->t", Ap, ng)

    n_tiles = Tp // TILE_T
    if n_tiles > 32766:
        raise ValueError(
            f"mesh too large for the tiled kernel ({n_tiles} tiles); "
            "int16 tile lists support up to 32766 tiles (~4.2M triangles)"
        )
    aabb = np.zeros((n_tiles, 8), np.float32)
    for j in range(n_tiles):
        s, e = j * TILE_T, min((j + 1) * TILE_T, T)
        if s >= T:
            # Padding-only tile: empty box that no ray can hit.
            aabb[j, 0:3] = INF
            aabb[j, 3:6] = -INF
            continue
        pts = np.concatenate([A[s:e], B[s:e], C[s:e]], axis=0)
        aabb[j, 0:3] = pts.min(axis=0)
        aabb[j, 3:6] = pts.max(axis=0)
    return PallasMeshTables(
        fields=jnp.asarray(f), fieldsT=jnp.asarray(f.T.copy()),
        tile_aabb=jnp.asarray(aabb), n_tiles=n_tiles,
    )


def ray_sort_key(O: Vec3, u: Vec3) -> jnp.ndarray:
    """Coherence key for wavefront ray sorting: direction octant (3 bits) x
    quantized origin cell (4x4x4 over the scene-scale box [-64, 64]^3).

    Bounce and shadow rays arrive pixel-ordered but point anywhere; a block
    of 1024 such rays activates most tiles and the block-level culling
    degenerates to brute force.  Grouping rays into beam families first is
    the TPU analog of the reference's warp-coherence concern — the
    'ray compaction/sorting to tame branch divergence' the north star
    requires (BASELINE.json).
    """
    octant = (
        (u.x < 0).astype(jnp.int32) * 4
        + (u.y < 0).astype(jnp.int32) * 2
        + (u.z < 0).astype(jnp.int32)
    )
    q = lambda c: jnp.clip(((c + 64.0) * (4.0 / 128.0)).astype(jnp.int32), 0, 3)
    cell = (q(O.x) * 4 + q(O.y)) * 4 + q(O.z)
    return cell * 8 + octant


def _sort_rays(O: Vec3, u: Vec3, extra=()):
    """Returns (perm, O_sorted, u_sorted, extras_sorted)."""
    perm = jnp.argsort(ray_sort_key(O, u)).astype(jnp.int32)
    Os = Vec3(O.x[perm], O.y[perm], O.z[perm])
    us = Vec3(u.x[perm], u.y[perm], u.z[perm])
    return perm, Os, us, tuple(e[perm] for e in extra)


def _unsort(perm, *arrays):
    """Scatter sorted-order results back to original ray order."""
    return tuple(
        jnp.zeros_like(a).at[perm].set(a) for a in arrays
    )


def _ray_features16(O: Vec3, u: Vec3) -> jnp.ndarray:
    """(R, 16): [u(3), w=O x u(3), O(3), 1/u(3), 0(4)]."""
    w = O.cross(u)
    rcp = Vec3(1.0 / u.x, 1.0 / u.y, 1.0 / u.z)
    z = jnp.zeros_like(u.x)
    return jnp.stack(
        [u.x, u.y, u.z, w.x, w.y, w.z, O.x, O.y, O.z,
         rcp.x, rcp.y, rcp.z, z, z, z, z],
        axis=-1,
    )


def _closest_hit_kernel(eps_leaf, track_idx, subg,
                        lists_ref, rf_ref, tri_ref,
                        t_ref, idx_ref, t_run, tile_run):
    """Two-level tiled closest hit for one 1024-ray program block.

    The block is processed as 8 subgroups of 128 rays, each with its own
    pre-culled active-tile list (XLA-side slab tests reduced per subgroup
    and fed via scalar prefetch).  The only control flow is one SMEM-driven
    fori_loop per subgroup — no vector->scalar reductions, no per-tile
    branches, both of which measured ~10x slower than the triangle math
    they were guarding."""
    b = pl.program_id(0)
    n_sg = BLK_R // subg
    per_row = TILE_T // subg  # subgroups per 128-ray output row

    for out_row in range(BLK_R // TILE_T):
        t_run[:] = jnp.full((TILE_T, TILE_T), INF, jnp.float32)
        if track_idx:
            tile_run[:] = jnp.zeros((TILE_T, TILE_T), jnp.int32)

        for half in range(per_row):
            sg = out_row * per_row + half
            rows = pl.ds(sg * subg, subg)
            scr = pl.ds(half * subg, subg)
            col = lambda k: rf_ref[rows, k:k + 1]           # (subg, 1)
            ux, uy, uz = col(0), col(1), col(2)
            wx, wy, wz = col(3), col(4), col(5)
            Ox, Oy, Oz = col(6), col(7), col(8)

            def body(i, carry, ux=ux, uy=uy, uz=uz, wx=wx, wy=wy, wz=wz,
                     Ox=Ox, Oy=Oy, Oz=Oz, sg=sg, scr=scr):
                tid = lists_ref[b * n_sg + sg, 1 + i].astype(jnp.int32)
                off = pl.multiple_of(tid * TILE_T, TILE_T)
                # One dynamic slice for the whole tile (16 per-row dynamic
                # slices cost 16x the scalar address arithmetic).
                tile = tri_ref[:, pl.ds(off, TILE_T)]       # (16, TILE_T)
                row = lambda k: tile[k:k + 1, :]            # (1, TILE_T)
                ngx, ngy, ngz = row(0), row(1), row(2)
                c2x, c2y, c2z = row(3), row(4), row(5)
                e2x, e2y, e2z = row(6), row(7), row(8)
                c1x, c1y, c1z = row(9), row(10), row(11)
                e1x, e1y, e1z = row(12), row(13), row(14)
                adn = row(15)

                denom = ux * ngx + uy * ngy + uz * ngz
                bnum = (ux * c2x + uy * c2y + uz * c2z) - (
                    wx * e2x + wy * e2y + wz * e2z
                )
                gnum = (wx * e1x + wy * e1y + wz * e1z) - (
                    ux * c1x + uy * c1y + uz * c1z
                )
                tnum = adn - (Ox * ngx + Oy * ngy + Oz * ngz)
                rden = 1.0 / denom
                beta = bnum * rden
                gamma = gnum * rden
                tval = tnum * rden
                # min(beta, gamma, 1-beta-gamma) >= 0 folds the five
                # barycentric range checks of moller_trumbore
                # (global_launcher.cu:238-242) into two mins + one compare;
                # t > max(eps, 0) folds t>0 with the leaf epsilon.
                bary_ok = jnp.minimum(
                    jnp.minimum(beta, gamma), 1.0 - beta - gamma
                ) >= 0.0
                valid = (
                    (denom != 0.0) & bary_ok
                    & (tval > max(float(eps_leaf), 0.0))
                )
                tmask = jnp.where(valid, tval, INF)
                upd = tmask < t_run[scr, :]
                t_run[scr, :] = jnp.where(upd, tmask, t_run[scr, :])
                if track_idx:
                    tile_run[scr, :] = jnp.where(upd, tid, tile_run[scr, :])
                return carry

            jax.lax.fori_loop(
                0, lists_ref[b * n_sg + sg, 0].astype(jnp.int32), body, 0
            )

        t_min = jnp.min(t_run[:], axis=1)                   # (TILE_T,)
        t_ref[out_row:out_row + 1, :] = t_min.reshape(1, TILE_T)
        if track_idx:
            # Lowest triangle index wins exact-t ties, matching the
            # reference's ascending scan with strict `<`
            # (global_launcher.cu:268-278); tiles already process in
            # ascending id order with a strict running-min update.
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_T, TILE_T), 1)
            win = t_run[:] == t_min[:, None]
            big = jnp.int32(2**30)
            idx = jnp.min(
                jnp.where(win, tile_run[:] * TILE_T + lane, big), axis=1
            )
            idx_ref[out_row:out_row + 1, :] = (
                jnp.where(idx == big, 0, idx).reshape(1, TILE_T)
            )


def _shadow_kernel(eps_leaf, subg, lists_ref, rf_ref, tri_ref, t_ref, t_run):
    """Any-hit (occlusion) variant: same two-level Moller-Trumbore tile loop
    but no winner tracking — the shadow test only needs the nearest distance
    to compare against |L - P|^2 (global_launcher.cu:795-799), so the
    running min is a single fused minimum and the argmin epilogue
    disappears.  Shadow rays are ~half of all casts."""
    b = pl.program_id(0)
    n_sg = BLK_R // subg
    per_row = TILE_T // subg

    for out_row in range(BLK_R // TILE_T):
        t_run[:] = jnp.full((TILE_T, TILE_T), INF, jnp.float32)

        for half in range(per_row):
            sg = out_row * per_row + half
            rows = pl.ds(sg * subg, subg)
            scr = pl.ds(half * subg, subg)
            col = lambda k: rf_ref[rows, k:k + 1]
            ux, uy, uz = col(0), col(1), col(2)
            wx, wy, wz = col(3), col(4), col(5)
            Ox, Oy, Oz = col(6), col(7), col(8)

            def body(i, carry, ux=ux, uy=uy, uz=uz, wx=wx, wy=wy, wz=wz,
                     Ox=Ox, Oy=Oy, Oz=Oz, sg=sg, scr=scr):
                tid = lists_ref[b * n_sg + sg, 1 + i].astype(jnp.int32)
                off = pl.multiple_of(tid * TILE_T, TILE_T)
                tile = tri_ref[:, pl.ds(off, TILE_T)]       # (16, TILE_T)
                row = lambda k: tile[k:k + 1, :]
                denom = ux * row(0) + uy * row(1) + uz * row(2)
                bnum = (ux * row(3) + uy * row(4) + uz * row(5)) - (
                    wx * row(6) + wy * row(7) + wz * row(8)
                )
                gnum = (wx * row(12) + wy * row(13) + wz * row(14)) - (
                    ux * row(9) + uy * row(10) + uz * row(11)
                )
                tnum = row(15) - (Ox * row(0) + Oy * row(1) + Oz * row(2))
                rden = 1.0 / denom
                beta = bnum * rden
                gamma = gnum * rden
                tval = tnum * rden
                bary_ok = jnp.minimum(
                    jnp.minimum(beta, gamma), 1.0 - beta - gamma
                ) >= 0.0
                # (denom != 0) parity with _closest_hit_kernel and the
                # dense path: plane-parallel rays must be rejected
                # explicitly, not by hoping inf/NaN propagation through
                # 1/denom keeps bary_ok false under every lowering
                valid = (denom != 0.0) & bary_ok & (
                    tval > max(float(eps_leaf), 0.0))
                t_run[scr, :] = jnp.minimum(
                    t_run[scr, :], jnp.where(valid, tval, INF)
                )
                return carry

            jax.lax.fori_loop(
                0, lists_ref[b * n_sg + sg, 0].astype(jnp.int32), body, 0
            )

        t_ref[out_row:out_row + 1, :] = (
            jnp.min(t_run[:], axis=1).reshape(1, TILE_T)
        )


@functools.partial(jax.jit, static_argnames=("eps_leaf", "interpret", "subg"))
def _shadow_call(rf, fields, lists, eps_leaf, interpret, subg=SUBG):
    R = rf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // BLK_R,),
        in_specs=[
            pl.BlockSpec((BLK_R, NUM_FIELDS), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_FIELDS, fields.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK_R // TILE_T, TILE_T), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_T, TILE_T), jnp.float32)],
    )
    kernel = functools.partial(_shadow_kernel, eps_leaf, subg)
    t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R // TILE_T, TILE_T), jnp.float32),
        interpret=interpret,
    )(lists, rf, fields)
    return t.reshape(-1)


def _check_subg(subg: int) -> None:
    """The kernels process each 1024-ray block as TILE_T-wide row halves,
    per_row = TILE_T // subg subgroups per half: a subgroup wider than
    TILE_T floors per_row to 0 and every visit loop body is skipped —
    all hits silently vanish.  Reject instead."""
    if subg > TILE_T or TILE_T % subg or BLK_R % subg:
        raise ValueError(
            f"pallas_subgroup={subg} unsupported: must divide TILE_T "
            f"({TILE_T}) and BLK_R ({BLK_R})")


def intersect_tris_shadow(
    O: Vec3,
    u: Vec3,
    tab: PallasMeshTables,
    eps_leaf: float,
    cap=None,
    interpret: bool = False,
    sort_rays: bool = True,
    subg: int = SUBG,
):
    """Nearest mesh hit distance only (shadow/occlusion query).  ``cap``
    (per-ray max useful distance, |L - P_adj|) culls tiles entirely beyond
    the light."""
    R = O.x.shape[0]
    _check_subg(subg)
    cap_rays = smem_ray_cap_pallas(tab.fields.shape[1] // TILE_T, subg)
    if R > cap_rays:
        return _chunked_rays(R, cap_rays, lambda lo, hi: intersect_tris_shadow(
            Vec3(O.x[lo:hi], O.y[lo:hi], O.z[lo:hi]),
            Vec3(u.x[lo:hi], u.y[lo:hi], u.z[lo:hi]),
            tab, eps_leaf, cap=None if cap is None else cap[lo:hi],
            interpret=interpret, sort_rays=sort_rays, subg=subg))
    pad = (-R) % BLK_R
    if pad:
        O = Vec3(*(jnp.pad(c, (0, pad)) for c in O))
        u = Vec3(*(jnp.pad(c, (0, pad), constant_values=1.0) for c in u))
        if cap is not None:
            cap = jnp.pad(cap, (0, pad))
    perm = None
    if sort_rays:
        extra = (cap,) if cap is not None else ()
        perm, O, u, extra = _sort_rays(O, u, extra)
        if cap is not None:
            cap = extra[0]
    rf = _ray_features16(O, u)
    n_tiles = tab.fields.shape[1] // TILE_T
    lists = _block_active_tiles(O, u, tab.tile_aabb, n_tiles, cap=cap, subg=subg)
    t = _shadow_call(rf, tab.fields, lists, float(eps_leaf), interpret, subg=subg)
    if perm is not None:
        (t,) = _unsort(perm, t)
    return t[:R] if pad else t


def slab_enter_exit(O: Vec3, u: Vec3, aabb, n_tiles: int):
    """Per-ray slab intervals against every tile AABB, (n_tiles, R) layout
    (ray axis on lanes).  Branchless BoundingBox::intersect form
    (global_launcher.cu:172-183)."""
    big = np.float32(3.4e38)
    enter = jnp.full((n_tiles, O.x.shape[0]), -big)
    exit_ = jnp.full((n_tiles, O.x.shape[0]), big)
    for ax, (Oc, uc) in enumerate(((O.x, u.x), (O.y, u.y), (O.z, u.z))):
        rc = 1.0 / uc
        t0 = (aabb[:n_tiles, ax, None] - Oc[None, :]) * rc[None, :]
        t1 = (aabb[:n_tiles, 3 + ax, None] - Oc[None, :]) * rc[None, :]
        enter = jnp.maximum(enter, jnp.minimum(t0, t1))
        exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
    # exit >= enter (NOT strict): a zero-thickness tile box (planar
    # geometry) has enter == exit at the hit plane; culling must stay
    # conservative — the triangle test decides actual hits.  (The
    # reference's strict form, global_launcher.cu:182, would skip flat
    # nodes; its BVH never visibly produces one, but custom planar OBJs do.)
    hit = (exit_ >= enter) & (exit_ >= 0.0)
    return enter, exit_, hit


def _block_active_tiles(O: Vec3, u: Vec3, aabb, n_tiles: int, cap=None,
                        subg: int = SUBG):
    """Vectorized (XLA) per-block tile culling.

    Per-ray slab tests against every tile AABB (branchless
    BoundingBox::intersect, global_launcher.cu:172-183, plus an exit>=0
    behind-the-ray cull — conservative), reduced to a per-(block, tile)
    any-mask, then compacted to front-packed active-tile id lists.

    The tests run in (n_tiles, R) layout — the ray axis must be the lane
    (minor) dimension; an (R, nt, 3) layout pads the minor dim 3 -> 128 and
    wastes 42/43 lanes.

    cap: optional per-ray max distance (shadow rays: |L - P|); tiles whose
    entry is beyond the cap cannot occlude and are culled.

    Returns int8 rows [count, id0, id1, ...] per SUBG-ray subgroup.
    """
    enter, exit_, hit = slab_enter_exit(O, u, aabb, n_tiles)
    if cap is not None:
        hit = hit & (enter <= cap[None, :])
    # Padding-only tiles carry an inverted "empty" box (mn=+INF, mx=-INF);
    # slab_enter_exit's per-axis min/max normalization UN-inverts it into a
    # hits-everything interval, so without this mask every subgroup swept a
    # full 128-wide MT pass per junk tile (~13% of kernel work at ~7.7 real
    # tiles/subgroup).  Invalid boxes are culled explicitly instead.
    valid = (aabb[:, 0] <= aabb[:, 3])[:, None]
    hit = hit & valid
    blk = hit.reshape(n_tiles, -1, subg).any(axis=2).T       # (n_subgroups, nt)
    # One merged row per subgroup: [count, id0, id1, ...].  The
    # scalar-prefetch operands live in SMEM where every row pads its last
    # dim to 128 elements, so separate count/ids arrays overflow the ~1 MB
    # budget for large fused batches.  int8 holds tile ids up to 126; larger
    # meshes (possible via the --obj CLI) widen to int16.
    dt = jnp.int8 if n_tiles <= 126 else jnp.int16
    order = jnp.argsort(~blk, axis=1, stable=True).astype(dt)
    n_active = blk.sum(axis=1, dtype=dt)[:, None]
    return jnp.concatenate([n_active, order], axis=1)


@functools.partial(jax.jit, static_argnames=("eps_leaf", "interpret", "subg"))
def _closest_hit_call(rf, fields, lists, eps_leaf, interpret, subg=SUBG):
    R = rf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # merged [count|ids] rows (SMEM)
        grid=(R // BLK_R,),
        in_specs=[
            pl.BlockSpec((BLK_R, NUM_FIELDS), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_FIELDS, fields.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLK_R // TILE_T, TILE_T), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_R // TILE_T, TILE_T), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_T, TILE_T), jnp.float32),
            pltpu.VMEM((TILE_T, TILE_T), jnp.int32),
        ],
    )
    kernel = functools.partial(_closest_hit_kernel, eps_leaf, True, subg)
    t, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R // TILE_T, TILE_T), jnp.float32),
            jax.ShapeDtypeStruct((R // TILE_T, TILE_T), jnp.int32),
        ],
        interpret=interpret,
    )(lists, rf, fields)
    return t.reshape(-1), idx.reshape(-1)


def intersect_tris_pallas(
    O: Vec3,
    u: Vec3,
    tab: PallasMeshTables,
    eps_leaf: float,
    interpret: bool = False,
    sort_rays: bool = True,
    cap=None,
    subg: int = SUBG,
) -> TriHit:
    """Closest hit over the tiled mesh; returns TriHit compatible with the
    dense path (beta/gamma filled with zeros — recover via
    ``recompute_barycentrics`` when smooth shading needs them).

    sort_rays: group rays into coherent beam families before the kernel and
    scatter results back afterwards (see ray_sort_key) — the results are
    identical, only the block composition changes.

    cap: optional per-ray upper bound on a *useful* hit distance (e.g. the
    nearest sphere hit — the mesh cannot win the min-t merge beyond it,
    Scene::intersect_all semantics global_launcher.cu:716-736); tiles whose
    entry lies beyond the cap are culled.  Pure culling: results at or
    below the cap are unchanged, farther mesh hits would lose the merge
    anyway."""
    R = O.x.shape[0]
    _check_subg(subg)
    cap_rays = smem_ray_cap_pallas(tab.fields.shape[1] // TILE_T, subg)
    if R > cap_rays:
        return _chunked_rays(R, cap_rays, lambda lo, hi: intersect_tris_pallas(
            Vec3(O.x[lo:hi], O.y[lo:hi], O.z[lo:hi]),
            Vec3(u.x[lo:hi], u.y[lo:hi], u.z[lo:hi]),
            tab, eps_leaf, interpret=interpret, sort_rays=sort_rays,
            cap=None if cap is None else cap[lo:hi], subg=subg))
    pad = (-R) % BLK_R
    if pad:
        O = Vec3(*(jnp.pad(c, (0, pad)) for c in O))
        u = Vec3(*(jnp.pad(c, (0, pad), constant_values=1.0) for c in u))
        if cap is not None:
            cap = jnp.pad(cap, (0, pad))
    perm = None
    if sort_rays:
        extra = (cap,) if cap is not None else ()
        perm, O, u, extra = _sort_rays(O, u, extra)
        if cap is not None:
            cap = extra[0]
    rf = _ray_features16(O, u)
    # Derive the tile count from the (static) table shape — tab.n_tiles is a
    # pytree leaf and would be a tracer under jit.
    n_tiles = tab.fields.shape[1] // TILE_T
    lists = _block_active_tiles(O, u, tab.tile_aabb, n_tiles, cap=cap, subg=subg)
    t, idx = _closest_hit_call(
        rf, tab.fields, lists, float(eps_leaf), interpret, subg=subg
    )
    if perm is not None:
        t, idx = _unsort(perm, t, idx)
    if pad:
        t, idx = t[:R], idx[:R]
    z = jnp.zeros_like(t)
    return TriHit(t=t, idx=idx, beta=z, gamma=z)


def barycentrics_from_rows(O: Vec3, u: Vec3, g):
    """(beta, gamma) from a column accessor ``g(k)`` over already-gathered
    winner rows in fieldsT column order (0-14 used: Ng, e2 x A, e2,
    e1 x A, e1) — the factorized MT recovery of realtime_render.cu:221-245.
    Shared by recompute_barycentrics and the integrator's fused
    smooth-normal gather (which appends the vertex-normal columns to the
    same single row gather)."""
    w = O.cross(u)
    denom = u.x * g(0) + u.y * g(1) + u.z * g(2)
    bnum = (u.x * g(3) + u.y * g(4) + u.z * g(5)) - (
        w.x * g(6) + w.y * g(7) + w.z * g(8)
    )
    gnum = (w.x * g(12) + w.y * g(13) + w.z * g(14)) - (
        u.x * g(9) + u.y * g(10) + u.z * g(11)
    )
    rden = 1.0 / denom
    return bnum * rden, gnum * rden


def recompute_barycentrics(O: Vec3, u: Vec3, tab: PallasMeshTables, hit: TriHit):
    """(beta, gamma) of the winning triangle only — ONE row gather per ray
    (used by the realtime smooth-normal path, realtime_render.cu:221-245).
    Measured: 16 separate column gathers cost ~22 ms per cast; the single
    (R, 16) row gather ~1.4 ms."""
    rows = tab.fieldsT[hit.idx]          # (R, 16)
    return barycentrics_from_rows(O, u, lambda k: rows[:, k])
