"""Pair-compaction mesh traversal (the round-2 production kernel).

This is the TPU realization of the reference's per-thread cost structure
(optimized.cu:220-285: each ray pays only for the nodes on its own path)
without per-lane control flow.  Measured motivation (PERF_NOTES.md, real
512^2 wavefronts): per-RAY mean active tiles is ~1.2-1.5, but the previous
kernel paid (a) the ~435 ns fixed cost of one dynamic fori_loop per 64-ray
subgroup — a 0.9 ms/cast floor — and (b) the *union* of tiles per subgroup,
inflated by "junk tiles": 128-triangle tiles cut at arbitrary BVH-preorder
boundaries whose AABBs span subtree seams (two such tiles cover ~25% of the
whole cat's volume each, so every ray hits them).

Three structural changes:

1. **Cluster-aligned tiles** — the triangle table is re-paved from a
   ``cluster_cut`` of the BVH (shallowest subtrees holding <= 128
   triangles), one padded 128-wide tile per cluster.  Tile AABBs are now
   genuine subtree boxes: rays that miss the mesh hit zero tiles, and the
   per-subgroup unions drop toward the per-ray mean.
2. **One flat pair loop per ray block** — the XLA-side culling emits, per
   kernel block, a single front-packed list of (subgroup, tile) pairs; the
   kernel runs ONE dynamic fori_loop over it.  Subgroup size stops costing
   a fixed overhead, so it becomes a pure union-tightness knob (pairs_subg,
   default 16; measured pair slopes: ~110-130 ns marginal at subg 8-16 vs
   ~230 ns at 64).
3. **In-kernel original-index tracking** — each tile carries a 17th field
   row holding the BVH-order triangle id per slot, so the closest-hit
   winner needs no post-kernel index remapping (cluster ranges are
   preorder-contiguous and ascending, preserving the reference's
   lowest-index tie-break, global_launcher.cu:268-278).

Worst-case pair lists are bounded by ``maxp`` per block; a block whose list
overflows falls back (in-kernel) to the dense sweep over all
(subgroup, tile) combinations — exact, just slower, and measured-rare
(pair counts run ~3x below the default bound).
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
from raytracinggpu_tpu.ops.pallas_trace import slab_enter_exit
from raytracinggpu_tpu.ops.triangle import TriHit

INF = 1e9 + 9
TILE_T = 128          # triangles per cluster tile (lane dimension)
NUM_FIELDS = 24       # rows 0-15: MT constants; 16: original tri id; 17+: pad
DEF_BLK = 4096        # rays per kernel program
DEF_SUBG = 16         # rays per culling subgroup
DEF_MAXP = 2048       # pair-list capacity per block (overflow -> dense sweep)
_IDX_BIG = np.int32(2**30)


class PairsMeshTables(NamedTuple):
    """Cluster-tiled device tables.

    fields: (24, Tc) f32 per-slot constants in cluster-slot order
        (0-2 Ng, 3-5 e2 x A, 6-8 e2, 9-11 e1 x A, 12-14 e1, 15 A.Ng,
        16 original BVH-order triangle id, 17-23 zero).
    tile_aabb: (nc, 8) f32 [mn.xyz, mx.xyz, pad, pad] — subtree boxes.
    slot_src: (Tc,) int32 original tri id per slot (-1 on padding) — used by
        the jitted pose transform to rebuild fields from posed vertices.
    """

    fields: jnp.ndarray
    tile_aabb: jnp.ndarray
    slot_src: jnp.ndarray


def _cluster_slots(bvh, n_tri: int):
    """Host: cluster ranges -> (slot_src (nc*128,), n_clusters)."""
    from raytracinggpu_tpu.accel.bvh import cluster_cut

    cut = cluster_cut(bvh, max_tris=TILE_T)
    nc = len(cut.starts)
    slot_src = np.full(nc * TILE_T, -1, np.int32)
    for j, (s, e) in enumerate(zip(cut.starts, cut.ends)):
        slot_src[j * TILE_T : j * TILE_T + (e - s)] = np.arange(s, e)
    return slot_src, nc


def fields_from_corners(A, B, C, slot_src, np_mod=np):
    """(24, Tc) field rows from BVH-ordered corners gathered per slot.
    Works for host numpy and jnp (pose transform) alike."""
    idx = np_mod.maximum(slot_src, 0)

    def g(v):
        return np_mod.where((slot_src >= 0)[:, None], v[idx], 0.0)

    Ag, Bg, Cg = g(A), g(B), g(C)
    e1 = Bg - Ag
    e2 = Cg - Ag
    ng = np_mod.cross(e1, e2)
    Tc = slot_src.shape[0]
    rows = [
        ng.T, np_mod.cross(e2, Ag).T, e2.T, np_mod.cross(e1, Ag).T, e1.T,
        (Ag * ng).sum(axis=1)[None, :],
        np_mod.where(slot_src >= 0, slot_src, _IDX_BIG).astype(A.dtype)[None, :],
    ]
    f = np_mod.concatenate(rows, axis=0)
    pad = np_mod.zeros((NUM_FIELDS - f.shape[0], Tc), A.dtype)
    return np_mod.concatenate([f, pad], axis=0)


def build_pairs_tables(A, B, C, bvh) -> PairsMeshTables:
    """Host-side build from BVH-ordered triangle corners (T, 3)."""
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)
    C = np.asarray(C, np.float32)
    slot_src, nc = _cluster_slots(bvh, A.shape[0])
    if nc > 255:
        raise ValueError(
            f"mesh too large for the pairs kernel ({nc} clusters); the"
            " 8-bit tile encoding supports 255 — use traversal='pallas'"
        )
    f = fields_from_corners(A, B, C, slot_src)

    aabb = np.zeros((nc, 8), np.float32)
    for j in range(nc):
        ids = slot_src[j * TILE_T : (j + 1) * TILE_T]
        ids = ids[ids >= 0]
        pts = np.concatenate([A[ids], B[ids], C[ids]], axis=0)
        aabb[j, 0:3] = pts.min(axis=0)
        aabb[j, 3:6] = pts.max(axis=0)
    return PairsMeshTables(
        fields=jnp.asarray(f),
        tile_aabb=jnp.asarray(aabb),
        slot_src=jnp.asarray(slot_src),
    )


def _ray_features16(O: Vec3, u: Vec3) -> jnp.ndarray:
    """(R, 16): [u(3), w=O x u(3), O(3), 1/u(3), 0(4)] (shared layout with
    ops/pallas_trace)."""
    from raytracinggpu_tpu.ops.pallas_trace import _ray_features16 as rf16

    return rf16(O, u)


def _pair_lists(O, u, aabb, nc, subg, blk, maxp, cap=None):
    """XLA-side culling: per-block front-packed (subgroup, tile) pair lists.

    Returns (n_blocks, 1 + maxp) int32 rows [count | ids]; ids encode
    sg * 256 + tile, sorted ascending by (sg, tile); count == -1 flags
    overflow (the kernel then sweeps all combinations densely).

    Compaction is cumsum + one pair-count-scale scatter — an argsort over
    the (n_sg * nc)-wide mask rows costs ~10x more (row-rate sorts).
    """
    R = O.x.shape[0]
    n_blocks = R // blk
    n_sg = blk // subg
    maxp = min(maxp, n_sg * nc)
    S = R // subg                                           # total subgroups
    enter, _exit, hit = slab_enter_exit(O, u, aabb, nc)
    if cap is not None:
        hit = hit & (enter <= cap[None, :])
    m = hit.reshape(nc, S, subg).any(axis=2).T              # (S, nc)
    mi = m.astype(jnp.int32)
    # rank of each active (sg, tile) pair within its subgroup row
    rank = jnp.cumsum(mi, axis=1) - mi                      # exclusive
    cnt_sg = mi.sum(axis=1)                                 # (S,)
    csg = jnp.cumsum(cnt_sg) - cnt_sg                       # exclusive, (S,)
    block_of_sg = jnp.arange(S, dtype=jnp.int32) // n_sg
    base = csg.reshape(n_blocks, n_sg)[:, 0]                # block start
    pos = (csg - base[block_of_sg])[:, None] + rank         # pos within block

    sg_local = (jnp.arange(S, dtype=jnp.int32) % n_sg)[:, None]
    ids = sg_local * 256 + jnp.arange(nc, dtype=jnp.int32)[None, :]
    dest_b = jnp.broadcast_to(block_of_sg[:, None], (S, nc))
    dest_p = jnp.where(m, jnp.minimum(pos, maxp - 1), maxp)  # drop inactives

    lists = jnp.zeros((n_blocks, 1 + maxp), jnp.int32)
    lists = lists.at[dest_b.reshape(-1), 1 + dest_p.reshape(-1)].set(
        ids.reshape(-1).astype(jnp.int32), mode="drop"
    )
    counts = (csg + cnt_sg).reshape(n_blocks, n_sg)[:, -1] - base
    counts = jnp.where(counts > maxp, -1, counts)
    return lists.at[:, 0].set(counts)


def _mt_tile(rf_ref, tri_ref, rows, off, eps_leaf):
    """Moller-Trumbore for one (subg-ray, 128-tri) visit; returns
    (t_masked, orig_id_row)."""
    col = lambda k: rf_ref[rows, k : k + 1]
    ux, uy, uz = col(0), col(1), col(2)
    wx, wy, wz = col(3), col(4), col(5)
    Ox, Oy, Oz = col(6), col(7), col(8)
    tile = tri_ref[:, pl.ds(off, TILE_T)]        # (24, 128)
    row = lambda k: tile[k : k + 1, :]
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
    bary_ok = jnp.minimum(jnp.minimum(beta, gamma), 1.0 - beta - gamma) >= 0.0
    valid = (denom != 0.0) & bary_ok & (tval > max(float(eps_leaf), 0.0))
    return jnp.where(valid, tval, INF), row(16)


def _pairs_kernel(eps_leaf, track_idx, subg, blk, nc,
                  pairs_ref, rf_ref, tri_ref, *refs):
    """One flat dynamic loop over the block's (subgroup, tile) pairs.

    Scratch t_run (blk, 128) carries the per-(ray, lane) running min across
    pairs; visits arrive sorted by (sg, tile) ascending, and cluster slots
    are ascending in original id, so a strict `<` update + per-row min over
    the id scratch reproduces the reference's lowest-index tie-break."""
    if track_idx:
        t_ref, idx_ref, t_run, idx_run = refs
    else:
        (t_ref, t_run) = refs
        idx_ref = idx_run = None
    b = pl.program_id(0)
    t_run[:] = jnp.full((blk, TILE_T), INF, jnp.float32)
    if track_idx:
        idx_run[:] = jnp.full((blk, TILE_T), _IDX_BIG, jnp.int32)

    def visit(sg, tile, c):
        rows = pl.ds(sg * subg, subg)
        off = pl.multiple_of(tile * TILE_T, TILE_T)
        t, oid = _mt_tile(rf_ref, tri_ref, rows, off, eps_leaf)
        if track_idx:
            upd = t < t_run[rows, :]
            t_run[rows, :] = jnp.where(upd, t, t_run[rows, :])
            idx_run[rows, :] = jnp.where(
                upd, oid.astype(jnp.int32), idx_run[rows, :]
            )
        else:
            t_run[rows, :] = jnp.minimum(t_run[rows, :], t)
        return c

    count = pairs_ref[b, 0]

    @pl.when(count >= 0)
    def _listed():
        def body(i, c):
            p = pairs_ref[b, 1 + i]
            return visit(p >> 8, p & 255, c)

        jax.lax.fori_loop(0, count, body, 0)

    @pl.when(count < 0)
    def _overflow():
        # Dense sweep (rare): every (subgroup, tile) combination.
        n_sg = blk // subg

        def body(i, c):
            return visit(i // nc, i % nc, c)

        jax.lax.fori_loop(0, n_sg * nc, body, 0)

    for r in range(blk // TILE_T):
        sl = pl.ds(r * TILE_T, TILE_T)
        t_min = jnp.min(t_run[sl, :], axis=1)
        t_ref[r : r + 1, :] = t_min.reshape(1, TILE_T)
        if track_idx:
            win = t_run[sl, :] == t_min[:, None]
            idx = jnp.min(
                jnp.where(win, idx_run[sl, :], _IDX_BIG), axis=1
            )
            idx_ref[r : r + 1, :] = (
                jnp.where(idx == _IDX_BIG, 0, idx).reshape(1, TILE_T)
            )


@functools.partial(
    jax.jit,
    static_argnames=("eps_leaf", "track_idx", "subg", "blk", "nc", "interpret"),
)
def _pairs_call(rf, fields, pairs, eps_leaf, track_idx, subg, blk, nc,
                interpret):
    R = rf.shape[0]
    out_specs = [
        pl.BlockSpec((blk // TILE_T, TILE_T), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((R // TILE_T, TILE_T), jnp.float32)]
    scratch = [pltpu.VMEM((blk, TILE_T), jnp.float32)]
    if track_idx:
        out_specs.append(
            pl.BlockSpec((blk // TILE_T, TILE_T), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((R // TILE_T, TILE_T), jnp.int32))
        scratch.append(pltpu.VMEM((blk, TILE_T), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // blk,),
        in_specs=[
            pl.BlockSpec((blk, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_FIELDS, fields.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_pairs_kernel, eps_leaf, track_idx, subg, blk, nc)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(pairs, rf, fields)
    if track_idx:
        return out[0].reshape(-1), out[1].reshape(-1)
    return out[0].reshape(-1)


def _prep(O, u, cap, blk):
    R = O.x.shape[0]
    pad = (-R) % blk
    if pad:
        O = Vec3(*(jnp.pad(c, (0, pad)) for c in O))
        u = Vec3(*(jnp.pad(c, (0, pad), constant_values=1.0) for c in u))
        if cap is not None:
            cap = jnp.pad(cap, (0, pad))
    return O, u, cap, R, pad


def intersect_tris_pairs(
    O: Vec3,
    u: Vec3,
    tab: PairsMeshTables,
    eps_leaf: float,
    cap=None,
    interpret: bool = False,
    subg: int = DEF_SUBG,
    blk: int = DEF_BLK,
    maxp: int = DEF_MAXP,
) -> TriHit:
    """Closest hit over the cluster-tiled mesh.  Returns TriHit with the
    ORIGINAL (BVH-order) triangle index — drop-in compatible with the
    pallas mode's winner recovery (normals, barycentrics)."""
    O, u, cap, R, pad = _prep(O, u, cap, blk)
    rf = _ray_features16(O, u)
    nc = tab.tile_aabb.shape[0]
    pairs = _pair_lists(O, u, tab.tile_aabb, nc, subg, blk, maxp, cap=cap)
    t, idx = _pairs_call(
        rf, tab.fields, pairs, float(eps_leaf), True, subg, blk, nc, interpret
    )
    if pad:
        t, idx = t[:R], idx[:R]
    z = jnp.zeros_like(t)
    return TriHit(t=t, idx=idx, beta=z, gamma=z)


def intersect_tris_pairs_shadow(
    O: Vec3,
    u: Vec3,
    tab: PairsMeshTables,
    eps_leaf: float,
    cap=None,
    interpret: bool = False,
    subg: int = DEF_SUBG,
    blk: int = DEF_BLK,
    maxp: int = DEF_MAXP,
):
    """Nearest mesh hit distance only (occlusion query; the reference's
    shadow test needs any hit with t^2 <= |L-P|^2,
    global_launcher.cu:795-799 — ``cap`` culls tiles beyond the light)."""
    O, u, cap, R, pad = _prep(O, u, cap, blk)
    rf = _ray_features16(O, u)
    nc = tab.tile_aabb.shape[0]
    pairs = _pair_lists(O, u, tab.tile_aabb, nc, subg, blk, maxp, cap=cap)
    t = _pairs_call(
        rf, tab.fields, pairs, float(eps_leaf), False, subg, blk, nc, interpret
    )
    return t[:R] if pad else t
