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

The culling result crosses into the kernel as a packed bitmask (one bit
per (subgroup, tile)) walked by the scalar core with de Bruijn bit
extraction — exact, unbounded (no pair-list capacity / overflow path),
and free of the row-rate scatter the front-packed list form needed.
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
LANES = 128           # VPU lane width: output blocks + epilogue row chunks
TILE_T = 128          # default triangles per cluster tile (lane dimension,
                      # a multiple of 128; see build_pairs_tables(tile_t=))
NUM_FIELDS = 32       # rows 0-15: MT constants; 16: original tri id;
                      # 17-25: vertex normals na/nb/nc (the in-kernel
                      # winner-payload path interpolates the Phong normal
                      # per visit — any post-kernel per-winner recovery
                      # pays the XLA (R, small)-column wall, measured
                      # ~9 ms/cast at 480k rays); 26-31: pad
NUM_RF_ROWS = 16      # ray-feature rows (_ray_feature_rows): 9 used by the
                      # kernel, the rest carry compacted-cast side data
DEF_BLK = 4096        # rays per kernel program
DEF_SUBG = 16         # rays per culling subgroup
DEF_VPI = 2           # tiles visited per scalar-walk iteration (see visit());
                      # 2 folds two tiles into one RMW — measured 2-4%
                      # faster on every real-wavefront cast type (d1/d3,
                      # closest/shadow); 3 is flat-to-worse (vreg pressure)
DEF_SGW = 1           # walk order: 1 = subgroup-major (the 9 feature
                      # broadcasts hoist once per subgroup, static word
                      # sweep; summary scan is W-fold shorter) — measured
                      # +5.7% on the real 512² spp32 d5 wavefront mix and
                      # +43% on the primary-ray cast (subgroups correlated
                      # across words); 0 = word-major (the r2 form, one
                      # hoist per (subgroup, word)) — see _pairs_kernel
# Field tables up to ST_SLOTS columns are fully VMEM-resident per program
# (128 B/triangle slot at NUM_FIELDS=32; 32768 slots = 4 MB).  Bigger
# meshes STREAM the
# table in ST_SLOTS-wide supertile blocks over a minor grid axis
# (double-buffered DMA; t_run persists across the sweep), so the ceiling
# becomes HBM + the SMEM bitmask budget: ceil(nc/32) words per subgroup
# must keep the per-cast chunk >= one pairs_block
# (render/pipeline.trace_chunked), i.e. nc <= SMEM_WORDS*subg/pairs_block
# = 16384 tiles = 2M triangle slots at the defaults.
ST_SLOTS = 32768
MAX_SLOTS = 2**21
# Known-good SMEM budget for the culling bitmask, in words: W * (chunk /
# subg) at the default chunk 262144, subg 16, W = 8 (255 tiles).
SMEM_WORDS = 131072
_IDX_BIG = np.int32(2**30)


def tile_width(tab: "PairsMeshTables") -> int:
    """Tile lane width of a built table (derived, not stored: the slot
    array is exactly nc tiles of tile_t slots)."""
    return tab.slot_src.shape[0] // tab.tile_aabb.shape[0]


class PairsMeshTooLarge(ValueError):
    """Mesh exceeds the pairs kernel's SMEM bitmask budget (MAX_SLOTS at
    build time; a per-block budget check in _blk_cap at call time);
    callers fall back to traversal='pallas' on exactly this error."""


class PairsMeshTables(NamedTuple):
    """Cluster-tiled device tables.

    fields: (NUM_FIELDS, Tc) f32 per-slot constants in cluster-slot order
        (0-2 Ng, 3-5 e2 x A, 6-8 e2, 9-11 e1 x A, 12-14 e1, 15 A.Ng,
        16 original BVH-order triangle id, 17-23 zero).
    tile_aabb: (nc, 8) f32 [mn.xyz, mx.xyz, pad, pad] — union boxes of the
        packed tiles (kept for diagnostics and as the culling fallback).
    slot_src: (Tc,) int32 original tri id per slot (-1 on padding) — used by
        the jitted pose transform to rebuild fields from posed vertices.

    Member-box culling (the production path): packing merges several BVH
    subtree clusters into one 128-slot tile, so the tile's union AABB
    covers space no member cluster occupies; culling against the MEMBER
    boxes and OR-ing per tile is exact (every triangle lives inside its
    member box) and strictly tighter (measured ~9-12% fewer deep-shadow
    pairs on real wavefronts).  member_aabb: (nm, 8) per-cluster boxes;
    member_tile: (nm,) owning tile; member_slot: (Tc,) member id per slot
    (-1 on padding) so the jitted pose transform can refit member boxes by
    segment reduction.
    """

    fields: jnp.ndarray
    tile_aabb: jnp.ndarray
    slot_src: jnp.ndarray
    member_aabb: jnp.ndarray | None = None
    member_tile: jnp.ndarray | None = None
    member_slot: jnp.ndarray | None = None


def _cluster_slots(bvh, n_tri: int, tile_t: int = TILE_T,
                   cut_tris: int | None = None, ids_map=None,
                   pack: str = "morton"):
    """Host: cluster ranges -> (slot_src (nc*tile_t,), n_clusters).

    The raw cluster cut (shallowest subtrees <= tile_t tris) averages ~50%
    tile occupancy; half-empty tiles double the per-pair math for nothing.
    Clusters are therefore packed greedily in MORTON order of their box
    centers (spatial neighbors merge, so the union AABB stays tight) while
    their sizes fit one tile.  Packed tiles are not ascending in original
    id anymore, so the closest-hit kernel breaks exact-t ties
    lexicographically on (t, original id) instead of relying on visit
    order.

    Culling granularity stays at the CLUSTER level regardless of tile_t:
    member boxes are per merged cluster, so fatter tiles coarsen only the
    visit granularity (more triangles per scalar-walk iteration), not the
    slab tests.

    cut_tris: cluster-cut granularity (<= min(tile_t, 128)); smaller cuts
    give tighter member boxes (fewer false-positive tile activations) at
    the cost of more member slab tests in the XLA culling.
    ids_map: optional (T,) permutation mapping the cut tree's triangle
    positions to positions in the A/B/C arrays — lets the cut run over an
    AUXILIARY tree (e.g. a SAH build) while slot ids (and therefore the
    closest-hit tie-break and the pose-transform gather) stay in the
    canonical mesh order.  Clustering is a pure perf knob: results are
    bit-identical for any clustering that covers all triangles.

    pack: tile packing policy.
      'morton' — greedy first-fit of whole clusters in Morton order of
        their box centers with a box-growth bound (the r2 form).
      'pave'   — consecutive tree-order tri ranges at 100% occupancy:
        tiles are exact tile_t-wide chunks of the cut order, clusters
        SPLIT at tile boundaries into separate members (boxes refit from
        the actual triangles, so splitting only tightens them).  Merging
        tiles can only CLEAR activation bits (the merged bit is the OR),
        so at a fixed visit width the maximal merge — full occupancy —
        minimizes pair count for a given triangle order; measured ~0.8x
        pairs vs 'morton' on real wavefronts (PERF_NOTES.md r3)."""
    from raytracinggpu_tpu.accel.bvh import cluster_cut
    from raytracinggpu_tpu.accel.lbvh import morton_codes

    # Cut at sub-tile granularity so member boxes stay tight even for fat
    # tiles (a 512-wide tile packs ~4-8 of these 128-tri clusters).
    cut = cluster_cut(bvh, max_tris=min(cut_tris or tile_t, tile_t, 128))
    # A degenerate midpoint partition can make a LEAF larger than max_tris
    # (accel/bvh.py: the split gives up when the swap partition degenerates),
    # and cluster_cut emits leaves verbatim — split any oversized cluster
    # into <= TILE_T chunks (same box; conservative) so no slot overflows
    # its 128-wide tile and silently drops triangles.
    c_starts, c_ends, c_mn, c_mx = [], [], [], []
    for ci in range(len(cut.starts)):
        s, e = int(cut.starts[ci]), int(cut.ends[ci])
        while s < e:
            c_starts.append(s)
            c_ends.append(min(s + tile_t, e))
            c_mn.append(cut.mn[ci])
            c_mx.append(cut.mx[ci])
            s += tile_t
    cut = cut._replace(
        starts=np.asarray(c_starts, np.int32),
        ends=np.asarray(c_ends, np.int32),
        mn=np.stack(c_mn).astype(np.float32),
        mx=np.stack(c_mx).astype(np.float32),
    )
    if pack == "pave":
        # Consecutive cut-order triangle ranges at 100% occupancy: the cut
        # emits contiguous ascending preorder ranges, so tiles are exact
        # tile_t-wide chunks of the tree order and only the last tile pads.
        # Clusters straddling a tile boundary split into one member piece
        # per side (boxes refit from the actual triangles below, so the
        # split only tightens culling).
        groups_p: list[list[tuple[int, int, int]]] = []  # (ci, s, e)
        cur: list[tuple[int, int, int]] = []
        cap = tile_t
        for ci in range(len(cut.starts)):
            s, e = int(cut.starts[ci]), int(cut.ends[ci])
            while s < e:
                take = min(e - s, cap)
                cur.append((ci, s, s + take))
                cap -= take
                s += take
                if cap == 0:
                    groups_p.append(cur)
                    cur, cap = [], tile_t
        if cur:
            groups_p.append(cur)
    else:
        centers = (cut.mn + cut.mx) * 0.5
        order = np.argsort(morton_codes(centers), kind="stable")
        # First-fit within a sliding window of recent bins: high occupancy
        # without merging spatially distant clusters.  Morton order has
        # discontinuities, so a merge must also pass a box-growth test — the
        # union AABB may not balloon past a small fraction of the mesh box
        # (an oversized tile is hit by every ray: the junk-tile failure mode
        # this pavement exists to remove).
        WINDOW = 8
        mesh_vol = float(np.prod(cut.mx.max(axis=0) - cut.mn.min(axis=0)))
        # Box-growth bound scales with tile capacity: a fat tile legitimately
        # covers proportionally more of the mesh.
        MAX_TILE_VOL = 0.02 * mesh_vol * (tile_t / 128.0)
        groups: list[list] = []  # [cluster ids, size, mn(3,), mx(3,)]
        for ci in order:
            size = int(cut.ends[ci] - cut.starts[ci])
            placed = False
            for g in groups[-WINDOW:]:
                if g[1] + size > tile_t:
                    continue
                mn = np.minimum(g[2], cut.mn[ci])
                mx = np.maximum(g[3], cut.mx[ci])
                if float(np.prod(mx - mn)) > MAX_TILE_VOL:
                    continue
                g[0].append(ci)
                g[1] += size
                g[2], g[3] = mn, mx
                placed = True
                break
            if not placed:
                groups.append(
                    [[ci], size, cut.mn[ci].copy(), cut.mx[ci].copy()])
        groups_p = [
            [(ci, int(cut.starts[ci]), int(cut.ends[ci])) for ci in g[0]]
            for g in groups
        ]
    nc = len(groups_p)
    if ids_map is None:
        ids_map = np.arange(n_tri, dtype=np.int32)
    slot_src = np.full(nc * tile_t, -1, np.int32)
    member_slot = np.full(nc * tile_t, -1, np.int32)
    member_tile: list[int] = []
    member_aabb_rows: list[np.ndarray] = []
    for j, pieces in enumerate(groups_p):
        k = j * tile_t
        for ci, s, e in pieces:
            m = len(member_tile)
            member_tile.append(j)
            row = np.zeros(8, np.float32)
            row[0:3], row[3:6] = cut.mn[ci], cut.mx[ci]
            member_aabb_rows.append(row)
            slot_src[k : k + (e - s)] = ids_map[s:e]
            member_slot[k : k + (e - s)] = m
            k += e - s
    members = (
        np.stack(member_aabb_rows, axis=0),
        np.asarray(member_tile, np.int32),
        member_slot,
    )
    return slot_src, nc, members


def fields_from_corners(A, B, C, slot_src, np_mod=np, na=None, nb=None,
                        nc=None):
    """(NUM_FIELDS, Tc) field rows from BVH-ordered corners gathered per
    slot.  Works for host numpy and jnp (pose transform) alike.
    na/nb/nc: optional (T, 3) vertex normals -> rows 17-25 (zeros when
    absent; the smooth payload then interpolates a zero normal, matching
    the no-normals fallback of the post-hoc smooth path)."""
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
    for v in (na, nb, nc):
        if v is None:
            rows.append(np_mod.zeros((3, Tc), A.dtype))
        else:
            rows.append(g(v).T)
    f = np_mod.concatenate(rows, axis=0)
    pad = np_mod.zeros((NUM_FIELDS - f.shape[0], Tc), A.dtype)
    return np_mod.concatenate([f, pad], axis=0)


def build_pairs_tables(A, B, C, bvh, tile_t: int = TILE_T, vna=None,
                       vnb=None, vnc=None, cut_tris: int | None = None,
                       ids_map=None, pack: str = "morton") -> PairsMeshTables:
    """Host-side build from BVH-ordered triangle corners (T, 3).

    tile_t: triangles per packed tile (multiple of 128).  Fat tiles trade
    nearly-free extra VPU math per visit for fewer scalar-walk iterations
    (the measured per-visit bottleneck); culling tightness is preserved by
    per-cluster member boxes.
    cut_tris / ids_map: cluster-cut granularity and auxiliary-tree slot
    remap (see _cluster_slots) — clustering knobs only, results are
    bit-identical under any setting."""
    assert tile_t % LANES == 0, tile_t
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)
    C = np.asarray(C, np.float32)
    slot_src, nc, (m_aabb, m_tile, m_slot) = _cluster_slots(
        bvh, A.shape[0], tile_t, cut_tris=cut_tris, ids_map=ids_map,
        pack=pack)
    if nc * tile_t > MAX_SLOTS:
        raise PairsMeshTooLarge(
            f"mesh too large for the pairs kernel ({nc} tiles x {tile_t} "
            f"slots > {MAX_SLOTS}): the culling bitmask would exceed the "
            "SMEM budget at one ray block per cast — use traversal='pallas'"
        )
    f = fields_from_corners(A, B, C, slot_src, na=vna, nb=vnb, nc=vnc)
    if f.shape[1] > ST_SLOTS:
        # Streamed supertiles need (a) whole ST_SLOTS-wide field blocks and
        # (b) bitmask WORDS (32 tiles each) that align exactly with the
        # block boundaries — wps = ST_SLOTS/tile_t/32 whole words per
        # supertile.  A tile_t like 384 satisfies the %128 rule but makes
        # wps fractional: the kernel's supertile-local field offsets would
        # silently read the wrong triangles.
        if ST_SLOTS % (tile_t * 32):
            raise ValueError(
                f"tile_t={tile_t} cannot stream: ST_SLOTS ({ST_SLOTS}) "
                f"must be a whole number of 32-tile bitmask words, so "
                f"tile_t must divide {ST_SLOTS // 32} (use 128/256/512/"
                f"1024) for meshes past {ST_SLOTS} slots"
            )
        if f.shape[1] % ST_SLOTS:
            f = np.pad(f, ((0, 0), (0, ST_SLOTS - f.shape[1] % ST_SLOTS)))

    aabb = np.zeros((nc, 8), np.float32)
    for j in range(nc):
        ids = slot_src[j * tile_t : (j + 1) * tile_t]
        ids = ids[ids >= 0]
        pts = np.concatenate([A[ids], B[ids], C[ids]], axis=0)
        aabb[j, 0:3] = pts.min(axis=0)
        aabb[j, 3:6] = pts.max(axis=0)
    # Member boxes refit tightly from the triangles (matching the jitted
    # pose rebuild exactly, scene/transform._pairs_tables_jax).
    for m in range(m_aabb.shape[0]):
        ids = slot_src[m_slot == m]
        pts = np.concatenate([A[ids], B[ids], C[ids]], axis=0)
        m_aabb[m, 0:3] = pts.min(axis=0)
        m_aabb[m, 3:6] = pts.max(axis=0)
    return PairsMeshTables(
        fields=jnp.asarray(f),
        tile_aabb=jnp.asarray(aabb),
        slot_src=jnp.asarray(slot_src),
        member_aabb=jnp.asarray(m_aabb),
        member_tile=jnp.asarray(m_tile),
        member_slot=jnp.asarray(m_slot),
    )


def _ray_feature_rows(O: Vec3, u: Vec3, extra=(), pad: bool = True
                      ) -> jnp.ndarray:
    """(16, R) ray-feature ROWS: [u(3), w=O x u(3), O(3), extra..., 0-pad].

    Row-major on purpose: stacking (R,) components along axis 0 is a
    concatenation (full-bandwidth), while the (R, 16) column form is an
    interleave that XLA executes at row rate (~5 cycles/row — measured
    1.4-1.9 ms per 262k-ray cast).  The kernel transposes one (16, blk)
    block to (blk, 16) in VMEM per program instead.

    extra: up to 7 additional (R,) f32 rows (rows 9..15).  The compacted
    cast packs the per-ray cap / activity mask here so ONE minor-axis
    ``take`` moves every per-ray quantity at once (the kernel reads only
    columns 0-8; rows 9-15 are dead weight in its VMEM block).

    pad=False returns only the live rows (9 + len(extra)): the compacted
    cast's minor-axis take costs ~proportional to rows x C, so gathering
    the 5-7 all-zero pad rows was pure waste — callers take the live rows
    and zero-pad at C (a C-sized copy, bandwidth-cheap)."""
    w = O.cross(u)
    rows = [u.x, u.y, u.z, w.x, w.y, w.z, O.x, O.y, O.z, *extra]
    assert len(rows) <= NUM_RF_ROWS
    if pad:
        z = jnp.zeros_like(u.x)
        rows += [z] * (NUM_RF_ROWS - len(rows))
    return jnp.stack(rows, axis=0)


# de Bruijn sequence for in-kernel lowest-set-bit extraction (the scalar
# core walks bitmask words; ctz has no primitive, so (low * M) >> 27 indexes
# this 32-entry table).
_DEBRUIJN_M = np.int32(0x077CB531)
_DEBRUIJN_TABLE = np.zeros(32, np.int32)
for _i in range(32):
    _DEBRUIJN_TABLE[((((1 << _i) * 0x077CB531) & 0xFFFFFFFF) >> 27) & 31] = _i


def _pair_bits(O, u, aabb, nc, subg, blk, cap=None, active=None,
               members=None):
    """XLA-side culling to a packed per-subgroup active-tile bitmask.

    Returns (W, S) int32: bit j of word (w, sg) set iff tile 32w+j is
    active for subgroup sg.  Pure vector math — the previous front-packed
    pair lists needed an (S * nc)-row scatter that ran at row rate
    (~1.8 ms/cast); the kernel now walks the bits on the scalar core,
    which dual-issues with the VPU's pair math.

    active: optional (R,) bool — lanes whose result is provably unused
    (e.g. shadow rays whose direct term is zero because N.wl <= 0,
    global_launcher.cu:800-807) contribute no bits, so whole-subgroup
    inactivity skips all pair work for that subgroup.

    members: optional (member_aabb (nm, 8), member_tile (nm,)) — cull
    against per-cluster MEMBER boxes and OR per tile instead of the packed
    tile's union box.  Exact (every triangle is inside its member box) and
    strictly tighter: a bit can only clear.  The subgroup any-reduce runs
    at member level BEFORE the tile OR, so the extra cost is just the slab
    test over nm (vs nc) boxes plus a tiny (nm, S) row scatter-max.
    """
    R = O.x.shape[0]
    S = R // subg
    W = -(-nc // 32)
    if members is not None:
        boxes, member_tile = members
    else:
        boxes, member_tile = aabb, None
    nb = boxes.shape[0]
    # Batch the slab tests over boxes: the (nb, R) enter/hit intermediates
    # would otherwise reach GBs of HBM for big meshes (nb grows with the
    # mesh; R is the cast) — MB bounds the peak to (MB, R).
    MB = 512
    mi = jnp.zeros((nc, S), jnp.int32)
    for b0 in range(0, nb, MB):
        bs = boxes[b0 : b0 + MB]
        nbb = bs.shape[0]
        enter, _exit, hit = slab_enter_exit(O, u, bs, nbb)
        if cap is not None:
            hit = hit & (enter <= cap[None, :])
        if active is not None:
            hit = hit & active[None, :]
        h = hit.reshape(nbb, S, subg).any(axis=2).astype(jnp.int32)
        if member_tile is None:
            mi = mi.at[b0 : b0 + nbb].max(h)
        else:
            mi = mi.at[member_tile[b0 : b0 + nbb]].max(h)
    # Vectorized word packing: bit j of word w = tile 32w+j (mi is 0/1, so
    # the sum of distinct powers of two equals the OR; int32 wrap at bit 31
    # reproduces the sign bit exactly).
    pad = W * 32 - nc
    if pad:
        mi = jnp.pad(mi, ((0, pad), (0, 0)))
    sh = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(mi.reshape(W, 32, S) << sh[None, :, None], axis=1)


def _mt_tile(cols, tri_ref, off, eps_leaf, tile_t=TILE_T):
    """Moller-Trumbore for one (subg-ray, tile_t-tri) visit; returns
    (t_masked, orig_id_row).

    cols: the 9 ray-feature columns [u, w, O] ALREADY materialized as
    (subg, tile_t) broadcasts.  Extracting a (subg, 1) column from the
    (blk, 16) scratch is a lane-select that costs ~16 cycles per feature —
    at 9 features that was ~150 ns/visit, the entire measured per-visit
    cost (r3 probe: a visit doing only the 9 column extracts costs MORE
    than the full MT).  The caller hoists the extract+broadcast to
    per-subgroup scope (s_body), amortizing it over the subgroup's visits
    (mean ~3.1-3.4 on real wavefronts -> kernel -34%)."""
    ux, uy, uz, wx, wy, wz, Ox, Oy, Oz = cols
    tile = tri_ref[:, pl.ds(off, tile_t)]        # (NUM_FIELDS, tile_t)
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
    return jnp.where(valid, tval, INF), row(16), beta, gamma, row


def _pairs_kernel(eps_leaf, track_idx, subg, blk, nc, W, tile_t, n_st, wps,
                  payload, vpi, sgw,
                  bits_ref, summ_ref, dbj_ref, rfT_ref, tri_ref, *refs):
    """Bitmask-driven pair walk for one ray block.

    Streaming (n_st > 1): the field table exceeds the VMEM budget, so the
    grid gains a minor SUPERTILE axis — Pallas DMAs one ST_SLOTS-wide
    field block per (block, supertile) step (double-buffered across steps
    by the pipeline) while t_run/idx_run persist in scratch across the
    supertile sweep; init runs at st == 0, the epilogue at st == n_st-1,
    and the walk covers only that supertile's wps bitmask words.  This is
    the TPU form of "any mesh VRAM fits" (different-versions/array_bvh.cu):
    the mesh ceiling becomes HBM, at the cost of streaming the table past
    each ray block.

    The walk is two-level: per block the scalar core first scans SUMMARY
    words (bit g of summary word (w, s32) set iff subgroup 32*s32+g has any
    active tile in word w), then extracts that subgroup's tile bits — both
    with the de Bruijn trick — issuing one (subg, 128) Moller-Trumbore
    visit per active tile.  Empty subgroups (rays that miss the mesh, or
    masked-out shadow lanes) cost zero scalar iterations; the flat
    (subgroup x word) scan this replaces paid ~0.75 ms per sparse 262k-ray
    cast just iterating empty slots.  Scalar bookkeeping dual-issues under
    the VPU math.

    Scratch t_run (blk, 128) carries the per-(ray, lane) running min; the
    update is lexicographic on (t, original id) and the epilogue takes the
    min id among tied lanes, reproducing the reference's lowest-index
    tie-break (global_launcher.cu:268-278) for any visit order."""
    if payload:
        (t_ref, idx_ref, nx_ref, ny_ref, nz_ref,
         rf_s, t_run, idx_run, nx_run, ny_run, nz_run) = refs
    elif track_idx:
        t_ref, idx_ref, rf_s, t_run, idx_run = refs
        nx_ref = ny_ref = nz_ref = nx_run = ny_run = nz_run = None
    else:
        t_ref, rf_s, t_run = refs
        idx_ref = idx_run = None
        nx_ref = ny_ref = nz_ref = nx_run = ny_run = nz_run = None
    b = pl.program_id(0)
    st = pl.program_id(1) if n_st > 1 else 0
    n_sg = blk // subg

    def init():
        # one in-VMEM transpose per block: (16, blk) rows -> (blk, 16) cols
        rf_s[:] = rfT_ref[0].T
        t_run[:] = jnp.full((blk, tile_t), INF, jnp.float32)
        # idx_run is NOT initialized: every (ray, lane) slot with
        # t_run < INF was written by some visit, which wrote idx_run too;
        # the epilogue only reads idx_run where t_run < INF, so stale
        # scratch is never observed (saves a 2 MB fill per block).  Ids
        # are kept as f32 (exact: < 2^24) — the tile's id row is already
        # f32, so the visit update has no casts.

    if n_st == 1:
        init()
    else:
        pl.when(st == 0)(init)

    def _mt_payload(cols, tile):
        """One tile's MT result as a foldable (t, oid, n) triple."""
        off = pl.multiple_of(tile * tile_t, tile_t)
        t, oid, beta, gamma, row = _mt_tile(cols, tri_ref, off, eps_leaf,
                                            tile_t)
        n = None
        if payload == 1:   # geometric: Ng = field rows 0-2
            n = (row(0), row(1), row(2))
        elif payload == 2:  # smooth: Phong interpolation per visit
            # exact get_smooth_normal order (realtime_render.cu:221-245)
            alpha = 1.0 - beta - gamma
            n = tuple(
                row(17 + a) * alpha + row(20 + a) * beta
                + row(23 + a) * gamma
                for a in range(3)
            )
        return t, oid, n

    def visit(rows, cols, tiles):
        """Evaluate all `tiles` (vpi of them; duplicates allowed — the
        lexicographic fold is idempotent) and apply ONE running-min RMW.
        Multi-tile visits amortize the per-iteration serial costs (scalar
        walk, RMW issue) that dominate post-hoist: doubling the MT math in
        a visit was measured at +3.7% while the serial floor is ~60% of
        the per-pair cost."""
        if track_idx:
            t, oid, n = _mt_payload(cols, tiles[0])
            # lexicographic (t, original id): packed tiles are not visited
            # in ascending-id order, so equal-t ties must compare ids to
            # keep the reference's lowest-index winner
            # (global_launcher.cu:268-278)
            for tile in tiles[1:]:
                t2, oid2, n2 = _mt_payload(cols, tile)
                take2 = (t2 < t) | ((t2 == t) & (oid2 < oid))
                t = jnp.where(take2, t2, t)
                oid = jnp.where(take2, oid2, oid)
                if payload:
                    n = tuple(jnp.where(take2, b, a) for a, b in zip(n, n2))
            t_old = t_run[rows, :]
            i_old = idx_run[rows, :]
            upd = (t < t_old) | ((t == t_old) & (oid < i_old))
            t_run[rows, :] = jnp.where(upd, t, t_old)
            idx_run[rows, :] = jnp.where(upd, oid, i_old)
            if payload:
                nx_run[rows, :] = jnp.where(upd, n[0], nx_run[rows, :])
                ny_run[rows, :] = jnp.where(upd, n[1], ny_run[rows, :])
                nz_run[rows, :] = jnp.where(upd, n[2], nz_run[rows, :])
        else:
            t = _mt_payload(cols, tiles[0])[0]
            for tile in tiles[1:]:
                t = jnp.minimum(t, _mt_payload(cols, tile)[0])
            t_run[rows, :] = jnp.minimum(t_run[rows, :], t)

    n_s32 = -(-n_sg // 32)
    # Word range of this supertile (whole table when not streaming); the
    # visit's field offset is supertile-LOCAL.
    w_lo = st * wps if n_st > 1 else 0
    wps_k = W if n_st == 1 else wps  # words per supertile, static

    def hoist_cols(sg):
        """Materialize the 9 ray-feature columns as (subg, tile_t)
        broadcasts ONCE per subgroup — the per-visit lane-select
        extraction was the dominant kernel cost (see _mt_tile docstring;
        -34% measured)."""
        rows = pl.ds(sg * subg, subg)
        return rows, [
            jnp.broadcast_to(rf_s[rows, k : k + 1], (subg, tile_t))
            for k in range(9)
        ]

    def walk_word(word0, base, rows, cols):
        def cond(word):
            return word != 0

        def body(word):
            # extract up to vpi set bits; when fewer remain, repeat the
            # first tile (the visit fold is idempotent on duplicates)
            low = word & -word
            j1 = dbj_ref[((low * _DEBRUIJN_M) >> 27) & 31]
            rem = word & (word - 1)
            tiles = [base + j1]
            for _ in range(vpi - 1):
                low = rem & -rem
                jk = dbj_ref[((low * _DEBRUIJN_M) >> 27) & 31]
                tiles.append(base + jnp.where(rem != 0, jk, j1))
                rem = rem & (rem - 1)
            visit(rows, cols, tiles)
            return rem

        jax.lax.while_loop(cond, body, word0)

    def s_cond(sword):
        return sword != 0

    if sgw:
        # SUBGROUP-MAJOR walk: the summary is OR-reduced over this
        # supertile's words (one summary row per supertile), so the 9
        # feature broadcasts are paid once per ACTIVE SUBGROUP, not once
        # per (subgroup, word); the word sweep is a static unroll over the
        # supertile's wps word slots.  The LAST supertile may cover fewer
        # real words (fields pad to whole supertiles, bits do not):
        # out-of-range slots read a clamped index and mask to 0, so their
        # walk costs one scalar cond.  Word-empty sweeps likewise.
        def sw_body(s32, c):
            sword0 = summ_ref[st, b * n_s32 + s32]

            def s_body(sword):
                lows = sword & -sword
                g = dbj_ref[((lows * _DEBRUIJN_M) >> 27) & 31]
                sg = s32 * 32 + g
                rows, cols = hoist_cols(sg)
                for dw in range(wps_k):
                    if n_st == 1:
                        word0 = bits_ref[dw, b * n_sg + sg]
                    else:
                        wi = w_lo + dw
                        word0 = jnp.where(
                            wi < W,
                            bits_ref[jnp.minimum(wi, W - 1), b * n_sg + sg],
                            0,
                        )
                    walk_word(word0, dw * 32, rows, cols)
                return sword & (sword - 1)

            jax.lax.while_loop(s_cond, s_body, sword0)
            return c

        jax.lax.fori_loop(0, n_s32, sw_body, 0)
    else:
        def sw_body(i, c):
            w = w_lo + i // n_s32
            s32 = i - (i // n_s32) * n_s32
            sword0 = summ_ref[w, b * n_s32 + s32]

            def s_body(sword):
                lows = sword & -sword
                g = dbj_ref[((lows * _DEBRUIJN_M) >> 27) & 31]
                sg = s32 * 32 + g
                rows, cols = hoist_cols(sg)
                walk_word(bits_ref[w, b * n_sg + sg], (w - w_lo) * 32,
                          rows, cols)
                return sword & (sword - 1)

            jax.lax.while_loop(s_cond, s_body, sword0)
            return c

        if n_st == 1:
            n_words = W
        else:
            n_words = jnp.minimum(W - w_lo, wps)
        jax.lax.fori_loop(0, n_words * n_s32, sw_body, 0)

    def epilogue():
        for r in range(blk // LANES):
            sl = pl.ds(r * LANES, LANES)
            t_min = jnp.min(t_run[sl, :], axis=1)
            t_ref[r : r + 1, :] = t_min.reshape(1, LANES)
            if track_idx:
                win = (t_run[sl, :] == t_min[:, None]) & (t_run[sl, :] < INF)
                idxf = jnp.min(
                    jnp.where(win, idx_run[sl, :], float(_IDX_BIG)), axis=1
                )
                idx = idxf.astype(jnp.int32)
                idx_ref[r : r + 1, :] = (
                    jnp.where(idx == _IDX_BIG, 0, idx).reshape(1, LANES)
                )
                if payload:
                    # the (t, id)-winner lane is unique (ids are unique per
                    # slot), so a masked sum extracts its payload exactly;
                    # miss rays get (0,0,0), masked downstream by obj < 0
                    win2 = win & (idx_run[sl, :] == idxf[:, None])
                    for n_run, n_ref in ((nx_run, nx_ref), (ny_run, ny_ref),
                                         (nz_run, nz_ref)):
                        n = jnp.sum(
                            jnp.where(win2, n_run[sl, :], 0.0), axis=1)
                        n_ref[r : r + 1, :] = n.reshape(1, LANES)

    if n_st == 1:
        epilogue()
    else:
        pl.when(st == n_st - 1)(epilogue)


def _summary_words(bits, nb: int, n_sg: int) -> jnp.ndarray:
    """(W, S) subgroup words -> (W, nb*n_s32) summary words, packed PER
    BLOCK (bit g of summary (w, b*n_s32+s32) set iff subgroup 32*s32+g of
    block b has any active tile in word w).  Pure VPU shift/or math."""
    W = bits.shape[0]
    n_s32 = -(-n_sg // 32)
    nz = (bits != 0).astype(jnp.int32).reshape(W, nb, n_sg)
    pad = n_s32 * 32 - n_sg
    if pad:
        nz = jnp.pad(nz, ((0, 0), (0, 0), (0, pad)))
    nz = nz.reshape(W, nb, n_s32, 32)
    sh = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(nz << sh, axis=3).reshape(W, nb * n_s32)


@functools.partial(
    jax.jit,
    static_argnames=("eps_leaf", "track_idx", "subg", "blk", "nc",
                     "interpret", "tile_t", "payload", "vpi", "sgw"),
)
def _pairs_call(rfT, fields, bits, eps_leaf, track_idx, subg, blk, nc,
                interpret, tile_t=TILE_T, payload=0, vpi=1, sgw=0):
    R = rfT.shape[1]
    W = bits.shape[0]
    # Chunk the feature rows per block: a (16, blk) slice of (16, R) is 16
    # strided segments whose DMA is latency-bound (measured ~1 ms/cast);
    # (nb, 16, blk) makes each block's features one contiguous transfer.
    # The permute is major-dim only (minor stays blk) — full-bandwidth.
    rfT = jnp.moveaxis(rfT.reshape(16, R // blk, blk), 1, 0)
    cols = fields.shape[1]
    if cols <= ST_SLOTS:
        n_st, blk_cols, wps = 1, cols, W
        grid = (R // blk,)
        fields_map = lambda i, *_: (0, 0)
        ray_map = lambda i, *_: (i, 0, 0)
        out_map = lambda i, *_: (i, 0)
    else:
        # Streamed supertiles: one ST_SLOTS-wide field block per minor grid
        # step; t_run persists across the sweep (see _pairs_kernel).
        assert cols % ST_SLOTS == 0, cols
        n_st, blk_cols = cols // ST_SLOTS, ST_SLOTS
        wps = ST_SLOTS // tile_t // 32
        assert wps >= 1, (tile_t, ST_SLOTS)
        grid = (R // blk, n_st)
        fields_map = lambda i, st, *_: (0, st)
        ray_map = lambda i, st, *_: (i, 0, 0)
        out_map = lambda i, st, *_: (i, 0)
    if sgw:
        # Subgroup-major walk: one summary row per SUPERTILE (bit set iff
        # the subgroup has any active tile in any of that supertile's
        # words) — see _pairs_kernel.  The last supertile may cover fewer
        # than wps real words (fields are padded to whole supertiles,
        # bits are not): pad the summary reduction only.
        wpad = n_st * wps - W
        bp = jnp.pad(bits, ((0, wpad), (0, 0))) if wpad else bits
        anyw = jnp.any(bp.reshape(n_st, wps, bits.shape[1]) != 0,
                       axis=1).astype(jnp.int32)
        summ = _summary_words(anyw, R // blk, blk // subg)
    else:
        summ = _summary_words(bits, R // blk, blk // subg)
    out_specs = [
        pl.BlockSpec((blk // LANES, LANES), out_map,
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((R // LANES, LANES), jnp.float32)]
    scratch = [
        pltpu.VMEM((blk, 16), jnp.float32),
        pltpu.VMEM((blk, tile_t), jnp.float32),
    ]
    if track_idx:
        out_specs.append(
            pl.BlockSpec((blk // LANES, LANES), out_map,
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((R // LANES, LANES), jnp.int32))
    if payload:
        assert track_idx
        for _ in range(3):
            out_specs.append(
                pl.BlockSpec((blk // LANES, LANES), out_map,
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((R // LANES, LANES), jnp.float32))
    if track_idx:
        scratch.append(pltpu.VMEM((blk, tile_t), jnp.float32))
    if payload:
        for _ in range(3):
            scratch.append(pltpu.VMEM((blk, tile_t), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bitmask words + summary words + de Bruijn
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16, blk), ray_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_FIELDS, blk_cols), fields_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _pairs_kernel, eps_leaf, track_idx, subg, blk, nc, W, tile_t, n_st,
        wps, payload, vpi, sgw)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * len(grid))
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret, compiler_params=compiler_params,
    )(bits, summ, jnp.asarray(_DEBRUIJN_TABLE), rfT, fields)
    if payload:
        return tuple(o.reshape(-1) for o in out)
    if track_idx:
        return out[0].reshape(-1), out[1].reshape(-1)
    return out[0].reshape(-1)


def _members_of(tab: PairsMeshTables):
    """(member_aabb, member_tile) when present (older tables lack them)."""
    if tab.member_aabb is None or tab.member_tile is None:
        return None
    return tab.member_aabb, tab.member_tile


def _prep(O, u, cap, blk, active=None):
    R = O.x.shape[0]
    pad = (-R) % blk
    if pad:
        O = Vec3(*(jnp.pad(c, (0, pad)) for c in O))
        u = Vec3(*(jnp.pad(c, (0, pad), constant_values=1.0) for c in u))
        if cap is not None:
            cap = jnp.pad(cap, (0, pad))
        if active is not None:
            active = jnp.pad(active, (0, pad))  # False: pad lanes do no work
    return O, u, cap, active, R, pad


def _key_mode(nc: int, R: int) -> tuple[int, int]:
    """(mode, shift) for the packed (group_key << shift) | lane sort key.

    mode 2: key = first_tile * (nc+1) + last_tile — measured 1.56x fewer
      pairs than first-tile alone on real wavefronts (rays sharing BOTH
      endpoints of their active-tile span group together).
    mode 1: key = first_tile (fallback when the pairwise key + lane no
      longer fit an int32 — large meshes / huge casts).
    mode 0: compaction off (even the single key cannot fit).
    The inactive marker is the all-ones key of the mode, so inactive
    lanes sort behind every active ray."""
    for mode, bits in ((2, ((nc + 1) * (nc + 1) - 1).bit_length()),
                       (1, int(nc).bit_length())):
        shift = 31 - bits
        if shift >= 0 and R <= (1 << shift):
            return mode, shift
    return 0, 0


def _coarse_aabb(aabb, nc: int, g: int):
    """(ng, 8) union boxes of g consecutive tiles (edge-padded), for the
    compaction KEY only.  Tiles are packed in tree order (morton/pave), so
    consecutive tiles are spatially coherent and the unions stay tight.
    The coarse slab test is a conservative SUPERSET of per-tile activity
    (bigger boxes only add actives), so compaction stays exact under the
    same overflow-fallback rule — the compacted cast re-runs the exact
    per-tile culling on the C packed rays either way."""
    ng = -(-nc // g)
    a = jnp.asarray(aabb[:nc])
    if ng * g != nc:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (ng * g - nc, a.shape[1]))])
    a = a.reshape(ng, g, a.shape[1])
    return jnp.concatenate(
        [jnp.min(a[:, :, 0:3], axis=1), jnp.max(a[:, :, 3:6], axis=1),
         jnp.zeros((ng, a.shape[2] - 6), a.dtype)], axis=1), ng


def _compact_key(O, u, aabb, nc, cap, active, valid_n):
    """Grouped activity compaction, keying stage: the packed sort key and
    the active count.

    Split from the sort so callers can run ``lax.sort`` INSIDE the
    compact branch of their overflow ``lax.cond`` — cond *operands* are
    computed unconditionally, so a cast whose activity overflows the
    compact capacity (dense primary casts) would otherwise pay the full
    (R,) sort it never uses; the key + count here are the cheap coarse
    slab test plus a reduce, which both paths need anyway.

    Measured on real 512^2 wavefronts (PERF_NOTES.md r3): at depth >= 1
    only ~4-13% of rays have ANY active mesh tile, yet they are scattered
    so nearly every 16-ray subgroup pays the union of their visits —
    union/per-ray divergence reaches ~14x at depth >= 2.  This is the TPU
    form of the reference's free per-thread early exit (a CUDA thread
    whose ray misses the BVH root does no triangle work,
    optimized.cu:220-240): pack the active rays densely and group them by
    their first active tile, so subgroups share actual work.

    One int32 ``lax.sort`` of (key << 24) | lane does all of it:
    - key = first active tile id for active rays (groups them), nc for
      inactive rays (sorts them behind every active ray),
    - the low bits keep the sort stable and ARE the gather indices,
    - the tail beyond n_act is inactive lanes whose exact kernel result
      is the no-hit default (t=INF, idx=0, N=0) by construction, so a
      C-slot cast + scatter-back is EXACT whenever n_act <= C (the
      caller falls back to the full cast otherwise via lax.cond).

    Activity here is the cheap COARSE test (nc tile boxes); the compacted
    cast re-runs the exact member culling on C rays, so the bits the
    kernel walks are identical to the uncompacted cast's for those rays.

    The group key and the lane share an int32 with an adaptive split and
    key richness (_key_mode); _compact_ok gates callers when they cannot.
    valid_n: lanes >= valid_n are _prep padding — forced inactive so they
    never consume compact capacity.
    """
    enter, _exit, hit = slab_enter_exit(O, u, aabb, aabb.shape[0])
    if cap is not None:
        hit = hit & (enter <= cap[None, :])
    if active is not None:
        hit = hit & active[None, :]
    R = O.x.shape[0]
    mode, shift = _key_mode(nc, R)
    lane = jnp.arange(R, dtype=jnp.int32)
    # first/last active tile as iota min/max reduces: identical values to
    # argmax(hit) / nc-1-argmax(hit[::-1]) but WITHOUT materializing the
    # reversed (nc, R) matrix — the rev alone was 0.15 ms x 8 casts per
    # 512k group on the device trace (PERF_NOTES r4), and any(hit) falls
    # out of `last` for free.
    tid = jnp.arange(nc, dtype=jnp.int32)[:, None]
    last = jnp.max(jnp.where(hit, tid, np.int32(-1)), axis=0)
    act = (last >= 0) & (lane < valid_n)
    if mode == 2:
        first = jnp.min(jnp.where(hit, tid, np.int32(nc)), axis=0)
        key = first * np.int32(nc + 1) + last
        inactive = np.int32((nc + 1) * (nc + 1) - 1)
    else:
        key = jnp.min(jnp.where(hit, tid, np.int32(nc)), axis=0)
        inactive = np.int32(nc)
    key = jnp.where(act, key, inactive)
    skey = (key << shift) | lane
    return skey, jnp.sum(act.astype(jnp.int32)), shift


def _compact_sort(skey, C, shift):
    """Sorting stage of the compaction (run it inside the compact branch):
    source lane indices for the C-ray cast.

    is_stable=False: every skey is distinct (the low ``shift`` bits are
    the lane id), so the sorted sequence is unique and stability cannot
    change the result — but the default stable lowering co-sorts a hidden
    iota operand (s32[R] x2 through the sort network; device trace r4:
    0.50 ms/sort stable vs the key alone unstable)."""
    return jax.lax.sort(skey, is_stable=False)[:C] & np.int32(
        (1 << shift) - 1)


def _compact_src(O, u, aabb, nc, cap, active, C, valid_n):
    """Key + sort in one step (tests / non-cond callers)."""
    skey, n_act, shift = _compact_key(O, u, aabb, nc, cap, active, valid_n)
    return _compact_sort(skey, C, shift), n_act


def _compact_sorted_rows(skey, C, shift, O, u, extra=()):
    """Sort + source move in ONE ``lax.sort`` — kept as a measured
    NEGATIVE result (not used by the production path).  In isolation it
    wins (bench/compact_micro.py, 262k rays: key-only sort 1.14 ms +
    minor take 1.82 ms vs 9-operand sort 1.55 ms, and the (16, R) row
    stack is never built), but END-TO-END the headline dropped 146 ->
    119 Mray/s: the separate sort and take overlap with the coarse-bits
    compute and neighboring casts, while one fat multi-operand sort
    serializes the critical path.  skey's low ``shift`` bits are the
    lane id, so the sorted key column doubles as the scatter-back
    indices.

    Returns (src, rfC): the C source lanes and the (16, C) kernel
    feature block with rows [u(3), w=OxU(3), O(3), extra..., 0-pad]."""
    w = O.cross(u)
    rows = [u.x, u.y, u.z, w.x, w.y, w.z, O.x, O.y, O.z, *extra]
    assert len(rows) <= NUM_RF_ROWS
    srt = jax.lax.sort([skey, *rows], num_keys=1)
    src = srt[0][:C] & np.int32((1 << shift) - 1)
    cut = [r[:C] for r in srt[1:]]
    z = jnp.zeros((C,), jnp.float32)
    rfC = jnp.stack(cut + [z] * (NUM_RF_ROWS - len(cut)), axis=0)
    return src, rfC


def _compact_ok(compact: float, nc: int, R: int, blk: int) -> int:
    """Compact capacity C (rounded up to whole blocks), or 0 when
    compaction is off / inapplicable (key+lane must share an int32 —
    _key_mode; a capacity >= R would only add sort+gather for nothing)."""
    if not compact or not _key_mode(nc, R)[0]:
        return 0
    C = -(-int(R * compact) // blk) * blk
    return C if C < R else 0


def _compact_tiers(fractions, nc: int, R: int, blk: int) -> list:
    """Capacity ladder: the strictly-ascending list of valid tier
    capacities from the given fractions (order-insensitive; zeros,
    duplicates and capacities that fail _compact_ok drop out)."""
    tiers: list = []
    for f in sorted(float(x) for x in fractions if x):
        C = _compact_ok(f, nc, R, blk)
        if C and (not tiers or C > tiers[-1]):
            tiers.append(C)
    return tiers


def _ladder(tiers, n_act, path_compact, path_full):
    """Nest the capacity ladder's lax.conds innermost-first: try the
    tightest tier, fall to each wider tier on overflow, full width last.
    Only the selected branch executes (cond semantics), so unused wide
    tiers cost compile time, never run time."""
    tail = path_full
    for Ccap in reversed(tiers[1:]):
        tail = (lambda Ccap, nxt: lambda _: jax.lax.cond(
            n_act <= Ccap, path_compact(Ccap), nxt, None))(Ccap, tail)
    return jax.lax.cond(n_act <= tiers[0], path_compact(tiers[0]),
                        tail, None)


def smem_ray_cap(nc: int, subg: int, blk: int) -> int:
    """Largest per-call ray count whose (W, R/subg) culling bitmask fits
    the known-good SMEM budget (SMEM_WORDS words), rounded to whole
    kernel blocks.  The render pipeline applies this at the cast level
    (render/pipeline.trace_chunked); the entry points below also enforce
    it so DIRECT callers can't overflow SMEM on big meshes."""
    W = -(-nc // 32)
    return max(blk, SMEM_WORDS * subg // W // blk * blk)


def _chunked(R: int, cap_rays: int, fn):
    """Run fn(lo, hi) over ray slices of at most cap_rays, concat results."""
    if R <= cap_rays:
        return fn(0, R)
    outs = [fn(lo, min(lo + cap_rays, R)) for lo in range(0, R, cap_rays)]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)


# VMEM working budget for one kernel program (v5e VMEM is 16 MiB; leave
# headroom for outputs, the (1, 16, blk) ray block and pipeline slack).
_VMEM_BUDGET = 14 * 2**20


def _blk_cap(nc: int, subg: int, blk: int, tile_t: int, n_scr: int,
             cols: int) -> int:
    """Shrink the kernel block (by halving — preserves LANES multiples and
    divides the original, so _prep padding stays valid) until

    - the per-call culling bitmask of ONE block fits the SMEM budget:
      W words x (blk/subg) subgroups <= SMEM_WORDS (a chunk is never
      smaller than a block, so this is the binding constraint for huge
      meshes at non-default pairs_block), and
    - the (blk, tile_t) running-min scratches (n_scr of them: t / +idx /
      +3 normal payloads) plus the VMEM-resident or double-buffered
      streamed field block fit _VMEM_BUDGET (fat pairs_tile values with
      the payload path would otherwise exceed VMEM at the default block).
    """
    W = -(-nc // 32)
    smem_cap = SMEM_WORDS * subg // W
    streaming = cols > ST_SLOTS
    fb = (2 if streaming else 1) * NUM_FIELDS * min(cols, ST_SLOTS) * 4
    vmem_cap = (_VMEM_BUDGET - fb) // (4 * (16 + n_scr * tile_t))
    while blk > LANES and (blk > smem_cap or blk > vmem_cap):
        blk //= 2
    if blk > smem_cap:
        raise PairsMeshTooLarge(
            f"one {blk}-ray block's culling bitmask ({W} words x "
            f"{blk // subg} subgroups) exceeds the SMEM budget "
            f"({SMEM_WORDS} words) — use traversal='pallas'"
        )
    return blk


def intersect_tris_pairs(
    O: Vec3,
    u: Vec3,
    tab: PairsMeshTables,
    eps_leaf: float,
    cap=None,
    interpret: bool = False,
    subg: int = DEF_SUBG,
    blk: int = DEF_BLK,
    payload: str | None = None,
    vpi: int = DEF_VPI,
    sgw: int = DEF_SGW,
    compact: float = 0.0,
    compact2: float = 0.0,
    compact3: float = 0.0,
    key_coarse: int = 1,
):
    """Closest hit over the cluster-tiled mesh.  Returns TriHit with the
    ORIGINAL (BVH-order) triangle index — drop-in compatible with the
    pallas mode's winner recovery (normals, barycentrics).

    payload: None | 'geom' | 'smooth' — when set, the kernel ALSO tracks
    the winner's normal per visit (geometric Ng, or the Phong-interpolated
    vertex normal from field rows 17-25) and the return becomes
    (TriHit, N Vec3, unnormalized).  This exists because any post-kernel
    per-winner recovery consumes (R, k<128)-column slices that XLA
    executes at the row-rate wall (~9 ms/cast measured for the smooth
    path at 480k rays); in-kernel the data is already in VMEM in visit
    layout and the tracking is a few elementwise ops.

    compact: fraction of R to cast after grouped activity compaction
    (_compact_src); 0 disables.  Exact for every scene: when the active
    count exceeds the capacity, a lax.cond falls back to the full cast."""
    nc = tab.tile_aabb.shape[0]
    pcode = {None: 0, "geom": 1, "smooth": 2}[payload]
    blk = _blk_cap(nc, subg, blk, tile_width(tab), 5 if pcode else 2,
                   tab.fields.shape[1])
    O, u, cap, _, R, pad = _prep(O, u, cap, blk)

    def cast_rows(rfTv, Ov, uv, capv):
        def one(lo, hi):
            sl = slice(lo, hi)
            Oc = Vec3(Ov.x[sl], Ov.y[sl], Ov.z[sl])
            uc = Vec3(uv.x[sl], uv.y[sl], uv.z[sl])
            bits = _pair_bits(Oc, uc, tab.tile_aabb, nc, subg, blk,
                              cap=None if capv is None else capv[sl],
                              members=_members_of(tab))
            return _pairs_call(
                rfTv[:, sl], tab.fields, bits, float(eps_leaf), True, subg,
                blk, nc, interpret, tile_width(tab), pcode, vpi, sgw
            )

        return _chunked(Ov.x.shape[0], smem_ray_cap(nc, subg, blk), one)

    def cast(Ov, uv, capv):
        return cast_rows(_ray_feature_rows(Ov, uv), Ov, uv, capv)

    Rp = O.x.shape[0]
    # Key-fit gate on the COARSE tile count actually keyed (key_coarse > 1
    # shrinks the key domain, so big meshes whose exact pairwise key
    # overflows int32 can still compact on the coarse key).
    knc = nc if key_coarse <= 1 else -(-nc // key_coarse)
    tiers = _compact_tiers((compact, compact2, compact3), knc, Rp, blk)
    C = tiers[0] if tiers else 0
    if C:
        kaabb = tab.tile_aabb if key_coarse <= 1 else \
            _coarse_aabb(tab.tile_aabb, nc, key_coarse)[0]
        skey, n_act, shift = _compact_key(O, u, kaabb, knc, cap,
                                          None, R)
        n_out = 5 if pcode else 2

        def path_compact(Ccap):
            # ONE minor-axis take moves every per-ray quantity (cap rides
            # as feature row 9): measured 3.1x cheaper than seven flat
            # gathers (bench/compact_micro.py).  The seemingly-better
            # fused form (_compact_sorted_rows: feature rows as sort
            # operands) measured FASTER in isolation but 19% slower
            # end-to-end — the separate sort/take overlap with the bits
            # compute; one fat sort serializes the critical path.
            def path(_):
                src = _compact_sort(skey, Ccap, shift)
                # take only the LIVE rows (9 or 10): the minor-axis take
                # costs ~rows x C, so the 6-7 zero pad rows were ~40% of
                # the move; re-pad to 16 at C (a cheap C-sized copy)
                rfT = _ray_feature_rows(
                    O, u, () if cap is None else (cap,), pad=False)
                nr = rfT.shape[0]
                rf = jnp.take(rfT, src, axis=1)
                rf = jnp.pad(rf, ((0, NUM_RF_ROWS - nr), (0, 0)))
                Oc = Vec3(rf[6], rf[7], rf[8])
                uc = Vec3(rf[0], rf[1], rf[2])
                out_s = cast_rows(rf, Oc, uc,
                                  None if cap is None else rf[9])
                # no-hit defaults (the exact kernel output for rays with
                # no active tiles): t=INF, idx=0, N=(0,0,0).  Five ROW
                # scatters on purpose: a fused (n_out, C) -> (n_out, R)
                # axis-1 scatter measured 195.3 -> 170.8 Mray/s headline
                # (multi-dim scatter lowers far worse than n_out flat
                # row scatters — PERF_NOTES r4).
                defaults = [jnp.full((Rp,), INF, jnp.float32),
                            jnp.zeros((Rp,), jnp.int32)] + [
                    jnp.zeros((Rp,), jnp.float32)] * (n_out - 2)
                return tuple(defaults[i].at[src].set(out_s[i])
                             for i in range(n_out))

            return path

        path_full = lambda _: tuple(cast(O, u, cap))[:n_out]
        # capacity ladder: tight tier (deep casts) -> mid tier (the
        # 11.5-14%-active d1 casts at 512k chunks) -> wide tier (the
        # same casts at resolutions whose activity runs 15-18%, e.g.
        # 800x600) -> full width, nested conds innermost-first
        out = _ladder(tiers, n_act, path_compact, path_full)
    else:
        out = cast(O, u, cap)
    if pad:
        out = tuple(o[:R] for o in out)
    t, idx = out[0], out[1]
    z = jnp.zeros_like(t)
    hit = TriHit(t=t, idx=idx, beta=z, gamma=z)
    if pcode:
        return hit, Vec3(out[2], out[3], out[4])
    return hit


def intersect_tris_pairs_shadow(
    O: Vec3,
    u: Vec3,
    tab: PairsMeshTables,
    eps_leaf: float,
    cap=None,
    interpret: bool = False,
    subg: int = DEF_SUBG,
    blk: int = DEF_BLK,
    active=None,
    vpi: int = DEF_VPI,
    sgw: int = DEF_SGW,
    compact: float = 0.0,
    compact2: float = 0.0,
    compact3: float = 0.0,
    key_coarse: int = 1,
):
    """Nearest mesh hit distance only (occlusion query; the reference's
    shadow test needs any hit with t^2 <= |L-P|^2,
    global_launcher.cu:795-799 — ``cap`` culls tiles beyond the light).

    active: optional (R,) bool — lanes whose occlusion result is unused
    (the integrator's direct term is exactly zero) contribute no pair
    work and return INF.

    compact: fraction of R to cast after grouped activity compaction
    (_compact_src; ``active`` folds into the activity mask); 0 disables.
    Exact: overflow falls back to the full cast via lax.cond."""
    nc = tab.tile_aabb.shape[0]
    blk = _blk_cap(nc, subg, blk, tile_width(tab), 1, tab.fields.shape[1])
    O, u, cap, active, R, pad = _prep(O, u, cap, blk, active)

    def cast_rows(rfTv, Ov, uv, capv, actv):
        def one(lo, hi):
            sl = slice(lo, hi)
            Oc = Vec3(Ov.x[sl], Ov.y[sl], Ov.z[sl])
            uc = Vec3(uv.x[sl], uv.y[sl], uv.z[sl])
            bits = _pair_bits(Oc, uc, tab.tile_aabb, nc, subg, blk,
                              cap=None if capv is None else capv[sl],
                              active=None if actv is None else actv[sl],
                              members=_members_of(tab))
            return _pairs_call(
                rfTv[:, sl], tab.fields, bits, float(eps_leaf), False,
                subg, blk, nc, interpret, tile_width(tab), 0, vpi, sgw
            )

        return _chunked(Ov.x.shape[0], smem_ray_cap(nc, subg, blk), one)

    def cast(Ov, uv, capv, actv):
        return cast_rows(_ray_feature_rows(Ov, uv), Ov, uv, capv, actv)

    Rp = O.x.shape[0]
    # coarse-count key-fit gate — see intersect_tris_pairs
    knc = nc if key_coarse <= 1 else -(-nc // key_coarse)
    tiers = _compact_tiers((compact, compact2, compact3), knc, Rp, blk)
    C = tiers[0] if tiers else 0
    if C:
        kaabb = tab.tile_aabb if key_coarse <= 1 else \
            _coarse_aabb(tab.tile_aabb, nc, key_coarse)[0]
        skey, n_act, shift = _compact_key(O, u, kaabb, knc, cap,
                                          active, R)

        def path_compact(Ccap):
            # Row-form source move (see intersect_tris_pairs): cap rides
            # as feature row 9, the shadow relevance mask as row 10, so
            # the whole per-ray state crosses in ONE (16, R)->(16, C)
            # take instead of six flat gathers.  (The fused sort-operand
            # form measured slower end-to-end — see the closest path.)
            def path(_):
                extra = (jnp.zeros_like(O.x) if cap is None else cap,)
                if active is not None:
                    extra += (active.astype(jnp.float32),)
                src = _compact_sort(skey, Ccap, shift)
                # live rows only (10-11 of 16) — see the closest path
                rfT = _ray_feature_rows(O, u, extra, pad=False)
                nr = rfT.shape[0]
                rf = jnp.take(rfT, src, axis=1)
                rf = jnp.pad(rf, ((0, NUM_RF_ROWS - nr), (0, 0)))
                Oc = Vec3(rf[6], rf[7], rf[8])
                uc = Vec3(rf[0], rf[1], rf[2])
                t_s = cast_rows(rf, Oc, uc,
                                None if cap is None else rf[9],
                                None if active is None else rf[10] > 0.5)
                return jnp.full((Rp,), INF, jnp.float32).at[src].set(t_s)

            return path

        path_full = lambda _: cast(O, u, cap, active)
        t = _ladder(tiers, n_act, path_compact, path_full)
    else:
        t = cast(O, u, cap, active)
    return t[:R] if pad else t
