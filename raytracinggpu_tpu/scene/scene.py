"""Scene device tables and static render configuration.

The reference hardcodes the scene inside kernels as an array of polymorphic
``Geometry*`` (Scene, global_launcher.cu:841-846) constructed in
``KernelInit<<<1,1>>>`` (global_launcher.cu:848-881).  The TPU design replaces
virtual dispatch with *typed SoA tables* — one sphere table, one triangle-mesh
table — plus a materials table indexed by object id.  ``intersect_all``
becomes two batched intersection passes merged with a min-t select
(semantics of Scene::intersect_all, global_launcher.cu:716-736; object ids
are assigned in insertion order, spheres 0..S-1 then the mesh at id S, same
as the reference's addObject ordering).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.sphere import SphereTable
from raytracinggpu_tpu.ops.triangle import TriTables, build_tri_tables
from raytracinggpu_tpu.scene.mesh import MeshData


class Materials(NamedTuple):
    """Per-object material columns, indexed by object id (Geometry fields
    albedo/mirror/in_refraction_index/out_refraction_index,
    global_launcher.cu:101-113)."""

    albedo: Vec3        # (M,)
    mirror: jnp.ndarray  # (M,) bool
    in_ri: jnp.ndarray   # (M,)
    out_ri: jnp.ndarray  # (M,)


class BVHTables(NamedTuple):
    """Device copy of the flat BVH (SoA per field + preorder skip links)."""

    left: jnp.ndarray
    right: jnp.ndarray
    tri_start: jnp.ndarray
    tri_end: jnp.ndarray
    skip: jnp.ndarray
    mn: Vec3
    mx: Vec3


class SceneTables(NamedTuple):
    """Everything the integrator needs on device (a single pytree)."""

    spheres: SphereTable
    materials: Materials
    mesh: TriTables | None
    bvh: BVHTables | None
    pallas_mesh: Any  # PallasMeshTables | None (fused-kernel tables)
    pairs_mesh: Any   # PairsMeshTables | None (cluster-tiled pair kernel)
    L: Vec3          # point light position (scalars)
    intensity: Any   # light intensity (scalar)
    mesh_src: Any = None  # MeshSource | None — BVH-ordered base vertices so
                          # scene/transform.pose_mesh can rebuild every mesh
                          # table in-jit (animated mesh poses)


@dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) parameters of one reference launcher config —
    the per-variant deltas of SURVEY.md §2.7."""

    name: str = "global"
    width: int = 512
    height: int = 512
    spp: int = 32
    max_depth: int = 5          # CLI <num_bounces>
    sigma: float = 0.2          # AA jitter (0 in cpu_launcher.cpp:704)
    eps_bounce: float = 1e-4    # bounce offset (1e-3 CPU, cpu_launcher.cpp:575)
    eps_leaf: float = 1e-4      # mesh leaf t epsilon (see ops/triangle.py)
    fov: float = float(np.pi / 3)
    camera_c: tuple = (0.0, 0.0, 55.0)
    smooth_normals: bool = False   # realtime-only Phong normals
    camera_point_quirk: bool = False  # realtime adds cam.C into the direction
    n_objects: int = 7
    mesh_object_id: int = 6     # -1 when the scene has no mesh
    traversal: str = "pairs"    # pairs (production) | pallas | dense | bvh
                                # — the pair-compaction kernel wins every
                                # measured workload (PERF_NOTES.md), so the
                                # compaction path is the default the north
                                # star asks for; dense/bvh are oracles
    ray_sort: bool = False      # sort rays into beam families before the
                                # pallas kernel (ablation mode; see
                                # ops/pallas_trace.ray_sort_key — for the cat
                                # scene mesh-local bounce rays legitimately
                                # span many tiles, so sorting currently costs
                                # more than it saves)
    ray_chunk: int = 65536      # rays per inner chunk (memory control)
    spp_fuse: int = 4           # samples folded into one wavefront (the
                                # sample loop runs in groups of this size;
                                # bigger groups = larger ray batches per
                                # kernel dispatch, more VPU work in flight)
    tri_block: int = 512        # triangle block for the dense scan
    pallas_subgroup: int = 64   # rays per culling subgroup in the pallas
                                # kernel (32/64/128 — union-vs-overhead
                                # ablation axis, see ops/pallas_trace.SUBG)
    pairs_subgroup: int = 64    # rays per culling subgroup in the pairs
                                # kernel (8-128).  WITHOUT compaction
                                # unions tighten as it shrinks and s16
                                # wins; WITH the default grouped
                                # compaction neighbors are coherent, the
                                # union no longer doubles with scope, and
                                # the optimum keeps moving up as grouping
                                # improves: s32 won at the single-tier
                                # point (125.1), s64 wins under the
                                # two-tier ladder + unrolled depth scan
                                # (188.8 vs 185.2 Mray/s headline; also
                                # fastest on both realtime rows); s128
                                # reverses (184.7, vreg pressure of the
                                # hoisted broadcasts) — PERF_NOTES.md
    pairs_block: int = 4096     # rays per pairs-kernel program
    pairs_sgw: int = 1          # pairs-kernel walk order: 1 subgroup-major
                                # (ray-feature broadcasts hoist once per
                                # subgroup; measured +5.7% on the headline
                                # wavefront mix), 0 word-major (the r2
                                # form) — ops/pairs_trace.DEF_SGW
    pairs_tile: int = 128       # triangles per packed tile (multiple of
                                # 128).  Fat tiles cut the number of
                                # scalar-walk visits (the measured kernel
                                # bottleneck) at the cost of nearly-free
                                # extra VPU math per visit; culling stays
                                # cluster-granular via member boxes
                                # (ops/pairs_trace.build_pairs_tables)
    pairs_cluster: str = "ref"  # cluster TREE for the pairs tables: 'ref'
                                # cuts the reference midpoint-split BVH,
                                # 'sah' cuts an auxiliary binned-SAH build
                                # (accel/sah.py) — tighter subtree boxes,
                                # measured ~10% fewer pairs on real
                                # wavefronts.  Pure perf knob: slot ids
                                # stay in canonical mesh order, results
                                # are bit-identical (ops/pairs_trace)
    pairs_cut: int = 0          # cluster-cut granularity (member-box
                                # tightness); 0 = min(pairs_tile, 128)
    pairs_pack: str = "morton"  # tile packing: 'morton' first-fit of whole
                                # clusters, 'pave' consecutive tree-order
                                # chunks at 100% occupancy (merging tiles
                                # only clears activation bits, so paving
                                # minimizes pair count for a given order)
    pairs_compact: float = 0.078125  # grouped activity compaction: cast
                                # only ~this fraction of rays per mesh
                                # cast, packing rays with any active tile
                                # densely and grouped by first tile (one
                                # int32 lax.sort).  At depth >= 1 only
                                # ~4-13% of rays touch the mesh but union
                                # divergence makes every subgroup pay
                                # (~14x at d>=2, PERF_NOTES.md) — the TPU
                                # form of the reference's free per-thread
                                # early-out.  Exact for any scene
                                # (lax.cond falls back on overflow);
                                # 0 = off.  5/64 is the measured tier-1
                                # optimum at 512k chunks under the
                                # two-tier ladder (173.4 Mray/s; the
                                # deep casts run 4-8% active); casts that
                                # overflow fall to the pairs_compact2
                                # tier, then to full width
    pairs_compact2: float = 0.1328125  # second-tier compact capacity
                                # (the ladder): casts too active for the
                                # tight tier — the d1 closest+shadow
                                # casts run 11.5-14% active — still
                                # compact at this fraction instead of
                                # paying the full-width kernel.  Must
                                # exceed pairs_compact to engage; 0
                                # disables the second tier.  Exactness
                                # is unchanged (nested lax.cond, same
                                # overflow rule).  TIER WIDTH IS THE
                                # WHOLE GAME: c2=0.25 measured -4%
                                # headline (sort+take at 2.7x tier-1
                                # capacity cost more than the kernel
                                # shrink saved) while 17/128 — riding
                                # ~2% above the d1 cast's activity —
                                # measures +13% (153.8 -> 174.2 with the
                                # tier-1 re-tune; realtime/config-5
                                # neutral).  A cast past BOTH tiers
                                # falls to full width, so a scene whose
                                # activity tops the tier loses speed,
                                # never correctness
    pairs_compact3: float = 0.1875  # third-tier compact capacity
                                # (24/128).  The d1 casts' activity is
                                # RESOLUTION-dependent: 13.0% of rays at
                                # 512^2 (fits tier 2) but 17.2% at
                                # 800x600 — past both narrower tiers, so
                                # before this rung the metric's own
                                # stated resolution fell to the 9.5 ms
                                # full-width cast and ran 156-182 Mray/s
                                # vs 226 at 512^2.  With it: 212 Mray/s
                                # at 800x600, 512^2 unchanged (an unused
                                # rung costs compile time only — lax.cond
                                # executes one branch).  Same exactness
                                # rule (overflow falls to full width)
    pairs_key_coarse: int = 1   # compaction-key granularity: group this
                                # many consecutive (tree-order) tiles into
                                # one union box for the KEY's coarse slab
                                # test, shrinking the full-width (nc, R)
                                # slab — the dominant per-cast compaction
                                # cost — by the same factor.  Activity
                                # becomes a conservative SUPERSET (bigger
                                # boxes only add actives), so exactness
                                # is unchanged (same overflow-fallback
                                # rule; the compacted cast re-runs exact
                                # per-tile culling), but tier capacities
                                # must absorb the inflation.  1 = exact
                                # per-tile key
    pairs_compact_d0: float = 0.0  # compact capacity for the depths BELOW
                                # pairs_compact_min_depth (the d0 casts),
                                # applied only when the depth loop is
                                # statically unrolled.  The d0 casts run
                                # ~14-15% active (73k/78k per 512k chunk
                                # on the headline wavefronts) — past both
                                # shared ladder tiers, but a d0-OWN tier
                                # sized just above that (e.g. 20/128)
                                # still shrinks the kernel 6.4x and its
                                # R-proportional fixed costs (INF fill,
                                # epilogue, transpose/DMA) without
                                # inflating the deep casts' sort/take.
                                # 0 = d0 casts run full width (no key
                                # build, no cond).  Exact either way
                                # (same overflow fallback rule)
    pairs_subgroup_d0: int = 0  # subgroup override for the depths BELOW
                                # pairs_compact_min_depth (the full-width
                                # d0 casts), applied only when the depth
                                # loop is statically unrolled.  Primary
                                # rays are image-ordered and coherent, so
                                # their per-subgroup unions stay tight at
                                # any width while the per-visit fixed
                                # costs (17 tile-row reads, walk, RMW)
                                # halve with each doubling; deep casts
                                # reverse (vreg pressure).  0 = use
                                # pairs_subgroup everywhere
    pairs_compact_min_depth: int = 1  # first depth whose casts run the
                                # compaction machinery, applied only when
                                # the depth loop is statically unrolled
                                # (depth_unroll >= max_depth).  The d0
                                # casts' activity (~14-15% per 512k chunk
                                # on the headline wavefronts) overflows
                                # both ladder tiers, so they always fall
                                # back to full width — yet the rolled
                                # loop pays their key build + cond
                                # (+~1 ms per chunk, measured r3).  0
                                # compacts every depth (the rolled-scan
                                # behavior); results are bit-identical
                                # either way (compaction is exact)
    pairs_chunk: int = 524288   # rays per cast in pairs mode (the culling
                                # bitmask costs ceil(n_tiles/32) * (R/subg)
                                # * 4 bytes of SMEM; trace_chunked shrinks
                                # casts for meshes past the SMEM budget).
                                # 512k is the measured optimum on the
                                # headline mix (145.9 vs 125.5 at 262k,
                                # 137 at 64k/1M): bigger casts average the
                                # per-chunk activity so more casts fit the
                                # f125 compact capacity (d1 closest at 13%
                                # overflows a 262k chunk's C), and the
                                # per-cast op floors amortize
    bvh_node_layout: str = "soa"  # node layout for traversal mode 'bvh':
                                # per-field SoA columns vs the reference's
                                # 10-float AoS record row-gathered per step
                                # ('aos10', optimized.cu:512-534) — the
                                # node-layout/gather ablation (SURVEY §2.11)
    bvh_max_leaf: int = 96      # static leaf-unroll bound for traversal
                                # mode 'bvh' (degenerate midpoint partitions
                                # can leave big leaves; the cat's worst is
                                # 73 — build_scene_tables warns when a mesh
                                # exceeds this; the lbvh builder's leaves
                                # are < 5 triangles by construction)
    depth_unroll: int = field(
        default_factory=lambda: int(os.environ.get("RT_DEPTH_UNROLL", "8")))
                                # lax.scan unroll factor for the depth
                                # loop (integrator/wavefront.trace),
                                # clamped to max_depth.  The scan
                                # back-edge is a sequential barrier:
                                # shadow(d) and closest(d+1) are data-
                                # independent but cannot pipeline across
                                # it; unrolling hands XLA the whole depth
                                # program so neighboring casts' glue ops
                                # (compaction key/sort/take/scatter)
                                # overlap the pairs kernel.  Measured
                                # +8.5% headline (170.7 -> 185.2 Mray/s
                                # at unroll=5; unroll=3 captures nearly
                                # all of it), -7% config-5 frame time.
                                # Trade: compile time grows with the
                                # unrolled body; 8 covers every standard
                                # workload depth while keeping the d10
                                # sweep cells bounded.  RT_DEPTH_UNROLL
                                # overrides the default (perf-only knob,
                                # results are bit-identical by
                                # construction — tests pin it to 1 so
                                # the CPU suite's hundreds of compiles
                                # stay fast; test_wavefront asserts the
                                # unrolled path's equivalence)
    spp_unroll: int = 1         # unroll factor for the sample-group scan
                                # (render/pipeline.render_rows).  Same
                                # mechanism as depth_unroll one level up:
                                # the group scan's back-edge is a hard
                                # barrier, so group k's cheap deep-cast
                                # tail could never overlap group k+1's
                                # full-width d0 casts.  Bit-identical by
                                # construction (the scan body is
                                # unchanged); costs compile time
    chunk_unroll: int = 1       # unroll bound for the ray-chunk loop
                                # (render/pipeline.trace_chunked): when
                                # the frame splits into <= this many
                                # chunks, run them as straight-line code
                                # instead of lax.map — chunk k's deep
                                # glue then overlaps chunk k+1's coherent
                                # d0 kernels across the old map barrier.
                                # Bit-identical; costs compile time
    mxu_precision: str = "highest"  # highest | default (bf16 fast path)
    animate_mesh: bool = False  # realtime loop: spin the mesh via the jitted
                                # pose transform (scene/transform.py) — the
                                # reference's dead transform path, wired

    @property
    def has_mesh(self) -> bool:
        return self.mesh_object_id >= 0

    @property
    def precision(self):
        return (
            jax.lax.Precision.HIGHEST
            if self.mxu_precision == "highest"
            else jax.lax.Precision.DEFAULT
        )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_scene_tables(
    spheres: list,
    materials: list,
    L,
    intensity: float,
    mesh: MeshData | None,
    mesh_albedo=(0.25, 0.25, 0.25),
    tri_block: int = 512,
    pairs_tile: int = 128,
    pairs_cluster: str = "ref",
    pairs_cut: int = 0,
    pairs_pack: str = "morton",
) -> SceneTables:
    """Assemble device tables from host data.

    spheres: list of (center(3,), radius); materials: matching list of
    (albedo(3,), mirror, in_ri, out_ri).  The mesh (diffuse, albedo 0.25,
    global_launcher.cu:866) is appended as the last object id.
    """
    mats = list(materials)
    if mesh is not None:
        mats.append((mesh_albedo, False, 1.0, 1.0))
    alb = np.array([m[0] for m in mats], np.float32)
    mirror = np.array([m[1] for m in mats], bool)
    in_ri = np.array([m[2] for m in mats], np.float32)
    out_ri = np.array([m[3] for m in mats], np.float32)

    mesh_tables = None
    bvh_tables = None
    pallas_tables = None
    pairs_tables = None
    mesh_src = None
    if mesh is not None:
        pad_to = _round_up(mesh.n_tri, tri_block)
        mesh_tables = build_tri_tables(
            mesh.A, mesh.B, mesh.C, mesh.na, mesh.nb, mesh.nc, pad_to=pad_to
        )
        from raytracinggpu_tpu.ops.pallas_trace import build_pallas_tables

        pallas_tables = build_pallas_tables(mesh.A, mesh.B, mesh.C, pad_to=pad_to)
        from raytracinggpu_tpu.ops.pairs_trace import build_pairs_tables

        from raytracinggpu_tpu.ops.pairs_trace import PairsMeshTooLarge

        cl_tree, ids_map = mesh.bvh, None
        if pairs_cluster == "sah":
            from raytracinggpu_tpu.accel.sah import build_sah_bvh

            cl_tree = build_sah_bvh(mesh.A, mesh.B, mesh.C)
            ids_map = cl_tree.order
        try:
            pairs_tables = build_pairs_tables(
                mesh.A, mesh.B, mesh.C, cl_tree, tile_t=pairs_tile,
                vna=mesh.na, vnb=mesh.nb, vnc=mesh.nc,
                cut_tris=pairs_cut or None, ids_map=ids_map,
                pack=pairs_pack)
        except PairsMeshTooLarge as e:
            # Mesh exceeds the pairs kernel's cluster budget; the integrator
            # falls back to the pallas tile kernel when pairs_mesh is None
            # (integrator/wavefront._effective_traversal), so a big custom
            # --obj still renders instead of crashing at scene build.
            import warnings

            warnings.warn(
                f"pairs kernel unavailable for this mesh ({e}); "
                "traversal='pairs' will fall back to 'pallas'",
                stacklevel=2,
            )
            pairs_tables = None
        from raytracinggpu_tpu.scene.transform import build_mesh_source

        mesh_src = build_mesh_source(mesh, pad_to)
        b = mesh.bvh
        leaves = b.right == -1
        max_leaf = int((b.tri_end - b.tri_start)[leaves].max())
        default_max_leaf = RenderConfig.__dataclass_fields__[
            "bvh_max_leaf"].default
        if max_leaf > default_max_leaf:
            import warnings

            warnings.warn(
                f"BVH has a {max_leaf}-triangle leaf (> the default "
                f"bvh_max_leaf={default_max_leaf}): traversal='bvh' would "
                "skip triangles — "
                "raise RenderConfig.bvh_max_leaf or use builder='lbvh'",
                stacklevel=2,
            )
        bvh_tables = BVHTables(
            left=jnp.asarray(b.left),
            right=jnp.asarray(b.right),
            tri_start=jnp.asarray(b.tri_start),
            tri_end=jnp.asarray(b.tri_end),
            skip=jnp.asarray(b.skip),
            mn=Vec3(*[jnp.asarray(b.mn[:, i]) for i in range(3)]),
            mx=Vec3(*[jnp.asarray(b.mx[:, i]) for i in range(3)]),
        )

    tables = SceneTables(
        spheres=SphereTable.from_list(spheres),
        materials=Materials(
            albedo=Vec3(alb[:, 0], alb[:, 1], alb[:, 2]),
            mirror=jnp.asarray(mirror),
            in_ri=jnp.asarray(in_ri),
            out_ri=jnp.asarray(out_ri),
        ),
        mesh=mesh_tables,
        bvh=bvh_tables,
        pallas_mesh=pallas_tables,
        pairs_mesh=pairs_tables,
        L=Vec3.const(*np.asarray(L, np.float32)),
        intensity=jnp.float32(intensity),
        mesh_src=mesh_src,
    )
    # Commit every leaf to device once at build: numpy leaves in a jit
    # argument would otherwise be re-uploaded host->device on EVERY call
    # (tens of ms per frame through a remote-TPU tunnel).
    return jax.device_put(tables)
