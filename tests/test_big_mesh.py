"""Large-mesh paths: >126 tiles forces int16 tile lists (the int8 fast path
would silently wrap) in the pallas kernel; the pairs kernel STREAMS field
supertiles for meshes past the VMEM-resident block (ST_SLOTS) and falls
back to pallas only past MAX_SLOTS (SMEM bitmask budget)."""
import jax.numpy as jnp
import numpy as np

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.pallas_trace import (
    TILE_T,
    _block_active_tiles,
    build_pallas_tables,
    intersect_tris_pallas,
)
from raytracinggpu_tpu.ops.sphere import INF
from raytracinggpu_tpu.ops.triangle import build_tri_tables, intersect_tris_dense


def _big_mesh(rng, n=17000):
    # Random small triangles spread through a volume -> ~133 tiles.
    A = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    B = A + rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    C = A + rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    return A, B, C


def test_int16_lists_for_many_tiles(rng):
    A, B, C = _big_mesh(rng)
    tab = build_pallas_tables(A, B, C)
    n_tiles = tab.fields.shape[1] // TILE_T
    assert n_tiles > 126

    m = 256
    o = rng.uniform(-25, 25, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    lists = _block_active_tiles(O, u, tab.tile_aabb, n_tiles)
    assert lists.dtype == jnp.int16

    ph = intersect_tris_pallas(O, u, tab, eps_leaf=1e-4, interpret=True)
    pad = -(-len(A) // 512) * 512
    dh = intersect_tris_dense(
        O, u, build_tri_tables(A, B, C, pad_to=pad), eps_leaf=1e-4
    )
    t_p, t_d = np.asarray(ph.t), np.asarray(dh.t)
    np.testing.assert_array_equal(t_p < INF, t_d < INF)
    hit = t_p < INF
    np.testing.assert_allclose(t_p[hit], t_d[hit], rtol=1e-5, atol=1e-5)


def test_tie_break_lowest_index(rng):
    """Coincident duplicate triangles: the lowest index must win, matching
    the reference's ascending strict-< scan (global_launcher.cu:268-278)."""
    tri = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    A = np.stack([tri[0]] * 6)
    B = np.stack([tri[1]] * 6)
    C = np.stack([tri[2]] * 6)
    O = Vec3(*(jnp.asarray(np.full(8, v, np.float32)) for v in (0.0, 0.0, 5.0)))
    u = Vec3(*(jnp.asarray(np.full(8, v, np.float32)) for v in (0.0, 0.0, -1.0)))

    dh = intersect_tris_dense(O, u, build_tri_tables(A, B, C, pad_to=512), 1e-4)
    assert (np.asarray(dh.idx) == 0).all()

    tab = build_pallas_tables(A, B, C)
    ph = intersect_tris_pallas(O, u, tab, 1e-4, interpret=True)
    assert (np.asarray(ph.idx) == 0).all()


def test_pairs_streams_huge_mesh(rng):
    """A 52k-tri soup (~600 tiles, fields past the ST_SLOTS VMEM block)
    now STAYS on the production pairs kernel via supertile streaming
    (n_st > 1 field blocks DMA'd per ray block); closest hits must match
    the dense oracle exactly on the hit set and winner index."""
    from raytracinggpu_tpu.accel.bvh import build_bvh
    from raytracinggpu_tpu.ops.pairs_trace import (
        ST_SLOTS,
        build_pairs_tables,
        intersect_tris_pairs,
    )

    n = 52000
    A, B, C = _big_mesh(rng, n)
    bvh = build_bvh(A, B, C)
    Ao, Bo, Co = A[bvh.order], B[bvh.order], C[bvh.order]
    tab = build_pairs_tables(Ao, Bo, Co, bvh)
    assert tab.fields.shape[1] > ST_SLOTS          # streamed
    assert tab.fields.shape[1] % ST_SLOTS == 0     # whole supertile blocks

    m = 256
    o = rng.uniform(-25, 25, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    ph = intersect_tris_pairs(O, u, tab, 1e-4, interpret=True, blk=256)
    pad = -(-n // 512) * 512
    dh = intersect_tris_dense(
        O, u, build_tri_tables(Ao, Bo, Co, pad_to=pad), eps_leaf=1e-4)
    t_p, t_d = np.asarray(ph.t), np.asarray(dh.t)
    np.testing.assert_array_equal(t_p < INF, t_d < INF)
    hit = t_p < INF
    np.testing.assert_allclose(t_p[hit], t_d[hit], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(ph.idx)[hit], np.asarray(dh.idx)[hit])
    # walk-order invariance under STREAMING: the subgroup-major walk's
    # static word sweep must mask word slots past the last real bitmask
    # word (the final supertile covers fewer words than wps when nc is
    # not a supertile multiple) — bit-identical to word-major
    pw = intersect_tris_pairs(O, u, tab, 1e-4, interpret=True, blk=256,
                              sgw=0)
    np.testing.assert_array_equal(np.asarray(ph.t), np.asarray(pw.t))
    np.testing.assert_array_equal(
        np.asarray(ph.idx)[hit], np.asarray(pw.idx)[hit])
    # a tile width whose 32-tile bitmask words do NOT align with the
    # ST_SLOTS field blocks (384*32 does not divide 32768) must be
    # rejected at build — the streamed walk would silently read the
    # wrong triangles' constants
    import pytest

    with pytest.raises(ValueError, match="cannot stream"):
        build_pairs_tables(Ao, Bo, Co, bvh, tile_t=384)


def test_pairs_compact_on_streamed_mesh(rng):
    """Compaction composes with supertile streaming: a compacted cast on a
    >ST_SLOTS mesh (n_st > 1 field blocks, int32 key falls back to the
    single-tile mode when the pairwise key cannot fit) is bit-identical to
    the full cast — and the compact branch is PROVEN taken (n_act < C)."""
    from raytracinggpu_tpu.accel.bvh import build_bvh
    from raytracinggpu_tpu.ops.pairs_trace import (
        ST_SLOTS,
        _compact_key,
        _compact_ok,
        build_pairs_tables,
        intersect_tris_pairs,
    )

    n = 52000
    A, B, C = _big_mesh(rng, n)
    bvh = build_bvh(A, B, C)
    Ao, Bo, Co = A[bvh.order], B[bvh.order], C[bvh.order]
    tab = build_pairs_tables(Ao, Bo, Co, bvh)
    assert tab.fields.shape[1] > ST_SLOTS  # streamed

    # 64 rays aimed into the soup; 448 parked far away pointing away —
    # activity stays well under the compact capacity.
    m, mh = 512, 64
    o = np.full((m, 3), 200.0, np.float32)
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (m, 1))
    o[:mh] = rng.uniform(-25, 25, (mh, 3)).astype(np.float32)
    dh = rng.standard_normal((mh, 3)).astype(np.float32)
    d[:mh] = dh / np.linalg.norm(dh, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    nc = tab.tile_aabb.shape[0]
    Cc = _compact_ok(0.25, nc, m, 256)
    assert Cc and Cc < m
    _, n_act, _ = _compact_key(O, u, tab.tile_aabb, nc, None, None, m)
    assert int(n_act) <= Cc  # the lax.cond takes the compact branch

    ph = intersect_tris_pairs(O, u, tab, 1e-4, interpret=True, blk=256)
    pc = intersect_tris_pairs(O, u, tab, 1e-4, interpret=True, blk=256,
                              compact=0.25)
    np.testing.assert_array_equal(np.asarray(ph.t), np.asarray(pc.t))
    hit = np.asarray(ph.t) < INF
    np.testing.assert_array_equal(
        np.asarray(ph.idx)[hit], np.asarray(pc.idx)[hit])


def test_blk_caps_respect_budgets():
    """_blk_cap shrinks the kernel block to the SMEM bitmask and VMEM
    scratch budgets (VERDICT-r3 review findings: non-default pairs_block
    or fat pairs_tile on big meshes could previously request a block
    whose bitmask/scratches exceed hardware limits — a compile error)."""
    from raytracinggpu_tpu.ops.pairs_trace import (
        LANES, SMEM_WORDS, ST_SLOTS, _blk_cap)

    # production default: unchanged (the measured headline configuration)
    assert _blk_cap(43, 16, 4096, 128, 5, 43 * 128) == 4096
    # SMEM: W=512 words at nc=16384; a 16384-tile mesh with blk=8192 has
    # smem_cap = SMEM_WORDS*16/512 = 4096 -> halved once
    assert SMEM_WORDS * 16 // 512 == 4096
    assert _blk_cap(16384, 16, 8192, 128, 2, 16384 * 128) == 4096
    # VMEM: 5 payload scratches at tile_t=512 exceed the budget at the
    # default 4096-ray block -> shrunk (but never below LANES)
    capped = _blk_cap(64, 16, 4096, 512, 5, 64 * 512)
    assert LANES <= capped < 4096
    assert capped % LANES == 0


def test_pallas_cap_raises_past_budget():
    """One BLK_R block's scalar-prefetch tile lists past the SMEM budget
    must be a clear error, not a compile-time SMEM OOM (the old
    max(BLK_R, ...) floor)."""
    import pytest

    from raytracinggpu_tpu.ops.pallas_trace import smem_ray_cap_pallas

    assert smem_ray_cap_pallas(1563) >= 1024   # 200k-tri soup: still fine
    with pytest.raises(ValueError, match="traversal='dense'"):
        smem_ray_cap_pallas(40000)


def test_pairs_fallback_past_cap(rng, monkeypatch):
    """A mesh past MAX_SLOTS must not crash scene build: build_scene_tables
    warns, leaves pairs_mesh=None, and the integrator falls back to the
    pallas tile kernel (wavefront._effective_traversal) so
    traversal='pairs' still renders.  The cap is patched down so a small
    soup triggers the path."""
    import warnings

    from raytracinggpu_tpu.integrator.wavefront import (
        _effective_traversal,
        intersect_all,
    )
    from raytracinggpu_tpu.ops import pairs_trace
    from raytracinggpu_tpu.scene.mesh import build_mesh
    from raytracinggpu_tpu.scene.obj import ObjMesh
    from raytracinggpu_tpu.scene.presets import wall_spheres
    from raytracinggpu_tpu.scene.scene import RenderConfig, build_scene_tables

    monkeypatch.setattr(pairs_trace, "MAX_SLOTS", 4096)
    n = 17000
    A, B, C = _big_mesh(rng, n)
    V = np.concatenate([A, B, C], axis=0).astype(np.float32)
    vtx = np.arange(3 * n, dtype=np.int32).reshape(3, n).T
    obj = ObjMesh(
        vertices=V, normals=np.zeros((0, 3), np.float32),
        uvs=np.zeros((0, 3), np.float32), vtx=vtx,
        nrm=np.full((n, 3), -1, np.int32), uv=np.full((n, 3), -1, np.int32),
    )
    mesh = build_mesh(obj)
    spheres, mats = wall_spheres(990.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tables = build_scene_tables(
            spheres, mats, L=(-10, 20, 40), intensity=3e10, mesh=mesh)
    assert any("pairs kernel unavailable" in str(x.message) for x in w)
    assert tables.pairs_mesh is None
    cfg = RenderConfig(traversal="pairs")
    assert _effective_traversal(cfg, tables) == "pallas"

    m = 128
    o = rng.uniform(-25, 25, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    h = intersect_all(tables, cfg, O, u)  # pallas interpret path
    assert np.isfinite(np.asarray(h.t)[np.asarray(h.obj) >= 0]).all()


def test_pairs_many_tiles(rng):
    """The pairs kernel past 255 tiles (W > 8 bitmask words): a 34k-tri
    soup paves to ~370 cluster tiles; interpret-mode closest hits must
    match the dense oracle (hit set + winner index)."""
    from raytracinggpu_tpu.ops.pairs_trace import (
        build_pairs_tables,
        intersect_tris_pairs,
    )
    from raytracinggpu_tpu.accel.bvh import build_bvh

    A, B, C = _big_mesh(rng, 34000)
    bvh = build_bvh(A, B, C)
    Ao, Bo, Co = A[bvh.order], B[bvh.order], C[bvh.order]
    tab = build_pairs_tables(Ao, Bo, Co, bvh)
    nc = tab.tile_aabb.shape[0]
    assert nc > 255, nc

    m = 512
    o = rng.uniform(-25, 25, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    ph = intersect_tris_pairs(O, u, tab, 1e-4, interpret=True, blk=512)
    pad = -(-len(Ao) // 512) * 512
    dh = intersect_tris_dense(
        O, u, build_tri_tables(Ao, Bo, Co, pad_to=pad), eps_leaf=1e-4)
    t_p, t_d = np.asarray(ph.t), np.asarray(dh.t)
    np.testing.assert_array_equal(t_p < INF, t_d < INF)
    hit = t_p < INF
    np.testing.assert_allclose(t_p[hit], t_d[hit], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(ph.idx)[hit], np.asarray(dh.idx)[hit])


def test_meshless_scene_keeps_pairs_traversal():
    """A spheres-only scene has pairs_mesh=None because it has NO mesh —
    the effective traversal must stay 'pairs' (full pairs_chunk casts), not
    fall to the pallas chunking path."""
    from raytracinggpu_tpu.integrator.wavefront import _effective_traversal
    from raytracinggpu_tpu.scene.presets import build_preset

    cfg, tables = build_preset("showcase", width=32, height=32, spp=1,
                               max_depth=2)
    assert tables.mesh is None and tables.pairs_mesh is None
    assert _effective_traversal(cfg, tables) == "pairs"


def test_direct_api_chunks_by_smem_budget(rng, monkeypatch, cat_mesh_raw):
    """intersect_tris_pairs called DIRECTLY (not through the pipeline) must
    split the ray batch so the culling bitmask fits SMEM — previously only
    trace_chunked protected against this, and a big-mesh direct call could
    request a multi-MB SMEM prefetch.  Patching the budget tiny forces the
    multi-chunk path; results must be identical."""
    from raytracinggpu_tpu.ops import pairs_trace as pt
    from raytracinggpu_tpu.scene.mesh import build_mesh

    mesh = build_mesh(cat_mesh_raw)
    tab = pt.build_pairs_tables(mesh.A, mesh.B, mesh.C, mesh.bvh)

    m = 1024
    o = rng.uniform(-30, 30, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    ref = pt.intersect_tris_pairs(O, u, tab, 1e-4, interpret=True, blk=256)
    nc = tab.tile_aabb.shape[0]
    assert pt.smem_ray_cap(nc, 16, 256) >= m  # unchunked reference
    monkeypatch.setattr(pt, "SMEM_WORDS", 16 * 2)  # cap -> 1 block chunks
    assert pt.smem_ray_cap(nc, 16, 256) < m
    chunked = pt.intersect_tris_pairs(O, u, tab, 1e-4, interpret=True,
                                      blk=256)
    np.testing.assert_array_equal(np.asarray(chunked.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(chunked.idx),
                                  np.asarray(ref.idx))


def test_pallas_entries_chunk_by_smem_budget(rng, monkeypatch):
    """The pallas fallback's merged [count|ids] tile lists live WHOLE in
    SMEM (scalar prefetch is not grid-blocked): a 200k-tri soup at 2^17
    rays requested a 6.5 MB operand — a compile-time OOM on hardware.
    Both public entries now self-chunk by smem_ray_cap_pallas; forcing a
    tiny budget must split the batch with identical results."""
    from raytracinggpu_tpu.ops import pallas_trace as plt_

    A, B, C = _big_mesh(rng, 17000)            # ~133 tiles -> int16 lists
    tab = plt_.build_pallas_tables(A, B, C)
    n_tiles = tab.fields.shape[1] // plt_.TILE_T

    m = 2048
    o = rng.uniform(-25, 25, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    cap = jnp.asarray(rng.uniform(5, 50, m).astype(np.float32))

    assert plt_.smem_ray_cap_pallas(n_tiles) >= m      # unchunked reference
    ref_c = plt_.intersect_tris_pallas(O, u, tab, 1e-4, interpret=True)
    ref_s = plt_.intersect_tris_shadow(O, u, tab, 1e-4, cap=cap,
                                       interpret=True)

    # One BLK_R block's lists are 16 rows x 512 B = 8 KB here: the forced
    # budget must still admit one whole block (smaller budgets are now a
    # hard error rather than a silent over-budget floor).
    monkeypatch.setattr(plt_, "SMEM_BUDGET_BYTES", 8192)
    assert plt_.smem_ray_cap_pallas(n_tiles) < m       # forces >= 2 chunks
    ch_c = plt_.intersect_tris_pallas(O, u, tab, 1e-4, interpret=True)
    ch_s = plt_.intersect_tris_shadow(O, u, tab, 1e-4, cap=cap,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(ch_c.t), np.asarray(ref_c.t))
    np.testing.assert_array_equal(np.asarray(ch_c.idx), np.asarray(ref_c.idx))
    np.testing.assert_array_equal(np.asarray(ch_s), np.asarray(ref_s))
