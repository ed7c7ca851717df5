"""Clustering knobs of the pairs tables (ops/pairs_trace._cluster_slots).

The cluster tree (reference midpoint vs auxiliary SAH, accel/sah.py), the
cut granularity (pairs_cut) and the tile packing (morton vs pave) are pure
perf levers: slot ids always stay in canonical mesh order, so ANY
clustering that covers every triangle with containing member boxes yields
bit-identical renders (the closest-hit fold is a lexicographic (t, id)
min — order-independent — and the shadow fold an OR).  These tests pin
that invariance plus the structural invariants each packing must keep.
"""
import jax
import numpy as np
import pytest

from raytracinggpu_tpu.accel.bvh import check_invariants
from raytracinggpu_tpu.accel.sah import build_sah_bvh
from raytracinggpu_tpu.ops.pairs_trace import build_pairs_tables
from raytracinggpu_tpu.render.pipeline import Camera, render_frame
from raytracinggpu_tpu.scene.mesh import load_cat_mesh
from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH

VARIANTS = {
    "base": dict(),
    "ref_cut32": dict(cut_tris=32),
    "ref_pave_c64": dict(pack="pave", cut_tris=64),
    "sah_pave_c32": dict(cluster="sah", pack="pave", cut_tris=32),
    "sah_morton": dict(cluster="sah"),
}


@pytest.fixture(scope="module")
def mesh():
    return load_cat_mesh(CAT_OBJ_PATH, False, 0.6, (0.0, -10.0, 0.0))


def _tables(mesh, cluster="ref", **kw):
    tree, ids = mesh.bvh, None
    if cluster == "sah":
        tree = build_sah_bvh(mesh.A, mesh.B, mesh.C)
        ids = tree.order
    return build_pairs_tables(mesh.A, mesh.B, mesh.C, tree, ids_map=ids, **kw)


def test_sah_tree_invariants(mesh):
    sah = build_sah_bvh(mesh.A, mesh.B, mesh.C, max_leaf=8)
    # Same structural contract as the reference-semantics tree: preorder,
    # contiguous child ranges, boxes contain triangles, skip links valid.
    check_invariants(sah, mesh.A, mesh.B, mesh.C)
    leaves = sah.right == -1
    sizes = (sah.tri_end - sah.tri_start)[leaves]
    assert sizes.max() <= 8
    # SAH quality at the granularity the tree is USED at (the cluster cut
    # feeding member boxes): expected intersection cost sum(SA * N) over
    # cut clusters must beat the reference midpoint tree's cut.  Raw leaf
    # sums are not comparable (different leaf-size policies).
    from raytracinggpu_tpu.accel.bvh import cluster_cut

    def cut_cost(tree):
        cut = cluster_cut(tree, max_tris=32)
        d = np.maximum(cut.mx - cut.mn, 0.0)
        sa = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        return float((sa * (cut.ends - cut.starts)).sum())

    assert cut_cost(sah) < cut_cost(mesh.bvh)


@pytest.mark.parametrize("name", list(VARIANTS))
def test_table_invariants(mesh, name):
    tab = _tables(mesh, **VARIANTS[name])
    T = mesh.n_tri
    ss = np.asarray(tab.slot_src)
    cov = np.sort(ss[ss >= 0])
    assert cov.shape[0] == T and (cov == np.arange(T)).all(), (
        "slots must cover every triangle exactly once")
    tile_t = ss.shape[0] // tab.tile_aabb.shape[0]
    m_slot = np.asarray(tab.member_slot)
    m_tile = np.asarray(tab.member_tile)
    m_aabb = np.asarray(tab.member_aabb)
    assert (m_slot >= 0).sum() == T, "every triangle belongs to a member"
    for m in range(m_aabb.shape[0]):
        sel = np.nonzero(m_slot == m)[0]
        assert sel.size, f"member {m} has no slots"
        # member slots all live in the member's tile
        assert (sel // tile_t == m_tile[m]).all()
        ids = ss[sel]
        pts = np.concatenate(
            [mesh.A[ids], mesh.B[ids], mesh.C[ids]], axis=0)
        assert (pts.min(0) >= m_aabb[m, 0:3] - 1e-4).all()
        assert (pts.max(0) <= m_aabb[m, 3:6] + 1e-4).all()
    if VARIANTS[name].get("pack") == "pave":
        # 100% occupancy: padding only in the final tile
        assert (ss[: (T // tile_t) * tile_t] >= 0).all()


def test_renders_bit_identical(mesh):
    from raytracinggpu_tpu.scene.presets import build_preset

    imgs = {}
    for name, kw in VARIANTS.items():
        over = dict(
            pairs_cluster=kw.get("cluster", "ref"),
            pairs_cut=kw.get("cut_tris", 0),
            pairs_pack=kw.get("pack", "morton"),
        )
        cfg, tables = build_preset(
            "array_bvh", mesh=mesh, width=48, height=48, spp=2,
            max_depth=3, traversal="pairs", **over)
        cam = Camera.fixed(cfg.camera_c)
        img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(0))
        imgs[name] = np.asarray(img)
    base = imgs.pop("base")
    assert np.isfinite(base).all()
    for name, a in imgs.items():
        assert np.array_equal(a, base), (
            f"clustering variant {name} changed the render")


def test_pose_transform_with_sah_pave(mesh):
    """The jitted pose transform refits member boxes by segment reduction
    over slot_src — it must stay containing under SAH + pave packing
    (split members, full-occupancy tiles, permuted slot ids)."""
    from raytracinggpu_tpu.scene.presets import build_preset
    from raytracinggpu_tpu.scene.transform import pose_mesh, rotation_y

    cfg, tables = build_preset(
        "array_bvh", mesh=mesh, width=48, height=48, spp=2, max_depth=2,
        traversal="pairs", pairs_cluster="sah", pairs_pack="pave",
        pairs_cut=32)
    ang = 0.7
    posed = jax.jit(lambda s: pose_mesh(s, rotation_y(ang)))(tables)
    pm = posed.pairs_mesh
    slot_src = np.asarray(pm.slot_src)
    m_slot = np.asarray(pm.member_slot)
    aabb = np.asarray(pm.member_aabb)
    src = tables.mesh_src
    c, s = np.cos(ang), np.sin(ang)
    Rm = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    for corner in (src.A, src.B, src.C):
        V = np.stack([np.asarray(corner.x), np.asarray(corner.y),
                      np.asarray(corner.z)], axis=1) @ Rm.T
        live = slot_src >= 0
        m = m_slot[live]
        pts = V[slot_src[live]]
        assert (pts >= aabb[m, 0:3] - 1e-3).all()
        assert (pts <= aabb[m, 3:6] + 1e-3).all()


def test_gallery_ablation_rows_rebuild_tables(mesh):
    """Table-affecting ablation overrides (pairs_pack/cut/cluster/tile)
    must rebuild the preset tables — replace() on the config alone leaves
    the measured kernel identical to the default mode (regression: the
    ablation runner once cached tables keyed only by frame size)."""
    from raytracinggpu_tpu.bench import gallery

    assert set(gallery._TABLE_KEYS) >= {
        k for mode in gallery.ABLATION_MODES.values()
        for k in ("pairs_pack", "pairs_cluster", "pairs_cut", "pairs_tile")
        if k in mode}
    gallery._preset_cache.clear()
    _, tab0 = gallery._cached_preset(48, 48, 1, 2)
    _, tab1 = gallery._cached_preset(
        48, 48, 1, 2, pairs_pack="pave", pairs_cut=32)
    assert (tab1.pairs_mesh.tile_aabb.shape[0]
            != tab0.pairs_mesh.tile_aabb.shape[0])
    gallery._preset_cache.clear()
