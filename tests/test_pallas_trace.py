"""Pallas fused closest-hit kernel vs the dense matmul path (interpret mode
on the CPU test mesh; the same kernel compiles natively on TPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.pallas_trace import (
    build_pallas_tables,
    intersect_tris_pallas,
    recompute_barycentrics,
)
from raytracinggpu_tpu.ops.sphere import INF
from raytracinggpu_tpu.ops.triangle import intersect_tris_dense


def _rand_rays(rng, n, origin_spread=20.0):
    O = Vec3(*(jnp.asarray(rng.uniform(-origin_spread, origin_spread, n)
                           .astype(np.float32)) for _ in range(3)))
    d = rng.standard_normal((3, n)).astype(np.float32)
    u = Vec3(*(jnp.asarray(c) for c in d)).normalized()
    return O, u


def test_pallas_matches_dense_on_cat(cat_mesh_raw, rng):
    from raytracinggpu_tpu.scene.mesh import build_mesh

    mesh = build_mesh(cat_mesh_raw)
    from raytracinggpu_tpu.ops.triangle import build_tri_tables

    pad = -(-mesh.n_tri // 512) * 512
    dense_tab = build_tri_tables(mesh.A, mesh.B, mesh.C, pad_to=pad)
    ptab = build_pallas_tables(mesh.A, mesh.B, mesh.C, pad_to=pad)

    n = 512
    O, u = _rand_rays(rng, n, origin_spread=30.0)
    ph = intersect_tris_pallas(O, u, ptab, eps_leaf=1e-4, interpret=True)
    dh = intersect_tris_dense(O, u, dense_tab, eps_leaf=1e-4)

    t_p, t_d = np.asarray(ph.t), np.asarray(dh.t)
    hit_p, hit_d = t_p < INF, t_d < INF
    np.testing.assert_array_equal(hit_p, hit_d)
    np.testing.assert_allclose(t_p[hit_p], t_d[hit_d], rtol=1e-5, atol=1e-5)
    # Winner triangle agrees except at exact-tie boundaries.
    agree = (np.asarray(ph.idx)[hit_p] == np.asarray(dh.idx)[hit_d]).mean()
    assert agree > 0.999

    # Barycentric recovery for the smooth-normal path.
    beta, gamma = recompute_barycentrics(O, u, ptab, ph)
    b, g = np.asarray(beta), np.asarray(gamma)
    same = np.asarray(ph.idx) == np.asarray(dh.idx)
    m = hit_p & same
    np.testing.assert_allclose(b[m], np.asarray(dh.beta)[m], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(g[m], np.asarray(dh.gamma)[m], rtol=1e-3, atol=1e-4)


def test_pallas_padding_and_empty_tiles(rng):
    # 5 triangles -> one partial tile; padded tris must never hit.
    A = rng.standard_normal((5, 3)).astype(np.float32)
    B = A + rng.standard_normal((5, 3)).astype(np.float32)
    C = A + rng.standard_normal((5, 3)).astype(np.float32)
    tab = build_pallas_tables(A, B, C)
    assert tab.n_tiles == 1
    n = 256
    O, u = _rand_rays(rng, n, origin_spread=5.0)
    h = intersect_tris_pallas(O, u, tab, eps_leaf=0.0, interpret=True)
    idx = np.asarray(h.idx)
    t = np.asarray(h.t)
    assert (idx[t < INF] < 5).all()


def test_pallas_integrator_mode_matches_dense(cat_mesh_raw, rng):
    """Full trace with traversal='pallas' vs 'dense' on a small frame."""
    from raytracinggpu_tpu.integrator.wavefront import trace
    from raytracinggpu_tpu.scene.mesh import build_mesh
    from raytracinggpu_tpu.scene.presets import build_preset
    from tests.test_integrator import _camera_rays, _vec

    mesh = build_mesh(cat_mesh_raw)
    cfg, tables = build_preset("array_bvh", mesh=mesh, spp=1, max_depth=2, traversal="dense")
    W = H = 16
    cfg = dataclasses.replace(cfg, width=W, height=H)
    O, u = _camera_rays(W, H)
    R = W * H
    uniforms = jnp.asarray(
        rng.random((2, 2, R)).astype(np.float32) * 0.998 + 1e-3
    )
    col_d, _ = jax.jit(trace, static_argnums=1)(
        tables, dataclasses.replace(cfg, traversal="dense"), _vec(O), _vec(u), uniforms
    )
    col_p, _ = jax.jit(trace, static_argnums=1)(
        tables, dataclasses.replace(cfg, traversal="pallas"), _vec(O), _vec(u), uniforms
    )
    a = np.stack([np.asarray(col_d.x), np.asarray(col_d.y), np.asarray(col_d.z)], -1)
    b = np.stack([np.asarray(col_p.x), np.asarray(col_p.y), np.asarray(col_p.z)], -1)
    bad = np.abs(a - b) > 1e-3 * np.abs(a) + 1.0
    assert bad.any(-1).mean() < 0.01


def test_padding_tiles_are_culled(rng):
    """Padding-only tiles carry inverted 'empty' boxes; slab min/max
    normalization would otherwise un-invert them into hits-everything
    intervals, wasting a full MT pass per junk tile per subgroup (review
    r3 finding).  They must never appear in the active-tile lists."""
    from raytracinggpu_tpu.core.vec import Vec3
    from raytracinggpu_tpu.ops.pallas_trace import (
        _block_active_tiles, build_pallas_tables)

    n = 100
    A = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    B = A + rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    C = A + rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    tab = build_pallas_tables(A, B, C, pad_to=512)   # tiles 1-3 padding-only
    assert tab.n_tiles == 4

    m = 1024
    o = rng.uniform(-10, 10, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    lists = np.asarray(_block_active_tiles(O, u, tab.tile_aabb, tab.n_tiles))
    for row in lists:
        count = int(row[0])
        active = set(int(t) for t in row[1 : 1 + count])
        assert active <= {0}, f"padding tile in active list: {active}"


def test_oversized_subgroup_rejected(cat_mesh_raw):
    """pallas_subgroup > TILE_T would floor the kernel's per-row loop count
    to zero and silently drop every mesh hit — must be a loud error."""
    import pytest

    from raytracinggpu_tpu.core.vec import Vec3
    from raytracinggpu_tpu.ops.pallas_trace import (
        build_pallas_tables, intersect_tris_pallas)
    from raytracinggpu_tpu.scene.mesh import build_mesh

    mesh = build_mesh(cat_mesh_raw)
    tab = build_pallas_tables(mesh.A, mesh.B, mesh.C)
    O = Vec3(*(jnp.zeros(256) for _ in range(3)))
    u = Vec3(jnp.zeros(256), jnp.zeros(256), jnp.ones(256))
    with pytest.raises(ValueError, match="pallas_subgroup"):
        intersect_tris_pallas(O, u, tab, 1e-4, interpret=True, subg=256)
