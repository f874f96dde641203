import numpy as np
import pytest

from tpu_pathtracer.scene import procedural
from tpu_pathtracer.accel import (
    Platform, BuildParams, build_bvh, validate_bvh, flatten_mesh_bvh,
    woopify, load_or_build,
)


@pytest.fixture(scope="module")
def mesh():
    return procedural.make_test_scene()


def test_build_invariants_object_only(mesh):
    tv = mesh.tri_vertices()
    root, tri_idx, b = build_bvh(tv, params=BuildParams(enable_spatial_splits=False))
    validate_bvh(root, tri_idx, mesh.num_triangles, check_coverage=True)
    # object-only: exactly one reference per triangle
    assert len(tri_idx) == mesh.num_triangles
    assert root.max_depth() <= 64


def test_build_invariants_spatial(mesh):
    tv = mesh.tri_vertices()
    root, tri_idx, b = build_bvh(tv, params=BuildParams(enable_spatial_splits=True))
    validate_bvh(root, tri_idx, mesh.num_triangles, check_coverage=True)
    assert len(tri_idx) >= mesh.num_triangles  # duplicates allowed
    # SBVH should not be worse than a leaf-everything tree
    assert root.sah_cost(Platform()) < mesh.num_triangles


def test_sbvh_quality_vs_object_split():
    # long thin diagonal triangles strongly favor spatial splits
    rng = np.random.default_rng(0)
    base = rng.uniform(-1, 1, size=(200, 3))
    d = np.array([5.0, 0.02, 0.02])
    tv = np.stack([base, base + d, base + d + [0, 0.04, 0]], axis=1)
    root_o, idx_o, _ = build_bvh(tv, params=BuildParams(enable_spatial_splits=False))
    root_s, idx_s, _ = build_bvh(tv, params=BuildParams(enable_spatial_splits=True))
    assert root_s.sah_cost(Platform()) <= root_o.sah_cost(Platform()) * 1.001


def test_woopify_unit_triangle_property():
    rng = np.random.default_rng(3)
    tv = rng.normal(size=(50, 3, 3))
    w = woopify(tv)
    # The woop transform maps v0->(1,0,z), v1->(0,1,z), v2->(0,0,z) in the
    # (m1,m2) rows and puts the triangle plane at local z=0 via m0:
    for t in range(50):
        m0, m1, m2 = w[t, 0:4], w[t, 4:8], w[t, 8:12]
        v0, v1, v2 = tv[t]
        def loc(v):
            x = m1[:3] @ v + m1[3]
            y = m2[:3] @ v + m2[3]
            z = m0[:3] @ v - m0[3]
            return x, y, z
        np.testing.assert_allclose(loc(v0), (1, 0, 0), atol=1e-4)
        np.testing.assert_allclose(loc(v1), (0, 1, 0), atol=1e-4)
        np.testing.assert_allclose(loc(v2), (0, 0, 0), atol=1e-4)


def test_flatten_structure(mesh):
    fb = flatten_mesh_bvh(mesh)
    K, k12 = fb.prims.shape
    assert k12 == 12
    assert fb.meta.shape == (K, 2)
    assert fb.num_nodes >= 1
    assert fb.num_tri_slots == K - fb.num_nodes
    # node children are valid encodings
    nmeta = fb.meta[:fb.num_nodes]
    for c in nmeta.reshape(-1):
        if c >= 0:
            assert c < fb.num_nodes, "inner child must be a node row"
        else:
            row = ~int(c)
            assert fb.num_nodes <= row < K, "leaf child must be a tri row"
    # every leaf run terminates
    tmeta = fb.meta[fb.num_nodes:]
    # walk each leaf to its last flag
    starts = [~int(c) - fb.num_nodes for c in nmeta.reshape(-1) if c < 0]
    for s in starts:
        steps = 0
        while tmeta[s, 1] == 0:
            s += 1
            steps += 1
            assert steps < 10000
    # all original triangles appear
    valid = fb.tri_orig[fb.tri_orig >= 0]
    assert set(valid.tolist()) == set(range(mesh.num_triangles))
    # materials resolved per slot
    for slot in range(0, fb.num_tri_slots, 37):
        o = fb.tri_orig[slot]
        if o >= 0:
            assert fb.tri_mat[slot] == mesh.material_ids[o]


def test_cache_roundtrip(tmp_path, mesh):
    fb1 = load_or_build(mesh, cache_dir=str(tmp_path))
    fb2 = load_or_build(mesh, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(fb1.prims, fb2.prims)
    np.testing.assert_array_equal(fb1.meta, fb2.meta)
    files = list(tmp_path.glob("bvh_*.npz"))
    assert len(files) == 1
