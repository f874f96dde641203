import numpy as np
import pytest

from tpu_pathtracer.scene import procedural
from tpu_pathtracer.accel.bvh import build_bvh, validate_bvh, Platform, BuildParams
from tpu_pathtracer.accel.native_build import build_bvh_native, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native builder unavailable")


def test_native_matches_python_builder():
    mesh = procedural.make_uv_sphere((0, 0.5, 0), 1.0, 0, n_lat=10, n_lon=14)
    tv = mesh.tri_vertices()
    root_n, tidx_n = build_bvh_native(tv)
    root_p, tidx_p, _ = build_bvh(tv)
    validate_bvh(root_n, tidx_n, mesh.num_triangles)
    # same cost model, same tie-breaks -> identical SAH cost
    assert root_n.sah_cost(Platform()) == pytest.approx(
        root_p.sah_cost(Platform()), rel=1e-3)
    assert abs(root_n.max_depth() - root_p.max_depth()) <= 2


def test_native_tri_cost():
    # the C++ builder honors Platform.sah_triangle_cost (round-5 large-scene
    # leaf-size lever): a cheaper triangle grows leaves, and the tree should
    # agree with the Python builder run at the same cost ratio
    mesh = procedural.make_uv_sphere((0, 0.5, 0), 1.0, 0, n_lat=10, n_lon=14)
    tv = mesh.tri_vertices()
    plat = Platform(sah_triangle_cost=0.25)
    root_n, tidx_n = build_bvh_native(tv, platform=plat)
    root_p, tidx_p, _ = build_bvh(tv, platform=plat)
    validate_bvh(root_n, tidx_n, mesh.num_triangles)
    assert root_n.sah_cost(plat) == pytest.approx(root_p.sah_cost(plat),
                                                  rel=1e-3)
    # cheaper triangles must grow leaves vs the default build
    root_d, _ = build_bvh_native(tv)
    assert root_n.num_nodes() < root_d.num_nodes()


def test_native_object_only():
    mesh = procedural.make_test_scene()
    tv = mesh.tri_vertices()
    root, tidx = build_bvh_native(
        tv, params=BuildParams(enable_spatial_splits=False))
    validate_bvh(root, tidx, mesh.num_triangles)
    assert len(tidx) == mesh.num_triangles


def test_native_spatial_quality():
    rng = np.random.default_rng(0)
    base = rng.uniform(-1, 1, size=(200, 3))
    d = np.array([5.0, 0.02, 0.02])
    tv = np.stack([base, base + d, base + d + [0, 0.04, 0]], axis=1)
    root_s, _ = build_bvh_native(tv, params=BuildParams(enable_spatial_splits=True))
    root_o, _ = build_bvh_native(tv, params=BuildParams(enable_spatial_splits=False))
    assert root_s.sah_cost(Platform()) <= root_o.sah_cost(Platform()) * 1.001
