"""4-wide BVH collapse + its packet kernel (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.scene import procedural
from tpu_pathtracer.scene.mesh import TriangleMesh
from tpu_pathtracer.accel import flatten_mesh_bvh
from tpu_pathtracer.accel.bvh4 import build_bvh4
from tpu_pathtracer.ops.traverse_packet4 import packet4_intersect
from tpu_pathtracer.tracer.traverse import brute_force_intersect


def test_bvh4_packet_matches_brute_force():
    sphere = procedural.make_uv_sphere((0, 0.5, 0), 1.0, 0, n_lat=8, n_lon=10)
    plane = procedural.make_plane((0, 0, 0), 8, 8, 0)
    mesh = TriangleMesh.concatenate([sphere, plane])
    fb = flatten_mesh_bvh(mesh)
    b4 = build_bvh4(fb.prims, fb.meta, fb.num_nodes)
    # collapse roughly halves depth and node count
    assert b4.max_depth <= fb.max_depth // 2 + 2
    rng = np.random.default_rng(0)
    N = 1024
    orig = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    orig[:, 1] = rng.uniform(0.2, 3, N)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    slot, t = packet4_intersect(
        jnp.asarray(b4.prims4), jnp.asarray(orig), jnp.asarray(d),
        1e-4, 1e20, stack_depth=b4.max_depth + 2, tile_sub=8, interpret=True)
    slot = np.asarray(slot)
    bf_tri, bf_t = brute_force_intersect(mesh.tri_vertices(), orig, d,
                                         1e-4, 1e20)
    ours = np.where(slot >= 0, fb.tri_orig[np.maximum(slot, 0)], -1)
    assert (ours == bf_tri).mean() == 1.0
    both = (slot >= 0)
    np.testing.assert_allclose(np.asarray(t)[both], bf_t[both],
                               rtol=1e-3, atol=1e-3)
