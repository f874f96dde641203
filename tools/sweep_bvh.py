#!/usr/bin/env python
"""A/B SBVH build-quality knobs on the REAL 1-spp frame cost.

The reference's constants (splitAlpha 1e-5, SAH costs 1:1) were tuned for
per-thread GPU traversal; packet traversal pays a whole packet per
triangle STEP (step census: 72% of steps are triangle steps, mean leaf
run 3.2), so a higher SAH triangle cost (smaller leaves) or a different
spatial-split budget may price differently here.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene import procedural
    from tpu_pathtracer.scene.demo import default_camera
    from tpu_pathtracer.scene.config import MatDesc, MAT_DIFF, MAT_FRESNEL, \
        MAT_GLASS, MAT_REFL
    from tpu_pathtracer.accel import load_or_build
    from tpu_pathtracer.accel.bvh import Platform, BuildParams
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator

    mesh = procedural.make_test_scene()
    mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
            MatDesc(refltype=MAT_FRESNEL, alphax=0.1, alphay=0.1,
                    kd=5.0, ks=1.0),
            MatDesc(refltype=MAT_GLASS),
            MatDesc(refltype=MAT_REFL)]
    envmap = procedural.make_sky_envmap()
    texture = procedural.make_checker_texture()
    W = H = 1024
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())

    # NOTE: the native builder honors split_alpha/leaf bounds but NOT the
    # SAH cost ratio — cost variants must go through the Python builder
    # (use_native=False). Identical trees (same row count+depth) are
    # deduped instead of re-measured.
    variants = [
        ("default", None, None),
        ("tri_cost=2", Platform(sah_triangle_cost=2.0), None),
        ("tri_cost=4", Platform(sah_triangle_cost=4.0), None),
        ("tri_cost=0.5", Platform(sah_triangle_cost=0.5), None),
        ("max_leaf=2", Platform(max_leaf_size=2), None),
    ]

    from tpu_pathtracer.accel.flatten import flatten_mesh_bvh
    seen = set()
    for name, plat, bp in variants:
        fb = flatten_mesh_bvh(mesh, platform=plat, params=bp,
                              use_native=(plat is None))
        sig = (fb.prims.shape[0], fb.max_depth)
        if sig in seen:
            print("%s: identical tree (rows %d, depth %d), skipped"
                  % (name, sig[0], sig[1]), flush=True)
            continue
        seen.add(sig)
        tbl_kb = fb.prims.shape[0] * 56 / 1024.0
        r = Renderer(fb, mats, envmap=envmap, texture=texture,
                     width=W, height=H)
        fn = jax.jit(make_regen_integrator(r.settings, W, H),
                     static_argnames=("n_frames",))
        accum = r.zeros_accum()

        def run(M):
            def go():
                return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0), accum,
                          n_frames=M)
            np.asarray(go()[0][-1:])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(go()[0][-1:])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        ms = (run(5) - run(1)) / 4.0 * 1e3
        print("%s: %.1f ms/frame (rows %d, table %.0f KB, depth %d)"
              % (name, ms, fb.prims.shape[0], tbl_kb, fb.max_depth),
              flush=True)


if __name__ == "__main__":
    main()
