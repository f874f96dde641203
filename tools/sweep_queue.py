#!/usr/bin/env python
"""On-device validation + frame sweep for the slimmed queue kernel
(ood recomputed in-kernel, scalar-SMEM tmin, no done-carry on
closest-hit). Gates every measured config against the brute-force
oracle first, then prices the real 1-spp 1024^2 frame at several
queue_k (the slimmer block footprint may move the best k).
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.scene.procedural import make_test_scene
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.tracer.traverse import (brute_force_intersect,
                                                pack_stream)
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    packed = jnp.asarray(pack_stream(fb.prims, fb.meta))
    sd = fb.max_depth + 2
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())
    st0 = r.settings
    sub, il = st0.packet_tile_sub, st0.packet_interleave

    # ---------------- on-device correctness gate ----------------
    chk = np.random.default_rng(0)
    n_chk = 512
    co = chk.uniform(-3, 3, (n_chk, 3)).astype(np.float32)
    co[:, 1] = chk.uniform(0.3, 3, n_chk)
    cd = chk.normal(size=(n_chk, 3)).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    bt, _ = brute_force_intersect(make_test_scene().tri_vertices(), co, cd,
                                  RAY_MIN, RAY_MAX)
    for mem in ("smem", "vmem"):
        for qk in (0, 64, 96, 128):
            cs, ct = packet_intersect(packed, jnp.asarray(co),
                                      jnp.asarray(cd), RAY_MIN, RAY_MAX,
                                      stack_depth=sd, tile_sub=sub,
                                      interleave=il, table_mem=mem,
                                      queue_k=qk)
            cs = np.asarray(cs)
            ours = np.where(cs >= 0, fb.tri_orig[np.maximum(cs, 0)], -1)
            agree = float((ours == bt).mean())
            assert agree > 0.999, ("(%s,q%d) wrong: %.4f"
                                   % (mem, qk, agree))
            ahs, _ = packet_intersect(packed, jnp.asarray(co),
                                      jnp.asarray(cd), RAY_MIN, RAY_MAX,
                                      stack_depth=sd, anyhit=True,
                                      tile_sub=sub, interleave=il,
                                      table_mem=mem, queue_k=qk)
            ah = float(((np.asarray(ahs) >= 0) == (bt >= 0)).mean())
            assert ah > 0.999, ("(%s,q%d) anyhit wrong: %.4f"
                                % (mem, qk, ah))
            print("gate %s q%-3d OK (%.4f / %.4f)" % (mem, qk, agree, ah),
                  flush=True)

    # ---------------- in-situ frame cost per queue_k ----------------
    def frame_cost(st, reps=3, frames=(1, 5)):
        fn = jax.jit(make_regen_integrator(st, W, H),
                     static_argnames=("n_frames",))
        accum = r.zeros_accum()

        def run(M):
            def go():
                return np.asarray(fn(r.scene, cv, jnp.uint32(1),
                                     jnp.uint32(0), accum,
                                     n_frames=M)[0][-1:])
            go()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                go()
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        lo, hi = frames
        return (run(hi) - run(lo)) / (hi - lo) * 1e3

    for qk in (64, 96, 128):
        st = dataclasses.replace(st0, packet_queue_k=qk)
        print("frame 1024^2 qk=%-3d: %7.1f ms" % (qk, frame_cost(st)),
              flush=True)


if __name__ == "__main__":
    main()
