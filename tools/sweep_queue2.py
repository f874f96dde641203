#!/usr/bin/env python
"""Round 2 of the slim-kernel queue sweep: bigger queue_k (the slimmer
block footprint moved the optimum up), measured WITH the P/4 drain
rungs; plus 1080p at the winner. Gates each new config first."""
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
    st0_any = None

    chk = np.random.default_rng(0)
    n_chk = 512
    co = chk.uniform(-3, 3, (n_chk, 3)).astype(np.float32)
    co[:, 1] = chk.uniform(0.3, 3, n_chk)
    cd = chk.normal(size=(n_chk, 3)).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    bt, _ = brute_force_intersect(make_test_scene().tri_vertices(), co, cd,
                                  RAY_MIN, RAY_MAX)

    def gate(qk, sub, il):
        for ah in (False, True):
            s, _ = packet_intersect(packed, jnp.asarray(co),
                                    jnp.asarray(cd), RAY_MIN, RAY_MAX,
                                    stack_depth=sd, tile_sub=sub,
                                    interleave=il, anyhit=ah, queue_k=qk)
            s = np.asarray(s)
            if ah:
                a = float(((s >= 0) == (bt >= 0)).mean())
            else:
                ours = np.where(s >= 0, fb.tri_orig[np.maximum(s, 0)], -1)
                a = float((ours == bt).mean())
            assert a > 0.999, ("(q%d,%d,%d,ah=%s) wrong: %.4f"
                               % (qk, sub, il, ah, a))
        print("gate q%d (%d,%d) OK" % (qk, sub, il), flush=True)

    def frame_cost(st, W, H, reps=3, frames=(1, 5)):
        r = Renderer(fb, mats, envmap=envmap, texture=texture,
                     width=W, height=H)
        cv = jnp.asarray(default_camera(W, H).build_render_camera()
                         .as_array())
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

    r1 = Renderer(fb, mats, envmap=envmap, texture=texture,
                  width=64, height=64)
    st0 = r1.settings

    for qk in (192, 256):
        gate(qk, st0.packet_tile_sub, st0.packet_interleave)

    # qk=128 again: delta vs the 179.2 pre-rung number isolates the
    # P/4-rung drain effect at 1024^2
    for qk in (128, 192, 256):
        st = dataclasses.replace(st0, packet_queue_k=qk)
        print("frame 1024^2 qk=%-3d (P/4 rungs): %7.1f ms"
              % (qk, frame_cost(st, 1024, 1024)), flush=True)

    best = 128
    st = dataclasses.replace(st0, packet_queue_k=best)
    print("frame 1080p qk=%-3d (P/4 rungs): %7.1f ms"
          % (best, frame_cost(st, 1920, 1080)), flush=True)


if __name__ == "__main__":
    main()
