#!/usr/bin/env python
"""A/B the with_stats ray-counter reduces on the real frame cost.

Same invocation, same methodology as sweep_frame (marginal cost of
chained frames, median of 3): the production integrator (with_stats=
False) vs the stats-carrying one. The delta is what the per-wave
sum(cand) cross-lane reduce + scalar carry actually cost.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, default=1024)
    ap.add_argument("--w", type=int, default=0)
    ap.add_argument("--h", type=int, default=0)
    ap.add_argument("--frames", type=int, nargs=2, default=(1, 5))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = args.w or args.wh
    H = args.h or args.wh
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())

    def frame_cost(with_stats):
        fn = jax.jit(make_regen_integrator(r.settings, W, H,
                                           with_stats=with_stats),
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
        lo, hi = args.frames
        return (run(hi) - run(lo)) / (hi - lo) * 1e3

    for ws in (False, True, False):     # repeat arm 1 to bound drift
        print("with_stats=%s: %.1f ms/frame" % (ws, frame_cost(ws)),
              flush=True)


if __name__ == "__main__":
    main()
