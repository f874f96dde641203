#!/usr/bin/env python
"""A/B the packet (tile_sub, interleave) shape on the REAL frame cost.

The (32,4) default was tuned before the hit-slot survivor ordering landed
(round 3); better pool locality may shift the optimum. Measures the
marginal 1-spp frame cost at 1024^2 for each config via the bench
methodology (chained in-program frames).

Usage: python tools/sweep_packet.py [sub,il ...]   (default grid below)
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
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    rc = default_camera(W, H).build_render_camera()
    cv = jnp.asarray(rc.as_array())

    cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    if not cfgs:
        cfgs = [(32, 4), (16, 4), (16, 8), (8, 8), (32, 8), (64, 4)]

    def frame_cost(sub, il):
        st = dataclasses.replace(r.settings, packet_tile_sub=sub,
                                 packet_interleave=il)
        fn = jax.jit(make_regen_integrator(st, W, H),
                     static_argnames=("n_frames",))
        accum = r.zeros_accum()

        def run(M):
            def go():
                return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0), accum,
                          n_frames=M)
            np.asarray(go()[0][-1:])      # warm/compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(go()[0][-1:])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        lo = run(1)
        hi = run(5)
        return (hi - lo) / 4.0 * 1e3

    for sub, il in cfgs:
        try:
            ms = frame_cost(sub, il)
            print("(%d,%d): %.1f ms/frame" % (sub, il, ms), flush=True)
        except Exception as e:  # oversized SMEM stack etc.
            print("(%d,%d): FAILED %s" % (sub, il, str(e)[:120]), flush=True)


if __name__ == "__main__":
    main()
