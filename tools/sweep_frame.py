#!/usr/bin/env python
"""A/B RenderSettings overrides on the REAL 1-spp frame cost.

Measures the marginal frame cost (bench methodology: chained in-program
frames, median of 3) at a given resolution for each settings override
set. Used for pool-size / scatter-mode / packet-shape tuning, e.g.:

  python tools/sweep_frame.py --wh 1024 \
      "pool_lanes=1<<20" "pool_lanes=1<<19" \
      "pool_lanes=1<<19,scatter_mode='wave'"

Each positional arg is a comma-separated list of `field=value` pairs
(Python literals; <<
 allowed) applied via dataclasses.replace.
"""
import argparse
import dataclasses
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
    ap.add_argument("--demo", default="default",
                    help="testobj_scene variant (default/subsurface/media/"
                         "gold/lambertian)")
    ap.add_argument("cfgs", nargs="+")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator

    if args.demo == "large":
        from tpu_pathtracer.scene.demo import large_scene
        fb, mats, envmap, texture = large_scene(cache_dir=".bvh_cache")
    elif args.demo in ("organic_sss", "organic_media"):
        from tpu_pathtracer.scene.demo import large_organic_scene
        fb, mats, envmap, texture = large_organic_scene(
            cache_dir=".bvh_cache", variant=args.demo.split("_")[1])
    else:
        fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache",
                                                  variant=args.demo)
    W = args.w or args.wh
    H = args.h or args.wh
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())

    def frame_cost(st):
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
        lo, hi = args.frames
        return (run(hi) - run(lo)) / (hi - lo) * 1e3

    for spec in args.cfgs:
        kv = {}
        for pair in spec.split(","):
            k, v = pair.split("=", 1)
            kv[k.strip()] = eval(v)  # noqa: S307 — operator-entered literals
        st = dataclasses.replace(r.settings, **kv)
        try:
            ms = frame_cost(st)
            print("%s: %.1f ms/frame" % (spec, ms), flush=True)
        except Exception as e:
            print("%s: FAILED %s" % (spec, str(e)[:140]), flush=True)


if __name__ == "__main__":
    main()
