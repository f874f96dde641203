#!/usr/bin/env python
"""Locate the image-size-scaling cost: marginal ms / waves / rays per
frame at 1024^2 vs 1920x1080 (and optional pool-size overrides).

The 1080p dup anatomy leaves ~185 ms/frame unattributed vs ~38 at
1024^2 (ARCHITECTURE.md); this prints ms-per-wave at each resolution so
we can tell "more waves" apart from "costlier waves".
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

    overrides = {}
    for pair in sys.argv[1:]:
        k, v = pair.split("=", 1)
        overrides[k.strip()] = eval(v)  # noqa: S307 — operator literals

    for (W, H) in [(1024, 1024), (1920, 1080)]:
        r = Renderer(fb, mats, envmap=envmap, texture=texture,
                     width=W, height=H)
        st = dataclasses.replace(r.settings, **overrides)
        fn = jax.jit(make_regen_integrator(st, W, H),
                     static_argnames=("n_frames",))
        accum = r.zeros_accum()
        cv = jnp.asarray(default_camera(W, H).build_render_camera()
                         .as_array())

        def run(M):
            def go():
                return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0),
                          accum, n_frames=M)
            out = go()
            np.asarray(out[0][-1:])
            waves = float(out[1])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(go()[0][-1:])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts)), waves
        t1, w1 = run(1)
        t5, w5 = run(5)
        ms = (t5 - t1) / 4 * 1e3
        dw = (w5 - w1) / 4
        print("%dx%d %s: %.1f ms/frame, %.1f waves/frame, %.2f ms/wave"
              % (W, H, overrides or "", ms, dw, ms / dw), flush=True)


if __name__ == "__main__":
    main()
