#!/usr/bin/env python
"""What fraction of path deaths are FIRST-SEGMENT (die in the wave that
spawned them)?

Those deaths are the dense-flush candidates: within the spawn window the
queue->pool mapping is affine (rank order), so their radiance can ride a
dynamic-slice ADD (bandwidth) instead of the ring's per-index scatter
(~10 ns/idx/ch). The win is bounded by this fraction x the drain cost.

For the default TestObj scene (no emissives, no media) a path dies on
its first segment iff its camera ray misses the scene, so one traversal
call over the full primary-ray population answers it. Jittered AA moves
the boundary pixels only; the aggregate fraction is stable.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.wavefront import (trace_rays,
                                                 generate_camera_rays,
                                                 lane_pixel_xy)
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    for wh, hw in ((1024, 1024), (1920, 1080)):
        W, H = wh if isinstance(wh, int) else wh, hw
        fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
        r = Renderer(fb, mats, envmap=envmap, texture=texture,
                     width=W, height=H)
        cv = jnp.asarray(default_camera(W, H).build_render_camera()
                         .as_array())
        lanes = jnp.arange(W * H, dtype=jnp.int32)
        rng = RaySampler.init(wang_hash(jnp.uint32(1)),
                              lanes.astype(jnp.uint32))
        pxi, pyi = lane_pixel_xy(lanes, W, H)
        rng, o, d = generate_camera_rays(cv, rng, pxi.astype(jnp.float32),
                                         pyi.astype(jnp.float32))
        slot, t = trace_rays(r.scene, r.settings, o, d, RAY_MIN, RAY_MAX)
        miss = float(np.mean(np.asarray(t) > 1e10))
        print("%dx%d: primary miss fraction = %.3f "
              "(= fresh-death fraction of all deaths)" % (W, H, miss),
              flush=True)


if __name__ == "__main__":
    main()
