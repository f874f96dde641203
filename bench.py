#!/usr/bin/env python
"""Benchmark: traversal Mrays/s on the demo scene (TestObj-equivalent).

Prints ONE JSON line:
  {"metric": "traversal_mrays_per_sec", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/100}
Baseline target: >=100 Mrays/s on one v5e chip (BASELINE.md north star).
Also reports full path-tracing throughput as extra fields.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer, generate_camera_rays
    from tpu_pathtracer.tracer.traverse import intersect_scene
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    W = H = 1024
    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    rc = default_camera(W, H).build_render_camera()
    cam_vec = jnp.asarray(rc.as_array())

    N = W * H
    lane_ids = jnp.arange(N, dtype=jnp.uint32)
    rng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
    row = (lane_ids // W).astype(jnp.float32)
    col = (lane_ids % W).astype(jnp.float32)
    _, orig, raydir = generate_camera_rays(cam_vec, rng, col, row)

    prims = jnp.asarray(fb.prims)
    meta = jnp.asarray(fb.meta)

    @jax.jit
    def trace(orig, raydir):
        return intersect_scene(prims, meta, fb.num_nodes, orig, raydir,
                               RAY_MIN, RAY_MAX)

    # warmup/compile
    slot, t = trace(orig, raydir)
    slot.block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        slot, t = trace(orig, raydir)
    slot.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    mrays = N / dt / 1e6

    # full render step throughput (paths/s at 1 spp per frame)
    accum = r.zeros_accum()
    accum = r.render_frame(accum, rc, 1)  # compile
    accum.block_until_ready()
    t0 = time.perf_counter()
    frames = 3
    for f in range(2, 2 + frames):
        accum = r.render_frame(accum, rc, f)
    accum.block_until_ready()
    dt_frame = (time.perf_counter() - t0) / frames
    paths_per_s = N / dt_frame / 1e6

    print(json.dumps({
        "metric": "traversal_mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "extra": {
            "device": str(jax.devices()[0]),
            "resolution": "%dx%d" % (W, H),
            "render_mpaths_per_sec": round(paths_per_s, 3),
            "ms_per_frame_1spp": round(dt_frame * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
