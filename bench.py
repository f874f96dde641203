#!/usr/bin/env python
"""Benchmark: traversal Mrays/s on the demo scene (TestObj-equivalent).

Prints ONE JSON line:
  {"metric": "traversal_mrays_per_sec", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/100}
Baseline target: >=100 Mrays/s on one v5e chip (BASELINE.md north star).
Also reports full path-tracing throughput as extra fields.

NOTE: every measurement is synced via a device->host copy (np.asarray);
block_until_ready has been observed to return before execution completes
under the tunneled axon platform, which silently inflates throughput ~10x.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer, generate_camera_rays
    from tpu_pathtracer.tracer.traverse import pack_stream
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    W = H = 1024
    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    rc = default_camera(W, H).build_render_camera()
    cam_vec = jnp.asarray(rc.as_array())

    # primary rays in the same 32x32-block swizzled order the renderer uses
    N = W * H
    lane_ids = jnp.arange(N, dtype=jnp.uint32)
    rng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
    px = jnp.asarray(r._lane_px, jnp.float32)
    py = jnp.asarray(r._lane_py, jnp.float32)
    _, orig, raydir = generate_camera_rays(cam_vec, rng, px, py)

    packed = jnp.asarray(pack_stream(fb.prims, fb.meta))
    sd = fb.max_depth + 2

    @jax.jit
    def trace(orig, raydir):
        return packet_intersect(packed, orig, raydir, RAY_MIN, RAY_MAX,
                                stack_depth=sd, tile_sub=8)

    # warmup: compile + let the device reach steady state
    for _ in range(3):
        slot, t = trace(orig, raydir)
        _ = np.asarray(slot[-1:])

    # median of per-rep timings: robust against tunnel hiccups
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        slot, t = trace(orig, raydir)
        _ = np.asarray(slot[-1:])  # hard sync each rep
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    mrays = N / dt / 1e6

    # full render step throughput (paths/s at 1 spp per frame)
    accum = r.zeros_accum()
    accum = r.render_frame(accum, rc, 1)  # compile
    _ = np.asarray(accum[-1:])
    ftimes = []
    for f in range(2, 7):
        t0 = time.perf_counter()
        accum = r.render_frame(accum, rc, f)
        _ = np.asarray(accum[-1:])
        ftimes.append(time.perf_counter() - t0)
    dt_frame = float(np.median(ftimes))
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
