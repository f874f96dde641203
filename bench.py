#!/usr/bin/env python
"""Benchmark: traversal Mrays/s on the demo scene (TestObj-equivalent).

Prints ONE JSON line:
  {"metric": "traversal_mrays_per_sec", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/100}
Baseline target: >=100 Mrays/s on one v5e chip (BASELINE.md north star).

Methodology: the tunneled axon runtime adds ~30-50 ms of dispatch+readback
latency to EVERY host-visible call (a bare jnp multiply measures ~43 ms), so
single-call timings are meaningless. We chain M executions inside one
compiled program (fori_loop) and report the MARGINAL cost
(t(M_hi) - t(M_lo)) / (M_hi - M_lo), device-synced via np.asarray.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _median_time(fn, sync, reps=5):
    fn()  # warm
    sync()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        sync()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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

    N = W * H
    lane_ids = jnp.arange(N, dtype=jnp.uint32)
    rng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
    px = jnp.asarray(r._lane_px, jnp.float32)
    py = jnp.asarray(r._lane_py, jnp.float32)
    _, orig, raydir = generate_camera_rays(cam_vec, rng, px, py)

    packed = jnp.asarray(pack_stream(fb.prims, fb.meta))
    sd = fb.max_depth + 2

    # on-device correctness gate: Mosaic miscompiles have produced
    # silently-wrong kernels that interpret mode does not catch
    from tpu_pathtracer.tracer.traverse import brute_force_intersect
    from tpu_pathtracer.scene.procedural import make_test_scene
    chk = np.random.default_rng(0)
    n_chk = 512
    co = chk.uniform(-3, 3, (n_chk, 3)).astype(np.float32)
    co[:, 1] = chk.uniform(0.3, 3, n_chk)
    cd = chk.normal(size=(n_chk, 3)).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    cs, ct = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                              RAY_MIN, RAY_MAX, stack_depth=sd, tile_sub=8)
    cs = np.asarray(cs)
    bt, _ = brute_force_intersect(make_test_scene().tri_vertices(), co, cd,
                                  RAY_MIN, RAY_MAX)
    ours = np.where(cs >= 0, fb.tri_orig[np.maximum(cs, 0)], -1)
    agree = float((ours == bt).mean())
    assert agree > 0.999, (
        "packet kernel wrong on device: %.4f agreement" % agree)

    def chained_trace(o, d, M):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                    stack_depth=sd, tile_sub=8)
            return carry + t[::65536].sum()
        return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

    out = {}

    def run_m(M):
        g = jax.jit(lambda o, d: chained_trace(o, d, M))
        box = {}

        def fn():
            box["r"] = g(orig, raydir)

        def sync():
            _ = np.asarray(box["r"])
        return _median_time(fn, sync)

    t_lo = run_m(8)
    t_hi = run_m(136)
    dt = max((t_hi - t_lo) / 128.0, 1e-9)
    mrays = N / dt / 1e6

    # full render step marginal cost (1 spp per frame over the whole image)
    accum = r.zeros_accum()

    def run_frames(M):
        box = {}

        def fn():
            box["r"] = r.render_frames(accum, rc, 1, M)

        def sync():
            _ = np.asarray(box["r"][-1:])
        return _median_time(fn, sync, reps=4)

    f_lo = run_frames(1)
    f_hi = run_frames(5)
    dtf = max((f_hi - f_lo) / 4.0, 1e-9)
    paths_per_s = N / dtf / 1e6

    print(json.dumps({
        "metric": "traversal_mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "extra": {
            "device": str(jax.devices()[0]),
            "resolution": "%dx%d" % (W, H),
            "render_mpaths_per_sec": round(paths_per_s, 3),
            "ms_per_frame_1spp": round(dtf * 1e3, 2),
            "dispatch_latency_ms": round(t_lo * 1e3, 1),
            "methodology": "marginal cost of chained in-program executions",
        },
    }))


if __name__ == "__main__":
    main()
