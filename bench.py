#!/usr/bin/env python
"""Benchmark against BASELINE.json: "Mrays/sec + time-to-1024spp at 1080p
(TestObj scene)".

Prints ONE JSON line whose headline is the WEAKEST of the baseline axes:

  axis 1  traversal_mrays_per_sec   coherent-primary BVH traversal at
                                    1024^2; baseline bar 100 Mrays/s
                                    (BASELINE.md north star, one v5e chip).
  axis 2  render_mrays_per_sec      end-to-end progressive render at
                                    1920x1080 counting rays actually traced
                                    (path segments + NEE shadow rays),
                                    against the same 100 Mrays/s bar: the
                                    reference's whole value proposition is
                                    the interactive 1080p loop
                                    (reference src/main.cpp:154-247), so the
                                    end-to-end rate must meet the bar too.

  time_to_1024spp_1080p_min is reported alongside (it is axis 2 expressed
  in wall-clock: baseline time = rays(1024 spp) / 100e6).

Methodology: the tunneled axon runtime adds ~30-60 ms of dispatch+readback
latency to EVERY host-visible call and its block_until_ready can return
early, so single-call timings are meaningless. We chain M executions (or
M progressive frames) inside one compiled program and report the MARGINAL
cost (t(M_hi) - t(M_lo)) / (M_hi - M_lo), device-synced via np.asarray.
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
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.tracer.traverse import pack_stream
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    packed = jnp.asarray(pack_stream(fb.prims, fb.meta))
    sd = fb.max_depth + 2

    # ---------------- on-device kernel correctness gate ----------------
    # Mosaic miscompiles have produced silently-wrong kernels that
    # interpret mode does not catch — never report a number from an
    # unchecked kernel.
    from tpu_pathtracer.tracer.traverse import brute_force_intersect
    from tpu_pathtracer.scene.procedural import make_test_scene
    chk = np.random.default_rng(0)
    n_chk = 512
    co = chk.uniform(-3, 3, (n_chk, 3)).astype(np.float32)
    co[:, 1] = chk.uniform(0.3, 3, n_chk)
    cd = chk.normal(size=(n_chk, 3)).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    bt, _ = brute_force_intersect(make_test_scene().tri_vertices(), co, cd,
                                  RAY_MIN, RAY_MAX)
    # gate EVERY kernel specialization a number below is measured with —
    # Mosaic miscompiles are config-specific (a sub=8 gate says nothing
    # about the sub=64 instance the regen integrator runs)
    from tpu_pathtracer.tracer.wavefront import RenderSettings
    _defaults = RenderSettings()
    gate_cfgs = {(8, 4, "auto"), (16, 4, "auto"),
                 (_defaults.packet_tile_sub, _defaults.packet_interleave,
                  "auto"),
                 # the VMEM fallback kernel (scenes with tables > the SMEM
                 # budget run this) is a distinct Mosaic specialization —
                 # gate it too
                 (_defaults.packet_tile_sub, _defaults.packet_interleave,
                  "vmem")}
    for g_sub, g_il, g_mem in sorted(gate_cfgs):
        cs, ct = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                                  RAY_MIN, RAY_MAX, stack_depth=sd,
                                  tile_sub=g_sub, interleave=g_il,
                                  table_mem=g_mem)
        cs = np.asarray(cs)
        ours = np.where(cs >= 0, fb.tri_orig[np.maximum(cs, 0)], -1)
        agree = float((ours == bt).mean())
        assert agree > 0.999, (
            "packet kernel (%d,%d,%s) wrong on device: %.4f agreement"
            % (g_sub, g_il, g_mem, agree))
    # anyhit is a distinct early-out path in the kernel: a hit must exist
    # along [tmin, tmax] iff the closest-hit oracle found one
    d_sub = _defaults.packet_tile_sub
    d_il = _defaults.packet_interleave
    ahs, _ = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                              RAY_MIN, RAY_MAX, stack_depth=sd, anyhit=True,
                              tile_sub=d_sub, interleave=d_il)
    ah_agree = float(((np.asarray(ahs) >= 0) == (bt >= 0)).mean())
    assert ah_agree > 0.999, (
        "anyhit kernel wrong on device: %.4f agreement" % ah_agree)

    # ---------------- axis 1: traversal Mrays/s at 1024^2 ----------------
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    rc = default_camera(W, H).build_render_camera()
    cam_vec = jnp.asarray(rc.as_array())

    N = W * H
    lane_ids = jnp.arange(N, dtype=jnp.uint32)
    rng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
    px = jnp.asarray(r._lane_px, jnp.float32)
    py = jnp.asarray(r._lane_py, jnp.float32)
    _, orig, raydir = generate_camera_rays(cam_vec, rng, px, py)

    def chained_trace(o, d, M):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            # (16,4) measured best for coherent primaries on v5e
            # (364 Mrays/s vs 275 at sub=8, 268 at sub=32)
            s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                    stack_depth=sd, tile_sub=16)
            return carry + t[::65536].sum()
        return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

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
    trav_mrays = N / dt / 1e6

    # ------------- axis 2: end-to-end render at 1920x1080 -------------
    def frame_cost(width, height, reps=4):
        """(ms_per_frame_1spp, rays_per_frame, waves_per_frame) via the
        marginal cost of chaining n_frames progressive samples inside one
        device program, using the default (regen) integrator."""
        rr = Renderer(fb, mats, envmap=envmap, texture=texture,
                      width=width, height=height)
        rcam = default_camera(width, height).build_render_camera()
        cv = jnp.asarray(rcam.as_array())
        fn = jax.jit(
            make_regen_integrator(rr.settings, width, height,
                                  with_stats=True),
            static_argnames=("n_frames",))
        accum = rr.zeros_accum()

        stats = {}

        def run(M):
            box = {}

            def gofn():
                box["r"] = fn(rr.scene, cv, jnp.uint32(1), jnp.uint32(0),
                              accum, n_frames=M)

            def sync():
                _ = np.asarray(box["r"][0][-1:])
            t = _median_time(gofn, sync, reps=reps)
            stats[M] = (float(np.asarray(box["r"][2])),
                        int(np.asarray(box["r"][1])))
            return t

        f_lo = run(1)
        f_hi = run(3)
        dtf = max((f_hi - f_lo) / 2.0, 1e-9)
        rays = (stats[3][0] - stats[1][0]) / 2.0
        waves = (stats[3][1] - stats[1][1]) / 2.0
        return dtf * 1e3, rays, waves

    ms_hd, rays_hd, waves_hd = frame_cost(1920, 1080)
    render_mrays = rays_hd / (ms_hd / 1e3) / 1e6
    tt1024_min = ms_hd * 1024.0 / 60e3
    baseline_tt_min = rays_hd * 1024.0 / 100e6 / 60.0

    # 1024^2 frame cost for cross-round comparability (BENCH_r01 extra)
    ms_sq, rays_sq, _ = frame_cost(1024, 1024, reps=3)

    ax1 = trav_mrays / 100.0
    ax2 = render_mrays / 100.0
    extra = {
        "device": str(jax.devices()[0]),
        "traversal_mrays_per_sec": round(trav_mrays, 2),
        "render_mrays_per_sec_1080p": round(render_mrays, 3),
        "time_to_1024spp_1080p_min": round(tt1024_min, 2),
        "baseline_time_to_1024spp_1080p_min": round(baseline_tt_min, 2),
        "ms_per_frame_1spp_1080p": round(ms_hd, 1),
        "rays_per_frame_1080p": round(rays_hd),
        "waves_per_frame_1080p": round(waves_hd, 1),
        "ms_per_frame_1spp": round(ms_sq, 2),          # 1024^2, r01 key
        "render_mpaths_per_sec": round(1024 * 1024 / ms_sq / 1e3, 3),
        "vs_baseline_traversal": round(ax1, 4),
        "vs_baseline_render": round(ax2, 4),
        "dispatch_latency_ms": round(t_lo * 1e3, 1),
        "methodology": "marginal cost of chained in-program executions; "
                       "headline = weakest baseline axis",
    }
    if ax1 <= ax2:
        head = {"metric": "traversal_mrays_per_sec",
                "value": round(trav_mrays, 2), "unit": "Mrays/s",
                "vs_baseline": round(ax1, 4)}
    else:
        head = {"metric": "render_mrays_per_sec_1080p",
                "value": round(render_mrays, 3), "unit": "Mrays/s",
                "vs_baseline": round(ax2, 4)}
    head["extra"] = extra
    print(json.dumps(head))


if __name__ == "__main__":
    main()
