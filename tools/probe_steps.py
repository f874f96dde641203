#!/usr/bin/env python
"""Step-count roofline probe: how many packet steps does the REAL
mid-frame ray population need, and what does a step cost in situ?

Freezes the regen pool after k waves (stop_after_waves), traces it once
with count_steps=True, and reports:
  - live steps per packet (mean / p50 / p95 / max) and the joint-max
    per kernel instance (what the while-loop actually pays),
  - the interleave tax: sum(instance max*G) vs sum(individual packets),
  - implied ns per joint step from the measured chained trace time.
"""
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
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())
    packed = r.scene["packed"]
    sd = fb.max_depth + 2
    st = r.settings
    sub, il = st.packet_tile_sub, st.packet_interleave

    def timed_rate(o, d, act):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                    stack_depth=sd, tile_sub=sub,
                                    interleave=il, active=act)
            return carry + t[::65536].sum()

        def run(M):
            g = jax.jit(lambda o_, d_, a_: jax.lax.fori_loop(
                0, M, body, jnp.float32(0.0)))
            np.asarray(g(o, d, act))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(o, d, act))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return max((run(28) - run(4)) / 24.0, 1e-9)

    for k in (1, 3):
        fn = jax.jit(make_regen_integrator(st, W, H, stop_after_waves=k),
                     static_argnames=("n_frames",))
        pool = fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0),
                  r.zeros_accum(), n_frames=4)
        o = jnp.asarray(np.asarray(pool["orig"]))
        d = jnp.asarray(np.asarray(pool["dir"]))
        act = jnp.asarray(np.asarray(pool["active"]).astype(np.int32))

        _, _, ns = packet_intersect(packed, o, d, RAY_MIN, RAY_MAX,
                                    stack_depth=sd, tile_sub=sub,
                                    interleave=il, active=act,
                                    count_steps=True)
        # one count per packet: lanes of a packet share the value
        per_lane = np.asarray(ns).reshape(-1, sub * 128)[:, 0]
        packs = per_lane.reshape(-1, il)          # [instance, g]
        live_sum = packs.sum()
        joint = packs.max(axis=1)                 # while-loop trips
        paid = joint.sum() * il                   # steps the hw executes
        t_trace = timed_rate(o, d, act)
        print("after %d waves: steps/packet mean %.0f p50 %.0f p95 %.0f "
              "max %d" % (k, per_lane.mean(), np.percentile(per_lane, 50),
                          np.percentile(per_lane, 95), per_lane.max()),
              flush=True)
        print("  interleave tax: paid %.2fM vs live %.2fM (+%.0f%%); "
              "trace %.1f ms -> %.0f ns/joint-step, %.0f ns/paid-step"
              % (paid / 1e6, live_sum / 1e6,
                 100.0 * (paid - live_sum) / max(live_sum, 1),
                 t_trace * 1e3, t_trace / max(joint.sum(), 1) * 1e9,
                 t_trace / max(paid, 1) * 1e9), flush=True)
        # what would an ORACLE mate assignment pay? (sort packets by their
        # actual step count, group consecutive il as mates: equal-cost
        # mates minimize il*max). Bounds any predictor-based rebalancing —
        # if even the oracle barely helps, the tail is BETWEEN instances,
        # not within them, and rebalancing is a dead end.
        oracle = np.sort(per_lane)[::-1].reshape(-1, il)
        paid_o = oracle.max(axis=1).sum() * il
        print("  oracle mate assignment would pay %.2fM (+%.0f%% tax)"
              % (paid_o / 1e6,
                 100.0 * (paid_o - live_sum) / max(live_sum, 1)),
              flush=True)


if __name__ == "__main__":
    main()
