#!/usr/bin/env python
"""Diagnose the in-situ vs standalone trace-rate gap (bench r03).

bench.py prices the extension trace inside a real wave at ~25 Mrays/s
(ext_trace dup: 39.6 ms / 1M-lane wave at 1024^2) while the standalone
incoherent axis measures ~96 Mrays/s. Two hypotheses:

  H1  the real mid-frame pool population is intrinsically harder than the
      bench's cosine-from-primary-hit rays (glass interiors, grazing rays,
      mixed generations);
  H2  per-wave overhead the standalone chain amortizes away (the (P,3) ->
      9x(rows,128) repack is loop-invariant in the standalone chain and
      gets hoisted, but is paid every wave in situ).

This probe freezes the REAL regen pool after k waves (stop_after_waves
hook), then measures the standalone chained trace rate on exactly those
rays. Population ~= bench rate => H2 (attack the repack); population slow
=> H1 (the rays themselves are the bottleneck; envelope must use this
number).
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
    rc = default_camera(W, H).build_render_camera()
    cam_vec = jnp.asarray(rc.as_array())
    packed = r.scene["packed"]
    sd = fb.max_depth + 2
    st = r.settings

    def run_m(o, d, act, M, tile_sub, il):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                    stack_depth=sd, tile_sub=tile_sub,
                                    interleave=il, active=act)
            return carry + t[::65536].sum()
        g = jax.jit(lambda o_, d_, a_: jax.lax.fori_loop(
            0, M, body, jnp.float32(0.0)))
        out = g(o, d, act)
        np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(o, d, act))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def rate(o, d, act, tile_sub=None, il=None):
        ts = st.packet_tile_sub if tile_sub is None else tile_sub
        ii = st.packet_interleave if il is None else il
        n = o.shape[0]
        lo = run_m(o, d, act, 4, ts, ii)
        hi = run_m(o, d, act, 28, ts, ii)
        return n / max((hi - lo) / 24.0, 1e-9) / 1e6

    for k in (1, 2, 3, 5):
        fn = jax.jit(make_regen_integrator(st, W, H, stop_after_waves=k),
                     static_argnames=("n_frames",))
        pool = fn(r.scene, cam_vec, jnp.uint32(1), jnp.uint32(0),
                  r.zeros_accum(), n_frames=4)
        o = jnp.asarray(np.asarray(pool["orig"]))
        d = jnp.asarray(np.asarray(pool["dir"]))
        act = jnp.asarray(np.asarray(pool["active"]).astype(np.int32))
        alive = float(np.asarray(pool["active"]).mean())
        mr = rate(o, d, act)
        print("after %d waves: active %.3f  standalone trace %.1f Mrays/s"
              % (k, alive, mr), flush=True)


if __name__ == "__main__":
    main()
