#!/usr/bin/env python
"""Steady-state pool hardness: standalone trace rate vs wave index k.

The roofline's trace floor prices EVERY steady wave at the wave-3 frozen
pool's standalone rate (bench `midframe_mrays_per_sec`). In situ the ext
trace pays ~31 ms/wave at 1080p vs ~23 ms standalone on that pool — the
gap is either (a) later waves being intrinsically harder (pool drifts
toward glass-interior/grazing rays as k grows, despite 63-72% fresh
respawns per wave), which would mean the floor is too optimistic and the
envelope should use a steady-k rate, or (b) genuine in-situ overhead
worth hunting. This probe freezes the real regen pool at increasing k
and chain-traces each population with the DEFAULT integrator config
(queue kernel, prefix-active): if the rate keeps dropping past k=3 it's
(a); if it plateaus at the wave-3 rate it's (b).

Run on TPU:  python tools/probe_wavek.py [--wh 1024] [--ks 1 3 6 9 12]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, default=1024)
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 3, 6, 9, 12])
    args = ap.parse_args()

    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = H = args.wh
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cam_vec = jnp.asarray(default_camera(W, H).build_render_camera()
                          .as_array())
    packed = r.scene["packed"]
    sd = fb.max_depth + 2
    st = r.settings

    def run_m(o, d, act, M):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                    stack_depth=sd,
                                    tile_sub=st.packet_tile_sub,
                                    interleave=st.packet_interleave,
                                    queue_k=st.packet_queue_k,
                                    active=act)
            return carry + t[::65536].sum()
        g = jax.jit(lambda o_, d_, a_: jax.lax.fori_loop(
            0, M, body, jnp.float32(0.0)))
        np.asarray(g(o, d, act))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(o, d, act))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for k in args.ks:
        fn = jax.jit(make_regen_integrator(st, W, H, stop_after_waves=k),
                     static_argnames=("n_frames",))
        pool = fn(r.scene, cam_vec, jnp.uint32(1), jnp.uint32(0),
                  r.zeros_accum(), n_frames=8)
        o = jnp.asarray(np.asarray(pool["orig"]))
        d = jnp.asarray(np.asarray(pool["dir"]))
        act = jnp.asarray(np.asarray(pool["active"]).astype(np.int32))
        alive = float(np.asarray(pool["active"]).mean())
        n = o.shape[0]
        lo = run_m(o, d, act, 4)
        hi = run_m(o, d, act, 28)
        ms = max((hi - lo) / 24.0, 1e-9) * 1e3
        print("k=%2d  active %.3f  %.2f ms/wave-trace  %.1f Mrays/s"
              % (k, alive, ms, n / (ms * 1e3)), flush=True)


if __name__ == "__main__":
    main()
