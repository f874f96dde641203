#!/usr/bin/env python
"""What IS the ~4 ms per-invocation fixed cost of the packet kernel?

Chained-call marginal cost at tiny N (1 and 2 grid tiles) for
table_mem smem vs vmem, and at several queue_k. If the intercept is
the per-tile SMEM table prefetch it should (a) vanish on the vmem
path, (b) scale with tile count.
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
    cam_vec = jnp.asarray(default_camera(W, H).build_render_camera()
                          .as_array())
    packed = r.scene["packed"]
    sd = fb.max_depth + 2
    st = r.settings

    fn = jax.jit(make_regen_integrator(st, W, H, stop_after_waves=3),
                 static_argnames=("n_frames",))
    pool = fn(r.scene, cam_vec, jnp.uint32(1), jnp.uint32(0),
              r.zeros_accum(), n_frames=4)
    o_all = np.asarray(pool["orig"])
    d_all = np.asarray(pool["dir"])
    a_all = np.asarray(pool["active"]).astype(np.int32)
    P = o_all.shape[0]

    def cost_ms(n, table_mem, qk, m=(4, 20)):
        step = P // n
        idx = np.arange(0, n * step, step)[:n]
        o = jnp.asarray(o_all[idx])
        d = jnp.asarray(d_all[idx])
        act = jnp.asarray(a_all[idx])

        def chain(M):
            def run(oo, dd, aa):
                def body(i, carry):
                    tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
                    s, t = packet_intersect(
                        packed, oo, dd, tm, RAY_MAX, stack_depth=sd,
                        tile_sub=st.packet_tile_sub, table_mem=table_mem,
                        interleave=st.packet_interleave, active=aa,
                        queue_k=qk)
                    return carry + t[::4096].sum()
                return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))
            gg = jax.jit(run)
            np.asarray(gg(o, d, act))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(gg(o, d, act))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        lo, hi = m
        return (chain(hi) - chain(lo)) / (hi - lo) * 1e3

    for tm in ("smem", "vmem"):
        for n in (65536, 131072):
            ms = cost_ms(n, tm, st.packet_queue_k)
            print("%s N=%6d (tiles=%d): %6.2f ms/call"
                  % (tm, n, n // 65536, ms), flush=True)
    # queue depth scaling at fixed N: more packets per instance =
    # fewer instances; if the intercept is per-instance it shrinks
    for qk in (16, 64, 256):
        ms = cost_ms(1 << 18, "smem", qk)
        print("smem N=262144 qk=%-3d (tiles=%d): %6.2f ms/call"
              % (qk, (1 << 18) // (8 * 128 * qk), ms), flush=True)


if __name__ == "__main__":
    main()
