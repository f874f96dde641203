#!/usr/bin/env python
"""Size the queue kernel's per-invocation fixed cost.

Chained-trace marginal cost at several N on the SAME frozen real
mid-frame pool population (subsampled, so the per-ray difficulty is
held constant). A nonzero intercept of ms(N) is per-call overhead the
merged ext+shadow trace would pay once instead of twice per wave.
Also prices the real in-situ populations for the ext trace (all lanes)
and the NEE shadow trace (diffuse candidates only, anyhit).
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

    def cost_ms(o, d, act, anyhit=False, m=(4, 20)):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        act = jnp.asarray(act)

        def chain(M):
            def run(o_, d_, a_):
                def body2(i, carry):
                    tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
                    s, t = packet_intersect(
                        packed, o_, d_, tm, RAY_MAX, anyhit=anyhit,
                        stack_depth=sd, tile_sub=st.packet_tile_sub,
                        interleave=st.packet_interleave, active=a_,
                        queue_k=st.packet_queue_k)
                    return carry + t[::8192].sum()
                return jax.lax.fori_loop(0, M, body2, jnp.float32(0.0))
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

    P = o_all.shape[0]
    # hold difficulty constant: stride-subsample the pool
    for n in (1 << 17, 1 << 18, 1 << 19, 1 << 20):
        step = P // n
        idx = np.arange(0, n * step, step)[:n]
        ms = cost_ms(o_all[idx], d_all[idx], a_all[idx])
        print("ext  N=%7d: %6.2f ms/call  (%.1f ns/lane)"
              % (n, ms, ms * 1e6 / n), flush=True)

    # real shadow population: diffuse candidates get a cosine draw toward
    # the env — approximate with the pool dirs flipped (the exact dirs need
    # the shade stage; activity fraction is what matters for the cost)
    diff_frac = 0.45
    rng = np.random.default_rng(0)
    act_sh = (rng.random(P) < diff_frac).astype(np.int32) & a_all
    ms = cost_ms(o_all, d_all, act_sh, anyhit=True)
    print("shadow-like N=%d (%.0f%% active, anyhit): %6.2f ms/call"
          % (P, 100 * act_sh.mean(), ms), flush=True)


if __name__ == "__main__":
    main()
