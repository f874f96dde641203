#!/usr/bin/env python
"""Does the queue kernel's ~0.24 ms/grid-instance fixed cost scale with
TABLE BYTES (i.e. is it the per-instance SMEM table prefetch)?

Same frozen mid-frame ray population, same queue_k/tiles, but the packed
(K,16) stream is padded with inert rows (zeros past the end — child
pointers never reference them, traversal is bit-identical). If the
per-call marginal cost rises ~linearly with table bytes on the smem path
and stays flat on the vmem path, the prefetch hypothesis is confirmed
and a compressed (bf16-box) table would buy back about half of it; if
it is flat, the bf16-table idea is dead before it is built.
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
    from tpu_pathtracer.ops.traverse_packet import (
        packet_intersect, _SMEM_TABLE_BUDGET_BYTES)
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cam_vec = jnp.asarray(default_camera(W, H).build_render_camera()
                          .as_array())
    packed0 = np.asarray(r.scene["packed"])
    K0 = packed0.shape[0]
    print("base table: %d rows, %d bytes (smem budget %d)"
          % (K0, K0 * 14 * 4, _SMEM_TABLE_BUDGET_BYTES), flush=True)
    sd = fb.max_depth + 2
    st = r.settings

    fn = jax.jit(make_regen_integrator(st, W, H, stop_after_waves=3),
                 static_argnames=("n_frames",))
    pool = fn(r.scene, cam_vec, jnp.uint32(1), jnp.uint32(0),
              r.zeros_accum(), n_frames=4)
    o = jnp.asarray(np.asarray(pool["orig"]))
    d = jnp.asarray(np.asarray(pool["dir"]))
    act = jnp.asarray(np.asarray(pool["active"]).astype(np.int32))
    P = o.shape[0]
    n_tiles = P // (st.packet_tile_sub * 128 * st.packet_queue_k)

    def cost_ms(packed, table_mem, m=(4, 20)):
        def chain(M):
            def run(oo, dd, aa, pk):
                def body(i, carry):
                    tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
                    s, t = packet_intersect(
                        pk, oo, dd, tm, RAY_MAX, stack_depth=sd,
                        tile_sub=st.packet_tile_sub, table_mem=table_mem,
                        interleave=st.packet_interleave, active=aa,
                        queue_k=st.packet_queue_k)
                    return carry + t[::4096].sum()
                return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))
            gg = jax.jit(run)
            ref = np.asarray(gg(o, d, act, packed))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(gg(o, d, act, packed))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts)), float(ref)
        lo, hi = m
        (tl, rl), (th, _) = chain(lo), chain(hi)
        return (th - tl) / (hi - lo) * 1e3, rl

    refv = None
    for mult in (1.0, 1.5, 2.0):
        K = int(K0 * mult)
        if K * 14 * 4 > _SMEM_TABLE_BUDGET_BYTES:
            print("pad x%.1f over smem budget, skipping" % mult)
            continue
        pk = np.zeros((K, 16), np.float32)
        pk[:K0] = packed0
        ms, rv = cost_ms(jnp.asarray(pk), "smem")
        refv = refv if refv is not None else rv
        assert rv == refv, "padded table changed results!"
        print("smem x%.1f (%7d B, tiles=%d): %6.2f ms/call"
              % (mult, K * 14 * 4, n_tiles, ms), flush=True)
    for mult in (1.0, 2.0):
        K = int(K0 * mult)
        pk = np.zeros((K, 16), np.float32)
        pk[:K0] = packed0
        ms, rv = cost_ms(jnp.asarray(pk), "vmem")
        assert rv == refv, "padded table changed results!"
        print("vmem x%.1f (%7d B, tiles=%d): %6.2f ms/call"
              % (mult, K * 14 * 4, n_tiles, ms), flush=True)


if __name__ == "__main__":
    main()
