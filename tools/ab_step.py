#!/usr/bin/env python
"""On-device A/B of the packet step body (fused vs branch).

Gates each (mode, anyhit) kernel specialization against the brute-force
oracle first (interpret mode does NOT catch real-TPU Mosaic miscompiles),
then measures standalone coherent + incoherent chained trace rates and
the real 1-spp frame cost at 1024^2 for both modes.
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.scene.procedural import make_test_scene
    from tpu_pathtracer.tracer.renderer import Renderer, generate_camera_rays
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.tracer.traverse import (brute_force_intersect,
                                                pack_stream)
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    packed = jnp.asarray(pack_stream(fb.prims, fb.meta))
    sd = fb.max_depth + 2
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())
    st0 = r.settings
    sub, il = st0.packet_tile_sub, st0.packet_interleave

    # ---------------- on-device correctness gate ----------------
    chk = np.random.default_rng(0)
    n_chk = 512
    co = chk.uniform(-3, 3, (n_chk, 3)).astype(np.float32)
    co[:, 1] = chk.uniform(0.3, 3, n_chk)
    cd = chk.normal(size=(n_chk, 3)).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    bt, _ = brute_force_intersect(make_test_scene().tri_vertices(), co, cd,
                                  RAY_MIN, RAY_MAX)
    for mode in ("fused", "branch"):
        cs, _ = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                                 RAY_MIN, RAY_MAX, stack_depth=sd,
                                 tile_sub=sub, interleave=il, step_mode=mode)
        cs = np.asarray(cs)
        ours = np.where(cs >= 0, fb.tri_orig[np.maximum(cs, 0)], -1)
        agree = float((ours == bt).mean())
        print("gate %s closest-hit: %.4f" % (mode, agree), flush=True)
        assert agree > 0.999, mode
        ahs, _ = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                                  RAY_MIN, RAY_MAX, stack_depth=sd,
                                  anyhit=True, tile_sub=sub, interleave=il,
                                  step_mode=mode)
        ah = float(((np.asarray(ahs) >= 0) == (bt >= 0)).mean())
        print("gate %s anyhit: %.4f" % (mode, ah), flush=True)
        assert ah > 0.999, mode

    # ---------------- standalone chained trace rates ----------------
    N = W * H
    lane_ids = jnp.arange(N, dtype=jnp.uint32)
    rng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
    px = jnp.asarray(r._lane_px, jnp.float32)
    py = jnp.asarray(r._lane_py, jnp.float32)
    _, orig, raydir = generate_camera_rays(cv, rng, px, py)

    def run_m(o, d, M, mode):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                    stack_depth=sd, tile_sub=sub,
                                    interleave=il, step_mode=mode)
            return carry + t[::65536].sum()
        g = jax.jit(lambda o_, d_: jax.lax.fori_loop(0, M, body,
                                                     jnp.float32(0.0)))
        np.asarray(g(o, d))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(o, d))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # incoherent population: cosine bounce rays from primary hits
    from tpu_pathtracer.tracer.traverse import woop_geometric_normal
    hs, ht = packet_intersect(packed, orig, raydir, RAY_MIN, RAY_MAX,
                              stack_depth=sd, tile_sub=sub, interleave=il)
    gn = np.asarray(woop_geometric_normal(r.scene["prims"],
                                          r.scene["num_nodes"], hs))
    o_np, d_np = np.asarray(orig), np.asarray(raydir)
    gn = np.where((np.sum(gn * d_np, -1) < 0.0)[:, None], gn, -gn)
    hp = o_np + d_np * np.asarray(ht)[:, None]
    prng = np.random.default_rng(7)
    u1 = prng.uniform(size=N).astype(np.float32)
    u2 = prng.uniform(size=N).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2.0 * np.pi * u2
    t1 = np.cross(gn, np.where(np.abs(gn[:, 2:3]) < 0.9,
                               [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]))
    t1 /= np.maximum(np.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = np.cross(gn, t1)
    bd = (t1 * (rad * np.cos(phi))[:, None]
          + t2 * (rad * np.sin(phi))[:, None]
          + gn * np.sqrt(np.maximum(1.0 - u1, 0.0))[:, None])
    hit_idx = np.where(np.asarray(hs) >= 0)[0]
    wrap = hit_idx[np.arange(N) % hit_idx.size]
    b_orig = jnp.asarray((hp + gn * 1e-3)[wrap].astype(np.float32))
    b_dir = jnp.asarray(bd[wrap].astype(np.float32))

    for mode in ("fused", "branch"):
        lo = run_m(orig, raydir, 8, mode)
        hi = run_m(orig, raydir, 72, mode)
        coh = N / max((hi - lo) / 64.0, 1e-9) / 1e6
        lo = run_m(b_orig, b_dir, 4, mode)
        hi = run_m(b_orig, b_dir, 28, mode)
        inc = N / max((hi - lo) / 24.0, 1e-9) / 1e6
        print("%s: coherent %.1f Mrays/s  incoherent %.1f Mrays/s"
              % (mode, coh, inc), flush=True)

    # ---------------- real frame cost ----------------
    def frame_cost(st):
        fn = jax.jit(make_regen_integrator(st, W, H),
                     static_argnames=("n_frames",))
        accum = r.zeros_accum()

        def run(M):
            def go():
                return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0), accum,
                          n_frames=M)
            np.asarray(go()[0][-1:])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(go()[0][-1:])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return (run(5) - run(1)) / 4.0 * 1e3

    for mode in ("fused", "branch"):
        st = dataclasses.replace(st0, packet_step=mode)
        print("%s: %.1f ms/frame @1024^2" % (mode, frame_cost(st)),
              flush=True)


if __name__ == "__main__":
    main()
