#!/usr/bin/env python
"""On-device A/B: split table (SMEM BFS hot prefix + VMEM stream) vs the
plain VMEM extraction path, at reference asset scale (~135k tris, ~177k-row
packed stream ~9.9 MB — 14x the SMEM budget).

Gates correctness of every split kernel specialization on device first
(Mosaic miscompiles are config-specific and interpret mode does not catch
them), then measures:

  coherent   camera-primary traversal Mrays/s, (16,4) fixed grouping
  incoh      cosine-bounce population Mrays/s, default queue config
  frame      in-situ 1-spp frame cost at 1024^2 (sweep_frame methodology)

Run: python tools/probe_split.py [--skip-frame]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import large_scene, default_camera
    from tpu_pathtracer.scene.procedural import make_large_scene
    from tpu_pathtracer.tracer.renderer import Renderer, generate_camera_rays
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.tracer.traverse import (
        pack_stream, brute_force_intersect)
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = large_scene(cache_dir=".bvh_cache")
    mesh = make_large_scene()
    packed = jnp.asarray(pack_stream(fb.prims, fb.meta))
    sd = fb.max_depth + 2
    print("rows %d  table %.1f MB  depth %d" %
          (packed.shape[0], packed.shape[0] * 56 / 1e6, fb.max_depth),
          flush=True)

    # ---------------- correctness gates (split specializations) -----------
    rng = np.random.default_rng(0)
    n = 512
    co = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    co[:, 1] = rng.uniform(0.3, 3, n)
    cd = rng.normal(size=(n, 3)).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    bt, _ = brute_force_intersect(mesh.tri_vertices(), co, cd,
                                  RAY_MIN, RAY_MAX)
    for cfg in (dict(tile_sub=16, interleave=4),
                dict(tile_sub=8, interleave=8, queue_k=128),
                dict(tile_sub=8, interleave=8, queue_k=128,
                     active_prefix=jnp.int32(397))):
        ap = cfg.pop("active_prefix", None)
        hs, ht = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                                  RAY_MIN, RAY_MAX, stack_depth=sd,
                                  table_mem="split", active_prefix=ap, **cfg)
        hs = np.asarray(hs)
        ours = np.where(hs >= 0, fb.tri_orig[np.maximum(hs, 0)], -1)
        lim = int(ap) if ap is not None else n
        agree = float((ours[:lim] == bt[:lim]).mean())
        assert agree > 0.999, "split %s wrong on device: %.4f" % (cfg, agree)
        print("gate %s agree %.4f" % (cfg, agree), flush=True)
    ahs, _ = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                              RAY_MIN, RAY_MAX, stack_depth=sd, anyhit=True,
                              tile_sub=8, interleave=8, queue_k=128,
                              table_mem="split")
    ah = float(((np.asarray(ahs) >= 0) == (bt >= 0)).mean())
    assert ah > 0.999, "split anyhit wrong on device: %.4f" % ah
    print("gate anyhit agree %.4f" % ah, flush=True)

    # ---------------- traversal-rate A/B ----------------
    W = H = 1024
    N = W * H
    rc = default_camera(W, H).build_render_camera()
    cam_vec = jnp.asarray(rc.as_array())
    lane_ids = jnp.arange(N, dtype=jnp.uint32)
    srng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.float32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.float32), W))
    _, orig, raydir = generate_camera_rays(cam_vec, srng, xs, ys)

    def run_m(o, d, M, mode, tile_sub=16, interleave=4, queue_k=0):
        def chain(o_, d_):
            def body(i, carry):
                tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
                s, t = packet_intersect(packed, o_, d_, tm, RAY_MAX,
                                        stack_depth=sd, tile_sub=tile_sub,
                                        interleave=interleave,
                                        queue_k=queue_k, table_mem=mode)
                return carry + t[::65536].sum()
            return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

        g = jax.jit(chain)
        _ = np.asarray(g(o, d))
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            r_ = g(o, d)
            _ = np.asarray(r_)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for mode in ("vmem", "split"):
        lo = run_m(orig, raydir, 4, mode)
        hi = run_m(orig, raydir, 20, mode)
        dt = max((hi - lo) / 16.0, 1e-9)
        print("coherent  %-5s %7.1f Mrays/s" % (mode, N / dt / 1e6),
              flush=True)

    # incoherent: bounce rays from primary hits
    from tpu_pathtracer.tracer.traverse import woop_geometric_normal
    hs, ht = packet_intersect(packed, orig, raydir, RAY_MIN, RAY_MAX,
                              stack_depth=sd, tile_sub=16,
                              table_mem="split")
    gn = np.asarray(woop_geometric_normal(jnp.asarray(fb.prims),
                                          fb.num_nodes, hs))
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
    for mode in ("vmem", "split"):
        lo = run_m(b_orig, b_dir, 2, mode, tile_sub=8, interleave=8,
                   queue_k=128)
        hi = run_m(b_orig, b_dir, 10, mode, tile_sub=8, interleave=8,
                   queue_k=128)
        dt = max((hi - lo) / 8.0, 1e-9)
        print("incoh     %-5s %7.1f Mrays/s" % (mode, N / dt / 1e6),
              flush=True)

    if "--skip-frame" in sys.argv:
        return

    # ---------------- in-situ frame A/B at 1024^2 ----------------
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())

    def frame_cost(st):
        fn = jax.jit(make_regen_integrator(st, W, H),
                     static_argnames=("n_frames",))
        accum = r.zeros_accum()

        def run(M):
            def go():
                return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0), accum,
                          n_frames=M)
            out = go()
            _ = np.asarray(out[0][-1:])
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                out = go()
                _ = np.asarray(out[0][-1:])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return (run(5) - run(1)) / 4.0 * 1e3

    for mode in ("vmem", "split"):
        st = dataclasses.replace(r.settings, packet_table_mem=mode)
        print("frame 1024^2 %-5s %8.1f ms" % (mode, frame_cost(st)),
              flush=True)


if __name__ == "__main__":
    main()
