#!/usr/bin/env python
"""Attack the large-scene (135k-tri) traversal step count (VERDICT r04 #1).

The reference's actual workload class pays a 5.3x packet-union step
explosion at fine tessellation (p50 101 vs 15 steps/packet) plus the
VMEM-path per-step handicap. Round 4 attacked step COST (split/packed
tables); this sweep attacks step COUNT through the SBVH build knobs the
packet kernel actually prices:

  * sah_triangle_cost < 1 grows leaves: a packet visiting a leaf pays one
    step per TRIANGLE but packet-union node steps are the fine-tessellation
    tax, so the optimum should sit at bigger leaves than the per-thread GPU
    tuning (reference constants src/SplitBVHBuilder.h:34-39).
  * min_leaf forces subdivision to stop early (leaf floor).
  * spatial splits duplicate refs (~1.3x rows here) — priced vs the step
    savings they buy.

Per variant: coherent-primary traversal rate at 1024^2 (chained marginal,
the bench axis) + a count_steps census (total live packet-steps, p50/p95,
implied ns/step). Winners get the in-situ 1-spp frame (--frame).

Usage: python tools/sweep_large.py [--arms default,tc0.5,...] [--frame]
       [--sub 16] [--il 4] [--queue 0]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="")
    ap.add_argument("--frame", action="store_true",
                    help="also measure the in-situ 1-spp 1024^2 frame")
    ap.add_argument("--sub", type=int, default=16)
    ap.add_argument("--il", type=int, default=4)
    ap.add_argument("--queue", type=int, default=0)
    ap.add_argument("--census", action="store_true")
    ap.add_argument("--table-mem", default="auto",
                    help="auto/vmem/split/vmem_packed")
    ap.add_argument("--unroll", type=int, default=1,
                    help="dependent steps per while iteration")
    ap.add_argument("--scene", default="large", choices=("large", "small"),
                    help="large = 135k-tri reference-scale, small = 4.4k demo")
    ap.add_argument("--gate", action="store_true",
                    help="on-device oracle gate for this kernel config "
                         "(512-ray brute-force agreement) before measuring")
    ap.add_argument("--incoherent", action="store_true",
                    help="also chain-trace a scrambled (incoherent) set")
    ap.add_argument("--midframe", action="store_true",
                    help="freeze the regen pool after 3 waves and census "
                         "THAT population (the in-situ cost driver)")
    args = ap.parse_args()

    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene import procedural
    from tpu_pathtracer.scene.demo import default_camera
    from tpu_pathtracer.scene.config import MatDesc, MAT_DIFF, MAT_FRESNEL, \
        MAT_GLASS, MAT_REFL
    from tpu_pathtracer.accel.cache import load_or_build
    from tpu_pathtracer.accel.bvh import Platform, BuildParams
    from tpu_pathtracer.tracer.renderer import Renderer, generate_camera_rays
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.tracer.traverse import pack_stream
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    mesh = (procedural.make_large_scene() if args.scene == "large"
            else procedural.make_test_scene())
    print("mesh: %d tris" % mesh.indices.shape[0], flush=True)

    variants = {
        "default": (None, None),
        "tc2": (Platform(sah_triangle_cost=2.0), None),
        "tc0.5": (Platform(sah_triangle_cost=0.5), None),
        "tc0.25": (Platform(sah_triangle_cost=0.25), None),
        "tc0.125": (Platform(sah_triangle_cost=0.125), None),
        "ml4": (Platform(min_leaf_size=4), None),
        "ml8": (Platform(min_leaf_size=8), None),
        "nospatial": (None, BuildParams(enable_spatial_splits=False)),
        "tc0.25+nospatial": (Platform(sah_triangle_cost=0.25),
                             BuildParams(enable_spatial_splits=False)),
    }
    arms = [a for a in args.arms.split(",") if a] or list(variants)

    W = H = 1024
    N = W * H
    cam = default_camera(W, H)
    rc = cam.build_render_camera()
    cv = jnp.asarray(rc.as_array())
    lane_px = lane_py = None

    mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
            MatDesc(refltype=MAT_FRESNEL, alphax=0.1, alphay=0.1,
                    kd=5.0, ks=1.0),
            MatDesc(refltype=MAT_GLASS),
            MatDesc(refltype=MAT_REFL)]
    envmap = procedural.make_sky_envmap()
    texture = procedural.make_checker_texture()

    def median_time(go, reps=3):
        np.asarray(go())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(go())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for name in arms:
        plat, bp = variants[name]
        t0 = time.perf_counter()
        fb = load_or_build(mesh, cache_dir=".bvh_cache_sweep",
                           platform=plat, params=bp)
        t_build = time.perf_counter() - t0
        packed_np = pack_stream(fb.prims, fb.meta)
        packed = jnp.asarray(packed_np)
        sd = fb.max_depth + 2
        rows = packed_np.shape[0]
        n_nodes = fb.num_nodes
        n_triref = rows - n_nodes
        # leaf-run stats from the packed stream: tri rows are consecutive;
        # a run ends at a row whose last-flag (col 13 bitcast) != 0
        last = packed_np[:, 13].view(np.int32) != 0
        is_tri = np.zeros(rows, bool)
        is_tri[n_nodes:] = True          # BFS reorder puts nodes first
        runs = []
        run = 0
        for i in range(n_nodes, rows):
            run += 1
            if last[i]:
                runs.append(run)
                run = 0
        runs = np.asarray(runs) if runs else np.asarray([0])
        print("%s: rows %d (nodes %d, trirefs %d), depth %d, "
              "leaf run mean %.2f p95 %d, build %.2fs"
              % (name, rows, n_nodes, n_triref, fb.max_depth,
                 runs.mean(), int(np.percentile(runs, 95)), t_build),
              flush=True)

        r = Renderer(fb, mats, envmap=envmap, texture=texture,
                     width=W, height=H)
        if lane_px is None:
            lane_px = jnp.asarray(r._lane_px, jnp.float32)
            lane_py = jnp.asarray(r._lane_py, jnp.float32)
            lane_ids = jnp.arange(N, dtype=jnp.uint32)
            rng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
            _, orig, raydir = generate_camera_rays(cv, rng, lane_px, lane_py)
            if args.incoherent:
                perm = np.random.default_rng(5).permutation(N)
                orig_i = jnp.asarray(np.asarray(orig)[perm])
                raydir_i = jnp.asarray(np.asarray(raydir)[perm])

        if args.gate:
            from tpu_pathtracer.tracer.traverse import brute_force_intersect
            grng = np.random.default_rng(0)
            ng = 512
            gco = grng.uniform(-3, 3, (ng, 3)).astype(np.float32)
            gco[:, 1] = grng.uniform(0.3, 3, ng)
            gcd = grng.normal(size=(ng, 3)).astype(np.float32)
            gcd /= np.linalg.norm(gcd, axis=-1, keepdims=True)
            gbt, _ = brute_force_intersect(mesh.tri_vertices(), gco, gcd,
                                           RAY_MIN, RAY_MAX)
            gs, _gt = packet_intersect(
                packed, jnp.asarray(gco), jnp.asarray(gcd), RAY_MIN,
                RAY_MAX, stack_depth=sd, tile_sub=args.sub,
                interleave=args.il, queue_k=args.queue,
                table_mem=args.table_mem, step_unroll=args.unroll)
            gs = np.asarray(gs)
            gours = np.where(gs >= 0, fb.tri_orig[np.maximum(gs, 0)], -1)
            gagree = float((gours == gbt).mean())
            assert gagree > 0.999, (
                "kernel config wrong on device: %.4f agreement" % gagree)
            print("%s: device gate OK (%.4f)" % (name, gagree), flush=True)

        def chain(o, d, M):
            def body(i, carry):
                tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
                s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                        stack_depth=sd, tile_sub=args.sub,
                                        interleave=args.il,
                                        table_mem=args.table_mem,
                                        step_unroll=args.unroll,
                                        queue_k=args.queue)
                return carry + t[::65536].sum()
            return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

        def rate(o, d):
            f8 = jax.jit(lambda o_, d_: chain(o_, d_, 8))
            f40 = jax.jit(lambda o_, d_: chain(o_, d_, 40))
            t8 = median_time(lambda: f8(o, d))
            t40 = median_time(lambda: f40(o, d))
            dt = max((t40 - t8) / 32.0, 1e-9)
            return N / dt / 1e6, dt

        mr, dt = rate(orig, raydir)
        line = "%s: coherent %.1f Mrays/s (%.1f ms/call)" % (name, mr,
                                                             dt * 1e3)
        if args.census:
            s_, t_, nst = packet_intersect(
                packed, orig, raydir, RAY_MIN, RAY_MAX, stack_depth=sd,
                tile_sub=args.sub, interleave=args.il, queue_k=args.queue,
                table_mem=args.table_mem, step_unroll=args.unroll,
                count_steps=True)
            per_pkt = np.asarray(nst).reshape(-1, args.sub * 128)[:, 0]
            tot = int(per_pkt.sum())
            # PAID steps: the while-loop runs until the instance's joint
            # max. Fixed grouping: groups of `il` consecutive packets pay
            # max*il. Queue: greedy list scheduling of queue_k consecutive
            # packets onto il slots (LPT-free, arrival order) — simulate.
            if args.queue > args.il:
                paid = 0
                pk = per_pkt
                if pk.size % args.queue:        # pad the ragged tail block
                    pk = np.pad(pk, (0, args.queue - pk.size % args.queue))
                for blk in pk.reshape(-1, args.queue):
                    slots = np.zeros(args.il)
                    for s in blk:
                        k = np.argmin(slots)
                        slots[k] += s
                    paid += int(slots.max()) * args.il
            else:
                pk = per_pkt
                if pk.size % args.il:
                    pk = np.pad(pk, (0, args.il - pk.size % args.il))
                gm = pk.reshape(-1, args.il).max(axis=1)
                paid = int(gm.sum()) * args.il
            line += ("; steps/packet p50 %d p95 %d max %d, live %.3fM, "
                     "paid %.3fM (tax %+.0f%%), %.0f ns/live-step, "
                     "%.0f ns/paid-step"
                     % (int(np.percentile(per_pkt, 50)),
                        int(np.percentile(per_pkt, 95)),
                        int(per_pkt.max()), tot / 1e6, paid / 1e6,
                        (paid / max(tot, 1) - 1) * 100,
                        dt / tot * 1e9, dt / paid * 1e9))
        print(line, flush=True)
        if args.incoherent:
            mri, dti = rate(orig_i, raydir_i)
            print("%s: incoherent(scrambled) %.1f Mrays/s" % (name, mri),
                  flush=True)

        if args.midframe:
            mf_fn = jax.jit(
                make_regen_integrator(r.settings, W, H, stop_after_waves=3),
                static_argnames=("n_frames",))
            mf_pool = mf_fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0),
                            r.zeros_accum(), n_frames=4)
            mo = jnp.asarray(np.asarray(mf_pool["orig"]))
            md = jnp.asarray(np.asarray(mf_pool["dir"]))
            mfr, mfdt = rate(mo, md)
            line2 = "%s: midframe %.1f Mrays/s (%.1f ms/call)" % (
                name, mfr, mfdt * 1e3)
            s_, t_, nst = packet_intersect(
                packed, mo, md, RAY_MIN, RAY_MAX, stack_depth=sd,
                tile_sub=args.sub, interleave=args.il, queue_k=args.queue,
                table_mem=args.table_mem, step_unroll=args.unroll,
                count_steps=True)
            per_pkt = np.asarray(nst).reshape(-1, args.sub * 128)[:, 0]
            tot = int(per_pkt.sum())
            if args.queue > args.il:
                paid = 0
                pk = per_pkt
                if pk.size % args.queue:        # pad the ragged tail block
                    pk = np.pad(pk, (0, args.queue - pk.size % args.queue))
                for blk in pk.reshape(-1, args.queue):
                    slots = np.zeros(args.il)
                    for s in blk:
                        k = np.argmin(slots)
                        slots[k] += s
                    paid += int(slots.max()) * args.il
            else:
                pk = per_pkt
                if pk.size % args.il:
                    pk = np.pad(pk, (0, args.il - pk.size % args.il))
                gm = pk.reshape(-1, args.il).max(axis=1)
                paid = int(gm.sum()) * args.il
            line2 += ("; steps/pkt p50 %d p95 %d, live %.3fM, paid %.3fM "
                      "(tax %+.0f%%), %.0f ns/paid-step"
                      % (int(np.percentile(per_pkt, 50)),
                         int(np.percentile(per_pkt, 95)), tot / 1e6,
                         paid / 1e6, (paid / max(tot, 1) - 1) * 100,
                         mfdt / paid * 1e9))
            print(line2, flush=True)

        if args.frame:
            import dataclasses as _dc
            _fst = _dc.replace(r.settings, packet_step_unroll=args.unroll)
            fn = jax.jit(make_regen_integrator(_fst, W, H),
                         static_argnames=("n_frames",))
            accum = r.zeros_accum()

            def go(M):
                def g():
                    return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0),
                              accum, n_frames=M)[0][-1:]
                return median_time(g, reps=3)
            ms = (go(5) - go(1)) / 4.0 * 1e3
            print("%s: frame %.1f ms/spp at 1024^2" % (name, ms), flush=True)


if __name__ == "__main__":
    main()
