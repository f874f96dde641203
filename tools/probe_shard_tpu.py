#!/usr/bin/env python
"""Validate shard_map + Pallas composition on REAL TPU hardware.

VERDICT r02 weak#6: the sharded regen path was only ever exercised on
virtual CPU meshes, where ShardedRenderer force-switches traversal off
the Pallas packet kernel — so shard_map + Pallas never composed anywhere.
This rig has ONE TPU chip, which is still enough to prove the
composition: a 1-device TPU mesh runs the SAME shard_map program
(axis_index, lane offsets, sharded accum, check_vma=False) with the
packet kernel active inside the shard body.

Checks:
  1. sharded-over-1-TPU render == plain single-device render (bitwise or
     near — both run the identical regen program modulo the shard_map
     wrapper).
  2. marginal frame cost sharded vs plain (the shard_map wrapper tax).

Run:  python tools/probe_shard_tpu.py  [--wh 512] [--frames 1 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, default=512)
    ap.add_argument("--w", type=int, default=0)
    ap.add_argument("--h", type=int, default=0)
    ap.add_argument("--demo", default="default",
                    help="testobj_scene variant (media/subsurface exercise "
                         "the (32,4) workload-class packet shape)")
    ap.add_argument("--frames", type=int, nargs=2, default=(1, 5))
    args = ap.parse_args()

    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.parallel.sharding import ShardedRenderer, make_mesh

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    W = args.w or args.wh
    H = args.h or args.wh
    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache",
                                              variant=args.demo)
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cam = default_camera(W, H).build_render_camera()

    mesh = make_mesh([dev])
    sr = ShardedRenderer(r, mesh)
    assert sr.eff_settings.traversal == r.settings.traversal, (
        "TPU mesh must keep the packet kernel: %s vs %s"
        % (sr.eff_settings.traversal, r.settings.traversal))
    print("sharded traversal setting:", sr.eff_settings.traversal,
          "(packet kernel runs INSIDE shard_map)", flush=True)

    # --- correctness: sharded == plain on device ---
    t0 = time.perf_counter()
    acc_p = np.asarray(r.render_frames(r.zeros_accum(), cam, 1, 2))
    print("plain compile+2spp: %.1f s" % (time.perf_counter() - t0),
          flush=True)
    t0 = time.perf_counter()
    acc_s = np.asarray(sr.render_frames(sr.zeros_accum(), cam, 1, 2))
    print("sharded compile+2spp: %.1f s" % (time.perf_counter() - t0),
          flush=True)
    acc_s = acc_s[: W * H]
    dmax = float(np.abs(acc_p - acc_s).max())
    bit = bool((acc_p == acc_s).all())
    print("maxdiff plain-vs-sharded: %g  bitwise: %s" % (dmax, bit),
          flush=True)
    assert dmax < 5e-3, "sharded render diverges on TPU: %g" % dmax

    # --- marginal frame cost: shard_map wrapper tax ---
    lo, hi = args.frames

    def cost(rr, acc):
        def run(M):
            def go():
                return rr.render_frames(acc, cam, 1, M)
            np.asarray(go()[:1])
            ts = []
            for _ in range(3):
                t1 = time.perf_counter()
                np.asarray(go()[:1])
                ts.append(time.perf_counter() - t1)
            return float(np.median(ts))
        return (run(hi) - run(lo)) / (hi - lo) * 1e3

    ms_p = cost(r, r.zeros_accum())
    ms_s = cost(sr, sr.zeros_accum())
    print("marginal ms/frame @%dx%d  plain: %.1f  sharded(1-TPU-mesh): %.1f "
          "(tax %+.1f%%)" % (W, H, ms_p, ms_s, (ms_s / ms_p - 1) * 100),
          flush=True)


if __name__ == "__main__":
    main()
