#!/usr/bin/env python
"""Device-side profile of the real frame: exact per-op (fusion) times.

jax.profiler works through the axon relay and records TPU-side op
durations — ground truth that replaces the dup-method estimates. Traces
M chained 1-spp frames at --wh, aggregates device op durations, and
prints the top ops with their share of the while-loop body. Fusion
names are matched to HLO content (gather/scatter/sort/custom-call) via
the compiled module text when --hlo is given.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--hlo", action="store_true",
                    help="dump compiled HLO to /tmp/frame_hlo.txt for "
                         "fusion-name forensics")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = H = args.wh
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())
    fn = jax.jit(make_regen_integrator(r.settings, W, H),
                 static_argnames=("n_frames",))
    accum = r.zeros_accum()

    def go():
        return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0), accum,
                  n_frames=args.frames)
    out = go()
    np.asarray(out[0][-1:])
    waves = float(out[1])
    if args.hlo:
        txt = jax.jit(
            lambda s, c, a: fn(s, c, jnp.uint32(1), jnp.uint32(0), a,
                               n_frames=args.frames)
        ).lower(r.scene, cv, accum).compile().as_text()
        with open("/tmp/frame_hlo.txt", "w") as f:
            f.write(txt)
        print("HLO -> /tmp/frame_hlo.txt (%d KB)" % (len(txt) // 1024))

    logdir = "/tmp/jaxprof_frame"
    os.system("rm -rf " + logdir)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        np.asarray(go()[0][-1:])
    wall = time.perf_counter() - t0

    tr = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.loads(gzip.open(tr).read())
    ev = d["traceEvents"]
    pid_dev = None
    for e in ev:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")):
            pid_dev = e["pid"]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") == pid_dev:
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = sum(v for k, v in dur.items()
                if not k.startswith(("jit_", "while")))
    print("wall %.1f ms, %d frames, %.1f waves; device op sum %.1f ms"
          % (wall * 1e3, args.frames, waves, total / 1e3))
    for n, v in dur.most_common(args.top):
        if n.startswith(("jit_", "while")):
            continue
        print("%9.2f ms  x%-4d %s" % (v / 1e3, cnt[n], n[:90]))


if __name__ == "__main__":
    main()
