#!/usr/bin/env python
"""Device-side MARGINAL profile of the real frame: exact per-op times.

jax.profiler works through the axon relay and records TPU-side op
durations (hlo_category + long_name per event) — ground truth that
replaces the dup-method estimates. Profiles a LO-frame and a HI-frame
chained render and prints (hi - lo)/(HI - LO) per op: the drain-tail
waves and one-time ops cancel in the diff, leaving the true
steady-state per-frame anatomy. Container ops (conditional/while/
fusion-parents) are skipped to avoid double-counting their children.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_SKIP = ("while", "conditional")


def classify(name, long_name):
    """Human label from the HLO long_name."""
    if "custom-call" in long_name and "8192,128" in long_name:
        return "pallas packet trace"
    if name.startswith("sort"):
        return "argsort (compact keys)"
    # accum is three swizzled (ceil(N/1024)*1024,) channel planes; the
    # image scatter-adds are the custom fusions with a bare 1-D f32
    # output fed by an s32 index operand (drain rungs + full fallback)
    if re.match(r"%\S+ = f32\[\d+\]\{", long_name) and \
            "fusion(" in long_name and ", s32[" in long_name:
        return "accum scatter-add"
    if "f32[4194304,4]" in long_name.split("=")[0]:
        return "ring append/update"
    if name.startswith("copy"):
        return "loop-carry copy"
    m = re.search(r"= \(?([a-z0-9]+\[[0-9,]+\])", long_name)
    return m.group(1) if m else ""


def collect(logdir):
    tr = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.loads(gzip.open(tr).read())
    pid_dev = None
    for e in d["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")):
            pid_dev = e["pid"]
    dur = collections.Counter()
    cnt = collections.Counter()
    long = {}
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != pid_dev:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category", "")
        if cat in _SKIP or e["name"].startswith("jit_"):
            continue
        dur[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        if e["name"] not in long:
            long[e["name"]] = (cat, a.get("long_name", ""))
    return dur, cnt, long


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, default=1024)
    ap.add_argument("--w", type=int, default=0, help="width (0 = --wh)")
    ap.add_argument("--h", type=int, default=0, help="height (0 = --wh)")
    ap.add_argument("--frames", type=int, nargs=2, default=(1, 5))
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--demo", default="default")
    ap.add_argument("--set", default="",
                    help="comma-separated RenderSettings field=value "
                         "overrides (Python literals)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache",
                                              variant=args.demo)
    W = args.w or args.wh
    H = args.h or args.wh
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    st = r.settings
    if args.set:
        import ast
        import dataclasses
        ov = {}
        for pair in args.set.split(","):
            k, v = pair.split("=", 1)
            ov[k] = ast.literal_eval(v)
        st = dataclasses.replace(st, **ov)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())
    fn = jax.jit(make_regen_integrator(st, W, H),
                 static_argnames=("n_frames",))
    accum = r.zeros_accum()

    runs = []
    for M in args.frames:
        def go():
            return fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0), accum,
                      n_frames=M)
        out = go()
        np.asarray(out[0][-1:])
        waves = float(out[1])
        logdir = "/tmp/jaxprof_m%d" % M
        os.system("rm -rf " + logdir)
        with jax.profiler.trace(logdir):
            np.asarray(go()[0][-1:])
        runs.append((M, waves) + collect(logdir))

    (lo, wlo, dlo, clo, llo), (hi, whi, dhi, chi, lhi) = runs
    df = hi - lo
    dw = (whi - wlo) / df
    print("marginal anatomy over %d frames (%.2f waves/frame):"
          % (df, dw))
    names = set(dhi) | set(dlo)
    rows = []
    for n in names:
        ms = (dhi.get(n, 0) - dlo.get(n, 0)) / df / 1e3
        k = (chi.get(n, 0) - clo.get(n, 0)) / df
        rows.append((ms, k, n))
    rows.sort(reverse=True)
    tot = sum(ms for ms, _, _ in rows)
    print("op-sum %.1f ms/frame" % tot)
    for ms, k, n in rows[:args.top]:
        if ms < 0.05:
            break
        cat, ln = lhi.get(n) or llo.get(n) or ("", "")
        print("%8.2f ms  x%-5.1f %-22s %-11s %s"
              % (ms, k, n[:22], cat[:11], classify(n, ln)[:46]))


if __name__ == "__main__":
    main()
