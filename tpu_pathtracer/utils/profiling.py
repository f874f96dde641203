"""Device-side op profiling through jax.profiler (works on the axon
relay: TPU-side per-op durations arrive in the trace.json with
hlo_category + long_name). The marginal-diff protocol — profile a LO-
and a HI-frame chained run, subtract per-op aggregates — cancels
drain-tail waves and one-time ops, leaving the exact steady-state
per-frame cost of every fusion (tools/profile_frame.py prints it raw;
bench.py reports the category rollup)."""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os

_SKIP_CATEGORIES = ("while", "conditional")


def collect_device_ops(logdir):
    """Aggregate device-side op durations from a jax.profiler trace dir.
    Returns (dur_us Counter by op name, count Counter, {name: (category,
    long_name)}). Container ops (while/conditional) are skipped so
    children are not double-counted."""
    tr = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.loads(gzip.open(tr).read())
    pid_dev = None
    for e in d["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")):
            pid_dev = e["pid"]
    dur = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != pid_dev:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category", "")
        if cat in _SKIP_CATEGORIES or e["name"].startswith("jit_"):
            continue
        dur[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        if e["name"] not in meta:
            meta[e["name"]] = (cat, a.get("long_name", ""))
    return dur, cnt, meta


def profile_marginal(run, frames=(1, 5), logdir_base="/tmp/jaxprof_bench"):
    """run(M) must execute + block on an M-frame chained render. Returns
    (per-op marginal ms/frame dict, meta dict)."""
    out = []
    for M in frames:
        logdir = "%s_m%d" % (logdir_base, M)
        os.system("rm -rf " + logdir)
        import jax
        with jax.profiler.trace(logdir):
            run(M)
        out.append(collect_device_ops(logdir))
    (dlo, _, mlo), (dhi, _, mhi) = out
    df = frames[1] - frames[0]
    mhi.update(mlo)
    ops = {n: (dhi.get(n, 0) - dlo.get(n, 0)) / df / 1e3
           for n in set(dhi) | set(dlo)}
    return ops, mhi


def categorize(ops, meta, plane_rows=None, pool_rows=None):
    """Roll per-op marginal costs into stable wave-stage categories.
    plane_rows: rows of ONE swizzled accum channel plane (ceil(N/1024)*
    1024 — see regen.py); identifies the image scatter-adds, which are
    the only custom fusions whose OUTPUT is a bare 1-D f32[plane_rows]
    (ring-drain rungs and the full-pool fallback; gathers emit 2-D
    (N, C) outputs). None disables that bucket.
    pool_rows: regen pool width; splits the compaction-permute pmat
    gather (its OPERAND is the f32[pool_rows,16] pool matrix) out of the
    scene-table gathers into its own 'permute_gather' bucket — the
    roofline composes the permute at this IN-SITU marginal rather than
    the 3.3x-pessimistic standalone rate (VERDICT r04 #3)."""
    acc_tag = "= f32[%d]{" % plane_rows if plane_rows else None
    buckets = collections.Counter()
    for n, ms in ops.items():
        # keep NEGATIVE marginals: lumpy events (the ring's flush-ladder
        # rungs) can fire under different fusion names in the LO and HI
        # programs (different static rung per fill), and the negative
        # LO-side piece must cancel inside the same shape bucket or the
        # category sum is biased upward
        cat, ln = meta.get(n, ("", ""))
        # output shape sits between "= " and the opening "fusion(";
        # operand shapes (which may repeat the accum shape) come after
        out_part = ln.split("fusion(")[0] if "fusion(" in ln else ln[:80]
        opnd_part = ln.split("fusion(")[1] if "fusion(" in ln else ""
        if cat == "custom-call":
            buckets["trace"] += ms
        elif acc_tag and cat == "custom fusion" and acc_tag in out_part:
            # scatter-adds lower as kCustom fusions; 1-D plane output
            # distinguishes them from the 2-D (N, C) gather fusions
            buckets["image_scatter"] += ms
        elif n.startswith("sort"):
            buckets["argsort"] += ms
        elif n.startswith("copy"):
            buckets["layout_copies"] += ms
        elif cat == "custom fusion":
            # kCustom fusions other than scatter are the per-lane table
            # gathers. Split the compaction permute from the scene-table
            # chains: a SCENE gather reads a table with fewer rows than
            # half the pool (envtex 196k, attr ~6k, alias 16k), while the
            # permute's operands are all pool-sized (the (P,16) pmat, or
            # the 13 pool-width pieces when the concat fuses in).
            import re as _re
            small = any(int(a) < pool_rows // 2
                        for a in _re.findall(r"f32\[(\d+),\d+\]", opnd_part)
                        ) if pool_rows else True
            if pool_rows and not small:
                buckets["permute_gather"] += ms
            else:
                buckets["gathers"] += ms
        else:
            buckets["other"] += ms
    return dict(buckets)
