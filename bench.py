#!/usr/bin/env python
"""Benchmark against BASELINE.json: "Mrays/sec + time-to-1024spp at 1080p
(TestObj scene)".

Prints ONE JSON line whose headline is the WEAKEST of the baseline axes:

  axis 1  traversal_mrays_per_sec   coherent-primary BVH traversal at
                                    1024^2; baseline bar 100 Mrays/s
                                    (BASELINE.md north star, one v5e chip).
  axis 2  render_mrays_per_sec      end-to-end progressive render at
                                    1920x1080 counting rays actually traced
                                    (path segments + NEE shadow rays),
                                    against the same 100 Mrays/s bar: the
                                    reference's whole value proposition is
                                    the interactive 1080p loop
                                    (reference src/main.cpp:154-247), so the
                                    end-to-end rate must meet the bar too.

  time_to_1024spp_1080p_min is reported alongside (it is axis 2 expressed
  in wall-clock: baseline time = rays(1024 spp) / 100e6).

Extra diagnostics (VERDICT r02 #2/#3): `incoherent_mrays_per_sec` measures
traversal on cosine-bounce rays from the primary-hit distribution (kept
for cross-round comparability); `midframe_mrays_per_sec` chain-traces a
FROZEN real regen pool after 3 waves — the population the integrator
actually pays for (measured ~3x harder than the synthetic one);
`frame_breakdown_ms` is the device profiler's exact steady-state
per-frame cost by category (5-vs-1-frame marginal diff of TPU-side op
durations; replaced the dup-stage estimates, which mispriced the
scatter 5x — ARCHITECTURE.md); `frame_floor_ms_1080p` composes the
measured primitives (mid-frame trace rate + the pool permute at its
IN-SITU marginal from the profiler's permute_gather bucket + one
image-scatter index per path death — the ring flush's irreducible
minimum) into a floor for a 1-spp 1080p frame, and
`pct_of_floor_1080p` says how close the frame is to it.
`envelope_mrays_per_sec` is the end-to-end rate the floor implies — the
most this design can reach on this chip.

Methodology: the tunneled axon runtime adds ~30-60 ms of dispatch+readback
latency to EVERY host-visible call and its block_until_ready can return
early, so single-call timings are meaningless. We chain M executions (or
M progressive frames) inside one compiled program and report the MARGINAL
cost (t(M_hi) - t(M_lo)) / (M_hi - M_lo), device-synced via np.asarray.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _median_time(fn, sync, reps=5):
    fn()  # warm
    sync()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        sync()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    # persistent compile cache: the bench compiles ~15 distinct programs
    # (gates, axes, chains); repeat runs skip the client-side compile
    # (utils/compcache.py — never changes results, only latency)
    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer, generate_camera_rays
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.tracer.traverse import pack_stream
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.rng import RaySampler, wang_hash
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    packed = jnp.asarray(pack_stream(fb.prims, fb.meta))
    sd = fb.max_depth + 2

    # ---------------- on-device kernel correctness gate ----------------
    # Mosaic miscompiles have produced silently-wrong kernels that
    # interpret mode does not catch — never report a number from an
    # unchecked kernel.
    from tpu_pathtracer.tracer.traverse import brute_force_intersect
    from tpu_pathtracer.scene.procedural import make_test_scene
    chk = np.random.default_rng(0)
    n_chk = 512
    co = chk.uniform(-3, 3, (n_chk, 3)).astype(np.float32)
    co[:, 1] = chk.uniform(0.3, 3, n_chk)
    cd = chk.normal(size=(n_chk, 3)).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    bt, _ = brute_force_intersect(make_test_scene().tri_vertices(), co, cd,
                                  RAY_MIN, RAY_MAX)
    # gate EVERY kernel specialization a number below is measured with —
    # Mosaic miscompiles are config-specific (a sub=8 gate says nothing
    # about the sub=64 instance the regen integrator runs)
    from tpu_pathtracer.tracer.wavefront import RenderSettings
    _defaults = RenderSettings()
    _d_cfg = (_defaults.packet_tile_sub, _defaults.packet_interleave)
    _d_qk = _defaults.packet_queue_k
    gate_cfgs = {(8, 4, "auto", 0), (16, 4, "auto", 0),
                 _d_cfg + ("auto", 0),
                 # the integrator default (work-queue kernel when
                 # packet_queue_k > interleave) is its own Mosaic program
                 _d_cfg + ("auto", _d_qk),
                 # the VMEM fallback kernel (scenes with tables > the SMEM
                 # budget run this) is a distinct Mosaic specialization —
                 # gate it too, in the queue config the integrator would use
                 _d_cfg + ("vmem", _d_qk),
                 # the media/BSSRDF workload-class shape (renderer.py derives
                 # (32,4) when the scene has media or subsurface materials)
                 (32, 4, "auto", _d_qk)}
    for g_sub, g_il, g_mem, g_qk in sorted(gate_cfgs):
        cs, ct = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                                  RAY_MIN, RAY_MAX, stack_depth=sd,
                                  tile_sub=g_sub, interleave=g_il,
                                  table_mem=g_mem, queue_k=g_qk)
        cs = np.asarray(cs)
        ours = np.where(cs >= 0, fb.tri_orig[np.maximum(cs, 0)], -1)
        agree = float((ours == bt).mean())
        assert agree > 0.999, (
            "packet kernel (%d,%d,%s,q%d) wrong on device: %.4f agreement"
            % (g_sub, g_il, g_mem, g_qk, agree))
    # anyhit is a distinct early-out path in the kernel: a hit must exist
    # along [tmin, tmax] iff the closest-hit oracle found one. Gate it in
    # both workload-class shapes (media/bssrdf scenes shoot shadow rays
    # through the (32,4) specialization).
    d_sub = _defaults.packet_tile_sub
    d_il = _defaults.packet_interleave
    for a_sub, a_il in ((d_sub, d_il), (32, 4)):
        ahs, _ = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                                  RAY_MIN, RAY_MAX, stack_depth=sd,
                                  anyhit=True,
                                  tile_sub=a_sub, interleave=a_il,
                                  queue_k=_d_qk)
        ah_agree = float(((np.asarray(ahs) >= 0) == (bt >= 0)).mean())
        assert ah_agree > 0.999, (
            "anyhit kernel (%d,%d) wrong on device: %.4f agreement"
            % (a_sub, a_il, ah_agree))
    # the prefix-act queue kernel (the regen ext trace's actual
    # specialization: tmax operand dropped, act/tmax derived from SMEM
    # scalars + lane iota) is its own Mosaic program — gate it too, with
    # a prefix that splits a lane row
    n_pref = 397
    for p_sub, p_il in ((d_sub, d_il), (32, 4)):   # surface + media/bssrdf
        pfs, pft = packet_intersect(packed, jnp.asarray(co), jnp.asarray(cd),
                                    RAY_MIN, RAY_MAX, stack_depth=sd,
                                    tile_sub=p_sub, interleave=p_il,
                                    queue_k=_d_qk,
                                    active_prefix=jnp.int32(n_pref))
        pfs = np.asarray(pfs)
        pft = np.asarray(pft)
        ours = np.where(pfs >= 0, fb.tri_orig[np.maximum(pfs, 0)], -1)
        pf_agree = float((ours[:n_pref] == bt[:n_pref]).mean())
        assert pf_agree > 0.999, (
            "prefix-act queue kernel (%d,%d) wrong on device: %.4f agreement"
            % (p_sub, p_il, pf_agree))
        assert (pfs[n_pref:] == -1).all() and (pft[n_pref:] >= RAY_MAX).all(), \
            "prefix-act queue kernel: lanes past the prefix must be inactive"

    # ---------------- on-device INTEGRATOR correctness gate ----------------
    # CPU tests cannot catch TPU-only numeric semantics: the ring flush
    # carried pixel indices as int->f32 BITCASTS, which are denormal bit
    # patterns the TPU flushes to zero — every banked path's radiance
    # scatter-added onto pixel 0 (black skies) while the whole CPU suite
    # stayed green. The default (regen+ring) integrator must match the
    # classic bounce integrator ON DEVICE, where both share transcendental
    # implementations, so any mismatch is a pool/flush accounting bug.
    import dataclasses as _dc
    _gw = 128
    _gr = Renderer(fb, mats, envmap=envmap, texture=texture,
                   width=_gw, height=_gw)
    _grc = default_camera(_gw, _gw).build_render_camera()
    _gimg = {}
    for _mode in ("bounce", "regen"):
        _r2 = Renderer(fb, mats, envmap=envmap, texture=texture,
                       width=_gw, height=_gw, base_scene=_gr.scene,
                       settings=_dc.replace(_gr.settings, integrator=_mode))
        _gimg[_mode] = np.asarray(
            _r2.render_frames(_r2.zeros_accum(), _grc, 1, 2))
    _gd = float(np.abs(_gimg["bounce"] - _gimg["regen"]).max())
    assert _gd < 5e-3, (
        "regen integrator diverges from classic on device: maxdiff %g"
        % _gd)

    # ------- on-device media/BSSRDF integrator gates (VERDICT r03 #3) -------
    # regen==classic only checks the pool machinery against itself; the
    # round-3 denormal-bitcast bug class lives in data movement BOTH
    # integrators share, so the media and subsurface configs are gated
    # against CPU-rendered goldens (tests/goldens/c4_media.npz,
    # c5_bssrdf.npz — the same files the CPU suite pins) by RMSE. The
    # tolerance absorbs backend transcendental drift on a handful of
    # chaotic paths (measured ~1e-3 at 96^2 x 12 spp); the bug class this
    # catches is catastrophic (black skies: RMSE > 0.3).
    # Rendered with the (32,4) workload-class packet shape the bench's
    # media/sss axes actually measure (renderer.py derives it when
    # settings=None; goldens are CPU renders where packet shape is unused).
    import importlib.util as _ilu
    import os as _os
    _gp = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "tests", "test_goldens.py")
    _gspec = _ilu.spec_from_file_location("_golden_mod", _gp)
    _gm = _ilu.module_from_spec(_gspec)
    _gspec.loader.exec_module(_gm)
    _gcfg = _gm._configs()
    # Thresholds (VERDICT r04 weak#5 — the old 0.05-RMSE gate was blind
    # to dimming-class bugs): same-seed device-vs-CPU divergence is
    # backend transcendental drift, and on BSSRDF it lands on a few
    # CHAOTIC pixels (a 1-ulp flip changes which reservoir probe wins ->
    # that whole path changes), so RMSE is tail-dominated and cannot be
    # tightened much — measured on v5e at 96^2 x 12 spp: RMSE 1.95e-3
    # (media) / 7.18e-3 (sss), while the MEDIAN |diff| is 3e-8 / 7.8e-7
    # and mean ratio 1.00001 / 1.00033 (merged-vs-unmerged bit-exact on
    # device, so none of this is the round-5 gather change). The gate
    # therefore asserts the statistics a real data-movement bug cannot
    # dodge: median |diff| < 1e-4 (typical pixel near-exact; 100-1000x
    # margin over drift, 10x TIGHTER than the 1e-3 north star), mean
    # brightness within 1% (dimming detector), and RMSE < 0.1
    # (catastrophe catch; black-sky class measures > 0.3). The RMSE
    # headroom is sized by the all-BSSRDF organic scene, where 1.5% of
    # pixels flip a reservoir probe at 12 spp (c6 measured: RMSE 0.0223
    # but median 1.2e-7, mean ratio 0.99977, 138/9216 pixels > 0.05 —
    # isolated blob pixels, the probe-flip signature). Per-run values
    # are published in the JSON as gate_rmse/gate_median_absdiff.
    gate_rmse = {}
    gate_median = {}

    def _device_golden_gate(nm, img, want):
        d = np.abs(img - want)
        rmse = float(np.sqrt((d ** 2).mean()))
        med = float(np.median(d))
        gate_rmse[nm] = round(rmse, 6)
        gate_median[nm] = float("%.3g" % med)
        assert np.all(np.isfinite(img)), "%s: non-finite on device" % nm
        assert med < 1e-4, (
            "%s typical-pixel drift on device: median %.3g" % (nm, med))
        mr = float(img.mean()) / max(float(want.mean()), 1e-9)
        assert abs(mr - 1.0) < 0.01, (
            "%s brightness drifts from CPU golden on device: ratio %.4f"
            % (nm, mr))
        assert rmse < 0.1, (
            "%s diverges from CPU golden on device: RMSE %.4g" % (nm, rmse))

    for _gname in ("c4_media", "c5_bssrdf"):
        _gfile = _os.path.join(_os.path.dirname(_gp), "goldens",
                               _gname + ".npz")
        _fb, _mats, _env, _tex, _st, _ap = _gcfg[_gname]
        _st = _dc.replace(_st, packet_tile_sub=32, packet_interleave=4)
        _img = _gm._render(_gname, (_fb, _mats, _env, _tex, _st, _ap))
        _device_golden_gate(_gname, _img, np.load(_gfile)["img"])

    # ---------------- axis 1: traversal Mrays/s at 1024^2 ----------------
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W, height=H)
    rc = default_camera(W, H).build_render_camera()
    cam_vec = jnp.asarray(rc.as_array())

    N = W * H
    lane_ids = jnp.arange(N, dtype=jnp.uint32)
    rng = RaySampler.init(wang_hash(jnp.uint32(1)), lane_ids)
    px = jnp.asarray(r._lane_px, jnp.float32)
    py = jnp.asarray(r._lane_py, jnp.float32)
    _, orig, raydir = generate_camera_rays(cam_vec, rng, px, py)

    def chained_trace(o, d, M, tile_sub, interleave=4, queue_k=0):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            s, t = packet_intersect(packed, o, d, tm, RAY_MAX,
                                    stack_depth=sd, tile_sub=tile_sub,
                                    interleave=interleave, queue_k=queue_k)
            return carry + t[::65536].sum()
        return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

    def run_m(o, d, M, tile_sub, interleave=4, queue_k=0):
        g = jax.jit(lambda o_, d_: chained_trace(o_, d_, M, tile_sub,
                                                 interleave, queue_k))
        box = {}

        def fn():
            box["r"] = g(o, d)

        def sync():
            _ = np.asarray(box["r"])
        return _median_time(fn, sync)

    # (16,4) measured best for coherent primaries on v5e
    # (364 Mrays/s vs 275 at sub=8, 268 at sub=32)
    t_lo = run_m(orig, raydir, 8, 16)
    t_hi = run_m(orig, raydir, 136, 16)
    dt = max((t_hi - t_lo) / 128.0, 1e-9)
    trav_mrays = N / dt / 1e6

    # ------- axis 1b: incoherent traversal (post-bounce population) -------
    # cosine-hemisphere bounce rays spawned from the real primary-hit
    # distribution: the population every wave after the first actually
    # traces (coherent-primary numbers overstate the working rate ~10x).
    from tpu_pathtracer.tracer.traverse import woop_geometric_normal
    hs, ht = packet_intersect(packed, orig, raydir, RAY_MIN, RAY_MAX,
                              stack_depth=sd, tile_sub=16)
    gn = np.asarray(woop_geometric_normal(r.scene["prims"],
                                          r.scene["num_nodes"], hs))
    o_np = np.asarray(orig)
    d_np = np.asarray(raydir)
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
    bd = (t1 * (rad * np.cos(phi))[:, None] + t2 * (rad * np.sin(phi))[:, None]
          + gn * np.sqrt(np.maximum(1.0 - u1, 0.0))[:, None])
    hit_idx = np.where(np.asarray(hs) >= 0)[0]
    wrap = hit_idx[np.arange(N) % hit_idx.size]   # fill misses w/ real hits
    b_orig = jnp.asarray((hp + gn * 1e-3)[wrap].astype(np.float32))
    b_dir = jnp.asarray(bd[wrap].astype(np.float32))
    # measured with the DEFAULT integrator packet config (the gated one),
    # including the work-queue kernel when it is the default
    d_sub0 = _defaults.packet_tile_sub
    d_il0 = _defaults.packet_interleave
    d_qk0 = _defaults.packet_queue_k
    it_lo = run_m(b_orig, b_dir, 4, d_sub0, d_il0, d_qk0)
    it_hi = run_m(b_orig, b_dir, 28, d_sub0, d_il0, d_qk0)
    idt = max((it_hi - it_lo) / 24.0, 1e-9)
    incoh_mrays = N / idt / 1e6

    # ------- axis 1c: REAL mid-frame population (frozen regen pool) -------
    # The synthetic cosine-bounce population above is comparable across
    # rounds but measured ~3x EASIER than what the integrator actually
    # traces mid-frame (glass interiors, grazing rays, mixed generations).
    # Freeze the real pool after 3 waves and chain-trace exactly those
    # rays; the roofline composes THIS rate.
    mf_fn = jax.jit(
        make_regen_integrator(r.settings, W, H, stop_after_waves=3),
        static_argnames=("n_frames",))
    mf_pool = mf_fn(r.scene, cam_vec, jnp.uint32(1), jnp.uint32(0),
                    r.zeros_accum(), n_frames=4)
    mf_o = jnp.asarray(np.asarray(mf_pool["orig"]))
    mf_d = jnp.asarray(np.asarray(mf_pool["dir"]))
    mf_lo = run_m(mf_o, mf_d, 4, d_sub0, d_il0, d_qk0)
    mf_hi = run_m(mf_o, mf_d, 28, d_sub0, d_il0, d_qk0)
    mf_dt = max((mf_hi - mf_lo) / 24.0, 1e-9)
    midframe_mrays = mf_o.shape[0] / mf_dt / 1e6

    # ---------- memory-system floor microbenches (roofline inputs) ----------
    # The compact pool's state move is ONE 13-col row-gather; image
    # accumulation is three 1-d scatter-adds. Neither can be done with less
    # memory traffic, so their standalone rates are hard per-wave floors.
    pool_rows = min(1 << 20, N)
    mb_rng = np.random.default_rng(3)
    g_tbl = jnp.asarray(mb_rng.normal(size=(pool_rows, 13)).astype(np.float32))
    g_idx = jnp.asarray(mb_rng.permutation(pool_rows).astype(np.int32))

    def chained_gather(M):
        def body(i, c):
            g = jnp.take(g_tbl, (g_idx + i) % pool_rows, axis=0)
            return c + g[0, 0]
        return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

    def run_gather(M):
        g = jax.jit(lambda: chained_gather(M))
        box = {}

        def fn():
            box["r"] = g()

        def sync():
            _ = np.asarray(box["r"])
        return _median_time(fn, sync, reps=3)

    g_ms = max(run_gather(24) - run_gather(4), 1e-9) / 20.0 * 1e3

    s_val = jnp.asarray(mb_rng.normal(size=(pool_rows, 3)).astype(np.float32))

    def chained_scatter(M):
        def body(i, acc):
            pix = (g_idx + i) % pool_rows
            acc = acc.at[pix].add(s_val[:, 0])
            acc = acc.at[pix + pool_rows].add(s_val[:, 1])
            acc = acc.at[pix + 2 * pool_rows].add(s_val[:, 2])
            return acc
        return jax.lax.fori_loop(0, M, body,
                                 jnp.zeros((3 * pool_rows,), jnp.float32))

    def run_scatter(M):
        g = jax.jit(lambda: chained_scatter(M))
        box = {}

        def fn():
            box["r"] = g()

        def sync():
            _ = np.asarray(box["r"][:1])
        return _median_time(fn, sync, reps=3)

    s_ms = max(run_scatter(24) - run_scatter(4), 1e-9) / 20.0 * 1e3

    # ------------- axis 2: end-to-end render at 1920x1080 -------------
    import dataclasses

    def frame_cost(width, height, reps=4, frames=(1, 3), dup_stage="",
                   parts=None):
        """(ms_per_frame_1spp, rays_per_frame, waves_per_frame) via the
        marginal cost of chaining n_frames progressive samples inside one
        device program, using the default (regen) integrator.
        parts: optional (fb, mats, envmap, texture) scene override."""
        p_fb, p_mats, p_env, p_tex = parts or (fb, mats, envmap, texture)
        rr = Renderer(p_fb, p_mats, envmap=p_env, texture=p_tex,
                      width=width, height=height)
        st = dataclasses.replace(rr.settings, dup_stage=dup_stage)
        rcam = default_camera(width, height).build_render_camera()
        cv = jnp.asarray(rcam.as_array())
        # TIME the production path (with_stats=False — what render.py and
        # the viewer run); the honest ray-count denominator comes from ONE
        # untimed stats-enabled execution per chain length (the count is
        # deterministic), so the timed program doesn't carry the NEE
        # candidate reduce that only the counter needs (~1 ms/wave at 1M
        # lanes)
        fn = jax.jit(
            make_regen_integrator(st, width, height),
            static_argnames=("n_frames",))
        fn_stats = jax.jit(
            make_regen_integrator(st, width, height, with_stats=True),
            static_argnames=("n_frames",))
        accum = rr.zeros_accum()

        stats = {}

        def run(M):
            box = {}

            def gofn():
                box["r"] = fn(rr.scene, cv, jnp.uint32(1), jnp.uint32(0),
                              accum, n_frames=M)

            def sync():
                _ = np.asarray(box["r"][0][-1:])
            t = _median_time(gofn, sync, reps=reps)
            rs = fn_stats(rr.scene, cv, jnp.uint32(1), jnp.uint32(0),
                          accum, n_frames=M)
            stats[M] = (float(np.asarray(rs[2])), int(np.asarray(rs[1])))
            return t

        lo, hi = frames
        f_lo = run(lo)
        f_hi = run(hi)
        span = hi - lo
        dtf = max((f_hi - f_lo) / span, 1e-9)
        rays = (stats[hi][0] - stats[lo][0]) / span
        waves = (stats[hi][1] - stats[lo][1]) / span
        return dtf * 1e3, rays, waves

    # 1 vs 5 frames: the marginal cost rides a 4-frame delta (VERDICT r02
    # weak#7 asked for a wider chain than the old 2-frame one)
    ms_hd, rays_hd, waves_hd = frame_cost(1920, 1080, frames=(1, 5))
    render_mrays = rays_hd / (ms_hd / 1e3) / 1e6
    tt1024_marginal_min = ms_hd * 1024.0 / 60e3
    baseline_tt_min = rays_hd * 1024.0 / 100e6 / 60.0
    # the PUBLISHED time-to-1024spp is the MEASURED wall clock of a real
    # tools/render.py run when its artifact exists (VERDICT r04 #6 — the
    # extrapolation understated reality by 15% of IO/startup); the marginal
    # extrapolation is reported alongside for reconciliation
    tt1024_min = tt1024_marginal_min
    tt1024_src = "marginal extrapolation (no measured wall artifact)"
    try:
        import os as _osw
        _wp = _osw.path.join(_osw.path.dirname(_osw.path.abspath(__file__)),
                             "renders", "progressive_1080p_1024spp.png"
                             ".wall.json")
        with open(_wp) as _f:
            _w = json.load(_f)
        if (_w["width"], _w["height"], _w["spp"],
                _w.get("start_frame", 0)) == (1920, 1080, 1024, 0):
            tt1024_min = _w["wall_s"] / 60.0
            tt1024_src = "measured wall clock (renders/*.wall.json)"
    except Exception:
        pass

    # 1024^2 frame cost for cross-round comparability (BENCH_r01 extra).
    # Same (1,5) chain as the 1080p axis and the sweep tools: the old
    # (1,3)x3 chain read ~10 ms high vs every same-day sweep_frame
    # measurement (drain-tail waves cancel less over a 2-frame delta).
    ms_sq, rays_sq, waves_sq = frame_cost(1024, 1024, reps=3,
                                          frames=(1, 5))

    # workload-class axes: the media and subsurface demo variants at
    # 1024^2. Renderer derives (32,4) packets for these scenes (interior
    # scattered / probe rays stay incoherent — ARCHITECTURE.md
    # "Workload-class packet shape"); recording them here keeps the
    # heavy-transport paths' perf tracked across rounds, not just the
    # surface scene's.
    def retry_once(fn):
        """The tunneled relay occasionally drops a remote-compile response
        mid-read ('response body closed'); one retry recovers transients
        without masking real failures (the retry re-raises)."""
        try:
            return fn()
        except Exception:
            time.sleep(10)
            return fn()

    wl_ms = {}
    for variant in ("media", "subsurface"):
        try:
            wl_parts = testobj_scene(cache_dir=".bvh_cache",
                                     variant=variant)
            wl_ms[variant], _, _ = retry_once(
                lambda: frame_cost(1024, 1024, reps=3, frames=(1, 5),
                                   parts=wl_parts))
        except Exception as e:          # an extra axis, not a gate
            wl_ms[variant] = "error: " + str(e)[:80]

    # ---------- reference-asset-scale axes (VERDICT r03 missing#1) ----------
    # Every perf number in rounds 1-3 came from the 4,430-tri procedural
    # scene whose table fits SMEM; the reference's actual workload is a
    # user-supplied 10^5-tri mesh (src/main.cpp:482-587). These axes run
    # the ~135k-tri large scene (packed stream ~177k rows, ~9.9 MB -> the
    # VMEM/split table path).
    lg = {}
    try:
        from tpu_pathtracer.scene.demo import large_scene
        from tpu_pathtracer.scene.procedural import make_large_scene
        from tpu_pathtracer.accel import flatten_mesh_bvh
        _lg_mesh = make_large_scene()
        _t0 = time.perf_counter()
        _lg_fb = flatten_mesh_bvh(_lg_mesh)      # uncached: times the build
        lg["sbvh_build_s_large_scene"] = round(time.perf_counter() - _t0, 2)
        lg["tris_large_scene"] = int(_lg_mesh.indices.shape[0])
        lg_parts = large_scene(cache_dir=".bvh_cache")
        lg_packed = jnp.asarray(pack_stream(lg_parts[0].prims,
                                            lg_parts[0].meta))
        lg_sd = lg_parts[0].max_depth + 2
        lg["table_mb_large_scene"] = round(lg_packed.shape[0] * 14 * 4 / 1e6,
                                           2)
        # on-device correctness gates at this scale: the large-table
        # kernel is a distinct Mosaic specialization per config — gate
        # BOTH the integrator default shape and the (16,4)+queue coherent
        # config the traversal axis measures
        lg_bt, _ = brute_force_intersect(_lg_mesh.tri_vertices(), co, cd,
                                         RAY_MIN, RAY_MAX)
        for lg_cfg in (_d_cfg + (_d_qk,), (16, 4, _d_qk)):
            lgs, _t_ = packet_intersect(lg_packed, jnp.asarray(co),
                                        jnp.asarray(cd), RAY_MIN, RAY_MAX,
                                        stack_depth=lg_sd,
                                        tile_sub=lg_cfg[0],
                                        interleave=lg_cfg[1],
                                        queue_k=lg_cfg[2])
            lgs = np.asarray(lgs)
            lg_ours = np.where(lgs >= 0,
                               lg_parts[0].tri_orig[np.maximum(lgs, 0)], -1)
            lg_agree = float((lg_ours == lg_bt).mean())
            assert lg_agree > 0.999, (
                "large-scene kernel (%d,%d,q%d) wrong on device: %.4f"
                % (lg_cfg + (lg_agree,)))

        # coherent-primary traversal rate on the large table. The
        # work-queue kernel is the production config and the structural
        # fix for this scene's heavy straggler tail (fixed grouping pays
        # +230% joint-max tax at p95 622 steps/packet vs +6% queued —
        # round-5 census, tools/sweep_large.py): 42.9 -> 70.4 Mrays/s.
        def lg_chain(o, d, M):
            def body(i, carry):
                tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
                s, t = packet_intersect(lg_packed, o, d, tm, RAY_MAX,
                                        stack_depth=lg_sd, tile_sub=16,
                                        interleave=4, queue_k=_d_qk)
                return carry + t[::65536].sum()
            return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

        def lg_run(M):
            g = jax.jit(lambda o_, d_: lg_chain(o_, d_, M))
            box = {}

            def fn():
                box["r"] = g(orig, raydir)

            def sync():
                _ = np.asarray(box["r"])
            return _median_time(fn, sync, reps=3)

        lg_dt = max((lg_run(40) - lg_run(8)) / 32.0, 1e-9)
        lg["traversal_mrays_per_sec_large_scene"] = round(N / lg_dt / 1e6, 2)

        # end-to-end 1-spp frame at 1024^2 on the large scene
        lg_ms, lg_rays, lg_waves = frame_cost(1024, 1024, reps=3,
                                              frames=(1, 5), parts=lg_parts)
        lg["ms_per_frame_1spp_large_scene"] = round(lg_ms, 1)
        lg["render_mrays_per_sec_large_scene"] = round(
            lg_rays / (lg_ms / 1e3) / 1e6, 3)

        # incoherent-traversal-at-scale axis (VERDICT r04 #5): freeze the
        # real regen pool after 3 waves on the large scene and chain-trace
        # exactly that population with the integrator's packet config —
        # the large-scene analog of midframe_mrays_per_sec
        lg_r = Renderer(*lg_parts[:2], envmap=lg_parts[2],
                        texture=lg_parts[3], width=1024, height=1024)
        lg_mf_fn = jax.jit(
            make_regen_integrator(lg_r.settings, 1024, 1024,
                                  stop_after_waves=3),
            static_argnames=("n_frames",))
        lg_pool = lg_mf_fn(lg_r.scene, cam_vec, jnp.uint32(1),
                           jnp.uint32(0), lg_r.zeros_accum(), n_frames=4)
        lg_mo = jnp.asarray(np.asarray(lg_pool["orig"]))
        lg_md = jnp.asarray(np.asarray(lg_pool["dir"]))

        # traced at the config the large-scene INTEGRATOR actually runs
        # (Renderer derives (16,4)+queue for over-SMEM tables), not the
        # small-scene default shape
        lg_shape = (lg_r.settings.packet_tile_sub,
                    lg_r.settings.packet_interleave,
                    lg_r.settings.packet_queue_k)

        def lg_mf_chain(o, d, M):
            def body(i, carry):
                tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
                s, t = packet_intersect(lg_packed, o, d, tm, RAY_MAX,
                                        stack_depth=lg_sd,
                                        tile_sub=lg_shape[0],
                                        interleave=lg_shape[1],
                                        queue_k=lg_shape[2])
                return carry + t[::65536].sum()
            return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

        def lg_mf_run(M):
            g = jax.jit(lambda o_, d_: lg_mf_chain(o_, d_, M))
            box = {}

            def fn():
                box["r"] = g(lg_mo, lg_md)

            def sync():
                _ = np.asarray(box["r"])
            return _median_time(fn, sync, reps=3)

        lg_mf_dt = max((lg_mf_run(16) - lg_mf_run(4)) / 12.0, 1e-9)
        lg["midframe_mrays_per_sec_large_scene"] = round(
            lg_mo.shape[0] / lg_mf_dt / 1e6, 2)
    except Exception as e:              # an extra axis, not a gate
        lg["large_scene_error"] = str(e)[:160]

    # ---- media/BSSRDF at reference scale, irregular geometry (V r04 #5) ----
    # the ~104k-tri organic blob (head.ply-class): 1-spp frame axes + an
    # on-device RMSE gate vs the CPU goldens (c6/c7 — same files the CPU
    # suite pins), same thresholds as the small-scene media/sss gates
    for _oname, _ovar, _okey in (
            ("c6_organic_sss", "sss", "ms_per_frame_1spp_sss_large_scene"),
            ("c7_organic_media", "media",
             "ms_per_frame_1spp_media_large_scene")):
        try:
            # reuse the golden config's already-built scene parts (the
            # ~105k-tri build + PLY round-trip would otherwise run twice
            # per bench under two different cache dirs)
            _ofb, _omats, _oenv, _otex, _ost, _oap = _gcfg[_oname]
            _oparts = (_ofb, _omats, _oenv, _otex)
            _ofile = _os.path.join(_os.path.dirname(_gp), "goldens",
                                   _oname + ".npz")
            if _os.path.exists(_ofile):
                # the large-table workload-class shape (renderer.py
                # derives (16,4) when the packed table overflows SMEM;
                # the (32,4)+plain-vmem block does not compile at scale)
                _ost = _dc.replace(_ost, packet_tile_sub=16,
                                   packet_interleave=4)
                _img = _gm._render(_oname,
                                   (_ofb, _omats, _oenv, _otex, _ost, _oap))
                _device_golden_gate(_oname, _img, np.load(_ofile)["img"])
            _oms, _, _ = retry_once(
                lambda: frame_cost(1024, 1024, reps=3, frames=(1, 5),
                                   parts=_oparts))
            lg[_okey] = round(_oms, 1)
        except AssertionError:
            raise                        # the gate IS a gate
        except Exception as e:           # the axis is an extra
            lg[_okey] = "error: " + str(e)[:100]

    # ---------- per-stage frame cost from the device profiler ----------
    # jax.profiler records TPU-side per-op durations through the relay;
    # diffing a 5-frame vs 1-frame chained run cancels drain-tail waves
    # and one-time ops, leaving the exact steady-state per-frame cost —
    # this replaced the dup-stage sweep, which mispriced the scatter 5x
    # (ARCHITECTURE.md "profiler era"). Categories: trace (both Pallas
    # calls), image_scatter, gathers (permute pmat + attr/env/texture
    # tables), argsort, layout_copies, other.
    breakdown = {}
    try:
        from tpu_pathtracer.utils.profiling import (
            profile_marginal, categorize)
        rr_b = Renderer(fb, mats, envmap=envmap, texture=texture,
                        width=1024, height=1024)
        cv_b = jnp.asarray(default_camera(1024, 1024)
                           .build_render_camera().as_array())
        fn_b = jax.jit(make_regen_integrator(rr_b.settings, 1024, 1024),
                       static_argnames=("n_frames",))
        acc_b = rr_b.zeros_accum()

        def run_b(M):
            np.asarray(fn_b(rr_b.scene, cv_b, jnp.uint32(1), jnp.uint32(0),
                            acc_b, n_frames=M)[0][-1:])
        run_b(1)
        run_b(9)                      # compile both before tracing
        # the long chain tames lumpy once-per-call events (drain rungs)
        ops, meta = profile_marginal(run_b, frames=(1, 9))
        # one swizzled accum plane = ceil(N/1024)*1024 rows (regen.py)
        cats = categorize(ops, meta,
                          plane_rows=((1024 * 1024 + 1023) // 1024) * 1024,
                          pool_rows=pool_rows)
        breakdown = {k: round(v, 2) for k, v in sorted(cats.items())}
    except Exception as e:            # profiler is an extra, not a gate
        breakdown = {"error": str(e)[:120]}

    # ---------- roofline: compose measured primitives into a floor ----------
    # Per-wave floor = rays/wave at the mid-frame incoherent kernel rate
    # (the trace envelope) + the pool-state permute at its IN-SITU marginal
    # + the image scatter at its standalone memory rate. Round-4's floor
    # charged the permute at the 21.5 ms STANDALONE 13-col gather rate; the
    # in-situ marginal is ~3.3x cheaper (XLA overlaps the gather with
    # neighboring work), so that floor was pessimistic and the envelope
    # low (VERDICT r04 #3) — the permute term now comes from the device
    # profiler's 'permute_gather' bucket (same-run, per wave), falling
    # back to the standalone rate only if the profiler failed.
    # Respawn/shade/env floors are omitted (not provably irreducible) —
    # the floor is strictly optimistic.
    rays_per_wave_hd = rays_hd / max(waves_hd, 1.0)
    trace_floor_ms = rays_per_wave_hd / (midframe_mrays * 1e3)
    permute_wave_ms = g_ms
    permute_src = "standalone 13-col gather rate (profiler unavailable)"
    if "permute_gather" in breakdown:
        # per-frame bucket at 1024^2 / waves-per-frame = per-wave in-situ
        # marginal; the pool is 1M lanes at BOTH 1024^2 and 1080p (capped),
        # so the per-wave cost transfers directly
        permute_wave_ms = breakdown["permute_gather"] / max(waves_sq, 1.0)
        permute_src = "in-situ profiler marginal"
    # scatter floor: every path dies exactly once, so image accumulation
    # needs >= one scattered index per sample (the ring flush approaches
    # this at ~1.14x; s_ms is the measured cost of pool_rows indices x3
    # channels) — N_hd samples per 1-spp frame, amortized per wave
    n_hd = 1920 * 1080
    scatter_floor_wave_ms = s_ms * (n_hd / pool_rows) / max(waves_hd, 1.0)
    wave_floor_ms = trace_floor_ms + permute_wave_ms + scatter_floor_wave_ms
    frame_floor_hd = waves_hd * wave_floor_ms
    pct_of_floor = frame_floor_hd / ms_hd
    envelope_mrays = rays_hd / frame_floor_hd / 1e3

    ax1 = trav_mrays / 100.0
    ax2 = render_mrays / 100.0
    extra = {
        "device": str(jax.devices()[0]),
        "traversal_mrays_per_sec": round(trav_mrays, 2),
        "incoherent_mrays_per_sec": round(incoh_mrays, 2),
        "midframe_mrays_per_sec": round(midframe_mrays, 2),
        "render_mrays_per_sec_1080p": round(render_mrays, 3),
        "time_to_1024spp_1080p_min": round(tt1024_min, 2),
        "time_to_1024spp_1080p_min_marginal": round(tt1024_marginal_min, 2),
        "time_to_1024spp_source": tt1024_src,
        "baseline_time_to_1024spp_1080p_min": round(baseline_tt_min, 2),
        "ms_per_frame_1spp_1080p": round(ms_hd, 1),
        "rays_per_frame_1080p": round(rays_hd),
        "waves_per_frame_1080p": round(waves_hd, 1),
        "ms_per_frame_1spp": round(ms_sq, 2),          # 1024^2, r01 key
        "ms_per_frame_1spp_media": (round(wl_ms["media"], 1)
                                    if isinstance(wl_ms["media"], float)
                                    else wl_ms["media"]),
        "ms_per_frame_1spp_sss": (round(wl_ms["subsurface"], 1)
                                  if isinstance(wl_ms["subsurface"], float)
                                  else wl_ms["subsurface"]),
        "waves_per_frame_sq": round(waves_sq, 2),      # breakdown divisor
        "render_mpaths_per_sec": round(1024 * 1024 / ms_sq / 1e3, 3),
        "frame_breakdown_ms": breakdown,    # per FRAME at 1024^2, profiler
        "pool_gather13_floor_ms": round(g_ms, 2),      # 13-col 1M-row gather
        "image_scatter3_floor_ms": round(s_ms, 2),     # 3x 1-d scatter-add
        "permute_wave_ms": round(permute_wave_ms, 2),
        "permute_floor_source": permute_src,
        "gate_rmse": gate_rmse,      # on-device vs CPU-golden gate values
        "gate_median_absdiff": gate_median,
        "frame_floor_ms_1080p": round(frame_floor_hd, 1),
        "pct_of_floor_1080p": round(pct_of_floor, 3),
        "envelope_mrays_per_sec": round(envelope_mrays, 2),
        "vs_baseline_traversal": round(ax1, 4),
        "vs_baseline_render": round(ax2, 4),
        "dispatch_latency_ms": round(t_lo * 1e3, 1),
        "methodology": "marginal cost of chained in-program executions; "
                       "headline = weakest baseline axis; floor = measured "
                       "primitive rates composed per wave",
    }
    extra.update(lg)          # reference-asset-scale axes (*_large_scene)
    if ax1 <= ax2:
        head = {"metric": "traversal_mrays_per_sec",
                "value": round(trav_mrays, 2), "unit": "Mrays/s",
                "vs_baseline": round(ax1, 4)}
    else:
        head = {"metric": "render_mrays_per_sec_1080p",
                "value": round(render_mrays, 3), "unit": "Mrays/s",
                "vs_baseline": round(ax2, 4)}
    head["extra"] = extra
    print(json.dumps(head))


if __name__ == "__main__":
    main()
