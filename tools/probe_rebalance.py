#!/usr/bin/env python
"""Packet-rebalance predictor study.

probe_steps.py showed an ORACLE packet-to-instance assignment (sort the
1024 packets of a wave by their actual step count, group consecutive
`interleave` as mates) pays +2% interleave tax vs the +73% the default
consecutive grouping pays. The oracle needs this wave's step counts —
unknowable before the trace. This probe scores PRACTICAL predictors,
each computable at compaction time (end of the previous wave):

  prev_mean / prev_max   mean/max over the new packet's lanes of the
                         step count of the OLD packet each lane came
                         from (needs count_steps in the production
                         trace; rides the pool permute)
  prev_mean16            same, subsampled 16 lanes/packet (prices the
                         cheap composed-gather implementation)
  bounce_mean            mean bounce depth of the packet's lanes
  dir_spread             1 - |mean unit direction| (0 coherent, 1 iso)
  orig_spread            bbox diagonal of the packet's ray origins

Lane matching across waves uses (pixel, bounce): a path spawned at wave
w has bounce k-w+1 in the frozen wave-k pool, so concurrent paths of
the same pixel (different frames) carry different bounce values.

Score = paid steps under sort-by-predictor grouping (il * sum of group
max of ACTUAL steps), reported as % tax over live steps, bounded below
by the oracle and above by the default consecutive grouping.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pool_at(r, cv, k, W, H):
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    fn = jax.jit(make_regen_integrator(r.settings, W, H,
                                       stop_after_waves=k),
                 static_argnames=("n_frames",))
    pool = fn(r.scene, cv, jnp.uint32(1), jnp.uint32(0),
              r.zeros_accum(), n_frames=4)
    out = {k_: np.asarray(v) for k_, v in pool.items()
           if k_ in ("orig", "dir", "active", "pixel", "bounce")}
    return out


def packet_steps(r, pool, sub, il, sd):
    """Trace the frozen pool once with count_steps; per-packet live steps."""
    import jax.numpy as jnp
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX
    _, _, ns = packet_intersect(
        r.scene["packed"], jnp.asarray(pool["orig"]),
        jnp.asarray(pool["dir"]), RAY_MIN, RAY_MAX,
        stack_depth=sd, tile_sub=sub, interleave=il, count_steps=True,
        active=jnp.asarray(pool["active"].astype(np.int32)))
    return np.asarray(ns).reshape(-1, sub * 128)[:, 0]


def tax(per_packet, order, il, live):
    """Paid steps (and %tax) when packets are grouped along `order`."""
    g = per_packet[order].reshape(-1, il)
    paid = g.max(axis=1).sum() * il
    return paid, 100.0 * (paid - live) / max(live, 1)


def main():
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W,
                 height=H)
    cv = jnp.asarray(default_camera(W, H).build_render_camera().as_array())
    st = r.settings
    sub, il = st.packet_tile_sub, st.packet_interleave
    lanes = sub * 128
    sd = fb.max_depth + 2

    for k in (2, 4):
        pa = pool_at(r, cv, k, W, H)
        pb = pool_at(r, cv, k + 1, W, H)
        sa = packet_steps(r, pa, sub, il, sd)  # old packets' truth
        sb = packet_steps(r, pb, sub, il, sd)  # new packets' truth
        P = pa["pixel"].shape[0]
        n_pk = P // lanes
        live = float(sb.sum())

        # ---- lane matching: (pixel, bounce+1) in pool_a -> pool_b ----
        key_a = pa["pixel"].astype(np.int64) * 256 + (pa["bounce"] + 1)
        key_b = pb["pixel"].astype(np.int64) * 256 + pb["bounce"]
        val_a = np.repeat(sa, lanes).astype(np.float32)  # lane -> old pkt
        order_a = np.argsort(key_a, kind="stable")
        ka_sorted = key_a[order_a]
        pos = np.searchsorted(ka_sorted, key_b)
        pos = np.clip(pos, 0, P - 1)
        matched = ka_sorted[pos] == key_b
        prev_lane = np.where(matched, val_a[order_a[pos]], np.nan)
        frac_matched = matched.mean()

        # fresh lanes: give them the median cost of the matched fresh-ish
        # packets (a runtime constant in the real implementation)
        fill = np.nanmedian(prev_lane) if np.isfinite(
            np.nanmedian(prev_lane)) else 200.0
        prev_pk = prev_lane.reshape(n_pk, lanes)
        with np.errstate(invalid="ignore"):
            prev_mean = np.where(np.all(np.isnan(prev_pk), axis=1), fill,
                                 np.nanmean(prev_pk, axis=1))
            prev_max = np.where(np.all(np.isnan(prev_pk), axis=1), fill,
                                np.nanmax(prev_pk, axis=1))
        sub16 = prev_pk[:, ::lanes // 16]
        with np.errstate(invalid="ignore"):
            prev_m16 = np.where(np.all(np.isnan(sub16), axis=1), fill,
                                np.nanmean(sub16, axis=1))

        # ---- stateless features of pool_b ----
        bounce_pk = pb["bounce"].reshape(n_pk, lanes).mean(axis=1)
        d = pb["dir"].reshape(n_pk, lanes, 3)
        dir_spread = 1.0 - np.linalg.norm(d.mean(axis=1), axis=1)
        o = pb["orig"].reshape(n_pk, lanes, 3)
        orig_spread = np.linalg.norm(o.max(axis=1) - o.min(axis=1), axis=1)

        base_paid, base_tax = tax(sb, np.arange(n_pk), il, live)
        orc_paid, orc_tax = tax(sb, np.argsort(-sb), il, live)
        print("wave %d->%d: %d packets, live %.2fM, matched lanes %.0f%%"
              % (k, k + 1, n_pk, live / 1e6, 100 * frac_matched),
              flush=True)
        print("  consecutive  +%.0f%%   oracle  +%.0f%%"
              % (base_tax, orc_tax), flush=True)
        fresh = (pb["bounce"] == 1).mean()
        print("  fresh lanes (bounce==1, unmatchable): %.0f%%"
              % (100 * fresh), flush=True)
        preds = {"prev_mean": prev_mean, "prev_max": prev_max,
                 "prev_mean16": prev_m16, "bounce_mean": bounce_pk,
                 "dir_spread": dir_spread, "orig_spread": orig_spread}
        for name, pred in preds.items():
            _, t = tax(sb, np.argsort(-pred), il, live)
            rho = np.corrcoef(np.argsort(np.argsort(pred)),
                              np.argsort(np.argsort(sb)))[0, 1]
            print("  %-12s +%.0f%% tax  (rank corr %.2f)" % (name, t, rho),
                  flush=True)
        np.savez("/tmp/rebal_data_w%d.npz" % k, sa=sa, sb=sb,
                 matched=matched, prev_lane=prev_lane,
                 bounce_b=pb["bounce"], active_b=pb["active"], **preds)


if __name__ == "__main__":
    main()
