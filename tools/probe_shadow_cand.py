#!/usr/bin/env python
"""How much of the NEE shadow trace is wasted on non-candidate packets?

The shadow trace (anyhit, ~26 ms/frame at 1024^2) runs on the whole pool
with active = cand (diffuse surface lanes with a valid env sample). The
queue kernel finishes an all-inactive packet in one step, so the cost is
per packet WITH any candidate. Pool order at NEE time is the PREVIOUS
wave's hit-slot compaction; this wave's material (which decides cand) is
a function of THIS wave's hit slot.

Measures, on the real frozen mid-frame pool:
  - candidate lane fraction and any-cand packet fraction in pool order
  - the same if lanes were sorted by THIS wave's hit slot (what a
    deferred-NEE-after-permute design would see)
  - device time of the anyhit shadow trace in both orders (the sorted
    run is the deferred design's trace cost, excluding its permute-
    column overhead of ~+6 cols)
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
    from tpu_pathtracer.scene.config import MAT_DIFF
    from tpu_pathtracer.tracer.renderer import Renderer
    from tpu_pathtracer.tracer.regen import make_regen_integrator
    from tpu_pathtracer.tracer.wavefront import fetch_attributes, \
        gather_material
    from tpu_pathtracer.tracer.envsample import sample_env
    from tpu_pathtracer.ops.traverse_packet import packet_intersect
    from tpu_pathtracer.core.vecmath import RAY_MIN, RAY_MAX, dot

    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    W = H = 1024
    r = Renderer(fb, mats, envmap=envmap, texture=texture, width=W,
                 height=H)
    rc = default_camera(W, H).build_render_camera()
    cam_vec = jnp.asarray(rc.as_array())
    packed = r.scene["packed"]
    sd = fb.max_depth + 2
    st = r.settings

    def time_anyhit(o, d, act):
        def body(i, carry):
            tm = RAY_MIN * (1.0 + 1e-7 * i.astype(jnp.float32))
            s, t = packet_intersect(
                packed, o, d, tm, RAY_MAX, anyhit=True, stack_depth=sd,
                tile_sub=st.packet_tile_sub,
                interleave=st.packet_interleave,
                queue_k=st.packet_queue_k, active=act)
            return carry + t[::65536].sum()
        g = jax.jit(lambda o_, d_, a_: jax.lax.fori_loop(
            0, 24, body, jnp.float32(0.0)))
        np.asarray(g(o, d, act))
        lo = jax.jit(lambda o_, d_, a_: jax.lax.fori_loop(
            0, 4, body, jnp.float32(0.0)))
        np.asarray(lo(o, d, act))

        def med(f):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(o, d, act))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return (med(g) - med(lo)) / 20.0 * 1e3

    for k in (2, 3):
        fn = jax.jit(make_regen_integrator(st, W, H, stop_after_waves=k),
                     static_argnames=("n_frames",))
        pool = fn(r.scene, cam_vec, jnp.uint32(1), jnp.uint32(0),
                  r.zeros_accum(), n_frames=4)
        o = jnp.asarray(np.asarray(pool["orig"]))
        d = jnp.asarray(np.asarray(pool["dir"]))
        act = jnp.asarray(np.asarray(pool["active"]))

        # replay this wave's hit + material to recover cand
        slot, ht = jax.jit(lambda o_, d_, a_: packet_intersect(
            packed, o_, d_, RAY_MIN, RAY_MAX, stack_depth=sd,
            tile_sub=st.packet_tile_sub, interleave=st.packet_interleave,
            queue_k=st.packet_queue_k, active=a_))(o, d, act)
        hitp = o + d * np.asarray(ht)[:, None]
        _, _, mat_id, _ = fetch_attributes(r.scene, slot, hitp)
        mat = gather_material(r.scene, mat_id)
        surf = np.asarray(act) & (np.asarray(ht) <= 1e10)
        diff = surf & (np.asarray(mat["refltype"]) == MAT_DIFF)
        # env sample direction (cost-model only: fresh uniforms)
        P = o.shape[0]
        u = np.random.default_rng(7 + k).random((2, P)).astype(np.float32)
        d_env, pdf_env, _ = sample_env(r.scene, jnp.asarray(u[0]),
                                       jnp.asarray(u[1]), cam_vec[15])
        # nl ~ from hit normal; approximate cand with cos>0 via tri normal
        cand = diff & (np.asarray(pdf_env) > 1e-12)

        lanes = cand.mean()
        pk = cand.reshape(-1, 1024).any(axis=1).mean()
        # the REAL next-wave permute order: hit-slot|octant, dead to tail
        dn = np.asarray(d)
        octant = ((dn[:, 0] < 0).astype(np.int64)
                  | ((dn[:, 1] < 0).astype(np.int64) << 1)
                  | ((dn[:, 2] < 0).astype(np.int64) << 2))
        keyp = np.where(np.asarray(act),
                        (np.maximum(np.asarray(slot), 0).astype(np.int64)
                         << 3) | octant, 1 << 40)
        op = np.argsort(keyp, kind="stable")
        pk_p = cand[op].reshape(-1, 1024).any(axis=1).mean()
        # idealized: cand lanes compacted to an exact prefix
        oc = np.argsort(np.where(cand, 0, 1), kind="stable")
        pk_c = cand[oc].reshape(-1, 1024).any(axis=1).mean()

        de = jnp.asarray(np.asarray(d_env))
        t_cur = time_anyhit(o, de, jnp.asarray(cand.astype(np.int32)))
        oj = jnp.asarray(op.astype(np.int32))
        t_perm = time_anyhit(jnp.take(o, oj, axis=0),
                             jnp.take(de, oj, axis=0),
                             jnp.asarray(cand[op].astype(np.int32)))
        ok = jnp.asarray(oc.astype(np.int32))
        t_pref = time_anyhit(jnp.take(o, ok, axis=0),
                             jnp.take(de, ok, axis=0),
                             jnp.asarray(cand[oc].astype(np.int32)))
        print("wave %d: cand lanes %.3f | live pkts: cur %.3f perm %.3f "
              "prefix %.3f | anyhit ms: cur %.2f perm %.2f prefix %.2f"
              % (k, lanes, pk, pk_p, pk_c, t_cur, t_perm, t_pref),
              flush=True)


if __name__ == "__main__":
    main()
