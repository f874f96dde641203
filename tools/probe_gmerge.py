#!/usr/bin/env python
"""Price the merged env+texture gather (VERDICT r04 #2).

A pool lane is either a MISS (needs the 131k-row env quad16 gather) or a
SURFACE hit (needs the 65k-row texture quad12 gather) — the integrator
currently pays BOTH full-width gathers every wave because each is
branch-free. Merging them = one (196k,16) table + per-lane row offset:
one 1M-idx gather instead of two. Whether that wins depends on the
row-count cliff (per-idx cost 1.9/10.4/21.7 ns at 16k/131k/1M rows):

  two      take(env16, idx) + take(tex12, idx)     (current form)
  merged   take(cat16, idx')                       (proposed)

Also prices the tri_attr 28-col gather vs a 16-col split (is 28 cols ~2
gather slots?) and the window variants (full-width vs P/2 tail window)
for the env chain.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import jax
    import jax.numpy as jnp

    N = 1 << 20
    rng = np.random.default_rng(5)

    def marginal(make_body, m=(4, 24)):
        def chain(M):
            def run(i0):
                def body(i, c):
                    return c + make_body((i0 + i) % jnp.int32(97))
                return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))
            g = jax.jit(run)
            i0 = jnp.int32(3)
            np.asarray(g(i0))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(i0))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        lo, hi = m
        return (chain(hi) - chain(lo)) / (hi - lo) * 1e3

    KE, KT = 131072, 65536
    env16 = jnp.asarray(rng.normal(size=(KE, 16)).astype(np.float32))
    tex12 = jnp.asarray(rng.normal(size=(KT, 12)).astype(np.float32))
    cat16 = jnp.concatenate(
        [env16, jnp.pad(tex12, ((0, 0), (0, 4)))], axis=0)
    ei = jnp.asarray(rng.integers(0, KE, N).astype(np.int32))
    ti = jnp.asarray(rng.integers(0, KT, N).astype(np.int32))
    miss = jnp.asarray((rng.random(N) < 0.4).astype(np.bool_))
    mi = jnp.where(miss, ei, ti + KE)

    def consume(q):
        return q[:, 0].sum() + q[:, -1].sum()

    t_two = marginal(lambda i: consume(jnp.take(env16, (ei + i) % KE, 0))
                     + consume(jnp.take(tex12, (ti + i) % KT, 0)))
    t_env = marginal(lambda i: consume(jnp.take(env16, (ei + i) % KE, 0)))
    t_tex = marginal(lambda i: consume(jnp.take(tex12, (ti + i) % KT, 0)))
    t_mrg = marginal(lambda i: consume(
        jnp.take(cat16, (mi + i) % (KE + KT), 0)))
    print("env16 %.2f ms  tex12 %.2f ms  two %.2f ms  merged %.2f ms "
          "(per 1M idx)" % (t_env, t_tex, t_two, t_mrg), flush=True)

    # tail-window variant: env gather on P/2 indices only
    half = N // 2
    eh = ei[:half]
    t_envh = marginal(lambda i: consume(jnp.take(env16, (eh + i) % KE, 0)))
    print("env16 half-width %.2f ms (vs %.2f full)" % (t_envh, t_env),
          flush=True)

    # tri_attr column-width: 28 cols vs 16+12 split vs 16
    KA = 5728
    a28 = jnp.asarray(rng.normal(size=(KA, 28)).astype(np.float32))
    a16 = a28[:, :16]
    a12 = a28[:, 16:]
    ai = jnp.asarray(rng.integers(0, KA, N).astype(np.int32))
    t28 = marginal(lambda i: consume(jnp.take(a28, (ai + i) % KA, 0)))
    t16 = marginal(lambda i: consume(jnp.take(a16, (ai + i) % KA, 0)))
    t1612 = marginal(lambda i: consume(jnp.take(a16, (ai + i) % KA, 0))
                     + consume(jnp.take(a12, (ai + i) % KA, 0)))
    print("attr28 %.2f ms  attr16 %.2f ms  attr16+12 %.2f ms" %
          (t28, t16, t1612), flush=True)

    # alias merge candidate: 16k rows folded into the 196k table
    KAL = 16384
    al12 = jnp.asarray(rng.normal(size=(KAL, 12)).astype(np.float32))
    li = jnp.asarray(rng.integers(0, KAL, N).astype(np.int32))
    t_al = marginal(lambda i: consume(jnp.take(al12, (li + i) % KAL, 0)))
    print("alias12(16k) %.2f ms" % t_al, flush=True)


if __name__ == "__main__":
    main()
