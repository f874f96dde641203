#!/usr/bin/env python
"""Why does the in-situ ring drain scatter at ~10.4 ns/idx when the
standalone 3-plane scatter probe runs 6.1 (even with fresh float-derived
indices)? Bisect the drain's structure:

  A  separate value/idx arrays (probe form — the 6.1 floor)
  B  values + pixel extracted from an (R,4) ring's columns
  C  B + the drain's re-zero DUS (ring.at[:w].set(0.0))
  D  C wrapped in a lax.cond (the ladder rung)

W = 3.67M window into three 1M planes, mirroring the real big rung.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << 20
    W = 3670016
    R = 4 * N
    rng = np.random.default_rng(9)
    ring = np.zeros((R, 4), np.float32)
    ring[:, 0:3] = rng.normal(size=(R, 3))
    ring[:, 3] = rng.integers(0, N, R).astype(np.float32)
    ring_j = jnp.asarray(ring)
    pixv = jnp.asarray(ring[:W, 3])
    vals = jnp.asarray(ring[:W, 0:3])

    def marginal(body):
        def chain(M):
            def run():
                z = ((jnp.zeros((N,), jnp.float32),) * 3, ring_j)
                return jax.lax.fori_loop(0, M, body, z)
            g = jax.jit(run)
            np.asarray(g()[0][0][:1])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g()[0][0][:1])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return (chain(12) - chain(2)) / 10 * 1e3

    def scat3(acc, pix, v0, v1, v2):
        a, b, c = acc
        return (a.at[pix].add(v0), b.at[pix].add(v1), c.at[pix].add(v2))

    def A(i, st):
        acc, r = st
        pix = ((pixv + 1.0 * i) % N).astype(jnp.int32)
        return scat3(acc, pix, vals[:, 0], vals[:, 1], vals[:, 2]), r

    def B(i, st):
        acc, r = st
        pix = ((r[:W, 3] + 1.0 * i) % N).astype(jnp.int32)
        return scat3(acc, pix, r[:W, 0], r[:W, 1], r[:W, 2]), r

    def C(i, st):
        acc, r = st
        pix = ((r[:W, 3] + 1.0 * i) % N).astype(jnp.int32)
        acc = scat3(acc, pix, r[:W, 0], r[:W, 1], r[:W, 2])
        r = r.at[:W].set(0.0)
        # refill so later iterations aren't all-zero (bandwidth store)
        r = r.at[:W].set(ring_j[:W] + i)
        return acc, r

    def D(i, st):
        def go(args):
            return C(i, args)
        return jax.lax.cond(i >= 0, go, lambda x: x, st)

    for name, body in (("A sep-arrays", A), ("B ring-cols", B),
                       ("C +rezero", C), ("D +cond", D)):
        ms = marginal(body)
        print("%-14s %7.2f ms (%.2f ns/idx/ch)"
              % (name, ms, ms / W / 3 * 1e6), flush=True)


if __name__ == "__main__":
    main()
