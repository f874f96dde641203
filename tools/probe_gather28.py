#!/usr/bin/env python
"""Price the tri_attr fetch's 28-column gather form (v5e).

probe_gather_cols measured 13/16 cols at 6.4-6.7 ns/idx, 20-24 at 8.2,
32 cliffing to 37 — 28 (the tri_attr width) was never measured. If 28
sits on the cliff, splitting the fetch into two <=16-col gathers of the
same index vector (2 x 6.4 = 12.8 ns/idx) or shrinking the table wins.
Also prices the transposed form (table (C,K), gather on axis 1) in case
its output layout avoids the {1,0}->{0,1} copies the profiler sees on
the real fetch chains.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(go, *args):
    import jax
    g = jax.jit(go, static_argnums=(2,))

    def run(M):
        np.asarray(g(*args, M)[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(*args, M)[:1])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    return (run(24) - run(4)) / 20 * 1e3


def main():
    import jax
    import jax.numpy as jnp

    P = 1 << 20
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.permutation(P).astype(np.int32))

    for cols in (24, 26, 28):
        x = jnp.asarray(rng.normal(size=(P, cols)).astype(np.float32))

        def go(x_, s_, M):
            def body(i, c):
                t = jnp.take(c, s_, axis=0)
                return t.at[0, 0].add(1e-12)
            return jax.lax.fori_loop(0, M, body, x_)
        ms = bench(go, x, src)
        print("axis0 cols=%2d: %6.2f ms (%.1f ns/idx)"
              % (cols, ms, ms * 1e6 / P), flush=True)

    # split 16 + 12 (same index vector, two gathers)
    xa = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
    xb = jnp.asarray(rng.normal(size=(P, 12)).astype(np.float32))

    def go_split(xa_, xb_, M, s_=src):
        def body(i, c):
            a, b = c
            ta = jnp.take(a, s_, axis=0)
            tb = jnp.take(b, s_, axis=0)
            return (ta.at[0, 0].add(1e-12), tb.at[0, 0].add(1e-12))
        return jax.lax.fori_loop(0, M, body, (xa_, xb_))[0]
    ms = bench(go_split, xa, xb)
    print("split 16+12:   %6.2f ms (%.1f ns/idx)" % (ms, ms * 1e6 / P),
          flush=True)

    # transposed: table (28, K), gather along axis 1
    xt = jnp.asarray(rng.normal(size=(28, P)).astype(np.float32))

    def go_t(x_, s_, M):
        def body(i, c):
            t = jnp.take(c, s_, axis=1)
            return t.at[0, 0].add(1e-12)
        return jax.lax.fori_loop(0, M, body, x_)
    ms = bench(go_t, xt, src)
    print("axis1 28xK:    %6.2f ms (%.1f ns/idx)" % (ms, ms * 1e6 / P),
          flush=True)


if __name__ == "__main__":
    main()
