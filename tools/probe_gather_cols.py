#!/usr/bin/env python
"""Gather cost vs column count at 1M rows (v5e).

ARCHITECTURE.md records the 1M-row gather as per-index and column-flat
to 16 (21.7 ms at 10/13/16 cols). The pipelined-NEE permute would carry
22 columns — price 16/20/22/24/32 before building it.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    P = 1 << 20
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.permutation(P).astype(np.int32))

    for cols in (13, 16, 20, 22, 24, 32):
        x = jnp.asarray(rng.normal(size=(P, cols)).astype(np.float32))

        def run(M):
            def go(x_, s_):
                def body(i, carry):
                    t = jnp.take(carry, s_, axis=0)
                    return t.at[0, 0].add(1e-12)
                return jax.lax.fori_loop(0, M, body, x_)
            g = jax.jit(go, static_argnums=())
            np.asarray(g(x, src)[:1])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(x, src)[:1])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        ms = (run(24) - run(4)) / 20 * 1e3
        print("cols=%2d: %6.2f ms/gather (%.1f ns/idx)"
              % (cols, ms, ms * 1e6 / P), flush=True)


if __name__ == "__main__":
    main()
