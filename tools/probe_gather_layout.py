#!/usr/bin/env python
"""Do transposed-table gathers avoid the post-gather layout copy?

The profiler shows each per-wave table gather (tri_attr, env quad,
texture quad, env alias) emits {1,0}-major (N,C) results that XLA then
copies to {0,1} for the column-sliced consumers (~7.6 ms/frame total at
1024^2). If gathering from a (C,K) transposed table along axis=1 yields
the consumer layout directly — and the gather itself doesn't get slower
— the copies vanish.

Measures, at the real table sizes, marginal per-call cost of:
  rowg   jnp.take((K,C), idx, axis=0) + column-slice consume (current)
  colg   jnp.take((C,K), idx, axis=1) + row-slice consume
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
    rng = np.random.default_rng(5)
    idx0 = jnp.asarray(rng.integers(0, 4096, N).astype(np.int32))

    def marginal(make_body, m=(4, 24)):
        def chain(M):
            def run(i0):
                def body(i, c):
                    return c + make_body((i0 + i) % jnp.int32(97))
                return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))
            g = jax.jit(run)
            np.asarray(g(idx0))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(idx0))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        lo, hi = m
        return (chain(hi) - chain(lo)) / (hi - lo) * 1e3

    for K, C in ((4430, 28), (16384, 12), (65536, 12), (131072, 16)):
        tab = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32))
        tabT = jnp.asarray(np.asarray(tab).T.copy())
        idx = idx0 % jnp.int32(K)

        def rowg(shift):
            a = jnp.take(tab, (idx + shift) % K, axis=0)
            # consume like fetch_attributes: column slices into vec math
            u = a[:, 0:3] * a[:, 3:6] + a[:, 6:9]
            return u.sum() + a[:, C - 1].sum()

        def colg(shift):
            a = jnp.take(tabT, (idx + shift) % K, axis=1)
            u = a[0:3, :] * a[3:6, :] + a[6:9, :]
            return u.sum() + a[C - 1, :].sum()

        print("K=%6d C=%2d  rowg %6.2f ms  colg %6.2f ms"
              % (K, C, marginal(rowg), marginal(colg)), flush=True)


if __name__ == "__main__":
    main()
