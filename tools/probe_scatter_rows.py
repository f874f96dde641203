#!/usr/bin/env python
"""Is a 2-D row scatter-add column-flat like the row gather?

The image accumulation currently pays three 1-d scatter-adds (one per
channel plane, ~7-10 ns/index/channel). Row GATHERS are column-flat to
16 cols on v5e (probe_gather_cols) — if row SCATTERS are too, banking
accum as (N, C) rows and scattering (K, C) RGB rows in ONE op would cut
image accumulation ~3x (~33 -> ~12 ms/frame at 1024^2).

Measures marginal per-call cost of:
  s3x1d  3 x acc1d.at[pix + c*N].add(val[:, c])       (current form)
  s2d_C  accC.at[pix].add(valC)  for C in (3, 4, 8)   (row form)
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
    rng = np.random.default_rng(11)

    def marginal(make, m=(4, 24)):
        def chain(M):
            def run():
                def body(i, acc):
                    return make(i, acc)
                return jax.lax.fori_loop(0, M, body, make(None, None))
            g = jax.jit(run)
            np.asarray(jax.tree_util.tree_leaves(g())[0][:1])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jax.tree_util.tree_leaves(g())[0][:1])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        lo, hi = m
        return (chain(hi) - chain(lo)) / (hi - lo) * 1e3

    for K in (1 << 18, 1 << 20):
        pix = jnp.asarray(rng.integers(0, N, K).astype(np.int32))
        v3 = jnp.asarray(rng.normal(size=(K, 3)).astype(np.float32))

        def s3x1d(i, acc):
            if i is None:
                return jnp.zeros((3 * N,), jnp.float32)
            p = (pix + i) % N
            acc = acc.at[p].add(v3[:, 0])
            acc = acc.at[p + N].add(v3[:, 1])
            acc = acc.at[p + 2 * N].add(v3[:, 2])
            return acc

        out = ["K=%7d  s3x1d %6.2f ms" % (K, marginal(s3x1d))]
        for C in (3, 4, 8):
            vC = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32))

            def s2d(i, acc, vC=vC, C=C):
                if i is None:
                    return jnp.zeros((N, C), jnp.float32)
                return acc.at[(pix + i) % N].add(vC)

            out.append("s2d_%d %6.2f ms" % (C, marginal(s2d)))
        print("  ".join(out), flush=True)


if __name__ == "__main__":
    main()
