#!/usr/bin/env python
"""Is the XLA row-gather's per-index cost sensitive to the INDEX PATTERN?

The compact permute's cost is one (1M,13+) row-gather at ~21.7 ns/index
(cliffs with table rows; column-flat to 16). If indices that are constant
(one hot row) or monotone (sequential-ish DMA) are cheaper than a random
permutation, the permute can be split: survivors (random, ~35%) carry the
full row; dead lanes (monotone positions) carry only (L, pixel); the tail
of the main gather degenerates to a constant index. Measures, at 1M x 13
f32 (bench marginal-cost methodology):

  perm     random permutation (the current permute's cost)
  const    all indices = 0
  mixed    35% random prefix + 65% constant tail (the split's main gather)
  sorted   monotone with skips (the dead-block gather's pattern)
  sorted4  monotone 512k indices into a (1M,4) table (the dead block)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    R = 1 << 20
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(R, 13)).astype(np.float32))
    tbl4 = jnp.asarray(rng.normal(size=(R, 4)).astype(np.float32))

    perm = rng.permutation(R).astype(np.int32)
    const = np.zeros(R, np.int32)
    n_sv = int(0.35 * R)
    mixed = np.concatenate([perm[:n_sv], np.zeros(R - n_sv, np.int32)])
    # monotone with skips: sorted positions of a ~65% subset, padded w/ last
    sub = np.sort(rng.choice(R, size=int(0.65 * R), replace=False))
    sorted_full = np.concatenate(
        [sub, np.full(R - sub.size, sub[-1], np.int32)]).astype(np.int32)
    half = np.sort(rng.choice(R, size=R // 2, replace=False)).astype(np.int32)

    def cost(table, idx, reps=3):
        idx = jnp.asarray(idx)

        def chained(M):
            def body(i, c):
                g = jnp.take(table, (idx + i) % R, axis=0)
                return c + g[0, 0]
            return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

        def run(M):
            f = jax.jit(lambda: chained(M))
            _ = np.asarray(f())
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(f())
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return (run(24) - run(4)) / 20.0 * 1e3

    # keep the +i cache-busting rotation OFF the monotone cases (it
    # preserves monotonicity anyway: (sorted+i)%R is two monotone runs)
    for name, table, idx in (("perm", tbl, perm), ("const", tbl, const),
                             ("mixed", tbl, mixed),
                             ("sorted", tbl, sorted_full),
                             ("sorted4_half", tbl4, half)):
        if name == "sorted4_half":
            # 512k indices into a 1M-row 4-col table
            ms = cost(table, idx)
        else:
            ms = cost(table, idx)
        print("%-13s %7.2f ms  (%5.1f ns/idx over %dk idx)"
              % (name, ms, ms * 1e6 / idx.size, idx.size // 1024),
              flush=True)


if __name__ == "__main__":
    main()
