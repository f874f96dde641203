#!/usr/bin/env python
"""Does 1-d scatter-add cost scale with the TARGET array's rows?

The image accum rides the wave loop as ONE flat (3N,) array and every
scatter site adds at pix, pix+N, pix+2N. Row GATHER cost cliffs with
table rows (1.9/10.4/21.7 ns at 16k/131k/1M — probe_gather).  If the
scatter-add per-index cost also grows with target rows, splitting accum
into THREE separate (N,) channel planes cuts each scatter's target 3x
(1024^2: 3.1M -> 1M rows; 1080p: 6.2M -> 2.07M) for free.

Measures marginal per-call cost of scattering K random indices into:
  flat3N   one (3N,) target, adds at p / p+N / p+2N   (current form)
  sep3xN   three (N,) targets, three adds at p        (candidate)
  one1d_R  a single channel into targets of R rows    (pure size curve)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

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

    K = 1 << 20
    v3 = jnp.asarray(rng.normal(size=(K, 3)).astype(np.float32))

    # pure size curve: one channel, target rows R
    for R in (1 << 20, 3 * (1 << 20), 6 * (1 << 20)):
        pix = jnp.asarray(rng.integers(0, R, K).astype(np.int32))

        def one1d(i, acc, pix=pix, R=R):
            if i is None:
                return jnp.zeros((R,), jnp.float32)
            return acc.at[(pix + i) % R].add(v3[:, 0])

        c = marginal(one1d)
        print("one1d  R=%8d  %6.2f ms (%.2f ns/idx)"
              % (R, c, c / K * 1e6), flush=True)

    # flat (3N,) vs three (N,) planes at both image sizes
    for N in (1 << 20, 2073600):
        pix = jnp.asarray(rng.integers(0, N, K).astype(np.int32))

        def flat3N(i, acc, pix=pix, N=N):
            if i is None:
                return jnp.zeros((3 * N,), jnp.float32)
            p = (pix + i) % N
            acc = acc.at[p].add(v3[:, 0])
            acc = acc.at[p + N].add(v3[:, 1])
            acc = acc.at[p + 2 * N].add(v3[:, 2])
            return acc

        def sep3xN(i, acc, pix=pix, N=N):
            if i is None:
                return (jnp.zeros((N,), jnp.float32),
                        jnp.zeros((N,), jnp.float32),
                        jnp.zeros((N,), jnp.float32))
            p = (pix + i) % N
            a, b, c = acc
            return (a.at[p].add(v3[:, 0]), b.at[p].add(v3[:, 1]),
                    c.at[p].add(v3[:, 2]))

        print("N=%8d  flat3N %6.2f ms   sep3xN %6.2f ms"
              % (N, marginal(flat3N), marginal(sep3xN)), flush=True)


if __name__ == "__main__":
    main()
