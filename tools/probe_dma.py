#!/usr/bin/env python
"""Can a Pallas DMA row-gather/scatter beat XLA's per-index lowering?

The compact permute (tracer/regen.py pool permute: one (P,13-16) f32
row-gather) and the ring drain (per-index scatter-add) run at XLA's
per-index rates — 21.7 ns/idx gather at 1M rows, ~6-10 ns/idx/ch
scatter-add. Those rates are ~1% of v5e HBM bandwidth (the 13-col 1M-row
permute moves ~100 MB in 22 ms = 5 GB/s on an ~800 GB/s part), because XLA
lowers gather/scatter as a sequential per-index loop with no memory-level
parallelism. The reference's analog is hardware texture gathers
(/root/reference/src/renderkernel.cu:100-113).

This probe measures whether a hand-written Pallas kernel that keeps a
window of W row DMAs in flight (HBM->VMEM, scalar-indexed rows — the same
scalar-driven-copy move that made the SMEM BVH table 2.2x) can do better.

  take       jnp.take baseline (what the permute pays today)
  dma_perm   per-row DMA gather, random permutation indices
  dma_sort   per-row DMA gather, monotone indices (run-friendly best case)
  dma_const  per-row DMA gather, all indices 0 (pure issue-rate ceiling)
  dma_run8   per-row DMA gather, runs of 8 consecutive indices
  run8_batch run-batched DMA gather: one (8,16) descriptor per run of 8
  dma_scat   per-row DMA scatter (write): inverse permutation store

Methodology: bench.py marginal-cost (chained executions inside one jit;
report (run(M1)-run(M0))/(M1-M0)).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _chained_cost(make_one, reps=3, m0=2, m1=10):
    import jax
    import jax.numpy as jnp

    def chained(M):
        def body(i, c):
            return c + make_one(i)
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

    return (run(m1) - run(m0)) / (m1 - m0) * 1e3


def make_dma_gather(P, C, chunk=2048, window=16, batch=1, interpret=False):
    """Returns gather(tab (P,C) f32, idx (P,) i32) -> (P,C) f32 that
    copies row idx[j] -> out row j with a W-deep in-flight DMA window.

    batch=G copies G consecutive rows per descriptor (caller guarantees
    idx[j*G + k] == idx[j*G] + k within each batch — the run-batched
    variant); batch=1 is the general per-row form."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert chunk % batch == 0
    nd = chunk // batch          # descriptors per chunk

    def kernel(idx_ref, tab_ref, out_ref, sem):
        def cp(d):
            j = d * batch
            s = idx_ref[j]
            if C == 0:           # flat 1-D table: rows are 16-f32 spans
                return pltpu.make_async_copy(
                    tab_ref.at[pl.ds(s * 16, batch * 16)],
                    out_ref.at[pl.ds(j * 16, batch * 16)],
                    sem.at[d % window],
                )
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(s, batch), :],
                out_ref.at[pl.ds(j, batch), :],
                sem.at[d % window],
            )

        def warm(d, _):
            cp(d).start()
            return 0

        def body(d, _):
            cp(d - window).wait()
            cp(d).start()
            return 0

        def tail(d, _):
            cp(d).wait()
            return 0

        w = min(window, nd)
        jax.lax.fori_loop(0, w, warm, 0)
        jax.lax.fori_loop(w, nd, body, 0)
        jax.lax.fori_loop(nd - w, nd, tail, 0)

    grid = P // chunk

    def gather(tab, idx):
        if C == 0:               # flat 1-D table (P*16,)
            out_spec = pl.BlockSpec((chunk * 16,), lambda i: (i,),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((P * 16,), jnp.float32)
        else:
            out_spec = pl.BlockSpec((chunk, C), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((P, C), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[pltpu.SemaphoreType.DMA((window,))],
            interpret=interpret,
        )(idx, tab)

    return gather


def make_dma_scatter(P, C, chunk=2048, window=16, interpret=False):
    """Returns scatter(tab (P,C) f32, idx (P,) i32) -> (P,C) f32 with
    out[idx[j]] = tab_block[j] (a permutation WRITE, not an add): the
    inverse-permutation form of the gather. Measures the store direction's
    descriptor rate (the ring drain analog; an add needs RMW on top)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, in_ref, out_ref, sem):
        def cp(j):
            s = idx_ref[j]
            return pltpu.make_async_copy(
                in_ref.at[pl.ds(j, 1), :],
                out_ref.at[pl.ds(s, 1), :],
                sem.at[j % window],
            )

        def warm(j, _):
            cp(j).start()
            return 0

        def body(j, _):
            cp(j - window).wait()
            cp(j).start()
            return 0

        def tail(j, _):
            cp(j).wait()
            return 0

        w = min(window, chunk)
        jax.lax.fori_loop(0, w, warm, 0)
        jax.lax.fori_loop(w, chunk, body, 0)
        jax.lax.fori_loop(chunk - w, chunk, tail, 0)

    grid = P // chunk

    def scatter(tab, idx):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((window,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idx, tab)

    return scatter


def main():
    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import jax
    import jax.numpy as jnp

    interpret = "--cpu" in sys.argv
    quick = "--quick" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    P = 1 << 20 if not interpret else 1 << 14
    rng = np.random.default_rng(0)
    # Mosaic lane-pads HBM f32 arrays to 128 columns and rejects 16-wide
    # row slices for DMA, so the row variants use a (P,128) table (8x the
    # pool row's bytes — if the measured cost is ISSUE-bound it prices a
    # 16-col gather too; if BANDWIDTH-bound divide by 8) and a flat 1-D
    # (P*16,) table probes true 64-B row spans (C=0).
    # tables are generated ON DEVICE (a 512 MB host->device transfer
    # through the axon relay measured minutes/wedged): value = row*2 + col%2
    # is cheap, unique per row, and reproducible host-side for checking
    def _mk_wide():
        r = jnp.arange(P, dtype=jnp.float32)[:, None]
        c = jnp.arange(128, dtype=jnp.float32)[None, :]
        return r * 2.0 + c * (1.0 / 256.0)

    def _mk_wide_np():
        r = np.arange(P, dtype=np.float32)[:, None]
        c = np.arange(128, dtype=np.float32)[None, :]
        return r * 2.0 + c * (1.0 / 256.0)

    tabw = jax.jit(_mk_wide)()
    tabf = jnp.arange(P * 16, dtype=jnp.float32) if "--flat" in sys.argv \
        else None

    perm = rng.permutation(P).astype(np.int32)
    srt = np.arange(P, dtype=np.int32)
    const = np.zeros(P, np.int32)
    # runs of 8: permute 8-row blocks, keep rows within a block consecutive
    blk = rng.permutation(P // 8).astype(np.int32)
    run8 = (blk[:, None] * 8 + np.arange(8, dtype=np.int32)).reshape(-1)

    # correctness first (small is enough in interpret; on TPU these also
    # gate for real-hardware Mosaic miscompiles before any timing)
    g = make_dma_gather(P, 128, chunk=1024, window=8, interpret=interpret)
    got = np.asarray(g(tabw, jnp.asarray(perm))[:4096])
    want = _mk_wide_np()[perm[:4096]]
    assert np.array_equal(got, want), "dma gather mismatch"
    print("gather(P,128) correctness OK", flush=True)
    if "--flat" in sys.argv:
        # MEASURED DEAD END on this toolchain: 1-D HBM arrays are tiled
        # (1024,), so a 16-f32 row span cannot be memref_slice'd for DMA
        # ("Slice shape along dimension 0 must be aligned to tiling (1024),
        # but is 16"). The minimum scalar-indexed DMA granule is a
        # lane-aligned (1,128) f32 row = 512 B.
        gf = make_dma_gather(P, 0, chunk=1024, window=8, interpret=interpret)
        got = np.asarray(gf(tabf, jnp.asarray(perm))[:4096 * 16])
        want = (np.asarray(tabf).reshape(P, 16)[perm[:4096]]).reshape(-1)
        assert np.array_equal(got, want), "dma flat gather mismatch"
        print("gather flat-1d correctness OK", flush=True)
    s = make_dma_scatter(P, 128, chunk=1024, window=8, interpret=interpret)
    got = np.asarray(s(tabw, jnp.asarray(perm))[:4096])
    wide_np = _mk_wide_np()
    want = np.empty_like(wide_np)
    want[perm] = wide_np
    assert np.array_equal(got, want[:4096]), "dma scatter mismatch"
    print("scatter correctness OK", flush=True)
    gb = make_dma_gather(P, 128, chunk=2048, window=8, batch=8,
                         interpret=interpret)
    got = np.asarray(gb(tabw, jnp.asarray(run8))[:4096])
    assert np.array_equal(got, wide_np[run8[:4096]]), "run8 mismatch"
    print("run8-batch correctness OK", flush=True)
    if interpret:
        return

    def take_cost():
        tab16 = tabw[:, :16] + 0.0
        idx = jnp.asarray(perm)
        return _chained_cost(
            lambda i: jnp.take(tab16, (idx + i) % P, axis=0)[0, 0])

    print("take(perm,16c)   %7.2f ms" % take_cost(), flush=True)

    cases = [
        ("wide_perm", tabw, 128, perm, {}),
        ("wide_const", tabw, 128, const, {}),
        ("run8_batch", tabw, 128, run8, {"batch": 8}),
    ]
    if "--flat" in sys.argv:
        cases += [("flat_perm", tabf, 0, perm, {}),
                  ("flat_sort", tabf, 0, srt, {}),
                  ("flat_run8b", tabf, 0, run8, {"batch": 8})]
    if not quick:
        cases += [
            ("wide_sort", tabw, 128, srt, {}),
        ]
    for name, tab, C, idx, kw in cases:
        for window in ((32,) if quick else (8, 32)):
            gk = make_dma_gather(P, C, window=window, **kw)
            idx_j = jnp.asarray(idx)
            ms = _chained_cost(
                lambda i, gk=gk, tab=tab: jnp.ravel(
                    gk(tab + 0.0 * i, idx_j))[0],
                m0=1, m1=5)
            print("%-11s W=%-3d %7.2f ms  (%5.1f ns/idx)"
                  % (name, window, ms, ms * 1e6 / P), flush=True)

    sk = make_dma_scatter(P, 128, window=32)
    idx_j = jnp.asarray(perm)
    ms = _chained_cost(lambda i: sk(tabw + 0.0 * i, idx_j)[0, 0],
                       m0=1, m1=5)
    print("wide_scat  W=32  %7.2f ms  (%5.1f ns/idx)" % (ms, ms * 1e6 / P),
          flush=True)


if __name__ == "__main__":
    main()
