"""Pallas TPU packet BVH traversal.

The performance problem with per-lane traversal on TPU is the per-lane
gather: every lane wants a different BVH node each step, and TPU vector
units have no efficient arbitrary-table gather (measured ~0.26 ms per 64k
gathers inside an XLA loop — 2 orders of magnitude off VPU speed).

This kernel removes the gather by traversing in *packets*: each grid cell
owns tiles of rays (SUB x 128 lanes) that walk the BVH together behind ONE
scalar cursor per tile. Node data is broadcast to all lanes; the traversal
stack is a scalar array in SMEM. A child is descended if ANY lane in the
packet intersects it — per-lane hit_t still tightens each lane's own slab
test. This is classical SIMD packet tracing (Wald et al.) re-cast for the
TPU's 8x128 VPU — the TPU-native replacement for the reference's per-thread
Kepler traversal + warp ballots (src/renderkernel.cu:136-419,310-321).

Three TPU-specific twists, all driven by measurement:

* The step cost is dominated by the scalar pipeline (row fetch, scalar
  extractions, reductions, branches) — ~1.2 us/step vs ~0.06 us of vector
  work. So the step is BRANCH-FREE: the node slab test and the Woop
  triangle test read the same 14 row columns and both are computed every
  step, with the outcome selected by the cursor's sign. No lax.cond.

* Several INDEPENDENT packets are interleaved in one kernel instance
  (`interleave`): their scalar chains have no data dependencies, so the
  compiler can overlap the latencies that would otherwise serialize.

* The table lives in SMEM when it fits (scalar-prefetch operands,
  table_mem="auto"): the 14 per-step values become plain scalar loads
  instead of (1,1)-slice extractions+reductions from a VMEM row —
  measured 2.2x whole-kernel throughput on v5e (348 -> 816 Mrays/s
  coherent, 20.7 -> 45.9 incoherent at 1M rays). SMEM is 1 MiB on v5e;
  bigger scenes fall back to the VMEM path automatically.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.int32(0x76543210)
F32_BIG = np.float32(1e30)


def _make_step(tab_ref, anyhit, smem_tabs=None, tmin=None,
               anyhit_early_stop=True, split_rows=0, packed_rows=False):
    """Returns step(state, stack_ref, base, rays) -> state for ONE packet.
    rays: dict of per-lane (SUB,128) arrays + precomputed idir/ood — passed
    per call so the queue kernel can swap ray sets when a slot claims a new
    packet. state is (cur, sp, hit_slot, hit_t) plus a trailing `done`
    int32 tile ONLY when anyhit (closest-hit traces don't carry the dead
    (SUB,128) tile through every while-loop iteration). tmin is a SCALAR
    read once from SMEM (it is loop-invariant; a full per-lane tile cost
    an operand + per-step re-read in the queue kernel for no information).

    (A per-lane anyhit variant — act=2 lanes first-hit-terminate, letting
    one call trace ext+NEE-shadow rays together and pay the ~4 ms
    per-invocation fixed cost once — was built and measured WORSE on
    device: merged 2M-lane call 70.9 ms vs 68.0 for the two separate
    calls (probe run, round 3); the early-stop cross-lane reduction it
    adds to every closest-hit tri step costs more than the fixed-cost
    saving, and consecutive-packet queue instances never mix the two
    populations so there is no joint-balancing gain. Deleted — do not
    rebuild without a layout that interleaves the populations.)

    Near-child ordering is by per-step entry-distance min-reductions (two
    full-packet cross-lane reductions per node step). Two cheaper-step
    orderings ("axis" child-order codes, "entry-sampled" packed votes) were
    built, measured net-negative or par end-to-end, and deleted — numbers
    in ARCHITECTURE.md: the step is scalar-extraction-throughput-bound, not
    reduction-bound."""

    def step(st, stack_ref, base, rays):
        ox, oy, oz = rays["ox"], rays["oy"], rays["oz"]
        dx, dy, dz = rays["dx"], rays["dy"], rays["dz"]
        idx_, idy, idz = rays["idx"], rays["idy"], rays["idz"]
        oodx, oody, oodz = rays["oodx"], rays["oody"], rays["oodz"]
        if anyhit:
            cur, sp, hit_slot, hit_t, done = st  # done: int32 lanes (0/1)
        else:
            cur, sp, hit_slot, hit_t = st
            done = None
        if "act" in rays:
            act = rays["act"]
        else:
            # queue path: inactivity rides tmax's SIGN (inactive lanes
            # carry hit_t = -1 < tmin; active lanes' hit_t can never
            # drop to <= tmin because tri hits require t > tmin), so the
            # act tile needs no operand and no per-step re-read
            act = hit_t > tmin
        alive = cur != SENTINEL
        is_node = alive & (cur >= 0)
        is_tri = alive & (cur < 0)
        row = jnp.where(is_tri, ~cur, jnp.where(is_node, cur, 0))

        def _smem_fetch(r):
            # SMEM-resident rows: the 14 per-step values are plain scalar
            # loads — measured 2.2x the whole-kernel throughput of the VMEM
            # extraction path on v5e (both coherent and incoherent rays)
            tab_smem, meta_smem = smem_tabs
            rb = r * 12
            return tuple(tab_smem[rb + c] for c in range(12)) + (
                meta_smem[r * 2], meta_smem[r * 2 + 1])

        def _vmem_fetch(r):
            # 12 shared scalar extractions: the node row's box floats + 2
            # children occupy the same columns as a tri row's 12 Woop
            # floats + (attr, last). (A matmul-replication trick that
            # avoided these extractions compiled but silently produced
            # zero hits on real v5e hardware — do not reintroduce it
            # without an on-device check.)
            if packed_rows:
                # packed-row table (Kp/8, 128): 8 logical 16-col rows per
                # native 128-lane row — kills the 8x lane padding a (K,16)
                # f32 VMEM array pays under (8,128) tiling. Row r sits at
                # lanes (r%8)*16..+16 of native row r//8; a dynamic roll
                # brings it to lanes 0..15, then the extractions are the
                # same static (1,1)-slice reductions as the plain path.
                vrow = tab_ref[pl.ds(r >> 3, 1), :]
                off = (r & 7) << 4
                prow = pltpu.roll(vrow, -off, axis=1)
            else:
                prow = tab_ref[pl.ds(r, 1), :]
            fs = tuple(jnp.sum(prow[0:1, c:c + 1]) for c in range(12))
            ms = tuple(jnp.sum(jax.lax.bitcast_convert_type(
                prow[0:1, c:c + 1], jnp.int32)) for c in (12, 13))
            return fs + ms

        if smem_tabs is not None and split_rows:
            # split table (tables over the SMEM budget): the BFS-ordered
            # hot prefix (top-of-tree node rows, where steps concentrate
            # because every traversal restarts at the root) rides SMEM;
            # deep rows take the VMEM extraction path. One scalar branch
            # per step picks the side.
            (f0, f1, f2, f3, f4, f5, f6, f7, f8, f9, f10, f11,
             m0, m1) = jax.lax.cond(row < split_rows,
                                    lambda: _smem_fetch(row),
                                    lambda: _vmem_fetch(row))
        elif smem_tabs is not None:
            (f0, f1, f2, f3, f4, f5, f6, f7, f8, f9, f10, f11,
             m0, m1) = _smem_fetch(row)
        else:
            (f0, f1, f2, f3, f4, f5, f6, f7, f8, f9, f10, f11,
             m0, m1) = _vmem_fetch(row)

        vote = act & (done == 0) if anyhit else act

        # ---- node interpretation: two slab tests ----
        c0lox = f0 * idx_ - oodx
        c0hix = f1 * idx_ - oodx
        c0loy = f2 * idy - oody
        c0hiy = f3 * idy - oody
        c1lox = f4 * idx_ - oodx
        c1hix = f5 * idx_ - oodx
        c1loy = f6 * idy - oody
        c1hiy = f7 * idy - oody
        c0loz = f8 * idz - oodz
        c0hiz = f9 * idz - oodz
        c1loz = f10 * idz - oodz
        c1hiz = f11 * idz - oodz
        c0min = jnp.maximum(jnp.maximum(jnp.minimum(c0lox, c0hix),
                                        jnp.minimum(c0loy, c0hiy)),
                            jnp.maximum(jnp.minimum(c0loz, c0hiz), tmin))
        c0max = jnp.minimum(jnp.minimum(jnp.maximum(c0lox, c0hix),
                                        jnp.maximum(c0loy, c0hiy)),
                            jnp.minimum(jnp.maximum(c0loz, c0hiz), hit_t))
        c1min = jnp.maximum(jnp.maximum(jnp.minimum(c1lox, c1hix),
                                        jnp.minimum(c1loy, c1hiy)),
                            jnp.maximum(jnp.minimum(c1loz, c1hiz), tmin))
        c1max = jnp.minimum(jnp.minimum(jnp.maximum(c1lox, c1hix),
                                        jnp.maximum(c1loy, c1hiy)),
                            jnp.minimum(jnp.maximum(c1loz, c1hiz), hit_t))
        v0 = vote & (c0min <= c0max)
        v1 = vote & (c1min <= c1max)
        e0 = jnp.min(jnp.where(v0, c0min, F32_BIG))
        e1 = jnp.min(jnp.where(v1, c1min, F32_BIG))
        any0 = e0 < F32_BIG
        any1 = e1 < F32_BIG
        both = any0 & any1
        swap = both & (e1 < e0)
        near = jnp.where(swap, m1, m0)
        far = jnp.where(swap, m0, m1)
        node_next = jnp.where(both, near, jnp.where(any0, m0, m1))
        node_pop = ~any0 & ~any1
        node_push = both

        # ---- triangle interpretation: Woop test ----
        Oz = f3 - ox * f0 - oy * f1 - oz * f2
        invDz = 1.0 / (dx * f0 + dy * f1 + dz * f2)
        t = Oz * invDz
        Ox = f7 + ox * f4 + oy * f5 + oz * f6
        u = Ox + t * (dx * f4 + dy * f5 + dz * f6)
        Oy = f11 + ox * f8 + oy * f9 + oz * f10
        v = Oy + t * (dx * f8 + dy * f9 + dz * f10)
        tri_hit = is_tri & vote & (t > tmin) & (t < hit_t) \
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        hit_t = jnp.where(tri_hit, t, hit_t)
        hit_slot = jnp.where(tri_hit, m0, hit_slot)
        tri_last = m1 != 0
        if anyhit:
            # `done` is carried as int32: Mosaic fails to legalize i1 vector
            # loop carries (scf.yield layout error)
            done = done | tri_hit.astype(jnp.int32)
            if anyhit_early_stop:
                # all-lanes-done early exit: a full cross-lane reduction
                # on EVERY tri step (72% of steps) buys earlier packet
                # termination — A/B-able because the reduce sits on the
                # scalar critical path
                tri_stop = tri_last | ~jnp.any(act & (done == 0))
            else:
                tri_stop = tri_last
        else:
            tri_stop = tri_last

        # ---- combine + shared stack (scalar, in SMEM at `base`) ----
        need_pop = (is_node & node_pop) | (is_tri & tri_stop)
        push = is_node & node_push
        top = stack_ref[base + jnp.maximum(sp - 1, 0)]
        popped = jnp.where(sp > 0, top, SENTINEL)
        go = jnp.where(is_node, node_next, cur - 1)
        new_cur = jnp.where(alive,
                            jnp.where(need_pop, popped, go), cur)
        new_sp = jnp.where(need_pop, jnp.maximum(sp - 1, 0), sp)

        @pl.when(push)
        def _():
            stack_ref[base + new_sp] = far

        new_sp = new_sp + push.astype(jnp.int32)
        if anyhit:
            return new_cur, new_sp, hit_slot, hit_t, done
        return new_cur, new_sp, hit_slot, hit_t

    return step


def _make_step_branch(tab_ref, rays, anyhit, smem_tabs=None, tmin=None):
    """Branched variant of _make_step: a 3-way lax.switch on the cursor
    (finished / node / triangle) instead of computing both interpretations
    every step. Saves half the VPU work per step and makes a finished
    packet's steps near-free (today a done packet keeps burning full steps
    until its interleave-mates finish). Costs one scalar multi-way branch
    per step — whether that beats the branch-free overlap is measured on
    device (see RenderSettings.packet_step)."""
    idx_, idy, idz = rays["idx"], rays["idy"], rays["idz"]
    oodx, oody, oodz = rays["oodx"], rays["oody"], rays["oodz"]
    ox, oy, oz = rays["ox"], rays["oy"], rays["oz"]
    dx, dy, dz = rays["dx"], rays["dy"], rays["dz"]
    act = rays["act"]

    def step(st, stack_ref, base):
        if anyhit:
            cur, sp, hit_slot, hit_t, done = st
        else:
            cur, sp, hit_slot, hit_t = st
            done = None
        is_node = cur >= 0
        row = jnp.where(cur < 0, ~cur, jnp.maximum(cur, 0))

        if smem_tabs is not None:
            tab_smem, meta_smem = smem_tabs
            rb = row * 12

            def sc(c):
                return tab_smem[rb + c]

            def sci(c):
                return meta_smem[row * 2 + (c - 12)]
        else:
            prow = tab_ref[pl.ds(row, 1), :]

            def sci(c):
                v = jax.lax.bitcast_convert_type(prow[0:1, c:c + 1],
                                                 jnp.int32)
                return jnp.sum(v)

            def sc(c):
                return jnp.sum(prow[0:1, c:c + 1])

        vote = act & (done == 0) if anyhit else act
        top = stack_ref[base + jnp.maximum(sp - 1, 0)]
        popped = jnp.where(sp > 0, top, SENTINEL)
        pop_sp = jnp.maximum(sp - 1, 0)

        def dead_fn():
            return st

        def node_fn():
            f0, f1, f2, f3 = sc(0), sc(1), sc(2), sc(3)
            f4, f5, f6, f7 = sc(4), sc(5), sc(6), sc(7)
            f8, f9, f10, f11 = sc(8), sc(9), sc(10), sc(11)
            m0 = sci(12)
            m1 = sci(13)
            c0lox = f0 * idx_ - oodx
            c0hix = f1 * idx_ - oodx
            c0loy = f2 * idy - oody
            c0hiy = f3 * idy - oody
            c1lox = f4 * idx_ - oodx
            c1hix = f5 * idx_ - oodx
            c1loy = f6 * idy - oody
            c1hiy = f7 * idy - oody
            c0loz = f8 * idz - oodz
            c0hiz = f9 * idz - oodz
            c1loz = f10 * idz - oodz
            c1hiz = f11 * idz - oodz
            c0min = jnp.maximum(jnp.maximum(jnp.minimum(c0lox, c0hix),
                                            jnp.minimum(c0loy, c0hiy)),
                                jnp.maximum(jnp.minimum(c0loz, c0hiz),
                                            tmin))
            c0max = jnp.minimum(jnp.minimum(jnp.maximum(c0lox, c0hix),
                                            jnp.maximum(c0loy, c0hiy)),
                                jnp.minimum(jnp.maximum(c0loz, c0hiz),
                                            hit_t))
            c1min = jnp.maximum(jnp.maximum(jnp.minimum(c1lox, c1hix),
                                            jnp.minimum(c1loy, c1hiy)),
                                jnp.maximum(jnp.minimum(c1loz, c1hiz),
                                            tmin))
            c1max = jnp.minimum(jnp.minimum(jnp.maximum(c1lox, c1hix),
                                            jnp.maximum(c1loy, c1hiy)),
                                jnp.minimum(jnp.maximum(c1loz, c1hiz),
                                            hit_t))
            v0 = vote & (c0min <= c0max)
            v1 = vote & (c1min <= c1max)
            e0 = jnp.min(jnp.where(v0, c0min, F32_BIG))
            e1 = jnp.min(jnp.where(v1, c1min, F32_BIG))
            any0 = e0 < F32_BIG
            any1 = e1 < F32_BIG
            both = any0 & any1
            swap = both & (e1 < e0)
            near = jnp.where(swap, m1, m0)
            far = jnp.where(swap, m0, m1)
            nxt = jnp.where(both, near, jnp.where(any0, m0, m1))
            need_pop = ~any0 & ~any1
            new_cur = jnp.where(need_pop, popped, nxt)
            new_sp = jnp.where(need_pop, pop_sp, sp)

            @pl.when(both)
            def _():
                stack_ref[base + new_sp] = far

            new_sp = new_sp + both.astype(jnp.int32)
            if anyhit:
                return new_cur, new_sp, hit_slot, hit_t, done
            return new_cur, new_sp, hit_slot, hit_t

        def tri_fn():
            f0, f1, f2, f3 = sc(0), sc(1), sc(2), sc(3)
            f4, f5, f6, f7 = sc(4), sc(5), sc(6), sc(7)
            f8, f9, f10, f11 = sc(8), sc(9), sc(10), sc(11)
            m0 = sci(12)
            m1 = sci(13)
            Oz = f3 - ox * f0 - oy * f1 - oz * f2
            invDz = 1.0 / (dx * f0 + dy * f1 + dz * f2)
            t = Oz * invDz
            Ox = f7 + ox * f4 + oy * f5 + oz * f6
            u = Ox + t * (dx * f4 + dy * f5 + dz * f6)
            Oy = f11 + ox * f8 + oy * f9 + oz * f10
            v = Oy + t * (dx * f8 + dy * f9 + dz * f10)
            tri_hit = vote & (t > tmin) & (t < hit_t) \
                & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            new_t = jnp.where(tri_hit, t, hit_t)
            new_slot = jnp.where(tri_hit, m0, hit_slot)
            tri_last = m1 != 0
            if anyhit:
                new_done = done | tri_hit.astype(jnp.int32)
                tri_stop = tri_last | ~jnp.any(act & (new_done == 0))
            else:
                tri_stop = tri_last
            new_cur = jnp.where(tri_stop, popped, cur - 1)
            new_sp = jnp.where(tri_stop, pop_sp, sp)
            if anyhit:
                return new_cur, new_sp, new_slot, new_t, new_done
            return new_cur, new_sp, new_slot, new_t

        branch = jnp.where(cur == SENTINEL, 0,
                           jnp.where(is_node, 1, 2))
        return jax.lax.switch(branch, (dead_fn, node_fn, tri_fn))

    return step


# A third variant — the fused step wrapped in one dead-packet
# lax.cond ("skip") — measured 262.6 ms/frame at 1024^2 vs fused 220.1
# and was deleted: on the hit-slot-ordered real population, packets of an
# instance finish together, so the skip almost never fires and the cond
# only costs. (Applying branch/skip to just the anyhit shadow trace lost
# too: 225.6 / 228.8 ms.)


def _kernel(*refs, anyhit, stack_depth, interleave, sub, smem_table,
            step_mode="fused", anyhit_early_stop=True, count_steps=False,
            split_rows=0, packed_rows=False, unroll=1):
    if smem_table and split_rows:
        (tab_smem, meta_smem, tmin_smem, tab_ref, ox_ref, oy_ref, oz_ref,
         dx_ref, dy_ref, dz_ref, tmax_ref, act_ref, slot_ref, t_ref,
         *rest) = refs
        smem_tabs = (tab_smem, meta_smem)
    elif smem_table:
        (tab_smem, meta_smem, tmin_smem, ox_ref, oy_ref, oz_ref, dx_ref,
         dy_ref, dz_ref, tmax_ref, act_ref, slot_ref, t_ref,
         *rest) = refs
        tab_ref = None
        smem_tabs = (tab_smem, meta_smem)
    else:
        (tab_ref, tmin_smem, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
         dz_ref, tmax_ref, act_ref, slot_ref, t_ref, *rest) = refs
        smem_tabs = None
    if count_steps:
        nst_ref, stack_ref = rest
    else:
        (stack_ref,) = rest
    G = interleave
    ns = 5 if anyhit else 4           # state arity before the counter
    tmin = tmin_smem[0]               # loop-invariant scalar
    ooeps = jnp.float32(2.0 ** -80)

    def inv(d):
        safe = jnp.where(jnp.abs(d) > ooeps, d,
                         jnp.where(d >= 0, ooeps, -ooeps))
        return 1.0 / safe

    states = []
    steps = []
    rays_l = []
    fused_step = _make_step(tab_ref, anyhit, smem_tabs=smem_tabs,
                            tmin=tmin,
                            anyhit_early_stop=anyhit_early_stop,
                            split_rows=split_rows,
                            packed_rows=packed_rows)
    for g in range(G):
        sl = pl.ds(g * sub, sub)
        rays = {}
        rays["ox"] = ox_ref[sl, :]
        rays["oy"] = oy_ref[sl, :]
        rays["oz"] = oz_ref[sl, :]
        rays["dx"] = dx_ref[sl, :]
        rays["dy"] = dy_ref[sl, :]
        rays["dz"] = dz_ref[sl, :]
        rays["act"] = act_ref[sl, :] != 0
        rays["idx"] = inv(rays["dx"])
        rays["idy"] = inv(rays["dy"])
        rays["idz"] = inv(rays["dz"])
        rays["oodx"] = rays["ox"] * rays["idx"]
        rays["oody"] = rays["oy"] * rays["idy"]
        rays["oodz"] = rays["oz"] * rays["idz"]
        tmax_g = tmax_ref[sl, :]
        hit_t0 = jnp.where(rays["act"], tmax_g, tmin)
        cur0 = jnp.where(jnp.any(rays["act"]), jnp.int32(0), SENTINEL)
        state = (cur0, jnp.int32(0),
                 jnp.full((sub, 128), -1, jnp.int32), hit_t0)
        if anyhit:
            state = state + (jnp.zeros((sub, 128), jnp.int32),)
        if count_steps:
            state = state + (jnp.int32(0),)   # live-step counter
        states.append(state)
        rays_l.append(rays)
        if step_mode == "branch":
            steps.append(_make_step_branch(tab_ref, rays, anyhit,
                                           smem_tabs=smem_tabs,
                                           tmin=tmin))

    def cond(c):
        alive = c[0][0] != SENTINEL
        for g in range(1, G):
            alive = alive | (c[g][0] != SENTINEL)
        return alive

    def body(c):
        # unroll > 1: several dependent steps per while iteration — a
        # finished packet's extra sub-steps are no-ops (SENTINEL is a
        # fixed point of the step), and the loop-control + carry-shuffle
        # overhead is paid once per `unroll` steps (VERDICT r04 #4: the
        # step is scalar-bound, so fixed per-iteration work matters)
        out = []
        for g in range(G):
            new = c[g][:ns]
            live = c[g][ns] if count_steps else None
            for _ in range(unroll):
                if count_steps:
                    live = live + (new[0] != SENTINEL).astype(jnp.int32)
                if step_mode == "branch":
                    new = steps[g](new, stack_ref, g * stack_depth)
                else:
                    new = fused_step(new, stack_ref, g * stack_depth,
                                     rays_l[g])
            if count_steps:
                new = new + (live,)
            out.append(new)
        return tuple(out)

    final = jax.lax.while_loop(cond, body, tuple(states))
    for g in range(G):
        sl = pl.ds(g * sub, sub)
        hit_slot, hit_t = final[g][2], final[g][3]
        act = act_ref[sl, :] != 0
        slot_ref[sl, :] = hit_slot
        t_ref[sl, :] = jnp.where(act, hit_t, tmax_ref[sl, :])
        if count_steps:
            nst_ref[sl, :] = jnp.full((sub, 128), final[g][ns], jnp.int32)


def _queue_kernel(*refs, anyhit, stack_depth, interleave, sub, smem_table,
                  queue_k, prefix_act=False, anyhit_early_stop=True,
                  count_steps=False, split_rows=0, packed_rows=False,
                  unroll=1):
    """Work-queue variant of _kernel: one instance owns `queue_k`
    consecutive packets and `interleave` step slots; when a slot's packet
    finishes it CLAIMS the instance's next unclaimed packet (greedy list
    scheduling), so the while-loop's joint-max straggler tax is paid once
    per instance instead of once per `interleave` packets. Offline on the
    real mid-frame population (tools/eval_rebalance_offline.py) this pays
    +14% over live steps at queue_k=64 and +7% at 128, vs +73-89% for the
    fixed grouping — packet step counts are heavy-tailed (p50 186 /
    p95 1058 / max 2053) and no compaction-time predictor of them exists
    (63-72% of pool lanes are respawned fresh every wave).

    Design notes (v2 — the first cut carried each slot's 15 ray tiles as
    while-loop state and re-claimed under a lax.cond; Mosaic shuttles
    ~480 KB of carries through every iteration and it measured ~2.1x the
    fixed kernel's per-step cost, losing end to end): rays are re-read
    from the input refs EVERY step through dynamic slices at the slot's
    packet cursor (idir/ood arrive precomputed as extra inputs so no
    per-step divides), the claim is branch-free scalar logic, and only
    the result store for a just-finished packet sits under a pl.when
    taken on ~2-3% of iterations.

    prefix_act=True (closest-hit only): the caller guarantees the active
    set is an exact lane PREFIX with one scalar tmax (the regen pool after
    compaction + rank-ordered respawn). The tmax operand disappears: the
    encoded tmax tile (tmax on active lanes, -1 past the prefix) is
    derived from a loop-invariant lane iota + two SMEM scalars, removing
    one of the 10 per-step (sub,128) VMEM re-reads (the claim logic read
    the tmax tile EVERY iteration) and the caller's full-width tmax_enc
    prep fusion.

    (A packed-rays variant — all 9 ray channels in ONE packet-major
    operand so the per-step re-read is a single (9*sub,128) dynamic
    slice instead of 9 separately-addressed ones — was built, verified
    bit-exact on device, and measured WORSE in situ: 156.1 vs 153.0
    ms/frame at 1024^2. Mosaic prefers 9 small dynamic slices to one
    wide one; per-step dynamic addressing is not the queue kernel's
    overhead. Reverted — code in git history.)"""
    if smem_table:
        if split_rows:
            if prefix_act:
                (tab_smem, meta_smem, tmin_smem, tab_ref, ox_ref, oy_ref,
                 oz_ref, dx_ref, dy_ref, dz_ref, idx_ref, idy_ref, idz_ref,
                 slot_ref, t_ref, *rest) = refs
                tmax_ref = None
            else:
                (tab_smem, meta_smem, tmin_smem, tab_ref, ox_ref, oy_ref,
                 oz_ref, dx_ref, dy_ref, dz_ref, idx_ref, idy_ref, idz_ref,
                 tmax_ref, slot_ref, t_ref, *rest) = refs
        elif prefix_act:
            (tab_smem, meta_smem, tmin_smem, ox_ref, oy_ref, oz_ref,
             dx_ref, dy_ref, dz_ref, idx_ref, idy_ref, idz_ref,
             slot_ref, t_ref, *rest) = refs
            tmax_ref = None
            tab_ref = None
        else:
            (tab_smem, meta_smem, tmin_smem, ox_ref, oy_ref, oz_ref,
             dx_ref, dy_ref, dz_ref, idx_ref, idy_ref, idz_ref,
             tmax_ref, slot_ref, t_ref, *rest) = refs
            tab_ref = None
        smem_tabs = (tab_smem, meta_smem)
    else:
        if prefix_act:
            (tab_ref, tmin_smem, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
             dz_ref, idx_ref, idy_ref, idz_ref,
             slot_ref, t_ref, *rest) = refs
            tmax_ref = None
        else:
            (tab_ref, tmin_smem, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
             dz_ref, idx_ref, idy_ref, idz_ref,
             tmax_ref, slot_ref, t_ref, *rest) = refs
        smem_tabs = None
    if count_steps:
        nst_ref, stack_ref = rest
    else:
        (stack_ref,) = rest
    G = interleave
    K = queue_k
    ns = 5 if anyhit else 4           # step-state arity
    tmin = tmin_smem[0]               # loop-invariant scalar
    if prefix_act:
        # lane-prefix activity: tmax + active count ride SMEM scalars;
        # the encoded tmax tile is iota arithmetic (f32 lane ids are
        # exact: pool lanes < 2^24 at every supported config)
        tmax_s = tmin_smem[1]
        # n_act rides the f32 scalar block (exact < 2^24); compare in int
        # (Mosaic's tpu.iota is integer-only)
        n_act = tmin_smem[2].astype(jnp.int32)
        lane_iota = (jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
                     * 128
                     + jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1))
        tile0 = pl.program_id(0)

        def enc_tmax(pk):
            base = (tile0 * K + pk) * (sub * 128)
            return jnp.where(lane_iota + base < n_act, tmax_s,
                             jnp.float32(-1.0))

    def load_rays(pk):
        """pk: scalar packet index within the block (dynamic). ood is
        recomputed from o*idir (3 vmuls/step) instead of riding 3 more
        operands: the queue kernel re-reads rays from VMEM every step, so
        each dropped operand cuts per-step traffic AND the block's VMEM
        footprint (15 -> 10 ray operands lets bigger queue_k fit the
        default scoped-VMEM budget). There is NO act tile: inactivity
        rides tmax's sign (packet_intersect encodes tmax=-1 on inactive
        lanes; the step derives act = hit_t > tmin from its carry)."""
        names = ("ox", "oy", "oz", "dx", "dy", "dz", "idx", "idy", "idz")
        sl = pl.ds(pk * sub, sub)
        chans = (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 idx_ref, idy_ref, idz_ref)
        r = {nm: ref[sl, :] for nm, ref in zip(names, chans)}
        r["oodx"] = r["ox"] * r["idx"]
        r["oody"] = r["oy"] * r["idy"]
        r["oodz"] = r["oz"] * r["idz"]
        return r

    step = _make_step(tab_ref, anyhit, smem_tabs=smem_tabs, tmin=tmin,
                      anyhit_early_stop=anyhit_early_stop,
                      split_rows=split_rows, packed_rows=packed_rows)

    slots0 = []
    for g in range(G):
        sl = pl.ds(g * sub, sub)
        # cur starts at 0 even for all-inactive packets: they burn one
        # step, pop an empty stack and "just finish", which is what
        # triggers the result store and the next claim — a SENTINEL
        # start would wedge the slot (no finish edge, no claim). ht
        # starts at the ENCODED tmax (-1 on inactive lanes): those lanes
        # never vote (act = ht > tmin) and packet_intersect rewrites
        # their stored t to the caller's tmax outside the kernel.
        ht0 = enc_tmax(jnp.int32(g)) if prefix_act else tmax_ref[sl, :]
        st = (jnp.int32(g), jnp.int32(0), jnp.int32(0),
              jnp.full((sub, 128), -1, jnp.int32), ht0)
        if anyhit:
            st = st + (jnp.zeros((sub, 128), jnp.int32),)
        if count_steps:
            st = st + (jnp.int32(0),)
        slots0.append(st)
    carry0 = tuple(slots0) + (jnp.int32(G),)

    def cond(c):
        alive = c[0][1] != SENTINEL
        for g in range(1, G):
            alive = alive | (c[g][1] != SENTINEL)
        return alive

    def body(c):
        # unroll > 1: several dependent steps per while iteration before
        # the claim/result-store logic runs once — SENTINEL is a fixed
        # point of the step, so a packet finishing mid-group idles at
        # most unroll-1 no-op sub-steps (negligible against p50 step
        # counts), and the claim/store/loop-control overhead amortizes
        nxt = c[G]
        stepped = []
        fins = []
        for g in range(G):
            sl = c[g]
            pkt, cur = sl[0], sl[1]
            rays = load_rays(pkt)
            new = sl[1:1 + ns]
            live = sl[1 + ns] if count_steps else None
            for _ in range(unroll):
                if count_steps:
                    live = live + (new[0] != SENTINEL).astype(jnp.int32)
                new = step(new, stack_ref, g * stack_depth, rays)
            st = (pkt,) + new
            if count_steps:
                st = st + (live,)
            stepped.append(st)
            fins.append((new[0] == SENTINEL) & (cur != SENTINEL))
        any_fin = fins[0]
        for g in range(1, G):
            any_fin = any_fin | fins[g]

        # result store for just-finished packets (masked RMW; rare).
        # hit_t is stored RAW: inactive lanes carry the -1 tmax encoding
        # and packet_intersect restores their contract value (tmax)
        # outside the kernel.
        @pl.when(any_fin)
        def _():
            for g in range(G):
                sl = stepped[g]
                out = pl.ds(sl[0] * sub, sub)
                slot_ref[out, :] = jnp.where(fins[g], sl[3],
                                             slot_ref[out, :])
                t_ref[out, :] = jnp.where(fins[g], sl[4], t_ref[out, :])
                if count_steps:
                    nst_ref[out, :] = jnp.where(
                        fins[g],
                        jnp.full((sub, 128), sl[1 + ns], jnp.int32),
                        nst_ref[out, :])

        # branch-free claim: scalar cursor bump + state re-init selects.
        # The tmax re-derivation at the (possibly new) packet runs every
        # iteration — when no claim happened it recomputes the old
        # packet's tmax and the where discards it. On the prefix_act path
        # this is iota arithmetic; otherwise a (sub,128) VMEM re-read.
        out = []
        for g in range(G):
            sl = stepped[g]
            want = fins[g] & (nxt < K)
            pkt = jnp.where(want, nxt, sl[0])
            nxt = nxt + want.astype(jnp.int32)
            tmax_new = (enc_tmax(pkt) if prefix_act
                        else tmax_ref[pl.ds(pkt * sub, sub), :])
            st = (pkt,
                  jnp.where(want, jnp.int32(0), sl[1]),
                  jnp.where(want, jnp.int32(0), sl[2]),
                  jnp.where(want, jnp.full((sub, 128), -1, jnp.int32),
                            sl[3]),
                  jnp.where(want, tmax_new, sl[4]))
            if anyhit:
                st = st + (jnp.where(want,
                                     jnp.zeros((sub, 128), jnp.int32),
                                     sl[5]),)
            if count_steps:
                st = st + (jnp.where(want, jnp.int32(0), sl[1 + ns]),)
            out.append(st)
        return tuple(out) + (nxt,)

    jax.lax.while_loop(cond, body, carry0)


# SMEM is 1 MiB on v5e (measured empirically: a 512 KiB scalar scratch
# compiles, 1 MiB fails; a too-big prefetched operand reports
# "would exceed memory (size=1048576)"). Budget well under that for the
# flattened table + meta + stacks + grid scalars.
_SMEM_TABLE_BUDGET_BYTES = 700_000


def table_fits_smem(n_rows):
    """True when a packed stream of n_rows 14-col f32 rows fits the SMEM
    table budget — the single source of truth for both the kernel's
    auto fallback here and the Renderer's large-table packet-shape
    derivation (renderer.py), so the two cannot desynchronize."""
    return n_rows * 14 * 4 <= _SMEM_TABLE_BUDGET_BYTES


def packet_intersect(packed, orig, raydir, tmin, tmax, anyhit=False,
                     stack_depth=64, active=None, active_prefix=None,
                     tile_sub=8, interleave=4,
                     table_mem="auto", step_mode="fused", count_steps=False,
                     queue_k=0, anyhit_early_stop=True, step_unroll=1,
                     interpret=False):
    """Packet-traverse rays against the packed (K,16) primitive stream.

    orig/raydir: [N,3]; N is padded to tile_sub*interleave*128 internally.
    tmin must be a SCALAR (python float or 0-d array — every production
    caller passes RAY_MIN): it rides to the kernel as one SMEM float read
    once per instance instead of a full (N,) operand tile the queue
    kernel would re-read every step. tmax may be scalar or per-lane [N].
    Returns (hit_slot [N] i32, hit_t [N] f32); with count_steps=True also
    a per-lane i32 of its packet's live step count (diagnostic: the
    roofline's steps-per-wave input — all lanes of a packet share the
    value).

    table_mem: "smem" holds the table in scalar memory (scalar-prefetch
    operands; per-step values become plain scalar loads — measured 2.2x
    whole-kernel throughput vs the VMEM path on v5e), "vmem" uses the
    broadcast-row + extraction path, "auto" picks smem whenever the
    flattened table fits the SMEM budget.

    queue_k > interleave switches to the work-queue kernel: each instance
    owns queue_k consecutive packets and `interleave` step slots that
    claim packets greedily — see _queue_kernel. queue_k <= interleave (or
    0) keeps the fixed grouping.

    active_prefix (mutually exclusive with `active`): a traced int32
    scalar asserting the active set is the exact lane prefix [0, n).
    On the closest-hit queue path this drops the tmax operand entirely —
    act/tmax derive from SMEM scalars + a loop-invariant lane iota, so
    the claim logic stops re-reading a (sub,128) tmax tile every step
    and the caller's full-width tmax_enc prep fusion disappears. The
    regen integrator's compacted pool satisfies the prefix invariant by
    construction (survivor compaction + rank-ordered respawn). Other
    configs (anyhit, fixed grouping, per-lane tmax) silently lower it to
    an equivalent mask.
    """
    N = orig.shape[0]
    if active_prefix is not None:
        if active is not None:
            raise ValueError("pass active or active_prefix, not both")
        use_prefix = queue_k > interleave and not anyhit
        if not use_prefix:
            active = (jnp.arange(N, dtype=jnp.int32)
                      < jnp.asarray(active_prefix, jnp.int32))
            active_prefix = None
    use_prefix = active_prefix is not None
    if use_prefix and jnp.ndim(tmax) != 0:
        raise ValueError("active_prefix requires a scalar tmax")
    LANES = 128
    K = packed.shape[0]
    if jnp.ndim(tmin) != 0:
        raise ValueError("packet_intersect requires a scalar tmin "
                         "(per-lane tmin would cost a full operand tile "
                         "re-read per queue step; no caller needs it)")
    table_bytes = K * 14 * 4
    if table_mem == "auto":
        # smem when the whole table fits; vmem otherwise ("split" — BFS
        # hot prefix in SMEM + full stream in VMEM — must be requested
        # explicitly until its on-device A/B lands)
        table_mem = ("smem" if not interpret
                     and table_fits_smem(K) else "vmem")
    if table_mem not in ("smem", "vmem", "split", "vmem_packed"):
        # a typo ("smem_split", "packed", ...) must not silently fall
        # through to the plain-VMEM kernel and publish its numbers
        raise ValueError("unknown table_mem %r (want auto/smem/vmem/"
                         "split/vmem_packed)" % (table_mem,))
    if table_mem in ("split", "vmem_packed") and step_mode != "fused":
        raise ValueError("table_mem='%s' requires step_mode='fused'"
                         % table_mem)
    if table_mem == "smem" and table_bytes > _SMEM_TABLE_BUDGET_BYTES:
        # fail fast with a clear message instead of an opaque remote Mosaic
        # compile error 30-130 s later
        raise ValueError(
            "table_mem='smem': packed table is %d bytes, over the %d-byte "
            "SMEM budget — use table_mem='auto' or 'vmem'"
            % (table_bytes, _SMEM_TABLE_BUDGET_BYTES))
    queue = queue_k > interleave
    if queue and step_mode != "fused":
        raise ValueError("queue_k requires step_mode='fused'")
    if step_unroll < 1:
        # unroll=0 would compile a while-loop whose body returns the
        # carry unchanged — an infinite device loop the user can only
        # kill mid-execution (which crashes the remote worker)
        raise ValueError("step_unroll must be >= 1, got %d" % step_unroll)
    pkts_per_tile = queue_k if queue else interleave
    T = tile_sub * LANES * pkts_per_tile
    n_tiles = -(-N // T)
    Np = n_tiles * T
    rows = n_tiles * tile_sub * pkts_per_tile

    def prep(x, fill):
        x = jnp.asarray(x)
        if Np != N:
            x = jnp.pad(x, (0, Np - N), constant_values=fill)
        return x.reshape(rows, LANES)

    if use_prefix:
        # tmin / tmax / active-prefix count ride ONE SMEM scalar vector
        # (prefix counts < 2^24 are exact as f32 — enforced by the pool
        # sizes every caller uses)
        tmin1 = jnp.stack([jnp.asarray(tmin, jnp.float32),
                           jnp.asarray(tmax, jnp.float32),
                           jnp.asarray(active_prefix).astype(jnp.float32)])
    else:
        tmin1 = jnp.asarray(tmin, jnp.float32).reshape(1)
    tmax_a = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (N,))
    act = (jnp.ones((N,), jnp.int32) if active is None
           else active.astype(jnp.int32))

    if queue:
        # the queue kernel re-reads rays per step through a dynamic packet
        # cursor, so idir arrives precomputed (same ooeps clamp as the
        # in-kernel inv(); XLA fuses this into the pad/reshape) instead of
        # recomputing 3 divides per slot per step. ood = o*idir is NOT
        # precomputed: 3 in-kernel vmuls/step are cheaper than 3 more
        # operands' per-step VMEM re-reads + block footprint. There is no
        # act operand at all: inactivity is encoded as tmax = -1 (an
        # active lane's carried hit_t can never drop to <= tmin, so
        # act == hit_t > tmin inside the step), and the inactive lanes'
        # contract output (t = tmax) is restored after the call.
        ooeps = jnp.float32(2.0 ** -80)

        def inv_a(d):
            safe = jnp.where(jnp.abs(d) > ooeps, d,
                             jnp.where(d >= 0, ooeps, -ooeps))
            return 1.0 / safe

        args = (
            prep(orig[:, 0], 0.0), prep(orig[:, 1], 0.0),
            prep(orig[:, 2], 0.0),
            prep(raydir[:, 0], 1.0), prep(raydir[:, 1], 1.0),
            prep(raydir[:, 2], 1.0),
            prep(inv_a(raydir[:, 0]), 1.0), prep(inv_a(raydir[:, 1]), 1.0),
            prep(inv_a(raydir[:, 2]), 1.0),
        )
        if not use_prefix:
            tmax_enc = jnp.where(act != 0, tmax_a, jnp.float32(-1.0))
            args = args + (prep(tmax_enc, -1.0),)
    else:
        args = (
            prep(orig[:, 0], 0.0), prep(orig[:, 1], 0.0), prep(orig[:, 2], 0.0),
            prep(raydir[:, 0], 1.0), prep(raydir[:, 1], 1.0), prep(raydir[:, 2], 1.0),
            prep(tmax_a, 0.0), prep(act, 0),
        )

    blk = tile_sub * pkts_per_tile
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    if count_steps:
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
    n_out = len(out_shape)
    packed_rows = table_mem == "vmem_packed"
    if packed_rows:
        table_mem = "vmem"
        Kp = -(-K // 8) * 8
        if Kp != K:
            packed = jnp.pad(packed, ((0, Kp - K), (0, 0)))
        packed = packed.reshape(Kp // 8, 8 * packed.shape[1])
    if queue:
        kern = functools.partial(_queue_kernel, anyhit=anyhit,
                                 stack_depth=stack_depth,
                                 interleave=interleave, sub=tile_sub,
                                 smem_table=(table_mem in ("smem", "split")),
                                 packed_rows=packed_rows,
                                 queue_k=queue_k, prefix_act=use_prefix,
                                 anyhit_early_stop=anyhit_early_stop,
                                 count_steps=count_steps,
                                 unroll=step_unroll)
    else:
        kern = functools.partial(_kernel, anyhit=anyhit,
                                 stack_depth=stack_depth,
                                 interleave=interleave, sub=tile_sub,
                                 smem_table=(table_mem in ("smem", "split")),
                                 packed_rows=packed_rows,
                                 step_mode=step_mode,
                                 anyhit_early_stop=anyhit_early_stop,
                                 count_steps=count_steps,
                                 unroll=step_unroll)
    if table_mem in ("smem", "split"):
        # flattened f32 box/woop columns + i32 meta as scalar-prefetch
        # operands (2-D SMEM operands get lane-padded to 128 columns —
        # keep them 1-D). In split mode only the BFS-ordered hot PREFIX
        # rides SMEM; the full table additionally arrives as a VMEM
        # operand for the deep rows (see _make_step's split fetch).
        S = min(K, _SMEM_TABLE_BUDGET_BYTES // 56) if table_mem == "split" \
            else 0
        pfx = packed[:S] if S else packed
        tab_flat = pfx[:, :12].reshape(-1)
        meta_flat = jax.lax.bitcast_convert_type(
            pfx[:, 12:14], jnp.int32).reshape(-1)
        ray_spec = pl.BlockSpec((blk, LANES), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
        extra_specs = []
        extra_args = ()
        if S:
            extra_specs = [pl.BlockSpec(packed.shape, lambda i, *_: (0, 0),
                                        memory_space=pltpu.VMEM)]
            extra_args = (packed,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=extra_specs + [ray_spec] * len(args),
            out_specs=[ray_spec] * n_out,
            scratch_shapes=[pltpu.SMEM((stack_depth * interleave,),
                                       jnp.int32)],
        )
        # queue blocks hold queue_k packets x 11 ray operands and overflow
        # the default 16M scoped-VMEM budget at big queue_k; v5e has 128M
        # physical VMEM, so raise the cap for big-queue configs (and for
        # split tables, whose full stream rides VMEM too)
        cp = {}
        if (blk * LANES * 4 * (len(args) + n_out) * 2 > 15 << 20
                or (S and packed.size * 4 > 2 << 20)):
            cp = {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=118 * 1024 * 1024)}
        kern = functools.partial(kern, split_rows=S)
        outs = pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, **cp,
        )(tab_flat, meta_flat, tmin1, *extra_args, *args)
    else:
        ray_spec = pl.BlockSpec((blk, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec(packed.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        tmin_spec = pl.BlockSpec((tmin1.shape[0],), lambda i: (0,),
                                 memory_space=pltpu.SMEM)
        cp = {}
        if (blk * LANES * 4 * (len(args) + n_out) * 2 > 15 << 20
                or packed.size * 4 > 2 << 20):
            cp = {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=118 * 1024 * 1024)}
        outs = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[tab_spec, tmin_spec] + [ray_spec] * len(args),
            out_specs=[ray_spec] * n_out,
            out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((stack_depth * interleave,),
                                       jnp.int32)],
            interpret=interpret, **cp,
        )(packed, tmin1, *args)
    slot, t = outs[0].reshape(-1)[:N], outs[1].reshape(-1)[:N]
    if queue and active is not None:
        # the queue kernel stores the raw carry (inactive lanes = the -1
        # encoding); restore the contract value t = tmax for them
        t = jnp.where(act != 0, t, tmax_a)
    elif use_prefix:
        t = jnp.where(jnp.arange(N, dtype=jnp.int32)
                      < jnp.asarray(active_prefix, jnp.int32), t, tmax_a)
    if count_steps:
        return slot, t, outs[2].reshape(-1)[:N]
    return slot, t
