"""Pallas TPU packet traversal over the 4-wide BVH stream (accel/bvh4.py).

Same packet scheme as traverse_packet.py with the step count halved: each
node step tests 4 child boxes, each leaf step tests a triangle pair. The
round-1 version used lax.cond per step and one packet per kernel instance;
measured against the tuned 2-wide kernel it only broke even. This version
applies the same two measured fixes that made the 2-wide kernel fast
(see traverse_packet.py):

* BRANCH-FREE step: a row's 24 shared float columns are extracted once and
  interpreted BOTH as 4 child slabs (node) and as a Woop triangle pair
  (leaf); the outcome is selected by the cursor's sign. No lax.cond.
* INTERLEAVED packets: `interleave` independent packets per kernel
  instance overlap their scalar dependency chains.

Child ordering uses the node's stored dominant axis + the packet's majority
direction sign (computed once per packet) instead of per-step entry-distance
reductions, so a node step costs ONE cross-lane reduction pair (the packed
4-bit hit vote).

Returns binary-stream attribute slots, so results are interchangeable with
traverse_packet.py / tracer.traverse.intersect_scene.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.int32(0x76543210)


def _make_step(tab_ref, rays, anyhit):
    """Returns step(state, stack_ref, base) for ONE packet."""
    ox, oy, oz = rays["ox"], rays["oy"], rays["oz"]
    dx, dy, dz = rays["dx"], rays["dy"], rays["dz"]
    idx_, idy, idz = rays["idx"], rays["idy"], rays["idz"]
    oodx, oody, oodz = rays["oodx"], rays["oody"], rays["oodz"]
    tmin = rays["tmin"]
    act = rays["act"]
    fwd = rays["fwd"]          # (fwd_x, fwd_y, fwd_z) int32 scalars

    def step(st, stack_ref, base):
        cur, sp, hit_slot, hit_t, done = st
        alive = cur != SENTINEL
        is_node = alive & (cur >= 0)
        is_tri = alive & (cur < 0)
        row = jnp.where(is_tri, ~cur, jnp.where(is_node, cur, 0))
        prow = tab_ref[pl.ds(row, 1), :]          # (1,32)

        def sc(c):
            return jnp.sum(prow[0:1, c:c + 1])

        def sci(c):
            v = jax.lax.bitcast_convert_type(prow[0:1, c:c + 1], jnp.int32)
            return jnp.sum(v)

        # 24 shared float extractions: node = 4 child slabs, leaf = 2 Woop
        # triangles. 4 int extractions: node children / (attrA, attrB, last).
        f = [sc(c) for c in range(24)]
        m24, m25, m26, m27 = sci(24), sci(25), sci(26), sci(27)
        axis = sci(28)

        vote = act & (done == 0)

        # ---- node interpretation: 4 slab tests ----
        hits = []
        for j in range(4):
            lox = f[0 + j] * idx_ - oodx
            hix = f[4 + j] * idx_ - oodx
            loy = f[8 + j] * idy - oody
            hiy = f[12 + j] * idy - oody
            loz = f[16 + j] * idz - oodz
            hiz = f[20 + j] * idz - oodz
            cmin = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix),
                                           jnp.minimum(loy, hiy)),
                               jnp.maximum(jnp.minimum(loz, hiz), tmin))
            cmax = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix),
                                           jnp.maximum(loy, hiy)),
                               jnp.minimum(jnp.maximum(loz, hiz), hit_t))
            hits.append(vote & (cmin <= cmax))
        # packet vote: per-child lane counts in disjoint 16-bit fields (a
        # max of packed words is NOT an OR; a sum of <=4096-lane counts is)
        wa = hits[0].astype(jnp.int32) + (hits[1].astype(jnp.int32) << 16)
        wb = hits[2].astype(jnp.int32) + (hits[3].astype(jnp.int32) << 16)
        sa = jnp.sum(wa)
        sb = jnp.sum(wb)
        bits = ((sa & 0xFFFF) != 0).astype(jnp.int32) \
            | (((sa >> 16) != 0).astype(jnp.int32) << 1) \
            | (((sb & 0xFFFF) != 0).astype(jnp.int32) << 2) \
            | (((sb >> 16) != 0).astype(jnp.int32) << 3)
        ch = (m24, m25, m26, m27)

        forward = jnp.where(axis == 0, fwd[0],
                            jnp.where(axis == 1, fwd[1], fwd[2]))

        # children in traversal order (ascending along the node axis when
        # the packet marches +axis, else descending)
        def at(j):
            oj = jnp.where(forward == 1, jnp.int32(j), jnp.int32(3 - j))
            hj = ((bits >> oj) & 1) == 1
            cj = jnp.where(oj == 0, ch[0],
                           jnp.where(oj == 1, ch[1],
                                     jnp.where(oj == 2, ch[2], ch[3])))
            return hj, cj

        h0, c0 = at(0)
        h1, c1 = at(1)
        h2, c2 = at(2)
        h3, c3 = at(3)
        node_any = bits != 0
        nearest = jnp.where(h0, c0, jnp.where(h1, c1, jnp.where(h2, c2, c3)))
        e1 = h0
        e2 = e1 | h1
        e3 = e2 | h2

        # ---- triangle-pair interpretation: two Woop tests ----
        OzA = f[3] - ox * f[0] - oy * f[1] - oz * f[2]
        invDzA = 1.0 / (dx * f[0] + dy * f[1] + dz * f[2])
        tA = OzA * invDzA
        OxA = f[7] + ox * f[4] + oy * f[5] + oz * f[6]
        uA = OxA + tA * (dx * f[4] + dy * f[5] + dz * f[6])
        OyA = f[11] + ox * f[8] + oy * f[9] + oz * f[10]
        vA = OyA + tA * (dx * f[8] + dy * f[9] + dz * f[10])
        okA = (tA > tmin) & (uA >= 0.0) & (uA <= 1.0) & (vA >= 0.0) \
            & (uA + vA <= 1.0)
        OzB = f[15] - ox * f[12] - oy * f[13] - oz * f[14]
        invDzB = 1.0 / (dx * f[12] + dy * f[13] + dz * f[14])
        tB = OzB * invDzB
        OxB = f[19] + ox * f[16] + oy * f[17] + oz * f[18]
        uB = OxB + tB * (dx * f[16] + dy * f[17] + dz * f[18])
        OyB = f[23] + ox * f[20] + oy * f[21] + oz * f[22]
        vB = OyB + tB * (dx * f[20] + dy * f[21] + dz * f[22])
        okB = (tB > tmin) & (uB >= 0.0) & (uB <= 1.0) & (vB >= 0.0) \
            & (uB + vB <= 1.0)

        hitA = is_tri & vote & okA & (tA < hit_t)
        t1 = jnp.where(hitA, tA, hit_t)
        s1 = jnp.where(hitA, m24, hit_slot)
        hitB = is_tri & vote & okB & (tB < t1) & (m25 >= 0)
        hit_t = jnp.where(hitB, tB, t1)
        hit_slot = jnp.where(hitB, m25, s1)
        tri_last = m26 != 0
        if anyhit:
            done = done | (hitA | hitB).astype(jnp.int32)
            tri_stop = tri_last | ~jnp.any(act & (done == 0))
        else:
            tri_stop = tri_last

        # ---- combine + shared stack (scalar, SMEM segment at `base`) ----
        # pop reads the pre-push top: pops and pushes are mutually
        # exclusive this step, and pushed slots sit above the read slot
        top = stack_ref[base + jnp.maximum(sp - 1, 0)]
        popped = jnp.where(sp > 0, top, SENTINEL)

        p3 = is_node & h3 & e3
        p2 = is_node & h2 & e2
        p1 = is_node & h1 & e1
        pos3 = sp
        pos2 = sp + p3.astype(jnp.int32)
        pos1 = pos2 + p2.astype(jnp.int32)

        @pl.when(p3)
        def _():
            stack_ref[base + pos3] = c3

        @pl.when(p2)
        def _():
            stack_ref[base + pos2] = c2

        @pl.when(p1)
        def _():
            stack_ref[base + pos1] = c1

        sp_pushed = pos1 + p1.astype(jnp.int32)

        need_pop = (is_node & ~node_any) | (is_tri & tri_stop)
        go = jnp.where(is_node, nearest, cur - 1)
        new_cur = jnp.where(alive, jnp.where(need_pop, popped, go), cur)
        new_sp = jnp.where(need_pop, jnp.maximum(sp - 1, 0),
                           jnp.where(is_node, sp_pushed, sp))
        return new_cur, new_sp, hit_slot, hit_t, done

    return step


def _kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref, act_ref, slot_ref, t_ref, stack_ref,
            *, anyhit, stack_depth, interleave, sub):
    G = interleave
    seg = stack_depth * 3 + 8
    ooeps = jnp.float32(2.0 ** -80)

    def inv(d):
        safe = jnp.where(jnp.abs(d) > ooeps, d,
                         jnp.where(d >= 0, ooeps, -ooeps))
        return 1.0 / safe

    states = []
    steps = []
    for g in range(G):
        sl = pl.ds(g * sub, sub)
        rays = {}
        rays["ox"] = ox_ref[sl, :]
        rays["oy"] = oy_ref[sl, :]
        rays["oz"] = oz_ref[sl, :]
        rays["dx"] = dx_ref[sl, :]
        rays["dy"] = dy_ref[sl, :]
        rays["dz"] = dz_ref[sl, :]
        rays["tmin"] = tmin_ref[sl, :]
        rays["act"] = act_ref[sl, :] != 0
        rays["idx"] = inv(rays["dx"])
        rays["idy"] = inv(rays["dy"])
        rays["idz"] = inv(rays["dz"])
        rays["oodx"] = rays["ox"] * rays["idx"]
        rays["oody"] = rays["oy"] * rays["idy"]
        rays["oodz"] = rays["oz"] * rays["idz"]
        # packet majority direction sign per axis (one-time reductions)
        rays["fwd"] = tuple(
            jnp.where(jnp.sum(jnp.where(rays["act"] & (d >= 0), 1, -1)) >= 0,
                      jnp.int32(1), jnp.int32(0))
            for d in (rays["dx"], rays["dy"], rays["dz"]))
        tmax_g = tmax_ref[sl, :]
        hit_t0 = jnp.where(rays["act"], tmax_g, rays["tmin"])
        cur0 = jnp.where(jnp.any(rays["act"]), jnp.int32(0), SENTINEL)
        states.append((cur0, jnp.int32(0),
                       jnp.full((sub, 128), -1, jnp.int32), hit_t0,
                       jnp.zeros((sub, 128), jnp.int32)))
        steps.append(_make_step(tab_ref, rays, anyhit))

    def cond(c):
        alive = c[0][0] != SENTINEL
        for g in range(1, G):
            alive = alive | (c[g][0] != SENTINEL)
        return alive

    def body(c):
        return tuple(steps[g](c[g], stack_ref, g * seg) for g in range(G))

    final = jax.lax.while_loop(cond, body, tuple(states))
    for g in range(G):
        sl = pl.ds(g * sub, sub)
        cur, sp, hit_slot, hit_t, done = final[g]
        act = act_ref[sl, :] != 0
        slot_ref[sl, :] = hit_slot
        t_ref[sl, :] = jnp.where(act, hit_t, tmax_ref[sl, :])


def packet4_intersect(prims4, orig, raydir, tmin, tmax, anyhit=False,
                      stack_depth=48, active=None, tile_sub=8, interleave=4,
                      interpret=False):
    """Packet-traverse rays against the 4-wide stream. Same contract as
    traverse_packet.packet_intersect (returns binary attribute slots)."""
    N = orig.shape[0]
    LANES = 128
    T = tile_sub * LANES * interleave
    n_tiles = -(-N // T)
    Np = n_tiles * T
    rows = n_tiles * tile_sub * interleave

    def prep(x, fill):
        x = jnp.asarray(x)
        if Np != N:
            x = jnp.pad(x, (0, Np - N), constant_values=fill)
        return x.reshape(rows, LANES)

    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (N,))
    tmax_a = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (N,))
    act = (jnp.ones((N,), jnp.int32) if active is None
           else active.astype(jnp.int32))

    args = (
        prep(orig[:, 0], 0.0), prep(orig[:, 1], 0.0), prep(orig[:, 2], 0.0),
        prep(raydir[:, 0], 1.0), prep(raydir[:, 1], 1.0), prep(raydir[:, 2], 1.0),
        prep(tmin_a, 0.0), prep(tmax_a, 0.0), prep(act, 0),
    )

    blk = tile_sub * interleave
    ray_spec = pl.BlockSpec((blk, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(prims4.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    slot, t = pl.pallas_call(
        functools.partial(_kernel, anyhit=anyhit, stack_depth=stack_depth,
                          interleave=interleave, sub=tile_sub),
        grid=(n_tiles,),
        in_specs=[tab_spec] + [ray_spec] * 9,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM(((stack_depth * 3 + 8) * interleave,),
                                   jnp.int32)],
        interpret=interpret,
    )(prims4, *args)
    return slot.reshape(-1)[:N], t.reshape(-1)[:N]
