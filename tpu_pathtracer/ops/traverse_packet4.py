"""Pallas TPU packet traversal over the 4-wide BVH stream (accel/bvh4.py).

Same packet scheme as traverse_packet.py but with the step count halved:
each node step tests 4 child boxes, each leaf step tests a triangle pair.
Child ordering uses the node's stored dominant axis + the packet's majority
direction sign (computed once per packet) instead of per-step entry-distance
reductions, cutting the scalar-core work per step to ONE cross-lane
reduction (the 4-bit hit vote).

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


def _kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref, act_ref, slot_ref, t_ref, stack_ref,
            *, anyhit, stack_depth):
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tmin = tmin_ref[:]
    act = act_ref[:] != 0

    ooeps = jnp.float32(2.0 ** -80)

    def inv(d):
        safe = jnp.where(jnp.abs(d) > ooeps, d,
                         jnp.where(d >= 0, ooeps, -ooeps))
        return 1.0 / safe

    idir = (inv(dx), inv(dy), inv(dz))
    ood = (ox * idir[0], oy * idir[1], oz * idir[2])

    hit_t0 = jnp.where(act, tmax_ref[:], tmin)
    hit_slot0 = jnp.full(ox.shape, -1, jnp.int32)

    # packet majority direction sign per axis (one-time reductions)
    sgn = [jnp.sum(jnp.where(act & (d >= 0), 1, -1)) >= 0
           for d in (dx, dy, dz)]
    # forward[a] = 1 when the packet marches +a (children sorted ascending
    # along the node axis -> iterate 0..3), else iterate 3..0
    fwd0 = jnp.where(sgn[0], jnp.int32(1), jnp.int32(0))
    fwd1 = jnp.where(sgn[1], jnp.int32(1), jnp.int32(0))
    fwd2 = jnp.where(sgn[2], jnp.int32(1), jnp.int32(0))

    any_active = jnp.any(act)
    cur0 = jnp.where(any_active, jnp.int32(0), SENTINEL)

    def cond(c):
        return c[0] != SENTINEL

    def body(c):
        cur, sp, hit_slot, hit_t, done = c
        is_node = cur >= 0
        row = jnp.where(is_node, cur, ~cur)
        prow = tab_ref[pl.ds(row, 1), :]          # (1,32)

        def sc(i):
            return jnp.sum(prow[0:1, i:i + 1])

        def sci(i):
            v = jax.lax.bitcast_convert_type(prow[0:1, i:i + 1], jnp.int32)
            return jnp.sum(v)

        vote = act & ~done

        def node_step(_):
            # 4 slab tests
            hits = []
            for j in range(4):
                lox = sc(0 + j) * idir[0] - ood[0]
                hix = sc(4 + j) * idir[0] - ood[0]
                loy = sc(8 + j) * idir[1] - ood[1]
                hiy = sc(12 + j) * idir[1] - ood[1]
                loz = sc(16 + j) * idir[2] - ood[2]
                hiz = sc(20 + j) * idir[2] - ood[2]
                cmin = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix),
                                               jnp.minimum(loy, hiy)),
                                   jnp.maximum(jnp.minimum(loz, hiz), tmin))
                cmax = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix),
                                               jnp.maximum(loy, hiy)),
                                   jnp.minimum(jnp.maximum(loz, hiz), hit_t))
                hits.append(vote & (cmin <= cmax))
            # packet vote: bitwise-OR across lanes. A single max of a packed
            # word is NOT an OR (max(0b0101,0b1010)=0b1010 loses children);
            # sum counts per child in disjoint 8-bit fields instead — lane
            # counts here are <= 1024 so spread over two 32-bit words.
            wa = hits[0].astype(jnp.int32) + (hits[1].astype(jnp.int32) << 16)
            wb = hits[2].astype(jnp.int32) + (hits[3].astype(jnp.int32) << 16)
            sa = jnp.sum(wa)
            sb = jnp.sum(wb)
            bits = ((sa & 0xFFFF) != 0).astype(jnp.int32) \
                | (((sa >> 16) != 0).astype(jnp.int32) << 1) \
                | (((sb & 0xFFFF) != 0).astype(jnp.int32) << 2) \
                | (((sb >> 16) != 0).astype(jnp.int32) << 3)
            ch = [sci(24 + j) for j in range(4)]

            axis = sci(28)
            forward = jnp.where(axis == 0, fwd0,
                                jnp.where(axis == 1, fwd1, fwd2))

            # children in traversal order (ascending along the node axis if
            # the packet marches that way, else descending)
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
            any_hit = bits != 0
            # nearest hit child = first in traversal order; the REST are
            # pushed far-to-near. Never round-trip the nearest through SMEM
            # (a pop right after predicated pushes is a read-after-write
            # hazard).
            nearest = jnp.where(h0, c0, jnp.where(h1, c1,
                                jnp.where(h2, c2, c3)))
            e1 = h0                      # "an earlier hit exists" before j
            e2 = e1 | h1
            e3 = e2 | h2
            p3 = h3 & e3
            p2 = h2 & e2
            p1 = h1 & e1
            pos3 = sp
            pos2 = sp + p3.astype(jnp.int32)
            pos1 = pos2 + p2.astype(jnp.int32)

            @pl.when(p3)
            def _():
                stack_ref[pos3] = c3

            @pl.when(p2)
            def _():
                stack_ref[pos2] = c2

            @pl.when(p1)
            def _():
                stack_ref[pos1] = c1

            new_sp = pos1 + p1.astype(jnp.int32)

            top = stack_ref[jnp.maximum(sp - 1, 0)]
            popped = jnp.where(sp > 0, top, SENTINEL)
            new_cur = jnp.where(any_hit, nearest, popped)
            new_sp = jnp.where(any_hit, new_sp, jnp.maximum(sp - 1, 0))
            return new_cur, new_sp, hit_slot, hit_t, done

        def tri_step(_):
            def woop(base):
                m0x, m0y, m0z, m0w = sc(base), sc(base + 1), sc(base + 2), sc(base + 3)
                m1x, m1y, m1z, m1w = sc(base + 4), sc(base + 5), sc(base + 6), sc(base + 7)
                m2x, m2y, m2z, m2w = sc(base + 8), sc(base + 9), sc(base + 10), sc(base + 11)
                Oz = m0w - ox * m0x - oy * m0y - oz * m0z
                invDz = 1.0 / (dx * m0x + dy * m0y + dz * m0z)
                t = Oz * invDz
                Ox = m1w + ox * m1x + oy * m1y + oz * m1z
                u = Ox + t * (dx * m1x + dy * m1y + dz * m1z)
                Oy = m2w + ox * m2x + oy * m2y + oz * m2z
                v = Oy + t * (dx * m2x + dy * m2y + dz * m2z)
                ok = (t > tmin) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                    & (u + v <= 1.0)
                return t, ok

            tA, okA = woop(0)
            tB, okB = woop(12)
            attrA = sci(24)
            attrB = sci(25)
            last = sci(26) != 0

            hitA = vote & okA & (tA < hit_t)
            t1 = jnp.where(hitA, tA, hit_t)
            s1 = jnp.where(hitA, attrA, hit_slot)
            hitB = vote & okB & (tB < t1) & (attrB >= 0)
            new_hit_t = jnp.where(hitB, tB, t1)
            new_hit_slot = jnp.where(hitB, attrB, s1)
            if anyhit:
                new_done = done | hitA | hitB
                stop = last | ~jnp.any(act & ~new_done)
            else:
                new_done = done
                stop = last
            top = stack_ref[jnp.maximum(sp - 1, 0)]
            popped = jnp.where(sp > 0, top, SENTINEL)
            new_cur = jnp.where(stop, popped, cur - 1)
            new_sp = jnp.where(stop, jnp.maximum(sp - 1, 0), sp)
            return new_cur, new_sp, new_hit_slot, new_hit_t, new_done

        return jax.lax.cond(is_node, node_step, tri_step, None)

    done0 = jnp.zeros(ox.shape, bool)
    cur, sp, hit_slot, hit_t, done = jax.lax.while_loop(
        cond, body, (cur0, jnp.int32(0), hit_slot0, hit_t0, done0))
    slot_ref[:] = hit_slot
    t_ref[:] = jnp.where(act, hit_t, tmax_ref[:])


def packet4_intersect(prims4, orig, raydir, tmin, tmax, anyhit=False,
                      stack_depth=48, active=None, tile_sub=8,
                      interpret=False):
    """Packet-traverse rays against the 4-wide stream. Same contract as
    traverse_packet.packet_intersect (returns binary attribute slots)."""
    N = orig.shape[0]
    LANES = 128
    T = tile_sub * LANES
    n_tiles = -(-N // T)
    Np = n_tiles * T

    def prep(x, fill):
        x = jnp.asarray(x)
        if Np != N:
            x = jnp.pad(x, (0, Np - N), constant_values=fill)
        return x.reshape(n_tiles * tile_sub, LANES)

    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (N,))
    tmax_a = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (N,))
    act = (jnp.ones((N,), jnp.int32) if active is None
           else active.astype(jnp.int32))

    args = (
        prep(orig[:, 0], 0.0), prep(orig[:, 1], 0.0), prep(orig[:, 2], 0.0),
        prep(raydir[:, 0], 1.0), prep(raydir[:, 1], 1.0), prep(raydir[:, 2], 1.0),
        prep(tmin_a, 0.0), prep(tmax_a, 0.0), prep(act, 0),
    )

    ray_spec = pl.BlockSpec((tile_sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(prims4.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    slot, t = pl.pallas_call(
        functools.partial(_kernel, anyhit=anyhit, stack_depth=stack_depth),
        grid=(n_tiles,),
        in_specs=[tab_spec] + [ray_spec] * 9,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile_sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * tile_sub, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((stack_depth * 3 + 8,), jnp.int32)],
        interpret=interpret,
    )(prims4, *args)
    return slot.reshape(-1)[:N], t.reshape(-1)[:N]
