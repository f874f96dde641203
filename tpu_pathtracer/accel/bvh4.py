"""4-wide BVH stream derived from the binary unified stream.

Packet traversal on TPU is scalar-step-bound: each BVH step costs a roughly
fixed scalar-core overhead (row fetch, votes, stack ops) regardless of the
(cheap) vector work. Collapsing the binary SBVH into a 4-ary tree halves the
node steps, and pairing triangles halves the leaf steps — directly attacking
the step count. This mirrors why GPU tracers moved from BVH2 to BVH4/8
(Embree, OptiX) — but here the motivation is the TPU scalar unit, not SIMD
triangle groups.

The BVH4 is PURELY a traversal accelerator: it references the same attribute
slots as the binary stream (accel/flatten.py), so hit results are
interchangeable and all shading stays unchanged.

Row format, float32[K4, 32]:
  node row:
    [ lox0..3 | hix0..3 | loy0..3 | hiy0..3 | loz0..3 | hiz0..3 |
      child0..3 (bitcast i32) | axis (bitcast i32) | pad x3 ]
    Empty child slots carry inverted boxes (lo=+BIG, hi=-BIG): never hit.
    Children are sorted along `axis` (the node's dominant extent) so the
    traversal can order near-to-far from the packet's direction sign.
  triangle-pair row:
    [ woopA (12) | woopB (12) | attrA | attrB | last | pad x7 ]
    attrX = attribute slot in the binary stream (bitcast i32), -1 = invalid.

Leaf child encoding: ~(first pair row)  (negative => leaf, like Compact2's
~triWoopOffset, src/CudaBVH.cpp:177).
"""
from __future__ import annotations

import dataclasses

import numpy as np

BIG = np.float32(1e30)


@dataclasses.dataclass
class FlatBVH4:
    prims4: np.ndarray   # [K4,32] f32
    num_nodes: int
    max_depth: int


def _leaf_slots(meta, num_nodes, first_row):
    """Collect the attribute-slot run of a binary leaf starting at
    unified row `first_row` (>= num_nodes)."""
    slots = []
    r = first_row
    while True:
        attr, last = meta[r]
        slots.append(int(attr))
        if last:
            return slots
        r += 1


def build_bvh4(prims, meta, num_nodes):
    """Collapse the binary unified stream into a FlatBVH4."""
    prims = np.asarray(prims, np.float32)
    meta = np.asarray(meta, np.int64)

    # child boxes of binary node row i (from the parent's row)
    def child_boxes(i):
        p = prims[i]
        b0 = (np.array([p[0], p[2], p[8]]), np.array([p[1], p[3], p[9]]))
        b1 = (np.array([p[4], p[6], p[10]]), np.array([p[5], p[7], p[11]]))
        return b0, b1

    def area(b):
        d = np.maximum(b[1] - b[0], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    node_rows = []   # list of np.float32[32]
    node_meta = []   # (children[4], is_leaf_child[4]) resolved later

    pair_rows = []   # float32[32] each

    def emit_leaf(first_row):
        """Pack a binary leaf's slot run into pair rows; returns pair row
        index of the first pair."""
        slots = _leaf_slots(meta, num_nodes, first_row)
        start = len(pair_rows)
        for k in range(0, len(slots), 2):
            row = np.zeros(32, np.float32)
            # slot k of this leaf lives at unified row first_row + k
            # (leaf slots are contiguous in the binary stream)
            row[0:12] = prims[first_row + k][0:12]
            row[24] = np.int32(slots[k]).view(np.float32)
            if k + 1 < len(slots):
                row[12:24] = prims[first_row + k + 1][0:12]
                row[25] = np.int32(slots[k + 1]).view(np.float32)
            else:
                row[12:24] = 0.0
                row[15] = 1.0  # degenerate woop B: m0=(0,0,0,1) never hits
                row[25] = np.int32(-1).view(np.float32)
            row[26] = np.int32(1 if k + 2 >= len(slots) else 0).view(np.float32)
            pair_rows.append(row)
        return start

    # ---- recursive collapse over binary rows ----
    import sys
    sys.setrecursionlimit(100000)

    def build(row4_children):
        """row4_children: list of (child_encoding, (lo,hi)) from the binary
        stream; expand greedily to <= 4 and emit a node row. Returns this
        node's row index in node_rows."""
        # expand: replace the largest-area INNER child with its two children
        items = list(row4_children)
        while len(items) < 4:
            # find largest inner child
            best = -1
            best_a = -1.0
            for j, (enc, box) in enumerate(items):
                if enc >= 0:
                    a = area(box)
                    if a > best_a:
                        best_a = a
                        best = j
            if best < 0:
                break
            enc, _ = items.pop(best)
            b0, b1 = child_boxes(enc)
            c0, c1 = int(meta[enc][0]), int(meta[enc][1])
            items.insert(best, (c1, b1))
            items.insert(best, (c0, b0))

        # dominant axis of the union box; sort children along it
        lo = np.min([b[0] for _, b in items], axis=0)
        hi = np.max([b[1] for _, b in items], axis=0)
        axis = int(np.argmax(hi - lo))
        items.sort(key=lambda eb: float(eb[1][0][axis] + eb[1][1][axis]))

        my_idx = len(node_rows)
        node_rows.append(np.zeros(32, np.float32))
        node_meta.append(None)

        child_codes = []
        depth = 0
        for enc, box in items:
            if enc >= 0:
                sub, d = build_inner(enc)
                child_codes.append((sub, box, False))
                depth = max(depth, d)
            else:
                pr = emit_leaf(~enc)
                child_codes.append((pr, box, True))
        row = np.zeros(32, np.float32)
        for j in range(4):
            if j < len(child_codes):
                _, box, _ = child_codes[j]
                row[0 + j] = box[0][0]
                row[4 + j] = box[1][0]
                row[8 + j] = box[0][1]
                row[12 + j] = box[1][1]
                row[16 + j] = box[0][2]
                row[20 + j] = box[1][2]
            else:
                # empty slot: a POINT box at +BIG. An "inverted" box is NOT
                # safe here — the slab test takes min/max after multiplying
                # by the (possibly negative) inverse direction, which turns
                # an inverted box into an everything-box for negative rays.
                # A point at +BIG has entry distance ~1e29 > any tmax.
                row[0 + j] = BIG
                row[4 + j] = BIG
                row[8 + j] = BIG
                row[12 + j] = BIG
                row[16 + j] = BIG
                row[20 + j] = BIG
        row[28] = np.int32(axis).view(np.float32)
        node_rows[my_idx] = row
        node_meta[my_idx] = child_codes
        return my_idx, depth + 1

    def build_inner(row):
        b0, b1 = child_boxes(row)
        c0, c1 = int(meta[row][0]), int(meta[row][1])
        return build([(c0, b0), (c1, b1)])

    root_idx, depth = build_inner(0)
    assert root_idx == 0

    # resolve child encodings now that row counts are final
    n_nodes4 = len(node_rows)
    for i, codes in enumerate(node_meta):
        row = node_rows[i]
        for j in range(4):
            if j < len(codes):
                tgt, _, is_leaf = codes[j]
                enc = ~(n_nodes4 + tgt) if is_leaf else tgt
            else:
                enc = 0x7FFFFFF0  # empty slot: never traversed (box inverted)
            row[24 + j] = np.int32(enc).view(np.float32)

    prims4 = np.stack(node_rows + pair_rows).astype(np.float32)
    return FlatBVH4(prims4=prims4, num_nodes=n_nodes4, max_depth=depth)
