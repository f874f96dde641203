#!/usr/bin/env python
"""Offline evaluation of interleave-tax mitigation schemes on recorded
per-packet step counts (npz from probe_rebalance.py). No TPU needed.

Schemes scored (paid steps, as +% tax over live):
  consecutive     the shipped grouping (baseline)
  random          random grouping (how good is consecutive, really?)
  oracle          sort by actual steps (lower bound for any regrouping)
  topk-iso:P      keep consecutive order but extract the predictor's
                  top-K packets into dedicated leading instances
  rounds:C        checkpoint/resume: every packet steps at most C per
                  round, survivors compact (order kept) and resume; paid
                  = sum over rounds of il*instance-max of min(rem, C)
  queue:K         in-kernel work queue: each instance owns K consecutive
                  packets and G=il slots claim greedily; paid = il *
                  greedy makespan (list scheduling in arrival order)
"""
import sys

import numpy as np


def tax_of(paid, live):
    return 100.0 * (paid - live) / max(live, 1)


def grouped_paid(s, order, il):
    g = s[order].reshape(-1, il)
    return float(g.max(axis=1).sum() * il)


def topk_iso(s, pred, il, k_pk):
    n = len(s)
    top = np.argsort(-pred)[:k_pk]
    mask = np.zeros(n, bool)
    mask[top] = True
    order = np.concatenate([np.flatnonzero(mask), np.flatnonzero(~mask)])
    return grouped_paid(s, order, il)


def rounds_cost(s, il, C):
    rem = s.astype(np.int64).copy()
    paid = 0
    alive = np.arange(len(s))
    while len(alive):
        r = rem[alive]
        g_n = -(-len(alive) // il)
        pad = g_n * il - len(alive)
        rr = np.concatenate([np.minimum(r, C), np.zeros(pad, np.int64)])
        paid += rr.reshape(-1, il).max(axis=1).sum() * il
        rem[alive] = r - np.minimum(r, C)
        alive = alive[r > C]
    return float(paid)


def queue_cost(s, il, K):
    """Greedy list scheduling: instances own K consecutive packets, il
    slots claim the next packet when free. Makespan via heap-free sim."""
    n = len(s)
    paid = 0.0
    for i0 in range(0, n, K):
        chunk = s[i0:i0 + K].astype(np.float64)
        slots = np.zeros(il)
        for c in chunk:
            j = slots.argmin()
            slots[j] += c
        paid += slots.max() * il
    return float(paid)


def main(path):
    d = np.load(path)
    sb = d["sb"].astype(np.float64)
    il = 8
    live = sb.sum()
    n = len(sb)
    print("%s: %d packets, live %.2fM" % (path, n, live / 1e6))
    print("  consecutive +%.0f%%" % tax_of(grouped_paid(sb, np.arange(n), il), live))
    rng = np.random.default_rng(0)
    rtax = np.mean([tax_of(grouped_paid(sb, rng.permutation(n), il), live)
                    for _ in range(5)])
    print("  random      +%.0f%%" % rtax)
    print("  oracle      +%.0f%%" % tax_of(grouped_paid(sb, np.argsort(-sb), il), live))
    for name in ("prev_mean", "prev_max", "bounce_mean"):
        if name not in d:
            continue
        for frac in (0.05, 0.1, 0.2):
            k_pk = max(il, int(round(n * frac / il)) * il)
            t = tax_of(topk_iso(sb, d[name].astype(np.float64), il, k_pk), live)
            print("  topk-iso %s %.0f%%: +%.0f%%" % (name, 100 * frac, t))
        # oracle top-k isolation (predictor == truth): ceiling for the scheme
    for frac in (0.05, 0.1, 0.2, 0.4):
        k_pk = max(il, int(round(n * frac / il)) * il)
        t = tax_of(topk_iso(sb, sb, il, k_pk), live)
        print("  topk-iso ORACLE %.0f%%: +%.0f%%" % (100 * frac, t))
    for C in (64, 128, 192, 256, 384, 512):
        print("  rounds C=%d: +%.0f%%  (%d rounds)"
              % (C, tax_of(rounds_cost(sb, il, C), live),
                 int(np.ceil(sb.max() / C))))
    for K in (16, 32, 64, 128, 256, 1024):
        print("  queue K=%d: +%.0f%%" % (K, tax_of(queue_cost(sb, il, K), live)))


if __name__ == "__main__":
    for p in sys.argv[1:] or ["/tmp/rebal_data_w2.npz", "/tmp/rebal_data_w4.npz"]:
        main(p)
