"""Kernel-level semantics for the round-3i additions: vectorized
triple generation, interval-union coverage, midrank decile assignment.
(Oracle parity for the full queries is covered by the driver /
tools/selfcheck.py.)"""

import itertools

import numpy as np


def _triples_vectorized(orders, parts):
    """Mirror of q_freq_triples' per-partition kernel."""
    o = np.asarray(orders, dtype=np.int64)
    p = np.asarray(parts, dtype=np.int64)
    order = np.lexsort((p, o))
    o, p = o[order], p[order]
    keep = np.ones(len(o), dtype=bool)
    keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
    o, p = o[keep], p[keep]
    new = np.ones(len(o), dtype=bool)
    new[1:] = o[1:] != o[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, len(o)))
    out = set()
    for s in np.unique(sizes):
        if s < 3:
            continue
        combo = np.array(list(itertools.combinations(range(s), 3)),
                         dtype=np.int64)
        st = starts[sizes == s]
        idx = (st[:, None, None] + combo[None, :, :]).reshape(-1, 3)
        for a, b, c in zip(p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]):
            out.add((int(a), int(b), int(c)))
    return out


def test_triple_generation_matches_itertools():
    rng = np.random.default_rng(7)
    orders, parts = [], []
    want = set()
    baskets = {}
    for o in range(40):
        items = sorted(rng.choice(50, size=rng.integers(1, 9),
                                  replace=False).tolist())
        baskets[o] = items
        for p in items:
            # duplicate some rows to exercise dedup
            for _ in range(rng.integers(1, 3)):
                orders.append(o)
                parts.append(p)
        for t in itertools.combinations(items, 3):
            want.add(t)
    got = _triples_vectorized(orders, parts)
    assert got == want


def _coverage_bruteforce(ts, win):
    """Union length of [t, t+win) by point sweep."""
    ivs = sorted((int(t), int(t) + win) for t in ts)
    total, n = 0, 0
    cur_s = cur_e = None
    for s, e in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
            n += 1
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return n, total


def _coverage_islands(ts, win):
    """Mirror of q_user_active_seconds' kernel (constant win)."""
    t = np.unique(np.asarray(ts, dtype=np.int64))
    if len(t) == 0:
        return 0, 0
    new = np.ones(len(t), dtype=bool)
    new[1:] = t[1:] - t[:-1] > win
    first = t[new]
    last = np.maximum.reduceat(t, np.flatnonzero(new))
    return int(new.sum()), int((last - first + win).sum())


def test_interval_union_matches_sweep():
    rng = np.random.default_rng(3)
    for _ in range(20):
        ts = rng.integers(0, 10_000, size=rng.integers(1, 60))
        assert _coverage_islands(ts, 100) == _coverage_bruteforce(ts, 100)


def test_midrank_decile_tie_groups_stay_whole():
    # 3 distinct lengths with heavy ties: each length group must land
    # in exactly one decile, deciles weakly increasing with length.
    cnt = np.array([50, 30, 20], dtype=np.int64)
    cb = np.cumsum(cnt) - cnt
    n = int(cnt.sum())
    dec = ((2 * cb + cnt - 1) * 10) // (2 * n) + 1
    # midrank0 of the groups: 24.5, 64.5, 89.5 -> deciles 3, 7, 9
    assert dec.tolist() == [3, 7, 9]
    assert (np.diff(dec) >= 0).all()
