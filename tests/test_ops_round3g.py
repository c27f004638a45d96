"""Kernel-level semantics for the round-3g additions: FIFO
lot-matching via cumulative-interval overlap, RFM positional quintile
scores. (Oracle parity for the full queries is covered by the driver /
tools/selfcheck.py.)"""

import numpy as np


def _fifo_bruteforce(lots, cons):
    """Reference FIFO queue: lots [(id, qty)], cons [(id, qty)] in
    arrival order; returns {(lot_id, con_id): matched_qty}."""
    out = {}
    li, consumed_of_lot = 0, 0
    lots = list(lots)
    for cid, cq in cons:
        need = cq
        while need > 0 and li < len(lots):
            lid, lq = lots[li]
            avail = lq - consumed_of_lot
            take = min(avail, need)
            if take > 0:
                out[(lid, cid)] = out.get((lid, cid), 0) + take
            consumed_of_lot += take
            need -= take
            if consumed_of_lot == lq:
                li += 1
                consumed_of_lot = 0
        # need > 0 with lots exhausted: backorder — consumes nothing
    return out


def _fifo_intervals(lots, cons):
    """Mirror of q_fifo_lot_matching's overlap formulation (single
    user): pair (i,j) matched = overlap of cumulative ranges."""
    lq = np.array([q for _, q in lots], dtype=np.int64)
    cq = np.array([q for _, q in cons], dtype=np.int64)
    cp1 = np.cumsum(lq)
    cp0 = cp1 - lq
    cc1 = np.cumsum(cq)
    cc0 = cc1 - cq
    out = {}
    for i, (lid, _) in enumerate(lots):
        j_lo = np.searchsorted(cc1, cp0[i], side="right")
        j_hi = np.searchsorted(cc0, cp1[i], side="left")
        for j in range(j_lo, j_hi):
            m = min(cp1[i], cc1[j]) - max(cp0[i], cc0[j])
            if m > 0:
                out[(lid, cons[j][0])] = int(m)
    return out


def test_fifo_overlap_matches_queue_simulation():
    rng = np.random.default_rng(17)
    for _ in range(30):
        nl, nc = int(rng.integers(1, 8)), int(rng.integers(1, 8))
        lots = [(i, int(rng.integers(1, 50))) for i in range(nl)]
        cons = [(100 + j, int(rng.integers(1, 50))) for j in range(nc)]
        assert _fifo_intervals(lots, cons) == _fifo_bruteforce(lots, cons)


def test_fifo_exact_boundary_produces_no_zero_pair():
    # consumption exactly drains lot 0: lot 1 must not pair with it
    got = _fifo_intervals([(0, 10), (1, 5)], [(100, 10), (101, 5)])
    assert got == {(0, 100): 10, (1, 101): 5}


def test_fifo_oversupply_and_overdemand():
    # demand exceeds supply: excess demand matches nothing
    got = _fifo_intervals([(0, 3)], [(100, 10)])
    assert got == {(0, 100): 3}
    # supply exceeds demand: tail of lot unmatched
    got = _fifo_intervals([(0, 10)], [(100, 4)])
    assert got == {(0, 100): 4}


def test_fifo_user_offset_splicing_isolates_users():
    """The query splices users onto one number line with gaps >
    max(totP, totC); verify adjacent users can never cross-match."""
    # user A: lots 10, cons 4; user B: lots 6, cons 20
    totp, totc = np.array([10, 6]), np.array([4, 20])
    gap = np.maximum(totp, totc) + 1
    uoff = np.cumsum(gap) - gap
    # A's lot interval [0,10)+0, B's cons intervals [0,20)+uoff[1]
    a_lot = (0 + uoff[0], 10 + uoff[0])
    b_con = (0 + uoff[1], 20 + uoff[1])
    assert a_lot[1] <= b_con[0]  # disjoint: no spurious overlap


def _rfm_score(metric, keys, n):
    rank0 = np.empty(n, dtype=np.int64)
    rank0[np.lexsort((keys, metric))] = np.arange(n)
    return 1 + rank0 * 5 // n


def test_rfm_positional_scores_match_sql_formula():
    rng = np.random.default_rng(23)
    n = 37
    metric = rng.integers(0, 10, n)       # heavy ties
    keys = np.arange(n)
    s = _rfm_score(metric, keys, n)
    # SQL: 1 + (row_number() over (order by metric, key) - 1)*5 // n
    order = sorted(range(n), key=lambda i: (metric[i], keys[i]))
    want = np.empty(n, dtype=np.int64)
    for pos, i in enumerate(order):
        want[i] = 1 + pos * 5 // n
    assert (s == want).all()
    assert s.min() >= 1 and s.max() <= 5


def _attr_bruteforce(clicks, purchases, window):
    """clicks: [(ts, eid)], purchases: [(ts, cents)] for ONE user.
    Returns per purchase: (n, first_idx, last_idx) into clicks sorted
    by (ts, eid)."""
    cs = sorted(clicks)
    out = []
    for pts, cents in purchases:
        w = [i for i, (cts, _) in enumerate(cs)
             if pts - window <= cts < pts]
        out.append((len(w), w[0] if w else None, w[-1] if w else None))
    return cs, out


def _attr_sentinels(clicks, purchases, window):
    """Mirror of q_attribution_models' sentinel-row rank differencing
    (single user)."""
    cs = sorted(clicks)
    cts = np.array([t for t, _ in cs], dtype=np.int64)
    npur = len(purchases)
    pts = np.array([t for t, _ in purchases], dtype=np.int64)
    sts = np.r_[pts - window, pts, cts]
    skind = np.r_[np.zeros(npur, np.int64), np.ones(npur, np.int64),
                  np.full(len(cts), 2, np.int64)]
    stag = np.r_[np.arange(npur), np.arange(npur),
                 np.full(len(cts), -1, np.int64)]
    so = np.lexsort((skind, sts))
    sts, skind, stag = sts[so], skind[so], stag[so]
    isc = (skind == 2).astype(np.int64)
    cnt_excl = np.cumsum(isc) - isc
    cnt_w = np.zeros(npur, dtype=np.int64)
    cnt_p = np.zeros(npur, dtype=np.int64)
    cnt_w[stag[skind == 0]] = cnt_excl[skind == 0]
    cnt_p[stag[skind == 1]] = cnt_excl[skind == 1]
    n = cnt_p - cnt_w
    return [(int(n[i]),
             int(cnt_w[i]) if n[i] > 0 else None,
             int(cnt_p[i]) - 1 if n[i] > 0 else None)
            for i in range(npur)]


def test_attribution_sentinel_rank_differencing():
    rng = np.random.default_rng(31)
    for _ in range(25):
        clicks = [(int(rng.integers(0, 1000)), int(i))
                  for i in range(rng.integers(0, 12))]
        purchases = [(int(rng.integers(0, 1100)), 100)
                     for _ in range(rng.integers(1, 6))]
        cs, want = _attr_bruteforce(clicks, purchases, 200)
        got = _attr_sentinels(clicks, purchases, 200)
        assert [g for g in got] == [w for w in want]


def test_attribution_window_edges():
    # click AT p-window is inside; click AT p is outside
    clicks = [(100, 1), (300, 2)]
    purchases = [(300, 50)]
    _, want = _attr_bruteforce(clicks, purchases, 200)
    got = _attr_sentinels(clicks, purchases, 200)
    assert got == want == [(1, 0, 0)]
