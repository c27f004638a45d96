"""Kernel-level semantics for the round-3e additions: halo-chunked
forward windows, suffix-min forward as-of, weighted-median selection,
secret-scan class accounting. (Oracle parity for the full queries is
covered by the driver / tools/selfcheck.py.)"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _peak_bruteforce(ts, win):
    ts = np.sort(np.asarray(ts, dtype=np.int64))
    best, anchor = 0, None
    for a in ts:
        c = int(((ts >= a) & (ts <= a + win)).sum())
        if c > best:
            best, anchor = c, int(a)
    return best, anchor


def _peak_halo(ts, win, chunk):
    """Mirror of q_peak_window_rate's chunk/halo decomposition."""
    ts = np.asarray(ts, dtype=np.int64)
    groups = {}
    for t in ts:
        c = t // chunk
        groups.setdefault(c, ([], []))[0].append(t)   # anchors
        groups.setdefault(c, ([], []))[1].append(t)   # members
        if t - c * chunk < win:
            groups.setdefault(c - 1, ([], []))[1].append(t)  # halo
    best, anchor = 0, None
    for c, (anchors, members) in groups.items():
        m = np.sort(np.array(members, dtype=np.int64))
        for a in anchors:
            lo = np.searchsorted(m, a, side="left")
            hi = np.searchsorted(m, a + win, side="right")
            cnt = int(hi - lo)
            if cnt > best or (cnt == best and anchor is not None
                              and a < anchor):
                best, anchor = cnt, int(a)
    return best, anchor


def test_peak_halo_matches_bruteforce_across_chunk_edges():
    rng = np.random.default_rng(7)
    chunk, win = 1000, 60
    # cluster events straddling a chunk boundary on purpose
    ts = np.concatenate([
        rng.integers(0, 3 * chunk, 200),
        990 + rng.integers(0, 40, 50),   # burst across the 1000 edge
    ])
    want = _peak_bruteforce(ts, win)
    got = _peak_halo(ts, win, chunk)
    assert got == want


def test_peak_window_is_inclusive_both_edges():
    # events at t, t+60 exactly: RANGE CURRENT ROW..60 FOLLOWING
    # includes both; window anchored at 0 must count 2
    assert _peak_bruteforce([0, 60], 60)[0] == 2


def _fwd_asof(k, ts, iso):
    """Mirror of q_orders_next_event's suffix-min sweep."""
    k = np.asarray(k, np.int64)
    ts = np.asarray(ts, np.int64)
    iso = np.asarray(iso, np.int64)
    order = np.lexsort((iso == 0, ts, k))
    k, ts, iso = k[order], ts[order], iso[order]
    _, krank = np.unique(k, return_inverse=True)
    n = np.int64(len(k))
    pos = np.arange(n, dtype=np.int64)
    inf = np.int64(1) << 62
    code = np.where(iso == 0, krank.astype(np.int64) * n + pos, inf)
    sfx = np.minimum.accumulate(code[::-1])[::-1]
    om = iso == 1
    cand, okr = sfx[om], krank[om].astype(np.int64)
    matched = cand < (okr + 1) * n
    next_pos = np.where(matched, cand - okr * n, 0)
    lag = np.where(matched, ts[next_pos] - ts[om], -1)
    return list(zip(ts[om].tolist(), matched.tolist(), lag.tolist()))


def test_forward_asof_basic_and_equal_ts_inclusive():
    # key 1: order at 10 → next event 15 (lag 5); order at 20 →
    # event AT 20 matches with lag 0 (>= is inclusive);
    # order at 99 → unmatched. key 2 events never leak into key 1.
    k = [1, 1, 1, 1, 1, 2, 2]
    ts = [15, 20, 10, 20, 99, 5, 100]
    iso = [0, 0, 1, 1, 1, 0, 0]
    got = dict((t, (m, l)) for t, m, l in _fwd_asof(k, ts, iso))
    assert got[10] == (True, 5)
    assert got[20] == (True, 0)
    assert got[99] == (False, -1)


def test_forward_asof_huge_timestamp_span():
    # the regression that killed the ts-offset code: orders decades
    # before events still match (offsets >> 2^43 us)
    yr = 31_557_600_000_000  # ~1 year in us
    k = [7, 7]
    ts = [0, 33 * yr]
    iso = [1, 0]  # order first, event 33 years later
    got = _fwd_asof(k, ts, iso)
    assert got[0][1] is True or got[0][1] == 1
    assert got[0][2] == 33 * yr


def test_weighted_median_selection():
    # weights 1,1,8 on qty 1,2,3 → half the weight sits at qty 3
    qt = np.array([1, 2, 3], np.int64)
    wt = np.array([1, 1, 8], np.int64)
    cw = np.cumsum(wt)
    q = qt[np.searchsorted(2 * cw, cw[-1])]
    assert q == 3
    # symmetric weights → lower middle (smallest q with 2cw >= tw)
    wt = np.array([5, 5, 5, 5], np.int64)
    qt = np.array([10, 20, 30, 40], np.int64)
    cw = np.cumsum(wt)
    assert qt[np.searchsorted(2 * cw, cw[-1])] == 20


def test_secret_scan_patterns_re2_parity():
    # the pyarrow kernel and DuckDB both run RE2; pin the per-class
    # counting convention (non-overlapping, leftmost)
    lines = pa.array([
        "GET /api/v1/users/12345 from 10.0.0.1",
        "password=hunter2 token=abc",
        "nothing here",
    ])
    ip = pc.count_substring_regex(
        lines, pattern=r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
    assert ip.to_pylist() == [1, 0, 0]
    kw = pc.count_substring_regex(
        lines, pattern=r"(?i)(password|secret|api_key|token)=\S+")
    assert kw.to_pylist() == [0, 2, 0]
    num = pc.count_substring_regex(lines, pattern=r"\d{5,}")
    assert num.to_pylist() == [1, 0, 0]
