"""Kernel-level semantics for the round-3c additions: mergeable OLS /
correlation sufficient statistics, MAD-from-counts, CUSUM peak, PMI
closure, and the snapshot-diff classifier. (Oracle parity for the full
queries is covered by the driver / tools/selfcheck.py.)"""

import math

import numpy as np
import pyarrow as pa

from log_analysis_ai_ray.pipelines.queries import (
    _diff_kbucket, _quantile_disc_from_counts,
)


def test_ols_sufficient_statistics_merge():
    # slope from merged partial sums == slope from the full arrays,
    # and matches numpy's polyfit closed form.
    rng = np.random.default_rng(7)
    x = rng.integers(0, 60, size=500).astype(np.int64)
    y = (3 * x + rng.integers(-10, 10, size=500)).astype(np.int64)
    halves = [(x[:250], y[:250]), (x[250:], y[250:])]
    n = sx = sy = sxx = sxy = 0
    for xs, ys in halves:  # per-block int64 partials, bigint close
        n += len(xs)
        sx += int(xs.sum())
        sy += int(ys.sum())
        sxx += int((xs * xs).sum())
        sxy += int((xs * ys).sum())
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    ref = np.polyfit(x.astype(float), y.astype(float), 1)[0]
    assert abs(slope - ref) < 1e-9
    assert 2.9 < slope < 3.1


def test_corr_sufficient_statistics_vs_numpy():
    rng = np.random.default_rng(11)
    x = rng.integers(1, 50, size=400).astype(np.int64)
    y = (x * 100 + rng.integers(-500, 500, size=400)).astype(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    num = n * sxy - sx * sy
    corr = float(num) / math.sqrt(float(n * sxx - sx * sx)
                                  * float(n * syy - sy * sy))
    assert abs(corr - np.corrcoef(x, y)[0, 1]) < 1e-12


def test_mad_from_counts_matches_bruteforce():
    vals = np.array([1, 2, 3, 10, 50], dtype=np.int64)
    cnts = np.array([5, 3, 2, 1, 1], dtype=np.int64)
    med = _quantile_disc_from_counts(vals, cnts, 0.5)
    full = np.repeat(vals, cnts)
    # quantile_disc(0.5): value at 0-based rank ceil(n*0.5)-1
    assert med == int(np.sort(full)[math.ceil(len(full) * 0.5) - 1])
    dev = np.abs(vals - med)
    order = np.argsort(dev, kind="stable")
    mad = _quantile_disc_from_counts(dev[order], cnts[order], 0.5)
    full_dev = np.sort(np.abs(full - med))
    assert mad == int(full_dev[math.ceil(len(full_dev) * 0.5) - 1])


def test_cusum_peak_detects_level_shift():
    # stationary series -> small peak; mid-series shift -> ~n/2*delta
    flat = np.full(40, 10.0)
    assert np.max(np.abs(np.cumsum(flat - flat.mean()))) < 1e-9
    shifted = np.concatenate([np.full(20, 10.0), np.full(20, 20.0)])
    peak = np.max(np.abs(np.cumsum(shifted - shifted.mean())))
    assert abs(peak - 20 * 5.0) < 1e-9


def test_pmi_closure_orders_collocations_first():
    # "new york" always adjacent; "the the" independent — PMI must
    # rank the true collocation far above the independent pair.
    n_tok, n_pair = 1000, 900
    c_ny, c_new, c_york = 50, 50, 50
    c_thethe, c_the = 25, 500
    pmi_ny = math.log(float(c_ny * n_tok * n_tok)
                      / float(n_pair * c_new * c_york))
    pmi_the = math.log(float(c_thethe * n_tok * n_tok)
                       / float(n_pair * c_the * c_the))
    assert pmi_ny > pmi_the + 2


def test_diff_kbucket_deterministic_and_spread():
    ids = np.arange(10_000, dtype=np.int64)
    k = _diff_kbucket(ids)
    assert k.min() >= 0 and k.max() <= 99
    assert np.array_equal(k, _diff_kbucket(ids))  # pure function
    # each 3-bucket band carries roughly 3% of ids
    frac_added = (k < 3).mean()
    assert 0.02 < frac_added < 0.04


def test_range_sort_partition_offsets_exact():
    # the range-cut + offset arithmetic of events_range_sorted_sample:
    # global ranks reassembled from per-range local sorts must equal a
    # full sort, including rows equal to a range-bound value.
    rng = np.random.default_rng(3)
    cents = rng.integers(0, 50, size=2000).astype(np.int64)  # heavy ties
    ids = np.arange(2000, dtype=np.int64)
    vals, cnts = np.unique(cents, return_counts=True)
    order = np.argsort(-vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    total = int(cum[-1])
    npart = 7
    targets = (np.arange(1, npart) * total) // npart
    cut = np.searchsorted(cum, targets, side="left")
    bounds = vals[cut]
    start = np.concatenate([[0], cum[cut]])
    pid = np.searchsorted(-bounds, -cents, side="left")
    got = np.empty(total, dtype=np.int64)
    for p in range(npart):
        m = pid == p
        e, c = ids[m], cents[m]
        o = np.lexsort((e, -c))
        got[e[o]] = np.arange(m.sum()) + start[p] + 1
    full = np.lexsort((ids, -cents))
    want = np.empty(total, dtype=np.int64)
    want[ids[full]] = np.arange(total) + 1
    assert np.array_equal(got, want)
