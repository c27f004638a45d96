"""Brute-force verification of the round-3o driver closures: each
exact-integer kernel in queries_ext2 is checked against an independent
textbook float implementation on constructed + randomized inputs."""

import math

import numpy as np

from log_analysis_ai_ray.pipelines.queries_ext2 import (
    bartlett_statistic, cohen_kappa, dw_statistic, hellinger_js,
    hhi_stats, kpss_statistic)


def _dw_naive(x):
    x = np.asarray(x, dtype=np.float64)
    e = x - x.mean()
    return float(np.sum(np.diff(e) ** 2) / np.sum(e * e))


def _kpss_naive(x):
    x = np.asarray(x, dtype=np.float64)
    e = x - x.mean()
    s = np.cumsum(e)
    n = len(x)
    lrv = np.sum(e * e) / n      # lag-0 long-run variance
    return float(np.sum(s * s) / (n * n * lrv))


def test_dw_matches_naive_random():
    rng = np.random.RandomState(7)
    for _ in range(20):
        x = rng.randint(0, 1000, size=rng.randint(10, 200))
        assert abs(dw_statistic(x) - _dw_naive(x)) < 1e-9


def test_dw_limits():
    rng = np.random.RandomState(1)
    iid = rng.randint(0, 10_000, size=5000)
    assert abs(dw_statistic(iid) - 2.0) < 0.1       # independence → ≈2
    ramp = np.arange(1000)                          # strong trend → ≈0
    assert dw_statistic(ramp) < 0.01
    alt = np.tile([0, 100], 500)                    # alternation → ≈4
    assert dw_statistic(alt) > 3.9


def test_kpss_matches_naive_random():
    rng = np.random.RandomState(11)
    for _ in range(20):
        x = rng.randint(0, 10**6, size=rng.randint(10, 300))
        assert abs(kpss_statistic(x) - _kpss_naive(x)) < 1e-9


def test_kpss_random_walk_larger_than_iid():
    rng = np.random.RandomState(3)
    steps = rng.randint(-50, 51, size=2000)
    walk = 10**6 + np.cumsum(steps)                 # level-shifting
    iid = 10**6 + rng.randint(-50, 51, size=2000)   # stationary
    assert kpss_statistic(walk) > 10 * kpss_statistic(iid)


def _bartlett_naive(groups):
    k = len(groups)
    n_i = [len(g) for g in groups]
    big_n = sum(n_i)
    s2_i = [np.var(np.asarray(g, dtype=np.float64), ddof=1)
            for g in groups]
    sp2 = sum((n - 1) * s for n, s in zip(n_i, s2_i)) / (big_n - k)
    t = ((big_n - k) * math.log(sp2)
         - sum((n - 1) * math.log(s) for n, s in zip(n_i, s2_i)))
    c = 1.0 + (sum(1.0 / (n - 1) for n in n_i)
               - 1.0 / (big_n - k)) / (3.0 * (k - 1))
    return t / c


def test_bartlett_matches_naive():
    rng = np.random.RandomState(5)
    groups = [rng.randint(0, 500, size=m).tolist()
              for m in (30, 55, 80, 120)]
    ns = [len(g) for g in groups]
    s1 = [sum(g) for g in groups]
    s2 = [sum(v * v for v in g) for g in groups]
    assert abs(bartlett_statistic(ns, s1, s2)
               - _bartlett_naive(groups)) < 1e-8


def test_bartlett_equal_variances_near_zero():
    rng = np.random.RandomState(9)
    groups = [(rng.randint(0, 100, size=500) + 1000 * i).tolist()
              for i in range(4)]    # same spread, shifted locations
    ns = [len(g) for g in groups]
    s1 = [sum(g) for g in groups]
    s2 = [sum(v * v for v in g) for g in groups]
    # location shifts must not register: stat stays O(1), far below
    # the inflated-variance case
    infl = [g if i else (np.asarray(g) * 5).tolist()
            for i, g in enumerate(groups)]
    i1 = [sum(g) for g in infl]
    i2 = [sum(v * v for v in g) for g in infl]
    assert bartlett_statistic(ns, s1, s2) < 8
    assert bartlett_statistic(ns, i1, i2) > 100


def test_hhi_uniform_and_monopoly():
    hhi, top, eff = hhi_stats([100] * 25)
    assert abs(hhi - 1 / 25) < 1e-12
    assert abs(top - 1 / 25) < 1e-12
    assert abs(eff - 25.0) < 1e-9
    hhi, top, eff = hhi_stats([10**9, 1, 1])
    assert hhi > 0.999999 and top > 0.999999 and eff < 1.0000001


def test_hellinger_js_identical_zero_disjoint_max():
    h, js = hellinger_js([10, 20, 30], [100, 200, 300])
    assert abs(h) < 1e-12 and abs(js) < 1e-12
    h, js = hellinger_js([10, 0, 5, 0], [0, 7, 0, 3])
    assert abs(h - 1.0) < 1e-12
    assert abs(js - math.log(2)) < 1e-12


def test_hellinger_js_bounds_random():
    rng = np.random.RandomState(13)
    for _ in range(30):
        a = rng.randint(0, 100, size=6)
        b = rng.randint(0, 100, size=6)
        if a.sum() == 0 or b.sum() == 0:
            continue
        # keep both marginals positive on at least one shared cell
        a[0] += 1
        b[0] += 1
        h, js = hellinger_js(a.tolist(), b.tolist())
        assert -1e-12 <= h <= 1.0 + 1e-12
        assert -1e-12 <= js <= math.log(2) + 1e-12
        # distance vs itself is 0 (sqrt amplifies the Σp≈1 float
        # residue to ~1e-8, hence the looser bound than the exact
        # identical-ratio case above)
        h0, js0 = hellinger_js(a.tolist(), a.tolist())
        assert abs(h0) < 1e-7 and abs(js0) < 1e-12


def test_cohen_kappa_perfect_and_chance():
    # perfect agreement: only diagonal cells → κ = 1
    s, c, k = cohen_kappa(["a", "b"], ["a", "b"], [40, 60])
    assert s == 100 and c == 100 and abs(k - 1.0) < 1e-12
    # statistical independence: cells = outer product → κ = 0
    la, pr, nn = [], [], []
    tm = {"a": 30, "b": 70}
    pm = {"a": 40, "b": 60}
    for t, tv in tm.items():
        for p, pv in pm.items():
            la.append(t)
            pr.append(p)
            nn.append(tv * pv)      # n·P(t)·P(p) scaled by 100
    s, c, k = cohen_kappa(la, pr, nn)
    assert abs(k) < 1e-12


def test_cohen_kappa_matches_po_pe_form():
    rng = np.random.RandomState(17)
    labels = ["a", "b", "c"]
    la, pr, nn = [], [], []
    for t in labels:
        for p in labels:
            la.append(t)
            pr.append(p)
            nn.append(int(rng.randint(1, 50)))
    s, c, k = cohen_kappa(la, pr, nn)
    nn_a = np.asarray(nn, dtype=np.float64)
    po = c / s
    pe = sum((nn_a[np.asarray(la) == t].sum() / s)
             * (nn_a[np.asarray(pr) == t].sum() / s) for t in labels)
    assert abs(k - (po - pe) / (1 - pe)) < 1e-12
