"""Kernel cross-checks for the session-9 batch: Jonckheere-Terpstra
histogram closure vs brute-force pair counting, Fisher exact vs exact
Fraction enumeration, binned AD/KS vs the per-observation textbook
sums, SCC boolean closure vs Tarjan, and the EWMA walk vs closed-form
weights."""

import math
from fractions import Fraction

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from log_analysis_ai_ray.pipelines.queries_ext import (
    _ad_binned_uniform, _ewma_walk, _fisher_two_sided, _jt_stats,
    _ks_binned_uniform, _scc_labels)

# ---------------------------------------------------------------- JT


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=8),
                         min_size=1, max_size=12),
                min_size=2, max_size=4))
def test_jt_u2_matches_bruteforce_pairs(groups):
    if sum(len(g) for g in groups) < 3:
        return  # variance denominator needs N >= 3
    vals = sorted({v for g in groups for v in g})
    vix = {v: i for i, v in enumerate(vals)}
    hist = np.zeros((len(groups), len(vals)), dtype=np.int64)
    for gi, g in enumerate(groups):
        for v in g:
            hist[gi, vix[v]] += 1
    u2, mean2, var = _jt_stats(hist)
    # brute force: 2U = sum over i<j group pairs of 2*#(x<y) + #(x==y)
    bf = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            for x in groups[i]:
                for y in groups[j]:
                    if x < y:
                        bf += 2
                    elif x == y:
                        bf += 1
    assert u2 == bf
    # doubled mean: N^2 - sum n_i^2 halved
    n_i = [len(g) for g in groups]
    n = sum(n_i)
    assert mean2 == (n * n - sum(x * x for x in n_i)) / 2.0
    assert var >= 0.0


def test_jt_no_ties_matches_textbook_variance():
    # distinct values everywhere: variance must reduce to
    # [N^2(2N+3) - sum n_i^2 (2 n_i + 3)]/72
    groups = [[1, 5], [2, 8], [3, 9, 11]]
    vals = sorted({v for g in groups for v in g})
    vix = {v: i for i, v in enumerate(vals)}
    hist = np.zeros((3, len(vals)), dtype=np.int64)
    for gi, g in enumerate(groups):
        for v in g:
            hist[gi, vix[v]] += 1
    _, _, var = _jt_stats(hist)
    n_i = [2, 2, 3]
    n = 7
    expect = (n * n * (2 * n + 3)
              - sum(m * m * (2 * m + 3) for m in n_i)) / 72.0
    assert abs(var - expect) < 1e-12


# ------------------------------------------------------------ Fisher


def _fisher_fraction(a, b, c, d):
    """Exact enumeration with Fractions (no floats)."""
    n, r1, c1 = a + b + c + d, a + b, a + c

    def comb(x, y):
        return math.comb(x, y)

    denom = comb(n, c1)
    p_obs = Fraction(comb(r1, a) * comb(n - r1, c1 - a), denom)
    tot = Fraction(0)
    for k in range(max(0, c1 - (n - r1)), min(r1, c1) + 1):
        p_k = Fraction(comb(r1, k) * comb(n - r1, c1 - k), denom)
        if p_k <= p_obs * (1 + Fraction(1, 10**7)):
            tot += p_k
    return float(tot)


@settings(max_examples=30, deadline=None)
@given(st.tuples(st.integers(0, 25), st.integers(0, 25),
                 st.integers(0, 25), st.integers(0, 25)))
def test_fisher_matches_fraction_enumeration(cells):
    a, b, c, d = cells
    if a + b == 0 or c + d == 0 or a + c == 0 or b + d == 0:
        return  # degenerate margins: p undefined/1 by convention
    got = _fisher_two_sided(a, b, c, d)
    want = _fisher_fraction(a, b, c, d)
    assert abs(got - want) < 1e-9


def test_fisher_balanced_table_is_one():
    assert abs(_fisher_two_sided(5, 5, 5, 5) - 1.0) < 1e-12


# ---------------------------------------------------------- AD / KS


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 9), min_size=1, max_size=60))
def test_ad_binned_matches_textbook_sorted_sum(bins):
    nb = 10
    hist = np.zeros(nb, dtype=np.int64)
    for b in bins:
        hist[b] += 1
    n = int(hist.sum())
    # textbook: sorted u_i at bin centres
    u = np.sort(np.concatenate(
        [np.full(c, (b + 0.5) / nb) for b, c in enumerate(hist)]))
    i = np.arange(1, n + 1, dtype=np.float64)
    a2 = -n - float(np.mean((2 * i - 1)
                            * (np.log(u) + np.log(1 - u[::-1]))))
    assert abs(_ad_binned_uniform(hist) - a2) < 1e-9


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 9), min_size=1, max_size=60))
def test_ks_binned_matches_fine_grid_sup(bins):
    nb = 10
    hist = np.zeros(nb, dtype=np.int64)
    for b in bins:
        hist[b] += 1
    n = int(hist.sum())
    d_plus, d_minus = _ks_binned_uniform(hist)
    cum = np.cumsum(hist) / n
    # sup over bin edges of the two one-sided gaps, brute force
    bf_plus = max(cum[b] - b / nb for b in range(nb))
    bf_minus = max((b + 1) / nb - cum[b] for b in range(nb))
    assert abs(d_plus - bf_plus) < 1e-12
    assert abs(d_minus - bf_minus) < 1e-12
    assert max(d_plus, d_minus) >= 0.0


# --------------------------------------------------------------- SCC


def _tarjan(n, edges):
    g = [[] for _ in range(n)]
    for s, d in edges:
        g[s].append(d)
    idx = [None] * n
    low = [0] * n
    on = [False] * n
    stack, out, counter = [], [], [0]

    def dfs(root):
        work = [(root, 0)]
        while work:
            u, pi = work[-1]
            if pi == 0:
                idx[u] = low[u] = counter[0]
                counter[0] += 1
                stack.append(u)
                on[u] = True
            recurse = False
            for vi in range(pi, len(g[u])):
                v = g[u][vi]
                if idx[v] is None:
                    work[-1] = (u, vi + 1)
                    work.append((v, 0))
                    recurse = True
                    break
                if on[v]:
                    low[u] = min(low[u], idx[v])
            if recurse:
                continue
            if low[u] == idx[u]:
                comp = []
                while True:
                    w = stack.pop()
                    on[w] = False
                    comp.append(w)
                    if w == u:
                        break
                out.append(comp)
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[u])

    for u in range(n):
        if idx[u] is None:
            dfs(u)
    return out


@settings(max_examples=40, deadline=None)
@given(st.integers(2, 10).flatmap(
    lambda n: st.tuples(st.just(n), st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        max_size=30))))
def test_scc_closure_matches_tarjan(args):
    n, edges = args
    edges = [(s, d) for s, d in edges if s != d]
    si = np.array([e[0] for e in edges], dtype=np.int64)
    di = np.array([e[1] for e in edges], dtype=np.int64)
    labels = _scc_labels(n, si, di)
    comps = _tarjan(n, edges)
    want = [0] * n
    for comp in comps:
        m = min(comp)
        for u in comp:
            want[u] = m
    assert labels.tolist() == want


# -------------------------------------------------------------- EWMA


def test_ewma_walk_matches_closed_form():
    x = np.array([3, 7, 1, 9, 4, 4, 4, 12], dtype=np.int64)
    mu = float(x.mean())
    sigma = float(x.std())
    lam = 0.2
    n_alarms, first, max_score = _ewma_walk(x, mu, sigma)
    # closed form: z_t = (1-lam)^t mu + lam sum (1-lam)^(t-i) x_i
    worst = 0.0
    for t in range(1, len(x) + 1):
        z = (1 - lam) ** t * mu + lam * sum(
            (1 - lam) ** (t - i) * x[i - 1] for i in range(1, t + 1))
        lim = 3.0 * sigma * math.sqrt(
            lam / (2 - lam) * (1 - (1 - lam) ** (2 * t)))
        worst = max(worst, abs(z - mu) / lim)
    assert abs(max_score - worst) < 1e-9
    assert (n_alarms > 0) == (worst > 1.0)
    assert first is None or 1 <= first <= len(x)


def test_ewma_constant_series_never_alarms():
    x = np.full(50, 7, dtype=np.int64)
    n_alarms, first, max_score = _ewma_walk(x, 7.0, 1.0)
    # 0.2*7 + 0.8*7 = 7 + 1 ulp in binary floating point — the walk
    # stays within rounding noise of the mean, never near the limits
    assert n_alarms == 0 and first is None and max_score < 1e-12
