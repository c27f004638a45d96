"""Brute-force verification of the round-3q driver closures: each
exact-integer kernel in queries_ext4 is checked against an independent
textbook implementation on constructed + randomized inputs."""

import math

import numpy as np

from log_analysis_ai_ray.pipelines.queries_ext4 import (
    e_value, g_statistic, gk_lambda, newsvendor_q, sign_test_z)


# ---------------------------------------------------------------------------
# Goodman-Kruskal lambda
# ---------------------------------------------------------------------------


def _lambda_naive(pairs):
    """λ(row|col) from raw observations: error of the modal guess
    without vs with the column."""
    n = len(pairs)
    rows, colmodal = {}, {}
    for r, c in pairs:
        rows[r] = rows.get(r, 0) + 1
        colmodal.setdefault(c, {})
        colmodal[c][r] = colmodal[c].get(r, 0) + 1
    e0 = n - max(rows.values())
    e1 = n - sum(max(d.values()) for d in colmodal.values())
    return None if e0 == 0 else (e0 - e1) / e0


def test_gk_lambda_random():
    rng = np.random.RandomState(31)
    for _ in range(20):
        pairs = [(int(r), int(c))
                 for r, c in zip(rng.randint(0, 4, 200),
                                 rng.randint(0, 6, 200))]
        cells = {}
        for p in pairs:
            cells[p] = cells.get(p, 0) + 1
        l_rc, _, _ = gk_lambda(cells)
        naive = _lambda_naive(pairs)
        assert abs(l_rc - naive) < 1e-12


def test_gk_lambda_perfect_prediction():
    # column determines row exactly, rows balanced -> lambda = 1
    cells = {(0, 0): 10, (1, 1): 10, (2, 2): 10}
    l_rc, l_cr, l_sym = gk_lambda(cells)
    assert l_rc == 1.0 and l_cr == 1.0 and l_sym == 1.0


def test_gk_lambda_no_improvement():
    # same modal row in every column -> lambda(row|col) = 0
    cells = {(0, 0): 8, (1, 0): 2, (0, 1): 8, (1, 1): 2}
    l_rc, _, _ = gk_lambda(cells)
    assert l_rc == 0.0


def test_gk_lambda_single_row_none():
    cells = {(0, 0): 5, (0, 1): 7}
    l_rc, _, _ = gk_lambda(cells)
    assert l_rc is None


# ---------------------------------------------------------------------------
# G statistic
# ---------------------------------------------------------------------------


def test_g_statistic_independence_zero():
    # exactly proportional table -> G = 0
    cells = {(0, 0): 10, (0, 1): 20, (1, 0): 5, (1, 1): 10}
    g, df = g_statistic(cells)
    assert abs(g) < 1e-9 and df == 1


def test_g_statistic_equals_2n_mi():
    rng = np.random.RandomState(7)
    cells = {(int(r), int(c)): int(v) for (r, c), v in np.ndenumerate(
        rng.randint(1, 30, (3, 4)))}
    g, df = g_statistic(cells)
    n = sum(cells.values())
    rows, cols = {}, {}
    for (r, c), v in cells.items():
        rows[r] = rows.get(r, 0) + v
        cols[c] = cols.get(c, 0) + v
    mi = sum(v / n * math.log((v / n) / ((rows[r] / n) * (cols[c] / n)))
             for (r, c), v in cells.items())
    assert abs(g - 2 * n * mi) < 1e-9
    assert df == 6


# ---------------------------------------------------------------------------
# sign test
# ---------------------------------------------------------------------------


def test_sign_test_z_matches_binomial_form():
    # z = (pos - m/2 - 0.5)/sqrt(m/4) for pos > m/2
    for pos, neg in [(15, 5), (5, 15), (30, 10), (7, 7), (0, 0)]:
        z = sign_test_z(pos, neg)
        m = pos + neg
        if m == 0 or pos == neg:
            assert z == 0.0
        elif pos > neg:
            assert abs(z - (pos - m / 2 - 0.5) / math.sqrt(m / 4)) < 1e-12
        else:
            assert abs(z - (pos - m / 2 + 0.5) / math.sqrt(m / 4)) < 1e-12


def test_sign_test_symmetry():
    assert sign_test_z(20, 8) == -sign_test_z(8, 20)


# ---------------------------------------------------------------------------
# E-value
# ---------------------------------------------------------------------------


def test_e_value_null_and_known():
    assert e_value(1.0) == 1.0
    assert abs(e_value(4.0) - (4 + math.sqrt(12))) < 1e-12
    # symmetric under inversion
    assert abs(e_value(0.25) - e_value(4.0)) < 1e-12
    # monotone in |log RR|
    assert e_value(2.0) < e_value(3.0)


# ---------------------------------------------------------------------------
# newsvendor
# ---------------------------------------------------------------------------


def test_newsvendor_q_minimizes_cost():
    rng = np.random.RandomState(13)
    for _ in range(20):
        d = rng.randint(0, 100, 57).tolist()
        cu, co = 3, 1
        q, cost = newsvendor_q(d, cu, co)

        def total(qq):
            return sum(cu * (x - qq) if x > qq else co * (qq - x)
                       for x in d)

        assert cost == total(q)
        # optimal among all candidate stock levels (and neighbors)
        for qq in set(d) | {q - 1, q + 1, 0, max(d) + 5}:
            assert cost <= total(qq)


def test_newsvendor_fractile_order_statistic():
    # n=8, fractile 3/4 -> r = ceil(6) = 6th order statistic
    d = [10, 20, 30, 40, 50, 60, 70, 80]
    q, _ = newsvendor_q(d, 3, 1)
    assert q == 60


# ---------------------------------------------------------------------------
# cluster validity indices
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    davies_bouldin_l1, dunn_l1, silhouette_l1)


def _two_blobs():
    pts = [(0, 0), (1, 0), (0, 1), (100, 100), (101, 100), (100, 101)]
    labels = [0, 0, 0, 1, 1, 1]
    return pts, labels


def test_silhouette_two_tight_blobs_near_one():
    pts, labels = _two_blobs()
    s = silhouette_l1(pts, labels)
    assert s > 0.98


def test_silhouette_shuffled_labels_poor():
    pts, _ = _two_blobs()
    bad = [0, 1, 0, 1, 0, 1]
    assert silhouette_l1(pts, bad) < 0


def test_silhouette_singleton_scores_zero():
    pts = [(0, 0), (10, 0), (20, 0)]
    labels = [0, 0, 1]
    # singleton contributes 0; the other two split (b-a)/max terms
    s = silhouette_l1(pts, labels)
    brute = 0.0
    # point 0: a=10, b=20 -> 0.5 ; point 1: a=10, b=10 -> 0.0
    brute = (0.5 + 0.0 + 0.0) / 3
    assert abs(s - brute) < 1e-12


def test_davies_bouldin_blobs_small_and_coincident_none():
    pts, labels = _two_blobs()
    db = davies_bouldin_l1(pts, labels)
    assert db is not None and db < 0.02
    # coincident centroids -> None
    assert davies_bouldin_l1([(0, 0), (1, 1), (0, 0), (1, 1)],
                             [0, 0, 1, 1]) is None


def test_dunn_exact_integers():
    pts, labels = _two_blobs()
    inter, intra, ratio = dunn_l1(pts, labels)
    # closest cross pair: (1,0)-(100,100) -> 99 + 100 = 199
    assert inter == 199 and intra == 2 and ratio == 99.5


def test_dunn_no_intra_none():
    inter, intra, ratio = dunn_l1([(0, 0), (5, 5)], [0, 1])
    assert intra is None and ratio is None


# ---------------------------------------------------------------------------
# Kalman local level + Diebold-Mariano
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    diebold_mariano, kalman_local_level)


def test_kalman_constant_series_converges_to_level():
    y = [50.0] * 200
    k, a, ll = kalman_local_level(y, r=4.0, q=0.4)
    assert abs(a - 50.0) < 1e-9
    # steady-state gain for q/r=0.1: k = (sqrt(q^2+4qr)+q)/(sqrt(..)+q+2r)
    q, r = 0.4, 4.0
    disc = math.sqrt(q * q + 4 * q * r)
    k_ss = (disc + q) / (disc + q + 2 * r)
    assert abs(k - k_ss) < 1e-9


def test_kalman_tracks_step_change():
    y = [0.0] * 100 + [100.0] * 100
    k, a, ll = kalman_local_level(y, r=1.0, q=0.1)
    assert 99.0 < a <= 100.0


def test_kalman_loglik_matches_naive_gaussian():
    rng = np.random.RandomState(5)
    y = rng.randint(0, 50, 30).astype(float).tolist()
    r, q = 9.0, 0.9
    k, a, ll = kalman_local_level(y, r, q)
    # independent re-derivation with explicit predictive densities
    aa, pp = y[0], r
    ll2 = 0.0
    for t in range(1, len(y)):
        pr = pp + q
        f = pr + r
        ll2 += -0.5 * math.log(2 * math.pi * f) \
            - 0.5 * (y[t] - aa) ** 2 / f
        kk = pr / f
        aa = aa + kk * (y[t] - aa)
        pp = (1 - kk) * pr
    assert abs(ll - ll2) < 1e-9


def test_diebold_mariano_known():
    # constant differential -> zero variance -> None
    md, dm = diebold_mariano([5, 5, 5, 5])
    assert md == 5.0 and dm is None
    # symmetric flip
    md1, dm1 = diebold_mariano([3, -1, 4, -2, 6])
    md2, dm2 = diebold_mariano([-3, 1, -4, 2, -6])
    assert abs(md1 + md2) < 1e-12 and abs(dm1 + dm2) < 1e-12
    # agrees with numpy mean/pop-std formulation
    d = [3, -1, 4, -2, 6]
    exp = np.mean(d) / math.sqrt(np.var(d) / len(d))
    assert abs(dm1 - exp) < 1e-9


# ---------------------------------------------------------------------------
# pair hop histogram (Wiener / efficiency kernel)
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    pair_hop_histogram)


def test_pair_hop_histogram_path_graph():
    # path 0-1-2-3: ordered-pair distances 1:6, 2:4, 3:2
    lo = np.asarray([0, 1, 2])
    hi = np.asarray([1, 2, 3])
    hist = pair_hop_histogram(4, lo, hi, 6)
    assert hist == {1: 6, 2: 4, 3: 2}


def test_pair_hop_histogram_complete_graph():
    import itertools
    pairs = list(itertools.combinations(range(5), 2))
    lo = np.asarray([p[0] for p in pairs])
    hi = np.asarray([p[1] for p in pairs])
    hist = pair_hop_histogram(5, lo, hi, 6)
    assert hist == {1: 20}


def test_pair_hop_histogram_disconnected_and_cap():
    # two disjoint edges: only hop-1 pairs, cross pairs unreachable
    lo = np.asarray([0, 2])
    hi = np.asarray([1, 3])
    hist = pair_hop_histogram(4, lo, hi, 6)
    assert hist == {1: 4}
    # hop cap truncates a long path
    lo2 = np.asarray(range(9))
    hi2 = np.asarray(range(1, 10))
    h2 = pair_hop_histogram(10, lo2, hi2, 3)
    assert set(h2) == {1, 2, 3}


# ---------------------------------------------------------------------------
# t-closeness EMD kernel
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    t_closeness_emd)


def test_t_closeness_identical_distribution_zero():
    total = {0: 10, 1: 20, 2: 10}
    groups = {"g": {0: 1, 1: 2, 2: 1}}   # same shape, 1/10 scale
    t = t_closeness_emd(groups, total)
    assert t["g"] == 0.0


def test_t_closeness_extreme_mass_shift():
    # group concentrated at the far end of a 2-bucket grid where the
    # global is all at the other end -> t = 1 as n_g/N -> 0
    total = {0: 1000, 1: 1}
    groups = {"g": {1: 1}}
    t = t_closeness_emd(groups, total)
    assert t["g"] > 0.99


def test_t_closeness_matches_probability_form():
    rng = np.random.RandomState(3)
    total = {}
    groups = {"a": {}, "b": {}}
    for b in range(6):
        ca = int(rng.randint(0, 30))
        cb = int(rng.randint(0, 30))
        if ca:
            groups["a"][b] = ca
        if cb:
            groups["b"][b] = cb
        total[b] = ca + cb
    total = {b: v for b, v in total.items() if v}
    t = t_closeness_emd(groups, total)
    grid = sorted(total)
    m = len(grid)
    n = sum(total.values())
    for g, cs in groups.items():
        ng = sum(cs.values())
        cg = ct = 0.0
        ref = 0.0
        for b in grid:
            cg += cs.get(b, 0) / ng
            ct += total[b] / n
            ref += abs(cg - ct)
        ref /= (m - 1)
        assert abs(t[g] - ref) < 1e-9


# ---------------------------------------------------------------------------
# Mincer-Zarnowitz + Pesaran-Timmermann
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    mz_regression, pesaran_timmermann)


def test_mz_perfect_forecast():
    y = [3, 7, 2, 9, 5]
    a, b, r2 = mz_regression(y, y)
    assert abs(a) < 1e-9 and abs(b - 1) < 1e-12 and abs(r2 - 1) < 1e-12


def test_mz_biased_forecast():
    f = [3, 7, 2, 9, 5]
    y = [v + 10 for v in f]          # constant bias
    a, b, r2 = mz_regression(y, f)
    assert abs(a - 10) < 1e-9 and abs(b - 1) < 1e-12


def test_mz_matches_numpy_polyfit():
    rng = np.random.RandomState(9)
    f = rng.randint(0, 100, 40).tolist()
    y = [2 * v + int(e) for v, e in zip(f, rng.randint(-5, 6, 40))]
    a, b, _ = mz_regression(y, f)
    bb, aa = np.polyfit(np.asarray(f, float), np.asarray(y, float), 1)
    assert abs(b - bb) < 1e-8 and abs(a - aa) < 1e-6


def test_mz_constant_forecast_none():
    a, b, r2 = mz_regression([1, 2, 3], [5, 5, 5])
    assert a is None and b is None and r2 is None


def test_pt_perfect_and_random():
    # perfect agreement with balanced margins -> large positive z
    ph, ps, pt = pesaran_timmermann(100, 50, 50, 100)
    assert ph == 1.0 and abs(ps - 0.5) < 1e-12 and pt > 9
    # exactly independent-rate hits -> z == 0
    ph, ps, pt = pesaran_timmermann(100, 50, 50, 50)
    assert abs(pt) < 1e-9
    # degenerate margins (always up) -> None
    _, _, pt = pesaran_timmermann(100, 100, 100, 100)
    assert pt is None


# ---------------------------------------------------------------------------
# Western Electric rules
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    western_electric)


def test_we_rule1_spike():
    y = [10.0] * 20
    y[7] = 50.0
    r1, r2, r3, r4 = western_electric(y, 10.0, 1.0)
    assert r1 == 1


def test_we_rule2_two_of_three():
    y = [0.0] * 10 + [2.5, 0.0, 2.5] + [0.0] * 5
    # mu=0, sigma=1: beyond-2s at idx 10 and 12; idx 12 completes 2/3
    r1, r2, r3, r4 = western_electric(y, 0.0, 1.0)
    assert r2 == 1 and r1 == 0


def test_we_rule3_four_of_five():
    y = [0.0] * 6 + [1.5, 1.5, 0.0, 1.5, 1.5] + [0.0] * 4
    # four beyond-1s in a 5-window: last one (idx 10) completes it
    r1, r2, r3, r4 = western_electric(y, 0.0, 1.0)
    assert r3 == 1


def test_we_rule4_long_run():
    y = [1.0] * 9 + [-1.0] * 3
    # 9 points above mu=0: days 8 and 9 (0-idx 7,8) complete 8-runs
    r1, r2, r3, r4 = western_electric(y, 0.0, 10.0)
    assert r4 == 2


# ---------------------------------------------------------------------------
# Kaplan-Meier closure + Quade statistic kernels
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    km_closure, quade_stat, _dmid)


def test_km_no_censoring_matches_empirical():
    # 5 subjects, events at t=2,4,6,8,10, no censoring, tau=12
    dur = [2, 4, 6, 8, 10]
    ne = [1, 1, 1, 1, 1]
    nr = [5, 4, 3, 2, 1]
    median, s_tau, rmst = km_closure(dur, ne, nr, 12)
    # S drops 1 -> .8 -> .6 -> .4 -> .2 -> 0; first S<=0.5 at t=6
    # (avoids the exact-0.5 knife edge the exp/ln program can't hit)
    assert median == 6
    assert abs(s_tau - 0.0) < 1e-12
    # RMST = mean event time = (2+4+6+8+10)/5 = 6
    assert abs(rmst - 6.0) < 1e-9


def test_km_all_censored():
    median, s_tau, rmst = km_closure([5, 9], [0, 0], [2, 1], 10)
    assert median is None and s_tau == 1.0 and rmst == 10.0


def test_km_tail_beyond_tau_ignored():
    # event past tau must not change S(tau)/RMST but can set median
    median, s_tau, rmst = km_closure([3, 20], [2, 1], [3, 1], 10)
    assert abs(s_tau - 1.0 / 3.0) < 1e-12
    assert abs(rmst - (3 + (1.0 / 3.0) * 7)) < 1e-9
    assert median == 3      # S = 1/3 <= 0.5 at t=3


def _quade_float(grid):
    # independent float implementation with scipy-style average ranks
    import numpy as _np
    g = _np.asarray(grid, dtype=float)
    b, k = g.shape

    def avgrank(v):
        order = _np.argsort(v, kind="stable")
        r = _np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            r[order[i:j + 1]] = (i + j + 2) / 2.0
            i = j + 1
        return r

    q = avgrank(g.max(axis=1) - g.min(axis=1))
    s = _np.empty_like(g)
    for i in range(b):
        s[i] = q[i] * (avgrank(g[i]) - (k + 1) / 2.0)
    a = (s * s).sum()
    bb = (s.sum(axis=0) ** 2).sum() / b
    return (b - 1) * bb / (a - bb) if a != bb else None


def test_quade_matches_float_reference():
    grid = [[31, 27, 24], [31, 28, 31], [45, 29, 46], [21, 18, 48],
            [42, 36, 46], [32, 17, 40], [40, 31, 43], [26, 28, 27]]
    f_int, b, k = quade_stat(grid)
    f_flt = _quade_float(grid)
    assert b == 8 and k == 3
    assert abs(f_int - f_flt) < 1e-9


def test_quade_identical_blocks_degenerate():
    grid = [[1, 2, 3]] * 5
    f, b, k = quade_stat(grid)
    assert f is None          # every block ranks identically -> inf


def test_dmid_ties():
    assert _dmid([5, 1, 5, 0]) == [7, 4, 7, 2]


# ---------------------------------------------------------------------------
# Page trend L via _dmid — synthetic monotone / reversed weeks
# ---------------------------------------------------------------------------


def _page_l2(rows):
    k = len(rows[0])
    r2_sum = [0] * k
    for row in rows:
        r2 = _dmid(row)
        for j in range(k):
            r2_sum[j] += r2[j]
    return sum((j + 1) * r2_sum[j] for j in range(k))


def test_page_l_monotone_is_max():
    rows = [[1, 2, 3, 4, 5, 6, 7]] * 4      # perfectly increasing
    # max L = b * sum j*j = 4 * 140 = 560 -> doubled 1120
    assert _page_l2(rows) == 2 * 4 * sum((j + 1) ** 2
                                         for j in range(7))


def test_page_l_reversed_is_min():
    rows = [[7, 6, 5, 4, 3, 2, 1]] * 3
    # min L = b * sum j*(k+1-j) = 3 * 84 = 252 -> doubled 504
    assert _page_l2(rows) == 2 * 3 * sum((j + 1) * (7 - j)
                                         for j in range(7))


def test_page_l_ties_average():
    rows = [[5, 5, 5]]
    # all tied: every doubled midrank = k+1 = 4; L2 = sum j*4 = 24
    assert _page_l2(rows) == (1 + 2 + 3) * 4


# ---------------------------------------------------------------------------
# KS / Cuzick / winsorized closures — brute-force parity
# ---------------------------------------------------------------------------


def _ks_dnum(a, b):
    """integer KS numerator max|nb*cumA - na*cumB| via the closure's
    histogram scheme."""
    import numpy as _np
    uv = _np.unique(_np.concatenate([a, b]))
    ca = _np.array([( _np.asarray(a) == x).sum() for x in uv])
    cb = _np.array([( _np.asarray(b) == x).sum() for x in uv])
    return int(max(abs(len(b) * int(x) - len(a) * int(y))
                   for x, y in zip(ca.cumsum(), cb.cumsum())))


def test_ks_identical_zero_and_disjoint_full():
    a = np.array([1, 2, 3, 4])
    assert _ks_dnum(a, a) == 0
    b = np.array([10, 11, 12])
    # disjoint supports -> D = 1 -> dnum = na*nb
    assert _ks_dnum(a, b) == len(a) * len(b)


def test_ks_matches_ecdf_brute():
    rng = np.random.RandomState(5)
    for _ in range(10):
        a = rng.randint(0, 20, 30)
        b = rng.randint(3, 25, 17)
        dnum = _ks_dnum(a, b)
        grid = np.unique(np.concatenate([a, b]))
        d = max(abs((a <= x).mean() - (b <= x).mean()) for x in grid)
        assert abs(dnum / (len(a) * len(b)) - d) < 1e-12


def test_cuzick_moments_no_trend():
    # equal groups, identical distributions: L2 == E2 by symmetry
    # when every group sees the same value multiset
    v = np.array([10, 20, 30] * 3)
    z = np.repeat([1, 2, 3], 3)
    uv, inv = np.unique(v, return_inverse=True)
    cv = np.bincount(inv)
    cumb = np.cumsum(cv) - cv
    r2 = 2 * cumb + cv + 1
    l2 = int((z * r2[inv]).sum())
    N = len(v)
    e2 = (N + 1) * int(z.sum())
    assert l2 == e2


def test_winsorized_clip_sums():
    # n=10, k=1: clip to [x2, x9]
    x = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])
    k = len(x) // 10
    xs = np.sort(x)
    lo, hi = xs[k], xs[len(x) - k - 1]
    w = np.clip(x, lo, hi)
    assert lo == 2 and hi == 9
    assert w.sum() == 1 * 0 + (2 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9 + 9)


# ---------------------------------------------------------------------------
# bigram LM cross-entropy kernel
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import bigram_ce  # noqa: E402


def test_bigram_ce_memorized_corpus():
    # train == test, single deterministic sequence "a b a b"
    tr = [("<s>", "a", 1), ("a", "b", 2), ("b", "a", 1)]
    V, n, h = bigram_ce(tr, tr)
    assert V == 3 and n == 4        # types {a,b} + unk
    expect = -(math.log2((1 + 1) / (1 + 3))        # <s> a
               + 2 * math.log2((2 + 1) / (2 + 3))  # a b twice
               + math.log2((1 + 1) / (1 + 3))) / 4  # b a (C(b)=1)
    assert abs(h - expect) < 1e-12


def test_bigram_ce_oov_maps_to_unk():
    tr = [("<s>", "a", 1)]
    te = [("<s>", "z", 1), ("z", "a", 1)]
    V, n, h = bigram_ce(tr, te)
    assert V == 2 and n == 2
    # <s> z -> <s> <unk>: (0+1)/(1+2); z a -> <unk> a: (0+1)/(0+2)
    expect = -(math.log2(1 / 3) + math.log2(1 / 2)) / 2
    assert abs(h - expect) < 1e-12


def test_bigram_ce_empty_test():
    V, n, h = bigram_ce([("<s>", "a", 1)], [])
    assert n == 0 and h is None


# ---------------------------------------------------------------------------
# BH step-up cutoff — integer decision parity
# ---------------------------------------------------------------------------


def _bh_cutoff(p_micro, m, q10=1):
    """max rank with p_micro*10*m <= rank*1e6 (q = q10/10)."""
    cut = 0
    for rank, p in enumerate(sorted(p_micro), 1):
        if p * 10 * m <= rank * 1_000_000 * q10:
            cut = rank
    return cut


def test_bh_textbook_example():
    # classic BH illustration (q=0.10): ranks with p <= rank*q/m
    p = [1000, 8000, 39000, 41000, 210000, 550000]     # micro units
    m = len(p)
    # thresholds: rank*100000/6 -> 16666, 33333, 50000, 66666, ...
    # p3=39000<=50000 ok, p4=41000<=66666 ok, p5=210000>83333 no
    assert _bh_cutoff(p, m) == 4


def test_bh_none_rejected():
    assert _bh_cutoff([900000, 950000], 2) == 0


def test_bh_all_rejected():
    assert _bh_cutoff([1, 2, 3], 3) == 3


def test_bh_step_up_rescues_earlier_rank():
    # rank 1 fails its own threshold but rank 2 passes -> cutoff 2
    p = [40000, 45000]      # thresholds 50000*1, 50000*2? q=0.1,m=2
    # thresholds: rank*1e6/(10*2) = 50000, 100000
    assert _bh_cutoff(p, 2) == 2


# ---------------------------------------------------------------------------
# CCF integer-NUM2 algebra vs float reference
# ---------------------------------------------------------------------------


def _ccf_int(x, y, k):
    """the query's exact-integer lag-k cross-correlation."""
    n = len(x)
    Sx, Sy = int(x.sum()), int(y.sum())
    A = n * int((x * x).sum()) - Sx * Sx
    B = n * int((y * y).sum()) - Sy * Sy
    if k >= 0:
        xw, yw = x[:n - k], y[k:]
    else:
        xw, yw = x[-k:], y[:n + k]
    w = len(xw)
    num2 = (n * n * int((xw * yw).sum()) - n * Sx * int(yw.sum())
            - n * Sy * int(xw.sum()) + w * Sx * Sy)
    return num2 / (n * math.sqrt(A) * math.sqrt(B))


def _ccf_float(x, y, k):
    """textbook sample CCF: full-series means/sds, truncated sum."""
    n = len(x)
    xm, ym = x.mean(), y.mean()
    sx = math.sqrt(((x - xm) ** 2).sum() / n)
    sy = math.sqrt(((y - ym) ** 2).sum() / n)
    if k >= 0:
        s = ((x[:n - k] - xm) * (y[k:] - ym)).sum()
    else:
        s = ((x[-k:] - xm) * (y[:n + k] - ym)).sum()
    return s / (n * sx * sy)


def test_ccf_int_matches_float_reference():
    rng = np.random.RandomState(11)
    x = rng.randint(0, 50, 60).astype(np.int64)
    y = rng.randint(0, 50, 60).astype(np.int64)
    for k in (-5, -1, 0, 2, 7):
        assert abs(_ccf_int(x, y, k)
                   - _ccf_float(x.astype(float), y.astype(float), k)) \
            < 1e-9


def test_ccf_shifted_copy_peaks_at_lag():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 100, 80).astype(np.int64)
    y = np.r_[np.zeros(3, dtype=np.int64), x[:-3]]   # x leads y by 3
    vals = {k: _ccf_int(x, y, k) for k in range(-7, 8)}
    assert max(vals, key=lambda k: vals[k]) == 3
    assert vals[3] > 0.8


# ---------------------------------------------------------------------------
# Soundex regex chain — classic reference codes
# ---------------------------------------------------------------------------

import pyarrow as pa  # noqa: E402

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    soundex_codes)


def test_soundex_classic_examples():
    names = pa.array(["Robert", "Rupert", "Ashcraft", "Ashcroft",
                      "Tymczak", "Pfister", "Honeyman", "Jackson"])
    got = soundex_codes(names).to_pylist()
    assert got == ["R163", "R163", "A261", "A261",
                   "T522", "P236", "H555", "J250"]


def test_soundex_first_word_only_and_short():
    names = pa.array(["red widget", "Lee", "O"])
    got = soundex_codes(names).to_pylist()
    # RED -> R3 -> R300 ; LEE -> L000 ; O -> O000
    assert got == ["R300", "L000", "O000"]


def test_turning_points_brute():
    y = np.array([1, 3, 2, 4, 4, 5, 1], dtype=object)
    d = y[1:] - y[:-1]
    t = int(((d[:-1] * d[1:]) < 0).sum())
    # direction changes at 3(peak), 2(valley), then 4,4 plateau kills
    # the product (zero, not < 0), 5 -> 1 peak counts
    assert t == 3


# ---------------------------------------------------------------------------
# HLL estimate closure + CM bucket hash
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext4 import (  # noqa: E402
    _HLL_M, _cm_bucket, hll_estimate, splitmix64)


def _hll_regs(ids):
    regs = {}
    for u in ids:
        h = splitmix64(u)
        b = h >> 52
        w = h & ((1 << 52) - 1)
        r = 53 - w.bit_length() if w else 53
        regs[b] = max(regs.get(b, 0), r)
    return regs


def test_hll_accuracy_within_sketch_error():
    # standard error ~ 1.04/sqrt(4096) = 1.6%; allow 5% headroom
    for n in (1000, 20000, 100000):
        ids = range(1, n + 1)
        _, _, e = hll_estimate(_hll_regs(ids))
        assert abs(e - n) / n < 0.05


def test_hll_duplicates_do_not_inflate():
    regs1 = _hll_regs(list(range(1, 501)))
    regs2 = _hll_regs(list(range(1, 501)) * 7)
    assert regs1 == regs2


def test_hll_empty_sketch_linear_counting_small():
    # tiny cardinality -> linear counting branch, near-exact
    _, v, e = hll_estimate(_hll_regs(range(1, 43)))
    assert v >= _HLL_M - 42
    assert abs(e - 42) < 2.0


def test_cm_bucket_range_and_determinism():
    for u in (0, 1, 2**31, 999999937):
        b = _cm_bucket(u, 2654435761, 0x9E3779B9)
        assert 0 <= b < 1024
        assert b == _cm_bucket(u, 2654435761, 0x9E3779B9)


def test_splitmix64_np_matches_scalar():
    from log_analysis_ai_ray.pipelines.queries_ext4 import (
        splitmix64_np)
    ids = np.array([0, 1, 2, 123456789, 2**40, 2**63 - 1],
                   dtype=np.uint64)
    got = splitmix64_np(ids).tolist()
    assert got == [splitmix64(int(x)) for x in ids.tolist()]
