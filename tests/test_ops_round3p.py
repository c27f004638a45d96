"""Brute-force verification of the round-3p driver closures: each
exact-integer kernel in queries_ext3 is checked against an independent
textbook implementation on constructed + randomized inputs."""

import itertools
import math

import numpy as np

from log_analysis_ai_ray.pipelines.queries_ext3 import (
    concordance_counts, entropy_nats, permutation_entropy3,
    transfer_entropy_bits, uncertainty_coefficient)


# ---------------------------------------------------------------------------
# uncertainty coefficient
# ---------------------------------------------------------------------------


def _u_naive(pairs):
    """Theil's U(row|col) from raw (row, col) observations via
    plain probability arithmetic."""
    n = len(pairs)
    rows = {}
    cols = {}
    joint = {}
    for r, c in pairs:
        rows[r] = rows.get(r, 0) + 1
        cols[c] = cols.get(c, 0) + 1
        joint[(r, c)] = joint.get((r, c), 0) + 1
    h_row = -sum(v / n * math.log(v / n) for v in rows.values())
    h_cond = 0.0
    for (r, c), v in joint.items():
        h_cond += -(v / n) * math.log(v / cols[c])
    return h_row, h_cond


def test_uncertainty_coefficient_random():
    rng = np.random.RandomState(11)
    for _ in range(20):
        n = rng.randint(20, 400)
        rows = rng.randint(0, 5, size=n)
        cols = rng.randint(0, 7, size=n)
        pairs = list(zip(rows.tolist(), cols.tolist()))
        cells = {}
        for p in pairs:
            cells[p] = cells.get(p, 0) + 1
        h_row, h_cond, u = uncertainty_coefficient(cells)
        h_row_n, h_cond_n = _u_naive(pairs)
        assert abs(h_row - h_row_n) < 1e-9
        assert abs(h_cond - h_cond_n) < 1e-9
        if h_row > 0:
            assert abs(u - (h_row - h_cond) / h_row) < 1e-12
            assert -1e-12 <= u <= 1 + 1e-12


def test_uncertainty_coefficient_extremes():
    # row fully determined by col -> U = 1
    cells = {(0, 0): 10, (1, 1): 5, (2, 2): 7}
    _, h_cond, u = uncertainty_coefficient(cells)
    assert abs(h_cond) < 1e-12 and abs(u - 1.0) < 1e-12
    # row independent of col -> U = 0
    cells = {(r, c): 3 for r in range(3) for c in range(4)}
    _, _, u = uncertainty_coefficient(cells)
    assert abs(u) < 1e-12
    # constant row -> H(row)=0 -> None
    assert uncertainty_coefficient({(0, 0): 4, (0, 1): 6})[2] is None


def test_entropy_nats_uniform():
    assert abs(entropy_nats([5, 5, 5, 5]) - math.log(4)) < 1e-12
    assert entropy_nats([7]) == 0.0
    assert abs(entropy_nats([1, 0, 3]) - entropy_nats([1, 3])) < 1e-15


# ---------------------------------------------------------------------------
# concordance counts (gamma / Somers' D)
# ---------------------------------------------------------------------------


def _concordance_naive(xs, ys):
    C = D = Tx = Ty = 0
    for (x1, y1), (x2, y2) in itertools.combinations(zip(xs, ys), 2):
        if x1 == x2 and y1 == y2:
            continue
        if x1 == x2:
            Tx += 1
        elif y1 == y2:
            Ty += 1
        elif (x2 - x1) * (y2 - y1) > 0:
            C += 1
        else:
            D += 1
    return C, D, Tx, Ty


def test_concordance_counts_random():
    rng = np.random.RandomState(3)
    for _ in range(15):
        n = rng.randint(10, 120)
        xs = rng.randint(0, 6, size=n).tolist()
        ys = rng.randint(0, 4, size=n).tolist()
        cells = {}
        for x, y in zip(xs, ys):
            cells[(x, y)] = cells.get((x, y), 0) + 1
        assert concordance_counts(cells) == _concordance_naive(xs, ys)


def test_concordance_perfect_orders():
    # strictly increasing -> all pairs concordant
    cells = {(i, i): 1 for i in range(8)}
    C, D, Tx, Ty = concordance_counts(cells)
    assert (C, D, Tx, Ty) == (28, 0, 0, 0)
    # strictly decreasing -> all discordant
    cells = {(i, 8 - i): 1 for i in range(8)}
    C, D, Tx, Ty = concordance_counts(cells)
    assert (C, D, Tx, Ty) == (0, 28, 0, 0)


def test_concordance_pair_conservation():
    # C + D + Tx + Ty + both-tied == n*(n-1)/2
    rng = np.random.RandomState(9)
    xs = rng.randint(0, 3, size=60).tolist()
    ys = rng.randint(0, 3, size=60).tolist()
    cells = {}
    for x, y in zip(xs, ys):
        cells[(x, y)] = cells.get((x, y), 0) + 1
    C, D, Tx, Ty = concordance_counts(cells)
    both = sum(c * (c - 1) // 2 for c in cells.values())
    assert C + D + Tx + Ty + both == 60 * 59 // 2


# ---------------------------------------------------------------------------
# transfer entropy
# ---------------------------------------------------------------------------


def _te_naive(transitions):
    """TE via explicit conditional probabilities:
    Σ p(y2,y1,x1) log2 [ p(y2|y1,x1) / p(y2|y1) ]."""
    m = len(transitions)
    from collections import Counter
    n3 = Counter(transitions)
    n_y1x1 = Counter((x, y) for x, y, _ in transitions)
    n_y2y1 = Counter((y, y2) for _, y, y2 in transitions)
    n_y1 = Counter(y for _, y, _ in transitions)
    te = 0.0
    for (x1, y1, y2), c in n3.items():
        p_joint = c / m
        p_y2_given_y1x1 = c / n_y1x1[(x1, y1)]
        p_y2_given_y1 = n_y2y1[(y1, y2)] / n_y1[y1]
        te += p_joint * math.log2(p_y2_given_y1x1 / p_y2_given_y1)
    return te


def test_transfer_entropy_random():
    rng = np.random.RandomState(5)
    for _ in range(15):
        n = rng.randint(20, 500)
        tr = [tuple(rng.randint(0, 2, size=3).tolist()) for _ in range(n)]
        m, te = transfer_entropy_bits(tr)
        assert m == n
        assert abs(te - _te_naive(tr)) < 1e-9
        assert te >= -1e-12      # TE is nonnegative


def test_transfer_entropy_deterministic_copy():
    # y2 = x1 exactly, y1 independent coin -> TE -> 1 bit
    rng = np.random.RandomState(2)
    tr = []
    for _ in range(4000):
        x1 = int(rng.randint(0, 2))
        y1 = int(rng.randint(0, 2))
        tr.append((x1, y1, x1))
    _, te = transfer_entropy_bits(tr)
    assert te > 0.95


def test_transfer_entropy_independent_is_zero():
    # y2 depends only on y1 -> TE == 0 exactly (ratio collapses)
    tr = [(x1, y1, y1) for x1 in (0, 1) for y1 in (0, 1)] * 10
    _, te = transfer_entropy_bits(tr)
    assert abs(te) < 1e-12
    assert transfer_entropy_bits([]) == (0, None)


# ---------------------------------------------------------------------------
# permutation entropy
# ---------------------------------------------------------------------------


def _pe_naive(values):
    """Order-3 PE via explicit argsort with index tie-break."""
    v = list(values)
    from collections import Counter
    pats = Counter()
    for i in range(len(v) - 2):
        w = [(v[i], 0), (v[i + 1], 1), (v[i + 2], 2)]
        order = tuple(idx for _, idx in sorted(w))
        pats[order] += 1
    m = sum(pats.values())
    if m == 0:
        return 0, None
    h = -sum(c / m * math.log2(c / m) for c in pats.values())
    return m, h


def test_permutation_entropy_random():
    rng = np.random.RandomState(17)
    for _ in range(15):
        v = rng.randint(0, 50, size=rng.randint(5, 300)).tolist()
        m, h, pe = permutation_entropy3(v)
        m_n, h_n = _pe_naive(v)
        assert m == m_n
        assert abs(h - h_n) < 1e-9
        assert abs(pe - h / math.log2(6)) < 1e-12


def test_permutation_entropy_limits():
    # monotone series -> single pattern -> H = 0
    m, h, pe = permutation_entropy3(list(range(50)))
    assert (m, h, pe) == (48, 0.0, 0.0)
    # too short -> no windows
    assert permutation_entropy3([1, 2]) == (0, None, None)
    # code space: the 6 reachable codes on all distinct triples
    codes = set()
    for a, b, c in itertools.permutations([1, 2, 3]):
        codes.add(4 * (a <= b) + 2 * (b <= c) + (a <= c))
    assert len(codes) == 6


def test_permutation_entropy_tie_rule_matches_argsort():
    # earlier-index-smaller: ties must reproduce stable argsort
    for v in ([1, 1, 1, 1], [2, 2, 1, 2, 2], [3, 1, 3, 3, 1]):
        m, h, _ = permutation_entropy3(v)
        m_n, h_n = _pe_naive(v)
        assert m == m_n and abs(h - (h_n or 0.0)) < 1e-12


# ---------------------------------------------------------------------------
# sample entropy
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    erlang_c, higuchi_curve, ols_slope, sample_entropy_m2)


def _sampen_naive(x, r):
    """SampEn via explicit template vectors."""
    n = len(x)
    def count(m):
        c = 0
        for i in range(n - m + 1):
            for j in range(i + 1, n - m + 1):
                if max(abs(x[i + k] - x[j + k]) for k in range(m)) <= r:
                    c += 1
        return c
    B, A = count(2), count(3)
    return B, A, (None if A == 0 or B == 0 else -math.log(A / B))


def test_sample_entropy_random():
    rng = np.random.RandomState(23)
    for _ in range(10):
        x = rng.randint(0, 40, size=rng.randint(10, 60)).tolist()
        r = int(rng.randint(0, 15))
        got = sample_entropy_m2(x, r)
        want = _sampen_naive(x, r)
        assert got[:2] == want[:2]
        if want[2] is None:
            assert got[2] is None
        else:
            assert abs(got[2] - want[2]) < 1e-12


def test_sample_entropy_limits():
    # constant series: every template matches -> A/B = (n-2 choose 2
    # over shifted windows) ratio -> sampen small and defined
    B, A, se = sample_entropy_m2([5] * 30, 0)
    assert B > A > 0 and se is not None and se > 0
    # huge tolerance -> same as constant case
    B2, A2, _ = sample_entropy_m2(list(range(30)), 10**9)
    assert (B2, A2) == (B, A)
    # zero tolerance on strictly increasing -> no matches
    assert sample_entropy_m2(list(range(30)), 0)[2] is None


# ---------------------------------------------------------------------------
# Higuchi curve
# ---------------------------------------------------------------------------


def test_higuchi_k1_is_total_variation():
    x = [3, 1, 4, 1, 5, 9, 2, 6]
    curve = dict(higuchi_curve(x, 1))
    tv = sum(abs(x[i + 1] - x[i]) for i in range(len(x) - 1))
    # k=1: single offset, cnt = n-1, L = tv*(n-1)/((n-1)*1) = tv
    assert abs(curve[1] - tv) < 1e-12


def test_higuchi_straight_line_fd_one():
    # linear ramp: L(k) constant -> slope 0 -> FD −(−1)? For a line,
    # L(k) ∝ k^{-1}·... textbook: FD of a straight line is 1.
    x = [7 * i for i in range(200)]
    curve = higuchi_curve(x, 4)
    us = [math.log(k) for k, _ in curve]
    vs = [math.log(l) for _, l in curve]
    fd = -ols_slope(us, vs)
    assert abs(fd - 1.0) < 0.02


def test_higuchi_white_noise_fd_two():
    rng = np.random.RandomState(4)
    x = rng.randint(0, 10**6, size=5000).tolist()
    curve = higuchi_curve(x, 4)
    fd = -ols_slope([math.log(k) for k, _ in curve],
                    [math.log(l) for _, l in curve])
    assert 1.85 < fd < 2.15


def test_ols_slope_exact():
    assert abs(ols_slope([1, 2, 3], [2, 4, 6]) - 2.0) < 1e-12
    assert ols_slope([1, 1, 1], [1, 2, 3]) is None


# ---------------------------------------------------------------------------
# Erlang C
# ---------------------------------------------------------------------------


def _erlang_c_naive(a, c):
    from math import factorial
    top = a**c / factorial(c) * (c / (c - a))
    s = sum(a**k / factorial(k) for k in range(c))
    return top / (s + top)


def test_erlang_c_matches_factorial_form():
    for a, c in [(0.5, 1), (2.0, 3), (4.7, 5), (9.3, 12), (15.0, 16)]:
        assert abs(erlang_c(a, c) - _erlang_c_naive(a, c)) < 1e-9


def test_erlang_c_monotone_in_agents():
    # more agents -> lower waiting probability
    a = 6.4
    ps = [erlang_c(a, c) for c in range(7, 13)]
    assert all(p1 > p2 for p1, p2 in zip(ps, ps[1:]))
    assert 0 < ps[-1] < ps[0] < 1


def test_erlang_c_heavy_load_limit():
    # a -> c from below: P(wait) -> 1
    assert erlang_c(4.999, 5) > 0.99


# ---------------------------------------------------------------------------
# matrix profile + RDD intercepts
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    matrix_profile_int, rdd_intercepts)


def _mp_naive(x, w, excl):
    n = len(x) - w + 1
    out = []
    for i in range(n):
        best = None
        for j in range(n):
            if abs(i - j) < excl:
                continue
            d = sum((x[i + k] - x[j + k]) ** 2 for k in range(w))
            if best is None or d < best[1]:
                best = (j, d)
        if best is not None:
            out.append((i + 1, best[0] + 1, best[1]))
    return out


def test_matrix_profile_matches_naive():
    rng = np.random.RandomState(31)
    for _ in range(8):
        x = rng.randint(0, 1000, size=rng.randint(15, 60)).tolist()
        assert matrix_profile_int(x, 5, 3) == _mp_naive(x, 5, 3)


def test_matrix_profile_planted_motif():
    rng = np.random.RandomState(8)
    x = rng.randint(0, 10**6, size=100).tolist()
    x[10:17] = [5, 9, 2, 6, 5, 3, 5]
    x[60:67] = [5, 9, 2, 6, 5, 3, 5]          # exact planted motif
    prof = {i: (j, d) for i, j, d in matrix_profile_int(x, 7, 4)}
    assert prof[11] == (61, 0) and prof[61] == (11, 0)


def test_matrix_profile_too_short():
    assert matrix_profile_int([1, 2, 3], 7, 4) == []
    # exclusion zone wider than profile -> every row filtered
    assert matrix_profile_int([1, 2, 3, 4, 5], 2, 10) == []


def test_rdd_intercepts_exact_line():
    # y = 3 + 2x exactly -> intercept 3
    xs = [-5, -3, -1, 2, 4]
    ys = [3 + 2 * x for x in xs]
    n, num, den = rdd_intercepts(xs, ys)
    assert n == 5 and den != 0 and abs(num / den - 3.0) < 1e-12


def test_rdd_intercepts_degenerate():
    # constant x -> singular design
    assert rdd_intercepts([2, 2, 2], [1, 2, 3])[2] == 0
    assert rdd_intercepts([], [])[2] == 0


# ---------------------------------------------------------------------------
# DFA, LZ76, Hoeffding's D
# ---------------------------------------------------------------------------

from fractions import Fraction

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    dfa_box_numerators, hoeffding_d_cells, lz76_phrases)


def _dfa_f2_naive(x, s):
    """F²(s) via plain float OLS detrending per box."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    prof = np.cumsum(x - x.mean())
    nb = n // s
    tot = 0.0
    j = np.arange(1, s + 1, dtype=np.float64)
    for b in range(nb):
        seg = prof[b * s:(b + 1) * s]
        A = np.vstack([j, np.ones(s)]).T
        coef, *_ = np.linalg.lstsq(A, seg, rcond=None)
        res = seg - A @ coef
        tot += float(res @ res)
    return tot / (nb * s)


def test_dfa_numerators_match_float_dfa():
    rng = np.random.RandomState(13)
    x = rng.randint(0, 10_000, size=257).tolist()
    n = len(x)
    for s, nb, num in dfa_box_numerators(x, (4, 8, 16)):
        rs = s * s * (s * s - 1) // 12
        f2 = num / (s * rs * nb * s) / (n * n)
        assert abs(f2 - _dfa_f2_naive(x, s)) < 1e-5 * max(f2, 1.0)


def test_dfa_white_noise_alpha_half():
    from log_analysis_ai_ray.pipelines.queries_ext3 import ols_slope
    rng = np.random.RandomState(21)
    x = rng.randint(0, 10**6, size=4000).tolist()
    n = len(x)
    pts = []
    for s, nb, num in dfa_box_numerators(x):
        rs = s * s * (s * s - 1) // 12
        f2 = num / (s * rs * nb * s) / (n * n)
        pts.append((math.log(s), math.log(f2) / 2))
    alpha = ols_slope([p[0] for p in pts], [p[1] for p in pts])
    assert 0.4 < alpha < 0.6          # iid -> alpha ~ 0.5


def test_dfa_random_walk_alpha_three_halves():
    from log_analysis_ai_ray.pipelines.queries_ext3 import ols_slope
    rng = np.random.RandomState(6)
    steps = rng.randint(-100, 101, size=4000)
    x = np.cumsum(steps).tolist()
    n = len(x)
    pts = []
    for s, nb, num in dfa_box_numerators(x):
        rs = s * s * (s * s - 1) // 12
        f2 = num / (s * rs * nb * s) / (n * n)
        pts.append((math.log(s), math.log(f2) / 2))
    alpha = ols_slope([p[0] for p in pts], [p[1] for p in pts])
    assert 1.3 < alpha < 1.7          # integrated iid -> alpha ~ 1.5


def _lz76_naive(bits, cap):
    s = "".join("1" if b else "0" for b in bits)
    pos, c = 0, 0
    while pos < len(s):
        l = 0
        while (l < cap and pos + l < len(s)
               and s[pos:pos + l + 1] in s[:pos + l]):
            l += 1
        pos += l + 1
        c += 1
    return c


def test_lz76_known_sequences():
    assert lz76_phrases([0] * 50) == 2         # '0' then all-rest
    assert lz76_phrases([0, 1] * 25) == 3      # '0','1','0101...'
    assert lz76_phrases([1]) == 1
    assert lz76_phrases([]) == 0


def test_lz76_matches_naive_random():
    rng = np.random.RandomState(19)
    for _ in range(20):
        bits = (rng.randint(0, 2, size=rng.randint(1, 400)) > 0).tolist()
        assert lz76_phrases(bits) == _lz76_naive(bits, 64)


def test_lz76_random_higher_than_periodic():
    rng = np.random.RandomState(3)
    rand = (rng.randint(0, 2, size=600) > 0).tolist()
    per = ([0, 0, 1] * 200)
    assert lz76_phrases(rand) > 3 * lz76_phrases(per)


def _hoeffding_naive(xs, ys):
    """Textbook Hoeffding's D with midranks via exact Fractions."""
    n = len(xs)
    H = Fraction(1, 2)
    Qr = Fraction(1, 4)
    D1 = D2 = D3 = Fraction(0)
    for i in range(n):
        R = 1 + sum(1 for j in range(n) if xs[j] < xs[i]) \
            + H * sum(1 for j in range(n) if j != i and xs[j] == xs[i])
        S = 1 + sum(1 for j in range(n) if ys[j] < ys[i]) \
            + H * sum(1 for j in range(n) if j != i and ys[j] == ys[i])
        Q = 1 + sum(1 for j in range(n)
                    if xs[j] < xs[i] and ys[j] < ys[i]) \
            + H * sum(1 for j in range(n)
                      if xs[j] == xs[i] and ys[j] < ys[i]) \
            + H * sum(1 for j in range(n)
                      if xs[j] < xs[i] and ys[j] == ys[i]) \
            + Qr * sum(1 for j in range(n) if j != i
                       and xs[j] == xs[i] and ys[j] == ys[i])
        D1 += (Q - 1) * (Q - 2)
        D2 += (R - 1) * (R - 2) * (S - 1) * (S - 2)
        D3 += (R - 2) * (S - 2) * (Q - 1)
    num = 30 * ((n - 2) * (n - 3) * D1 + D2 - 2 * (n - 2) * D3)
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return float(num / den)


def test_hoeffding_matches_fraction_naive():
    rng = np.random.RandomState(29)
    for _ in range(8):
        n = rng.randint(10, 40)
        xs = rng.randint(0, 5, size=n).tolist()
        ys = rng.randint(0, 4, size=n).tolist()
        cells = {}
        for x, y in zip(xs, ys):
            cells[(x, y)] = cells.get((x, y), 0) + 1
        _, _, _, _, D = hoeffding_d_cells(cells)
        assert abs(D - _hoeffding_naive(xs, ys)) < 1e-12


def test_hoeffding_limits():
    # perfect monotone dependence, no ties -> D = 1 exactly
    cells = {(i, i): 1 for i in range(30)}
    _, _, _, _, D = hoeffding_d_cells(cells)
    assert abs(D - 1.0) < 1e-12
    # independence (product grid): near 0 (finite-sample tie bias
    # pulls the statistic slightly negative, never toward +1)
    cells = {(x, y): 2 for x in range(4) for y in range(5)}
    _, _, _, _, D_ind = hoeffding_d_cells(cells)
    assert -0.05 < D_ind < 0.01
    # non-monotone (V shape) dependence still detected
    cells = {(x, abs(x - 5)): 3 for x in range(11)}
    _, _, _, _, D = hoeffding_d_cells(cells)
    assert D > 0.01
    # tiny n -> undefined
    assert hoeffding_d_cells({(0, 0): 4})[4] is None


# ---------------------------------------------------------------------------
# distance correlation, footprint, Allan variance
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    allan_numerators, dcov_terms, footprint_relations)


def _dcor_naive(x, y):
    """dCor via explicit double-centering (float)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    a = np.abs(x[:, None] - x[None, :])
    b = np.abs(y[:, None] - y[None, :])
    A = a - a.mean(0)[None, :] - a.mean(1)[:, None] + a.mean()
    B = b - b.mean(0)[None, :] - b.mean(1)[:, None] + b.mean()
    sab = (A * B).sum()
    saa = (A * A).sum()
    sbb = (B * B).sum()
    return sab / math.sqrt(saa * sbb)


def test_dcov_terms_match_double_centering():
    rng = np.random.RandomState(41)
    for _ in range(10):
        n = rng.randint(10, 80)
        x = rng.randint(0, 500, size=n).tolist()
        y = rng.randint(0, 300, size=n).tolist()
        X_ab, X_aa, X_bb = dcov_terms(x, y)
        got = X_ab / math.sqrt(X_aa * X_bb)
        assert abs(got - _dcor_naive(x, y)) < 1e-9


def test_dcor_detects_nonmonotone():
    # y = |x - 50|: Pearson ~ 0, dCor clearly > 0
    x = list(range(101))
    y = [abs(v - 50) for v in x]
    X_ab, X_aa, X_bb = dcov_terms(x, y)
    dcor_sq = X_ab / math.sqrt(X_aa * X_bb)
    assert dcor_sq > 0.2          # dCor ~ 0.5 for the V shape
    # perfect linear -> dCor = 1
    X_ab, X_aa, X_bb = dcov_terms(x, [3 * v + 7 for v in x])
    assert abs(X_ab / math.sqrt(X_aa * X_bb) - 1.0) < 1e-12


def test_footprint_relations():
    dfc = {("a", "b"): 5, ("b", "c"): 2, ("c", "b"): 9, ("d", "d"): 1}
    rels = dict(((a, b), r) for a, b, r in footprint_relations(dfc))
    assert rels[("a", "b")] == "->"
    assert rels[("b", "c")] == "||"          # both directions
    assert rels[("a", "c")] == "#"           # never adjacent
    assert rels[("d", "d")] == "||"          # self loop
    assert rels[("a", "a")] == "#"
    # reverse-only pair reads '<-'
    rels2 = dict(((a, b), r) for a, b, r
                 in footprint_relations({("b", "a"): 3}))
    assert rels2[("a", "b")] == "<-"


def test_allan_numerators():
    # white noise: AVAR(tau) ~ var/tau (slope -1)
    rng = np.random.RandomState(14)
    x = rng.randint(0, 1000, size=4096).tolist()
    rows = {m: num / (2.0 * (nb - 1) * m * m)
            for m, nb, num in allan_numerators(x)}
    assert rows[1] > 2 * rows[4] > 0        # decreasing in tau
    # exact small case by hand: x = [1,2,3,4], m=2 -> sums [3,7],
    # num = 16, AVAR = 16/(2*1*4) = 2
    rows = allan_numerators([1, 2, 3, 4], (2,))
    assert rows == [(2, 2, 16)]
    # linear drift: adjacent bin means differ by m -> AVAR = m²·.../
    x = list(range(256))
    out = dict((m, num / (2.0 * (nb - 1) * m * m))
               for m, nb, num in allan_numerators(x))
    # bin-mean diffs equal m exactly -> AVAR = m²/2
    for m in (1, 2, 4, 8):
        assert abs(out[m] - m * m / 2.0) < 1e-9


# ---------------------------------------------------------------------------
# half-sample mode
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    half_sample_mode)


def test_hsm_finds_planted_mode():
    rng = np.random.RandomState(44)
    # dense cluster at 500 +- 5, uniform noise elsewhere
    data = rng.randint(0, 10_000, size=300).tolist() \
        + rng.randint(495, 506, size=300).tolist()
    mode, rounds = half_sample_mode(data)
    assert 490 <= mode <= 510
    assert rounds > 0


def test_hsm_outlier_immune():
    data = [10, 11, 12, 13, 14] * 20 + [10**9] * 5
    mode, _ = half_sample_mode(data)
    assert 10 <= mode <= 14


def test_hsm_small_inputs():
    assert half_sample_mode([7]) == (7, 0)
    assert half_sample_mode([3, 9]) == (6, 0)       # floor average
    assert half_sample_mode([]) == (None, 0)
    # three equal values terminate in one round
    mode, rounds = half_sample_mode([5, 5, 5])
    assert mode == 5 and rounds == 1


# ---------------------------------------------------------------------------
# CCA closed form + ridge determinant
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    cca_rho_2x2, det3)


def _cca_naive(X, Y):
    """First canonical correlation via numpy eig on centered data."""
    X = X - X.mean(0)
    Y = Y - Y.mean(0)
    sxx = X.T @ X
    syy = Y.T @ Y
    sxy = X.T @ Y
    M = np.linalg.inv(sxx) @ sxy @ np.linalg.inv(syy) @ sxy.T
    ev = np.sort(np.linalg.eigvals(M).real)[::-1]
    return math.sqrt(max(ev[0], 0)), math.sqrt(max(ev[1], 0))


def test_cca_matches_numpy_eig():
    rng = np.random.RandomState(51)
    for _ in range(8):
        n = rng.randint(20, 100)
        X = rng.randint(0, 50, size=(n, 2))
        Y = rng.randint(0, 50, size=(n, 2))
        # n-scaled integer moments, as the query builds them
        def cm(a, b):
            return int(n) * int(a @ b) - int(a.sum()) * int(b.sum())
        sxx = [[cm(X[:, 0], X[:, 0]), cm(X[:, 0], X[:, 1])],
               [cm(X[:, 1], X[:, 0]), cm(X[:, 1], X[:, 1])]]
        sxy = [[cm(X[:, 0], Y[:, 0]), cm(X[:, 0], Y[:, 1])],
               [cm(X[:, 1], Y[:, 0]), cm(X[:, 1], Y[:, 1])]]
        syy = [[cm(Y[:, 0], Y[:, 0]), cm(Y[:, 0], Y[:, 1])],
               [cm(Y[:, 1], Y[:, 0]), cm(Y[:, 1], Y[:, 1])]]
        r1, r2 = cca_rho_2x2(sxx, sxy, syy)
        w1, w2 = _cca_naive(X.astype(float), Y.astype(float))
        assert abs(r1 - w1) < 1e-6 and abs(r2 - w2) < 1e-6
        assert 0 <= r2 <= r1 <= 1 + 1e-9


def test_cca_perfect_alignment():
    # y1 = x1 exactly -> rho1 = 1
    rng = np.random.RandomState(7)
    n = 60
    X = rng.randint(0, 100, size=(n, 2))
    Y = np.column_stack([X[:, 0], rng.randint(0, 100, size=n)])
    def cm(a, b):
        return int(n) * int(a @ b) - int(a.sum()) * int(b.sum())
    sxx = [[cm(X[:, 0], X[:, 0]), cm(X[:, 0], X[:, 1])],
           [cm(X[:, 1], X[:, 0]), cm(X[:, 1], X[:, 1])]]
    sxy = [[cm(X[:, 0], Y[:, 0]), cm(X[:, 0], Y[:, 1])],
           [cm(X[:, 1], Y[:, 0]), cm(X[:, 1], Y[:, 1])]]
    syy = [[cm(Y[:, 0], Y[:, 0]), cm(Y[:, 0], Y[:, 1])],
           [cm(Y[:, 1], Y[:, 0]), cm(Y[:, 1], Y[:, 1])]]
    r1, _ = cca_rho_2x2(sxx, sxy, syy)
    assert abs(r1 - 1.0) < 1e-9
    # singular block -> None
    z = [[0, 0], [0, 0]]
    assert cca_rho_2x2(z, sxy, syy) == (None, None)


def test_det3_known():
    assert det3([[1, 0, 0], [0, 1, 0], [0, 0, 1]]) == 1
    assert det3([[2, 0, 0], [0, 3, 0], [0, 0, 4]]) == 24
    m = [[1, 2, 3], [4, 5, 6], [7, 8, 10]]
    assert det3(m) == round(np.linalg.det(np.array(m, dtype=float)))
    # singular
    assert det3([[1, 2, 3], [2, 4, 6], [5, 1, 2]]) == 0


# ---------------------------------------------------------------------------
# Kruskal forest vs threshold-component identity
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import kruskal_forest


def _mst_threshold_identity(n, edges):
    """MST weight via Σ_t (c_t − c_∞) over integer thresholds —
    the identity the SQL oracle uses."""
    def comps(maxw):
        parent = list(range(n))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for w, a, b in edges:
            if w <= maxw:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        return len({find(v) for v in range(n)})
    if not edges:
        return 0
    wmax = max(w for w, _, _ in edges)
    cinf = comps(wmax)
    return sum(comps(t) - cinf for t in range(0, wmax))


def test_kruskal_matches_identity_random():
    rng = np.random.RandomState(61)
    for _ in range(10):
        n = rng.randint(4, 15)
        m = rng.randint(3, n * (n - 1) // 2 + 1)
        seen = set()
        edges = []
        while len(edges) < m:
            a, b = rng.randint(0, n, size=2)
            if a == b or (min(a, b), max(a, b)) in seen:
                continue
            seen.add((min(a, b), max(a, b)))
            edges.append((int(rng.randint(1, 20)), int(min(a, b)),
                          int(max(a, b))))
        _, _, total = kruskal_forest(n, edges)
        assert total == _mst_threshold_identity(n, edges)


def test_kruskal_known_graph():
    # triangle 1-2-3 with weights 1,2,3 -> MST = 1+2
    edges = [(1, 0, 1), (2, 1, 2), (3, 0, 2)]
    comp, used, total = kruskal_forest(3, edges)
    assert (comp, used, total) == (1, 2, 3)
    # two disconnected pairs -> forest
    edges = [(5, 0, 1), (7, 2, 3)]
    comp, used, total = kruskal_forest(4, edges)
    assert (comp, used, total) == (2, 2, 12)
    assert kruskal_forest(3, []) == (3, 0, 0)


# ---------------------------------------------------------------------------
# median polish
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import median_polish


def test_median_polish_exact_additive():
    # purely additive matrix -> residuals vanish after one sweep
    r = [10, 20, 30]
    c = [1, 2, 3, 4]
    grid = [[ri + cj for cj in c] for ri in r]
    re_, ce, resid = median_polish(grid)
    assert resid == 0
    # effects recover the additive structure up to a constant shift
    assert re_[1] - re_[0] == 10 and re_[2] - re_[0] == 20
    assert ce[1] - ce[0] == 1 and ce[3] - ce[0] == 3


def test_median_polish_outlier_robust():
    r = [0, 0, 0]
    c = [5, 5, 5, 5]
    grid = [[ri + cj for cj in c] for ri in r]
    grid[1][2] += 10**6          # one corrupted cell
    re_, ce, resid = median_polish(grid)
    # effects unmoved by the outlier; the residual carries it
    assert max(re_) - min(re_) == 0
    assert max(ce) - min(ce) == 0
    assert resid == 10**6


def test_median_polish_reduces_l1():
    rng = np.random.RandomState(71)
    grid = rng.randint(0, 100, size=(7, 24)).tolist()
    _, _, r1 = median_polish(grid, sweeps=1)
    _, _, r2 = median_polish(grid, sweeps=2)
    base = sum(abs(x) for row in grid for x in row)
    assert r2 <= r1 <= base


# ---------------------------------------------------------------------------
# small-world stats
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import smallworld_stats


def test_smallworld_complete_graph():
    # K5: C = 1, L = 1
    lo, hi = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            lo.append(i)
            hi.append(j)
    C, L, tri3, wedges, sd, np_ = smallworld_stats(
        5, np.array(lo), np.array(hi))
    assert C == 1.0 and L == 1.0
    assert tri3 == 3 * 10 and wedges == 30   # C(5,3)=10 triangles
    assert np_ == 20                          # ordered pairs


def test_smallworld_path_graph():
    # path 0-1-2-3: no triangles, L = mean of all pair hops
    lo = np.array([0, 1, 2])
    hi = np.array([1, 2, 3])
    C, L, tri3, wedges, sd, np_ = smallworld_stats(4, lo, hi)
    assert tri3 == 0 and C == 0.0
    # distances: 1+2+3 + 1+2 + 1 = 10 each direction
    assert sd == 20 and np_ == 12 and abs(L - 20 / 12) < 1e-12


def test_smallworld_hop_cap():
    # long path with cap 2: far pairs unreached
    n = 8
    lo = np.arange(n - 1)
    hi = np.arange(1, n)
    _, L, _, _, sd, np_ = smallworld_stats(n, lo, hi, max_hops=2)
    # pairs at distance 1 (7 each way) and 2 (6 each way)
    assert np_ == 2 * (7 + 6) and sd == 2 * (7 + 12)


# ---------------------------------------------------------------------------
# Pettitt, Siegel, IPF
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    ipf_rake, pettitt_u, siegel_slope)


def _pettitt_naive(x):
    n = len(x)
    best_t, best_k = None, -1
    for t in range(1, n):
        u = sum(np.sign(xj - xi) for xi in x[:t] for xj in x[t:])
        if abs(u) > best_k:
            best_t, best_k = t, abs(int(u))
    return best_t, best_k


def test_pettitt_matches_naive():
    rng = np.random.RandomState(81)
    for _ in range(6):
        x = rng.randint(0, 50, size=rng.randint(10, 60)).tolist()
        t, k, _ = pettitt_u(x)
        tn, kn = _pettitt_naive(x)
        assert k == kn
        # argmax position may tie; ours picks the smallest
        assert abs(sum(np.sign(xj - xi) for xi in x[:t]
                       for xj in x[t:])) == kn


def test_pettitt_planted_shift():
    x = [10] * 50 + [100] * 50
    t, k, _ = pettitt_u(x)
    assert t == 50 and k == 50 * 50


def test_siegel_exact_line_with_outliers():
    xs = list(range(40))
    ys = [7 + 3 * x for x in xs]
    # corrupt almost half the points — repeated median survives
    for i in range(0, 40, 3):
        ys[i] += 10**6
    slope, inter = siegel_slope(xs, ys)
    assert abs(slope - 3.0) < 1e-9
    assert abs(inter - 7.0) < 1e-6


def test_ipf_converges_to_margins():
    rng = np.random.RandomState(91)
    seed = rng.randint(1, 20, size=(4, 5)).tolist()
    rt = [100, 50, 80, 70]
    ct = [60, 60, 60, 60, 60]
    fitted, misfit = ipf_rake(seed, rt, ct, sweeps=20)
    assert misfit < 1e-6
    for i, t in enumerate(rt):
        assert abs(sum(fitted[i]) - t) < 1e-6


def test_ipf_preserves_zero_cells():
    seed = [[0, 5], [5, 5]]
    fitted, _ = ipf_rake(seed, [10, 10], [8, 12], sweeps=10)
    assert fitted[0][0] == 0.0


# ---------------------------------------------------------------------------
# DBSCAN + k-medoids
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    dbscan_labels, kmedoids_build)


def test_dbscan_two_blobs_and_noise():
    pts = {}
    i = 0
    for dx in range(5):
        for dy in range(5):
            pts[i] = (dx, dy)
            i += 1
            pts[i] = (100 + dx, 100 + dy)
            i += 1
    pts[999] = (50, 50)           # isolated noise
    labels = dbscan_labels(pts, eps_sq=8, min_pts=4)
    labs = {v for v in labels.values() if v is not None}
    assert len(labs) == 2
    assert labels[999] is None
    # blob members share one label each
    blob1 = {labels[k] for k, v in pts.items()
             if v[0] < 50 and k != 999}
    assert len(blob1) == 1


def test_dbscan_min_pts_gate():
    # 3 mutually-close points with min_pts=5 -> all noise
    pts = {0: (0, 0), 1: (1, 0), 2: (0, 1)}
    labels = dbscan_labels(pts, eps_sq=4, min_pts=5)
    assert all(v is None for v in labels.values())


def test_kmedoids_build_three_blobs():
    pts = {}
    i = 0
    for cx, cy in [(0, 0), (100, 0), (0, 100)]:
        for d in range(7):
            pts[i] = (cx + d % 3, cy + d // 3)
            i += 1
    rows = kmedoids_build(pts, k=3)
    meds = [pts[m] for _, m, _ in rows]
    # one medoid lands in each blob
    quads = {(x > 50, y > 50) for x, y in meds}
    assert len(quads) == 3
    # cost strictly decreases as medoids are added
    costs = [c for _, _, c in rows]
    assert costs[0] > costs[1] > costs[2]


# ---------------------------------------------------------------------------
# Jaro-Winkler, HMM forward, hypergeometric
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    hmm_forward, hypergeom_sf, jaro_winkler)


def test_jaro_winkler_pins_duckdb_builtin():
    import random

    import duckdb
    con = duckdb.connect()
    random.seed(13)
    for _ in range(1500):
        a = ''.join(random.choices('abcdef', k=random.randint(0, 12)))
        b = ''.join(random.choices('abcdef', k=random.randint(0, 12)))
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-9, (a, b)


def test_jaro_winkler_known_values():
    assert jaro_winkler("", "") == 0.0          # DuckDB convention
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "") == 0.0
    # textbook MARTHA/MARHTA = 0.961
    assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.9611111111) < 1e-9


def test_hmm_forward_sanity():
    # all-zeros sequence is likelier under the 0-favoring start state
    n0, ll0 = hmm_forward([0] * 200)
    n1, ll1 = hmm_forward([1] * 200)
    assert n0 == n1 == 200
    # both are log-probs (negative), alternating is least likely
    _, lla = hmm_forward([0, 1] * 100)
    assert ll0 < 0 and lla < max(ll0, ll1)
    assert hmm_forward([]) == (0, None)


def test_hmm_forward_matches_matrix_product():
    # brute-force forward via explicit matrix recursion (unscaled)
    rng = np.random.RandomState(3)
    obs = (rng.randint(0, 2, size=12)).tolist()
    T = np.array([[0.8, 0.2], [0.3, 0.7]])
    E = np.array([[0.9, 0.1], [0.2, 0.8]])
    a = np.array([0.5, 0.5]) * E[:, obs[0]]
    for o in obs[1:]:
        a = (a @ T) * E[:, o]
    _, ll = hmm_forward(obs)
    assert abs(ll - math.log(a.sum())) < 1e-9


def test_hypergeom_sf():
    # P(X >= 0) == 1 always
    assert abs(hypergeom_sf(0, 20, 5, 10) - 1.0) < 1e-12
    # urn with all successes -> X = n surely
    assert abs(hypergeom_sf(3, 10, 10, 3) - 1.0) < 1e-12
    # symmetric small case, exact by enumeration:
    # N=6, K=3, n=3: P(X>=2) = (C(3,2)C(3,1)+C(3,3))/C(6,3) = 10/20
    assert abs(hypergeom_sf(2, 6, 3, 3) - 0.5) < 1e-12


# ---------------------------------------------------------------------------
# bow-tie decomposition
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import bowtie_sizes


def test_bowtie_textbook_shape():
    # 0->1->2 form a 3-cycle CORE; 3 -> core (IN); core -> 4 (OUT);
    # 5 isolated (OTHER); 6 -> 5 tendril (OTHER)
    src = np.array([0, 1, 2, 3, 2, 6])
    dst = np.array([1, 2, 0, 0, 4, 5])
    core, in_, out, other = bowtie_sizes(7, src, dst)
    assert (core, in_, out, other) == (3, 1, 1, 2)


def test_bowtie_all_one_scc():
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    assert bowtie_sizes(4, src, dst) == (4, 0, 0, 0)


def test_bowtie_pure_chain():
    # 0->1->2->3: every SCC is a singleton; largest tie -> node 0's
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    core, in_, out, other = bowtie_sizes(4, src, dst)
    assert core == 1 and in_ == 0 and out == 3 and other == 0


# ---------------------------------------------------------------------------
# RQA + CRPS
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    crps_window_terms, rqa_counts)


def test_rqa_constant_series_fully_recurrent():
    n = 20
    nr, nd, nv = rqa_counts([5] * n, 0)
    assert nr == n * (n - 1) // 2
    assert nd == (n - 1) * (n - 2) // 2       # all diagonal pairs
    # DET2 and LAM2 both 1 in the constant limit as n grows


def test_rqa_monotone_no_recurrence():
    nr, nd, nv = rqa_counts(list(range(0, 1000, 10)), 5)
    assert (nr, nd, nv) == (0, 0, 0)


def test_rqa_periodic_diagonals():
    # strict period-3 signal, eps=0: recurrences on lag-3k diagonals
    x = [1, 9, 5] * 10
    nr, nd, nv = rqa_counts(x, 0)
    assert nr > 0
    assert nd / nr > 0.8          # deterministic structure
    assert nv == 0                # never two equal in a row


def test_crps_window_terms_matches_naive():
    rng = np.random.RandomState(33)
    x = rng.randint(0, 100, size=60).tolist()
    w = 10
    cnt, t1, t2 = crps_window_terms(x, w)
    assert cnt == 50
    # naive CRPS for one day
    t = 25
    win = x[t - w:t]
    c1 = sum(abs(v - x[t]) for v in win)
    c2 = sum(abs(a - b) for a in win for b in win)
    # spot-check the aggregates contain this day's terms
    assert t1 >= c1 and t2 >= c2
    # perfect constant forecast and outcome -> CRPS 0
    cnt0, a, b = crps_window_terms([7] * 40, w)
    assert a == 0 and b == 0


# ---------------------------------------------------------------------------
# MMD + Youden
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import (  # noqa: E402
    mmd2_poly2, youden_best)


def _mmd2_naive(xs, ys):
    def k(a, b):
        return (1.0 + a * b) ** 2
    exx = sum(k(a, b) for a in xs for b in xs) / len(xs) ** 2
    eyy = sum(k(a, b) for a in ys for b in ys) / len(ys) ** 2
    exy = sum(k(a, b) for a in xs for b in ys) / (len(xs) * len(ys))
    return exx + eyy - 2 * exy


def test_mmd2_matches_naive():
    rng = np.random.RandomState(22)
    for _ in range(8):
        xs = rng.randint(0, 10, size=rng.randint(5, 30)).tolist()
        ys = rng.randint(0, 10, size=rng.randint(5, 30)).tolist()
        got = mmd2_poly2(len(xs), sum(xs), sum(v * v for v in xs),
                         len(ys), sum(ys), sum(v * v for v in ys))
        assert abs(got - _mmd2_naive(xs, ys)) < 1e-9


def test_mmd2_identical_zero_and_shift_positive():
    xs = [1, 2, 3, 4] * 5
    got = mmd2_poly2(len(xs), sum(xs), sum(v * v for v in xs),
                     len(xs), sum(xs), sum(v * v for v in xs))
    assert abs(got) < 1e-12
    ys = [v + 5 for v in xs]
    got = mmd2_poly2(len(xs), sum(xs), sum(v * v for v in xs),
                     len(ys), sum(ys), sum(v * v for v in ys))
    assert got > 1.0
    # same mean, different variance is still detected
    zs = [0, 5] * 10          # mean 2.5 like ws below
    ws = [2, 3] * 10
    g2 = mmd2_poly2(len(zs), sum(zs), sum(v * v for v in zs),
                    len(ws), sum(ws), sum(v * v for v in ws))
    assert g2 > 0.5


def test_youden_perfect_separation():
    pos = {10: 5, 12: 3}
    neg = {1: 4, 2: 6}
    t, j, tpr, fpr = youden_best(pos, neg)
    assert j == 1.0 and tpr == 1.0 and fpr == 0.0
    assert 2 <= t < 10
    # ties -> smallest threshold wins
    t2, j2, _, _ = youden_best({5: 1}, {5: 1})
    assert j2 == 0.0


# ---------------------------------------------------------------------------
# normal-CDF approximation
# ---------------------------------------------------------------------------

from log_analysis_ai_ray.pipelines.queries_ext3 import phi_as


def test_phi_as_accuracy():
    for z in np.linspace(-5, 5, 101):
        exact = 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
        assert abs(phi_as(float(z)) - exact) < 1.6e-7
    assert abs(phi_as(0.0) - 0.5) < 1e-9   # A&S residual at 0
    assert phi_as(10.0) > 0.999999
    assert phi_as(-10.0) < 1e-6
