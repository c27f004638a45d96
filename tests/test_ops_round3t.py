"""Brute-force verification of the round-3t driver closures: the
Conover squared-ranks scale test, the BWS weighted rank-ECDF test,
Wald-Wolfowitz two-sample runs, OLS influence diagnostics (leverage /
Cook's D / PRESS), and the Shapiro-Francia normal-scores correlation —
each checked against naive transcriptions or numpy linear algebra on
constructed + randomized inputs."""

import math
import random

import numpy as np

from log_analysis_ai_ray.pipelines.queries_ext5 import inv_phi_upper
from log_analysis_ai_ray.pipelines.queries_ext6 import (
    bws_from_ranks, conover_squared_ranks, cooks_diag, shapiro_francia,
    ww_runs)

# ---------------------------------------------------------------------------
# conover_squared_ranks
# ---------------------------------------------------------------------------


def _conover_naive(groups):
    """Direct textbook transcription on raw per-group absolute
    deviations (midranks via sorting, float arithmetic)."""
    pooled = sorted((d, g, i) for g, ds in enumerate(groups)
                    for i, d in enumerate(ds))
    n = len(pooled)
    # midranks over value ties
    ranks = {}
    j = 0
    pos = 0
    from collections import defaultdict
    by_val = defaultdict(list)
    for d, g, i in pooled:
        by_val[d].append((g, i))
    r = {}
    cum = 0
    for d in sorted(by_val):
        t = len(by_val[d])
        mid = cum + (t + 1) / 2.0
        for key in by_val[d]:
            r[(d, key[0], key[1])] = mid
        cum += t
    s_all = sum(rv ** 2 for rv in r.values())
    s4_all = sum(rv ** 4 for rv in r.values())
    sbar = s_all / n
    d2 = (s4_all - n * sbar * sbar) / (n - 1.0)
    t_num = sum(
        (sum(r[(d, gi, i)] ** 2 for i, d in enumerate(ds))) ** 2
        / len(ds)
        for gi, ds in enumerate(groups)) - n * sbar * sbar
    return t_num / d2


def test_conover_matches_naive_transcription():
    rng = random.Random(7)
    groups = [[rng.randrange(0, 30) for _ in range(20)]
              for _ in range(3)]
    cells = [(g, d, 1) for g, ds in enumerate(groups) for d in ds]
    t, k, n = conover_squared_ranks(cells)
    assert k == 3 and n == 60
    assert math.isclose(t, _conover_naive(groups), rel_tol=1e-9)


def test_conover_detects_planted_scale_difference():
    # group 0 tight around its median, group 1 wildly dispersed
    tight = [(0, d, 5) for d in (0, 1, 2)]
    wide = [(1, d, 5) for d in (0, 50, 100)]
    t_diff, _, _ = conover_squared_ranks(tight + wide)
    same = [(0, d, 5) for d in (0, 1, 2)] + \
        [(1, d, 5) for d in (0, 1, 2)]
    t_same, _, _ = conover_squared_ranks(same)
    assert t_diff > t_same
    assert t_same < 1e-9  # identical deviation histograms -> T = 0


def test_conover_cell_multiplicity_equals_expansion():
    # (g, d, c) cells must equal c copies of (g, d, 1)
    cells_packed = [(0, 3, 4), (0, 7, 2), (1, 3, 1), (1, 9, 5)]
    cells_flat = [(g, d, 1) for g, d, c in cells_packed
                  for _ in range(c)]
    tp, _, np_ = conover_squared_ranks(cells_packed)
    tf, _, nf = conover_squared_ranks(cells_flat)
    assert np_ == nf == 12
    assert math.isclose(tp, tf, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# bws_from_ranks
# ---------------------------------------------------------------------------


def _bws_naive(x, y):
    """BWS from raw samples (no ties), per Baumgartner et al. 1998."""
    pooled = sorted((v, 0, i) for i, v in enumerate(x))
    pooled += [(v, 1, i) for i, v in enumerate(y)]
    pooled.sort()
    rx = [k + 1 for k, (v, s, i) in enumerate(pooled) if s == 0]
    ry = [k + 1 for k, (v, s, i) in enumerate(pooled) if s == 1]
    n, m = len(rx), len(ry)

    def half(r, n, m):
        nn = n + m
        return sum(
            (r[i - 1] - nn / n * i) ** 2
            / ((i / (n + 1.0)) * (1 - i / (n + 1.0)) * m * nn / n)
            for i in range(1, n + 1)) / n

    return (half(rx, n, m) + half(ry, m, n)) / 2.0


def test_bws_matches_naive_on_random_samples():
    rng = random.Random(11)
    x = rng.sample(range(1000), 15)
    y = rng.sample(range(1000, 2000), 20)
    pooled = sorted([(v, 0) for v in x] + [(v, 1) for v in y])
    rx = [k + 1 for k, (v, s) in enumerate(pooled) if s == 0]
    ry = [k + 1 for k, (v, s) in enumerate(pooled) if s == 1]
    _, _, b = bws_from_ranks(rx, ry)
    assert math.isclose(b, _bws_naive(x, y), rel_tol=1e-12)


def test_bws_shift_raises_statistic():
    rng = random.Random(3)
    base = [rng.randrange(0, 10_000) for _ in range(40)]
    same = [v + 1 for v in base]          # interleaved, no shift
    far = [v + 1_000_000 for v in base]   # complete separation

    def b_of(x, y):
        pooled = sorted([(v, 0) for v in x] + [(v, 1) for v in y])
        rx = [k + 1 for k, (v, s) in enumerate(pooled) if s == 0]
        ry = [k + 1 for k, (v, s) in enumerate(pooled) if s == 1]
        return bws_from_ranks(rx, ry)[2]

    assert b_of(base, far) > 10 * b_of(base, same)


# ---------------------------------------------------------------------------
# ww_runs
# ---------------------------------------------------------------------------


def test_ww_runs_handcrafted():
    assert ww_runs([0, 1, 0, 1, 0, 1]) == 6       # perfect alternation
    assert ww_runs([0, 0, 0, 1, 1, 1]) == 2       # complete separation
    assert ww_runs([1]) == 1
    assert ww_runs([]) == 0
    assert ww_runs([0, 0, 1, 0, 0]) == 3


def test_ww_runs_mean_under_null_permutations():
    # E[R] = 2 n1 n2 / N + 1 over all orderings (exhaustive, n=8)
    from itertools import permutations
    labels = [0, 0, 0, 0, 1, 1, 1, 1]
    seen = set(permutations(labels))
    mean = sum(ww_runs(list(p)) for p in seen) / len(seen)
    n1 = n2 = 4
    assert math.isclose(mean, 2.0 * n1 * n2 / 8 + 1.0, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# cooks_diag
# ---------------------------------------------------------------------------


def test_cooks_matches_hat_matrix_algebra():
    rng = np.random.RandomState(5)
    xs = list(range(30))
    ys = [int(3 * x + 100 + rng.randint(-20, 20)) for x in xs]
    d = cooks_diag(xs, ys)
    X = np.column_stack([np.ones(30), np.asarray(xs, float)])
    yv = np.asarray(ys, float)
    H = X @ np.linalg.inv(X.T @ X) @ X.T
    e = yv - H @ yv
    h = np.diag(H)
    s2 = float(e @ e) / (30 - 2)
    cd = e ** 2 * h / (2 * s2 * (1 - h) ** 2)
    press = float(np.sum((e / (1 - h)) ** 2))
    assert math.isclose(d["sse"], float(e @ e), rel_tol=1e-9)
    assert math.isclose(d["press"], press, rel_tol=1e-9)
    assert d["top_i"] == int(np.argmax(cd))
    assert math.isclose(d["top_d"], float(cd.max()), rel_tol=1e-9)
    assert d["n_influential"] == int(np.sum(cd > 4.0 / 30))


def test_cooks_planted_outlier_dominates():
    xs = list(range(20))
    ys = [10 * x for x in xs]
    ys[19] += 5000       # gross outlier at max leverage
    d = cooks_diag(xs, ys)
    assert d["top_i"] == 19
    assert d["top_d"] > 1.0
    # endpoint leverage is the maximum of the design
    assert d["top_h"] > 1.0 / 20


def test_cooks_leverage_sums_to_p():
    xs = [1, 2, 4, 8, 16, 32]
    ys = [5, 9, 2, 7, 1, 8]
    n = len(xs)
    sx = sum(xs)
    dxx = n * sum(x * x for x in xs) - sx * sx
    hs = [1.0 / n + (n * x - sx) ** 2 / (n * float(dxx)) for x in xs]
    assert math.isclose(sum(hs), 2.0, rel_tol=1e-12)  # trace(H) = p


# ---------------------------------------------------------------------------
# shapiro_francia
# ---------------------------------------------------------------------------


def test_shapiro_francia_near_one_for_normal_scores_sample():
    # a sample that IS the Blom score sequence correlates perfectly
    n = 60
    xs = []
    for i in range(1, n + 1):
        u = (i - 0.375) / (n + 0.25)
        m = inv_phi_upper(u) if u >= 0.5 else -inv_phi_upper(1 - u)
        xs.append(int(round(1_000_000 * m)) + 5_000_000)
    _, w = shapiro_francia(xs)
    assert w > 0.999999


def test_shapiro_francia_detects_heavy_skew():
    # exponential-ish (squared uniform grid) is visibly non-normal
    xs = [i * i for i in range(1, 80)]
    _, w_skew = shapiro_francia(xs)
    xs_lin = list(range(1, 80))          # uniform: closer to normal
    _, w_lin = shapiro_francia(xs_lin)
    assert w_skew < w_lin < 1.0


def test_shapiro_francia_location_scale_invariant():
    rng = random.Random(9)
    xs = [rng.randrange(0, 10_000) for _ in range(50)]
    _, w1 = shapiro_francia(xs)
    _, w2 = shapiro_francia([7 * x + 123_456 for x in xs])
    assert math.isclose(w1, w2, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# breslow_day
# ---------------------------------------------------------------------------


def test_breslow_day_identical_strata_is_null():
    from log_analysis_ai_ray.pipelines.queries_ext6 import breslow_day

    cells = [(30, 70, 20, 80)] * 5       # same 2x2 everywhere
    x2, x2t, k, psi = breslow_day(cells)
    assert k == 5
    # pooled OR equals the common stratum OR
    assert math.isclose(psi, (30 * 80) / (70 * 20), rel_tol=1e-12)
    assert abs(x2) < 1e-9 and abs(x2t) < 1e-9


def test_breslow_day_detects_heterogeneous_or():
    from log_analysis_ai_ray.pipelines.queries_ext6 import breslow_day

    hetero = [(80, 20, 20, 80), (20, 80, 80, 20), (50, 50, 50, 50)]
    x2, x2t, k, _ = breslow_day(hetero)
    assert k == 3
    assert x2 > 20.0 and x2t > 20.0
    assert x2t <= x2 + 1e-12             # Tarone never increases X2


def test_breslow_day_fitted_cells_satisfy_pooled_or():
    from log_analysis_ai_ray.pipelines.queries_ext6 import breslow_day

    cells = [(25, 75, 40, 60), (60, 40, 30, 70)]
    x2, x2t, k, psi = breslow_day(cells)
    # re-derive a_hat for stratum 0 and check OR(fitted) == psi
    a, b, c, d = cells[0]
    r1, r0, c1 = a + b, c + d, a + c
    qa, qb, qc = psi - 1.0, psi * (r1 + c1) + (r0 - c1), psi * r1 * c1
    disc = math.sqrt(qb * qb - 4 * qa * qc)
    ah = (qb - disc) / (2 * qa)
    if not (0 < ah < min(r1, c1) and r0 - c1 + ah > 0):
        ah = (qb + disc) / (2 * qa)
    fitted_or = (ah * (r0 - c1 + ah)) / ((r1 - ah) * (c1 - ah))
    assert math.isclose(fitted_or, psi, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# stuart_maxwell
# ---------------------------------------------------------------------------


def test_stuart_maxwell_symmetric_table_is_zero():
    from log_analysis_ai_ray.pipelines.queries_ext6 import stuart_maxwell

    cells = {}
    rng = random.Random(2)
    for i in range(4):
        for j in range(4):
            v = rng.randrange(5, 50)
            cells[(i, j)] = cells.get((i, j), 0) + v
            cells[(j, i)] = cells.get((j, i), 0) + v
    chi2, det = stuart_maxwell(cells)
    assert det != 0
    assert abs(chi2) < 1e-9              # equal margins by symmetry


def test_stuart_maxwell_matches_numpy_solve():
    from log_analysis_ai_ray.pipelines.queries_ext6 import stuart_maxwell

    rng = random.Random(4)
    cells = {(i, j): rng.randrange(1, 100)
             for i in range(4) for j in range(4)}
    chi2, det = stuart_maxwell(cells)
    r = [sum(cells[(i, j)] for j in range(4)) for i in range(4)]
    c = [sum(cells[(j, i)] for j in range(4)) for i in range(4)]
    d = np.array([r[i] - c[i] for i in range(3)], float)
    S = np.zeros((3, 3))
    for i in range(3):
        S[i, i] = r[i] + c[i] - 2 * cells[(i, i)]
        for j in range(3):
            if i != j:
                S[i, j] = -(cells[(i, j)] + cells[(j, i)])
    ref = float(d @ np.linalg.solve(S, d))
    assert math.isclose(chi2, ref, rel_tol=1e-9)


def test_stuart_maxwell_marginal_shift_detected():
    from log_analysis_ai_ray.pipelines.queries_ext6 import stuart_maxwell

    # mass flows 0 -> 3: margins diverge strongly
    cells = {(i, j): 10 for i in range(4) for j in range(4)}
    cells[(0, 3)] += 200
    chi2, _ = stuart_maxwell(cells)
    assert chi2 > 50.0


# ---------------------------------------------------------------------------
# lsm_tiered_levels
# ---------------------------------------------------------------------------


def _lsm_naive(flush_bytes, fanin=4, max_lvl=6):
    """Replay the size-tiered compaction: each level holds tables;
    fanin tables at level l merge into one table at level l+1,
    writing their combined bytes."""
    levels = [[] for _ in range(max_lvl + 2)]
    written = [0] * (max_lvl + 1)
    merges = [0] * (max_lvl + 1)
    for b in flush_bytes:
        levels[0].append(b)
        written[0] += b
        merges[0] += 1
        lvl = 0
        while lvl <= max_lvl - 1 and len(levels[lvl]) == fanin:
            tot = sum(levels[lvl])
            levels[lvl] = []
            levels[lvl + 1].append(tot)
            written[lvl + 1] += tot
            merges[lvl + 1] += 1
            lvl += 1
    return [(l, merges[l], written[l])
            for l in range(max_lvl + 1) if merges[l] > 0]


def test_lsm_closed_form_matches_replay():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        lsm_tiered_levels

    rng = random.Random(6)
    for n in (1, 3, 4, 17, 64, 255, 720):
        fb = [rng.randrange(1_000, 100_000) for _ in range(n)]
        assert lsm_tiered_levels(fb) == _lsm_naive(fb)


def test_lsm_write_amp_log4_growth():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        lsm_tiered_levels

    fb = [1000] * 256                    # 4^4 equal flushes
    rows = lsm_tiered_levels(fb)
    # every level fully merges: 5 levels, each rewriting all bytes
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
    assert all(r[2] == 256_000 for r in rows)
    assert [r[1] for r in rows] == [256, 64, 16, 4, 1]


# ---------------------------------------------------------------------------
# ta_stop_depth
# ---------------------------------------------------------------------------


def _ta_naive(xs, ys, k=10):
    """Linear-sweep transcription of the TA stopping rule."""
    n = len(xs)
    order_x = sorted(range(n), key=lambda i: (-xs[i], i))
    order_y = sorted(range(n), key=lambda i: (-ys[i], i))
    rx = {}
    ry = {}
    for d, i in enumerate(order_x, 1):
        rx[i] = d
    for d, i in enumerate(order_y, 1):
        ry[i] = d
    for d in range(1, n + 1):
        seen = [xs[i] + ys[i] for i in range(n)
                if min(rx[i], ry[i]) <= d]
        if len(seen) < k:
            continue
        kb = sorted(seen, reverse=True)[k - 1]
        th = xs[order_x[d - 1]] + ys[order_y[d - 1]]
        if kb >= th:
            return d, th, kb, len(seen)
    raise AssertionError("no stop")


def test_ta_bisection_matches_linear_sweep():
    from log_analysis_ai_ray.pipelines.queries_ext6 import ta_stop_depth

    rng = random.Random(8)
    for trial in range(5):
        n = 200
        xs = [rng.randrange(0, 10_000) for _ in range(n)]
        ys = [rng.randrange(0, 10_000) for _ in range(n)]
        got = ta_stop_depth(xs, ys, k=10)
        d, th, kb, seen = _ta_naive(xs, ys, k=10)
        assert got["stop_depth"] == d
        assert got["threshold"] == th
        assert got["kth_best"] == kb
        assert got["n_seen"] == seen


def test_ta_perfectly_correlated_stops_at_k():
    from log_analysis_ai_ray.pipelines.queries_ext6 import ta_stop_depth

    xs = list(range(1000, 0, -1))        # distinct, x == y ranking
    got = ta_stop_depth(xs, xs, k=10)
    assert got["stop_depth"] == 10
    assert got["n_seen"] == 10


def test_ta_anticorrelated_needs_deep_scan():
    from log_analysis_ai_ray.pipelines.queries_ext6 import ta_stop_depth

    n = 100
    xs = list(range(n, 0, -1))
    ys = list(range(1, n + 1))           # exact reverse ranking
    got = ta_stop_depth(xs, ys, k=10)
    # constant score n+1 everywhere but threshold = 2(n-d+1): the
    # certificate only closes past the halfway depth, having touched
    # EVERY object — the TA worst case
    assert got["stop_depth"] == n // 2 + 1
    assert got["kth_best"] == n + 1
    assert got["n_seen"] == n


# ---------------------------------------------------------------------------
# lsm_leveled_levels
# ---------------------------------------------------------------------------


def _lsm_leveled_naive(flush_bytes, fanin=4, max_lvl=6):
    """Replay: level l accumulates bytes; a merge into l at every
    fanin^l-th flush writes l's accumulated bytes (epoch content
    including the incoming batch); promotion out of l at every
    fanin^(l+1)-th flush empties it."""
    n = len(flush_bytes)
    prefix = [0]
    for b in flush_bytes:
        prefix.append(prefix[-1] + b)
    written = [0] * (max_lvl + 1)
    merges = [0] * (max_lvl + 1)
    written[0] = prefix[n]
    merges[0] = n
    for lvl in range(1, max_lvl + 1):
        span = fanin ** lvl
        epoch_start = 0
        for m in range(span, n + 1, span):
            if (m - 1) // (span * fanin) * (span * fanin) != epoch_start:
                epoch_start = (m - 1) // (span * fanin) * (span * fanin)
            written[lvl] += prefix[m] - prefix[epoch_start]
            merges[lvl] += 1
    return [(l, merges[l], written[l])
            for l in range(max_lvl + 1) if merges[l] > 0]


def test_lsm_leveled_matches_replay_and_exceeds_tiered():
    from log_analysis_ai_ray.pipelines.queries_ext6 import (
        lsm_leveled_levels, lsm_tiered_levels)

    rng = random.Random(13)
    for n in (4, 16, 100, 720):
        fb = [rng.randrange(1_000, 100_000) for _ in range(n)]
        lv = lsm_leveled_levels(fb)
        assert lv == _lsm_leveled_naive(fb)
        # leveled rewrites within epochs -> never cheaper than tiered
        wt = sum(b for _, _, b in lsm_tiered_levels(fb))
        wl = sum(b for _, _, b in lv)
        assert wl >= wt


def test_lsm_leveled_equal_flushes_arithmetic():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        lsm_leveled_levels

    fb = [1000] * 16                     # exactly one full L2 epoch
    rows = dict((l, (m, b)) for l, m, b in lsm_leveled_levels(fb))
    assert rows[0] == (16, 16_000)
    # L1 merges at 4,8,12,16 writing 4k,8k,12k,16k within the epoch
    assert rows[1] == (4, 40_000)
    # L2 merge at 16 writes the full epoch once
    assert rows[2] == (1, 16_000)


# ---------------------------------------------------------------------------
# mantel_r
# ---------------------------------------------------------------------------


def test_mantel_matches_numpy_corrcoef():
    from log_analysis_ai_ray.pipelines.queries_ext6 import mantel_r

    rng = random.Random(17)
    xs = [rng.randrange(0, 100) for _ in range(25)]
    ys = [rng.randrange(0, 10_000) for _ in range(25)]
    dx, dy = [], []
    for i in range(25):
        for j in range(i + 1, 25):
            dx.append(abs(xs[i] - xs[j]))
            dy.append(abs(ys[i] - ys[j]))
    p, r = mantel_r(xs, ys)
    assert p == len(dx)
    assert math.isclose(r, float(np.corrcoef(dx, dy)[0, 1]),
                        rel_tol=1e-9)


def test_mantel_perfect_linear_map_is_one():
    from log_analysis_ai_ray.pipelines.queries_ext6 import mantel_r

    xs = [3, 7, 11, 20, 41, 55]
    _, r = mantel_r(xs, [5 * x + 17 for x in xs])
    assert math.isclose(r, 1.0, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# bds_gap
# ---------------------------------------------------------------------------


def test_bds_gap_constant_series_zero():
    from log_analysis_ai_ray.pipelines.queries_ext6 import bds_gap

    p1, p2, c1, c2, gap = bds_gap([5] * 40, eps=0)
    assert c1 == 1.0 and c2 == 1.0 and gap == 0.0


def test_bds_gap_detects_period_two_structure():
    from log_analysis_ai_ray.pipelines.queries_ext6 import bds_gap

    # strict alternation 0,100,0,100,... with eps=10: marginal pairs
    # are within eps half the time, but embedded pairs are within eps
    # EXACTLY when parities match -> c2 > c1^2? both = ~1/2... compare
    # against a scrambled series where the embedding adds nothing.
    n = 60
    alt = [0 if i % 2 == 0 else 100 for i in range(n)]
    _, _, c1a, c2a, gap_a = bds_gap(alt, eps=10)
    # alternating: same-parity pairs are close in BOTH coordinates,
    # so c2 == c1 (not c1^2): large positive gap
    assert math.isclose(c2a, c1a, rel_tol=0.05)
    assert gap_a > 0.2
    rng = random.Random(23)
    iid = [rng.randrange(0, 1_000_000) for _ in range(200)]
    eps = 250_000
    _, _, c1b, c2b, gap_b = bds_gap(iid, eps)
    # iid: embedded closeness factorizes -> gap near zero
    assert abs(gap_b) < 0.05
    assert gap_a > 4 * abs(gap_b)


# ---------------------------------------------------------------------------
# lru_reuse_distances
# ---------------------------------------------------------------------------


def _lru_naive(pages, cap):
    """Direct LRU list replay: returns (hits, cold)."""
    stack = []
    hits = cold = 0
    for p in pages:
        if p in stack:
            if stack.index(p) < cap:
                hits += 1
            stack.remove(p)
        else:
            cold += 1
        stack.insert(0, p)
    return hits, cold


def test_lru_reuse_distance_matches_stack_replay():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        lru_reuse_distances

    rng = random.Random(19)
    pages = [rng.randrange(0, 12) for _ in range(400)]
    n, npg, cold, rd = lru_reuse_distances(pages)
    assert n == 400 and npg == len(set(pages))
    for cap in (1, 2, 4, 8, 16):
        hits_naive, cold_naive = _lru_naive(pages, cap)
        assert cold == cold_naive
        assert int((rd <= cap - 1).sum()) == hits_naive


def test_lru_inclusion_property_monotone():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        lru_reuse_distances

    rng = random.Random(29)
    pages = [rng.randrange(0, 50) for _ in range(500)]
    _, _, _, rd = lru_reuse_distances(pages)
    hits = [int((rd <= c - 1).sum()) for c in (2, 4, 8, 16, 32, 64)]
    assert hits == sorted(hits)          # bigger cache never worse


def test_lru_cyclic_scan_thrashes():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        lru_reuse_distances

    # round-robin over 10 pages: every reuse distance is exactly 9
    pages = list(range(10)) * 20
    _, _, cold, rd = lru_reuse_distances(pages)
    assert cold == 10
    assert set(rd.tolist()) == {9}
    # capacity 9 thrashes to zero hits; capacity 10 hits everything
    assert int((rd <= 8).sum()) == 0
    assert int((rd <= 9).sum()) == len(pages) - 10


# ---------------------------------------------------------------------------
# group-commit arithmetic
# ---------------------------------------------------------------------------


def test_group_commit_latency_identities():
    rng = random.Random(31)
    ts = sorted(rng.randrange(0, 10_000_000) for _ in range(500))
    for w in (1_000, 10_000):
        lats = [w - t % w for t in ts]
        # latency is within (0, w] and flush buckets partition events
        assert all(0 < v <= w for v in lats)
        flushes = len({t // w for t in ts})
        assert flushes <= len(ts)
        # ceil-rank p99 (the query's order statistic) bounds 99% mass
        srt = sorted(lats)
        k99 = (99 * len(ts) + 99) // 100
        p99 = srt[k99 - 1]
        assert sum(1 for v in lats if v <= p99) >= k99


# ---------------------------------------------------------------------------
# nb_poisson_loglik
# ---------------------------------------------------------------------------


def test_nb_loglik_underdispersed_declines_fit():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        nb_poisson_loglik

    # constant counts: var = 0 < mu -> NB side is None
    lnl_p, lnl_nb, r, p = nb_poisson_loglik([5], [100])
    assert lnl_nb is None and r is None and p is None
    lam = 5.0
    ref = 100 * (5 * math.log(lam) - lam - math.lgamma(6.0))
    assert math.isclose(lnl_p, ref, rel_tol=1e-12)


def test_nb_loglik_beats_poisson_when_overdispersed():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        nb_poisson_loglik

    # half the users at 1, half at 19: mean 10, var 81 >> mean
    lnl_p, lnl_nb, r, p = nb_poisson_loglik([1, 19], [50, 50])
    assert lnl_nb > lnl_p
    assert 0 < p < 1 and r > 0
    # moment identities
    mu, var = 10.0, 81.0
    assert math.isclose(r, mu * mu / (var - mu), rel_tol=1e-12)
    assert math.isclose(p, mu / var, rel_tol=1e-12)


def test_nb_loglik_histogram_equals_expansion():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        nb_poisson_loglik

    ks, cs = [0, 2, 7], [3, 4, 2]
    packed = nb_poisson_loglik(ks, cs)
    flat_k = [k for k, c in zip(ks, cs) for _ in range(c)]
    fk, fc = sorted(set(flat_k)), None
    from collections import Counter
    cnt = Counter(flat_k)
    flat = nb_poisson_loglik(fk, [cnt[k] for k in fk])
    assert packed == flat


# ---------------------------------------------------------------------------
# lad_fit
# ---------------------------------------------------------------------------


def _sae_of(xs, ys, a, b):
    return sum(abs(y - a - b * x) for x, y in zip(xs, ys))


def test_lad_no_pair_line_beats_winner():
    from log_analysis_ai_ray.pipelines.queries_ext6 import lad_fit

    rng = random.Random(37)
    xs = sorted(rng.sample(range(0, 500), 25))
    ys = [3 * x + rng.randrange(-40, 40) for x in xs]
    i, j, b, a, sae = lad_fit(xs, ys)
    assert math.isclose(sae, _sae_of(xs, ys, a, b), rel_tol=1e-9)
    for p in range(25):
        for q in range(p + 1, 25):
            bb = (ys[q] - ys[p]) / (xs[q] - xs[p])
            aa = ys[p] - bb * xs[p]
            assert _sae_of(xs, ys, aa, bb) >= sae - 1e-6


def test_lad_resists_outlier_better_than_ols():
    from log_analysis_ai_ray.pipelines.queries_ext6 import lad_fit

    xs = list(range(30))
    ys = [10 * x + 5 for x in xs]
    ys[29] += 100_000                    # gross corruption
    _, _, b, a, _ = lad_fit(xs, ys)
    assert abs(b - 10) < 0.5             # LAD slope barely moves
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    b_ols = (n * sum(x * y for x, y in zip(xs, ys)) - sx * sy) \
        / (n * sum(x * x for x in xs) - sx * sx)
    assert abs(b_ols - 10) > 5           # OLS slope is dragged


def test_lad_interpolates_exact_line():
    from log_analysis_ai_ray.pipelines.queries_ext6 import lad_fit

    xs = [1, 4, 9, 16, 30]
    ys = [7 * x - 3 for x in xs]
    _, _, b, a, sae = lad_fit(xs, ys)
    assert math.isclose(b, 7.0, rel_tol=1e-12)
    assert math.isclose(a, -3.0, rel_tol=1e-12)
    assert sae == 0.0


# ---------------------------------------------------------------------------
# haar_synopsis
# ---------------------------------------------------------------------------


def _inv_haar(total, kept, n=128, lvl=7):
    """Reconstruct the series from the root sum + kept details
    ((energy, level, idx, d) tuples): start from the root average and
    descend, splitting each node sum by the detail (0 if dropped)."""
    sums = {(lvl, 0): total}
    kd = {(k, i): d for _, k, i, d in kept}
    for k in range(lvl, 0, -1):
        for i in range(2 ** (lvl - k)):
            s = sums[(k, i)]
            d = kd.get((k, i), 0)
            sums[(k - 1, 2 * i)] = (s + d) / 2.0
            sums[(k - 1, 2 * i + 1)] = (s - d) / 2.0
    return [sums[(0, i)] for i in range(n)]


def test_haar_parseval_identity():
    from log_analysis_ai_ray.pipelines.queries_ext6 import haar_synopsis

    rng = random.Random(41)
    vals = [rng.randrange(0, 1000) for _ in range(128)]
    d = haar_synopsis(vals)
    sx = sum(vals)
    sx2 = sum(v * v for v in vals)
    # Parseval on the x128 scale: total detail energy = 128·Σx² − S²
    assert d["kept_energy_x128"] + d["sse_haar_x128"] \
        == 128 * sx2 - sx * sx


def test_haar_dropped_energy_equals_reconstruction_sse():
    from log_analysis_ai_ray.pipelines.queries_ext6 import (
        _WV_KEEP, haar_synopsis)

    rng = random.Random(43)
    vals = [rng.randrange(0, 1000) for _ in range(128)]
    # reproduce the kept set exactly as haar_synopsis ranks it
    cur = list(vals)
    details = []
    for k in range(1, 8):
        nxt, det = [], []
        for i in range(0, len(cur), 2):
            nxt.append(cur[i] + cur[i + 1])
            det.append(cur[i] - cur[i + 1])
        for i, dd in enumerate(det):
            details.append((dd * dd * (2 ** (7 - k)), k, i, dd))
        cur = nxt
    order = sorted(details, key=lambda t: (-t[0], t[1], t[2]))
    kept = order[:_WV_KEEP]
    recon = _inv_haar(cur[0], kept)
    sse = sum((v - r) ** 2 for v, r in zip(vals, recon))
    d = haar_synopsis(vals)
    assert math.isclose(sse, d["sse_haar_x128"] / 128.0, rel_tol=1e-9)


def test_haar_constant_series_is_exact():
    from log_analysis_ai_ray.pipelines.queries_ext6 import haar_synopsis

    d = haar_synopsis([7] * 128)
    assert d["sse_haar_x128"] == 0
    assert d["sse_hist_x128"] == 0
    assert d["total"] == 7 * 128


def test_haar_beats_histogram_on_spike():
    from log_analysis_ai_ray.pipelines.queries_ext6 import haar_synopsis

    vals = [0] * 128
    vals[37] = 1000                      # localized burst
    d = haar_synopsis(vals)
    # 7 coefficients on the spike path reconstruct it exactly; the
    # histogram smears the spike across its 16-wide bucket
    assert d["sse_haar_x128"] == 0
    assert d["sse_hist_x128"] > 0


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------


def test_fleiss_textbook_perfect_and_chance():
    from log_analysis_ai_ray.pipelines.queries_ext6 import fleiss_kappa

    # perfect agreement: every subject 3x same category
    cells = [(s, "a" if s % 2 == 0 else "b", 3) for s in range(10)]
    n, k = fleiss_kappa(cells)
    assert n == 10 and math.isclose(k, 1.0, rel_tol=1e-12)
    # maximal disagreement: each subject spreads over 3 categories
    cells = [(s, c, 1) for s in range(12) for c in ("a", "b", "c")]
    n, k = fleiss_kappa(cells)
    assert n == 12
    assert k < 0          # below-chance agreement


def test_fleiss_matches_direct_transcription():
    from log_analysis_ai_ray.pipelines.queries_ext6 import fleiss_kappa

    rng = random.Random(47)
    cats = ["a", "b", "c", "d"]
    cells = []
    for s in range(40):
        picks = [rng.choice(cats) for _ in range(3)]
        from collections import Counter
        for c, n in Counter(picks).items():
            cells.append((s, c, n))
    nsub, kappa = fleiss_kappa(cells)
    # direct textbook form
    N, m = 40, 3
    from collections import defaultdict
    nic = defaultdict(int)
    for s, c, n in cells:
        nic[(s, c)] += n
    p_bar = sum(
        (sum(nic[(s, c)] ** 2 for c in cats) - m) / (m * (m - 1))
        for s in range(N)) / N
    pj = [sum(nic[(s, c)] for s in range(N)) / (N * m) for c in cats]
    p_e = sum(p * p for p in pj)
    ref = (p_bar - p_e) / (1 - p_e)
    assert math.isclose(kappa, ref, rel_tol=1e-12)


def test_fleiss_rejects_unbalanced_subjects():
    import pytest

    from log_analysis_ai_ray.pipelines.queries_ext6 import fleiss_kappa

    with pytest.raises(AssertionError):
        fleiss_kappa([(0, "a", 2), (1, "a", 3)])


# ---------------------------------------------------------------------------
# jl_sign / JL audit arithmetic
# ---------------------------------------------------------------------------


def test_jl_sign_deterministic_and_balanced():
    from log_analysis_ai_ray.pipelines.queries_ext6 import jl_sign

    m = [[jl_sign(i, j) for j in range(64)] for i in range(16)]
    m2 = [[jl_sign(i, j) for j in range(64)] for i in range(16)]
    assert m == m2
    flat = [v for row in m for v in row]
    assert set(flat) == {-1, 1}
    # md5 bits are fair: the sign matrix is roughly balanced
    assert 0.35 < flat.count(1) / len(flat) < 0.65


def test_jl_expected_ratio_is_one():
    from log_analysis_ai_ray.pipelines.queries_ext6 import (_JL_K,
                                                            jl_sign)

    # E[||R d||^2] = k ||d||^2 holds EXACTLY over the sign ensemble;
    # check concentration empirically for one fixed hash matrix
    rng = np.random.RandomState(51)
    d = 64
    R = np.array([[jl_sign(i, j) for j in range(d)]
                  for i in range(_JL_K)], float)
    ratios = []
    for _ in range(50):
        x = rng.randn(d)
        ratios.append(float((R @ x) @ (R @ x)) / (_JL_K * float(x @ x)))
    assert 0.5 < np.mean(ratios) < 1.5
    assert min(ratios) > 0.1 and max(ratios) < 4.0


# ---------------------------------------------------------------------------
# holt_winters
# ---------------------------------------------------------------------------


def test_hw_constant_series_is_exact():
    from log_analysis_ai_ray.pipelines.queries_ext6 import holt_winters

    lvl, tr, sae, nf = holt_winters([100.0] * 70)
    assert math.isclose(lvl, 100.0, abs_tol=1e-9)
    assert abs(tr) < 1e-9
    assert sae < 1e-6 and nf == 63


def test_hw_tracks_pure_weekly_pattern():
    from log_analysis_ai_ray.pipelines.queries_ext6 import holt_winters

    season = [10.0, 50.0, 20.0, 80.0, 30.0, 60.0, 40.0]
    xs = season * 20
    lvl, tr, sae, nf = holt_winters(xs)
    # perfectly periodic: init seasonals are exact, forecasts perfect
    assert sae < 1e-6
    assert abs(tr) < 1e-9
    assert math.isclose(lvl, sum(season) / 7.0, abs_tol=1e-6)


def test_hw_trend_followed():
    from log_analysis_ai_ray.pipelines.queries_ext6 import holt_winters

    xs = [100.0 + 5.0 * t for t in range(140)]
    lvl, tr, sae, nf = holt_winters(xs)
    # linear series: level converges near the last value, trend to 5
    assert abs(tr - 5.0) < 1.0
    assert abs(lvl - xs[-1]) < 20.0
    assert sae / nf < 10.0


# ---------------------------------------------------------------------------
# linear_probe_stats
# ---------------------------------------------------------------------------


def _probe_replay(h):
    occ = set()
    tot = 0
    keys = [s for s, c in enumerate(h) for _ in range(c)]
    for k in keys:
        s = k
        while s in occ:
            s += 1
        tot += s - k
        occ.add(s)
    c = mx = 0
    for hv in h:
        c = max(0, c + hv - 1)
        mx = max(mx, c)
    return tot, mx


def test_linear_probe_matches_replay_randomized():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        linear_probe_stats

    rng = random.Random(53)
    for _ in range(100):
        m = rng.randrange(1, 60)
        h = [0] * m
        for _ in range(rng.randrange(0, m + 5)):
            h[rng.randrange(m)] += 1
        assert linear_probe_stats(h) == _probe_replay(h)


def test_linear_probe_knuth_blowup_with_load():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        linear_probe_stats

    rng = random.Random(59)
    n = 2000
    keys = [rng.randrange(1 << 30) for _ in range(n)]

    def mean_probe(alpha):
        m = int(n / alpha)
        h = [0] * m
        for k in keys:
            h[k % m] += 1
        tot, _ = linear_probe_stats(h)
        return 1.0 + tot / n

    # Knuth: E[probes] ≈ (1 + 1/(1−α))/2 — displacement explodes
    assert mean_probe(0.5) < mean_probe(0.75) < mean_probe(0.95)
    assert mean_probe(0.95) > 3.0


def test_linear_probe_all_same_slot_is_arithmetic():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        linear_probe_stats

    # k keys on one slot: displacements 0+1+…+(k−1)
    tot, mx = linear_probe_stats([5, 0, 0, 0, 0, 0])
    assert tot == 10 and mx == 4
    # spill past the end drains with the same arithmetic tail
    tot2, _ = linear_probe_stats([5])
    assert tot2 == 10


# ---------------------------------------------------------------------------
# dobrushin_delta
# ---------------------------------------------------------------------------


def test_dobrushin_identical_rows_zero():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        dobrushin_delta

    cells = {("a", "a"): 2, ("a", "b"): 6,
             ("b", "a"): 1, ("b", "b"): 3}   # same distribution
    d, i, k = dobrushin_delta(cells)
    assert d == 0.0


def test_dobrushin_disjoint_rows_one():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        dobrushin_delta

    cells = {("a", "a"): 5, ("b", "b"): 7}   # zero overlap
    d, i, k = dobrushin_delta(cells)
    assert d == 1.0 and (i, k) == ("a", "b")


def test_dobrushin_matches_float_transcription():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        dobrushin_delta

    rng = random.Random(61)
    sts = ["a", "b", "c", "d"]
    cells = {(i, j): rng.randrange(1, 50) for i in sts for j in sts}
    d, _, _ = dobrushin_delta(cells)
    rows = {i: sum(cells[(i, j)] for j in sts) for i in sts}
    ref = max(
        0.5 * sum(abs(cells[(i, j)] / rows[i]
                      - cells[(k, j)] / rows[k]) for j in sts)
        for a, i in enumerate(sts) for k in sts[a + 1:])
    assert math.isclose(d, ref, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# kcenter_greedy
# ---------------------------------------------------------------------------


def test_kcenter_radius_nonincreasing_and_2approx():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        kcenter_greedy

    rng = np.random.RandomState(67)
    X = rng.randn(200, 8)
    cs = kcenter_greedy(X)
    radii = [r for _, r in cs[1:]]
    assert radii == sorted(radii, reverse=True)
    # covering radius after k picks ≤ radius at the k-th pick
    centers = np.array([c for c, _ in cs])
    mind = np.min(((X[:, None, :] - X[centers][None, :, :]) ** 2)
                  .sum(axis=2), axis=1)
    assert float(mind.max()) <= radii[-1] + 1e-9


def test_kcenter_picks_planted_clusters():
    from log_analysis_ai_ray.pipelines.queries_ext6 import (_KC_K,
                                                            kcenter_greedy)

    # 8 well-separated blobs: greedy must touch every blob once
    rng = np.random.RandomState(71)
    blobs = []
    for b in range(8):
        center = np.zeros(4)
        center[b % 4] = 1000.0 * (1 + b // 4)
        blobs.append(center + 0.01 * rng.randn(20, 4))
    X = np.vstack(blobs)
    cs = kcenter_greedy(X)
    picked_blobs = {c // 20 for c, _ in cs}
    assert len(picked_blobs) == _KC_K


# ---------------------------------------------------------------------------
# cracking_costs
# ---------------------------------------------------------------------------


def _cracking_replay(values, pivots, lo, hi):
    """Replay with an explicit boundary list."""
    import bisect
    bounds = [lo - 1, hi]
    costs = []
    svals = sorted(values)

    def cnt(a, b):
        return bisect.bisect_right(svals, b) \
            - bisect.bisect_right(svals, a)

    for p in pivots:
        pred = max(b for b in bounds if b < p)
        succ = min(b for b in bounds if b >= p)
        costs.append(cnt(pred, succ))
        if p not in bounds:
            bisect.insort(bounds, p)
    return costs


def test_cracking_costs_match_replay():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        cracking_costs

    rng = random.Random(73)
    values = [rng.randrange(0, 10_000) for _ in range(5_000)]
    lo, hi = min(values), max(values)
    pivots = [rng.randrange(lo, hi + 1) for _ in range(64)]
    vs, cs = np.unique(np.asarray(values), return_counts=True)
    got = cracking_costs((vs, cs), pivots, lo, hi)
    assert got == _cracking_replay(values, pivots, lo, hi)


def test_cracking_cost_decays():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        cracking_costs

    rng = random.Random(79)
    values = [rng.randrange(0, 1_000_000) for _ in range(20_000)]
    lo, hi = min(values), max(values)
    pivots = [rng.randrange(lo, hi + 1) for _ in range(64)]
    vs, cs = np.unique(np.asarray(values), return_counts=True)
    costs = cracking_costs((vs, cs), pivots, lo, hi)
    assert costs[0] == len(values)       # first query scans it all
    assert sum(costs[-16:]) < sum(costs[:16]) / 3


def test_cracking_duplicate_pivot_rescans_left_part():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        cracking_costs

    vs = np.array([1, 2, 3, 4, 5, 6, 7, 8])
    cs = np.ones(8, dtype=np.int64)
    costs = cracking_costs((vs, cs), [4, 4], 1, 8)
    assert costs[0] == 8                 # whole column
    assert costs[1] == 4                 # (lo−1, 4] half only


# ---------------------------------------------------------------------------
# fsst_bigram_counts
# ---------------------------------------------------------------------------


def test_fsst_nonoverlapping_semantics():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        fsst_bigram_counts

    # "aaaa" holds TWO non-overlapping "aa" (replace semantics),
    # not three overlapping ones
    got = fsst_bigram_counts(["aaaa"], ["aa"])
    assert got["aa"] == 2
    got = fsst_bigram_counts(["ababa"], ["ab", "ba"])
    assert got["ab"] == 2 and got["ba"] == 2


def test_fsst_counts_additive_across_names():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        fsst_bigram_counts

    names = ["red widget", "red bolt", "blue widget"]
    got = fsst_bigram_counts(names, ["re", "dg", "et"])
    assert got["re"] == 2 and got["dg"] == 2 and got["et"] == 2


# ---------------------------------------------------------------------------
# tukey_gh
# ---------------------------------------------------------------------------


def test_tukey_gh_symmetric_normal_is_zero():
    from log_analysis_ai_ray.pipelines.queries_ext5 import inv_phi_upper
    from log_analysis_ai_ray.pipelines.queries_ext6 import tukey_gh

    z9 = inv_phi_upper(0.9)
    z75 = inv_phi_upper(0.75)
    # exact normal quantiles: g = 0, h = 0
    qs = (-z9, -z75, 0.0, z75, z9)
    g, h = tukey_gh(qs)
    assert abs(g) < 1e-9
    assert abs(h) < 1e-9


def test_tukey_gh_recovers_planted_g():
    from log_analysis_ai_ray.pipelines.queries_ext5 import inv_phi_upper
    from log_analysis_ai_ray.pipelines.queries_ext6 import tukey_gh

    g0 = 0.5

    def gh_q(z):
        return (math.exp(g0 * z) - 1.0) / g0   # pure-g transform

    z9 = inv_phi_upper(0.9)
    z75 = inv_phi_upper(0.75)
    qs = (gh_q(-z9), gh_q(-z75), 0.0, gh_q(z75), gh_q(z9))
    g, h = tukey_gh(qs)
    assert math.isclose(g, g0, rel_tol=1e-9)
    assert abs(h) < 1e-9


def test_tukey_gh_heavy_tails_positive_h():
    from log_analysis_ai_ray.pipelines.queries_ext5 import inv_phi_upper
    from log_analysis_ai_ray.pipelines.queries_ext6 import tukey_gh

    h0 = 0.3
    z9 = inv_phi_upper(0.9)
    z75 = inv_phi_upper(0.75)

    def gh_q(z):
        return z * math.exp(h0 * z * z / 2.0)  # pure-h transform

    qs = (gh_q(-z9), gh_q(-z75), 0.0, gh_q(z75), gh_q(z9))
    g, h = tukey_gh(qs)
    assert abs(g) < 1e-9
    assert math.isclose(h, h0, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# schnabel
# ---------------------------------------------------------------------------


def test_schnabel_recovers_closed_population():
    from log_analysis_ai_ray.pipelines.queries_ext6 import schnabel

    # closed population of 100, deterministic round-robin sampling of
    # 20 per day: after day 1 every capture is a recapture at rate
    # M_t/N, so the estimator recovers N exactly in expectation —
    # with systematic coverage it converges tightly
    rng = random.Random(83)
    N = 100
    seen = set()
    caps = []
    for day in range(30):
        sample = set(rng.sample(range(N), 20))
        new = len(sample - seen)
        caps.append((20, new))
        seen |= sample
    _, _, n_hat = schnabel(caps)
    assert 80 < n_hat < 125


def test_schnabel_all_new_gives_upper_blowup():
    from log_analysis_ai_ray.pipelines.queries_ext6 import schnabel

    # no recaptures: denominator clamps at 1, N̂ = Σ C·M exactly
    caps = [(10, 10), (10, 10), (10, 10)]
    sum_cm, sum_r, n_hat = schnabel(caps)
    assert sum_r == 0
    assert sum_cm == 10 * 10 + 10 * 20
    assert n_hat == sum_cm


# ---------------------------------------------------------------------------
# dtw_int
# ---------------------------------------------------------------------------


def test_dtw_identical_series_zero():
    from log_analysis_ai_ray.pipelines.queries_ext6 import dtw_int

    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    assert dtw_int(xs, xs) == 0


def test_dtw_shift_cheaper_than_l1():
    from log_analysis_ai_ray.pipelines.queries_ext6 import dtw_int

    xs = [0, 0, 10, 50, 10, 0, 0, 0]
    ys = [0, 0, 0, 10, 50, 10, 0, 0]   # same pulse, shifted by 1
    l1 = sum(abs(a - b) for a, b in zip(xs, ys))
    d = dtw_int(xs, ys)
    assert d < l1 / 4                   # warping absorbs the shift


def test_dtw_matches_quadratic_reference():
    from log_analysis_ai_ray.pipelines.queries_ext6 import dtw_int

    rng = random.Random(89)
    for _ in range(10):
        xs = [rng.randrange(0, 50) for _ in range(12)]
        ys = [rng.randrange(0, 50) for _ in range(9)]
        n, m = len(xs), len(ys)
        INF = float("inf")
        D = [[INF] * (m + 1) for _ in range(n + 1)]
        D[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i][j] = abs(xs[i - 1] - ys[j - 1]) + min(
                    D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
        assert dtw_int(xs, ys) == D[n][m]


def test_dtw_monotone_under_scaling():
    from log_analysis_ai_ray.pipelines.queries_ext6 import dtw_int

    xs = [1, 5, 2, 8]
    ys = [2, 4, 3, 7]
    assert dtw_int([3 * v for v in xs], [3 * v for v in ys]) \
        == 3 * dtw_int(xs, ys)


# ---------------------------------------------------------------------------
# pickands_xi
# ---------------------------------------------------------------------------


def test_pickands_exact_on_pareto_quantiles():
    from log_analysis_ai_ray.pipelines.queries_ext6 import pickands_xi

    # Pareto(ξ): Q(1−p) = p^(−ξ) — plugging exact quantiles at
    # p, 2p, 4p recovers ξ exactly
    for xi0 in (0.25, 0.5, 1.0, 2.0):
        p = 0.01
        xk = p ** (-xi0)
        x2k = (2 * p) ** (-xi0)
        x4k = (4 * p) ** (-xi0)
        got = pickands_xi(xk, x2k, x4k)
        assert math.isclose(got, xi0, rel_tol=1e-12)


def test_pickands_exponential_tail_is_zero():
    from log_analysis_ai_ray.pipelines.queries_ext6 import pickands_xi

    # exponential: Q(1−p) = −ln p — spacings halve geometrically
    p = 0.01
    got = pickands_xi(-math.log(p), -math.log(2 * p),
                      -math.log(4 * p))
    assert abs(got) < 1e-12


def test_pickands_degenerate_returns_none():
    from log_analysis_ai_ray.pipelines.queries_ext6 import pickands_xi

    assert pickands_xi(5.0, 5.0, 3.0) is None
    assert pickands_xi(7.0, 5.0, 5.0) is None


# ---------------------------------------------------------------------------
# sorted-neighborhood window arithmetic
# ---------------------------------------------------------------------------


def test_snm_candidate_count_formula():
    # n records, window w: pairs = w·n − w(w+1)/2
    n, w = 57, 4
    cand = sum(1 for i in range(n) for k in range(1, w + 1)
               if i + k < n)
    assert cand == w * n - w * (w + 1) // 2


def test_snm_typo_neighbors_stay_adjacent():
    from log_analysis_ai_ray.pipelines.queries_ext3 import jaro_winkler

    names = sorted(["red widget", "red widgex", "blue bolt",
                    "hot gear", "red widgey"])
    # the three typo variants sort adjacently; window 2 finds them
    found = 0
    for i in range(len(names)):
        for w in (1, 2):
            if i + w < len(names) \
                    and jaro_winkler(names[i], names[i + w]) >= 0.9:
                found += 1
    assert found >= 3


# ---------------------------------------------------------------------------
# qreg_fit
# ---------------------------------------------------------------------------


def _check_loss(xs, ys, a, b, tau=0.9):
    tot = 0.0
    for x, y in zip(xs, ys):
        r = y - a - b * x
        tot += tau * r if r > 0 else (tau - 1.0) * r
    return tot


def test_qreg_no_vertex_beats_winner():
    from log_analysis_ai_ray.pipelines.queries_ext6 import qreg_fit

    rng = random.Random(97)
    xs = sorted(rng.sample(range(0, 300), 20))
    ys = [5 * x + rng.randrange(-50, 50) for x in xs]
    i, j, b, a, cost = qreg_fit(xs, ys)
    assert math.isclose(cost, _check_loss(xs, ys, a, b),
                        rel_tol=1e-9)
    for p in range(20):
        for q in range(p + 1, 20):
            bb = (ys[q] - ys[p]) / (xs[q] - xs[p])
            aa = ys[p] - bb * xs[p]
            assert _check_loss(xs, ys, aa, bb) >= cost - 1e-6


def test_qreg_line_sits_above_most_points():
    from log_analysis_ai_ray.pipelines.queries_ext6 import qreg_fit

    rng = random.Random(101)
    xs = list(range(100))
    ys = [100 + rng.randrange(0, 1000) for _ in xs]
    i, j, b, a, _ = qreg_fit(xs, ys)
    below = sum(1 for x, y in zip(xs, ys) if y <= a + b * x + 1e-9)
    # the 0.9-quantile line leaves ≈90% of points at or below it
    assert 80 <= below <= 100


def test_qreg_tau_half_equals_lad():
    from log_analysis_ai_ray.pipelines.queries_ext6 import (lad_fit,
                                                            qreg_fit)

    rng = random.Random(103)
    xs = sorted(rng.sample(range(0, 500), 15))
    ys = [2 * x + rng.randrange(-30, 30) for x in xs]
    _, _, b1, a1, sae = lad_fit(xs, ys)
    _, _, b2, a2, cost = qreg_fit(xs, ys, tau_num=1, tau_den=2)
    # τ = ½ check loss is SAE/2: same optimal line
    assert math.isclose(b1, b2, rel_tol=1e-12)
    assert math.isclose(a1, a2, rel_tol=1e-12)
    assert math.isclose(cost, sae / 2.0, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# hubness_stats
# ---------------------------------------------------------------------------


def test_hubness_sum_identity_and_skew_sign():
    from log_analysis_ai_ray.pipelines.queries_ext6 import (_HUB_K,
                                                            hubness_stats)

    # N_k sums to k·n by construction; uniform N_k has zero skew
    nk = np.full(50, _HUB_K, dtype=np.int64)
    skew, hubs = hubness_stats(nk)
    assert skew == 0.0 and hubs == 0
    # one giant hub: strongly positive skew
    nk2 = np.zeros(50, dtype=np.int64)
    nk2[0] = 200
    nk2[1:] = 1
    skew2, hubs2 = hubness_stats(nk2)
    assert skew2 > 3.0 and hubs2 == 1


def test_hubness_matches_numpy_skew():
    from log_analysis_ai_ray.pipelines.queries_ext6 import hubness_stats

    rng = np.random.RandomState(107)
    nk = rng.randint(0, 20, size=200).astype(np.int64)
    skew, _ = hubness_stats(nk)
    x = nk.astype(float)
    ref = float(np.mean((x - x.mean()) ** 3) / np.std(x) ** 3)
    assert math.isclose(skew, ref, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# box_m_2x2
# ---------------------------------------------------------------------------


def _mom_of(pts):
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    return (n, sx, sy, sxx, syy, sxy)


def test_box_m_equal_covariances_near_zero():
    from log_analysis_ai_ray.pipelines.queries_ext6 import box_m_2x2

    rng = random.Random(109)
    pts = [(rng.randrange(0, 100), rng.randrange(0, 100))
           for _ in range(400)]
    m_stat, chi2, df = box_m_2x2([_mom_of(pts[:200]),
                                  _mom_of(pts[200:])])
    assert df == 3
    assert chi2 < 12.0                   # same population: no signal


def test_box_m_detects_scale_difference():
    from log_analysis_ai_ray.pipelines.queries_ext6 import box_m_2x2

    rng = random.Random(113)
    a = [(rng.randrange(0, 10), rng.randrange(0, 10))
         for _ in range(150)]
    b = [(rng.randrange(0, 1000), rng.randrange(0, 1000))
         for _ in range(150)]
    m_stat, chi2, _ = box_m_2x2([_mom_of(a), _mom_of(b)])
    assert chi2 > 100.0


def test_box_m_matches_numpy_cov():
    from log_analysis_ai_ray.pipelines.queries_ext6 import box_m_2x2

    rng = np.random.RandomState(127)
    a = rng.randint(0, 50, size=(60, 2))
    b = rng.randint(0, 80, size=(80, 2))
    m_stat, chi2, df = box_m_2x2([
        _mom_of([tuple(r) for r in a]),
        _mom_of([tuple(r) for r in b])])
    sa = np.cov(a.T)
    sb = np.cov(b.T)
    sp = (59 * sa + 79 * sb) / 138
    ref = 138 * math.log(np.linalg.det(sp)) \
        - 59 * math.log(np.linalg.det(sa)) \
        - 79 * math.log(np.linalg.det(sb))
    assert math.isclose(m_stat, ref, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# percentile-aggregation arithmetic
# ---------------------------------------------------------------------------


def test_mean_of_group_p99_underestimates_global():
    # heavy tail concentrated in one hour: averaging per-hour p99s
    # hides it, max overshoots per-hour mass
    rng = random.Random(131)
    hours = {h: [rng.randrange(10, 100) for _ in range(99)]
             for h in range(24)}
    hours[3] += [10_000] * 99            # the bursty hour

    def p99(vals):
        s = sorted(vals)
        k = (99 * len(s) + 99) // 100
        return s[k - 1]

    all_vals = [v for vs in hours.values() for v in vs]
    g = p99(all_vals)
    per = [p99(vs) for vs in hours.values()]
    mean_h = sum(per) / len(per)
    assert mean_h < g                    # the dashboard lie
    assert max(per) >= g


def test_truncating_division_matches_duckdb_semantics():
    # the err_ppm convention used by sampled_quantile_error
    def trunc_div(num, den):
        return num // den if num >= 0 else -((-num) // den)

    assert trunc_div(-7399999, 1000) == -7399
    assert trunc_div(7399999, 1000) == 7399
    assert trunc_div(-1, 2) == 0         # python // would give -1


# ---------------------------------------------------------------------------
# copula_from_tau
# ---------------------------------------------------------------------------


def test_copula_textbook_inversions():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        copula_from_tau

    th_c, lam_l, th_g, lam_u = copula_from_tau(0.5)
    assert math.isclose(th_c, 2.0, rel_tol=1e-12)
    assert math.isclose(lam_l, 2 ** -0.5, rel_tol=1e-12)
    assert math.isclose(th_g, 2.0, rel_tol=1e-12)
    assert math.isclose(lam_u, 2.0 - math.sqrt(2.0), rel_tol=1e-12)


def test_copula_independence_and_bounds():
    from log_analysis_ai_ray.pipelines.queries_ext6 import \
        copula_from_tau

    assert copula_from_tau(0.0) == (None, None, None, None)
    assert copula_from_tau(-0.3) == (None, None, None, None)
    # tails strengthen monotonically with tau
    l1 = copula_from_tau(0.2)[1]
    l2 = copula_from_tau(0.6)[1]
    u1 = copula_from_tau(0.2)[3]
    u2 = copula_from_tau(0.6)[3]
    assert l2 > l1 and u2 > u1
    assert 0 < l1 < 1 and 0 < u1 < 1


# ---------------------------------------------------------------------------
# theilsen_ci
# ---------------------------------------------------------------------------


def test_theilsen_ci_indices_bracket_median():
    from log_analysis_ai_ray.pipelines.queries_ext6 import theilsen_ci

    n = 120
    N = n * (n - 1) // 2
    lo, hi = theilsen_ci(N, n)
    assert 1 <= lo < N // 2 < hi <= N
    # band is symmetric around the median index
    assert abs((lo + hi) - (N + 1)) <= 2


def test_theilsen_ci_covers_true_slope_on_clean_line():
    from log_analysis_ai_ray.pipelines.queries_ext6 import theilsen_ci

    rng = random.Random(137)
    n = 60
    xs = list(range(n))
    ys = [7 * x + rng.randrange(-5, 5) for x in xs]
    slopes = sorted((ys[j] - ys[i]) / (xs[j] - xs[i])
                    for i in range(n) for j in range(i + 1, n))
    lo, hi = theilsen_ci(len(slopes), n)
    assert slopes[lo - 1] <= 7.0 <= slopes[hi - 1]


# ---------------------------------------------------------------------------
# rbo_truncated
# ---------------------------------------------------------------------------


def test_rbo_identical_rankings_approach_one():
    from log_analysis_ai_ray.pipelines.queries_ext6 import rbo_truncated

    ranks = {f"t{i}": i for i in range(1, 51)}
    rbo, ov = rbo_truncated(ranks, dict(ranks))
    assert ov == 50
    # identical lists: RBO@D = 1 − p^D (the truncated mass)
    assert math.isclose(rbo, 1.0 - 0.9 ** 50, rel_tol=1e-12)


def test_rbo_disjoint_rankings_zero():
    from log_analysis_ai_ray.pipelines.queries_ext6 import rbo_truncated

    ra = {f"a{i}": i for i in range(1, 51)}
    rb = {f"b{i}": i for i in range(1, 51)}
    rbo, ov = rbo_truncated(ra, rb)
    assert rbo == 0.0 and ov == 0


def test_rbo_head_agreement_dominates():
    from log_analysis_ai_ray.pipelines.queries_ext6 import rbo_truncated

    base = {f"t{i}": i for i in range(1, 51)}
    # same head, scrambled tail vs same tail, scrambled head
    head_same = dict(base)
    for i in range(26, 51):
        head_same[f"x{i}"] = head_same.pop(f"t{i}")
    tail_same = dict(base)
    for i in range(1, 26):
        tail_same[f"y{i}"] = tail_same.pop(f"t{i}")
    r_head, _ = rbo_truncated(base, head_same)
    r_tail, _ = rbo_truncated(base, tail_same)
    assert r_head > 2 * r_tail
