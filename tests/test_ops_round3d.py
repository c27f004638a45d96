"""Kernel-level semantics for the round-3d additions: chi-square from
integer margins, Theil–Sen median-of-slopes, Apdex per-mille closure,
CUBE grouping-set consistency, seasonal-naive pairing. (Oracle parity
for the full queries is covered by the driver / tools/selfcheck.py.)"""

import numpy as np


def _chi2_int(grid: dict, types, hours) -> float:
    # mirror of queries_ext.q_chi2_type_hour's driver closure
    n = sum(grid.values())
    rt = {t: sum(grid[(t, h)] for h in hours) for t in types}
    ct = {h: sum(grid[(t, h)] for t in types) for h in hours}
    chi2 = 0.0
    for t in types:
        for h in hours:
            e_num = rt[t] * ct[h]
            if e_num == 0:
                continue
            d = grid[(t, h)] * n - e_num
            chi2 += (d * d) / e_num
    return chi2 / n


def test_chi2_independent_table_is_zero():
    # perfectly proportional table → statistic exactly 0
    types, hours = ["a", "b"], [0, 1, 2]
    grid = {}
    for i, t in enumerate(types):
        for h in hours:
            grid[(t, h)] = (i + 1) * (h + 1) * 10
    assert _chi2_int(grid, types, hours) == 0.0


def test_chi2_matches_textbook_2x2():
    # classic 2×2: chi2 = n(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))
    a, b, c, d = 30, 10, 15, 45
    grid = {("x", 0): a, ("x", 1): b, ("y", 0): c, ("y", 1): d}
    got = _chi2_int(grid, ["x", "y"], [0, 1])
    n = a + b + c + d
    want = n * (a * d - b * c) ** 2 / (
        (a + b) * (c + d) * (a + c) * (b + d))
    assert abs(got - want) < 1e-9


def test_theilsen_median_interpolated_and_robust():
    # slope recovery with one wild outlier point: OLS breaks, TS holds
    h = np.arange(11, dtype=np.int64)
    c = 3 * h + 5
    c[7] = 1000  # outlier
    iu, ju = np.triu_indices(len(h), k=1)
    sl = (c[ju] - c[iu]).astype(float) / (h[ju] - h[iu])
    sl.sort()
    k = len(sl)
    med = (sl[(k - 1) // 2] + sl[k // 2]) / 2.0
    assert abs(med - 3.0) < 1e-9
    ols = np.polyfit(h.astype(float), c.astype(float), 1)[0]
    assert abs(ols - 3.0) > 5  # the outlier wrecked OLS, not TS


def test_apdex_permille_trunc_division():
    # (2·sat + tol)·500 // total, integer semantics incl. rounding-down
    sat, tol, total = 7, 3, 11
    assert (2 * sat + tol) * 500 // total == 772  # 772.7→772 (trunc)
    # all satisfied → exactly 1000; none → 0
    assert (2 * 5 + 0) * 500 // 5 == 1000
    assert 0 * 500 // 5 == 0


def test_cube_grouping_sets_consistent():
    # deriving coarser sets from exact finest partials is exact:
    # every marginal re-aggregation must agree with the grand total
    rng = np.random.default_rng(3)
    fine = {}
    for t in "abc":
        for d in range(1, 8):
            fine[(t, d)] = int(rng.integers(0, 50))
    grand = sum(fine.values())
    by_t = {t: sum(v for (tt, _), v in fine.items() if tt == t)
            for t in "abc"}
    by_d = {d: sum(v for (_, dd), v in fine.items() if dd == d)
            for d in range(1, 8)}
    assert sum(by_t.values()) == grand == sum(by_d.values())


def test_seasonal_naive_inner_join_pairing():
    # only hours with a t−24 partner contribute; integer MAE closes
    s = {0: 10, 24: 13, 48: 12, 30: 7}  # 30 has no partner at 6
    errs = [abs(c - s[h - 24]) for h, c in s.items() if h - 24 in s]
    assert sorted(errs) == [1, 3]
    assert sum(errs) / len(errs) == 2.0


def test_q15_max_equality_keeps_all_ties():
    import pyarrow as pa
    import pyarrow.compute as pc
    t = pa.table({"k": [1, 2, 3, 4], "cents": [10, 99, 99, 5]})
    mx = pc.max(t.column("cents"))
    w = t.filter(pc.equal(t.column("cents"), mx))
    assert w.column("k").to_pylist() == [2, 3]  # ORDER BY+LIMIT 1 would drop one


def test_share_permille_trunc_matches_duckdb_intdiv():
    # 1000·target // total, BIGINT semantics (DuckDB // truncates)
    for target, total, want in [(1, 3, 333), (2, 3, 666), (0, 7, 0),
                                (7, 7, 1000)]:
        assert target * 1000 // total == want
