"""Sixth extended query registry (round-3 session 12): the remaining
classical two-sample / diagnostic batteries plus storage-engine
planners, in the same oracle discipline as the siblings — shared
column names, identical float expression trees, exact integer
closures wherever the statistic allows.

The reference's analytics surface is SQL-over-DuckDB
(`/root/reference/python/logai_agent.py:385-407`); each entry here is
that capability re-expressed Ray-Data-first: one bounded
`map_batches` partial + small-key `groupby` per query, with the
driver touching only days-bounded or alphabet-bounded reductions.

- ``conover_squared_ranks_types``: Conover's squared-ranks scale test
  across event types — the rank-square companion of
  fligner_killeen_types (normal scores) / ansari_bradley (linear
  ranks); doubled midranks keep every rank power sum an exact
  integer.
- ``bws_weekend_weekday``: Baumgartner-Weiss-Schindler weighted
  rank-ECDF two-sample test of weekend vs weekday daily revenue —
  the variance-weighted refinement of ks_weekend_weekday (weights
  1/(F(1-F)) emphasize the tails where KS is blind).
- ``ww_runs_weekend_weekday``: Wald-Wolfowitz two-sample runs test on
  the value-ordered day sequence — the omnibus "any difference at
  all" alarm (location, scale, or shape).
- ``cooks_distance_daily``: OLS influence diagnostics of the daily
  revenue trend — leverage h_i, Cook's D, PRESS; flags the days that
  OWN the trend slope the newey_west/breusch_* family inferences
  rest on.
- ``shapiro_francia_daily``: Blom normal-scores correlation normality
  test W' — the order-statistic companion of lilliefors (ECDF) and
  dagostino_k2 (moments); shares Acklam's inverse-Phi verbatim with
  the oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QUERIES, _partial_final, _read
from .queries_ext3 import _daily_revenue_cents, phi_as
from .queries_ext5 import _acklam_sql, inv_phi_upper

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# conover_squared_ranks_types — squared-ranks scale test (k groups)
# ---------------------------------------------------------------------------


def conover_squared_ranks(cells) -> tuple:
    """Conover's squared-ranks statistic from [(group, absdev, count)]
    integer cells (median-centered variant: deviations are
    |value − group median|, exact integers).  Pooled doubled midranks
    d keep R² = d²/4 and R⁴ = d⁴/16 exact: with A4 = Σ c·d²
    (= 4ΣR²) and B16 = Σ c·d⁴ (= 16ΣR⁴),

        T = (N−1) · (N·Σ_g S4_g²/n_g − A4²) / (N·B16 − A4²)

    ~ χ²(k−1) under equal scales.  Returns (t, k, n)."""
    from collections import defaultdict

    dev_tot = defaultdict(int)
    for g, dv, c in cells:
        dev_tot[dv] += c
    cum = 0
    d2 = {}
    for dv in sorted(dev_tot):
        t = dev_tot[dv]
        d2[dv] = 2 * cum + t + 1
        cum += t
    n = cum
    a4 = sum(dev_tot[dv] * d2[dv] * d2[dv] for dv in dev_tot)
    b16 = sum(dev_tot[dv] * d2[dv] ** 4 for dv in dev_tot)
    per_g = defaultdict(lambda: [0, 0])
    for g, dv, c in cells:
        per_g[g][0] += c
        per_g[g][1] += c * d2[dv] * d2[dv]
    num = sum(float(s4) * s4 / ng for ng, s4 in per_g.values()) * n \
        - float(a4) * a4
    den = float(n * b16 - a4 * a4)
    return (n - 1.0) * num / den, len(per_g), n


def q_conover_squared_ranks_types(sf_dir: str):
    """Conover squared-ranks scale test of event values across the
    five event types — completes the repo's variance-test ladder
    (bartlett: normal-theory; brown_forsythe: median ANOVA;
    fligner_killeen: normal scores; THIS: squared ranks, the variant
    with the cleanest exact-integer closure).  Same bounded
    (type, cents) histogram shuffle as fligner_killeen_types;
    deviations are median-centered so they stay exact integers; df=4
    → closed-form even-df chi-square tail."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t.column("value"), 100), 0),
                    pa.int64())
        g = pa.table({
            "ty": t.column("event_type"), "v": v,
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by(["ty", "v"]).aggregate([("c", "sum")])
        return g.rename_columns(["ty", "v", "c"])

    m = _partial_final(ds, partial, ["ty", "v"], [("c", "sum")])
    ty = m.column("ty").to_pylist()
    v = np.asarray(m.column("v"), dtype=np.int64)
    c = np.asarray(m.column("c"), dtype=np.int64)
    tya = np.asarray(ty)
    cells = []
    for t_ in sorted(set(ty)):
        sel = tya == t_
        vs, cs = v[sel], c[sel]
        o = np.argsort(vs)
        vs, cs = vs[o], cs[o]
        k = (int(cs.sum()) + 1) // 2
        med = int(vs[np.searchsorted(np.cumsum(cs), k)])
        for dv, cc_ in zip(np.abs(vs - med).tolist(), cs.tolist()):
            cells.append((t_, int(dv), int(cc_)))
    t_stat, k, n = conover_squared_ranks(cells)
    p = math.exp(-t_stat / 2.0) * (1.0 + t_stat / 2.0)   # df = 4, even
    return pa.table({
        "k_groups": pa.array([k], pa.int64()),
        "n_total": pa.array([n], pa.int64()),
        "conover_t": pa.array([round(t_stat, 6)], pa.float64()),
        "p_value": pa.array([round(p, 6)], pa.float64()),
    })


SQL_CONOVER_SQUARED_RANKS = """
WITH h AS (
  SELECT event_type AS ty,
         CAST(round(value * 100, 0) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
med AS (
  SELECT ty, min(v) AS med FROM (
    SELECT ty, v, sum(c) OVER (PARTITION BY ty ORDER BY v) AS cum,
           sum(c) OVER (PARTITION BY ty) AS tot
    FROM h)
  WHERE cum >= (tot + 1) // 2 GROUP BY ty),
dev AS (
  SELECT h.ty, abs(h.v - med.med) AS dv, CAST(sum(c) AS BIGINT) AS c
  FROM h JOIN med USING (ty) GROUP BY 1, 2),
pool AS (
  SELECT dv, CAST(sum(c) AS BIGINT) AS t FROM dev GROUP BY 1),
rk AS (
  SELECT dv,
         2 * coalesce(sum(t) OVER (ORDER BY dv ROWS BETWEEN
             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS d2
  FROM pool),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM dev),
mom AS (
  SELECT CAST(sum(CAST(pool.t AS HUGEINT) * rk.d2 * rk.d2)
              AS HUGEINT) AS a4,
         CAST(sum(CAST(pool.t AS HUGEINT) * rk.d2 * rk.d2
                  * rk.d2 * rk.d2) AS HUGEINT) AS b16
  FROM pool JOIN rk USING (dv)),
grp AS (
  SELECT dev.ty, CAST(sum(dev.c) AS BIGINT) AS ni,
         CAST(sum(CAST(dev.c AS HUGEINT) * rk.d2 * rk.d2)
              AS HUGEINT) AS s4
  FROM dev JOIN rk USING (dv) GROUP BY 1),
num AS (
  SELECT sum(CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / ni) AS sgg,
         count(*) AS k
  FROM grp),
x AS (
  SELECT num.k, nn.n,
         (nn.n - 1.0)
           * (num.sgg * nn.n
              - CAST(mom.a4 AS DOUBLE) * CAST(mom.a4 AS DOUBLE))
           / CAST(nn.n * mom.b16 - mom.a4 * mom.a4 AS DOUBLE) AS t
  FROM num, nn, mom)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_total,
       round(t, 6) AS conover_t,
       round(exp(-t / 2.0) * (1.0 + t / 2.0), 6) AS p_value
FROM x
"""

QUERIES["conover_squared_ranks_types"] = (q_conover_squared_ranks_types,
                                          SQL_CONOVER_SQUARED_RANKS)


# ---------------------------------------------------------------------------
# bws_weekend_weekday — Baumgartner-Weiss-Schindler two-sample test
# ---------------------------------------------------------------------------


def bws_from_ranks(rx, ry) -> tuple:
    """BWS statistic from pooled ranks: rx = sorted pooled ranks of
    sample X (ascending), ry likewise for Y.  B_X weights the squared
    rank-ECDF gap by the null variance 1/(F(1−F)):

      B_X = (1/n) Σ_i (R_i − N/n·i)² /
                    [ i/(n+1)·(1−i/(n+1)) · m·N/n ]

    (n = |X|, m = |Y|, N = n+m); B = (B_X + B_Y)/2.  Returns
    (b_x, b_y, b)."""
    def half(r, n, m):
        nn = n + m
        acc = 0.0
        for i, ri in enumerate(r, start=1):
            u = i / (n + 1.0)
            acc += (ri - nn / n * i) ** 2 \
                / (u * (1.0 - u) * m * nn / n)
        return acc / n

    bx = half(rx, len(rx), len(ry))
    by = half(ry, len(ry), len(rx))
    return bx, by, (bx + by) / 2.0


def q_bws_weekend_weekday(sf_dir: str):
    """Baumgartner-Weiss-Schindler test of weekend vs weekday daily
    revenue — the variance-weighted rank-ECDF two-sample test: where
    ks_weekend_weekday takes the max ECDF gap (tail-blind) and
    cvm-style tests integrate it unweighted, BWS divides by the null
    variance F(1−F), recovering power in the tails.  Days-bounded:
    pooled ranks over ~N days via the one bounded daily-revenue
    reduce; ranks are positions in the strict (cents, day) total
    order — deterministic under (improbable) revenue ties, mirrored
    in the oracle's ORDER BY."""
    day, cv = _daily_revenue_cents(sf_dir)
    dow = ((day + 4) % 7).astype(np.int64)
    we = (dow == 5) | (dow == 6)
    order = np.lexsort((day, cv))
    pooled_we = we[order]
    ranks = np.arange(1, len(cv) + 1)
    rx = ranks[pooled_we].tolist()       # weekend pooled ranks
    ry = ranks[~pooled_we].tolist()
    bx, by, b = bws_from_ranks(rx, ry)
    return pa.table({
        "n_weekend": pa.array([len(rx)], pa.int64()),
        "n_weekday": pa.array([len(ry)], pa.int64()),
        "b_weekend": pa.array([round(bx, 6)], pa.float64()),
        "b_weekday": pa.array([round(by, 6)], pa.float64()),
        "bws_b": pa.array([round(b, 6)], pa.float64()),
    })


SQL_BWS_WEEKEND_WEEKDAY = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
r AS (
  SELECT CASE WHEN (day + 4) % 7 IN (5, 6) THEN 1 ELSE 0 END AS we,
         row_number() OVER (ORDER BY cents, day) AS rk
  FROM d),
g AS (
  SELECT we, rk,
         row_number() OVER (PARTITION BY we ORDER BY rk) AS i,
         count(*) OVER (PARTITION BY we) AS n,
         count(*) OVER () - count(*) OVER (PARTITION BY we) AS m
  FROM r),
b AS (
  SELECT we, max(n) AS n,
         sum(pow(rk - CAST(n + m AS DOUBLE) / n * i, 2)
             / ((i / (n + 1.0)) * (1.0 - i / (n + 1.0))
                * m * CAST(n + m AS DOUBLE) / n)) / max(n) AS bh
  FROM g GROUP BY we)
SELECT (SELECT CAST(n AS BIGINT) FROM b WHERE we = 1) AS n_weekend,
       (SELECT CAST(n AS BIGINT) FROM b WHERE we = 0) AS n_weekday,
       (SELECT round(bh, 6) FROM b WHERE we = 1) AS b_weekend,
       (SELECT round(bh, 6) FROM b WHERE we = 0) AS b_weekday,
       round(((SELECT bh FROM b WHERE we = 1)
            + (SELECT bh FROM b WHERE we = 0)) / 2.0, 6) AS bws_b
"""

QUERIES["bws_weekend_weekday"] = (q_bws_weekend_weekday,
                                  SQL_BWS_WEEKEND_WEEKDAY)


# ---------------------------------------------------------------------------
# ww_runs_weekend_weekday — Wald-Wolfowitz two-sample runs test
# ---------------------------------------------------------------------------


def ww_runs(labels) -> int:
    """Run count of a 0/1 label sequence."""
    r = 0
    prev = None
    for x in labels:
        if x != prev:
            r += 1
            prev = x
    return r


def q_ww_runs_weekend_weekday(sf_dir: str):
    """Wald-Wolfowitz two-sample runs test: sort the N days by
    revenue ((cents, day) strict order shared with
    bws_weekend_weekday) and count runs of the weekend/weekday label.
    Too FEW runs ⇒ the samples separate somewhere along the value
    axis — the classic omnibus sensitive to ANY distributional
    difference (location, scale, or shape), the coarse sibling of
    ks/bws/cucconi.  μ = 2n₁n₂/N + 1 and σ² in exact integer
    ratios; z continuity-corrected toward the mean."""
    day, cv = _daily_revenue_cents(sf_dir)
    dow = ((day + 4) % 7).astype(np.int64)
    we = ((dow == 5) | (dow == 6)).astype(np.int64)
    order = np.lexsort((day, cv))
    lab = we[order].tolist()
    r = ww_runs(lab)
    n1 = int(we.sum())
    n2 = len(lab) - n1
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1.0
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    z = (r - mu + (0.5 if r < mu else -0.5)) / math.sqrt(var)
    p = 2.0 * (1.0 - phi_as(abs(z)))
    return pa.table({
        "n_weekend": pa.array([n1], pa.int64()),
        "n_weekday": pa.array([n2], pa.int64()),
        "n_runs": pa.array([r], pa.int64()),
        "mu_runs": pa.array([round(mu, 6)], pa.float64()),
        "z_stat": pa.array([round(z, 6)], pa.float64()),
        "p_value": pa.array([round(p, 6)], pa.float64()),
    })


def _phi_sql(zexpr: str) -> str:
    """Scalar SQL mirror of ``phi_as`` (A&S 7.1.26 erf polynomial) —
    the same expression tree both engines evaluate."""
    return (f"(SELECT 0.5 * (1.0 + (CASE WHEN z >= 0 THEN 1.0 "
            f"ELSE -1.0 END) * (1.0 - (((((1.061405429 * t "
            f"- 1.453152027) * t) + 1.421413741) * t "
            f"- 0.284496736) * t + 0.254829592) * t "
            f"* exp(-(a * a)))) "
            f"FROM (SELECT {zexpr} AS z) zz, "
            f"LATERAL (SELECT abs(z) / sqrt(2.0) AS a) aa, "
            f"LATERAL (SELECT 1.0 / (1.0 + 0.3275911 * a) AS t) tt)")


def _ww_runs_sql() -> str:
    phi = _phi_sql("abs(zs)")
    return f"""
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
s AS (
  SELECT CASE WHEN (day + 4) % 7 IN (5, 6) THEN 1 ELSE 0 END AS we,
         row_number() OVER (ORDER BY cents, day) AS rk
  FROM d),
runs AS (
  SELECT CAST(sum(CASE WHEN prev IS NULL OR we <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM (SELECT we, lag(we) OVER (ORDER BY rk) AS prev FROM s)),
cnt AS (
  SELECT CAST(sum(we) AS BIGINT) AS n1,
         CAST(sum(1 - we) AS BIGINT) AS n2,
         CAST(count(*) AS BIGINT) AS n
  FROM s),
z AS (
  SELECT runs.r, cnt.n1, cnt.n2, cnt.n,
         2.0 * n1 * n2 / n + 1.0 AS mu,
         2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
           / (CAST(n AS DOUBLE) * n * (n - 1.0)) AS var
  FROM runs, cnt),
zz AS (
  SELECT n1, n2, r, mu,
         (r - mu + CASE WHEN r < mu THEN 0.5 ELSE -0.5 END)
           / sqrt(var) AS zs
  FROM z)
SELECT n1 AS n_weekend, n2 AS n_weekday, r AS n_runs,
       round(mu, 6) AS mu_runs,
       round(zs, 6) AS z_stat,
       round(2.0 * (1.0 - {phi}), 6) AS p_value
FROM zz
"""


QUERIES["ww_runs_weekend_weekday"] = (q_ww_runs_weekend_weekday,
                                      _ww_runs_sql())


# ---------------------------------------------------------------------------
# cooks_distance_daily — OLS influence diagnostics (leverage / Cook / PRESS)
# ---------------------------------------------------------------------------


def cooks_diag(xs, ys) -> dict:
    """OLS y ~ a + b·x influence diagnostics from exact integer
    moments: leverage h_i = 1/n + (n·x_i − Sx)²/(n·Dxx) with
    Dxx = n·Σx² − Sx², residuals e_i, s² = SSE/(n−2), Cook's
    D_i = e_i²·h_i / (p·s²·(1−h_i)²) with p = 2, PRESS =
    Σ (e_i/(1−h_i))².  Returns the summary dict."""
    n = len(xs)
    sx = sum(xs)
    sy = sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    dxx = n * sxx - sx * sx
    b = (n * sxy - sx * sy) / dxx
    a = (sy - b * sx) / n
    es = [y - a - b * x for x, y in zip(xs, ys)]
    sse = sum(e * e for e in es)
    s2 = sse / (n - 2.0)
    hs = [1.0 / n + (n * x - sx) ** 2 / (n * float(dxx)) for x in xs]
    ds = [e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
          for e, h in zip(es, hs)]
    press = sum((e / (1.0 - h)) ** 2 for e, h in zip(es, hs))
    infl = sum(1 for d in ds if d > 4.0 / n)
    top = max(range(n), key=lambda i: (ds[i], -xs[i]))
    return {"n": n, "sse": sse, "press": press, "n_influential": infl,
            "top_i": top, "top_d": ds[top], "top_h": hs[top]}


def q_cooks_distance_daily(sf_dir: str):
    """Influence diagnostics of the daily-revenue OLS trend: which
    days OWN the slope that events_trend_slope / newey_west_hac /
    breusch_* inferences rest on?  Leverage from exact integer x
    moments, Cook's D with the 4/n flag threshold, PRESS (the
    leave-one-out SSE in closed form — the kfold_ols_cv statistic
    without refitting), and the single most influential day
    (ties broken toward the earlier day).  Days-bounded driver
    closure; both engines share the float expression tree."""
    day, cv = _daily_revenue_cents(sf_dir)
    xs = day.tolist()
    ys = cv.tolist()
    d = cooks_diag(xs, ys)
    return pa.table({
        "n_days": pa.array([d["n"]], pa.int64()),
        "sse_log10": pa.array([round(math.log10(d["sse"]), 6)],
                              pa.float64()),
        "press_log10": pa.array([round(math.log10(d["press"]), 6)],
                                pa.float64()),
        "n_influential": pa.array([d["n_influential"]], pa.int64()),
        "top_day": pa.array([xs[d["top_i"]]], pa.int64()),
        "top_cooks_d": pa.array([round(d["top_d"], 6)], pa.float64()),
        "top_leverage": pa.array([round(d["top_h"], 6)], pa.float64()),
    })


SQL_COOKS_DISTANCE_DAILY = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(day) AS HUGEINT) AS sx,
         CAST(sum(cents) AS HUGEINT) AS sy,
         CAST(sum(CAST(day AS HUGEINT) * day) AS HUGEINT) AS sxx,
         CAST(sum(CAST(day AS HUGEINT) * cents) AS HUGEINT) AS sxy
  FROM d),
fit AS (
  SELECT n, sx, sy,
         CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b
  FROM m),
fit2 AS (
  SELECT n, sx, dxx, b,
         (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / n AS a
  FROM fit),
eh AS (
  SELECT d.day,
         d.cents - f.a - f.b * d.day AS e,
         1.0 / f.n + pow(f.n * CAST(d.day AS DOUBLE)
                         - CAST(f.sx AS DOUBLE), 2)
           / (f.n * f.dxx) AS h,
         f.n
  FROM d, fit2 f),
sse AS (SELECT sum(e * e) AS sse, max(n) AS n FROM eh),
cook AS (
  SELECT eh.day, eh.e, eh.h,
         eh.e * eh.e * eh.h
           / (2.0 * (sse.sse / (sse.n - 2.0))
              * (1.0 - eh.h) * (1.0 - eh.h)) AS cd
  FROM eh, sse),
top AS (
  SELECT day, cd, h FROM cook ORDER BY cd DESC, day ASC LIMIT 1)
SELECT sse.n AS n_days,
       round(log10(sse.sse), 6) AS sse_log10,
       round(log10((SELECT sum(pow(e / (1.0 - h), 2)) FROM eh)), 6)
         AS press_log10,
       (SELECT CAST(count(*) AS BIGINT) FROM cook, sse
        WHERE cd > 4.0 / sse.n) AS n_influential,
       (SELECT day FROM top) AS top_day,
       (SELECT round(cd, 6) FROM top) AS top_cooks_d,
       (SELECT round(h, 6) FROM top) AS top_leverage
FROM sse
"""

QUERIES["cooks_distance_daily"] = (q_cooks_distance_daily,
                                   SQL_COOKS_DISTANCE_DAILY)


# ---------------------------------------------------------------------------
# shapiro_francia_daily — Blom normal-scores correlation normality test
# ---------------------------------------------------------------------------


def shapiro_francia(ys) -> tuple:
    """W' = corr(x_(i), m_i)² with Blom scores m_i =
    Φ⁻¹((i−3/8)/(n+1/4)); lower-half scores by symmetry
    m(u) = −m(1−u) so Σm = 0 exactly in both engines.  Returns
    (n, wprime)."""
    x = sorted(ys)
    n = len(x)
    ms = []
    for i in range(1, n + 1):
        u = (i - 0.375) / (n + 0.25)
        ms.append(inv_phi_upper(u) if u >= 0.5
                  else -inv_phi_upper(1.0 - u))
    sx = sum(x)
    smx = sum(m * v for m, v in zip(ms, x))
    smm = sum(m * m for m in ms)
    sxx = sum(v * v for v in x)
    w = smx * smx / (smm * (sxx - sx * float(sx) / n))
    return n, w


def q_shapiro_francia_daily(sf_dir: str):
    """Shapiro-Francia normality test of daily revenue: the
    correlation between order statistics and Blom normal scores —
    the order-statistic member of the normality battery (lilliefors:
    ECDF distance; dagostino_k2/jarque_bera: moments; THIS: QQ-plot
    straightness, the most powerful of the three against heavy
    tails).  Acklam's Φ⁻¹ shared verbatim with the oracle; scores
    antisymmetrized so both engines agree bit-for-bit."""
    _, cv = _daily_revenue_cents(sf_dir)
    n, w = shapiro_francia(cv.tolist())
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "w_prime": pa.array([round(w, 6)], pa.float64()),
    })


def _shapiro_francia_sql() -> str:
    up = _acklam_sql("u0")
    lo = _acklam_sql("1.0 - u0")
    return f"""
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
o AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, day) AS i,
         count(*) OVER () AS n
  FROM d),
sc AS (
  SELECT cents, n,
         CASE WHEN u0 >= 0.5 THEN {up} ELSE -({lo}) END AS m
  FROM (SELECT cents, n, (i - 0.375) / (n + 0.25) AS u0 FROM o)),
s AS (
  SELECT max(n) AS n,
         CAST(sum(cents) AS HUGEINT) AS sx,
         CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sxx,
         sum(m * cents) AS smx, sum(m * m) AS smm
  FROM sc)
SELECT CAST(n AS BIGINT) AS n_days,
       round(smx * smx
             / (smm * (CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)),
             6) AS w_prime
FROM s
"""


QUERIES["shapiro_francia_daily"] = (q_shapiro_francia_daily,
                                    _shapiro_francia_sql())
