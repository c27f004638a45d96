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

from ..stages import aggregate as agg
from .queries import QUERIES, _partial_final, _read
from .queries_ext3 import (_daily_revenue_cents, _hourly_type_series_by,
                           phi_as)
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


# ---------------------------------------------------------------------------
# breslow_day_hourseg — homogeneity of the odds ratio across strata
# ---------------------------------------------------------------------------


def breslow_day(cells) -> tuple:
    """Breslow-Day homogeneity test with Tarone's correction over 2×2
    strata [(a, b, c, d)] against the Mantel-Haenszel pooled OR ψ:
    fitted â_k solves the quadratic â²(ψ−1) − â[ψ(r₁+c₁)+(r₀−c₁)]
    + ψr₁c₁ = 0 (the root with all four fitted cells positive),
    V_k = 1/(1/â + 1/b̂ + 1/ĉ + 1/d̂), X² = Σ(a−â)²/V, Tarone
    subtracts (Σ(a−â))²/ΣV.  Returns (x2_bd, x2_tarone, k_used,
    psi)."""
    num = den = 0.0
    for a, b, c, d in cells:
        n = a + b + c + d
        if n == 0:
            continue
        num += a * d / float(n)
        den += b * c / float(n)
    psi = num / den
    x2 = 0.0
    sdev = 0.0
    sv = 0.0
    k_used = 0
    for a, b, c, d in cells:
        r1 = a + b
        r0 = c + d
        c1 = a + c
        if r1 == 0 or r0 == 0 or c1 == 0 or (b + d) == 0:
            continue
        qa = psi - 1.0
        qb = psi * (r1 + c1) + (r0 - c1)
        qc = psi * r1 * c1
        if abs(qa) < 1e-12:
            ahat = qc / qb
        else:
            disc = math.sqrt(qb * qb - 4.0 * qa * qc)
            ahat = (qb - disc) / (2.0 * qa)
            if not (0.0 < ahat < min(r1, c1)
                    and r0 - c1 + ahat > 0.0):
                ahat = (qb + disc) / (2.0 * qa)
        bhat = r1 - ahat
        chat = c1 - ahat
        dhat = r0 - c1 + ahat
        v = 1.0 / (1.0 / ahat + 1.0 / bhat + 1.0 / chat + 1.0 / dhat)
        x2 += (a - ahat) * (a - ahat) / v
        sdev += a - ahat
        sv += v
        k_used += 1
    return x2, x2 - sdev * sdev / sv, k_used, psi


def q_breslow_day_hourseg(sf_dir: str):
    """Breslow-Day homogeneity of the click/view × above-median-value
    odds ratio across FIVE hour-of-day segments (0-4, 5-9, 10-14,
    15-19, 20-23) — the gate that licenses the mantel_haenszel_or /
    cmh_test_hour pooled summary: if the OR varies by stratum, the
    pooled number is a fiction.  woolf_or_homogeneity asks the same
    question with log-OR weights over day segments; Breslow-Day is
    the exact-fitted-cell version (and Tarone's correction makes it
    asymptotically correct when ψ is MH-estimated).  df = 4 → even-df
    closed-form tail; same bounded (type, seg, cents) partials and
    exact ceil-rank median as the CMH row."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        pa.array(["click", "view"]))
        t = t.filter(keep)
        seg = pc.cast(pc.divide(pc.cast(pc.hour(t.column("ts")),
                                        pa.int64()),
                                pa.scalar(5, pa.int64())), pa.int64())
        v = pc.cast(pc.round(pc.multiply(t.column("value"), 100), 0),
                    pa.int64())
        g = pa.table({
            "ty": t.column("event_type"), "seg": seg, "v": v,
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by(["ty", "seg", "v"]).aggregate([("c", "sum")])
        return g.rename_columns(["ty", "seg", "v", "c"])

    m = _partial_final(ds, partial, ["ty", "seg", "v"], [("c", "sum")])
    ty = np.asarray(m.column("ty").to_pylist())
    sg = np.asarray(m.column("seg"), dtype=np.int64)
    vv = np.asarray(m.column("v"), dtype=np.int64)
    cc = np.asarray(m.column("c"), dtype=np.int64)
    vu = np.unique(vv)
    cvu = np.zeros(len(vu), dtype=np.int64)
    np.add.at(cvu, np.searchsorted(vu, vv), cc)
    n = int(cvu.sum())
    med = int(vu[np.searchsorted(np.cumsum(cvu), (n + 1) // 2)])
    hi = vv > med
    exp_ = ty == "click"
    cells = []
    for s in range(5):
        sh = sg == s
        cells.append((int(cc[sh & exp_ & hi].sum()),
                      int(cc[sh & exp_ & ~hi].sum()),
                      int(cc[sh & ~exp_ & hi].sum()),
                      int(cc[sh & ~exp_ & ~hi].sum())))
    x2, x2t, k_used, psi = breslow_day(cells)
    p = math.exp(-x2t / 2.0) * (1.0 + x2t / 2.0)     # df = 4, even
    return pa.table({
        "k_strata": pa.array([k_used], pa.int64()),
        "psi_mh": pa.array([round(psi, 6)], pa.float64()),
        "bd_chi2": pa.array([round(x2, 6)], pa.float64()),
        "tarone_chi2": pa.array([round(x2t, 6)], pa.float64()),
        "p_value": pa.array([round(p, 6)], pa.float64()),
    })


SQL_BRESLOW_DAY_HOURSEG = """
WITH e AS (
  SELECT event_type AS ty, CAST(hour(ts) AS BIGINT) // 5 AS seg,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'view')),
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
med AS (
  SELECT min(v) AS med FROM (
    SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hist), tot
  WHERE cum >= (tot.n + 1) // 2),
cells AS (
  SELECT seg,
         CAST(count(*) FILTER (ty = 'click' AND v > med.med)
              AS BIGINT) AS a,
         CAST(count(*) FILTER (ty = 'click' AND v <= med.med)
              AS BIGINT) AS b,
         CAST(count(*) FILTER (ty = 'view' AND v > med.med)
              AS BIGINT) AS c,
         CAST(count(*) FILTER (ty = 'view' AND v <= med.med)
              AS BIGINT) AS d
  FROM e, med GROUP BY 1),
psi AS (
  SELECT sum(CAST(a AS DOUBLE) * d / (a + b + c + d))
       / sum(CAST(b AS DOUBLE) * c / (a + b + c + d)) AS psi
  FROM cells WHERE a + b + c + d > 0),
fit AS (
  SELECT cells.seg, cells.a, psi.psi,
         (qb - sqrt(qb * qb - 4.0 * qa * qc0)) / (2.0 * qa) AS r1_,
         (qb + sqrt(qb * qb - 4.0 * qa * qc0)) / (2.0 * qa) AS r2_,
         cells.a + cells.b AS r1, cells.c + cells.d AS r0,
         cells.a + cells.c AS c1
  FROM cells, psi,
       LATERAL (SELECT psi.psi - 1.0 AS qa,
                       psi.psi * (cells.a + cells.b + cells.a
                                  + cells.c)
                         + (cells.c + cells.d - cells.a - cells.c)
                         AS qb,
                       psi.psi * (cells.a + cells.b)
                         * (cells.a + cells.c) AS qc0) q
  WHERE cells.a + cells.b > 0 AND cells.c + cells.d > 0
    AND cells.a + cells.c > 0 AND cells.b + cells.d > 0),
ahat AS (
  SELECT seg, a, psi,
         CASE WHEN r1_ > 0 AND r1_ < least(r1, c1)
                   AND r0 - c1 + r1_ > 0
              THEN r1_ ELSE r2_ END AS ah,
         r1, r0, c1
  FROM fit),
terms AS (
  SELECT seg, a, ah, psi,
         1.0 / (1.0 / ah + 1.0 / (r1 - ah) + 1.0 / (c1 - ah)
                + 1.0 / (r0 - c1 + ah)) AS v
  FROM ahat),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS k, max(psi) AS psi,
         sum((a - ah) * (a - ah) / v) AS x2,
         sum(a - ah) AS sdev, sum(v) AS sv
  FROM terms)
SELECT k AS k_strata, round(psi, 6) AS psi_mh,
       round(x2, 6) AS bd_chi2,
       round(x2 - sdev * sdev / sv, 6) AS tarone_chi2,
       round(exp(-(x2 - sdev * sdev / sv) / 2.0)
             * (1.0 + (x2 - sdev * sdev / sv) / 2.0), 6) AS p_value
FROM s
"""

QUERIES["breslow_day_hourseg"] = (q_breslow_day_hourseg,
                                  SQL_BRESLOW_DAY_HOURSEG)


# ---------------------------------------------------------------------------
# stuart_maxwell_quartiles — marginal homogeneity of the 4×4 confusion
# ---------------------------------------------------------------------------


def stuart_maxwell(cells: dict, k: int = 4) -> tuple:
    """Stuart-Maxwell marginal-homogeneity χ² from an integer k×k
    contingency map {(i, j): count}: d_i = rᵢ − cᵢ (last category
    dropped), S_ii = rᵢ + cᵢ − 2oᵢᵢ, S_ij = −(oᵢⱼ + oⱼᵢ);
    χ² = d'S⁻¹d via the exact-integer 3×3 adjugate — one float
    division at the very end.  Returns (chi2, det) with chi2 None on
    a singular S."""
    r = [0] * k
    c = [0] * k
    for (i, j), v in cells.items():
        r[i] += v
        c[j] += v
    d = [r[i] - c[i] for i in range(k - 1)]
    s = [[0] * (k - 1) for _ in range(k - 1)]
    for i in range(k - 1):
        s[i][i] = r[i] + c[i] - 2 * cells.get((i, i), 0)
        for j in range(k - 1):
            if i != j:
                s[i][j] = -(cells.get((i, j), 0)
                            + cells.get((j, i), 0))
    # 3×3 adjugate / determinant, exact integers
    a, b_, cc_ = s[0]
    d_, e, f = s[1]
    g, h, i_ = s[2]
    det = (a * (e * i_ - f * h) - b_ * (d_ * i_ - f * g)
           + cc_ * (d_ * h - e * g))
    if det == 0:
        return None, 0
    adj = [
        [e * i_ - f * h, cc_ * h - b_ * i_, b_ * f - cc_ * e],
        [f * g - d_ * i_, a * i_ - cc_ * g, cc_ * d_ - a * f],
        [d_ * h - e * g, b_ * g - a * h, a * e - b_ * d_],
    ]
    quad = sum(d[i] * adj[i][j] * d[j]
               for i in range(3) for j in range(3))
    return quad / float(det), det


def q_stuart_maxwell_quartiles(sf_dir: str):
    """Stuart-Maxwell marginal-homogeneity test of the per-user
    click-value vs view-value quartile confusion — do the two
    rankings put the same MASS in each quartile?  The marginal
    companion of weighted_kappa_quartiles (agreement) and
    bowker_symmetry_langid (cell symmetry; Bowker tests oᵢⱼ = oⱼᵢ,
    Stuart-Maxwell the weaker rᵢ = cᵢ): χ² = d'S⁻¹d via exact
    integer 3×3 adjugate, df = 3 → closed-form odd-df tail
    2(1−Φ(√x)) + √(2x/π)·e^(−x/2) with the shared Φ.  Same bounded
    per-user shuffle and deterministic (cents, user) quartile ranks
    as the kappa row."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        pa.array(["click", "view"]))
        t = t.filter(keep)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("value"), 100), 0), pa.int64())
        is_c = pc.cast(pc.equal(t.column("event_type"), "click"),
                       pa.int64())
        g = pa.table({
            "user_id": t.column("user_id"),
            "cc": pc.multiply(cents, is_c),
            "vc": pc.multiply(cents, pc.subtract(
                pa.scalar(1, pa.int64()), is_c)),
        }).group_by("user_id").aggregate([("cc", "sum"),
                                          ("vc", "sum")])
        return g.rename_columns(["user_id", "cc", "vc"])

    m = _partial_final(ds, partial, ["user_id"],
                       [("cc", "sum"), ("vc", "sum")])
    uid = np.asarray(m.column("user_id"), dtype=np.int64)
    cc = np.asarray(m.column("cc"), dtype=np.int64)
    vc = np.asarray(m.column("vc"), dtype=np.int64)
    n = len(uid)

    def quart(vals):
        order = np.lexsort((uid, vals))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        return (4 * rank) // n

    qc = quart(cc)
    qv = quart(vc)
    cells = {}
    for a, b in zip(qc.tolist(), qv.tolist()):
        cells[(a, b)] = cells.get((a, b), 0) + 1
    chi2, det = stuart_maxwell(cells)
    if chi2 is None:
        p = None
    else:
        p = (2.0 * (1.0 - phi_as(math.sqrt(chi2)))
             + math.sqrt(2.0 * chi2 / math.pi)
             * math.exp(-chi2 / 2.0))
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "sm_chi2": pa.array(
            [round(chi2, 6) if chi2 is not None else None],
            pa.float64()),
        "p_value": pa.array(
            [round(p, 6) if p is not None else None], pa.float64()),
    })


def _stuart_maxwell_sql() -> str:
    phi = _phi_sql("sqrt(chi2)")
    return f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cc,
         CAST(sum(CASE WHEN event_type = 'view'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS vc
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1),
q AS (
  SELECT user_id,
         (4 * (row_number() OVER (ORDER BY cc, user_id) - 1))
           // (count(*) OVER ()) AS qc,
         (4 * (row_number() OVER (ORDER BY vc, user_id) - 1))
           // (count(*) OVER ()) AS qv
  FROM u),
cm AS (SELECT qc, qv, CAST(count(*) AS BIGINT) AS o
       FROM q GROUP BY 1, 2),
o AS (
  SELECT coalesce((SELECT o FROM cm WHERE qc = i.i AND qv = j.j), 0)
           AS o, i.i, j.j
  FROM range(4) i(i), range(4) j(j)),
marg AS (
  SELECT i, CAST(sum(o) AS BIGINT) AS r,
         (SELECT CAST(sum(o2.o) AS BIGINT) FROM o o2
          WHERE o2.j = o.i) AS c
  FROM o GROUP BY i),
sm AS (
  SELECT
    (SELECT r - c FROM marg WHERE i = 0) AS d0,
    (SELECT r - c FROM marg WHERE i = 1) AS d1,
    (SELECT r - c FROM marg WHERE i = 2) AS d2,
    (SELECT r + c FROM marg WHERE i = 0)
      - 2 * (SELECT o FROM o WHERE i = 0 AND j = 0) AS a,
    -((SELECT o FROM o WHERE i = 0 AND j = 1)
      + (SELECT o FROM o WHERE i = 1 AND j = 0)) AS b,
    -((SELECT o FROM o WHERE i = 0 AND j = 2)
      + (SELECT o FROM o WHERE i = 2 AND j = 0)) AS cx,
    (SELECT r + c FROM marg WHERE i = 1)
      - 2 * (SELECT o FROM o WHERE i = 1 AND j = 1) AS e,
    -((SELECT o FROM o WHERE i = 1 AND j = 2)
      + (SELECT o FROM o WHERE i = 2 AND j = 1)) AS f,
    (SELECT r + c FROM marg WHERE i = 2)
      - 2 * (SELECT o FROM o WHERE i = 2 AND j = 2) AS ii),
det AS (
  SELECT sm.*,
         a * (e * ii - f * f) - b * (b * ii - f * cx)
           + cx * (b * f - e * cx) AS det
  FROM sm),
chi AS (
  SELECT det,
         CAST(d0 * ((e * ii - f * f) * d0 + (cx * f - b * ii) * d1
                    + (b * f - cx * e) * d2)
            + d1 * ((f * cx - b * ii) * d0 + (a * ii - cx * cx) * d1
                    + (cx * b - a * f) * d2)
            + d2 * ((b * f - e * cx) * d0 + (b * cx - a * f) * d1
                    + (a * e - b * b) * d2)
              AS DOUBLE) / det AS chi2
  FROM det),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u)
SELECT nn.n AS n_users,
       CASE WHEN det <> 0 THEN round(chi2, 6) END AS sm_chi2,
       CASE WHEN det <> 0 THEN
         round(2.0 * (1.0 - {phi})
               + sqrt(2.0 * chi2 / pi()) * exp(-chi2 / 2.0), 6)
       END AS p_value
FROM chi, nn
"""


QUERIES["stuart_maxwell_quartiles"] = (q_stuart_maxwell_quartiles,
                                        _stuart_maxwell_sql())


# ---------------------------------------------------------------------------
# lsm_tiered_write_amp — size-tiered compaction write-amplification
# ---------------------------------------------------------------------------

_LSM_ROW_BYTES = 64       # modeled serialized row width
_LSM_HEADER = 4096        # per-sstable fixed overhead
_LSM_FANIN = 4            # tables merged per tier promotion
_LSM_MAX_LVL = 6          # 4^6 = 4096 > any hourly flush count here


def lsm_tiered_levels(flush_bytes) -> list:
    """Exact size-tiered compaction accounting over an ordered flush
    sequence.  With fan-in T, a level-l merge completes after every
    T^l flushes and rewrites exactly the bytes of the T^l flushes it
    covers, so total bytes written at level l is the prefix sum up to
    T^l·⌊n/T^l⌋ — base-T counter arithmetic collapses the whole
    simulation to a per-level closed form (no replay needed).
    Returns [(level, n_merges, bytes_written)] for levels with
    activity; level 0 is the flush pass itself."""
    n = len(flush_bytes)
    prefix = [0]
    for b in flush_bytes:
        prefix.append(prefix[-1] + b)
    out = []
    for lvl in range(_LSM_MAX_LVL + 1):
        span = _LSM_FANIN ** lvl
        merges = n // span
        if merges == 0:
            break
        out.append((lvl, merges, prefix[span * merges]))
    return out


def q_lsm_tiered_write_amp(sf_dir: str):
    """Size-tiered LSM write-amplification planner over the hourly
    event stream: each hour's events form one memtable flush
    (64 B/row + 4 KiB header), tier fan-in 4 — how many times does a
    byte get rewritten before it settles?  The write-path companion
    of partition_count_planner / codec_selector_audit: an engine that
    owns its Parquet layout (stages/route.py) must budget compaction
    I/O before choosing between append-heavy and rewrite-heavy sink
    layouts.  The closed form (prefix sums at base-4 boundaries)
    replaces the naive replay, so the audit costs one bounded hourly
    reduce at any scale.  cum_wa_ppm on the last row is the headline:
    total bytes written per byte flushed, in ppm."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        g = pa.table({
            "hour": pa.array(tsv // 3_600_000_000),
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by("hour").aggregate([("c", "sum")])
        return g.rename_columns(["hour", "c"])

    m = _partial_final(ds, partial, ["hour"], [("c", "sum")])
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    cv = np.asarray(m.column("c"), dtype=np.int64)
    o = np.argsort(hr)
    fb = (cv[o] * _LSM_ROW_BYTES + _LSM_HEADER).tolist()
    rows = lsm_tiered_levels(fb)
    flushed = rows[0][2]
    cum = 0
    lvls, mrg, byt, wa = [], [], [], []
    for lvl, nm, b in rows:
        cum += b
        lvls.append(lvl)
        mrg.append(nm)
        byt.append(b)
        wa.append(cum * 1_000_000 // flushed)
    return pa.table({
        "level": pa.array(lvls, pa.int64()),
        "n_merges": pa.array(mrg, pa.int64()),
        "bytes_written": pa.array(byt, pa.int64()),
        "cum_wa_ppm": pa.array(wa, pa.int64()),
    })


SQL_LSM_TIERED_WRITE_AMP = """
WITH f AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         CAST(count(*) AS BIGINT) * 64 + 4096 AS fb
  FROM events GROUP BY 1),
seq AS (
  SELECT fb, row_number() OVER (ORDER BY hour) AS j,
         sum(fb) OVER (ORDER BY hour) AS pre
  FROM f),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
lvl AS (
  SELECT CAST(l.range AS BIGINT) AS level,
         CAST(pow(4, l.range) AS BIGINT) AS span
  FROM range(7) l),
act AS (
  SELECT level, span, nn.n // span AS n_merges
  FROM lvl, nn WHERE nn.n // span > 0),
rows_ AS (
  SELECT level, n_merges,
         (SELECT CAST(pre AS BIGINT) FROM seq
          WHERE j = act.span * act.n_merges) AS bytes_written
  FROM act),
cum AS (
  SELECT level, n_merges, bytes_written,
         sum(bytes_written) OVER (ORDER BY level) AS cb,
         first_value(bytes_written) OVER (ORDER BY level) AS flushed
  FROM rows_)
SELECT level, n_merges, CAST(bytes_written AS BIGINT) AS bytes_written,
       CAST(cb * 1000000 // flushed AS BIGINT) AS cum_wa_ppm
FROM cum ORDER BY level
"""

QUERIES["lsm_tiered_write_amp"] = (q_lsm_tiered_write_amp,
                                   SQL_LSM_TIERED_WRITE_AMP)


# ---------------------------------------------------------------------------
# threshold_algorithm_audit — Fagin TA stopping depth for top-k
# ---------------------------------------------------------------------------

_TA_K = 10


def ta_stop_depth(xs, ys, k: int = _TA_K) -> dict:
    """Fagin's Threshold Algorithm audit: two ranked lists (x desc,
    y desc; doc-id tie-break), score = x + y, random access allowed.
    stop_depth = the smallest sorted-access depth d where the k-th
    best fully-scored seen object (seen = min(rank_x, rank_y) ≤ d)
    reaches the threshold x_(d) + y_(d).  kthbest(d) is nondecreasing
    and the threshold nonincreasing, so the crossing is found by
    bisection — O(log n) numpy partitions, no per-row loop.
    Returns the audit dict."""
    n = len(xs)
    x = np.asarray(xs, dtype=np.int64)
    y = np.asarray(ys, dtype=np.int64)
    ids = np.arange(n)
    ox = np.lexsort((ids, -x))
    oy = np.lexsort((ids, -y))
    rx = np.empty(n, dtype=np.int64)
    ry = np.empty(n, dtype=np.int64)
    rx[ox] = np.arange(1, n + 1)
    ry[oy] = np.arange(1, n + 1)
    f = np.minimum(rx, ry)
    s = x + y
    xd = x[ox]          # x value at depth d (1-indexed: xd[d-1])
    yd = y[oy]

    def ok(d):
        seen = s[f <= d]
        if len(seen) < k:
            return False
        kb = np.partition(seen, len(seen) - k)[len(seen) - k]
        return kb >= xd[d - 1] + yd[d - 1]

    lo, hi = 1, n
    while lo < hi:
        mid = (lo + hi) // 2
        if ok(mid):
            hi = mid
        else:
            lo = mid + 1
    d = lo
    seen = s[f <= d]
    kb = int(np.partition(seen, len(seen) - k)[len(seen) - k])
    return {"n": n, "k": k, "stop_depth": d,
            "threshold": int(xd[d - 1] + yd[d - 1]),
            "kth_best": kb, "n_seen": int(len(seen)),
            "seen_ppm": int(len(seen)) * 1_000_000 // n}


def q_threshold_algorithm_audit(sf_dir: str):
    """Fagin TA top-k early-termination audit over documents: rank
    once by n_chars and once by whitespace token count, score =
    chars + tokens — at what sorted-access depth can a rank-join
    PROVE it holds the true top-10, and what fraction of the corpus
    did it touch?  The query-processing companion of
    selectivity_estimate_audit / join_size_estimate_check: top-k
    pushdown over per-attribute sorted projections (exactly what a
    column store's zonemap-ordered scans provide) beats the full
    scan precisely when this depth ≪ n — the audit measures the
    margin on the real corpus.  Exact integer attributes; the
    monotone crossing makes both engines' sweep deterministic."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text",
                                             "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        n_all = pc.utf8_length(txt)
        n_nospace = pc.utf8_length(
            pc.replace_substring(txt, pattern=" ", replacement=""))
        toks = pc.add(pc.subtract(n_all, n_nospace),
                      pa.scalar(1, pa.int64()))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "x": pc.cast(t.column("n_chars"), pa.int64()),
            "y": pc.cast(toks, pa.int64()),
        })

    m = _partial_final(ds, partial, ["doc_id"],
                       [("x", "max"), ("y", "max")]).sort_by("doc_id")
    d = ta_stop_depth(np.asarray(m.column("x")).tolist(),
                      np.asarray(m.column("y")).tolist())
    return pa.table({
        "n_docs": pa.array([d["n"]], pa.int64()),
        "k": pa.array([d["k"]], pa.int64()),
        "stop_depth": pa.array([d["stop_depth"]], pa.int64()),
        "threshold_at_stop": pa.array([d["threshold"]], pa.int64()),
        "kth_best_score": pa.array([d["kth_best"]], pa.int64()),
        "n_seen": pa.array([d["n_seen"]], pa.int64()),
        "seen_ppm": pa.array([d["seen_ppm"]], pa.int64()),
    })


SQL_THRESHOLD_ALGORITHM_AUDIT = """
WITH d AS (
  SELECT doc_id, n_chars AS x,
         length(text) - length(replace(text, ' ', '')) + 1 AS y
  FROM documents),
r AS (
  SELECT doc_id, x, y, x + y AS s,
         row_number() OVER (ORDER BY x DESC, doc_id) AS rx,
         row_number() OVER (ORDER BY y DESC, doc_id) AS ry
  FROM d),
fr AS (SELECT doc_id, s, least(rx, ry) AS f FROM r),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
thr AS (
  SELECT r.rx AS dd,
         r.x + (SELECT y FROM r r2 WHERE r2.ry = r.rx) AS th
  FROM r),
kb AS (
  SELECT thr.dd, thr.th,
         (SELECT count(*) FROM fr WHERE f <= thr.dd) AS cnt,
         (SELECT s FROM fr WHERE f <= thr.dd
          ORDER BY s DESC LIMIT 1 OFFSET 9) AS kbest
  FROM thr),
stop_ AS (
  SELECT dd, th, kbest, cnt FROM kb
  WHERE cnt >= 10 AND kbest >= th
  ORDER BY dd LIMIT 1)
SELECT nn.n AS n_docs, CAST(10 AS BIGINT) AS k,
       CAST(dd AS BIGINT) AS stop_depth,
       CAST(th AS BIGINT) AS threshold_at_stop,
       CAST(kbest AS BIGINT) AS kth_best_score,
       CAST(cnt AS BIGINT) AS n_seen,
       CAST(cnt * 1000000 // nn.n AS BIGINT) AS seen_ppm
FROM stop_, nn
"""

QUERIES["threshold_algorithm_audit"] = (q_threshold_algorithm_audit,
                                        SQL_THRESHOLD_ALGORITHM_AUDIT)


# ---------------------------------------------------------------------------
# lsm_leveled_write_amp — leveled compaction counterpart
# ---------------------------------------------------------------------------


def lsm_leveled_levels(flush_bytes) -> list:
    """Exact leveled-compaction accounting over an ordered flush
    sequence: a merge INTO level l happens at every T^l-th flush and
    rewrites everything level l has accumulated since it was last
    promoted (promotions out of level l happen every T^(l+1) flushes
    and empty it).  Bytes written at the level-l merge at flush m is
    therefore prefix(m) − prefix(T^(l+1)·⌊(m−1)/T^(l+1)⌋) — again a
    pure prefix-sum closed form, no replay.  Returns
    [(level, n_merges, bytes_written)]; level 0 is the flush pass."""
    n = len(flush_bytes)
    prefix = [0]
    for b in flush_bytes:
        prefix.append(prefix[-1] + b)
    out = [(0, n, prefix[n])] if n else []
    for lvl in range(1, _LSM_MAX_LVL + 1):
        span = _LSM_FANIN ** lvl
        merges = n // span
        if merges == 0:
            break
        span4 = span * _LSM_FANIN
        total = 0
        for q in range(1, merges + 1):
            m = span * q
            epoch = span4 * ((m - 1) // span4)
            total += prefix[m] - prefix[epoch]
        out.append((lvl, merges, total))
    return out


def q_lsm_leveled_write_amp(sf_dir: str):
    """Leveled-compaction write-amplification over the same hourly
    flush stream as lsm_tiered_write_amp — the OTHER classic LSM
    policy: each level holds ONE sorted run that incoming merges
    rewrite in place (read-optimized, space-amp ≈ 1) where tiered
    defers merging (write-optimized, space-amp ≈ T).  A byte landing
    in level l gets rewritten once per later merge into l within its
    epoch — on average (T+1)/2 times per level vs tiered's exactly
    once — and this pair of audits prices that tradeoff on the real
    stream.  Same closed-form prefix-sum accounting; one bounded
    hourly reduce."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        g = pa.table({
            "hour": pa.array(tsv // 3_600_000_000),
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by("hour").aggregate([("c", "sum")])
        return g.rename_columns(["hour", "c"])

    m = _partial_final(ds, partial, ["hour"], [("c", "sum")])
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    cv = np.asarray(m.column("c"), dtype=np.int64)
    o = np.argsort(hr)
    fb = (cv[o] * _LSM_ROW_BYTES + _LSM_HEADER).tolist()
    rows = lsm_leveled_levels(fb)
    flushed = rows[0][2]
    cum = 0
    lvls, mrg, byt, wa = [], [], [], []
    for lvl, nm, b in rows:
        cum += b
        lvls.append(lvl)
        mrg.append(nm)
        byt.append(b)
        wa.append(cum * 1_000_000 // flushed)
    return pa.table({
        "level": pa.array(lvls, pa.int64()),
        "n_merges": pa.array(mrg, pa.int64()),
        "bytes_written": pa.array(byt, pa.int64()),
        "cum_wa_ppm": pa.array(wa, pa.int64()),
    })


SQL_LSM_LEVELED_WRITE_AMP = """
WITH f AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         CAST(count(*) AS BIGINT) * 64 + 4096 AS fb
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY hour) AS j,
         CAST(sum(fb) OVER (ORDER BY hour) AS BIGINT) AS pre
  FROM f),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
lvl AS (
  SELECT CAST(l.range AS BIGINT) AS level,
         CAST(pow(4, l.range) AS BIGINT) AS span
  FROM range(1, 7) l),
act AS (
  SELECT level, span, span * 4 AS span4, nn.n // span AS n_merges
  FROM lvl, nn WHERE nn.n // span > 0),
merges AS (
  SELECT act.level, act.n_merges, seq.j AS m,
         seq.pre
         - coalesce((SELECT pre FROM seq s2
                     WHERE s2.j = act.span4 * ((seq.j - 1)
                                               // act.span4)), 0)
           AS w
  FROM act JOIN seq ON seq.j % act.span = 0),
lv AS (
  SELECT level, max(n_merges) AS n_merges,
         CAST(sum(w) AS BIGINT) AS bytes_written
  FROM merges GROUP BY 1
  UNION ALL
  SELECT 0, nn.n, (SELECT CAST(max(pre) AS BIGINT) FROM seq)
  FROM nn),
cum AS (
  SELECT level, n_merges, bytes_written,
         sum(bytes_written) OVER (ORDER BY level) AS cb,
         first_value(bytes_written) OVER (ORDER BY level) AS flushed
  FROM lv)
SELECT level, n_merges, bytes_written,
       CAST(cb * 1000000 // flushed AS BIGINT) AS cum_wa_ppm
FROM cum ORDER BY level
"""

QUERIES["lsm_leveled_write_amp"] = (q_lsm_leveled_write_amp,
                                    SQL_LSM_LEVELED_WRITE_AMP)


# ---------------------------------------------------------------------------
# mantel_day_revenue — Mantel matrix correlation (time vs value)
# ---------------------------------------------------------------------------


def mantel_r(xs, ys) -> tuple:
    """Pearson r between the two condensed distance matrices
    {|xᵢ−xⱼ|} and {|yᵢ−yⱼ|} over i<j — exact integer pair moments,
    one float closure.  Returns (n_pairs, r)."""
    n = len(xs)
    sx = sy = sxx = syy = sxy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = abs(xs[i] - xs[j])
            dy = abs(ys[i] - ys[j])
            sx += dx
            sy += dy
            sxx += dx * dx
            syy += dy * dy
            sxy += dx * dy
    p = n * (n - 1) // 2
    num = p * sxy - sx * sy
    den = math.sqrt(float(p * sxx - sx * sx)) \
        * math.sqrt(float(p * syy - sy * sy))
    return p, num / den


def q_mantel_day_revenue(sf_dir: str):
    """Mantel matrix correlation between temporal distance |Δday| and
    revenue distance |Δcents| across all day pairs — 'do days close
    in TIME have close REVENUE?', the distance-matrix generalization
    the ecology literature built for exactly this question.  Positive
    r ⇒ revenue drifts (near days alike), the matrix-level companion
    of hourly_acf (fixed lags) and distance_corr (independence, not
    proximity).  Days-bounded C(n,2) sweep with exact integer
    moments driver-side, a position self-join in the oracle."""
    day, cv = _daily_revenue_cents(sf_dir)
    p, r = mantel_r(day.tolist(), cv.tolist())
    return pa.table({
        "n_days": pa.array([len(day)], pa.int64()),
        "n_pairs": pa.array([p], pa.int64()),
        "mantel_r": pa.array([round(r, 6)], pa.float64()),
    })


SQL_MANTEL_DAY_REVENUE = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
pr AS (
  SELECT abs(a.day - b.day) AS dx, abs(a.cents - b.cents) AS dy
  FROM d a JOIN d b ON a.day < b.day),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS p,
         CAST(sum(dx) AS HUGEINT) AS sx,
         CAST(sum(dy) AS HUGEINT) AS sy,
         CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
         CAST(sum(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy,
         CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy
  FROM pr)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       p AS n_pairs,
       round(CAST(p * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(p * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(p * syy - sy * sy AS DOUBLE))), 6)
         AS mantel_r
FROM s
"""

QUERIES["mantel_day_revenue"] = (q_mantel_day_revenue,
                                 SQL_MANTEL_DAY_REVENUE)


# ---------------------------------------------------------------------------
# bds_gap_daily — BDS correlation-integral independence gap (m = 2)
# ---------------------------------------------------------------------------


def bds_gap(xs, eps: int) -> tuple:
    """Correlation integrals of the BDS test at embedding m = 2:
    c1 = pair share with |xᵢ−xⱼ| ≤ ε over ALL n points, c2 = pair
    share whose embedded 2-vectors are Chebyshev-within-ε over the
    n−1 embedding positions; under iid, E[c2] ≈ c1² and the gap
    c2 − c1² is the BDS numerator.  Exact integer pair counts.
    Returns (pairs1, pairs2, c1, c2, gap)."""
    n = len(xs)
    p1 = sum(1 for i in range(n) for j in range(i + 1, n)
             if abs(xs[i] - xs[j]) <= eps)
    m = n - 1
    p2 = sum(1 for i in range(m) for j in range(i + 1, m)
             if abs(xs[i] - xs[j]) <= eps
             and abs(xs[i + 1] - xs[j + 1]) <= eps)
    c1 = 2.0 * p1 / (n * (n - 1.0))
    c2 = 2.0 * p2 / (m * (m - 1.0))
    return p1, p2, c1, c2, c2 - c1 * c1


def q_bds_gap_daily(sf_dir: str):
    """BDS correlation-integral gap of daily revenue at embedding
    dimension 2: does the JOINT closeness of consecutive-day pairs
    exceed what marginal closeness predicts (c2 > c1²)?  The
    nonlinearity screen the linear family (hourly_acf, ljung_box,
    arch_lm test only second moments) cannot see — BDS catches any
    remaining dependence structure.  ε = the lower-median absolute
    successive difference, the same deterministic integer tolerance
    as sample_entropy_daily; day-bounded exact pair counts both
    engines share."""
    _, cv = _daily_revenue_cents(sf_dir)
    x = cv.tolist()
    diffs = sorted(abs(x[i + 1] - x[i]) for i in range(len(x) - 1))
    eps = int(diffs[(len(diffs) + 1) // 2 - 1]) if diffs else 0
    p1, p2, c1, c2, gap = bds_gap(x, eps)
    return pa.table({
        "n_days": pa.array([len(x)], pa.int64()),
        "eps_cents": pa.array([eps], pa.int64()),
        "pairs_1": pa.array([p1], pa.int64()),
        "pairs_2": pa.array([p2], pa.int64()),
        "c1": pa.array([round(c1, 6)], pa.float64()),
        "c2": pa.array([round(c2, 6)], pa.float64()),
        "bds_gap": pa.array([round(gap, 6)], pa.float64()),
    })


SQL_BDS_GAP_DAILY = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
o AS (
  SELECT cents, row_number() OVER (ORDER BY day) AS i,
         count(*) OVER () AS n
  FROM d),
sd AS (
  SELECT abs(b.cents - a.cents) AS g
  FROM o a JOIN o b ON b.i = a.i + 1),
eps AS (
  SELECT CAST(min(g) AS BIGINT) AS eps FROM (
    SELECT g, row_number() OVER (ORDER BY g) AS r,
           count(*) OVER () AS m
    FROM sd)
  WHERE r >= (m + 1) // 2),
p1 AS (
  SELECT CAST(count(*) AS BIGINT) AS p
  FROM o a JOIN o b ON a.i < b.i, eps
  WHERE abs(a.cents - b.cents) <= eps.eps),
p2 AS (
  SELECT CAST(count(*) AS BIGINT) AS p
  FROM o a JOIN o b ON a.i < b.i
       JOIN o a2 ON a2.i = a.i + 1
       JOIN o b2 ON b2.i = b.i + 1, eps
  WHERE a.i < (SELECT max(i) FROM o)
    AND b.i < (SELECT max(i) FROM o)
    AND abs(a.cents - b.cents) <= eps.eps
    AND abs(a2.cents - b2.cents) <= eps.eps),
nn AS (SELECT CAST(max(n) AS BIGINT) AS n FROM o),
c AS (
  SELECT nn.n, eps.eps, p1.p AS p1, p2.p AS p2,
         2.0 * p1.p / (nn.n * (nn.n - 1.0)) AS c1,
         2.0 * p2.p / ((nn.n - 1.0) * (nn.n - 2.0)) AS c2
  FROM nn, eps, p1, p2)
SELECT n AS n_days, eps AS eps_cents, p1 AS pairs_1, p2 AS pairs_2,
       round(c1, 6) AS c1, round(c2, 6) AS c2,
       round(c2 - c1 * c1, 6) AS bds_gap
FROM c
"""

QUERIES["bds_gap_daily"] = (q_bds_gap_daily, SQL_BDS_GAP_DAILY)


# ---------------------------------------------------------------------------
# lru_reuse_distance_audit — buffer-pool sizing from stack distances
# ---------------------------------------------------------------------------

_LRU_PAGES = 256
_LRU_SIZES = (8, 32, 128)


def lru_reuse_distances(pages) -> tuple:
    """Exact LRU stack distances of an access trace over a bounded
    page alphabet: for each warm access (page seen before), rd = #
    distinct OTHER pages touched strictly between this access and the
    previous access to the same page; LRU of capacity C hits iff
    rd ≤ C−1 (Mattson's inclusion property — one pass prices EVERY
    cache size).  Vectorized per page over the interval arrays (no
    per-access loop): page q intersects window (j, k) iff
    searchsorted(acc_q, j, right) < searchsorted(acc_q, k, left).
    Returns (n, n_pages, cold, rd_array)."""
    p = np.asarray(pages, dtype=np.int64)
    n = len(p)
    ks = np.arange(n, dtype=np.int64)
    # previous occurrence of the same page (−1 if cold)
    prev = np.full(n, -1, dtype=np.int64)
    last = {}
    pl = p.tolist()
    for k, q in enumerate(pl):           # bounded alphabet bookkeeping
        j = last.get(q, -1)
        prev[k] = j
        last[q] = k
    warm = prev >= 0
    j_arr = prev[warm]
    k_arr = ks[warm]
    rd = np.zeros(len(j_arr), dtype=np.int64)
    for q in np.unique(p):
        acc = ks[p == q]
        lo = np.searchsorted(acc, j_arr, side="right")
        hi = np.searchsorted(acc, k_arr, side="left")
        rd += (lo < hi).astype(np.int64)
    # the probed page itself contributes 0: (j, k) is an open window
    # between consecutive accesses of p, so no correction is needed
    return n, len(last), int(n - warm.sum()), rd


def q_lru_reuse_distance_audit(sf_dir: str):
    """Buffer-pool sizing audit: the event stream as a page-access
    trace (page = user_id mod 256, order = (ts, event_id)), exact LRU
    stack distances, and the hit ratio AT THREE CAPACITIES from the
    single pass Mattson's inclusion property licenses — the
    measurement behind every 'how much cache does this workload
    need?' decision, computed the way cache-simulation literature
    does it rather than by replaying an LRU list per size.  Mean
    reuse distance is the single-number working-set summary.  The
    bounded page alphabet keeps the per-page interval sweep
    vectorized; the oracle counts distinct pages per window via a
    range join on next-access positions (a page intersects (j, k)
    iff some access in (j, k) has its NEXT same-page access ≥ k)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_id", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "ts": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id").cast(pa.int64()),
            "pg": pc.cast(pc.bit_wise_and(
                t.column("user_id"), pa.scalar(255, pa.int64())),
                pa.int64()),
        })

    m = _partial_final(ds, partial, ["ts", "event_id"],
                       [("pg", "max")])
    tsv = np.asarray(m.column("ts"), dtype=np.int64)
    eid = np.asarray(m.column("event_id"), dtype=np.int64)
    pg = np.asarray(m.column("pg"), dtype=np.int64)
    o = np.lexsort((eid, tsv))
    n, npg, cold, rd = lru_reuse_distances(pg[o])
    warm = len(rd)
    sum_rd = int(rd.sum())
    hits = {c: int((rd <= c - 1).sum()) for c in _LRU_SIZES}
    return pa.table({
        "n_accesses": pa.array([n], pa.int64()),
        "n_pages": pa.array([npg], pa.int64()),
        "cold_misses": pa.array([cold], pa.int64()),
        "mean_rd": pa.array(
            [round(sum_rd / warm, 6) if warm else None], pa.float64()),
        "hit_ppm_c8": pa.array([hits[8] * 1_000_000 // n], pa.int64()),
        "hit_ppm_c32": pa.array([hits[32] * 1_000_000 // n],
                                pa.int64()),
        "hit_ppm_c128": pa.array([hits[128] * 1_000_000 // n],
                                 pa.int64()),
    })


SQL_LRU_REUSE_DISTANCE_AUDIT = """
WITH seq AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) AS k,
         user_id % 256 AS p
  FROM events),
nx AS (
  SELECT k, p, lead(k) OVER (PARTITION BY p ORDER BY k) AS nxt
  FROM seq),
pv AS (
  SELECT k, p, lag(k) OVER (PARTITION BY p ORDER BY k) AS j
  FROM seq),
warm AS (SELECT k, j FROM pv WHERE j IS NOT NULL),
rdj AS (
  SELECT w.k,
         coalesce(sum(CASE WHEN b.k > w.j AND b.k < w.k
                           AND coalesce(b.nxt, 9223372036854775807)
                               >= w.k
                           THEN 1 ELSE 0 END), 0) AS rd
  FROM warm w LEFT JOIN nx b
       ON b.k > w.j AND b.k < w.k
  GROUP BY w.k, w.j),
rd2 AS (
  SELECT w.k, coalesce(rdj.rd, 0) AS rd
  FROM warm w LEFT JOIN rdj ON rdj.k = w.k),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS warm,
         CAST(sum(rd) AS BIGINT) AS sum_rd,
         CAST(sum(CASE WHEN rd <= 7 THEN 1 ELSE 0 END) AS BIGINT)
           AS h8,
         CAST(sum(CASE WHEN rd <= 31 THEN 1 ELSE 0 END) AS BIGINT)
           AS h32,
         CAST(sum(CASE WHEN rd <= 127 THEN 1 ELSE 0 END) AS BIGINT)
           AS h128
  FROM rd2),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT p) AS BIGINT) AS npg
       FROM seq)
SELECT nn.n AS n_accesses, nn.npg AS n_pages,
       nn.n - s.warm AS cold_misses,
       round(CAST(s.sum_rd AS DOUBLE) / s.warm, 6) AS mean_rd,
       s.h8 * 1000000 // nn.n AS hit_ppm_c8,
       s.h32 * 1000000 // nn.n AS hit_ppm_c32,
       s.h128 * 1000000 // nn.n AS hit_ppm_c128
FROM s, nn
"""

QUERIES["lru_reuse_distance_audit"] = (q_lru_reuse_distance_audit,
                                       SQL_LRU_REUSE_DISTANCE_AUDIT)


# ---------------------------------------------------------------------------
# group_commit_audit — WAL batching window tradeoff
# ---------------------------------------------------------------------------

_GC_WINDOWS_US = (1_000, 10_000, 100_000)


def q_group_commit_audit(sf_dir: str):
    """WAL group-commit window audit: if commits flush at the END of
    a fixed window W, every event in a window shares one fsync and
    waits W − (ts mod W) µs — the classic batching/latency tradeoff,
    priced at 1 ms / 10 ms / 100 ms on the real arrival process
    (n_flushes ∝ fsync load; mean and exact-ceil-rank p99 latency =
    user pain).  The per-window latency alphabet is bounded (µs
    offsets within W), so one (w, lat) histogram shuffle carries all
    three windows; every output is an exact integer or one shared
    division."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        outs = []
        for w in _GC_WINDOWS_US:
            lat = w - tsv % w
            outs.append(pa.table({
                "w": pa.array(np.full(len(tsv), w, dtype=np.int64)),
                "lat": pa.array(lat),
                "c": pa.array(np.ones(len(tsv), dtype=np.int64)),
                "b": pa.array(tsv // w),
            }))
        t2 = pa.concat_tables(outs)
        g = t2.group_by(["w", "lat"]).aggregate([("c", "sum"),
                                                 ("b", "min")])
        # batch ids are only needed for the distinct count — emit the
        # (w, bucket) keys separately with lat = -1 sentinel rows
        gb = t2.group_by(["w", "b"]).aggregate([("c", "max")])
        part1 = g.rename_columns(["w", "lat", "c", "bmin"]) \
            .select(["w", "lat", "c"])
        part2 = pa.table({
            "w": gb.column("w"),
            "lat": pc.subtract(pa.scalar(0, pa.int64()),
                               pc.add(gb.column("b"),
                                      pa.scalar(1, pa.int64()))),
            "c": pa.array(np.ones(gb.num_rows, dtype=np.int64)),
        })
        return pa.concat_tables([part1, part2])

    m = _partial_final(ds, partial, ["w", "lat"], [("c", "sum")])
    wv = np.asarray(m.column("w"), dtype=np.int64)
    lv = np.asarray(m.column("lat"), dtype=np.int64)
    cv = np.asarray(m.column("c"), dtype=np.int64)
    rows = {"w_us": [], "n_events": [], "n_flushes": [],
            "mean_lat_us": [], "p99_lat_us": []}
    for w in _GC_WINDOWS_US:
        sel = wv == w
        lats = lv[sel]
        cs = cv[sel]
        real = lats >= 0
        n = int(cs[real].sum())
        flushes = int((~real).sum())     # one sentinel row per bucket
        tot = int((lats[real] * cs[real]).sum())
        o = np.argsort(lats[real])
        lo_ = lats[real][o]
        co_ = np.cumsum(cs[real][o])
        k99 = (99 * n + 99) // 100       # ceil-rank p99
        p99 = int(lo_[np.searchsorted(co_, k99)])
        rows["w_us"].append(w)
        rows["n_events"].append(n)
        rows["n_flushes"].append(flushes)
        rows["mean_lat_us"].append(round(tot / n, 6))
        rows["p99_lat_us"].append(p99)
    return pa.table({
        "w_us": pa.array(rows["w_us"], pa.int64()),
        "n_events": pa.array(rows["n_events"], pa.int64()),
        "n_flushes": pa.array(rows["n_flushes"], pa.int64()),
        "mean_lat_us": pa.array(rows["mean_lat_us"], pa.float64()),
        "p99_lat_us": pa.array(rows["p99_lat_us"], pa.int64()),
    })


SQL_GROUP_COMMIT_AUDIT = """
WITH w AS (SELECT CAST(x.range AS BIGINT) AS w_us
           FROM (VALUES (1000), (10000), (100000)) x(range)),
e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
lat AS (
  SELECT w.w_us, w.w_us - e.t % w.w_us AS lat, e.t // w.w_us AS b
  FROM e, w),
agg AS (
  SELECT w_us, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT b) AS BIGINT) AS flushes,
         CAST(sum(lat) AS BIGINT) AS tot
  FROM lat GROUP BY 1),
rk AS (
  SELECT w_us, lat,
         sum(1) OVER (PARTITION BY w_us ORDER BY lat
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM lat),
p99 AS (
  SELECT rk.w_us, CAST(min(rk.lat) AS BIGINT) AS p99
  FROM rk JOIN agg ON agg.w_us = rk.w_us
  WHERE rk.cum >= (99 * agg.n + 99) // 100
  GROUP BY 1)
SELECT agg.w_us, agg.n AS n_events, agg.flushes AS n_flushes,
       round(CAST(agg.tot AS DOUBLE) / agg.n, 6) AS mean_lat_us,
       p99.p99 AS p99_lat_us
FROM agg JOIN p99 USING (w_us)
ORDER BY agg.w_us
"""

QUERIES["group_commit_audit"] = (q_group_commit_audit,
                                 SQL_GROUP_COMMIT_AUDIT)


# ---------------------------------------------------------------------------
# nb_vs_poisson_lrt — overdispersion model comparison by likelihood
# ---------------------------------------------------------------------------


def nb_poisson_loglik(ks, cs) -> tuple:
    """Log-likelihoods of the per-user count histogram {k: n_k} under
    Poisson(λ̂ = mean) and the moment-fitted negative binomial
    (r = μ²/(σ²−μ), p = μ/σ², population σ²).  Sums run over the
    bounded DISTINCT-k alphabet in ascending k so both engines share
    the float tree (lgamma via libm in both).  Returns
    (lnl_p, lnl_nb, r, p)."""
    n = sum(cs)
    s = sum(k * c for k, c in zip(ks, cs))
    q = sum(k * k * c for k, c in zip(ks, cs))
    mu = s / n
    var = float(n * q - s * s) / (float(n) * n)
    lam = mu
    lnl_p = sum(c * (k * math.log(lam) - lam - math.lgamma(k + 1.0))
                for k, c in zip(ks, cs))
    if var <= mu:
        return lnl_p, None, None, None
    r = mu * mu / (var - mu)
    p = mu / var
    lnl_nb = sum(c * (math.lgamma(k + r) - math.lgamma(r)
                      - math.lgamma(k + 1.0)
                      + r * math.log(p) + k * math.log(1.0 - p))
                 for k, c in zip(ks, cs))
    return lnl_p, lnl_nb, r, p


def q_nb_vs_poisson_lrt(sf_dir: str):
    """Negative-binomial vs Poisson likelihood-ratio screen on
    per-user event counts: dispersion_index showed σ² > μ and
    user_count_nb_fit named the NB parameters — this row asks whether
    the extra parameter EARNS its keep in log-likelihood: LRT =
    2(lnL_NB − lnL_P), boundary-corrected p = 1 − Φ(√LRT) (the null
    r→∞ sits on the parameter boundary, so the χ²₁ tail is halved).
    Per-user counts reduce distributed; the distinct-count alphabet
    is bounded, and both engines evaluate the same lgamma/log tree
    over it."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def per_user(t: pa.Table) -> pa.Table:
        g = pa.table({"u": t.column("user_id"),
                      "k": pa.array(np.ones(t.num_rows,
                                            dtype=np.int64))}) \
            .group_by("u").aggregate([("k", "sum")])
        return g.rename_columns(["u", "k"])

    m = _partial_final(ds, per_user, ["u"], [("k", "sum")])
    kv = np.asarray(m.column("k"), dtype=np.int64)
    ku, cu = np.unique(kv, return_counts=True)
    ks = ku.tolist()
    cs = cu.tolist()
    lnl_p, lnl_nb, r, p = nb_poisson_loglik(ks, cs)
    if lnl_nb is None:
        lrt = pv = None
    else:
        lrt = 2.0 * (lnl_nb - lnl_p)
        pv = 1.0 - phi_as(math.sqrt(max(lrt, 0.0)))
    return pa.table({
        "n_users": pa.array([int(cu.sum())], pa.int64()),
        "lnl_poisson": pa.array([round(lnl_p, 6)], pa.float64()),
        "lnl_nb": pa.array(
            [round(lnl_nb, 6) if lnl_nb is not None else None],
            pa.float64()),
        "lrt": pa.array([round(lrt, 6) if lrt is not None else None],
                        pa.float64()),
        "p_value": pa.array(
            [round(pv, 6) if pv is not None else None], pa.float64()),
    })


def _nb_vs_poisson_sql() -> str:
    phi = _phi_sql("sqrt(greatest(lrt, 0.0))")
    return f"""
WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
            FROM events GROUP BY 1),
h AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM pu GROUP BY 1),
s AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(k * c) AS BIGINT) AS s,
             CAST(sum(k * k * c) AS HUGEINT) AS q
      FROM h),
par AS (
  SELECT n, CAST(s AS DOUBLE) / n AS mu,
         CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE)
           / (CAST(n AS DOUBLE) * n) AS var
  FROM s),
par2 AS (
  SELECT n, mu, var,
         mu * mu / (var - mu) AS r, mu / var AS p
  FROM par),
lik AS (
  SELECT par2.n, par2.var, par2.mu,
         sum(h.c * (h.k * ln(par2.mu) - par2.mu
                    - lgamma(h.k + 1.0))) AS lnl_p,
         sum(h.c * (lgamma(h.k + par2.r) - lgamma(par2.r)
                    - lgamma(h.k + 1.0)
                    + par2.r * ln(par2.p)
                    + h.k * ln(1.0 - par2.p))) AS lnl_nb
  FROM h, par2 GROUP BY 1, 2, 3),
z AS (
  SELECT n, lnl_p,
         CASE WHEN var > mu THEN lnl_nb END AS lnl_nb,
         CASE WHEN var > mu THEN 2.0 * (lnl_nb - lnl_p) END AS lrt
  FROM lik)
SELECT n AS n_users, round(lnl_p, 6) AS lnl_poisson,
       round(lnl_nb, 6) AS lnl_nb, round(lrt, 6) AS lrt,
       CASE WHEN lrt IS NOT NULL
            THEN round(1.0 - {phi}, 6) END AS p_value
FROM z
"""


QUERIES["nb_vs_poisson_lrt"] = (q_nb_vs_poisson_lrt,
                                _nb_vs_poisson_sql())


# ---------------------------------------------------------------------------
# lad_regression_daily — exact least-absolute-deviations trend
# ---------------------------------------------------------------------------


def lad_fit(xs, ys) -> tuple:
    """Exact LAD (L1) simple regression by vertex enumeration: some
    optimal line passes through two sample points (LP basic
    solution), so sweep all C(n,2) point-pair lines and keep the
    minimal sum of absolute errors.  Per-candidate SAE is the exact
    integer Σ|Δ| over a common denominator |dx|; the winner is chosen
    by (float SAE, i, j) — the same comparable key the oracle sorts
    by.  Returns (i, j, slope, intercept, sae)."""
    x = np.asarray(xs, dtype=np.int64)
    y = np.asarray(ys, dtype=np.int64)
    n = len(x)
    ii, jj = np.triu_indices(n, k=1)
    dx = x[jj] - x[ii]
    dy = y[jj] - y[ii]
    # residual numerators: (y_k - y_i)·dx − dy·(x_k − x_i), all pairs
    num = np.abs(
        (y[None, :] - y[ii][:, None]) * dx[:, None]
        - dy[:, None] * (x[None, :] - x[ii][:, None])
    ).sum(axis=1)
    sae = num / np.abs(dx).astype(np.float64)
    order = np.lexsort((jj, ii, sae))
    w = order[0]
    i, j = int(ii[w]), int(jj[w])
    b = float(dy[w]) / float(dx[w])
    a = y[i] - b * x[i]
    return i, j, b, a, float(sae[w])


def q_lad_regression_daily(sf_dir: str):
    """Exact least-absolute-deviations trend of the LAST 120 days of
    daily revenue — the L1 member of the robust-trend family
    (theilsen: median of pair slopes; siegel: repeated median; LAD:
    the actual L1-loss minimizer, the quantile-regression median
    line).  Vertex enumeration over all day pairs is EXACT — no
    iteratively-reweighted approximation — with integer residual
    numerators over a common |Δday| denominator; the O(w³) sweep is
    why the window is FIXED at w = 120 (the recent-trend horizon),
    not the full span; tie-break on (SAE, i, j) mirrored in the
    oracle's ORDER BY."""
    day, cv = _daily_revenue_cents(sf_dir)
    day, cv = day[-120:], cv[-120:]
    i, j, b, a, sae = lad_fit(day.tolist(), cv.tolist())
    return pa.table({
        "n_days": pa.array([len(day)], pa.int64()),
        "day_i": pa.array([int(day[i])], pa.int64()),
        "day_j": pa.array([int(day[j])], pa.int64()),
        "lad_slope": pa.array([round(b, 6)], pa.float64()),
        "lad_intercept": pa.array([round(a, 4)], pa.float64()),
        "sae_log10": pa.array([round(math.log10(sae), 6)],
                              pa.float64()),
    })


SQL_LAD_REGRESSION_DAILY = """
WITH d0 AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
d AS (
  SELECT day, cents FROM (
    SELECT day, cents,
           row_number() OVER (ORDER BY day DESC) AS rn
    FROM d0)
  WHERE rn <= 120),
pairs AS (
  SELECT a.day AS xi, a.cents AS yi, b.day AS xj, b.cents AS yj,
         b.day - a.day AS dx, b.cents - a.cents AS dy
  FROM d a JOIN d b ON a.day < b.day),
sae AS (
  SELECT xi, yi, xj, dx, dy,
         CAST(sum(abs(CAST(k.cents - pairs.yi AS HUGEINT) * pairs.dx
                      - CAST(pairs.dy AS HUGEINT)
                        * (k.day - pairs.xi))) AS HUGEINT) AS num
  FROM pairs, d k
  GROUP BY 1, 2, 3, 4, 5),
best AS (
  SELECT xi, yi, xj, dx, dy,
         CAST(num AS DOUBLE) / abs(dx) AS s
  FROM sae
  ORDER BY CAST(num AS DOUBLE) / abs(dx), xi, xj
  LIMIT 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       xi AS day_i, xj AS day_j,
       round(CAST(dy AS DOUBLE) / dx, 6) AS lad_slope,
       round(yi - CAST(dy AS DOUBLE) / dx * xi, 4) AS lad_intercept,
       round(log10(s), 6) AS sae_log10
FROM best
"""

QUERIES["lad_regression_daily"] = (q_lad_regression_daily,
                                   SQL_LAD_REGRESSION_DAILY)


# ---------------------------------------------------------------------------
# wavelet_synopsis_audit — top-B Haar synopsis vs equi-width histogram
# ---------------------------------------------------------------------------

_WV_N = 128          # 2^7 hours
_WV_KEEP = 8         # detail coefficients kept (root sum always kept)


def haar_synopsis(vals) -> dict:
    """Unnormalized Haar decomposition of a 2^L integer series with
    EXACT energy accounting: detail at level k (span 2^k leaves) is
    d = s_left − s_right of the level-(k−1) sums; zeroing it costs
    SSE = d²/2^k, i.e. d²·2^(L−k) on the ×2^L integer scale.  Keeps
    the top-B details by that integer energy (ties: level, idx) and
    returns the retained/dropped energies plus the equi-width-8
    histogram SSE on the same ×2^L scale."""
    n = len(vals)
    lvl = 7
    assert n == _WV_N
    sums = [list(vals)]
    details = []                 # (energy_x128, level, idx, d)
    cur = list(vals)
    for k in range(1, lvl + 1):
        nxt, det = [], []
        for i in range(0, len(cur), 2):
            nxt.append(cur[i] + cur[i + 1])
            det.append(cur[i] - cur[i + 1])
        for i, d in enumerate(det):
            details.append((d * d * (2 ** (lvl - k)), k, i, d))
        cur = nxt
        sums.append(nxt)
    order = sorted(details, key=lambda t: (-t[0], t[1], t[2]))
    kept = order[:_WV_KEEP]
    dropped = order[_WV_KEEP:]
    sse_haar_x128 = sum(t[0] for t in dropped)
    # equi-width 8 buckets of 16: SSE×128 = 128·Σx² − 8·Σ S_b²
    sx2 = sum(v * v for v in vals)
    sb2 = 0
    for b in range(8):
        s = sum(vals[16 * b:16 * (b + 1)])
        sb2 += s * s
    sse_hist_x128 = 128 * sx2 - 8 * sb2
    return {"total": cur[0], "kept_energy_x128": sum(t[0] for t in kept),
            "sse_haar_x128": sse_haar_x128,
            "sse_hist_x128": sse_hist_x128}


def q_wavelet_synopsis_audit(sf_dir: str):
    """Haar-wavelet synopsis audit of the first 128 hours of event
    traffic: keep the 8 largest-energy detail coefficients (plus the
    grand total — a 9-number synopsis) and price its reconstruction
    SSE against the equi-width 8-bucket histogram spending the same
    budget — the Matias-Vitter-Wang result that wavelets beat
    histograms on bursty series, measured on this corpus.  All
    energies exact integers on the ×128 scale (d²·2^(7−k)); dense
    hour grid from the corpus min hour; orthogonality makes greedy
    top-B optimal, so both engines rank identically."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        g = pa.table({
            "hour": pa.array(tsv // 3_600_000_000),
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by("hour").aggregate([("c", "sum")])
        return g.rename_columns(["hour", "c"])

    m = _partial_final(ds, partial, ["hour"], [("c", "sum")])
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    cv = np.asarray(m.column("c"), dtype=np.int64)
    h0 = int(hr.min())
    dense = np.zeros(_WV_N, dtype=np.int64)
    sel = (hr >= h0) & (hr < h0 + _WV_N)
    dense[hr[sel] - h0] = cv[sel]
    d = haar_synopsis(dense.tolist())
    gain = (d["sse_hist_x128"] - d["sse_haar_x128"]) * 1_000_000 \
        // d["sse_hist_x128"] if d["sse_hist_x128"] else None
    return pa.table({
        "n_hours": pa.array([_WV_N], pa.int64()),
        "total_events": pa.array([d["total"]], pa.int64()),
        "kept_energy_x128": pa.array([d["kept_energy_x128"]],
                                     pa.int64()),
        "sse_haar_x128": pa.array([d["sse_haar_x128"]], pa.int64()),
        "sse_hist_x128": pa.array([d["sse_hist_x128"]], pa.int64()),
        "wavelet_gain_ppm": pa.array([gain], pa.int64()),
    })


SQL_WAVELET_SYNOPSIS_AUDIT = """
WITH h AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
h0 AS (SELECT min(hour) AS h0 FROM h),
grid AS (
  SELECT CAST(g.range AS BIGINT) AS i,
         coalesce((SELECT c FROM h, h0
                   WHERE h.hour = h0.h0 + g.range), 0) AS v
  FROM range(128) g),
l0 AS (SELECT i, v AS s FROM grid),
l1 AS (SELECT i // 2 AS i, sum(CASE WHEN i % 2 = 0 THEN s END) AS se,
              sum(CASE WHEN i % 2 = 1 THEN s END) AS so
       FROM l0 GROUP BY 1),
l2 AS (SELECT i // 2 AS i,
              sum(CASE WHEN i % 2 = 0 THEN se + so END) AS se,
              sum(CASE WHEN i % 2 = 1 THEN se + so END) AS so
       FROM l1 GROUP BY 1),
l3 AS (SELECT i // 2 AS i,
              sum(CASE WHEN i % 2 = 0 THEN se + so END) AS se,
              sum(CASE WHEN i % 2 = 1 THEN se + so END) AS so
       FROM l2 GROUP BY 1),
l4 AS (SELECT i // 2 AS i,
              sum(CASE WHEN i % 2 = 0 THEN se + so END) AS se,
              sum(CASE WHEN i % 2 = 1 THEN se + so END) AS so
       FROM l3 GROUP BY 1),
l5 AS (SELECT i // 2 AS i,
              sum(CASE WHEN i % 2 = 0 THEN se + so END) AS se,
              sum(CASE WHEN i % 2 = 1 THEN se + so END) AS so
       FROM l4 GROUP BY 1),
l6 AS (SELECT i // 2 AS i,
              sum(CASE WHEN i % 2 = 0 THEN se + so END) AS se,
              sum(CASE WHEN i % 2 = 1 THEN se + so END) AS so
       FROM l5 GROUP BY 1),
l7 AS (SELECT i // 2 AS i,
              sum(CASE WHEN i % 2 = 0 THEN se + so END) AS se,
              sum(CASE WHEN i % 2 = 1 THEN se + so END) AS so
       FROM l6 GROUP BY 1),
det AS (
  SELECT 1 AS k, i, se - so AS d FROM l1
  UNION ALL SELECT 2, i, se - so FROM l2
  UNION ALL SELECT 3, i, se - so FROM l3
  UNION ALL SELECT 4, i, se - so FROM l4
  UNION ALL SELECT 5, i, se - so FROM l5
  UNION ALL SELECT 6, i, se - so FROM l6
  UNION ALL SELECT 7, i, se - so FROM l7),
en AS (
  SELECT k, i, d,
         CAST(d * d AS HUGEINT)
           * CAST(pow(2, 7 - k) AS BIGINT) AS e,
         row_number() OVER (
           ORDER BY CAST(d * d AS HUGEINT)
                    * CAST(pow(2, 7 - k) AS BIGINT) DESC, k, i)
           AS rnk
  FROM det),
agg AS (
  SELECT CAST(sum(CASE WHEN rnk <= 8 THEN e ELSE 0 END) AS BIGINT)
           AS kept,
         CAST(sum(CASE WHEN rnk > 8 THEN e ELSE 0 END) AS BIGINT)
           AS sse_haar
  FROM en),
hist AS (
  SELECT 128 * (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                FROM grid)
       - 8 * (SELECT CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT)
              FROM (SELECT i // 16 AS b, CAST(sum(v) AS BIGINT) AS s
                    FROM grid GROUP BY 1))
         AS sse_hist),
tot AS (SELECT CAST(sum(v) AS BIGINT) AS total FROM grid)
SELECT CAST(128 AS BIGINT) AS n_hours, tot.total AS total_events,
       agg.kept AS kept_energy_x128,
       agg.sse_haar AS sse_haar_x128,
       CAST(hist.sse_hist AS BIGINT) AS sse_hist_x128,
       CASE WHEN hist.sse_hist <> 0 THEN
         CAST((hist.sse_hist - agg.sse_haar) * 1000000
              // hist.sse_hist AS BIGINT) END AS wavelet_gain_ppm
FROM agg, hist, tot
"""

QUERIES["wavelet_synopsis_audit"] = (q_wavelet_synopsis_audit,
                                     SQL_WAVELET_SYNOPSIS_AUDIT)


# ---------------------------------------------------------------------------
# join_order_audit — cost-based first-join choice on real cardinalities
# ---------------------------------------------------------------------------

# (name, customer predicate, lineitem qty predicate) — orders side is
# always o_orderpriority = '1-URGENT'. Two selectivity profiles chosen
# so the optimal first join FLIPS between them.
_JO_CONFIGS = (("tight_customer", "neg_bal", 25),
               ("tight_lineitem", "all", 1))


def q_join_order_audit(sf_dir: str):
    """Join-order decision audit for the customer⋈orders⋈lineitem
    chain under two selectivity profiles: the EXACT intermediate
    cardinalities |σc⋈σo| and |σo⋈σl| that a Selinger-style
    optimizer would compare when choosing the first join — profile A
    (customers in debt) makes customer⋈orders tiny, profile B
    (single-unit lineitems) makes orders⋈lineitem tiny, and the
    best_first column records the flip.  The decision companion of
    join_size_estimate_check (which audits the ESTIMATE; this audits
    the choice).  Ray side: distilled key-set broadcasts (customer
    keys, urgent order keys) into counting passes — the repo's
    standard small-side path; the hash-partitioned join family
    covers the big-big case."""
    import pyarrow.parquet as pq_

    ds_c = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def cust_partial(t: pa.Table) -> pa.Table:
        neg = pc.less(t.column("c_acctbal"), 0.0)
        return pa.table({
            "k": t.column("c_custkey").cast(pa.int64()),
            "neg": pc.cast(neg, pa.int64()),
        })

    cm = _partial_final(ds_c, cust_partial, ["k"], [("neg", "max")])
    ck_all = np.sort(np.asarray(cm.column("k"), dtype=np.int64))
    neg = np.asarray(cm.column("neg"), dtype=np.int64)
    ck_neg = np.sort(np.asarray(cm.column("k"), dtype=np.int64)[
        neg.astype(bool)])

    ds_o = _read(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderpriority"])

    def ord_partial(t: pa.Table) -> pa.Table:
        urg = pc.equal(t.column("o_orderpriority"), "1-URGENT")
        t2 = t.filter(urg)
        ok = np.asarray(t2.column("o_orderkey"), dtype=np.int64)
        cu = np.asarray(t2.column("o_custkey"), dtype=np.int64)
        in_neg = np.zeros(len(cu), dtype=np.int64)
        idx = np.searchsorted(ck_neg, cu)
        idx = np.clip(idx, 0, max(len(ck_neg) - 1, 0))
        if len(ck_neg):
            in_neg = (ck_neg[idx] == cu).astype(np.int64)
        return pa.table({"okey": pa.array(ok),
                         "in_neg": pa.array(in_neg)})

    om = _partial_final(ds_o, ord_partial, ["okey"], [("in_neg", "max")])
    ok_urg = np.sort(np.asarray(om.column("okey"), dtype=np.int64))
    inn = np.asarray(om.column("in_neg"), dtype=np.int64)
    ok_urg_neg = np.sort(np.asarray(om.column("okey"),
                                    dtype=np.int64)[inn.astype(bool)])

    ds_l = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_quantity"])

    def li_partial(t: pa.Table) -> pa.Table:
        q = np.asarray(pc.cast(t.column("l_quantity"), pa.int64()),
                       dtype=np.int64)
        ok = np.asarray(t.column("l_orderkey"), dtype=np.int64)

        def inset(keys, arr):
            if not len(keys):
                return np.zeros(len(arr), dtype=bool)
            idx = np.clip(np.searchsorted(keys, arr), 0,
                          len(keys) - 1)
            return keys[idx] == arr

        urg = inset(ok_urg, ok)
        urgneg = inset(ok_urg_neg, ok)
        rows = {"cfg": [], "stat": [], "c": []}
        for cfg, _cp, qmax in _JO_CONFIGS:
            sel = q <= qmax
            rows["cfg"].append(cfg)
            rows["stat"].append("n_l")
            rows["c"].append(int(sel.sum()))
            rows["cfg"].append(cfg)
            rows["stat"].append("n_ol")
            rows["c"].append(int((sel & urg).sum()))
            rows["cfg"].append(cfg)
            rows["stat"].append("n_col")
            rows["c"].append(int((sel & urgneg).sum()))
        return pa.table({"cfg": pa.array(rows["cfg"]),
                         "stat": pa.array(rows["stat"]),
                         "c": pa.array(rows["c"], pa.int64())})

    lm = _partial_final(ds_l, li_partial, ["cfg", "stat"],
                        [("c", "sum")])
    lc = {}
    for cfg, stat, c in zip(lm.column("cfg").to_pylist(),
                            lm.column("stat").to_pylist(),
                            np.asarray(lm.column("c"),
                                       dtype=np.int64).tolist()):
        lc[(cfg, stat)] = c

    out = {"config": [], "n_customers": [], "n_orders": [],
           "n_lineitem": [], "n_co": [], "n_ol": [], "n_col": [],
           "best_first": []}
    for cfg, cpred, qmax in _JO_CONFIGS:
        n_c = len(ck_neg) if cpred == "neg_bal" else len(ck_all)
        n_o = len(ok_urg)
        n_co = len(ok_urg_neg) if cpred == "neg_bal" else n_o
        n_ol = lc[(cfg, "n_ol")]
        n_col_ = lc[(cfg, "n_col")] if cpred == "neg_bal" \
            else lc[(cfg, "n_ol")]
        out["config"].append(cfg)
        out["n_customers"].append(n_c)
        out["n_orders"].append(n_o)
        out["n_lineitem"].append(lc[(cfg, "n_l")])
        out["n_co"].append(n_co)
        out["n_ol"].append(n_ol)
        out["n_col"].append(n_col_)
        out["best_first"].append(
            "customer_orders" if n_co <= n_ol else "orders_lineitem")
    return pa.table({
        "config": pa.array(out["config"]),
        "n_customers": pa.array(out["n_customers"], pa.int64()),
        "n_orders": pa.array(out["n_orders"], pa.int64()),
        "n_lineitem": pa.array(out["n_lineitem"], pa.int64()),
        "n_co": pa.array(out["n_co"], pa.int64()),
        "n_ol": pa.array(out["n_ol"], pa.int64()),
        "n_col": pa.array(out["n_col"], pa.int64()),
        "best_first": pa.array(out["best_first"]),
    }).sort_by("config")


SQL_JOIN_ORDER_AUDIT = """
WITH cfg AS (
  SELECT 'tight_customer' AS config, 1 AS negbal, 25 AS qmax
  UNION ALL
  SELECT 'tight_lineitem', 0, 1),
base AS (
  SELECT cfg.config, cfg.negbal, cfg.qmax,
         (SELECT count(*) FROM customer
          WHERE cfg.negbal = 0 OR c_acctbal < 0) AS n_customers,
         (SELECT count(*) FROM orders
          WHERE o_orderpriority = '1-URGENT') AS n_orders,
         (SELECT count(*) FROM lineitem
          WHERE l_quantity <= cfg.qmax) AS n_lineitem,
         (SELECT count(*) FROM orders o JOIN customer c
            ON o.o_custkey = c.c_custkey
          WHERE o.o_orderpriority = '1-URGENT'
            AND (cfg.negbal = 0 OR c.c_acctbal < 0)) AS n_co,
         (SELECT count(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderpriority = '1-URGENT'
            AND l.l_quantity <= cfg.qmax) AS n_ol,
         (SELECT count(*) FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE o.o_orderpriority = '1-URGENT'
            AND l.l_quantity <= cfg.qmax
            AND (cfg.negbal = 0 OR c.c_acctbal < 0)) AS n_col
  FROM cfg)
SELECT config,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_lineitem AS BIGINT) AS n_lineitem,
       CAST(n_co AS BIGINT) AS n_co,
       CAST(n_ol AS BIGINT) AS n_ol,
       CAST(n_col AS BIGINT) AS n_col,
       CASE WHEN n_co <= n_ol THEN 'customer_orders'
            ELSE 'orders_lineitem' END AS best_first
FROM base ORDER BY config
"""

QUERIES["join_order_audit"] = (q_join_order_audit,
                               SQL_JOIN_ORDER_AUDIT)


# ---------------------------------------------------------------------------
# fleiss_kappa_types — multi-rater agreement on first-3 event types
# ---------------------------------------------------------------------------


def fleiss_kappa(cells, m: int = 3) -> tuple:
    """Fleiss' κ from integer (subject, category, count) cells with
    exactly m ratings per subject: with Σnn = Σᵢ Σ_c n_ic(n_ic−1)
    and ΣT² = Σ_c (Σᵢ n_ic)²,

        κ = [Σnn·(Nm)² − Nm(m−1)·ΣT²] / [Nm(m−1)·((Nm)² − ΣT²)]

    — exact integers, one division.  Returns (n_subjects, kappa)."""
    from collections import defaultdict

    per_subj = defaultdict(int)
    cat_tot = defaultdict(int)
    snn = 0
    for s, c, n in cells:
        per_subj[s] += n
        cat_tot[c] += n
        snn += n * (n - 1)
    nsub = len(per_subj)
    assert all(v == m for v in per_subj.values())
    nm = nsub * m
    st2 = sum(v * v for v in cat_tot.values())
    num = snn * nm * nm - nm * (m - 1) * st2
    den = nm * (m - 1) * (nm * nm - st2)
    return nsub, (num / den if den else None)


def q_fleiss_kappa_types(sf_dir: str):
    """Fleiss' κ over users-as-subjects: each user's FIRST THREE
    events (by ts, event_id) are three 'raters' assigning a category
    (event type) — do users open their sessions with consistent
    behavior?  The multi-rater member of the agreement family
    (cohen/weighted: two raters; scott-pi/AC1/alpha: chance models;
    Fleiss: m raters per subject, the panel case).  Per-block
    segmented take-3 partials reduce each block to ≤3 rows per user
    before one bounded candidate merge; exact integer closure."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        e = np.asarray(t.column("event_id"), dtype=np.int64)
        o = np.lexsort((e, tsv, u))
        us, tss, es = u[o], tsv[o], e[o]
        starts = np.r_[True, us[1:] != us[:-1]] if len(us) \
            else np.zeros(0, dtype=bool)
        run_id = np.cumsum(starts) - 1
        first_idx = np.flatnonzero(starts)
        pos_in_run = np.arange(len(us)) - first_idx[run_id] \
            if len(us) else np.zeros(0, dtype=np.int64)
        keep = pos_in_run < 3
        ty = np.asarray(t.column("event_type").to_pylist())[o]
        return pa.table({
            "u": pa.array(us[keep]),
            "ts": pa.array(tss[keep]),
            "eid": pa.array(es[keep]),
            "ty": pa.array(ty[keep]),
        })

    cand = agg._to_arrow(ds.map_batches(partial,
                                        batch_format="pyarrow"))
    u = np.asarray(cand.column("u"), dtype=np.int64)
    tsv = np.asarray(cand.column("ts"), dtype=np.int64)
    e = np.asarray(cand.column("eid"), dtype=np.int64)
    ty = np.asarray(cand.column("ty").to_pylist())
    o = np.lexsort((e, tsv, u))
    us, tys = u[o], ty[o]
    starts = np.r_[True, us[1:] != us[:-1]] if len(us) \
        else np.zeros(0, dtype=bool)
    run_id = np.cumsum(starts) - 1
    first_idx = np.flatnonzero(starts)
    pos = np.arange(len(us)) - first_idx[run_id] \
        if len(us) else np.zeros(0, dtype=np.int64)
    keep = pos < 3
    # users with fewer than 3 events drop out
    cnt = np.bincount(run_id[keep])
    full = cnt == 3
    keep2 = keep & full[run_id]
    from collections import Counter

    cells = Counter(zip(us[keep2].tolist(), tys[keep2].tolist()))
    nsub, kappa = fleiss_kappa(
        [(s, c, n) for (s, c), n in cells.items()])
    return pa.table({
        "n_users": pa.array([nsub], pa.int64()),
        "fleiss_kappa": pa.array(
            [round(kappa, 6) if kappa is not None else None],
            pa.float64()),
    })


SQL_FLEISS_KAPPA_TYPES = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
f3 AS (
  SELECT user_id, event_type FROM r
  WHERE rn <= 3
    AND user_id IN (SELECT user_id FROM r GROUP BY 1
                    HAVING count(*) >= 3)),
cells AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM f3 GROUP BY 1, 2),
nn AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nsub
       FROM cells),
snn AS (SELECT CAST(sum(n * (n - 1)) AS HUGEINT) AS snn FROM cells),
st AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS st2
       FROM (SELECT event_type, CAST(sum(n) AS BIGINT) AS t
             FROM cells GROUP BY 1)),
k AS (
  SELECT nn.nsub,
         CAST(snn.snn * (nn.nsub * 3) * (nn.nsub * 3)
              - (nn.nsub * 3) * 2 * st.st2 AS DOUBLE)
         / CAST((nn.nsub * 3) * 2
                * (CAST(nn.nsub * 3 AS HUGEINT) * (nn.nsub * 3)
                   - st.st2) AS DOUBLE) AS kappa
  FROM nn, snn, st)
SELECT nsub AS n_users, round(kappa, 6) AS fleiss_kappa
FROM k
"""

QUERIES["fleiss_kappa_types"] = (q_fleiss_kappa_types,
                                 SQL_FLEISS_KAPPA_TYPES)


# ---------------------------------------------------------------------------
# jl_projection_audit — random-projection distance distortion
# ---------------------------------------------------------------------------

_JL_K = 16
_JL_SAMPLE = 100


def jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 from the shared md5 hash — the same
    expression the oracle evaluates."""
    from ..functions.hashing import md5_hash32

    return 1 if md5_hash32(f"jl_{i}_{j}") % 2 == 0 else -1


def q_jl_projection_audit(sf_dir: str):
    """Johnson-Lindenstrauss distortion audit: project the first 100
    embeddings (64-d) through a deterministic md5-seeded ±1 matrix to
    k = 16 dimensions and measure ‖RΔ‖²/(k‖Δ‖²) over all 4,950
    pairs — the certificate an ANN scale path needs before swapping
    full vectors for sketches (knn_* brute/LSH/IVF search the
    vectors; JL says how much a 4× smaller representation bends the
    metric).  JL promises concentration near 1 at rate
    O(√(log n / k)); mean/min/max quantify it on the real embedding
    table.  The sign matrix is hash-derived in BOTH engines, so the
    audit is reproducible anywhere."""
    import ray.data

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("vec_id"),
                       pa.scalar(_JL_SAMPLE, pa.int64()))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        vid = np.asarray(t.column("vec_id"), dtype=np.int64)
        emb = np.stack([np.asarray(x, dtype=np.float64)
                        for x in t.column("embedding").to_pylist()])
        n, d = emb.shape
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "v": pa.array(emb.ravel()),
        })

    m = _partial_final(ds, partial, ["vec_id", "dim"], [("v", "max")])
    vid = np.asarray(m.column("vid") if "vid" in m.column_names
                     else m.column("vec_id"), dtype=np.int64)
    dim = np.asarray(m.column("dim"), dtype=np.int64)
    val = np.asarray(m.column("v"), dtype=np.float64)
    n = int(vid.max()) + 1
    d = int(dim.max()) + 1
    X = np.zeros((n, d), dtype=np.float64)
    X[vid, dim] = val
    R = np.array([[jl_sign(i, j) for j in range(d)]
                  for i in range(_JL_K)], dtype=np.float64)
    Y = X @ R.T                       # n × k
    ii, jj = np.triu_indices(n, k=1)
    dorig = ((X[ii] - X[jj]) ** 2).sum(axis=1)
    dproj = ((Y[ii] - Y[jj]) ** 2).sum(axis=1)
    ratio = dproj / (_JL_K * dorig)
    return pa.table({
        "n_vectors": pa.array([n], pa.int64()),
        "k_dims": pa.array([_JL_K], pa.int64()),
        "n_pairs": pa.array([len(ratio)], pa.int64()),
        "mean_ratio": pa.array([round(float(ratio.mean()), 6)],
                               pa.float64()),
        "min_ratio": pa.array([round(float(ratio.min()), 6)],
                              pa.float64()),
        "max_ratio": pa.array([round(float(ratio.max()), 6)],
                              pa.float64()),
    })


SQL_JL_PROJECTION_AUDIT = """
WITH e AS (
  SELECT vec_id, CAST(j.range AS BIGINT) AS j,
         CAST(embedding[CAST(j.range AS INTEGER) + 1] AS DOUBLE) AS v
  FROM embeddings, range(64) j
  WHERE vec_id < 100),
s AS (
  SELECT CAST(i.range AS BIGINT) AS i, CAST(j.range AS BIGINT) AS j,
         CASE WHEN (('0x' || substr(md5('jl_' || i.range || '_'
                                        || j.range), 1, 8))::BIGINT)
                   % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM range(16) i, range(64) j),
y AS (
  SELECT e.vec_id, s.i, sum(s.s * e.v) AS y
  FROM e JOIN s ON s.j = e.j
  GROUP BY 1, 2),
dorig AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         sum((a.v - b.v) * (a.v - b.v)) AS d2
  FROM e a JOIN e b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY 1, 2),
dproj AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         sum((a.y - b.y) * (a.y - b.y)) AS d2
  FROM y a JOIN y b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2),
r AS (
  SELECT dproj.d2 / (16.0 * dorig.d2) AS ratio
  FROM dorig JOIN dproj USING (va, vb))
SELECT CAST(100 AS BIGINT) AS n_vectors,
       CAST(16 AS BIGINT) AS k_dims,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(ratio), 6) AS mean_ratio,
       round(min(ratio), 6) AS min_ratio,
       round(max(ratio), 6) AS max_ratio
FROM r
"""

QUERIES["jl_projection_audit"] = (q_jl_projection_audit,
                                  SQL_JL_PROJECTION_AUDIT)


# ---------------------------------------------------------------------------
# holt_winters_daily — additive triple exponential smoothing
# ---------------------------------------------------------------------------

_HW_A, _HW_B, _HW_G = 0.2, 0.05, 0.1


def holt_winters(xs) -> tuple:
    """Additive Holt-Winters with period 7 and fixed
    (α, β, γ) = (0.2, 0.05, 0.1): level/trend/seasonal recursion in
    the EXACT float expression order the recursive-CTE oracle
    replays (1−α etc. written as literals).  Init: level = mean of
    week 1, trend = (mean week 2 − mean week 1)/7, seasonals =
    week-1 deviations.  Returns (level, trend, sae, n_forecast)."""
    n = len(xs)
    w1 = sum(xs[:7]) / 7.0
    w2 = sum(xs[7:14]) / 7.0
    lvl = w1
    tr = (w2 - w1) / 7.0
    s = [xs[i] - w1 for i in range(7)]
    sae = 0.0
    for t in range(7, n):
        f = lvl + tr + s[0]
        sae = sae + abs(xs[t] - f)
        lvl_new = 0.2 * (xs[t] - s[0]) + 0.8 * (lvl + tr)
        tr = 0.05 * (lvl_new - lvl) + 0.95 * tr
        s_new = 0.1 * (xs[t] - lvl_new) + 0.9 * s[0]
        lvl = lvl_new
        s = s[1:] + [s_new]
    return lvl, tr, sae, n - 7


def q_holt_winters_daily(sf_dir: str):
    """Additive Holt-Winters smoothing of daily revenue with weekly
    seasonality — the seasonal member of the smoothing family
    (holt_backtest: level+trend; theta_forecast: SES+drift; THIS
    adds the 7-slot seasonal state the others ignore).  Fixed
    textbook constants keep the recursion deterministic; the oracle
    replays the identical float recursion in a recursive CTE
    (the kalman_local_level_daily pattern), so level, trend and the
    one-step-ahead MAE agree bit-for-bit.  Days-bounded."""
    _, cv = _daily_revenue_cents(sf_dir)
    xs = cv.astype(np.float64).tolist()
    lvl, tr, sae, nf = holt_winters(xs)
    return pa.table({
        "n_days": pa.array([len(xs)], pa.int64()),
        "hw_level": pa.array([round(lvl, 4)], pa.float64()),
        "hw_trend": pa.array([round(tr, 4)], pa.float64()),
        "mae_1step": pa.array([round(sae / nf, 4)], pa.float64()),
    })


SQL_HOLT_WINTERS_DAILY = """
WITH RECURSIVE d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS DOUBLE) AS x
  FROM orders GROUP BY 1),
o AS (
  SELECT x, row_number() OVER (ORDER BY day) AS t,
         count(*) OVER () AS n
  FROM d),
init AS (
  SELECT (SELECT sum(x) FROM o WHERE t <= 7) / 7.0 AS w1,
         (SELECT sum(x) FROM o WHERE t BETWEEN 8 AND 14) / 7.0 AS w2),
rec AS (
  SELECT 7 AS t,
         init.w1 AS lvl, (init.w2 - init.w1) / 7.0 AS tr,
         (SELECT x FROM o WHERE t = 1) - init.w1 AS s1,
         (SELECT x FROM o WHERE t = 2) - init.w1 AS s2,
         (SELECT x FROM o WHERE t = 3) - init.w1 AS s3,
         (SELECT x FROM o WHERE t = 4) - init.w1 AS s4,
         (SELECT x FROM o WHERE t = 5) - init.w1 AS s5,
         (SELECT x FROM o WHERE t = 6) - init.w1 AS s6,
         (SELECT x FROM o WHERE t = 7) - init.w1 AS s7,
         CAST(0.0 AS DOUBLE) AS sae
  FROM init
  UNION ALL
  SELECT rec.t + 1,
         0.2 * (o.x - rec.s1) + 0.8 * (rec.lvl + rec.tr),
         0.05 * ((0.2 * (o.x - rec.s1) + 0.8 * (rec.lvl + rec.tr))
                 - rec.lvl) + 0.95 * rec.tr,
         rec.s2, rec.s3, rec.s4, rec.s5, rec.s6, rec.s7,
         0.1 * (o.x - (0.2 * (o.x - rec.s1)
                       + 0.8 * (rec.lvl + rec.tr))) + 0.9 * rec.s1,
         rec.sae + abs(o.x - (rec.lvl + rec.tr + rec.s1))
  FROM rec JOIN o ON o.t = rec.t + 1),
fin AS (
  SELECT rec.t, rec.lvl, rec.tr, rec.sae
  FROM rec, (SELECT max(n) AS n FROM o) nn
  WHERE rec.t = nn.n)
SELECT (SELECT CAST(max(n) AS BIGINT) FROM o) AS n_days,
       round(lvl, 4) AS hw_level,
       round(tr, 4) AS hw_trend,
       round(sae / (t - 7), 4) AS mae_1step
FROM fin
"""

QUERIES["holt_winters_daily"] = (q_holt_winters_daily,
                                 SQL_HOLT_WINTERS_DAILY)


# ---------------------------------------------------------------------------
# linear_probe_audit — open-addressing displacement via parking sweep
# ---------------------------------------------------------------------------

_LP_LOADS = ((2, 1), (4, 3), (10, 9))    # (denom, numer): α = n/m


def linear_probe_stats(home_counts) -> tuple:
    """Linear-probing displacement from the home-slot histogram h_s
    of a NON-CIRCULAR table (spill runs past the last slot): the
    carry c_s (keys still looking for a slot after s) obeys the
    parking-function recurrence c_s = max(0, c_{s−1} + h_s − 1),
    which closes to c_s = (P_s − (s+1)) − min_{t≤s}(P_{t−1} − t)⁻
    with P the prefix sum — total displacement = Σ c_s, all exact
    integers, no replay and INDEPENDENT of insertion order (total
    displacement is layout-determined even though individual slots
    are not).  Returns (total_displacement, max_carry)."""
    h = np.asarray(home_counts, dtype=np.int64)
    if not len(h):
        return 0, 0
    p = np.cumsum(h)
    s = np.arange(1, len(h) + 1, dtype=np.int64)
    d = p - s
    prev_min = np.minimum.accumulate(np.concatenate(
        [[0], d]))[:-1]              # min(0, d_0..d_{s−1})
    c = np.maximum(d - prev_min, 0)  # c_s = max(0, d_s − that min)
    c_end = int(c[-1])               # keys still probing past slot m−1
    # they drain one per spill slot: extra Σ = c_end·(c_end−1)/2
    return int(c.sum()) + c_end * (c_end - 1) // 2, int(c.max())


def q_linear_probe_audit(sf_dir: str):
    """Open-addressing hash-table audit: place the distinct users
    into linear-probing tables at load factors 1/2, 3/4 and 9/10
    (md5 home slots) and measure total/mean displacement and the
    worst probe cluster — the Knuth result that mean displacement
    explodes like 1/(1−α)² as the table fills, priced on the real
    key set before an engine picks its hash-table headroom (the
    open-addressing companion of feature_hash_buckets' chaining
    audit).  The parking-function prefix identity turns the replay
    into one vectorized sweep per load factor, order-independent and
    exact; the oracle mirrors it with window functions — no
    recursion."""
    from ..functions.hashing import md5_hash32

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"user_id": t.column("user_id")}) \
            .group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "c"])

    m = _partial_final(ds, partial, ["user_id"], [("c", "sum")])
    users = np.asarray(m.column("user_id"), dtype=np.int64)
    n = len(users)
    kh = np.fromiter((md5_hash32(f"lp{u}") for u in users.tolist()),
                     dtype=np.int64, count=n)
    out = {"load_pct": [], "m_slots": [], "n_keys": [],
           "total_displacement": [], "mean_probe": [],
           "max_carry": []}
    for den, num in _LP_LOADS:
        mslots = (n * den + num - 1) // num
        home = kh % mslots
        h = np.bincount(home, minlength=mslots)
        tot, mx = linear_probe_stats(h)
        out["load_pct"].append(100 * num // den)
        out["m_slots"].append(mslots)
        out["n_keys"].append(n)
        out["total_displacement"].append(tot)
        out["mean_probe"].append(round(1.0 + tot / n, 6))
        out["max_carry"].append(mx)
    return pa.table({
        "load_pct": pa.array(out["load_pct"], pa.int64()),
        "m_slots": pa.array(out["m_slots"], pa.int64()),
        "n_keys": pa.array(out["n_keys"], pa.int64()),
        "total_displacement": pa.array(out["total_displacement"],
                                       pa.int64()),
        "mean_probe": pa.array(out["mean_probe"], pa.float64()),
        "max_carry": pa.array(out["max_carry"], pa.int64()),
    })


SQL_LINEAR_PROBE_AUDIT = """
WITH u AS (SELECT DISTINCT user_id FROM events),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
cfg AS (
  SELECT 50 AS load_pct, 2 AS den, 1 AS num
  UNION ALL SELECT 75, 4, 3
  UNION ALL SELECT 90, 10, 9),
sized AS (
  SELECT cfg.load_pct, nn.n,
         (nn.n * cfg.den + cfg.num - 1) // cfg.num AS m
  FROM cfg, nn),
home AS (
  SELECT s.load_pct, s.m, s.n,
         (('0x' || substr(md5('lp' || u.user_id), 1, 8))::BIGINT)
           % s.m AS slot
  FROM u, sized s),
h AS (
  SELECT load_pct, m, n, slot, CAST(count(*) AS BIGINT) AS c
  FROM home GROUP BY 1, 2, 3, 4),
grid AS (
  SELECT s.load_pct, s.m, s.n, CAST(g.range AS BIGINT) AS slot,
         coalesce(h.c, 0) AS c
  FROM sized s
       JOIN range(1000000) g ON g.range < s.m
       LEFT JOIN h ON h.load_pct = s.load_pct AND h.slot = g.range),
sweep AS (
  SELECT load_pct, m, n, slot,
         sum(c) OVER (PARTITION BY load_pct ORDER BY slot)
           - (slot + 1) AS d
  FROM grid),
carry AS (
  SELECT load_pct, m, n, slot,
         greatest(d - least(coalesce(min(d) OVER (
             PARTITION BY load_pct ORDER BY slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0), 0), 0) AS c
  FROM sweep),
tot AS (
  SELECT load_pct, max(m) AS m_slots, max(n) AS n_keys,
         CAST(sum(c) AS BIGINT)
           + CAST(max(CASE WHEN slot = m - 1
                           THEN c * (c - 1) // 2 ELSE 0 END)
                  AS BIGINT) AS total_displacement,
         CAST(max(c) AS BIGINT) AS max_carry
  FROM carry GROUP BY 1)
SELECT load_pct, m_slots, n_keys, total_displacement,
       round(1.0 + CAST(total_displacement AS DOUBLE) / n_keys, 6)
         AS mean_probe,
       max_carry
FROM tot ORDER BY 1
"""

QUERIES["linear_probe_audit"] = (q_linear_probe_audit,
                                 SQL_LINEAR_PROBE_AUDIT)


# ---------------------------------------------------------------------------
# rendezvous_hash_audit — HRW placement vs the vnode ring
# ---------------------------------------------------------------------------

_HRW_NODES = 8


def q_rendezvous_hash_audit(sf_dir: str):
    """Rendezvous (highest-random-weight) placement audit over the
    same 8 nodes and user-keyed event traffic as
    consistent_hash_ring: each user lands on argmax_node
    md5('hrw<node>_u<user>') — no vnode tuning, provably minimal
    disruption, and (unlike a ring with finite vnodes) no arc-length
    variance term.  Per node: users owned and exact event share —
    read next to the ring audit, this is the engine's
    placement-policy bake-off on real traffic.  Ties (never observed
    at 32-bit) break to the smaller node id in BOTH engines."""
    from ..functions.hashing import md5_hash32

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"user_id": t.column("user_id")}) \
            .group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "c"])

    m = _partial_final(ds, partial, ["user_id"], [("c", "sum")])
    users = np.asarray(m.column("user_id"), dtype=np.int64)
    cnt = np.asarray(m.column("c"), dtype=np.int64)
    hs = np.stack([
        np.fromiter((md5_hash32(f"hrw{nd}_u{u}")
                     for u in users.tolist()),
                    dtype=np.int64, count=len(users))
        for nd in range(_HRW_NODES)])          # nodes × users
    owner = np.argmax(hs, axis=0)              # first max = min node
    total = int(cnt.sum())
    rows = {"node": [], "n_users": [], "n_events": [],
            "event_ppm": []}
    for nd in range(_HRW_NODES):
        sel = owner == nd
        ev = int(cnt[sel].sum())
        rows["node"].append(nd)
        rows["n_users"].append(int(sel.sum()))
        rows["n_events"].append(ev)
        rows["event_ppm"].append(ev * 1_000_000 // total)
    return pa.table({
        "node": pa.array(rows["node"], pa.int64()),
        "n_users": pa.array(rows["n_users"], pa.int64()),
        "n_events": pa.array(rows["n_events"], pa.int64()),
        "event_ppm": pa.array(rows["event_ppm"], pa.int64()),
    })


SQL_RENDEZVOUS_HASH_AUDIT = """
WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
w AS (
  SELECT u.user_id, u.c, CAST(n.range AS BIGINT) AS node,
         (('0x' || substr(md5('hrw' || n.range || '_u'
                              || u.user_id), 1, 8))::BIGINT) AS h
  FROM u, range(8) n),
pick AS (
  SELECT user_id, c, node,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY h DESC, node ASC) AS rk
  FROM w),
own AS (SELECT node, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(c) AS BIGINT) AS n_events
        FROM pick WHERE rk = 1 GROUP BY 1),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS t FROM own),
grid AS (SELECT CAST(g.range AS BIGINT) AS node FROM range(8) g)
SELECT grid.node,
       coalesce(own.n_users, 0) AS n_users,
       coalesce(own.n_events, 0) AS n_events,
       coalesce(own.n_events, 0) * 1000000 // tot.t AS event_ppm
FROM grid LEFT JOIN own USING (node), tot
ORDER BY grid.node
"""

QUERIES["rendezvous_hash_audit"] = (q_rendezvous_hash_audit,
                                    SQL_RENDEZVOUS_HASH_AUDIT)


# ---------------------------------------------------------------------------
# markov_dobrushin_mixing — TV contraction coefficient of the chain
# ---------------------------------------------------------------------------


def dobrushin_delta(cells) -> tuple:
    """Dobrushin ergodicity coefficient δ(P) = ½·max_{i,k} Σ_j
    |P_ij − P_kj| from integer transition counts {(i, j): c}: each
    pair term is Σ_j |c_ij·r_k − c_kj·r_i| / (2·r_i·r_k) — exact
    integer numerators over a common denominator, compared exactly
    across pairs via cross-multiplication.  Returns
    (delta, state_a, state_b) with the lexicographically smallest
    argmax pair."""
    from collections import defaultdict

    rows = defaultdict(int)
    states = set()
    for (i, j), c in cells.items():
        rows[i] += c
        states.add(i)
        states.add(j)
    sts = sorted(states)
    best = None
    for a in range(len(sts)):
        for b in range(a + 1, len(sts)):
            i, k = sts[a], sts[b]
            ri, rk = rows[i], rows[k]
            if ri == 0 or rk == 0:
                continue
            num = sum(abs(cells.get((i, j), 0) * rk
                          - cells.get((k, j), 0) * ri)
                      for j in sts)
            den = 2 * ri * rk
            if best is None or num * best[1] > best[0] * den:
                best = (num, den, i, k)
    if best is None:
        return None, None, None
    return best[0] / best[1], best[2], best[3]


def q_markov_dobrushin_mixing(sf_dir: str):
    """Dobrushin ergodicity coefficient of the user event-type chain
    (transition counts from event_type_markov): δ = the worst-case
    total-variation contraction per step, with the mixing bound
    tv(t) ≤ δᵗ — the coefficient answers 'how many events until a
    user's behavior forgets its start state?' WITHOUT eigenvalues
    (δ upper-bounds |λ₂| and stays real for non-reversible chains,
    where power iteration can oscillate).  Exact integer pair
    comparisons via cross-multiplication; t_mix(1%) = ⌈ln .01 /
    ln δ⌉ from the one shared float."""
    counts = QUERIES["event_type_markov"][0](sf_dir)
    pv = counts.column("prev_type").to_pylist()
    cv = counts.column("cur_type").to_pylist()
    nv = np.asarray(counts.column("n"), dtype=np.int64).tolist()
    cells = {(p, c): n for p, c, n in zip(pv, cv, nv)}
    delta, sa, sb = dobrushin_delta(cells)
    if delta is not None and 0.0 < delta < 1.0:
        tmix = math.ceil(math.log(0.01) / math.log(delta))
    else:
        tmix = None
    return pa.table({
        "n_states": pa.array([len({s for s, _ in cells}
                                  | {s for _, s in cells})],
                             pa.int64()),
        "delta": pa.array(
            [round(delta, 6) if delta is not None else None],
            pa.float64()),
        "argmax_a": pa.array([sa]),
        "argmax_b": pa.array([sb]),
        "tmix_1pct": pa.array([tmix], pa.int64()),
    })


SQL_MARKOV_DOBRUSHIN_MIXING = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
tr AS (
  SELECT prev AS i, event_type AS j, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
states AS (SELECT DISTINCT i AS s FROM tr
           UNION SELECT DISTINCT j FROM tr),
rows_ AS (SELECT i, CAST(sum(c) AS BIGINT) AS r FROM tr GROUP BY 1),
pairs AS (
  SELECT a.s AS i, b.s AS k, ra.r AS ri, rb.r AS rk,
         (SELECT CAST(sum(abs(
             coalesce((SELECT c FROM tr
                       WHERE tr.i = a.s AND tr.j = st.s), 0)
               * CAST(rb.r AS HUGEINT)
             - coalesce((SELECT c FROM tr
                         WHERE tr.i = b.s AND tr.j = st.s), 0)
               * CAST(ra.r AS HUGEINT))) AS HUGEINT)
          FROM states st) AS num
  FROM states a JOIN states b ON a.s < b.s
       JOIN rows_ ra ON ra.i = a.s
       JOIN rows_ rb ON rb.i = b.s),
best AS (
  SELECT i, k, num, 2 * CAST(ri AS HUGEINT) * rk AS den,
         CAST(num AS DOUBLE) / (2.0 * ri * rk) AS delta
  FROM pairs
  ORDER BY CAST(num AS DOUBLE) / (2.0 * ri * rk) DESC, i, k
  LIMIT 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM states) AS n_states,
       round(delta, 6) AS delta,
       i AS argmax_a, k AS argmax_b,
       CASE WHEN delta > 0 AND delta < 1
            THEN CAST(ceil(ln(0.01) / ln(delta)) AS BIGINT)
       END AS tmix_1pct
FROM best
"""

QUERIES["markov_dobrushin_mixing"] = (q_markov_dobrushin_mixing,
                                      SQL_MARKOV_DOBRUSHIN_MIXING)


# ---------------------------------------------------------------------------
# kcenter_greedy_embeddings — Gonzalez 2-approx coreset selection
# ---------------------------------------------------------------------------

_KC_K = 8


def kcenter_greedy(X) -> list:
    """Gonzalez farthest-point traversal: start at index 0, then
    repeatedly take the point with the largest squared-L2 distance
    to its nearest chosen center (ties → smaller index).  The k-th
    selection radius 2-approximates the optimal k-center radius.
    Returns [(center_index, radius_sq_at_selection)] — the first
    entry has radius 0 by convention."""
    n = len(X)
    centers = [(0, 0.0)]
    mind = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(1, _KC_K):
        w = int(np.argmax(mind))         # first max = smallest index
        centers.append((w, float(mind[w])))
        d = ((X - X[w]) ** 2).sum(axis=1)
        mind = np.minimum(mind, d)
    return centers


def q_kcenter_greedy_embeddings(sf_dir: str):
    """Greedy k-center (Gonzalez) coreset over the embedding table:
    8 maximally-spread exemplars with the covering radius achieved at
    each step — the facility-location member of the clustering family
    (kmeans/kmedoids minimize AVERAGE distortion; k-center minimizes
    the WORST case, which is what a coverage-oriented data-curation
    pass wants from its exemplars), and the greedy radius is a
    provable 2-approximation.  Each step is one argmax over a
    min-distance map — per-block reducible at scale; the oracle
    unrolls the 8 steps mechanically."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        vid = np.asarray(t.column("vec_id"), dtype=np.int64)
        emb = np.stack([np.asarray(x, dtype=np.float64)
                        for x in t.column("embedding").to_pylist()]) \
            if t.num_rows else np.zeros((0, 64))
        d = emb.shape[1] if t.num_rows else 64
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(vid))),
            "v": pa.array(emb.ravel()),
        })

    m = _partial_final(ds, partial, ["vec_id", "dim"], [("v", "max")])
    vid = np.asarray(m.column("vec_id"), dtype=np.int64)
    dim = np.asarray(m.column("dim"), dtype=np.int64)
    val = np.asarray(m.column("v"), dtype=np.float64)
    n = int(vid.max()) + 1
    d = int(dim.max()) + 1
    X = np.zeros((n, d), dtype=np.float64)
    X[vid, dim] = val
    centers = kcenter_greedy(X)
    return pa.table({
        "step": pa.array(list(range(1, _KC_K + 1)), pa.int64()),
        "center_vec_id": pa.array([c for c, _ in centers],
                                  pa.int64()),
        "radius_sq": pa.array([round(r, 6) for _, r in centers],
                              pa.float64()),
    })


def _kcenter_sql() -> str:
    parts = ["""
WITH e AS (
  SELECT vec_id, CAST(j.range AS BIGINT) AS j,
         CAST(embedding[CAST(j.range AS INTEGER) + 1] AS DOUBLE) AS v
  FROM embeddings, range(64) j),
c1 AS (SELECT 0 AS vec_id, CAST(0.0 AS DOUBLE) AS radius),
m1 AS (
  SELECT a.vec_id, sum((a.v - c.v) * (a.v - c.v)) AS mind
  FROM e a JOIN e c ON c.vec_id = 0 AND c.j = a.j
  GROUP BY 1)"""]
    for t in range(2, _KC_K + 1):
        parts.append(f""",
p{t} AS (
  SELECT vec_id, mind FROM m{t - 1}
  ORDER BY mind DESC, vec_id LIMIT 1),
m{t} AS (
  SELECT m.vec_id, least(m.mind, d.dist) AS mind
  FROM m{t - 1} m JOIN (
    SELECT a.vec_id, sum((a.v - c.v) * (a.v - c.v)) AS dist
    FROM e a JOIN e c
      ON c.vec_id = (SELECT vec_id FROM p{t}) AND c.j = a.j
    GROUP BY 1) d ON d.vec_id = m.vec_id)""")
    sel = ["SELECT 1 AS step, vec_id AS center_vec_id, "
           "round(radius, 6) AS radius_sq FROM c1"]
    for t in range(2, _KC_K + 1):
        sel.append(f"SELECT {t}, vec_id, round(mind, 6) FROM p{t}")
    parts.append("\n" + "\nUNION ALL\n".join(sel) + "\nORDER BY step")
    return "".join(parts)


QUERIES["kcenter_greedy_embeddings"] = (q_kcenter_greedy_embeddings,
                                        _kcenter_sql())


# ---------------------------------------------------------------------------
# database_cracking_audit — adaptive-index scan-cost decay
# ---------------------------------------------------------------------------

_CRACK_Q = 64


def cracking_costs(values_hist, pivots, lo, hi) -> list:
    """Per-query crack costs WITHOUT replaying index state: query i
    cracks the segment (pred, succ] where pred/succ are the nearest
    earlier pivots around p_i (domain edges otherwise) — the segment
    tree is fully determined by the pivot PREFIX, so each cost is a
    prefix-window predecessor/successor lookup plus one cumulative
    histogram difference.  values_hist: sorted (value, count)
    arrays.  Returns [cost_i]."""
    vs, cs = values_hist
    cum = np.cumsum(cs)

    def count_le(x):
        k = np.searchsorted(vs, x, side="right")
        return int(cum[k - 1]) if k else 0

    costs = []
    for i, p in enumerate(pivots):
        prior = pivots[:i]
        pred = max([lo - 1] + [q for q in prior if q < p])
        succ = min([hi] + [q for q in prior if q >= p])
        costs.append(count_le(succ) - count_le(pred))
    return costs


def q_database_cracking_audit(sf_dir: str):
    """Database-cracking (adaptive indexing) audit on lineitem
    extended prices: 64 md5-derived range queries progressively crack
    the column, and the cost of query i is the size of the one
    segment it still has to scan — Idreos et al.'s observation that
    the index builds ITSELF as a side effect of querying, with
    per-query cost decaying toward log-search.  The prefix-determined
    segment identity removes the replay (each cost = predecessor/
    successor among earlier pivots + one histogram window), so the
    audit is exact integers end-to-end; first-16 vs last-16 mean
    scan cost quantifies the decay an engine buys by cracking
    instead of full-sorting up front."""
    from ..functions.hashing import md5_hash32

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100), 0), pa.int64())
        g = pa.table({"v": cents,
                      "c": pa.array(np.ones(t.num_rows,
                                            dtype=np.int64))}) \
            .group_by("v").aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    m = _partial_final(ds, partial, ["v"], [("c", "sum")]).sort_by("v")
    vs = np.asarray(m.column("v"), dtype=np.int64)
    cs = np.asarray(m.column("c"), dtype=np.int64)
    lo = int(vs.min())
    hi = int(vs.max())
    span = hi - lo + 1
    pivots = [lo + md5_hash32(f"crack{i}") % span
              for i in range(1, _CRACK_Q + 1)]
    costs = cracking_costs((vs, cs), pivots, lo, hi)
    n = int(cs.sum())
    first16 = sum(costs[:16])
    last16 = sum(costs[-16:])
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_queries": pa.array([_CRACK_Q], pa.int64()),
        "total_scanned": pa.array([sum(costs)], pa.int64()),
        "first16_scanned": pa.array([first16], pa.int64()),
        "last16_scanned": pa.array([last16], pa.int64()),
        "decay_ppm": pa.array(
            [last16 * 1_000_000 // first16 if first16 else None],
            pa.int64()),
    })


SQL_DATABASE_CRACKING_AUDIT = """
WITH hist AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1),
bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM hist),
piv AS (
  SELECT CAST(g.range AS BIGINT) + 1 AS i,
         bounds.lo + (('0x' || substr(md5('crack'
             || (g.range + 1)), 1, 8))::BIGINT)
           % (bounds.hi - bounds.lo + 1) AS p
  FROM range(64) g, bounds),
seg AS (
  SELECT a.i, a.p,
         coalesce((SELECT max(b.p) FROM piv b
                   WHERE b.i < a.i AND b.p < a.p),
                  bounds.lo - 1) AS pred,
         coalesce((SELECT min(b.p) FROM piv b
                   WHERE b.i < a.i AND b.p >= a.p),
                  bounds.hi) AS succ
  FROM piv a, bounds),
cost AS (
  SELECT seg.i,
         (SELECT coalesce(sum(c), 0) FROM hist
          WHERE v > seg.pred AND v <= seg.succ) AS cost
  FROM seg),
s AS (
  SELECT CAST(sum(cost) AS BIGINT) AS total,
         CAST(sum(CASE WHEN i <= 16 THEN cost ELSE 0 END)
              AS BIGINT) AS f16,
         CAST(sum(CASE WHEN i > 48 THEN cost ELSE 0 END)
              AS BIGINT) AS l16
  FROM cost)
SELECT (SELECT CAST(sum(c) AS BIGINT) FROM hist) AS n_rows,
       CAST(64 AS BIGINT) AS n_queries,
       total AS total_scanned,
       f16 AS first16_scanned, l16 AS last16_scanned,
       CASE WHEN f16 > 0 THEN l16 * 1000000 // f16 END AS decay_ppm
FROM s
"""

QUERIES["database_cracking_audit"] = (q_database_cracking_audit,
                                      SQL_DATABASE_CRACKING_AUDIT)


# ---------------------------------------------------------------------------
# mvcc_conflict_audit — optimistic-concurrency abort-rate estimate
# ---------------------------------------------------------------------------


def q_mvcc_conflict_audit(sf_dir: str):
    """Optimistic-concurrency conflict audit: batch each hour into
    one transaction per event type (per-writer-class txns) — a
    (user, hour) cell touched by k ≥ 2 types means k writers update
    the same row version concurrently, and first-committer-wins
    aborts k−1 of them.  Reports the per-hour-user conflict rate and
    the implied abort share of all writes — the number that decides
    between optimistic CC and per-key locking for the routed store's
    upsert path (stages/route.py + upsert_corrections).  One bounded
    (hour, user) reduce; exact integers."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id",
                                          "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        g = pa.table({
            "hour": pa.array(tsv // 3_600_000_000),
            "user_id": t.column("user_id"),
            "ty": t.column("event_type"),
        }).group_by(["hour", "user_id", "ty"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["hour", "user_id", "ty", "c"])

    m = _partial_final(ds, partial, ["hour", "user_id", "ty"],
                       [("c", "sum")])
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    uid = np.asarray(m.column("user_id"), dtype=np.int64)
    key = hr * 1_000_000_007 + uid
    uk, inv, kcnt = np.unique(key, return_inverse=True,
                              return_counts=True)
    n_cells = len(uk)
    conflicted = int((kcnt >= 2).sum())
    aborts = int((kcnt - 1)[kcnt >= 2].sum())
    writes = int(kcnt.sum())             # one write per (h,u,type)
    return pa.table({
        "n_hour_users": pa.array([n_cells], pa.int64()),
        "n_writes": pa.array([writes], pa.int64()),
        "n_conflicted_cells": pa.array([conflicted], pa.int64()),
        "n_aborts": pa.array([aborts], pa.int64()),
        "conflict_ppm": pa.array(
            [conflicted * 1_000_000 // n_cells], pa.int64()),
        "abort_ppm": pa.array([aborts * 1_000_000 // writes],
                              pa.int64()),
        "max_writers": pa.array([int(kcnt.max())], pa.int64()),
    })


SQL_MVCC_CONFLICT_AUDIT = """
WITH cell AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS k
  FROM events GROUP BY 1, 2),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(k) AS BIGINT) AS writes,
         CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS conflicted,
         CAST(sum(CASE WHEN k >= 2 THEN k - 1 ELSE 0 END) AS BIGINT)
           AS aborts,
         CAST(max(k) AS BIGINT) AS mx
  FROM cell)
SELECT n_cells AS n_hour_users, writes AS n_writes,
       conflicted AS n_conflicted_cells, aborts AS n_aborts,
       conflicted * 1000000 // n_cells AS conflict_ppm,
       aborts * 1000000 // writes AS abort_ppm,
       mx AS max_writers
FROM s
"""

QUERIES["mvcc_conflict_audit"] = (q_mvcc_conflict_audit,
                                  SQL_MVCC_CONFLICT_AUDIT)


# ---------------------------------------------------------------------------
# fsst_bigram_audit — frequent-substring dictionary compression
# ---------------------------------------------------------------------------

_FSST_TOP = 8


def fsst_bigram_counts(names, bigrams) -> dict:
    """Non-overlapping left-to-right occurrence counts of each
    candidate bigram across names — str.replace semantics, the SAME
    count (len − len(replace))/2 the oracle computes."""
    out = {}
    for bg in bigrams:
        tot = 0
        for nm in names:
            tot += (len(nm) - len(nm.replace(bg, ""))) // 2
        out[bg] = tot
    return out


def q_fsst_bigram_audit(sf_dir: str):
    """FSST-style substring-dictionary audit of part names: which 8
    two-byte sequences, replaced by one-byte codes, save the most
    storage?  The frequent-substring member of the encoding family
    (dict_encoding_audit: whole values; prefix_compression_audit:
    sorted prefixes; THIS: within-value substrings — the idea behind
    FSST/zstd dictionaries).  Candidates are every observed adjacent
    character pair; savings use NON-OVERLAPPING left-to-right counts
    ((len − len(replace))/2 in both engines, so the semantics match
    byte-for-byte); ranked by (count desc, bigram asc)."""
    ds = _read(sf_dir, "part", columns=["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        names = t.column("p_name").to_pylist()
        from collections import Counter

        cand = set()
        for nm in names:
            for i in range(len(nm) - 1):
                cand.add(nm[i:i + 2])
        cnt = fsst_bigram_counts(names, sorted(cand))
        tot_bytes = sum(len(nm) for nm in names)
        bgs = sorted(cnt)
        return pa.table({
            "bg": pa.array(bgs + ["\x00TOTBYTES"]),
            "c": pa.array([cnt[b] for b in bgs] + [tot_bytes],
                          pa.int64()),
        })

    m = _partial_final(ds, partial, ["bg"], [("c", "sum")])
    bg = m.column("bg").to_pylist()
    cv = np.asarray(m.column("c"), dtype=np.int64)
    tot_bytes = 0
    pairs = []
    for b, c in zip(bg, cv.tolist()):
        if b == "\x00TOTBYTES":
            tot_bytes = c
        else:
            pairs.append((b, c))
    pairs.sort(key=lambda t: (-t[1], t[0]))
    top = pairs[:_FSST_TOP]
    cum = 0
    rows = {"rank": [], "bigram": [], "n_occurrences": [],
            "cum_saved_ppm": []}
    for r, (b, c) in enumerate(top, 1):
        cum += c
        rows["rank"].append(r)
        rows["bigram"].append(b)
        rows["n_occurrences"].append(c)
        rows["cum_saved_ppm"].append(cum * 1_000_000 // tot_bytes)
    return pa.table({
        "rank": pa.array(rows["rank"], pa.int64()),
        "bigram": pa.array(rows["bigram"]),
        "n_occurrences": pa.array(rows["n_occurrences"], pa.int64()),
        "cum_saved_ppm": pa.array(rows["cum_saved_ppm"], pa.int64()),
    })


SQL_FSST_BIGRAM_AUDIT = """
WITH pos AS (
  SELECT unnest(generate_series(
           0, (SELECT CAST(max(length(p_name)) AS BIGINT) - 2
               FROM part))) AS r),
cand AS (
  SELECT DISTINCT substr(p_name, CAST(pos.r AS INTEGER) + 1, 2)
           AS bg
  FROM part, pos
  WHERE pos.r + 2 <= length(p_name)),
cnt AS (
  SELECT cand.bg,
         CAST(sum((length(p_name)
                   - length(replace(p_name, cand.bg, ''))) // 2)
              AS BIGINT) AS c
  FROM part, cand GROUP BY 1),
tot AS (SELECT CAST(sum(length(p_name)) AS BIGINT) AS b FROM part),
top AS (
  SELECT bg, c, row_number() OVER (ORDER BY c DESC, bg) AS rank
  FROM cnt),
cum AS (
  SELECT rank, bg, c,
         sum(c) OVER (ORDER BY rank) AS cumc
  FROM top WHERE rank <= 8)
SELECT rank, bg AS bigram, c AS n_occurrences,
       CAST(cumc * 1000000 // tot.b AS BIGINT) AS cum_saved_ppm
FROM cum, tot ORDER BY rank
"""

QUERIES["fsst_bigram_audit"] = (q_fsst_bigram_audit,
                                SQL_FSST_BIGRAM_AUDIT)


# ---------------------------------------------------------------------------
# tukey_gh_fit_daily — quantile-based g-and-h shape fit
# ---------------------------------------------------------------------------


def tukey_gh(qs) -> tuple:
    """Hoaglin's quantile estimators of Tukey's g-and-h shape from
    (x_p10, x_p25, med, x_p75, x_p90) and the shared Φ⁻¹:
    g_p = ln((x_{1−p}−med)/(med−x_p))/z_{1−p} at p = 0.1 (skewness);
    h from the half-spread ratio after de-skewing: h =
    ln(g·(x_{.9}−x_{.1}) / (e^{g z}−e^{−g z}) / ((x_{.75}−x_{.25})
    ·g/(e^{g z₂}−e^{−g z₂}))) / ((z² − z₂²)/2) — heavy tails ⇒
    h > 0.  Returns (g, h)."""
    x10, x25, med, x75, x90 = qs
    z9 = inv_phi_upper(0.9)
    z75 = inv_phi_upper(0.75)
    up = x90 - med
    dn = med - x10
    if up <= 0 or dn <= 0:
        return None, None
    g = math.log(up / dn) / z9
    if abs(g) < 1e-12:
        s9 = (x90 - x10) / (2.0 * z9)
        s75 = (x75 - x25) / (2.0 * z75)
    else:
        s9 = g * (x90 - x10) / (math.exp(g * z9)
                                - math.exp(-g * z9))
        s75 = g * (x75 - x25) / (math.exp(g * z75)
                                 - math.exp(-g * z75))
    if s9 <= 0 or s75 <= 0:
        return g, None
    h = math.log(s9 / s75) / ((z9 * z9 - z75 * z75) / 2.0)
    return g, h


def q_tukey_gh_fit_daily(sf_dir: str):
    """Tukey g-and-h shape fit of daily revenue from five exact
    ceil-rank order statistics — the quantile-based distributional
    profile (g: skewness direction/strength, h: tail heaviness)
    that complements the moment tests (dagostino_k2, jarque_bera
    break down exactly when h > 0 makes moments unstable; quantiles
    never do).  Φ⁻¹ via the shared Acklam tree; both engines read
    the same five order statistics."""
    _, cv = _daily_revenue_cents(sf_dir)
    x = np.sort(cv)
    n = len(x)

    def q_at(p):
        k = max(1, (int(p * 100) * n + 99) // 100)
        return float(x[k - 1])

    qs = (q_at(0.10), q_at(0.25), q_at(0.50), q_at(0.75),
          q_at(0.90))
    g, h = tukey_gh(qs)
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "q10": pa.array([qs[0]], pa.float64()),
        "median": pa.array([qs[2]], pa.float64()),
        "q90": pa.array([qs[4]], pa.float64()),
        "g_skew": pa.array([round(g, 6) if g is not None else None],
                           pa.float64()),
        "h_tail": pa.array([round(h, 6) if h is not None else None],
                           pa.float64()),
    })


def _tukey_gh_sql() -> str:
    z9 = _acklam_sql("CAST(0.9 AS DOUBLE)")
    z75 = _acklam_sql("CAST(0.75 AS DOUBLE)")
    return f"""
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
o AS (
  SELECT CAST(cents AS DOUBLE) AS x,
         row_number() OVER (ORDER BY cents) AS r,
         count(*) OVER () AS n
  FROM d),
q AS (
  SELECT
    (SELECT x FROM o WHERE r = greatest(1, (10 * n + 99) // 100)
     LIMIT 1) AS x10,
    (SELECT x FROM o WHERE r = greatest(1, (25 * n + 99) // 100)
     LIMIT 1) AS x25,
    (SELECT x FROM o WHERE r = greatest(1, (50 * n + 99) // 100)
     LIMIT 1) AS med,
    (SELECT x FROM o WHERE r = greatest(1, (75 * n + 99) // 100)
     LIMIT 1) AS x75,
    (SELECT x FROM o WHERE r = greatest(1, (90 * n + 99) // 100)
     LIMIT 1) AS x90,
    (SELECT CAST(max(n) AS BIGINT) FROM o) AS n),
z AS (SELECT q.*, {z9} AS z9, {z75} AS z75 FROM q),
g AS (
  SELECT z.*,
         CASE WHEN x90 - med > 0 AND med - x10 > 0
              THEN ln((x90 - med) / (med - x10)) / z9 END AS gv
  FROM z),
s AS (
  SELECT g.*,
         CASE WHEN gv IS NULL THEN NULL
              WHEN abs(gv) < 1e-12 THEN (x90 - x10) / (2.0 * z9)
              ELSE gv * (x90 - x10)
                   / (exp(gv * z9) - exp(-gv * z9)) END AS s9,
         CASE WHEN gv IS NULL THEN NULL
              WHEN abs(gv) < 1e-12 THEN (x75 - x25) / (2.0 * z75)
              ELSE gv * (x75 - x25)
                   / (exp(gv * z75) - exp(-gv * z75)) END AS s75
  FROM g)
SELECT n AS n_days, x10 AS q10, med AS median, x90 AS q90,
       round(gv, 6) AS g_skew,
       CASE WHEN s9 > 0 AND s75 > 0 THEN
         round(ln(s9 / s75) / ((z9 * z9 - z75 * z75) / 2.0), 6)
       END AS h_tail
FROM s
"""


QUERIES["tukey_gh_fit_daily"] = (q_tukey_gh_fit_daily,
                                 _tukey_gh_sql())


# ---------------------------------------------------------------------------
# schnabel_user_estimate — K-sample capture-recapture population size
# ---------------------------------------------------------------------------


def schnabel(day_counts) -> tuple:
    """Schnabel estimator from per-day (captures C_t, new n_t) in day
    order: marked pool M_t = Σ_{s<t} n_s, recaptures R_t = C_t − n_t;
    N̂ = Σ C_t·M_t / (Σ R_t + 1) (the Chapman-adjusted denominator
    keeps it finite with few recaptures).  Exact integers, one
    division.  Returns (sum_cm, sum_r, n_hat)."""
    m = 0
    sum_cm = 0
    sum_r = 0
    for c, new in day_counts:
        sum_cm += c * m
        sum_r += c - new
        m += new
    return sum_cm, sum_r, sum_cm / (sum_r + 1.0)


def q_schnabel_user_estimate(sf_dir: str):
    """Schnabel multi-sample capture-recapture estimate of the user
    population from daily activity: each day is a capture occasion,
    previously-seen users are 'marked', and the recapture rate prices
    the unseen mass — the K-sample generalization of
    capture_recapture_users (Lincoln-Petersen/Chapman uses exactly
    two occasions; Schnabel pools every day's recapture evidence).
    Per-user first-seen day from one bounded reduce; per-day capture
    and new counts close the estimator in exact integers."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        g = pa.table({
            "user_id": t.column("user_id"),
            "day": pa.array(tsv // _DAY_US),
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by(["user_id", "day"]).aggregate([("c", "max")])
        return g.rename_columns(["user_id", "day", "c"])

    m = _partial_final(ds, partial, ["user_id", "day"], [("c", "max")])
    uid = np.asarray(m.column("user_id"), dtype=np.int64)
    day = np.asarray(m.column("day"), dtype=np.int64)
    # first-seen day per user
    order = np.lexsort((day, uid))
    us, ds_ = uid[order], day[order]
    first = np.r_[True, us[1:] != us[:-1]]
    first_day = {}
    for u, d in zip(us[first].tolist(), ds_[first].tolist()):
        first_day[u] = d
    days = np.unique(day)
    caps = []
    for d in days.tolist():
        sel = day == d
        c = int(sel.sum())
        new = sum(1 for u in uid[sel].tolist() if first_day[u] == d)
        caps.append((c, new))
    sum_cm, sum_r, n_hat = schnabel(caps)
    n_true = len(first_day)
    return pa.table({
        "n_days": pa.array([len(days)], pa.int64()),
        "n_distinct_users": pa.array([n_true], pa.int64()),
        "sum_cm": pa.array([sum_cm], pa.int64()),
        "sum_recaptures": pa.array([sum_r], pa.int64()),
        "schnabel_n_hat": pa.array([round(n_hat, 4)], pa.float64()),
    })


SQL_SCHNABEL_USER_ESTIMATE = """
WITH pres AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
  FROM events),
fd AS (SELECT user_id, min(day) AS fday FROM pres GROUP BY 1),
dc AS (
  SELECT pres.day, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(CASE WHEN fd.fday = pres.day THEN 1 ELSE 0 END)
              AS BIGINT) AS newu
  FROM pres JOIN fd USING (user_id) GROUP BY 1),
run AS (
  SELECT day, c, newu,
         coalesce(sum(newu) OVER (ORDER BY day ROWS BETWEEN
             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS m
  FROM dc),
s AS (
  SELECT CAST(sum(c * m) AS BIGINT) AS sum_cm,
         CAST(sum(c - newu) AS BIGINT) AS sum_r,
         CAST(count(*) AS BIGINT) AS n_days
  FROM run)
SELECT n_days,
       (SELECT CAST(count(*) AS BIGINT) FROM fd) AS n_distinct_users,
       sum_cm, sum_r AS sum_recaptures,
       round(CAST(sum_cm AS DOUBLE) / (sum_r + 1.0), 4)
         AS schnabel_n_hat
FROM s
"""

QUERIES["schnabel_user_estimate"] = (q_schnabel_user_estimate,
                                     SQL_SCHNABEL_USER_ESTIMATE)


# ---------------------------------------------------------------------------
# dtw_dow_profiles — exact integer dynamic time warping
# ---------------------------------------------------------------------------


def dtw_int(xs, ys) -> int:
    """Classic DTW with |·| cost and unit steps, exact integers."""
    n, m = len(xs), len(ys)
    INF = 1 << 62
    prev = [INF] * m
    for i in range(n):
        cur = [0] * m
        for j in range(m):
            c = abs(xs[i] - ys[j])
            if i == 0 and j == 0:
                best = 0
            elif i == 0:
                best = cur[j - 1]
            elif j == 0:
                best = prev[j]
            else:
                best = min(prev[j], prev[j - 1], cur[j - 1])
            cur[j] = c + best
        prev = cur
    return prev[m - 1]


def q_dtw_dow_profiles(sf_dir: str):
    """Exact-integer dynamic time warping between the Monday and
    Sunday hourly traffic profiles (24-point integer count vectors):
    does the weekend day follow the same shape as the weekday,
    merely TIME-SHIFTED?  DTW answers what the rigid L1 comparison
    (hellinger_js_weekend, median_polish) cannot — the warping gain
    (L1 − DTW)/L1 quantifies how much of the difference is pure
    phase shift.  The 24×24 DP is exact integers; the oracle unrolls
    the 24 DP rows with the prefix-min window identity
    d[j] = prefC[j] + min_{k≤j}(m[k] − prefC[k−1]) — no recursion,
    no floats."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        day = tsv // _DAY_US
        dow = (day + 4) % 7
        hour = (tsv // 3_600_000_000) % 24
        keep = (dow == 0) | (dow == 6)
        g = pa.table({
            "dow": pa.array(dow[keep]),
            "hour": pa.array(hour[keep]),
            "c": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
        }).group_by(["dow", "hour"]).aggregate([("c", "sum")])
        return g.rename_columns(["dow", "hour", "c"])

    m = _partial_final(ds, partial, ["dow", "hour"], [("c", "sum")])
    dw = np.asarray(m.column("dow"), dtype=np.int64)
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    cv = np.asarray(m.column("c"), dtype=np.int64)
    mon = np.zeros(24, dtype=np.int64)
    sun = np.zeros(24, dtype=np.int64)
    mon[hr[dw == 0]] = cv[dw == 0]
    sun[hr[dw == 6]] = cv[dw == 6]
    d = dtw_int(mon.tolist(), sun.tolist())
    l1 = int(np.abs(mon - sun).sum())
    gain = (l1 - d) * 1_000_000 // l1 if l1 else None
    return pa.table({
        "dtw_dist": pa.array([d], pa.int64()),
        "l1_dist": pa.array([l1], pa.int64()),
        "warp_gain_ppm": pa.array([gain], pa.int64()),
    })


def _dtw_sql() -> str:
    head = """
WITH mon AS (
  SELECT CAST(hour(ts) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS x
  FROM events
  WHERE (CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 4) % 7 = 0
  GROUP BY 1),
sun AS (
  SELECT CAST(hour(ts) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS y
  FROM events
  WHERE (CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 4) % 7 = 6
  GROUP BY 1),
grid AS (
  SELECT CAST(g.range AS BIGINT) AS j,
         coalesce(sun.y, 0) AS y
  FROM range(24) g LEFT JOIN sun ON sun.h = g.range),
xg AS (
  SELECT CAST(g.range AS BIGINT) AS i,
         coalesce(mon.x, 0) AS x
  FROM range(24) g LEFT JOIN mon ON mon.h = g.range),
r0 AS (
  SELECT grid.j,
         sum(abs((SELECT x FROM xg WHERE i = 0) - grid.y))
           OVER (ORDER BY grid.j) AS d
  FROM grid)"""
    rows = [head]
    for i in range(1, 24):
        rows.append(f""",
c{i} AS (
  SELECT grid.j, abs((SELECT x FROM xg WHERE i = {i}) - grid.y) AS c,
         r{i - 1}.d AS pu,
         lag(r{i - 1}.d) OVER (ORDER BY grid.j) AS pul
  FROM grid JOIN r{i - 1} ON r{i - 1}.j = grid.j),
m{i} AS (
  SELECT j, c,
         least(pu, coalesce(pul, pu)) AS m,
         sum(c) OVER (ORDER BY j) AS prefc
  FROM c{i}),
r{i} AS (
  SELECT j,
         prefc + min(m - (prefc - c)) OVER (ORDER BY j) AS d
  FROM m{i})""")
    rows.append("""
SELECT CAST((SELECT d FROM r23 WHERE j = 23) AS BIGINT) AS dtw_dist,
       (SELECT CAST(sum(abs(xg.x - grid.y)) AS BIGINT)
        FROM xg JOIN grid ON grid.j = xg.i) AS l1_dist,
       CASE WHEN (SELECT sum(abs(xg.x - grid.y))
                  FROM xg JOIN grid ON grid.j = xg.i) > 0 THEN
         CAST(((SELECT sum(abs(xg.x - grid.y))
                FROM xg JOIN grid ON grid.j = xg.i)
               - (SELECT d FROM r23 WHERE j = 23)) * 1000000
              // (SELECT sum(abs(xg.x - grid.y))
                  FROM xg JOIN grid ON grid.j = xg.i) AS BIGINT)
       END AS warp_gain_ppm""")
    return "".join(rows)


QUERIES["dtw_dow_profiles"] = (q_dtw_dow_profiles, _dtw_sql())


# ---------------------------------------------------------------------------
# sorted_neighborhood_linkage — SNM blocking for record linkage
# ---------------------------------------------------------------------------

_SNM_W = 4
_SNM_THRESH = 0.9


def q_sorted_neighborhood_linkage(sf_dir: str):
    """Sorted-neighborhood record linkage over part names: sort by
    (name, key), compare each record only to its next 4 neighbors,
    and count Jaro-Winkler ≥ 0.9 matches — the THIRD blocking
    strategy in the repo's entity-resolution family
    (soundex_part_blocking: phonetic buckets;
    prefix_jaccard_join/LSH: set similarity; SNM: one sort + a
    sliding window, THE classic when typos keep lexical neighbors
    adjacent).  O(w·n) comparisons instead of O(n²); the kernel is
    the python jaro_winkler pinned bit-equal to DuckDB's built-in by
    pytest.  Sorting is the range-partitionable step at scale."""
    from .queries_ext3 import jaro_winkler

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("p_partkey").cast(pa.int64()),
                         "nm": t.column("p_name")})

    m = _partial_final(ds, partial, ["k"], [("nm", "max")])
    ks = np.asarray(m.column("k"), dtype=np.int64)
    nms = np.asarray(m.column("nm").to_pylist())
    order = np.lexsort((ks, nms))
    nms_s = nms[order].tolist()
    n = len(nms_s)
    cand = 0
    matches = 0
    max_sim = 0.0
    for i in range(n):
        for w in range(1, _SNM_W + 1):
            if i + w >= n:
                break
            cand += 1
            s = round(jaro_winkler(nms_s[i], nms_s[i + w]), 6)
            if s > max_sim:
                max_sim = s
            if s >= _SNM_THRESH:
                matches += 1
    return pa.table({
        "n_records": pa.array([n], pa.int64()),
        "n_candidates": pa.array([cand], pa.int64()),
        "n_matches": pa.array([matches], pa.int64()),
        "match_ppm": pa.array(
            [matches * 1_000_000 // cand if cand else None],
            pa.int64()),
        "max_sim": pa.array([round(max_sim, 6)], pa.float64()),
    })


SQL_SORTED_NEIGHBORHOOD_LINKAGE = """
WITH s AS (
  SELECT p_name,
         row_number() OVER (ORDER BY p_name, p_partkey) AS rn
  FROM part),
pairs AS (
  SELECT round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
  FROM s a JOIN s b
    ON b.rn > a.rn AND b.rn <= a.rn + 4)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_records,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matches,
       CAST(sum(CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS match_ppm,
       round(max(sim), 6) AS max_sim
FROM pairs
"""

QUERIES["sorted_neighborhood_linkage"] = (
    q_sorted_neighborhood_linkage, SQL_SORTED_NEIGHBORHOOD_LINKAGE)


# ---------------------------------------------------------------------------
# pickands_tail_values — third classic tail-index estimator
# ---------------------------------------------------------------------------


def pickands_xi(x_k, x_2k, x_4k):
    """Pickands (1975): ξ = ln((x_k − x_2k)/(x_2k − x_4k)) / ln 2
    from the k, 2k, 4k upper order statistics."""
    num = x_k - x_2k
    den = x_2k - x_4k
    if num <= 0 or den <= 0:
        return None
    return math.log(num / den) / math.log(2.0)


def q_pickands_tail_values(sf_dir: str):
    """Pickands tail-index estimate of event values — the third
    member of the extreme-value triangle (hill_tail_index: log
    spacings, heavy tails only; gpd_pot_fit_values: likelihood over
    a threshold; Pickands: three order statistics, valid for ALL
    three EV domains including bounded tails where Hill cannot go).
    k = n/20; the three exact ceil-rank order statistics come from
    the bounded cents histogram both engines share."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("value"), 100), 0), pa.int64())
        g = pa.table({"v": cents,
                      "c": pa.array(np.ones(t.num_rows,
                                            dtype=np.int64))}) \
            .group_by("v").aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    m = _partial_final(ds, partial, ["v"], [("c", "sum")]).sort_by("v")
    vs = np.asarray(m.column("v"), dtype=np.int64)
    cs = np.asarray(m.column("c"), dtype=np.int64)
    n = int(cs.sum())
    k = n // 20
    cum = np.cumsum(cs)

    def kth_largest(kk):
        # value at descending rank kk = value at ascending rank n−kk+1
        return int(vs[np.searchsorted(cum, n - kk + 1)])

    x_k, x_2k, x_4k = (kth_largest(k), kth_largest(2 * k),
                       kth_largest(4 * k))
    xi = pickands_xi(float(x_k), float(x_2k), float(x_4k))
    return pa.table({
        "n_values": pa.array([n], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "x_k": pa.array([x_k], pa.int64()),
        "x_2k": pa.array([x_2k], pa.int64()),
        "x_4k": pa.array([x_4k], pa.int64()),
        "pickands_xi": pa.array(
            [round(xi, 6) if xi is not None else None], pa.float64()),
    })


SQL_PICKANDS_TAIL_VALUES = """
WITH h AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cm FROM h),
k AS (SELECT nn.n, nn.n // 20 AS k FROM nn),
os AS (
  SELECT k.n, k.k,
         (SELECT min(v) FROM cum, k WHERE cm >= k.n - k.k + 1)
           AS x_k,
         (SELECT min(v) FROM cum, k WHERE cm >= k.n - 2 * k.k + 1)
           AS x_2k,
         (SELECT min(v) FROM cum, k WHERE cm >= k.n - 4 * k.k + 1)
           AS x_4k
  FROM k)
SELECT n AS n_values, k, x_k, x_2k, x_4k,
       CASE WHEN x_k - x_2k > 0 AND x_2k - x_4k > 0 THEN
         round(ln(CAST(x_k - x_2k AS DOUBLE)
                  / (x_2k - x_4k)) / ln(2.0), 6)
       END AS pickands_xi
FROM os
"""

QUERIES["pickands_tail_values"] = (q_pickands_tail_values,
                                   SQL_PICKANDS_TAIL_VALUES)


# ---------------------------------------------------------------------------
# session_timeout_sensitivity — how the session count depends on T
# ---------------------------------------------------------------------------

_STS_TIMEOUTS_US = (300_000_000, 1_800_000_000, 7_200_000_000)


def _user_gap_hist(ds2, batch_size: int) -> pa.Table:
    """Exact same-user inter-event-gap histogram (gsec, c) over a
    dataset already sorted by (_pkey, user_id, ts_us, event_id).

    Each batch computes its IN-batch gaps vectorized and additionally
    emits its first and last rows as edge markers.  Batches are
    contiguous ranges of the global sort order, so after re-sorting
    the edge rows by the same composite key (+ is_last so a
    single-row batch keeps first-before-last) the rows at positions
    (2k+1, 2k+2) are exactly the adjacent batch-boundary neighbors —
    the one gap per boundary the in-batch pass cannot see.  Those
    O(#batches) same-user boundary gaps are repaired driver-side, so
    a user's events straddling a batch boundary lose nothing (the
    round-3 advice defect: 2 gaps silently dropped on a 1.5M-row
    single-user stream)."""
    empty = pa.table({
        "kind": pa.array([], pa.int8()),
        "gsec": pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
        "pkey": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts_us": pa.array([], pa.int64()),
        "event_id": pa.array([], pa.int64()),
        "is_last": pa.array([], pa.int8()),
    })

    def gaps_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        tss = np.asarray(t.column("ts_us"), dtype=np.int64)
        same = u[1:] == u[:-1]
        gsec = ((tss[1:] - tss[:-1])[same]) // 1_000_000
        g = pa.table({"gsec": pa.array(gsec),
                      "c": pa.array(np.ones(len(gsec),
                                            dtype=np.int64))}) \
            .group_by("gsec").aggregate([("c", "sum")])
        n_h = g.num_rows
        edge_idx = np.array([0, len(u) - 1], dtype=np.int64)
        pk = np.asarray(t.column("_pkey"), dtype=np.int64)
        ev = np.asarray(t.column("event_id"), dtype=np.int64)
        return pa.table({
            "kind": pa.array([0] * n_h + [1, 1], pa.int8()),
            "gsec": pa.concat_arrays(
                [g.column("gsec").combine_chunks().cast(pa.int64()),
                 pa.array([0, 0], pa.int64())]),
            "c": pa.concat_arrays(
                [g.column("c_sum").combine_chunks().cast(pa.int64()),
                 pa.array([0, 0], pa.int64())]),
            "pkey": pa.array(
                np.concatenate([np.zeros(n_h, np.int64),
                                pk[edge_idx]])),
            "user_id": pa.array(
                np.concatenate([np.zeros(n_h, np.int64),
                                u[edge_idx]])),
            "ts_us": pa.array(
                np.concatenate([np.zeros(n_h, np.int64),
                                tss[edge_idx]])),
            "event_id": pa.array(
                np.concatenate([np.zeros(n_h, np.int64),
                                ev[edge_idx]])),
            "is_last": pa.array([0] * n_h + [0, 1], pa.int8()),
        })

    raw = agg._to_arrow(
        ds2.map_batches(gaps_part, batch_format="pyarrow",
                        batch_size=batch_size))
    hist = raw.filter(pc.equal(raw.column("kind"), 0)) \
        .select(["gsec", "c"])
    edges = raw.filter(pc.equal(raw.column("kind"), 1)) \
        .sort_by([("pkey", "ascending"), ("user_id", "ascending"),
                  ("ts_us", "ascending"), ("event_id", "ascending"),
                  ("is_last", "ascending")])
    eu = np.asarray(edges.column("user_id"), dtype=np.int64)
    ets = np.asarray(edges.column("ts_us"), dtype=np.int64)
    if len(eu) >= 4:
        # boundary neighbors: (last of batch k, first of batch k+1)
        u_last, u_first = eu[1::2][:-1], eu[2::2]
        t_last, t_first = ets[1::2][:-1], ets[2::2]
        same = u_last == u_first
        bg = (t_first[same] - t_last[same]) // 1_000_000
        if len(bg):
            hist = pa.concat_tables([hist, pa.table({
                "gsec": pa.array(bg),
                "c": pa.array(np.ones(len(bg), np.int64))})])
    return hist.group_by("gsec").aggregate([("c", "sum")]) \
        .rename_columns(["gsec", "c"]).sort_by("gsec")


def q_session_timeout_sensitivity(sf_dir: str):
    """Session-count sensitivity to the inactivity timeout: sessions
    at T = #users + #same-user gaps exceeding T, so ONE bounded
    per-user gap histogram prices EVERY candidate timeout at once —
    the parameter-sensitivity audit behind event_sessions' fixed
    30-minute choice (if the count swings hard between 5 min and
    2 h, the downstream session metrics inherit that fragility).
    Also reports the median same-user gap as the natural timescale.
    Gaps from per-partition vectorized lexsort; exact integers."""
    ds = _read(sf_dir, "events", columns=["ts", "event_id",
                                          "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        return pa.table({
            "_pkey": pa.array(u % 32),
            "user_id": t.column("user_id"),
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": t.column("event_id"),
        })

    ds2 = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(["_pkey", "user_id", "ts_us", "event_id"])
    m = _user_gap_hist(ds2, batch_size=1 << 20)
    gs = np.asarray(m.column("gsec"), dtype=np.int64)
    cs = np.asarray(m.column("c"), dtype=np.int64)
    total_gaps = int(cs.sum())
    cum = np.cumsum(cs)
    k_med = (total_gaps + 1) // 2
    med_gap = int(gs[np.searchsorted(cum, k_med)]) if total_gaps \
        else None
    ds_u = _read(sf_dir, "events", columns=["user_id"])

    def upart(t: pa.Table) -> pa.Table:
        g = pa.table({"u": t.column("user_id")}) \
            .group_by("u").aggregate([([], "count_all")])
        return g.rename_columns(["u", "c"])

    um = _partial_final(ds_u, upart, ["u"], [("c", "sum")])
    n_users = um.num_rows
    rows = {"timeout_s": [], "n_sessions": []}
    for t_us in _STS_TIMEOUTS_US:
        tsec = t_us // 1_000_000
        over = int(cs[gs > tsec].sum())
        rows["timeout_s"].append(tsec)
        rows["n_sessions"].append(n_users + over)
    return pa.table({
        "timeout_s": pa.array(rows["timeout_s"], pa.int64()),
        "n_sessions": pa.array(rows["n_sessions"], pa.int64()),
        "n_users": pa.array([n_users] * 3, pa.int64()),
        "median_gap_s": pa.array([med_gap] * 3, pa.int64()),
    })


SQL_SESSION_TIMEOUT_SENSITIVITY = """
WITH g AS (
  SELECT (CAST(epoch_us(ts) AS BIGINT)
          - lag(CAST(epoch_us(ts) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id))
           // 1000000 AS gsec
  FROM events),
gg AS (SELECT gsec FROM g WHERE gsec IS NOT NULL),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
       FROM events),
med AS (
  SELECT CAST(min(gsec) AS BIGINT) AS m FROM (
    SELECT gsec, row_number() OVER (ORDER BY gsec) AS r,
           count(*) OVER () AS n
    FROM gg)
  WHERE r >= (n + 1) // 2),
t AS (SELECT CAST(x.t AS BIGINT) AS timeout_s
      FROM (VALUES (300), (1800), (7200)) x(t))
SELECT t.timeout_s,
       nu.n + (SELECT CAST(count(*) AS BIGINT) FROM gg
               WHERE gsec > t.timeout_s) AS n_sessions,
       nu.n AS n_users,
       med.m AS median_gap_s
FROM t, nu, med
ORDER BY t.timeout_s
"""

QUERIES["session_timeout_sensitivity"] = (
    q_session_timeout_sensitivity, SQL_SESSION_TIMEOUT_SENSITIVITY)


# ---------------------------------------------------------------------------
# quantile_regression_p90 — exact 0.9-quantile trend line
# ---------------------------------------------------------------------------


def qreg_fit(xs, ys, tau_num: int = 9, tau_den: int = 10) -> tuple:
    """Exact quantile regression (Koenker-Bassett) by LP vertex
    enumeration — the LAD machinery with the asymmetric check loss
    ρ_τ: candidate lines pass through two points; cost numerator
    = Σ (τ·over + (1−τ)·under) on the ×tau_den·|dx| integer scale.
    Tie-break (cost, i, j) as in lad_fit.  Returns
    (i, j, slope, intercept, cost)."""
    x = np.asarray(xs, dtype=np.int64)
    y = np.asarray(ys, dtype=np.int64)
    n = len(x)
    ii, jj = np.triu_indices(n, k=1)
    dx = x[jj] - x[ii]
    dy = y[jj] - y[ii]
    resid = ((y[None, :] - y[ii][:, None]) * dx[:, None]
             - dy[:, None] * (x[None, :] - x[ii][:, None]))
    sgn = np.sign(dx)[:, None]
    resid = resid * sgn                  # residual × |dx|, signed
    over = np.where(resid > 0, resid, 0).sum(axis=1)
    under = np.where(resid < 0, -resid, 0).sum(axis=1)
    cost = tau_num * over + (tau_den - tau_num) * under
    key = cost / np.abs(dx).astype(np.float64)
    order = np.lexsort((jj, ii, key))
    w = order[0]
    i, j = int(ii[w]), int(jj[w])
    b = float(dy[w]) / float(dx[w])
    a = y[i] - b * x[i]
    return i, j, b, a, float(key[w]) / tau_den


def q_quantile_regression_p90(sf_dir: str):
    """Exact 0.9-quantile regression of the last-120-day revenue
    window — the conditional-quantile companion of
    lad_regression_daily (τ = ½): the fitted line tracks the level
    below which 90% of daily revenues fall as a TREND, which a
    single unconditional p90 cannot do once revenue drifts.  Same
    LP vertex enumeration, with the check-loss numerators kept exact
    on the ×10·|dx| integer scale; both engines sort candidates by
    the identical (cost, i, j) key."""
    day, cv = _daily_revenue_cents(sf_dir)
    day, cv = day[-120:], cv[-120:]
    i, j, b, a, cost = qreg_fit(day.tolist(), cv.tolist())
    return pa.table({
        "n_days": pa.array([len(day)], pa.int64()),
        "day_i": pa.array([int(day[i])], pa.int64()),
        "day_j": pa.array([int(day[j])], pa.int64()),
        "q90_slope": pa.array([round(b, 6)], pa.float64()),
        "q90_intercept": pa.array([round(a, 4)], pa.float64()),
        "check_loss_log10": pa.array(
            [round(math.log10(cost), 6)], pa.float64()),
    })


SQL_QUANTILE_REGRESSION_P90 = """
WITH d0 AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
d AS (
  SELECT day, cents FROM (
    SELECT day, cents,
           row_number() OVER (ORDER BY day DESC) AS rn
    FROM d0)
  WHERE rn <= 120),
pairs AS (
  SELECT a.day AS xi, a.cents AS yi, b.day AS xj,
         b.day - a.day AS dx, b.cents - a.cents AS dy
  FROM d a JOIN d b ON a.day < b.day),
cost AS (
  SELECT xi, yi, xj, dx, dy,
         CAST(sum(CASE WHEN r > 0 THEN 9 * r ELSE -r END)
              AS HUGEINT) AS num
  FROM (
    SELECT pairs.*,
           (CAST(k.cents - pairs.yi AS HUGEINT) * pairs.dx
            - CAST(pairs.dy AS HUGEINT) * (k.day - pairs.xi))
             * CAST(sign(pairs.dx) AS BIGINT) AS r
    FROM pairs, d k)
  GROUP BY 1, 2, 3, 4, 5),
best AS (
  SELECT xi, yi, xj, dx, dy,
         CAST(num AS DOUBLE) / abs(dx) AS key_
  FROM cost
  ORDER BY CAST(num AS DOUBLE) / abs(dx), xi, xj
  LIMIT 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       xi AS day_i, xj AS day_j,
       round(CAST(dy AS DOUBLE) / dx, 6) AS q90_slope,
       round(yi - CAST(dy AS DOUBLE) / dx * xi, 4) AS q90_intercept,
       round(log10(key_ / 10.0), 6) AS check_loss_log10
FROM best
"""

QUERIES["quantile_regression_p90"] = (q_quantile_regression_p90,
                                      SQL_QUANTILE_REGRESSION_P90)


# ---------------------------------------------------------------------------
# knn_hubness_audit — k-occurrence skew of the embedding space
# ---------------------------------------------------------------------------

_HUB_K = 5


def hubness_stats(nk) -> tuple:
    """Skewness of the k-occurrence distribution N_k and the hub
    count (N_k ≥ 2k) — exact integer moments, two float closures."""
    n = len(nk)
    s1 = int(np.sum(nk))
    s2 = int(np.sum(nk.astype(object) * nk))
    s3 = int(np.sum(nk.astype(object) * nk * nk))
    mu = s1 / n
    var = s2 / n - mu * mu
    if var <= 0:
        return 0.0, 0
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu ** 3
    return m3 / var ** 1.5, int((nk >= 2 * _HUB_K).sum())


def q_knn_hubness_audit(sf_dir: str):
    """Hubness audit of the embedding space: how skewed is the
    k-occurrence distribution N_k (how often each vector appears in
    other vectors' 5-NN lists)?  Radovanović et al.'s high-dim
    pathology — a few 'hub' vectors appear in everyone's neighbor
    list and poison kNN-based dedup/search quality — this is the
    health check for the knn_*/embed_near_dups family.  Exact
    squared-L2 5-NN over all pairs (ties → smaller vec_id, mirrored
    in the oracle's ORDER BY); skewness from exact integer moments
    of N_k; hubs = vectors with N_k ≥ 2k."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        vid = np.asarray(t.column("vec_id"), dtype=np.int64)
        emb = np.stack([np.asarray(x, dtype=np.float64)
                        for x in t.column("embedding").to_pylist()]) \
            if t.num_rows else np.zeros((0, 64))
        d = emb.shape[1] if t.num_rows else 64
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(vid))),
            "v": pa.array(emb.ravel()),
        })

    m = _partial_final(ds, partial, ["vec_id", "dim"], [("v", "max")])
    vid = np.asarray(m.column("vec_id"), dtype=np.int64)
    dim = np.asarray(m.column("dim"), dtype=np.int64)
    val = np.asarray(m.column("v"), dtype=np.float64)
    n = int(vid.max()) + 1
    d = int(dim.max()) + 1
    X = np.zeros((n, d), dtype=np.float64)
    X[vid, dim] = val
    sq = (X * X).sum(axis=1)
    D = sq[:, None] + sq[None, :] - 2.0 * (X @ X.T)
    np.fill_diagonal(D, np.inf)
    nk = np.zeros(n, dtype=np.int64)
    # ties resolved toward the smaller index: argsort is stable on
    # equal keys, matching the oracle's (dist, vec_id) order
    for i in range(n):
        nbrs = np.argsort(D[i], kind="stable")[:_HUB_K]
        nk[nbrs] += 1
    skew, hubs = hubness_stats(nk)
    return pa.table({
        "n_vectors": pa.array([n], pa.int64()),
        "k": pa.array([_HUB_K], pa.int64()),
        "max_k_occurrence": pa.array([int(nk.max())], pa.int64()),
        "n_hubs": pa.array([hubs], pa.int64()),
        "n_orphans": pa.array([int((nk == 0).sum())], pa.int64()),
        "skew_nk": pa.array([round(skew, 6)], pa.float64()),
    })


SQL_KNN_HUBNESS_AUDIT = """
WITH e AS (
  SELECT vec_id, CAST(j.range AS BIGINT) AS j,
         CAST(embedding[CAST(j.range AS INTEGER) + 1] AS DOUBLE) AS v
  FROM embeddings, range(64) j),
dist AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         sum((a.v - b.v) * (a.v - b.v)) AS d2
  FROM e a JOIN e b ON a.j = b.j AND a.vec_id <> b.vec_id
  GROUP BY 1, 2),
top5 AS (
  SELECT qa, qb FROM (
    SELECT qa, qb,
           row_number() OVER (PARTITION BY qa
                              ORDER BY d2, qb) AS rk
    FROM dist)
  WHERE rk <= 5),
nk AS (
  SELECT v.vec_id, coalesce(c.c, 0) AS nk
  FROM (SELECT DISTINCT vec_id FROM e) v
  LEFT JOIN (SELECT qb, CAST(count(*) AS BIGINT) AS c
             FROM top5 GROUP BY 1) c ON c.qb = v.vec_id),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(nk) AS BIGINT) AS s1,
         CAST(sum(nk * nk) AS HUGEINT) AS s2,
         CAST(sum(nk * nk * nk) AS HUGEINT) AS s3,
         CAST(max(nk) AS BIGINT) AS mx,
         CAST(sum(CASE WHEN nk >= 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS hubs,
         CAST(sum(CASE WHEN nk = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS orphans
  FROM nk),
sk AS (
  SELECT n, mx, hubs, orphans,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n, CAST(s3 AS DOUBLE) / n,
         (CAST(s3 AS DOUBLE) / n
          - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
          + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3))
         / pow(CAST(s2 AS DOUBLE) / n
               - pow(CAST(s1 AS DOUBLE) / n, 2), 1.5) AS skew
  FROM mom)
SELECT n AS n_vectors, CAST(5 AS BIGINT) AS k,
       mx AS max_k_occurrence, hubs AS n_hubs,
       orphans AS n_orphans,
       round(skew, 6) AS skew_nk
FROM sk
"""

QUERIES["knn_hubness_audit"] = (q_knn_hubness_audit,
                                SQL_KNN_HUBNESS_AUDIT)


# ---------------------------------------------------------------------------
# box_m_weekend — covariance-matrix equality between day groups
# ---------------------------------------------------------------------------


def box_m_2x2(groups) -> tuple:
    """Box's M for g groups of bivariate integer observations given
    as exact moment tuples (n, sx, sy, sxx, syy, sxy): sample
    covariances from the integer moments, M = (N−g)·ln|S_p| −
    Σ(nᵢ−1)·ln|Sᵢ|, Box's χ² scale c₁ with p = 2, df =
    (g−1)·p(p+1)/2.  Returns (m_stat, chi2, df)."""
    p = 2
    g = len(groups)
    n_tot = sum(t[0] for t in groups)
    pooled = [0.0, 0.0, 0.0]
    lndets = []
    for n, sx, sy, sxx, syy, sxy in groups:
        cxx = (n * sxx - sx * sx) / (float(n) * (n - 1.0))
        cyy = (n * syy - sy * sy) / (float(n) * (n - 1.0))
        cxy = (n * sxy - sx * sy) / (float(n) * (n - 1.0))
        det = cxx * cyy - cxy * cxy
        lndets.append((n - 1.0) * math.log(det))
        pooled[0] += (n - 1.0) * cxx
        pooled[1] += (n - 1.0) * cyy
        pooled[2] += (n - 1.0) * cxy
    denom = n_tot - g
    pxx, pyy, pxy = (v / denom for v in pooled)
    pdet = pxx * pyy - pxy * pxy
    m_stat = denom * math.log(pdet) - sum(lndets)
    c1 = ((2.0 * p * p + 3.0 * p - 1.0)
          / (6.0 * (p + 1.0) * (g - 1.0))) \
        * (sum(1.0 / (t[0] - 1.0) for t in groups) - 1.0 / denom)
    chi2 = m_stat * (1.0 - c1)
    df = (g - 1) * p * (p + 1) // 2
    return m_stat, chi2, df


def q_box_m_weekend(sf_dir: str):
    """Box's M test of covariance-matrix equality between weekend and
    weekday daily (click, purchase) count pairs — the PRECONDITION
    check for hotelling_t2_weekend (pooled-covariance T² assumes
    equal Σ; if M rejects, that test's footing is gone) and the
    multivariate member of the variance-equality ladder (bartlett /
    fligner / conover test single columns).  Exact integer group
    moments from the bounded day grid; df = 3 → closed-form odd-df
    tail 2(1−Φ(√x)) + √(2x/π)e^(−x/2) with the shared Φ."""
    series = _hourly_type_series_by(sf_dir, ("click", "purchase"),
                                    _DAY_US)
    moments = {0: [0, 0, 0, 0, 0, 0], 1: [0, 0, 0, 0, 0, 0]}
    for d in series["hours"]:
        x = series["click"].get(d, 0)
        y = series["purchase"].get(d, 0)
        we = 1 if ((d + 4) % 7) in (5, 6) else 0
        mo = moments[we]
        mo[0] += 1
        mo[1] += x
        mo[2] += y
        mo[3] += x * x
        mo[4] += y * y
        mo[5] += x * y
    groups = [tuple(moments[1]), tuple(moments[0])]
    m_stat, chi2, df = box_m_2x2(groups)
    pv = (2.0 * (1.0 - phi_as(math.sqrt(chi2)))
          + math.sqrt(2.0 * chi2 / math.pi) * math.exp(-chi2 / 2.0))
    return pa.table({
        "n_weekend": pa.array([groups[0][0]], pa.int64()),
        "n_weekday": pa.array([groups[1][0]], pa.int64()),
        "box_m": pa.array([round(m_stat, 6)], pa.float64()),
        "chi2": pa.array([round(chi2, 6)], pa.float64()),
        "df": pa.array([df], pa.int64()),
        "p_value": pa.array([round(pv, 6)], pa.float64()),
    })


def _box_m_sql() -> str:
    phi = _phi_sql("sqrt(chi2)")
    return f"""
WITH grid AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
  FROM events GROUP BY 1),
xy AS (
  SELECT grid.day,
         CASE WHEN (grid.day + 4) % 7 IN (5, 6) THEN 1 ELSE 0 END
           AS we,
         coalesce(xc.c, 0) AS x, coalesce(yc.c, 0) AS y
  FROM grid
  LEFT JOIN (SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000
                      AS day, count(*) AS c FROM events
             WHERE event_type = 'click' GROUP BY 1) xc USING (day)
  LEFT JOIN (SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000
                      AS day, count(*) AS c FROM events
             WHERE event_type = 'purchase' GROUP BY 1) yc
    USING (day)),
mo AS (
  SELECT we, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM xy GROUP BY 1),
cv AS (
  SELECT we, n,
         CAST(n * sxx - sx * sx AS DOUBLE)
           / (CAST(n AS DOUBLE) * (n - 1.0)) AS cxx,
         CAST(n * syy - sy * sy AS DOUBLE)
           / (CAST(n AS DOUBLE) * (n - 1.0)) AS cyy,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (CAST(n AS DOUBLE) * (n - 1.0)) AS cxy
  FROM mo),
agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tot,
         sum((n - 1.0) * ln(cxx * cyy - cxy * cxy)) AS sum_ln,
         sum((n - 1.0) * cxx) AS pxx,
         sum((n - 1.0) * cyy) AS pyy,
         sum((n - 1.0) * cxy) AS pxy,
         sum(1.0 / (n - 1.0)) AS sum_inv
  FROM cv),
m AS (
  SELECT n_tot,
         (n_tot - 2.0)
           * ln((pxx / (n_tot - 2.0)) * (pyy / (n_tot - 2.0))
                - (pxy / (n_tot - 2.0)) * (pxy / (n_tot - 2.0)))
           - sum_ln AS m_stat,
         ((2.0 * 4.0 + 6.0 - 1.0) / (6.0 * 3.0 * 1.0))
           * (sum_inv - 1.0 / (n_tot - 2.0)) AS c1
  FROM agg),
z AS (SELECT m_stat, m_stat * (1.0 - c1) AS chi2 FROM m)
SELECT (SELECT CAST(n AS BIGINT) FROM cv WHERE we = 1) AS n_weekend,
       (SELECT CAST(n AS BIGINT) FROM cv WHERE we = 0) AS n_weekday,
       round(m_stat, 6) AS box_m,
       round(chi2, 6) AS chi2,
       CAST(3 AS BIGINT) AS df,
       round(2.0 * (1.0 - {phi})
             + sqrt(2.0 * chi2 / pi()) * exp(-chi2 / 2.0), 6)
         AS p_value
FROM z
"""


QUERIES["box_m_weekend"] = (q_box_m_weekend, _box_m_sql())


# ---------------------------------------------------------------------------
# p99_aggregation_pitfall — averaging percentiles is not a percentile
# ---------------------------------------------------------------------------


def q_p99_aggregation_pitfall(sf_dir: str):
    """The classic observability pitfall, measured: the true global
    p99 of event values vs the MEAN of per-hour p99s (what a
    dashboard averaging pre-aggregated panels shows) vs the MAX
    (what alerting on any-hour-breach sees).  Percentiles do not
    compose — Gil Tene's 'lying with percentiles' — and the bias ppm
    columns price the lie on this stream.  Exact ceil-rank order
    statistics from one bounded (hour, cents) histogram; only the
    cross-hour mean is a (shared, single-division) float."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()),
                         dtype=np.int64)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("value"), 100), 0), pa.int64())
        g = pa.table({
            "hour": pa.array(tsv // 3_600_000_000),
            "v": cents,
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by(["hour", "v"]).aggregate([("c", "sum")])
        return g.rename_columns(["hour", "v", "c"])

    m = _partial_final(ds, partial, ["hour", "v"], [("c", "sum")])
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    vv = np.asarray(m.column("v"), dtype=np.int64)
    cc = np.asarray(m.column("c"), dtype=np.int64)

    def p99_of(vs, cs):
        o = np.argsort(vs)
        vs, cs = vs[o], cs[o]
        n = int(cs.sum())
        k = (99 * n + 99) // 100
        return int(vs[np.searchsorted(np.cumsum(cs), k)])

    global_p99 = p99_of(vv, cc)
    hours = np.unique(hr)
    per_hour = np.array([p99_of(vv[hr == h], cc[hr == h])
                         for h in hours.tolist()], dtype=np.int64)
    mean_h = int(per_hour.sum()) / len(per_hour)
    max_h = int(per_hour.max())
    return pa.table({
        "n_hours": pa.array([len(hours)], pa.int64()),
        "global_p99": pa.array([global_p99], pa.int64()),
        "mean_hourly_p99": pa.array([round(mean_h, 6)], pa.float64()),
        "max_hourly_p99": pa.array([max_h], pa.int64()),
        "mean_bias_ppm": pa.array(
            [int(round(mean_h * 1_000_000)) // global_p99
             - 1_000_000], pa.int64()),
        "max_bias_ppm": pa.array(
            [max_h * 1_000_000 // global_p99 - 1_000_000],
            pa.int64()),
    })


SQL_P99_AGGREGATION_PITFALL = """
WITH h AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         CAST(round(value * 100, 0) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
gl AS (
  SELECT CAST(min(v) AS BIGINT) AS p99 FROM (
    SELECT v, sum(c) OVER (ORDER BY v) AS cum,
           sum(c) OVER () AS n
    FROM (SELECT v, CAST(sum(c) AS BIGINT) AS c FROM h GROUP BY 1))
  WHERE cum >= (99 * n + 99) // 100),
ph AS (
  SELECT hour, CAST(min(v) AS BIGINT) AS p99 FROM (
    SELECT hour, v,
           sum(c) OVER (PARTITION BY hour ORDER BY v) AS cum,
           sum(c) OVER (PARTITION BY hour) AS n
    FROM h)
  WHERE cum >= (99 * n + 99) // 100
  GROUP BY 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(p99) AS BIGINT) AS s,
         CAST(max(p99) AS BIGINT) AS mx
  FROM ph)
SELECT agg.n_hours, gl.p99 AS global_p99,
       round(CAST(agg.s AS DOUBLE) / agg.n_hours, 6)
         AS mean_hourly_p99,
       agg.mx AS max_hourly_p99,
       CAST(round(CAST(agg.s AS DOUBLE) / agg.n_hours * 1000000)
            AS BIGINT) // gl.p99 - 1000000 AS mean_bias_ppm,
       agg.mx * 1000000 // gl.p99 - 1000000 AS max_bias_ppm
FROM agg, gl
"""

QUERIES["p99_aggregation_pitfall"] = (q_p99_aggregation_pitfall,
                                      SQL_P99_AGGREGATION_PITFALL)


# ---------------------------------------------------------------------------
# sampled_quantile_error — what a 1/16 hash sample does to the tail
# ---------------------------------------------------------------------------


def q_sampled_quantile_error(sf_dir: str):
    """Sampling-accuracy audit for tail statistics: the md5 1/16
    deterministic event sample (the engine-portable sampling used by
    stratified_sample/corpus_mixture) vs the full stream, compared at
    the median, p99 and p999 — quantifies how thin the sample can go
    before tail estimates drift, in exact ceil-rank integers (error
    ppm per probe).  One (in_sample, cents) histogram carries both
    populations."""
    from ..functions.hashing import md5_hash32

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hash32_array

        eid = t.column("event_id").cast(pa.string()).to_pylist()
        hv = np.asarray(md5_hash32_array(eid), dtype=np.int64)
        ins = (hv % 16 == 0).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("value"), 100), 0), pa.int64())
        g = pa.table({
            "ins": pa.array(ins), "v": cents,
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by(["ins", "v"]).aggregate([("c", "sum")])
        return g.rename_columns(["ins", "v", "c"])

    m = _partial_final(ds, partial, ["ins", "v"], [("c", "sum")])
    ins = np.asarray(m.column("ins"), dtype=np.int64)
    vv = np.asarray(m.column("v"), dtype=np.int64)
    cc = np.asarray(m.column("c"), dtype=np.int64)

    def q_at(vs, cs, num, den):
        o = np.argsort(vs)
        vs, cs = vs[o], cs[o]
        n = int(cs.sum())
        k = max(1, (num * n + den - 1) // den)
        return int(vs[np.searchsorted(np.cumsum(cs), k)]), n

    probes = (("p50", 50, 100), ("p99", 99, 100), ("p999", 999, 1000))
    rows = {"probe": [], "exact": [], "sampled": [], "err_ppm": []}
    n_full = n_samp = 0
    for name, num, den in probes:
        ex, n_full = q_at(vv, cc, num, den)
        sm, n_samp = q_at(vv[ins == 1], cc[ins == 1], num, den)
        rows["probe"].append(name)
        rows["exact"].append(ex)
        rows["sampled"].append(sm)
        num = (sm - ex) * 1_000_000
        # DuckDB // truncates toward zero on negatives; match it
        rows["err_ppm"].append(num // ex if num >= 0
                               else -((-num) // ex))
    return pa.table({
        "probe": pa.array(rows["probe"]),
        "exact_cents": pa.array(rows["exact"], pa.int64()),
        "sampled_cents": pa.array(rows["sampled"], pa.int64()),
        "err_ppm": pa.array(rows["err_ppm"], pa.int64()),
        "n_full": pa.array([n_full] * 3, pa.int64()),
        "n_sample": pa.array([n_samp] * 3, pa.int64()),
    })


SQL_SAMPLED_QUANTILE_ERROR = """
WITH e AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
         CASE WHEN (('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                    1, 8))::BIGINT) % 16 = 0
              THEN 1 ELSE 0 END AS ins
  FROM events),
probes AS (
  SELECT * FROM (VALUES ('p50', 50, 100), ('p99', 99, 100),
                        ('p999', 999, 1000)) x(probe, num, den)),
fq AS (
  SELECT p.probe, CAST(min(s.v) AS BIGINT) AS exact_cents
  FROM probes p JOIN (
    SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
    FROM (SELECT v, CAST(count(*) AS BIGINT) AS c FROM e
          GROUP BY 1)) s
    ON s.cum >= greatest(1, (p.num * s.n + p.den - 1) // p.den)
  GROUP BY 1),
sq AS (
  SELECT p.probe, CAST(min(s.v) AS BIGINT) AS sampled_cents
  FROM probes p JOIN (
    SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
    FROM (SELECT v, CAST(count(*) AS BIGINT) AS c FROM e
          WHERE ins = 1 GROUP BY 1)) s
    ON s.cum >= greatest(1, (p.num * s.n + p.den - 1) // p.den)
  GROUP BY 1)
SELECT fq.probe, fq.exact_cents, sq.sampled_cents,
       (sq.sampled_cents - fq.exact_cents) * 1000000
         // fq.exact_cents AS err_ppm,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_full,
       (SELECT CAST(count(*) AS BIGINT) FROM e WHERE ins = 1)
         AS n_sample
FROM fq JOIN sq USING (probe)
ORDER BY fq.probe
"""

QUERIES["sampled_quantile_error"] = (q_sampled_quantile_error,
                                     SQL_SAMPLED_QUANTILE_ERROR)


# ---------------------------------------------------------------------------
# copula_tail_fit — Clayton/Gumbel tail dependence from Kendall's tau
# ---------------------------------------------------------------------------


def copula_from_tau(tau) -> tuple:
    """Archimedean-copula tail parameters from Kendall's τ via the
    closed inversions: Clayton θ_C = 2τ/(1−τ) with lower-tail
    λ_L = 2^(−1/θ_C); Gumbel θ_G = 1/(1−τ) with upper-tail
    λ_U = 2 − 2^(1/θ_G).  Defined for τ ∈ (0, 1); both None
    otherwise.  Returns (theta_c, lam_l, theta_g, lam_u)."""
    if tau is None or tau <= 0.0 or tau >= 1.0:
        return None, None, None, None
    theta_c = 2.0 * tau / (1.0 - tau)
    # exponents use the SAME literal float expression trees as the
    # SQL oracle (-(1-t)/(2t) and 1-t), not -1/theta — algebraically
    # equal but bit-equal only this way
    lam_l = 2.0 ** (-(1.0 - tau) / (2.0 * tau))
    theta_g = 1.0 / (1.0 - tau)
    lam_u = 2.0 - 2.0 ** (1.0 - tau)
    return theta_c, lam_l, theta_g, lam_u


def q_copula_tail_fit(sf_dir: str):
    """Model-based tail dependence of (quantity, discount): pooled
    Kendall τ-b from the bounded joint histogram (the
    kendall_tau_qty_discount machinery without the flag split),
    inverted through the Clayton and Gumbel generators to the
    implied lower/upper tail-dependence coefficients — the
    parametric counterpart of tail_dependence_qty_price's empirical
    quadrant counts: when the two disagree, neither Archimedean
    family fits the joint tail.  Concordance counts are exact
    python-int products; τ and the four closed-form inversions are
    the only floats, mirrored by the oracle."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity",
                                            "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "q": pc.cast(t.column("l_quantity"), pa.int64()),
            "d": pc.cast(pc.round(pc.multiply(
                t.column("l_discount"), 1000), 0), pa.int64()),
        }).group_by(["q", "d"]).aggregate([([], "count_all")])
        return g.rename_columns(["q", "d", "c"])

    j = _partial_final(ds, partial, ["q", "d"], [("c", "sum")])
    q = np.asarray(j.column("q"), dtype=np.int64)
    d = np.asarray(j.column("d"), dtype=np.int64)
    c = np.asarray(j.column("c"), dtype=np.int64)
    co = c.astype(object)
    gt_q = q[:, None] < q[None, :]
    gt_d = d[:, None] < d[None, :]
    lt_d = d[:, None] > d[None, :]
    prod = co[:, None] * co[None, :]
    con = int((prod * (gt_q & gt_d)).sum())
    dis = int((prod * (gt_q & lt_d)).sum())
    n = int(c.sum())
    n0 = n * (n - 1) // 2
    n1 = sum(int(c[q == u].sum()) * (int(c[q == u].sum()) - 1) // 2
             for u in np.unique(q))
    n2 = sum(int(c[d == u].sum()) * (int(c[d == u].sum()) - 1) // 2
             for u in np.unique(d))
    tau = (con - dis) / (math.sqrt(float(n0 - n1))
                         * math.sqrt(float(n0 - n2))) \
        if n0 - n1 > 0 and n0 - n2 > 0 else None
    th_c, lam_l, th_g, lam_u = copula_from_tau(tau)
    rnd = (lambda v: round(v, 6) if v is not None else None)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "tau_b": pa.array([rnd(tau)], pa.float64()),
        "clayton_theta": pa.array([rnd(th_c)], pa.float64()),
        "lambda_lower": pa.array([rnd(lam_l)], pa.float64()),
        "gumbel_theta": pa.array([rnd(th_g)], pa.float64()),
        "lambda_upper": pa.array([rnd(lam_u)], pa.float64()),
    })


SQL_COPULA_TAIL_FIT = """
WITH j AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 1000, 0) AS BIGINT) AS d,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2),
cd AS (
  SELECT sum(CASE WHEN j2.q > j1.q AND j2.d > j1.d
                  THEN j1.c * j2.c ELSE 0 END) AS con,
         sum(CASE WHEN j2.q > j1.q AND j2.d < j1.d
                  THEN j1.c * j2.c ELSE 0 END) AS dis
  FROM j j1 JOIN j j2 ON TRUE),
nn AS (SELECT sum(c) AS n FROM j),
t1 AS (SELECT sum(tc * (tc - 1) // 2) AS n1
       FROM (SELECT q, sum(c) AS tc FROM j GROUP BY 1)),
t2 AS (SELECT sum(tc * (tc - 1) // 2) AS n2
       FROM (SELECT d, sum(c) AS tc FROM j GROUP BY 1)),
s AS (
  SELECT nn.n, con, dis, nn.n * (nn.n - 1) // 2 AS n0, n1, n2
  FROM nn, cd, t1, t2),
tau AS (
  SELECT n,
         CASE WHEN n0 - n1 > 0 AND n0 - n2 > 0 THEN
           CAST(con - dis AS DOUBLE)
             / (sqrt(CAST(n0 - n1 AS DOUBLE))
                * sqrt(CAST(n0 - n2 AS DOUBLE)))
         END AS t
  FROM s)
SELECT CAST(n AS BIGINT) AS n, round(t, 6) AS tau_b,
       CASE WHEN t > 0 AND t < 1
            THEN round(2.0 * t / (1.0 - t), 6) END AS clayton_theta,
       CASE WHEN t > 0 AND t < 1
            THEN round(pow(2.0, -(1.0 - t) / (2.0 * t)), 6)
       END AS lambda_lower,
       CASE WHEN t > 0 AND t < 1
            THEN round(1.0 / (1.0 - t), 6) END AS gumbel_theta,
       CASE WHEN t > 0 AND t < 1
            THEN round(2.0 - pow(2.0, 1.0 - t), 6) END AS lambda_upper
FROM tau
"""

QUERIES["copula_tail_fit"] = (q_copula_tail_fit, SQL_COPULA_TAIL_FIT)


# ---------------------------------------------------------------------------
# theilsen_slope_ci — rank-based confidence band for the robust slope
# ---------------------------------------------------------------------------


def theilsen_ci(n_slopes, n_points) -> tuple:
    """Sen (1968) rank indices for the ~95% slope CI: with
    N = C(n,2) pairwise slopes and Var(S) = n(n−1)(2n+5)/18,
    c = z₀.₉₇₅·√Var, lower index = ⌊(N−c)/2⌋ (1-based +1) and upper
    index = ⌈(N+c)/2⌉ — both engines use z = 1.96 exactly.
    Returns (lo_idx, hi_idx) 1-based."""
    var_s = n_points * (n_points - 1) * (2 * n_points + 5) / 18.0
    c = 1.96 * math.sqrt(var_s)
    lo = int(math.floor((n_slopes - c) / 2.0)) + 1
    hi = int(math.ceil((n_slopes + c) / 2.0))
    return max(lo, 1), min(hi, n_slopes)


def q_theilsen_slope_ci(sf_dir: str):
    """Sen's rank-based ~95% confidence band for the Theil-Sen slope
    of the last-120-day revenue window — the inference
    theilsen_trend omits: the CI bounds are ORDER STATISTICS of the
    pairwise-slope multiset at Kendall-variance offsets from the
    median, so the band is exact given the slopes (no residual
    normality, no bootstrap).  Slope ties broken by the exact
    rational comparison both engines share (sorting by the float
    value and (i, j)); the window keeps the C(120,2) sweep
    bounded."""
    day, cv = _daily_revenue_cents(sf_dir)
    day, cv = day[-120:], cv[-120:]
    x = day.astype(np.int64)
    y = cv.astype(np.int64)
    n = len(x)
    ii, jj = np.triu_indices(n, k=1)
    dx = (x[jj] - x[ii]).astype(np.float64)
    dy = (y[jj] - y[ii]).astype(np.float64)
    slopes = dy / dx
    order = np.lexsort((jj, ii, slopes))
    s_sorted = slopes[order]
    N = len(s_sorted)
    k_med1 = (N + 1) // 2
    k_med2 = N // 2 + 1
    med = (s_sorted[k_med1 - 1] + s_sorted[k_med2 - 1]) / 2.0
    lo_i, hi_i = theilsen_ci(N, n)
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "n_slopes": pa.array([N], pa.int64()),
        "sen_slope": pa.array([round(float(med), 6)], pa.float64()),
        "ci_lo": pa.array([round(float(s_sorted[lo_i - 1]), 6)],
                          pa.float64()),
        "ci_hi": pa.array([round(float(s_sorted[hi_i - 1]), 6)],
                          pa.float64()),
        "lo_idx": pa.array([lo_i], pa.int64()),
        "hi_idx": pa.array([hi_i], pa.int64()),
    })


SQL_THEILSEN_SLOPE_CI = """
WITH d0 AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
d AS (
  SELECT day, cents FROM (
    SELECT day, cents,
           row_number() OVER (ORDER BY day DESC) AS rn
    FROM d0)
  WHERE rn <= 120),
sl AS (
  SELECT CAST(b.cents - a.cents AS DOUBLE) / (b.day - a.day) AS s,
         a.day AS i, b.day AS j
  FROM d a JOIN d b ON a.day < b.day),
rk AS (
  SELECT s, row_number() OVER (ORDER BY s, i, j) AS r,
         count(*) OVER () AS nsl
  FROM sl),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
idx AS (
  SELECT nn.n, rk1.nsl,
         greatest(CAST(floor((rk1.nsl
             - 1.96 * sqrt(nn.n * (nn.n - 1.0) * (2 * nn.n + 5)
                           / 18.0)) / 2.0) AS BIGINT) + 1,
             1) AS lo_i,
         least(CAST(ceil((rk1.nsl
             + 1.96 * sqrt(nn.n * (nn.n - 1.0) * (2 * nn.n + 5)
                           / 18.0)) / 2.0) AS BIGINT),
             rk1.nsl) AS hi_i
  FROM nn, (SELECT max(nsl) AS nsl FROM rk) rk1)
SELECT idx.n AS n_days, CAST(idx.nsl AS BIGINT) AS n_slopes,
       round(((SELECT s FROM rk WHERE r = (idx.nsl + 1) // 2)
            + (SELECT s FROM rk WHERE r = idx.nsl // 2 + 1)) / 2.0,
             6) AS sen_slope,
       (SELECT round(s, 6) FROM rk WHERE r = idx.lo_i) AS ci_lo,
       (SELECT round(s, 6) FROM rk WHERE r = idx.hi_i) AS ci_hi,
       idx.lo_i AS lo_idx, idx.hi_i AS hi_idx
FROM idx
"""

QUERIES["theilsen_slope_ci"] = (q_theilsen_slope_ci,
                                SQL_THEILSEN_SLOPE_CI)


# ---------------------------------------------------------------------------
# rbo_source_rankings — top-weighted ranking agreement (RBO)
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_D = 50


def rbo_truncated(ra, rb, p: float = _RBO_P, depth: int = _RBO_D):
    """Truncated rank-biased overlap (Webber et al. 2010, the RBO_min
    prefix sum): RBO@D = Σ_{d≤D} (1−p)·p^(d−1)·|A_d ∩ B_d|/d from
    two rank dicts {item: rank}.  A shared item contributes to every
    depth ≥ max(rA, rB), so overlap@d = #{items: max(rA, rB) ≤ d}.
    Returns (rbo, overlap@D)."""
    mx = sorted(max(ra[t], rb[t]) for t in ra if t in rb
                if max(ra[t], rb[t]) <= depth)
    acc = 0.0
    k = 0
    for d in range(1, depth + 1):
        while k < len(mx) and mx[k] <= d:
            k += 1
        acc += (1.0 - p) * p ** (d - 1) * k / d
    return acc, len(mx)


def q_rbo_source_rankings(sf_dir: str):
    """Rank-biased overlap between src0's and src1's top-50 token
    rankings (by count desc, token asc) at p = 0.9 — the
    top-weighted ranking similarity IR uses where
    source_ranking_agreement's footrule/inversions weight all
    positions equally: agreement on the head tokens dominates, and
    truncation is principled (RBO_min).  Token counts from the one
    vocabulary-bounded (source, token) shuffle every text query
    shares; overlap@d closes from max(rankA, rankB) counts in both
    engines."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"),
                                      pattern=r"\s+")
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        flat_src = src.take(pc.list_parent_indices(toks))
        flat = pc.list_flatten(toks)
        keep = pc.and_(pc.not_equal(flat, ""),
                       pc.is_in(flat_src,
                                pa.array(["src0", "src1"])))
        g = pa.table({"source": flat_src.filter(keep),
                      "token": flat.filter(keep)}) \
            .group_by(["source", "token"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["source", "token", "cnt"])

    vc = _partial_final(ds, partial, ["source", "token"],
                        [("cnt", "sum")])
    src = np.asarray(vc.column("source").to_pylist())
    tok = np.asarray(vc.column("token").to_pylist())
    cnt = np.asarray(vc.column("cnt"), dtype=np.int64)

    def top_ranks(s):
        sel = src == s
        ts, cs = tok[sel], cnt[sel]
        order = np.lexsort((ts, -cs))
        return {t: r + 1 for r, t in
                enumerate(ts[order][:_RBO_D].tolist())}

    ra = top_ranks("src0")
    rb = top_ranks("src1")
    rbo, ov = rbo_truncated(ra, rb)
    return pa.table({
        "depth": pa.array([_RBO_D], pa.int64()),
        "overlap_at_depth": pa.array([ov], pa.int64()),
        "rbo": pa.array([round(rbo, 6)], pa.float64()),
    })


SQL_RBO_SOURCE_RANKINGS = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents WHERE source IN ('src0', 'src1')),
c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1, 2),
rk AS (
  SELECT source, token,
         row_number() OVER (PARTITION BY source
                            ORDER BY cnt DESC, token) AS r
  FROM c),
joined AS (
  SELECT greatest(a.r, b.r) AS mx
  FROM (SELECT token, r FROM rk WHERE source = 'src0'
        AND r <= 50) a
  JOIN (SELECT token, r FROM rk WHERE source = 'src1'
        AND r <= 50) b USING (token)),
depths AS (
  SELECT CAST(g.range AS BIGINT) + 1 AS d FROM range(50) g),
ov AS (
  SELECT d.d,
         (SELECT count(*) FROM joined WHERE mx <= d.d) AS k
  FROM depths d)
SELECT CAST(50 AS BIGINT) AS depth,
       (SELECT CAST(count(*) AS BIGINT) FROM joined)
         AS overlap_at_depth,
       round(sum(0.1 * pow(0.9, d - 1) * k / d), 6) AS rbo
FROM ov
"""

QUERIES["rbo_source_rankings"] = (q_rbo_source_rankings,
                                  SQL_RBO_SOURCE_RANKINGS)
