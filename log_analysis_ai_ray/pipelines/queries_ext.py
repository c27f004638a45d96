"""Extended query registry (round-3 continuation): statistical tests,
forecast backtests, CUBE grouping, robust regression — registered into
the same ``QUERIES`` dict as ``queries.py`` (imported from its tail).

Same oracle discipline as queries.py: shared column names, identical
rounding, integer arithmetic wherever exactness matters, and every
cluster-side shuffle moves only bounded partials (vocab × hours), never
raw rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.timestamps import floor_hour
from ..stages import aggregate as agg
from .queries import QUERIES, _partial_final, _read

# ---------------------------------------------------------------------------
# GROUP BY CUBE — all four grouping sets from one finest-level pass
# ---------------------------------------------------------------------------


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE (event_type, isodow): like ``events_rollup`` the
    cluster computes ONLY the finest (type, isodow) partials — a
    |types|×7-bounded shuffle — and the driver derives the other three
    grouping sets ((type), (isodow), ()) by re-aggregating that exact
    combined table. CUBE differs from ROLLUP in emitting the
    (isodow)-only set; deriving it costs one more bounded groupby, not
    another pass. isodow (Mon=1..Sun=7) matches between pyarrow
    (count_from_zero=False, week_start=1) and DuckDB isodow()."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100), 0),
                        pa.int64())
        dow = pc.cast(pc.day_of_week(t.column("ts"),
                                     count_from_zero=False,
                                     week_start=1), pa.int64())
        tt = pa.table({
            "event_type": t.column("event_type"),
            "isodow": dow,
            "cents": cents,
        }).group_by(["event_type", "isodow"]).aggregate(
            [([], "count_all"), ("cents", "sum")])
        return tt.rename_columns(["event_type", "isodow", "cnt",
                                  "sum_cents"])

    fine = _partial_final(ds, partial, ["event_type", "isodow"],
                          [("cnt", "sum"), ("sum_cents", "sum")])

    def level(keys: list[str]) -> pa.Table:
        if keys:
            g = fine.group_by(keys).aggregate(
                [("cnt", "sum"), ("sum_cents", "sum")]) \
                .rename_columns(keys + ["cnt", "sum_cents"])
        else:
            g = pa.table({
                "cnt": pa.array([int(pc.sum(fine.column("cnt"))
                                     .as_py() or 0)], pa.int64()),
                "sum_cents": pa.array(
                    [int(pc.sum(fine.column("sum_cents"))
                         .as_py() or 0)], pa.int64())})
        n = g.num_rows
        return pa.table({
            "event_type": (g.column("event_type")
                           if "event_type" in keys
                           else pa.nulls(n, pa.string())),
            "isodow": (g.column("isodow") if "isodow" in keys
                       else pa.nulls(n, pa.int64())),
            "cnt": g.column("cnt"),
            "sum_cents": g.column("sum_cents"),
        })

    out = pa.concat_tables([
        level(["event_type", "isodow"]),
        level(["event_type"]),
        level(["isodow"]),
        level([]),
    ])
    return out.sort_by([("event_type", "ascending"),
                        ("isodow", "ascending"),
                        ("cnt", "ascending")])


SQL_EVENTS_CUBE = """
SELECT event_type, CAST(isodow(ts) AS BIGINT) AS isodow,
       count(*) AS cnt,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events
GROUP BY CUBE (event_type, isodow)
ORDER BY event_type, isodow, cnt
"""

QUERIES["events_cube"] = (q_events_cube, SQL_EVENTS_CUBE)


# ---------------------------------------------------------------------------
# chi-square independence test — contingency partials, driver statistic
# ---------------------------------------------------------------------------


def q_chi2_type_hour(sf_dir: str):
    """Pearson chi-square independence test of event_type ×
    hour-of-day: the cluster ships only the |types|×24-bounded
    contingency counts (same shuffle as a tiny groupby); the statistic
    closes on the driver over that grid — zero-observed cells included
    whenever both margins are positive, the textbook convention. The
    statistic is assembled from INTEGER margins
    ((obs·n − rt·ct)² / (rt·ct), summed in deterministic grid order,
    ÷ n once at the end) so both engines agree to the rounded digit."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        hr = pc.cast(pc.hour(t.column("ts")), pa.int64())
        tt = pa.table({
            "event_type": t.column("event_type"), "hr": hr,
        }).group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        return tt.rename_columns(["event_type", "hr", "cnt"])

    obs = _partial_final(ds, partial, ["event_type", "hr"],
                         [("cnt", "sum")])
    types = sorted(set(obs.column("event_type").to_pylist()))
    hours = sorted(set(obs.column("hr").to_pylist()))
    grid = {(ty, h): 0 for ty in types for h in hours}
    for ty, h, c in zip(obs.column("event_type").to_pylist(),
                        obs.column("hr").to_pylist(),
                        obs.column("cnt").to_pylist()):
        grid[(ty, h)] = int(c)
    n = sum(grid.values())
    rt = {ty: sum(grid[(ty, h)] for h in hours) for ty in types}
    ct = {h: sum(grid[(ty, h)] for ty in types) for h in hours}
    chi2 = 0.0
    for ty in types:  # deterministic (type, hour) order both sides
        for h in hours:
            e_num = rt[ty] * ct[h]  # expected·n, exact int
            if e_num == 0:
                continue
            d = grid[(ty, h)] * n - e_num  # (obs−exp)·n², exact int
            chi2 += (d * d) / e_num
    chi2 /= n if n else 1
    dof = max((len(types) - 1) * (len(hours) - 1), 0)
    return pa.table({
        "metric": pa.array(["chi2_type_hour"]),
        "n": pa.array([n], pa.int64()),
        "dof": pa.array([dof], pa.int64()),
        "chi2": pa.array([round(chi2, 4)], pa.float64()),
    })


SQL_CHI2_TYPE_HOUR = """
WITH obs AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
         count(*) AS cnt
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, h.hr, COALESCE(o.cnt, 0) AS cnt
  FROM (SELECT DISTINCT event_type FROM obs) t
  CROSS JOIN (SELECT DISTINCT hr FROM obs) h
  LEFT JOIN obs o USING (event_type, hr)),
tot AS (SELECT sum(cnt) AS n FROM grid),
rt AS (SELECT event_type, sum(cnt) AS r FROM grid GROUP BY 1),
ct AS (SELECT hr, sum(cnt) AS c FROM grid GROUP BY 1)
SELECT 'chi2_type_hour' AS metric,
       CAST(tot.n AS BIGINT) AS n,
       CAST((SELECT (count(DISTINCT event_type) - 1)
                  * (count(DISTINCT hr) - 1) FROM grid) AS BIGINT)
         AS dof,
       round(sum(CAST((g.cnt * tot.n - rt.r * ct.c) AS DOUBLE)
               * CAST((g.cnt * tot.n - rt.r * ct.c) AS DOUBLE)
               / CAST(rt.r * ct.c AS DOUBLE)) / tot.n, 4) AS chi2
FROM grid g
JOIN rt USING (event_type) JOIN ct USING (hr) CROSS JOIN tot
WHERE rt.r * ct.c > 0
GROUP BY tot.n
"""

QUERIES["chi2_type_hour"] = (q_chi2_type_hour, SQL_CHI2_TYPE_HOUR)


# ---------------------------------------------------------------------------
# Theil–Sen robust trend — median of pairwise slopes per type
# ---------------------------------------------------------------------------


def q_theilsen_trend(sf_dir: str):
    """Theil–Sen robust trend per event type: slope estimate = MEDIAN
    of all pairwise slopes (cnt_j − cnt_i)/(hr_j − hr_i) over the
    hourly-count series. Complements ``events_trend_slope`` (OLS):
    50%-breakdown robust to outlier hours. The cluster reduces to the
    hours-bounded (type, hour, cnt) table — the only shuffle — and the
    O(L²)-pairs median closes vectorized on the driver (L ≈ hundreds;
    numpy broadcast per type). Median = interpolated (DuckDB
    semantics): mean of the two middle order statistics when even."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "event_type": t.column("event_type"),
            "hr": pc.divide(pc.cast(floor_hour(t.column("ts")),
                                    pa.int64()), 3_600_000_000),
        }).group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        return tt.rename_columns(["event_type", "hr", "cnt"])

    hourly = _partial_final(ds, partial, ["event_type", "hr"],
                            [("cnt", "sum")])
    types, slopes = [], []
    et = np.asarray(hourly.column("event_type"))
    hr = np.asarray(hourly.column("hr"), dtype=np.int64)
    cn = np.asarray(hourly.column("cnt"), dtype=np.int64)
    for ty in sorted(set(et.tolist())):
        m = et == ty
        h, c = hr[m], cn[m]
        o = np.argsort(h)
        h, c = h[o], c[o]
        iu, ju = np.triu_indices(len(h), k=1)
        sl = (c[ju] - c[iu]).astype(np.float64) / (h[ju] - h[iu])
        sl.sort()
        k = len(sl)
        med = (float(sl[(k - 1) // 2]) + float(sl[k // 2])) / 2.0
        types.append(ty)
        slopes.append(round(med, 6))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "ts_slope": pa.array(slopes, pa.float64()),
    })


SQL_THEILSEN_TREND = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS hr,
         count(*) AS cnt
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
         CAST(b.cnt - a.cnt AS DOUBLE) / (b.hr - a.hr) AS slope
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.hr < b.hr)
SELECT event_type, round(median(slope), 6) AS ts_slope
FROM pairs GROUP BY 1 ORDER BY 1
"""

QUERIES["theilsen_trend"] = (q_theilsen_trend, SQL_THEILSEN_TREND)


# ---------------------------------------------------------------------------
# Apdex score per hour — integer-exact SRE satisfaction index
# ---------------------------------------------------------------------------

APDEX_T = 40.0  # satisfied threshold on events.value; tolerating ≤ 4T


def q_hourly_apdex(sf_dir: str):
    """Apdex (application performance index) per hour treating
    events.value as a latency: satisfied = value ≤ T, tolerating =
    T < value ≤ 4T, apdex = (satisfied + tolerating/2) / total.
    Pure conditional-count partials (three BIGINTs per (hour) group);
    the score is published as integer per-mille with truncating
    division — (2·sat + tol)·500 // total — so no float crosses the
    oracle boundary."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value")
        sat = pc.cast(pc.less_equal(v, APDEX_T), pa.int64())
        tol = pc.cast(pc.and_kleene(
            pc.greater(v, APDEX_T),
            pc.less_equal(v, 4 * APDEX_T)), pa.int64())
        tt = pa.table({
            "bucket": floor_hour(t.column("ts")),
            "sat": pc.fill_null(sat, 0),
            "tol": pc.fill_null(tol, 0),
        }).group_by("bucket").aggregate(
            [("sat", "sum"), ("tol", "sum"), ([], "count_all")])
        return tt.rename_columns(["bucket", "sat", "tol", "total"])

    g = _partial_final(ds, partial, ["bucket"],
                       [("sat", "sum"), ("tol", "sum"),
                        ("total", "sum")])
    num = pc.multiply(
        pc.add(pc.multiply(g.column("sat"), 2), g.column("tol")), 500)
    apdex = pc.divide(num, g.column("total"))  # int64 trunc division
    out = pa.table({
        "bucket": g.column("bucket"),
        "sat": g.column("sat"), "tol": g.column("tol"),
        "total": g.column("total"),
        "apdex_permille": pc.cast(apdex, pa.int64()),
    })
    return out.sort_by([("bucket", "ascending")])


SQL_HOURLY_APDEX = f"""
SELECT date_trunc('hour', ts) AS bucket,
       CAST(sum(CASE WHEN value <= {APDEX_T} THEN 1 ELSE 0 END)
            AS BIGINT) AS sat,
       CAST(sum(CASE WHEN value > {APDEX_T}
                      AND value <= {4 * APDEX_T} THEN 1 ELSE 0 END)
            AS BIGINT) AS tol,
       count(*) AS total,
       CAST((2 * sum(CASE WHEN value <= {APDEX_T} THEN 1 ELSE 0 END)
             + sum(CASE WHEN value > {APDEX_T}
                         AND value <= {4 * APDEX_T} THEN 1 ELSE 0 END))
            * 500 // count(*) AS BIGINT) AS apdex_permille
FROM events
GROUP BY 1 ORDER BY 1
"""

QUERIES["hourly_apdex"] = (q_hourly_apdex, SQL_HOURLY_APDEX)


# ---------------------------------------------------------------------------
# seasonal-naive forecast backtest — MAE vs the 24h-lag predictor
# ---------------------------------------------------------------------------


def q_seasonal_naive_error(sf_dir: str):
    """Forecast backtest: score the seasonal-naive predictor
    ŷ(t) = y(t − 24 h) on the per-type hourly count series. Pairs are
    hours where both t and t−24 h have events (inner join — identical
    convention both engines). Errors are integer counts so the MAE
    closes exactly: (sum |Δ|, n_pairs) BIGINTs plus mae rounded once.
    The cluster reduces to the bounded hourly table; the lag join is a
    driver-side dict lookup over it."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "event_type": t.column("event_type"),
            "hr": pc.divide(pc.cast(floor_hour(t.column("ts")),
                                    pa.int64()), 3_600_000_000),
        }).group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        return tt.rename_columns(["event_type", "hr", "cnt"])

    hourly = _partial_final(ds, partial, ["event_type", "hr"],
                            [("cnt", "sum")])
    et = hourly.column("event_type").to_pylist()
    hr = hourly.column("hr").to_pylist()
    cn = hourly.column("cnt").to_pylist()
    series = {}
    for ty, h, c in zip(et, hr, cn):
        series.setdefault(ty, {})[h] = int(c)
    types, abs_errs, pairs, maes = [], [], [], []
    for ty in sorted(series):
        s = series[ty]
        errs = [abs(c - s[h - 24]) for h, c in s.items() if h - 24 in s]
        if not errs:
            continue
        types.append(ty)
        abs_errs.append(sum(errs))
        pairs.append(len(errs))
        maes.append(round(sum(errs) / len(errs), 6))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "sum_abs_err": pa.array(abs_errs, pa.int64()),
        "n_pairs": pa.array(pairs, pa.int64()),
        "mae": pa.array(maes, pa.float64()),
    })


SQL_SEASONAL_NAIVE_ERROR = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS hr,
         count(*) AS cnt
  FROM events GROUP BY 1, 2)
SELECT a.event_type,
       CAST(sum(abs(a.cnt - b.cnt)) AS BIGINT) AS sum_abs_err,
       count(*) AS n_pairs,
       round(CAST(sum(abs(a.cnt - b.cnt)) AS DOUBLE) / count(*), 6)
         AS mae
FROM hourly a JOIN hourly b
  ON a.event_type = b.event_type AND b.hr = a.hr - 24
GROUP BY 1 ORDER BY 1
"""

QUERIES["seasonal_naive_error"] = (q_seasonal_naive_error,
                                   SQL_SEASONAL_NAIVE_ERROR)
