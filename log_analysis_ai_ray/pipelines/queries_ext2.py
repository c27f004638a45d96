"""Second extended query registry (round-3 session 10): closes the
disjunctive-predicate TPC-H gap (Q19) and adds the remaining classical
diagnostics — Durbin-Watson serial correlation, KPSS level
stationarity, Bartlett variance homogeneity, Herfindahl concentration,
Hellinger/Jensen-Shannon distribution distance, Cohen's kappa on the
language-ID confusion — registered into the same ``QUERIES`` dict as
``queries.py`` (imported from the tail of ``queries_ext.py``).

Same oracle discipline as its siblings: shared column names, identical
rounding, exact integer closures (Python int / HUGEINT past int64)
wherever the statistic allows, and cluster-side shuffles move only
bounded partials (types × hours, days, confusion cells), never raw
rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages import aggregate as agg
from .queries import QUERIES, _partial_final, _read

# ---------------------------------------------------------------------------
# testable driver-side closures (brute-force-verified in
# tests/test_ops_round3o.py) — all take exact integer inputs
# ---------------------------------------------------------------------------


def dw_statistic(x) -> float:
    """Durbin-Watson via the exact integer identity
    n·Σd² / (n·Σx² − S²) on an already-ordered integer series."""
    x = np.asarray(x, dtype=np.int64)
    n = int(len(x))
    d = np.diff(x)
    num = int(np.dot(d, d))
    s1 = int(x.sum())
    s2 = int(np.dot(x, x))
    return n * num / float(n * s2 - s1 * s1)


def kpss_statistic(x) -> float:
    """KPSS level stat (lag-0 LRV) as the exact integer ratio
    Σcumsum(u)² / (n·Σu²) with u_t = n·x_t − Σx (Python ints — the
    cumsum squares overflow int64)."""
    x = [int(v) for v in x]
    n = len(x)
    s = sum(x)
    u = [n * v - s for v in x]
    num = den = run = 0
    for v in u:
        run += v
        num += run * run
        den += v * v
    return float(num) / (float(n) * float(den))


def bartlett_statistic(ns, s1s, s2s) -> float:
    """Bartlett T/C from per-group exact integer (n, Σv, Σv²)."""
    k = len(ns)
    big_n = sum(ns)
    pooled_num = t_sum = inv_sum = 0.0
    for n_i, a, b in zip(ns, s1s, s2s):
        v_num = n_i * b - a * a               # exact integer
        s2_i = float(v_num) / (float(n_i) * (n_i - 1))
        pooled_num += float(v_num) / n_i      # (n_i−1)·s_i²
        t_sum += (n_i - 1) * math.log(s2_i)
        inv_sum += 1.0 / (n_i - 1)
    sp2 = pooled_num / (big_n - k)
    t_stat = (big_n - k) * math.log(sp2) - t_sum
    c = 1.0 + (inv_sum - 1.0 / (big_n - k)) / (3.0 * (k - 1))
    return t_stat / c


def hhi_stats(cents) -> tuple:
    """(hhi, top_share, effective_n) from exact integer totals."""
    c = [int(v) for v in cents]
    tot = sum(c)
    sumsq = sum(v * v for v in c)
    hhi = float(sumsq) / (float(tot) * float(tot))
    return hhi, max(c) / float(tot), 1.0 / hhi


def hellinger_js(a_counts, b_counts) -> tuple:
    """(hellinger, js) between two integer count vectors over the
    same ordered alphabet; JS in nats, zero cells handled."""
    a_tot = float(sum(a_counts))
    b_tot = float(sum(b_counts))
    bc = js = 0.0
    for a, b in zip(a_counts, b_counts):
        p = a / a_tot
        q = b / b_tot
        bc += math.sqrt(p * q)
        mmid = 0.5 * (p + q)
        if p > 0:
            js += 0.5 * p * math.log(p / mmid)
        if q > 0:
            js += 0.5 * q * math.log(q / mmid)
    return math.sqrt(max(0.0, 1.0 - bc)), js


def cohen_kappa(la, pr, nn) -> tuple:
    """(n, correct, kappa) from confusion-cell arrays — exact
    integers until the final divide."""
    la = np.asarray(la)
    pr = np.asarray(pr)
    nn = np.asarray(nn, dtype=np.int64)
    s = int(nn.sum())
    c = int(nn[la == pr].sum())
    tp = 0
    for k in sorted(set(la.tolist()) | set(pr.tolist())):
        tp += int(nn[la == k].sum()) * int(nn[pr == k].sum())
    return s, c, (s * c - tp) / float(s * s - tp)

# ---------------------------------------------------------------------------
# TPC-H Q19 analog — disjunctive brand/size/quantity revenue
# ---------------------------------------------------------------------------


def q_q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape (reference has no partsupp/shipmode, so the
    predicate adapts to the columns the tables carry): revenue from
    lineitems matching ANY of three (brand, size-range, qty-range)
    branches, reported per matched brand. The part side is filtered to
    the three brands BEFORE broadcast (tiny build side via ray.put,
    read once per actor); the fact table is scanned once with the
    whole disjunction evaluated as vectorized numpy masks and revenue
    pre-aggregated per brand inside each block — a 3-row shuffle.
    Exact integer cents·permille revenue (round(price*100) ×
    (1000 − round(disc*1000)))."""
    import ray

    part = agg._to_arrow(_read(sf_dir, "part",
                               columns=["p_partkey", "p_brand",
                                        "p_size"]))
    sel = pc.is_in(part.column("p_brand"),
                   value_set=pa.array(["Brand#1", "Brand#2", "Brand#3"]))
    part = part.filter(sel).combine_chunks()
    ref = ray.put((part.column("p_partkey").combine_chunks(),
                   part.column("p_brand").combine_chunks(),
                   np.asarray(part.column("p_size"), dtype=np.int64)))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    class Q19Stage:
        def __init__(self, ref):
            self.pk, self.brand, self.size = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("l_partkey"), value_set=self.pk)
            hit = pc.is_valid(idx)
            t = t.filter(hit)
            idx = idx.filter(hit)
            if t.num_rows == 0:
                return pa.table({"p_brand": pa.array([], pa.string()),
                                 "rev_cents_pm": pa.array([], pa.int64()),
                                 "n_items": pa.array([], pa.int64())})
            brand = pc.take(self.brand, idx)
            size = pc.take(pa.array(self.size), idx)
            q = np.asarray(pc.cast(pc.round(t.column("l_quantity"), 0),
                                   pa.int64()))
            b = np.asarray(brand.to_pylist())
            sz = np.asarray(size)
            keep = (((b == "Brand#1") & (sz <= 15) & (q >= 1) & (q <= 11))
                    | ((b == "Brand#2") & (sz <= 25) & (q >= 10)
                       & (q <= 20))
                    | ((b == "Brand#3") & (sz <= 35) & (q >= 20)
                       & (q <= 30)))
            kept = t.filter(pa.array(keep))
            price_c = pc.cast(pc.round(pc.multiply(
                kept.column("l_extendedprice"), 100), 0), pa.int64())
            disc_pm = pc.cast(pc.round(pc.multiply(
                kept.column("l_discount"), 1000), 0), pa.int64())
            rev = pc.multiply(price_c, pc.subtract(
                pa.scalar(1000, pa.int64()), disc_pm))
            g = pa.table({"p_brand": brand.filter(pa.array(keep)),
                          "rev_cents_pm": rev}) \
                .group_by("p_brand").aggregate(
                    [("rev_cents_pm", "sum"), ([], "count_all")])
            return g.rename_columns(["p_brand", "rev_cents_pm",
                                     "n_items"])

    partials = li.map_batches(
        Q19Stage, fn_constructor_args=(ref,),
        concurrency=4, num_cpus=0.5, batch_format="pyarrow")
    out = agg._combine_partials(
        partials, keys=["p_brand"],
        aggs=[("rev_cents_pm", "sum"), ("n_items", "sum")],
        empty_schema=pa.schema([("p_brand", pa.string()),
                                ("rev_cents_pm", pa.int64()),
                                ("n_items", pa.int64())]))
    return out.sort_by([("p_brand", "ascending")])


SQL_Q19_DISJUNCTIVE_REVENUE = """
SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (1000 - CAST(round(l_discount * 1000, 0) AS BIGINT)))
            AS BIGINT) AS rev_cents_pm,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 15
       AND CAST(round(l_quantity, 0) AS BIGINT) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size <= 25
       AND CAST(round(l_quantity, 0) AS BIGINT) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size <= 35
       AND CAST(round(l_quantity, 0) AS BIGINT) BETWEEN 20 AND 30)
GROUP BY 1 ORDER BY 1
"""

QUERIES["q19_disjunctive_revenue"] = (q_q19_disjunctive_revenue,
                                      SQL_Q19_DISJUNCTIVE_REVENUE)


# ---------------------------------------------------------------------------
# Durbin-Watson serial-correlation statistic on hourly event counts
# ---------------------------------------------------------------------------


def q_durbin_watson_hourly(sf_dir: str):
    """Durbin-Watson statistic DW = Σ(x_t − x_{t−1})² / Σ(x_t − x̄)²
    over the hourly event-count series (residuals from the mean).
    The cluster ships only (hour, count) partials — an |hours|-bounded
    shuffle; the driver closes the statistic with the EXACT integer
    identity n·Σd² / (n·Σx² − S²), one double divide at the end.
    DW ≈ 2 under independence, → 0 under positive autocorrelation."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hr = pc.cast(pc.floor(pc.divide(pc.cast(
            t.column("ts"), pa.int64()), 3600000000)), pa.int64())
        g = pa.table({"hr": hr}).group_by("hr").aggregate(
            [([], "count_all")])
        return g.rename_columns(["hr", "c"])

    m = _partial_final(ds, partial, ["hr"], [("c", "sum")])
    hr = np.asarray(m.column("hr"), dtype=np.int64)
    c = np.asarray(m.column("c"), dtype=np.int64)
    x = c[np.argsort(hr)]
    dw = dw_statistic(x)
    return pa.table({
        "n_hours": pa.array([int(len(x))], pa.int64()),
        "dw_stat": pa.array([round(dw, 6)], pa.float64()),
    })


SQL_DURBIN_WATSON_HOURLY = """
WITH h AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
d AS (SELECT c, c - lag(c) OVER (ORDER BY hr) AS df FROM h),
s AS (SELECT count(*) AS n, sum(c) AS s1, sum(c * c) AS s2,
             sum(df * df) AS sd
      FROM d)
SELECT CAST(n AS BIGINT) AS n_hours,
       round(CAST(n * sd AS DOUBLE) / (n * s2 - s1 * s1), 6) AS dw_stat
FROM s
"""

QUERIES["durbin_watson_hourly"] = (q_durbin_watson_hourly,
                                   SQL_DURBIN_WATSON_HOURLY)


# ---------------------------------------------------------------------------
# KPSS level-stationarity statistic on daily revenue
# ---------------------------------------------------------------------------


def q_kpss_level_daily(sf_dir: str):
    """KPSS level-stationarity statistic on daily order revenue with
    the lag-0 (iid) long-run variance: η = Σ S_t² / (n²·σ̂²) where
    S_t are partial sums of the demeaned series. Scaling residuals by
    n (u_t = n·x_t − Σx, an exact integer) makes the whole statistic
    the exact integer ratio Σcumsum(u)² / (n·Σu²) — Python int /
    HUGEINT on the two sides, one double divide, round-6. Cluster
    ships only (day, Σcents) partials."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(pc.cast(
            t.column("o_orderdate"), pa.int64()), 86400000000)),
            pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100), 0), pa.int64())
        g = pa.table({"day": day, "cents": cents}) \
            .group_by("day").aggregate([("cents", "sum")])
        return g.rename_columns(["day", "cents"])

    m = _partial_final(ds, partial, ["day"], [("cents", "sum")])
    day = np.asarray(m.column("day"), dtype=np.int64)
    cv = np.asarray(m.column("cents"), dtype=np.int64)
    x = cv[np.argsort(day)]
    eta = kpss_statistic(x)
    return pa.table({
        "n_days": pa.array([int(len(x))], pa.int64()),
        "kpss_stat": pa.array([round(eta, 6)], pa.float64()),
    })


SQL_KPSS_LEVEL_DAILY = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
nn AS (SELECT CAST(count(*) AS HUGEINT) AS n,
              CAST(sum(cents) AS HUGEINT) AS s FROM d),
u AS (SELECT day, nn.n * cents - nn.s AS u FROM d, nn),
cs AS (SELECT u, sum(u) OVER (ORDER BY day) AS su FROM u),
ag AS (SELECT sum(su * su) AS num, sum(u * u) AS den FROM cs)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
       round(CAST(num AS DOUBLE)
             / ((SELECT CAST(n AS DOUBLE) FROM nn)
                * CAST(den AS DOUBLE)), 6) AS kpss_stat
FROM ag
"""

QUERIES["kpss_level_daily"] = (q_kpss_level_daily, SQL_KPSS_LEVEL_DAILY)


# ---------------------------------------------------------------------------
# Bartlett variance-homogeneity test across event types
# ---------------------------------------------------------------------------


def q_bartlett_types(sf_dir: str):
    """Bartlett's test of equal variances across event types (the
    normal-theory counterpart of the Brown-Forsythe row). Per-type
    sample variances close from exact integer (n, Σv, Σv²) triples via
    the overflow-free numerator V = n·Σv² − (Σv)² (Python int /
    HUGEINT), s² = V/(n(n−1)); the χ²-distributed statistic
    T = [(N−k)·ln Sp² − Σ(n_i−1)·ln s_i²] / C assembles in sorted-type
    order on the driver. A k-row shuffle."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            t.column("value"), 100), 0), pa.int64())
        g = pa.table({
            "event_type": t.column("event_type"),
            "v": v,
            "v2": pc.multiply(v, v),
        }).group_by("event_type").aggregate(
            [([], "count_all"), ("v", "sum"), ("v2", "sum")])
        return g.rename_columns(["event_type", "n", "s1", "s2"])

    m = _partial_final(ds, partial, ["event_type"],
                       [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
    m = m.sort_by([("event_type", "ascending")])
    ns = [int(v) for v in m.column("n").to_pylist()]
    s1 = [int(v) for v in m.column("s1").to_pylist()]
    s2 = [int(v) for v in m.column("s2").to_pylist()]
    stat = bartlett_statistic(ns, s1, s2)
    return pa.table({
        "k_groups": pa.array([len(ns)], pa.int64()),
        "n_total": pa.array([sum(ns)], pa.int64()),
        "bartlett_stat": pa.array([round(stat, 6)], pa.float64()),
    })


SQL_BARTLETT_TYPES = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS HUGEINT)
           AS s1,
         CAST(sum(CAST(round(value * 100, 0) AS HUGEINT)
                  * CAST(round(value * 100, 0) AS HUGEINT)) AS HUGEINT)
           AS s2
  FROM events GROUP BY 1),
pt AS (
  SELECT n, CAST(n * s2 - s1 * s1 AS DOUBLE) AS vnum,
         CAST(n * s2 - s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS s2i
  FROM g),
s AS (
  SELECT count(*) AS k, sum(CAST(n AS BIGINT)) AS bign,
         sum(vnum / CAST(n AS DOUBLE)) AS pooled_num,
         sum((CAST(n AS DOUBLE) - 1) * ln(s2i)) AS t_sum,
         sum(1.0 / (CAST(n AS DOUBLE) - 1)) AS inv_sum
  FROM pt)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(bign AS BIGINT) AS n_total,
       round(((bign - k) * ln(pooled_num / (bign - k)) - t_sum)
             / (1.0 + (inv_sum - 1.0 / (bign - k)) / (3.0 * (k - 1))),
             6) AS bartlett_stat
FROM s
"""

QUERIES["bartlett_types"] = (q_bartlett_types, SQL_BARTLETT_TYPES)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman revenue concentration across customers
# ---------------------------------------------------------------------------


def q_hhi_customer_revenue(sf_dir: str):
    """Herfindahl-Hirschman concentration of order revenue across
    customers: HHI = Σ share_i², plus the top single share and the
    effective number of customers 1/HHI. Exact integer closure —
    Σc_i² and (Σc)² as Python ints (HUGEINT in the oracle), one double
    divide each — over |customer|-bounded (custkey, Σcents)
    partials."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100), 0), pa.int64())
        g = pa.table({"ck": t.column("o_custkey"), "cents": cents}) \
            .group_by("ck").aggregate([("cents", "sum")])
        return g.rename_columns(["ck", "cents"])

    m = _partial_final(ds, partial, ["ck"], [("cents", "sum")])
    c = m.column("cents").to_pylist()
    hhi, top_share, eff_n = hhi_stats(c)
    return pa.table({
        "n_customers": pa.array([len(c)], pa.int64()),
        "hhi": pa.array([round(hhi, 6)], pa.float64()),
        "top_share": pa.array([round(top_share, 6)], pa.float64()),
        "effective_n": pa.array([round(eff_n, 6)], pa.float64()),
    })


SQL_HHI_CUSTOMER_REVENUE = """
WITH c AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS HUGEINT) AS cents
  FROM orders GROUP BY 1),
s AS (SELECT count(*) AS n, sum(cents) AS tot,
             sum(cents * cents) AS sumsq, max(cents) AS top
      FROM c)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(CAST(sumsq AS DOUBLE)
             / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi,
       round(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS top_share,
       round((CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
             / CAST(sumsq AS DOUBLE), 6) AS effective_n
FROM s
"""

QUERIES["hhi_customer_revenue"] = (q_hhi_customer_revenue,
                                   SQL_HHI_CUSTOMER_REVENUE)


# ---------------------------------------------------------------------------
# Hellinger + Jensen-Shannon distance: weekday vs weekend event mix
# ---------------------------------------------------------------------------


def q_hellinger_js_weekend(sf_dir: str):
    """Hellinger distance and Jensen-Shannon divergence (natural log)
    between the weekday and weekend event-type distributions — the
    bounded-alphabet distribution-shift probes KL (source_kl_divergence)
    doesn't cover: Hellinger is a proper metric, JS is symmetric and
    finite even with zero cells. Closes from the |types|×2 integer
    contingency; both formulas assemble in sorted-type order."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.day_of_week(t.column("ts"), count_from_zero=False,
                             week_start=1)
        we = pc.cast(pc.greater_equal(dow, 6), pa.int64())
        g = pa.table({"event_type": t.column("event_type"),
                      "is_weekend": we}) \
            .group_by(["event_type", "is_weekend"]).aggregate(
                [([], "count_all")])
        return g.rename_columns(["event_type", "is_weekend", "n"])

    m = _partial_final(ds, partial, ["event_type", "is_weekend"],
                       [("n", "sum")])
    et = np.asarray(m.column("event_type").to_pylist())
    we = np.asarray(m.column("is_weekend"), dtype=np.int64)
    nn = np.asarray(m.column("n"), dtype=np.int64)
    types = sorted(set(et.tolist()))
    wd_tot = int(nn[we == 0].sum())
    we_tot = int(nn[we == 1].sum())
    a_counts = [int(nn[(et == ty) & (we == 0)].sum()) for ty in types]
    b_counts = [int(nn[(et == ty) & (we == 1)].sum()) for ty in types]
    hel, js = hellinger_js(a_counts, b_counts)
    return pa.table({
        "n_weekday": pa.array([wd_tot], pa.int64()),
        "n_weekend": pa.array([we_tot], pa.int64()),
        "hellinger": pa.array([round(hel, 6)], pa.float64()),
        "js_divergence": pa.array([round(js, 6)], pa.float64()),
    })


SQL_HELLINGER_JS_WEEKEND = """
WITH cm AS (
  SELECT event_type,
         CAST(sum(CASE WHEN isodow(ts) < 6 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(sum(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM events GROUP BY 1),
tot AS (SELECT sum(a) AS wd, sum(b) AS we FROM cm),
pq AS (
  SELECT CAST(a AS DOUBLE) / tot.wd AS p,
         CAST(b AS DOUBLE) / tot.we AS q
  FROM cm, tot),
s AS (
  SELECT sum(sqrt(p * q)) AS bc,
         sum(CASE WHEN p > 0
                  THEN 0.5 * p * ln(p / (0.5 * (p + q))) ELSE 0 END
             + CASE WHEN q > 0
                    THEN 0.5 * q * ln(q / (0.5 * (p + q))) ELSE 0 END)
           AS js
  FROM pq)
SELECT (SELECT CAST(wd AS BIGINT) FROM tot) AS n_weekday,
       (SELECT CAST(we AS BIGINT) FROM tot) AS n_weekend,
       round(sqrt(greatest(0.0, 1.0 - bc)), 6) AS hellinger,
       round(js, 6) AS js_divergence
FROM s
"""

QUERIES["hellinger_js_weekend"] = (q_hellinger_js_weekend,
                                   SQL_HELLINGER_JS_WEEKEND)


# ---------------------------------------------------------------------------
# Cohen's kappa — chance-corrected language-ID agreement
# ---------------------------------------------------------------------------


def q_cohen_kappa_langid(sf_dir: str):
    """Cohen's kappa of the deterministic language-ID scorer vs labels:
    κ = (s·c − Σₖtₖpₖ) / (s² − Σₖtₖpₖ) — EXACT integers end to end
    from the langs²-bounded confusion partials (the same shuffle as
    langid_mcc; kappa is the other standard chance-corrected summary
    of that matrix), one double divide, round-6."""
    from ..stages.textstats import langid_features
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        pred = langid_features(t).column("pred_lang")
        g = pa.table({"lang": t.column("lang"), "pred_lang": pred}) \
            .group_by(["lang", "pred_lang"]).aggregate(
                [([], "count_all")])
        return g.rename_columns(["lang", "pred_lang", "n"])

    m = _partial_final(ds, partial, ["lang", "pred_lang"],
                       [("n", "sum")])
    s, c, kappa = cohen_kappa(m.column("lang").to_pylist(),
                              m.column("pred_lang").to_pylist(),
                              m.column("n").to_pylist())
    return pa.table({
        "n": pa.array([s], pa.int64()),
        "correct": pa.array([c], pa.int64()),
        "kappa": pa.array([round(kappa, 6)], pa.float64()),
    })


def _cohen_kappa_langid_sql() -> str:
    from ..stages.textstats import oracle_langid_sql
    inner = oracle_langid_sql("documents")
    return f"""
WITH pred AS ({inner}),
cm AS (
  SELECT d.lang, pred.pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM documents d JOIN pred USING (doc_id) GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS s,
               CAST(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END)
                    AS BIGINT) AS c
        FROM cm),
tm AS (SELECT lang AS k, sum(n) AS t FROM cm GROUP BY 1),
pm AS (SELECT pred_lang AS k, sum(n) AS p FROM cm GROUP BY 1),
ks AS (SELECT coalesce(tm.k, pm.k) AS k,
              coalesce(tm.t, 0) AS t, coalesce(pm.p, 0) AS p
       FROM tm FULL OUTER JOIN pm ON tm.k = pm.k),
tpx AS (SELECT CAST(sum(t * p) AS BIGINT) AS tp FROM ks)
SELECT tot.s AS n, tot.c AS correct,
       round(CAST(tot.s * tot.c - tpx.tp AS DOUBLE)
             / (CAST(tot.s AS DOUBLE) * tot.s - tpx.tp), 6) AS kappa
FROM tot, tpx
"""


QUERIES["cohen_kappa_langid"] = (q_cohen_kappa_langid,
                                 _cohen_kappa_langid_sql())
