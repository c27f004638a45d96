"""Third extended query registry (round-3 session 11): ordinal /
information-theoretic association measures (uncertainty coefficient,
Goodman-Kruskal gamma + Somers' D), directed-information flow
(binary transfer entropy), and symbolic-dynamics complexity
(permutation entropy) — registered into the same ``QUERIES`` dict as
``queries.py`` (imported from the tail of ``queries_ext2.py``).

Same oracle discipline as its siblings: shared column names, identical
rounding, exact integer closures wherever the statistic allows, and
cluster-side shuffles move only bounded partials (type x hour cells,
quantity x discount-cent cells, hour-grid counts), never raw rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QUERIES, _partial_final, _read

_HOUR_US = 3_600_000_000

# ---------------------------------------------------------------------------
# testable driver-side closures (brute-force-verified in
# tests/test_ops_round3p.py) — all take exact integer inputs
# ---------------------------------------------------------------------------


def entropy_nats(counts) -> float:
    """Shannon entropy (nats) of an integer count vector (zeros
    ignored); exact integer total."""
    counts = [int(c) for c in counts if int(c) > 0]
    n = sum(counts)
    return -sum(c / n * math.log(c / n) for c in counts)


def uncertainty_coefficient(cells: dict) -> tuple:
    """Theil's U(row | col) from an integer contingency map
    {(row, col): count}: (H(row) − H(row|col)) / H(row).  Returns
    (h_row, h_row_given_col, u) in nats; u is None when H(row)=0."""
    rows, cols = {}, {}
    n = 0
    for (r, c), v in cells.items():
        v = int(v)
        rows[r] = rows.get(r, 0) + v
        cols[c] = cols.get(c, 0) + v
        n += v
    h_row = entropy_nats(rows.values())
    h_cond = 0.0
    for c, nc in cols.items():
        sub = [v for (r, cc), v in cells.items() if cc == c]
        h_cond += nc / n * entropy_nats(sub)
    u = None if h_row == 0 else (h_row - h_cond) / h_row
    return h_row, h_cond, u


def concordance_counts(cells: dict) -> tuple:
    """Exact pair-concordance sweep over an integer contingency map
    {(x, y): count}: returns (C, D, Tx, Ty) — concordant pairs,
    discordant pairs, pairs tied on x only, pairs tied on y only
    (both-tied pairs excluded from all four).  O(cells^2) — the cell
    grid is bounded (values x values), never row-scale."""
    items = list(cells.items())
    C = D = Tx = Ty = 0
    for i, ((x1, y1), c1) in enumerate(items):
        for (x2, y2), c2 in items[i + 1:]:
            p = int(c1) * int(c2)
            if x1 == x2 and y1 == y2:
                continue
            if x1 == x2:
                Tx += p
            elif y1 == y2:
                Ty += p
            elif (x2 - x1) * (y2 - y1) > 0:
                C += p
            else:
                D += p
    return C, D, Tx, Ty


def transfer_entropy_bits(transitions) -> tuple:
    """Binary transfer entropy TE(x→y) in bits from (x1, y1, y2)
    transition triples: Σ p(y2,y1,x1)·log2[ n(y2,y1,x1)·n(y1) /
    (n(y1,x1)·n(y2,y1)) ].  All counts exact integers; returns
    (n_transitions, te_bits) — te None when there are no
    transitions."""
    n3, n_y1x1, n_y2y1, n_y1 = {}, {}, {}, {}
    m = 0
    for x1, y1, y2 in transitions:
        x1, y1, y2 = int(x1), int(y1), int(y2)
        n3[(y2, y1, x1)] = n3.get((y2, y1, x1), 0) + 1
        n_y1x1[(y1, x1)] = n_y1x1.get((y1, x1), 0) + 1
        n_y2y1[(y2, y1)] = n_y2y1.get((y2, y1), 0) + 1
        n_y1[y1] = n_y1.get(y1, 0) + 1
        m += 1
    if m == 0:
        return 0, None
    te = 0.0
    for (y2, y1, x1), c in n3.items():
        ratio = (c * n_y1[y1]) / (n_y1x1[(y1, x1)] * n_y2y1[(y2, y1)])
        te += c / m * math.log2(ratio)
    return m, te


def permutation_entropy3(values) -> tuple:
    """Order-3 permutation entropy of an integer series with the
    earlier-index-smaller tie rule: each window (a,b,c) maps to code
    4·[a≤b] + 2·[b≤c] + [a≤c] (6 reachable codes); returns
    (n_windows, H_bits, H/log2(6)).  Exact integer comparisons."""
    v = [int(x) for x in values]
    counts = {}
    for i in range(len(v) - 2):
        a, b, c = v[i], v[i + 1], v[i + 2]
        code = 4 * (a <= b) + 2 * (b <= c) + (a <= c)
        counts[code] = counts.get(code, 0) + 1
    m = sum(counts.values())
    if m == 0:
        return 0, None, None
    h = -sum(c / m * math.log2(c / m) for c in counts.values())
    return m, h, h / math.log2(6)


# ---------------------------------------------------------------------------
# shared bounded partials
# ---------------------------------------------------------------------------


def _type_hour_cells(sf_dir: str) -> pa.Table:
    """(event_type, hour-of-day) integer contingency cells — the one
    shuffle these association queries need (≤ types×24 rows)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()), dtype=np.int64)
        hh = (tsv // _HOUR_US) % 24
        g = pa.table({"event_type": t.column("event_type"),
                      "hh": pa.array(hh)}) \
            .group_by(["event_type", "hh"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "hh", "c"])

    return _partial_final(ds, partial, ["event_type", "hh"],
                          [("c", "sum")])


def _hourly_type_series(sf_dir: str, types: tuple) -> dict:
    """Per-absolute-hour counts for the given event types plus the
    full hour grid (hours with ≥1 event of ANY type).  Returns
    {"hours": sorted int list, t: {hour: count} per type}."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()), dtype=np.int64)
        hour = pa.array(tsv // _HOUR_US)
        g = pa.table({"hour": hour, "event_type": t.column("event_type")}) \
            .group_by(["hour", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["hour", "event_type", "c"])

    m = _partial_final(ds, partial, ["hour", "event_type"],
                       [("c", "sum")])
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    et = m.column("event_type").to_pylist()
    cv = np.asarray(m.column("c"), dtype=np.int64)
    out = {t: {} for t in types}
    grid = set()
    for h, t, c in zip(hr.tolist(), et, cv.tolist()):
        grid.add(h)
        if t in out:
            out[t][h] = c
    out["hours"] = sorted(grid)
    return out


# ---------------------------------------------------------------------------
# theil_u_type_hour — uncertainty coefficient U(event_type | hour)
# ---------------------------------------------------------------------------


def q_theil_u_type_hour(sf_dir: str):
    """Theil's uncertainty coefficient U(event_type | hour-of-day):
    the fraction of event-type entropy explained by knowing the hour
    — the normalized-conditional-entropy companion of
    cramers_v_type_hour / chi2_type_hour (association strength on an
    information scale instead of a chi-square scale).  One bounded
    (type, hour) cell shuffle; exact integer counts close the
    entropies driver-side in nats."""
    cells_t = _type_hour_cells(sf_dir)
    cells = {}
    for t, h, c in zip(cells_t.column("event_type").to_pylist(),
                       np.asarray(cells_t.column("hh"),
                                  dtype=np.int64).tolist(),
                       np.asarray(cells_t.column("c"),
                                  dtype=np.int64).tolist()):
        cells[(t, h)] = c
    h_row, h_cond, u = uncertainty_coefficient(cells)
    return pa.table({
        "h_type": pa.array([round(h_row, 6)], pa.float64()),
        "h_type_given_hour": pa.array([round(h_cond, 6)], pa.float64()),
        "theil_u": pa.array([round(u, 6) if u is not None else None],
                            pa.float64()),
    })


SQL_THEIL_U_TYPE_HOUR = """
WITH cells AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS hh,
         count(*) AS c
  FROM events GROUP BY 1, 2),
tot AS (SELECT sum(c) AS n FROM cells),
hrow AS (
  SELECT -sum((tc / n) * ln(tc / n)) AS h
  FROM (SELECT CAST(sum(c) AS DOUBLE) AS tc FROM cells GROUP BY event_type),
       (SELECT CAST(n AS DOUBLE) AS n FROM tot)),
hcond AS (
  SELECT coalesce(-sum((CAST(c AS DOUBLE) / n)
                       * ln(CAST(c AS DOUBLE) / hc)), 0) AS h
  FROM cells
  JOIN (SELECT hh, CAST(sum(c) AS DOUBLE) AS hc FROM cells GROUP BY 1)
       USING (hh),
       (SELECT CAST(n AS DOUBLE) AS n FROM tot))
SELECT round(hrow.h, 6) AS h_type,
       round(hcond.h, 6) AS h_type_given_hour,
       CASE WHEN hrow.h = 0 THEN NULL
            ELSE round((hrow.h - hcond.h) / hrow.h, 6) END AS theil_u
FROM hrow, hcond
"""

QUERIES["theil_u_type_hour"] = (q_theil_u_type_hour,
                                SQL_THEIL_U_TYPE_HOUR)


# ---------------------------------------------------------------------------
# gamma_somers_qty_discount — Goodman-Kruskal gamma + Somers' D
# ---------------------------------------------------------------------------


def q_gamma_somers_qty_discount(sf_dir: str):
    """Goodman-Kruskal gamma and both Somers' D asymmetries between
    l_quantity (integer units) and l_discount (integer cents) — the
    ordinal-association companions of kendall_tau_qty_discount that
    drop (gamma) or asymmetrically keep (D) the tie terms.  The whole
    statistic closes from the bounded quantity x discount cell
    histogram (≤ 50x11 cells): concordant/discordant/tied pair counts
    are exact-integer products of cell counts, O(cells²) driver-side
    and a self-join in the oracle — never row-scale pairs."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t.column("l_quantity"), 0), pa.int64())
        d = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), 100), 0), pa.int64())
        g = pa.table({"q": q, "d": d}) \
            .group_by(["q", "d"]).aggregate([([], "count_all")])
        return g.rename_columns(["q", "d", "c"])

    m = _partial_final(ds, partial, ["q", "d"], [("c", "sum")])
    cells = {}
    for q, d, c in zip(np.asarray(m.column("q"), dtype=np.int64).tolist(),
                       np.asarray(m.column("d"), dtype=np.int64).tolist(),
                       np.asarray(m.column("c"), dtype=np.int64).tolist()):
        cells[(q, d)] = c
    C, D, Tx, Ty = concordance_counts(cells)
    gamma = None if C + D == 0 else (C - D) / (C + D)
    dyx = None if C + D + Ty == 0 else (C - D) / (C + D + Ty)
    dxy = None if C + D + Tx == 0 else (C - D) / (C + D + Tx)
    return pa.table({
        "concordant": pa.array([C], pa.int64()),
        "discordant": pa.array([D], pa.int64()),
        "tied_qty_only": pa.array([Tx], pa.int64()),
        "tied_disc_only": pa.array([Ty], pa.int64()),
        "gamma": pa.array([round(gamma, 6) if gamma is not None
                           else None], pa.float64()),
        "somers_d_disc_given_qty": pa.array(
            [round(dyx, 6) if dyx is not None else None], pa.float64()),
        "somers_d_qty_given_disc": pa.array(
            [round(dxy, 6) if dxy is not None else None], pa.float64()),
    })


SQL_GAMMA_SOMERS_QTY_DISCOUNT = """
WITH cells AS (
  SELECT CAST(round(l_quantity, 0) AS BIGINT) AS q,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2),
pairs AS (
  SELECT sum(CASE WHEN (b.q - a.q) * (b.d - a.d) > 0
             THEN a.c * b.c ELSE 0 END) AS con,
         sum(CASE WHEN (b.q - a.q) * (b.d - a.d) < 0
             THEN a.c * b.c ELSE 0 END) AS dis,
         sum(CASE WHEN a.q = b.q AND a.d <> b.d
             THEN a.c * b.c ELSE 0 END) AS tx,
         sum(CASE WHEN a.d = b.d AND a.q <> b.q
             THEN a.c * b.c ELSE 0 END) AS ty
  FROM cells a JOIN cells b
    ON (a.q < b.q) OR (a.q = b.q AND a.d < b.d))
SELECT CAST(con AS BIGINT) AS concordant,
       CAST(dis AS BIGINT) AS discordant,
       CAST(tx AS BIGINT) AS tied_qty_only,
       CAST(ty AS BIGINT) AS tied_disc_only,
       CASE WHEN con + dis = 0 THEN NULL
            ELSE round(CAST(con - dis AS DOUBLE) / (con + dis), 6)
       END AS gamma,
       CASE WHEN con + dis + ty = 0 THEN NULL
            ELSE round(CAST(con - dis AS DOUBLE) / (con + dis + ty), 6)
       END AS somers_d_disc_given_qty,
       CASE WHEN con + dis + tx = 0 THEN NULL
            ELSE round(CAST(con - dis AS DOUBLE) / (con + dis + tx), 6)
       END AS somers_d_qty_given_disc
FROM pairs
"""

QUERIES["gamma_somers_qty_discount"] = (q_gamma_somers_qty_discount,
                                        SQL_GAMMA_SOMERS_QTY_DISCOUNT)


# ---------------------------------------------------------------------------
# transfer_entropy_click_purchase — directed information flow
# ---------------------------------------------------------------------------


def q_transfer_entropy_click_purchase(sf_dir: str):
    """Binary transfer entropy TE(click → purchase) over the hourly
    grid: both series binarized at their lower-median hourly count
    (strictly-above ⇒ 1), transitions taken over CONSECUTIVE present
    hours (hour and hour+1 both on the grid of hours with ≥1 event of
    any type), TE in bits from exact integer state counts — the
    model-free directed companion of granger_click_purchase.  One
    bounded (hour, type) shuffle; everything else closes
    driver-side."""
    series = _hourly_type_series(sf_dir, ("click", "purchase"))
    hours = series["hours"]
    x = [series["click"].get(h, 0) for h in hours]
    y = [series["purchase"].get(h, 0) for h in hours]

    def lower_median(v):
        s = sorted(v)
        return s[(len(s) + 1) // 2 - 1]

    tx, ty = lower_median(x), lower_median(y)
    # transitions only across CONSECUTIVE grid hours (no gap-spanning)
    transitions = [
        (x[i] > tx, y[i] > ty, y[i + 1] > ty)
        for i in range(len(hours) - 1)
        if hours[i + 1] == hours[i] + 1
    ]
    m, te = transfer_entropy_bits(transitions)
    return pa.table({
        "n_transitions": pa.array([m], pa.int64()),
        "thr_click": pa.array([int(tx)], pa.int64()),
        "thr_purchase": pa.array([int(ty)], pa.int64()),
        "te_bits": pa.array([round(te, 6) if te is not None else None],
                            pa.float64()),
    })


SQL_TRANSFER_ENTROPY_CLICK_PURCHASE = """
WITH grid AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour
  FROM events GROUP BY 1),
xc AS (
  SELECT grid.hour, coalesce(t.c, 0) AS c FROM grid
  LEFT JOIN (SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
                    count(*) AS c
             FROM events WHERE event_type = 'click' GROUP BY 1) t
  USING (hour)),
yc AS (
  SELECT grid.hour, coalesce(t.c, 0) AS c FROM grid
  LEFT JOIN (SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
                    count(*) AS c
             FROM events WHERE event_type = 'purchase' GROUP BY 1) t
  USING (hour)),
thr AS (
  SELECT (SELECT c FROM (SELECT c, row_number() OVER (ORDER BY c) AS rk,
                                count(*) OVER () AS n FROM xc)
          WHERE rk = (n + 1) // 2) AS tx,
         (SELECT c FROM (SELECT c, row_number() OVER (ORDER BY c) AS rk,
                                count(*) OVER () AS n FROM yc)
          WHERE rk = (n + 1) // 2) AS ty),
st AS (
  SELECT xc.hour,
         CASE WHEN xc.c > thr.tx THEN 1 ELSE 0 END AS x,
         CASE WHEN yc.c > thr.ty THEN 1 ELSE 0 END AS y
  FROM xc JOIN yc USING (hour), thr),
tr AS (
  SELECT a.y AS y1, a.x AS x1, b.y AS y2
  FROM st a JOIN st b ON b.hour = a.hour + 1),
n3 AS (SELECT y2, y1, x1, count(*) AS c FROM tr GROUP BY 1, 2, 3),
nyx AS (SELECT y1, x1, count(*) AS c FROM tr GROUP BY 1, 2),
nyy AS (SELECT y2, y1, count(*) AS c FROM tr GROUP BY 1, 2),
ny AS (SELECT y1, count(*) AS c FROM tr GROUP BY 1),
m AS (SELECT count(*) AS m FROM tr)
SELECT (SELECT CAST(m AS BIGINT) FROM m) AS n_transitions,
       (SELECT CAST(tx AS BIGINT) FROM thr) AS thr_click,
       (SELECT CAST(ty AS BIGINT) FROM thr) AS thr_purchase,
       round(sum(CAST(n3.c AS DOUBLE) / m.m
                 * log2(CAST(n3.c AS DOUBLE) * ny.c
                        / (nyx.c * nyy.c))), 6) AS te_bits
FROM n3
JOIN nyx ON nyx.y1 = n3.y1 AND nyx.x1 = n3.x1
JOIN nyy ON nyy.y2 = n3.y2 AND nyy.y1 = n3.y1
JOIN ny ON ny.y1 = n3.y1, m
"""

QUERIES["transfer_entropy_click_purchase"] = (
    q_transfer_entropy_click_purchase,
    SQL_TRANSFER_ENTROPY_CLICK_PURCHASE)


# ---------------------------------------------------------------------------
# permutation_entropy_hourly — symbolic-dynamics complexity
# ---------------------------------------------------------------------------


def q_permutation_entropy_hourly(sf_dir: str):
    """Order-3 permutation entropy of the hourly event count (Bandt-
    Pompe symbolic dynamics): windows over three CONSECUTIVE present
    hours map to one of six ordinal patterns via the earlier-index-
    smaller tie rule (code 4·[a≤b] + 2·[b≤c] + [a≤c]); reported as
    bits and normalized by log2(6) — the complexity companion of
    randomness_tests_daily at hour grain.  One bounded hourly rollup;
    exact integer pattern counts."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()), dtype=np.int64)
        g = pa.table({"hour": pa.array(tsv // _HOUR_US)}) \
            .group_by("hour").aggregate([([], "count_all")])
        return g.rename_columns(["hour", "c"])

    m = _partial_final(ds, partial, ["hour"], [("c", "sum")])
    hr = np.asarray(m.column("hour"), dtype=np.int64)
    cv = np.asarray(m.column("c"), dtype=np.int64)
    o = np.argsort(hr)
    hr, cv = hr[o], cv[o]
    counts = {}
    nwin = 0
    for i in range(len(hr) - 2):
        if hr[i + 1] == hr[i] + 1 and hr[i + 2] == hr[i] + 2:
            a, b, c = int(cv[i]), int(cv[i + 1]), int(cv[i + 2])
            code = 4 * (a <= b) + 2 * (b <= c) + (a <= c)
            counts[code] = counts.get(code, 0) + 1
            nwin += 1
    if nwin == 0:
        h = pe = None
    else:
        h = -sum(c / nwin * math.log2(c / nwin) for c in counts.values())
        pe = h / math.log2(6)
    return pa.table({
        "n_windows": pa.array([nwin], pa.int64()),
        "h_bits": pa.array([round(h, 6) if h is not None else None],
                           pa.float64()),
        "pe_normalized": pa.array(
            [round(pe, 6) if pe is not None else None], pa.float64()),
    })


SQL_PERMUTATION_ENTROPY_HOURLY = """
WITH h AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         count(*) AS c
  FROM events GROUP BY 1),
win AS (
  SELECT 4 * (CASE WHEN a.c <= b.c THEN 1 ELSE 0 END)
       + 2 * (CASE WHEN b.c <= c3.c THEN 1 ELSE 0 END)
       + (CASE WHEN a.c <= c3.c THEN 1 ELSE 0 END) AS code
  FROM h a
  JOIN h b ON b.hour = a.hour + 1
  JOIN h c3 ON c3.hour = a.hour + 2),
pat AS (SELECT code, count(*) AS c FROM win GROUP BY 1),
m AS (SELECT count(*) AS m FROM win)
SELECT (SELECT CAST(m AS BIGINT) FROM m) AS n_windows,
       round(-sum(CAST(c AS DOUBLE) / m.m
                  * log2(CAST(c AS DOUBLE) / m.m)), 6) AS h_bits,
       round(-sum(CAST(c AS DOUBLE) / m.m
                  * log2(CAST(c AS DOUBLE) / m.m)) / log2(6.0),
             6) AS pe_normalized
FROM pat, m
"""

QUERIES["permutation_entropy_hourly"] = (q_permutation_entropy_hourly,
                                         SQL_PERMUTATION_ENTROPY_HOURLY)


# ---------------------------------------------------------------------------
# wave 2 kernels (brute-force-verified in tests/test_ops_round3p.py)
# ---------------------------------------------------------------------------


def sample_entropy_m2(x, r) -> tuple:
    """SampEn(m=2, Chebyshev tolerance r) on an integer series:
    B = #pairs of length-2 templates within r, A = same for length-3;
    sampen = −ln(A/B).  Exact integer comparisons; returns
    (B, A, sampen_or_None)."""
    x = [int(v) for v in x]
    r = int(r)
    n = len(x)
    B = A = 0
    for i in range(n - 1):
        for j in range(i + 1, n - 1):
            if abs(x[i] - x[j]) <= r and abs(x[i + 1] - x[j + 1]) <= r:
                B += 1
                if (i < n - 2 and j < n - 2
                        and abs(x[i + 2] - x[j + 2]) <= r):
                    A += 1
    se = None if A == 0 or B == 0 else -math.log(A / B)
    return B, A, se


def higuchi_curve(x, kmax: int = 4):
    """Higuchi curve lengths L(k) for k=1..kmax from an integer
    series: L(k) = mean over offsets m of
    S_{k,m}·(n−1)/(cnt_{k,m}·k²) with S the exact integer sum of
    |x[pos]−x[pos−k]| over pos ≡ m (mod k).  Returns [(k, L_k)]."""
    x = [int(v) for v in x]
    n = len(x)
    out = []
    for k in range(1, kmax + 1):
        lms = []
        for m in range(1, k + 1):
            s = 0
            cnt = 0
            pos = m + k
            while pos <= n:
                s += abs(x[pos - 1] - x[pos - 1 - k])
                cnt += 1
                pos += k
            if cnt:
                lms.append(s * (n - 1) / (cnt * k * k))
        if lms:
            out.append((k, sum(lms) / len(lms)))
    return out


def ols_slope(us, vs):
    """Closed-form OLS slope of v on u (float pairs)."""
    n = len(us)
    su, sv = sum(us), sum(vs)
    suu = sum(u * u for u in us)
    suv = sum(u * v for u, v in zip(us, vs))
    den = n * suu - su * su
    return None if den == 0 else (n * suv - su * sv) / den


def erlang_c(a: float, c: int) -> float:
    """Erlang-C waiting probability for offered load a and c agents
    (requires a < c): top = (a^c/c!)·c/(c−a), P(wait) =
    top / (Σ_{k<c} a^k/k! + top), terms via exp(k·ln a − lgamma(k+1))
    so the oracle can mirror the exact expression tree."""
    top = math.exp(c * math.log(a) - math.lgamma(c + 1)) * (c / (c - a))
    s = sum(math.exp(k * math.log(a) - math.lgamma(k + 1))
            for k in range(c))
    return top / (s + top)


# ---------------------------------------------------------------------------
# shared daily-revenue series
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def _daily_revenue_cents(sf_dir: str):
    """Day-ordered (day, cents) exact-integer daily revenue — the
    one bounded shuffle for the wave-2 time-series diagnostics."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.divide(pc.cast(
            t.column("o_orderdate"), pa.int64()),
            pa.scalar(_DAY_US, pa.int64())), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100), 0), pa.int64())
        g = pa.table({"day": day, "cents": cents}) \
            .group_by("day").aggregate([("cents", "sum")])
        return g.rename_columns(["day", "cents"])

    m = _partial_final(ds, partial, ["day"], [("cents", "sum")])
    day = np.asarray(m.column("day"), dtype=np.int64)
    cv = np.asarray(m.column("cents"), dtype=np.int64)
    o = np.argsort(day)
    return day[o], cv[o]


# ---------------------------------------------------------------------------
# sample_entropy_daily
# ---------------------------------------------------------------------------


def q_sample_entropy_daily(sf_dir: str):
    """Sample entropy SampEn(m=2) of daily revenue: template pairs
    compared under Chebyshev distance with the DETERMINISTIC integer
    tolerance r = lower-median |successive difference| (no float
    sigma); sampen = −ln(A/B) from exact integer template-match
    counts — the regularity companion of hurst_rs_daily /
    randomness_tests_daily.  Days-bounded: the C(n,2) sweep runs
    driver-side on ~100 points and as a position self-join in the
    oracle."""
    _, x = _daily_revenue_cents(sf_dir)
    x = x.tolist()
    diffs = sorted(abs(x[i + 1] - x[i]) for i in range(len(x) - 1))
    r = int(diffs[(len(diffs) + 1) // 2 - 1]) if diffs else 0
    B, A, se = sample_entropy_m2(x, r)
    return pa.table({
        "n_days": pa.array([len(x)], pa.int64()),
        "r_tol_cents": pa.array([r], pa.int64()),
        "b_pairs": pa.array([B], pa.int64()),
        "a_pairs": pa.array([A], pa.int64()),
        "sampen": pa.array([round(se, 6) if se is not None else None],
                           pa.float64()),
    })


SQL_SAMPLE_ENTROPY_DAILY = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
s AS (SELECT row_number() OVER (ORDER BY day) AS pos, cents AS x FROM d),
nn AS (SELECT count(*) AS n FROM s),
dif AS (
  SELECT abs(b.x - a.x) AS ad
  FROM s a JOIN s b ON b.pos = a.pos + 1),
r AS (
  SELECT ad AS r FROM (
    SELECT ad, row_number() OVER (ORDER BY ad) AS rk,
           count(*) OVER () AS m FROM dif)
  WHERE rk = (m + 1) // 2),
pb AS (
  SELECT count(*) AS b
  FROM s i JOIN s j ON j.pos > i.pos
  JOIN s i1 ON i1.pos = i.pos + 1 JOIN s j1 ON j1.pos = j.pos + 1, r
  WHERE abs(i.x - j.x) <= r.r AND abs(i1.x - j1.x) <= r.r),
pa_ AS (
  SELECT count(*) AS a
  FROM s i JOIN s j ON j.pos > i.pos
  JOIN s i1 ON i1.pos = i.pos + 1 JOIN s j1 ON j1.pos = j.pos + 1
  JOIN s i2 ON i2.pos = i.pos + 2 JOIN s j2 ON j2.pos = j.pos + 2, r
  WHERE abs(i.x - j.x) <= r.r AND abs(i1.x - j1.x) <= r.r
    AND abs(i2.x - j2.x) <= r.r)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
       (SELECT CAST(r AS BIGINT) FROM r) AS r_tol_cents,
       CAST(pb.b AS BIGINT) AS b_pairs,
       CAST(pa_.a AS BIGINT) AS a_pairs,
       CASE WHEN pa_.a = 0 OR pb.b = 0 THEN NULL
            ELSE round(-ln(CAST(pa_.a AS DOUBLE) / pb.b), 6)
       END AS sampen
FROM pb, pa_
"""

QUERIES["sample_entropy_daily"] = (q_sample_entropy_daily,
                                   SQL_SAMPLE_ENTROPY_DAILY)


# ---------------------------------------------------------------------------
# higuchi_fd_daily
# ---------------------------------------------------------------------------

_HIGUCHI_KMAX = 4


def q_higuchi_fd_daily(sf_dir: str):
    """Higuchi fractal dimension of daily revenue (k = 1..4): curve
    lengths L(k) from exact integer |x(pos)−x(pos−k)| sums per offset
    class m = ((pos−1) mod k)+1, FD = −slope of the 4-point OLS of
    ln L(k) on ln k — the roughness companion of hurst_rs_daily (for
    fBm-like series FD ≈ 2 − H).  Days-bounded shuffle; the float
    closure is a shared 4-point expression tree."""
    _, x = _daily_revenue_cents(sf_dir)
    curve = higuchi_curve(x.tolist(), _HIGUCHI_KMAX)
    us = [math.log(float(k)) for k, _ in curve]
    vs = [math.log(lk) for _, lk in curve if lk > 0]
    fd = None
    if len(vs) == len(curve) and len(curve) >= 2:
        sl = ols_slope(us, vs)
        fd = None if sl is None else -sl
    lmap = dict(curve)
    cols = {"n_days": pa.array([len(x)], pa.int64())}
    for k in range(1, _HIGUCHI_KMAX + 1):
        lv = lmap.get(k)
        cols[f"l_k{k}"] = pa.array(
            [round(lv, 4) if lv is not None else None], pa.float64())
    cols["higuchi_fd"] = pa.array(
        [round(fd, 6) if fd is not None else None], pa.float64())
    return pa.table(cols)


SQL_HIGUCHI_FD_DAILY = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
s AS (SELECT row_number() OVER (ORDER BY day) AS pos, cents AS x FROM d),
nn AS (SELECT count(*) AS n FROM s),
terms AS (
  SELECT k.k, ((a.pos - 1) % k.k) + 1 AS m, abs(a.x - b.x) AS t
  FROM (SELECT unnest(range(1, {KMAX} + 1)) AS k) k
  JOIN s a ON a.pos > k.k
  JOIN s b ON b.pos = a.pos - k.k),
lm AS (
  SELECT k, m, CAST(sum(t) AS DOUBLE) * ((SELECT n FROM nn) - 1)
               / (count(*) * k * k) AS l_m
  FROM terms GROUP BY 1, 2),
lk AS (SELECT k, sum(l_m) / count(*) AS l_k FROM lm GROUP BY 1),
pts AS (SELECT ln(CAST(k AS DOUBLE)) AS u, ln(l_k) AS v FROM lk
        WHERE l_k > 0),
fit AS (
  SELECT count(*) AS n, sum(u) AS su, sum(v) AS sv,
         sum(u * u) AS suu, sum(u * v) AS suv
  FROM pts)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
       (SELECT round(l_k, 4) FROM lk WHERE k = 1) AS l_k1,
       (SELECT round(l_k, 4) FROM lk WHERE k = 2) AS l_k2,
       (SELECT round(l_k, 4) FROM lk WHERE k = 3) AS l_k3,
       (SELECT round(l_k, 4) FROM lk WHERE k = 4) AS l_k4,
       CASE WHEN (SELECT count(*) FROM lk WHERE l_k <= 0) > 0
              OR (SELECT count(*) FROM lk) < 2
              OR fit.n * fit.suu - fit.su * fit.su = 0 THEN NULL
            ELSE round(-((fit.n * fit.suv - fit.su * fit.sv)
                         / (fit.n * fit.suu - fit.su * fit.su)), 6)
       END AS higuchi_fd
FROM fit
""".replace("{KMAX}", str(_HIGUCHI_KMAX))

QUERIES["higuchi_fd_daily"] = (q_higuchi_fd_daily, SQL_HIGUCHI_FD_DAILY)


# ---------------------------------------------------------------------------
# arch_lm_daily — conditional heteroskedasticity screen
# ---------------------------------------------------------------------------


def q_arch_lm_daily(sf_dir: str):
    """Engle's ARCH LM test (lag 1) on daily revenue changes: z_t =
    (whole-dollar day-over-day revenue diff)², regressed on z_{t−1};
    LM = n·R² ~ χ²(1) under no-ARCH — the volatility-clustering
    companion of variance_ratio_daily / ewma_control_chart.  Diffs
    only across CONSECUTIVE present days; the sufficient statistics
    are exact Python-int sums (z² ~ 1e28 overflows int64 → HUGEINT in
    the oracle), combined in double via the shared expression tree."""
    day, cents = _daily_revenue_cents(sf_dir)
    dollars = (cents // 100).tolist()
    dmap = dict(zip(day.tolist(), dollars))
    z = {}                       # day -> squared diff vs previous day
    for dy in sorted(dmap):
        if dy - 1 in dmap:
            d = dmap[dy] - dmap[dy - 1]
            z[dy] = d * d
    xs, ys = [], []
    for dy in sorted(z):
        if dy + 1 in z:
            xs.append(z[dy])
            ys.append(z[dy + 1])
    n = len(xs)
    if n < 3:
        lm = r2 = slope = None
    else:
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        # combine the EXACT integer sums in double, mirrored by the
        # oracle's CAST(... AS DOUBLE) tree (the exact combination
        # overflows HUGEINT at (1e30)²)
        num = float(n) * float(sxy) - float(sx) * float(sy)
        d1 = float(n) * float(sxx) - float(sx) * float(sx)
        d2 = float(n) * float(syy) - float(sy) * float(sy)
        if d1 == 0 or d2 == 0:
            lm = r2 = slope = None
        else:
            r2 = (num * num) / (d1 * d2)
            lm = n * r2
            slope = num / d1
    return pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        "slope": pa.array([round(slope, 6) if slope is not None
                           else None], pa.float64()),
        "r2": pa.array([round(r2, 6) if r2 is not None else None],
                       pa.float64()),
        "arch_lm": pa.array([round(lm, 6) if lm is not None else None],
                            pa.float64()),
    })


SQL_ARCH_LM_DAILY = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // 100
           AS dollars
  FROM orders GROUP BY 1),
z AS (
  SELECT a.day, CAST(a.dollars - b.dollars AS HUGEINT)
                * (a.dollars - b.dollars) AS z
  FROM d a JOIN d b ON b.day = a.day - 1),
p AS (
  SELECT a.z AS x, b.z AS y FROM z a JOIN z b ON b.day = a.day + 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM p)
SELECT n AS n_pairs,
       CASE WHEN n < 3 OR CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
            THEN NULL
            ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                       6) END AS slope,
       CASE WHEN n < 3
                 OR CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                 OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0
            THEN NULL
            ELSE round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                       / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                       6) END AS r2,
       CASE WHEN n < 3
                 OR CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                 OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0
            THEN NULL
            ELSE round(n * (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                       / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))),
                       6) END AS arch_lm
FROM s
"""

QUERIES["arch_lm_daily"] = (q_arch_lm_daily, SQL_ARCH_LM_DAILY)


# ---------------------------------------------------------------------------
# erlang_c_staffing — queueing-theory capacity planning
# ---------------------------------------------------------------------------

_ERLANG_MU = 60.0      # service completions per agent-hour
_ERLANG_SLA_S = 20.0   # answer-time SLA in seconds


def q_erlang_c_staffing(sf_dir: str):
    """Erlang-C staffing for the peak hour-of-day: λ = mean arrivals
    per hour at the busiest hour slot (argmax total events, tie →
    smaller hour; divided by distinct event days), service rate μ =
    60/agent-hour, c = ⌊a⌋+1 agents (minimum stable pool for
    offered load a = λ/μ); reports P(wait) via the Erlang-C formula
    (terms as exp(k·ln a − lgamma(k+1)) — expression tree shared with
    the oracle), average speed of answer, and P(wait > 20s) —
    Little's-law's staffing companion (littles_law_audit).  One
    bounded (hour-of-day) shuffle."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = np.asarray(t.column("ts").cast(pa.int64()), dtype=np.int64)
        hh = (tsv // _HOUR_US) % 24
        day = tsv // _DAY_US
        g = pa.table({"hh": pa.array(hh), "day": pa.array(day)}) \
            .group_by(["hh", "day"]).aggregate([([], "count_all")])
        return g.rename_columns(["hh", "day", "c"])

    m = _partial_final(ds, partial, ["hh", "day"], [("c", "sum")])
    hh = np.asarray(m.column("hh"), dtype=np.int64)
    cv = np.asarray(m.column("c"), dtype=np.int64)
    n_days = len(set(np.asarray(m.column("day"),
                                dtype=np.int64).tolist()))
    tot = {}
    for h, c in zip(hh.tolist(), cv.tolist()):
        tot[h] = tot.get(h, 0) + c
    peak = min(h for h, c in tot.items() if c == max(tot.values()))
    lam = tot[peak] / n_days
    a = lam / _ERLANG_MU
    c_agents = int(a) + 1
    pw = erlang_c(a, c_agents)
    drain = c_agents * _ERLANG_MU - lam          # per hour
    asa_s = pw / drain * 3600.0
    p_sla = pw * math.exp(-drain * (_ERLANG_SLA_S / 3600.0))
    return pa.table({
        "peak_hh": pa.array([int(peak)], pa.int64()),
        "n_days": pa.array([n_days], pa.int64()),
        "lambda_per_hour": pa.array([round(lam, 6)], pa.float64()),
        "agents": pa.array([c_agents], pa.int64()),
        "p_wait": pa.array([round(pw, 6)], pa.float64()),
        "asa_seconds": pa.array([round(asa_s, 6)], pa.float64()),
        "p_wait_gt_sla": pa.array([round(p_sla, 6)], pa.float64()),
    })


SQL_ERLANG_C_STAFFING = """
WITH hd AS (
  SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS hh,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2),
nd AS (SELECT count(DISTINCT day) AS n_days FROM hd),
tot AS (SELECT hh, sum(c) AS c FROM hd GROUP BY 1),
peak AS (
  SELECT min(hh) AS hh FROM tot
  WHERE c = (SELECT max(c) FROM tot)),
base AS (
  SELECT peak.hh AS peak_hh, nd.n_days,
         CAST(tot.c AS DOUBLE) / nd.n_days AS lam,
         CAST(tot.c AS DOUBLE) / nd.n_days / {MU} AS a,
         CAST(FLOOR(CAST(tot.c AS DOUBLE) / nd.n_days / {MU})
              AS BIGINT) + 1 AS c_agents
  FROM peak JOIN tot ON tot.hh = peak.hh, nd),
erl AS (
  SELECT base.*,
         exp(c_agents * ln(a) - lgamma(c_agents + 1))
           * (c_agents / (c_agents - a)) AS top,
         (SELECT sum(exp(k.k * ln(b2.a) - lgamma(k.k + 1)))
          FROM (SELECT unnest(range(0, base.c_agents)) AS k) k,
               (SELECT a) b2(a)) AS s
  FROM base),
pw AS (SELECT erl.*, top / (s + top) AS p_wait,
              c_agents * {MU} - lam AS drain
       FROM erl)
SELECT CAST(peak_hh AS BIGINT) AS peak_hh,
       CAST(n_days AS BIGINT) AS n_days,
       round(lam, 6) AS lambda_per_hour,
       c_agents AS agents,
       round(p_wait, 6) AS p_wait,
       round(p_wait / drain * 3600.0, 6) AS asa_seconds,
       round(p_wait * exp(-drain * ({SLA} / 3600.0)), 6)
         AS p_wait_gt_sla
FROM pw
""".replace("{MU}", repr(_ERLANG_MU)).replace("{SLA}", repr(_ERLANG_SLA_S))

QUERIES["erlang_c_staffing"] = (q_erlang_c_staffing,
                                SQL_ERLANG_C_STAFFING)
