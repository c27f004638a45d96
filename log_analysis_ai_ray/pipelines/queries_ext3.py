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
