"""Fifth extended query registry (round-3 session 11): storage-engine
self-audits — the observability a columnar engine needs before it
chooses encodings, prunes partitions, or trusts its own cardinality
estimates.  The reference stores everything as raw strings in DuckDB
(`/root/reference/python/logai_agent.py:198-214`) and leaves encoding
and selectivity to the store; a Ray-native engine that writes its own
Parquet (stages/route.py) has to make those calls itself, so each audit
here is a bounded-partial pipeline a 100-TB run could afford:

- ``dict_encoding_audit``: per-column dictionary + RLE potential of
  lineitem (distinct counts -> dict bit-width; within-order value
  changes -> run counts).  The adjacency pass sorts once and repairs
  batch-boundary pairs driver-side from O(#batches) edge rows, never
  re-collecting data rows.
- ``selectivity_estimate_audit``: a 64-bin equi-width histogram (the
  classic optimizer statistic) probed against three range predicates,
  reporting estimated vs exact rows — the error an optimizer would eat.
- ``feature_hash_buckets``: the hashing-trick collision audit over the
  document vocabulary (bucket occupancy, max load, and a signed
  count-sketch probe of the top token).

Same oracle discipline as the siblings: shared column names, identical
rounding, exact integer closures wherever the statistic allows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import ORACLE_HASH_SQL, md5_hash32
from ..stages import aggregate as agg
from .queries import QUERIES, _partial_final, _read

_DAY_US = 86_400_000_000

# ---------------------------------------------------------------------------
# dict_encoding_audit — dictionary bit-width + within-order RLE runs
# ---------------------------------------------------------------------------

# (label, canonicalizer) — canonical integer/string forms both engines
# share exactly (floats only ever *100-rounded to int).
_ENC_COLS = ["l_returnflag", "l_linestatus", "l_quantity",
             "l_discount", "l_tax"]


def _li_canonical(t: pa.Table) -> list:
    """The five audited lineitem columns in canonical string form
    (exact: quantities/rates are integral after *100 scaling)."""
    out = [t.column("l_returnflag").cast(pa.string()),
           t.column("l_linestatus").cast(pa.string())]
    out.append(pc.cast(pc.cast(t.column("l_quantity"), pa.int64()),
                       pa.string()))
    for c in ("l_discount", "l_tax"):
        out.append(pc.cast(pc.cast(pc.round(pc.multiply(
            t.column(c), 100), 0), pa.int64()), pa.string()))
    return [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
            for x in out]


def dict_bits(n_distinct: int) -> int:
    """Bit-width of a dictionary code for ``n_distinct`` values —
    max(1, bit_length(n_distinct - 1))."""
    return max(1, (int(n_distinct) - 1).bit_length())


def rle_runs_from(changes: int, n_groups: int) -> int:
    """Within-group RLE run count: every group opens a run, every
    value change opens another."""
    return int(n_groups) + int(changes)


def q_dict_encoding_audit(sf_dir: str):
    """Per-column encoding audit of lineitem: total values, distinct
    values (-> dictionary bit-width), and within-order RLE runs (value
    changes along l_linenumber inside each l_orderkey).  Distinct
    counts come from bounded (col, value) partials (the audited
    columns are low-cardinality by design — that is what makes them
    dictionary candidates).  Adjacency is computed on the stream
    sorted by the UNIQUE key (l_orderkey, l_linenumber, l_partkey,
    l_suppkey) — (okey, ln) alone repeats in this corpus, which would
    make run counts order-ambiguous: each batch counts its interior
    changes vectorized and emits only its FIRST and LAST rows; the
    driver repairs boundary pairs by binary-searching each first row's
    strict predecessor among the other batches' last rows —
    O(#batches) rows driver-side, exact at any scale.  The reference
    interns repeated strings ad hoc (SURVEY §2 T2); this audit is the
    measurement that decision should come from."""
    cols = ["l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey"] + _ENC_COLS
    ds = _read(sf_dir, "lineitem", columns=cols)

    def canon(t: pa.Table) -> pa.Table:
        vals = _li_canonical(t)
        d = {"okey": t.column("l_orderkey").cast(pa.int64()),
             "ln": t.column("l_linenumber").cast(pa.int64()),
             "pk": t.column("l_partkey").cast(pa.int64()),
             "sk": t.column("l_suppkey").cast(pa.int64())}
        for i, v in enumerate(vals):
            d[f"v{i}"] = v
        return pa.table(d)

    cds = ds.map_batches(canon, batch_format="pyarrow")

    def distinct_partial(t: pa.Table) -> pa.Table:
        vals = [t.column(f"v{i}") for i in range(5)]
        vals = [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                else x for x in vals]
        names, vlist = [], []
        for i, v in enumerate(vals):
            names.append(np.full(len(v), i, dtype=np.int64))
            vlist.append(v)
        tt = pa.table({
            "col": pa.array(np.concatenate(names), pa.int64()),
            "val": pa.concat_arrays(vlist)})
        g = tt.group_by(["col", "val"]).aggregate([([], "count_all")])
        return g.rename_columns(["col", "val", "cnt"])

    vc = _partial_final(cds, distinct_partial, ["col", "val"],
                        [("cnt", "sum")])
    col_id = np.asarray(vc.column("col"), dtype=np.int64)
    cnt = np.asarray(vc.column("cnt"), dtype=np.int64)
    n_values = {i: int(cnt[col_id == i].sum()) for i in range(5)}
    n_distinct = {i: int((col_id == i).sum()) for i in range(5)}

    # duplicate (okey, ln) pairs exist in the data: (okey, ln, pk, sk)
    # is UNIQUE, so this sort is total and engine-agreed
    srt = cds.sort(["okey", "ln", "pk", "sk"])

    def adjacency_partial(t: pa.Table) -> pa.Table:
        ok = np.asarray(t.column("okey"), dtype=np.int64)
        ln = np.asarray(t.column("ln"), dtype=np.int64)
        vals = [np.asarray(t.column(f"v{i}"), dtype=object)
                for i in range(5)]
        n = len(ok)
        chg = [0] * 5
        starts = 0
        if n:
            starts = 1  # batch-first row: tentative; repaired driver-side
        if n >= 2:
            same = ok[1:] == ok[:-1]
            starts += int((~same).sum())
            for i, v in enumerate(vals):
                chg[i] = int((same & (v[1:] != v[:-1])).sum())
        pk = np.asarray(t.column("pk"), dtype=np.int64)
        sk = np.asarray(t.column("sk"), dtype=np.int64)
        out = {
            "kind": ["c", "f", "l"] if n else ["c"],
            "okey": [int(starts)] + ([int(ok[0]), int(ok[-1])]
                                     if n else []),
            "ln": [0] + ([int(ln[0]), int(ln[-1])] if n else []),
            "pk": [0] + ([int(pk[0]), int(pk[-1])] if n else []),
            "sk": [0] + ([int(sk[0]), int(sk[-1])] if n else []),
        }
        for i in range(5):
            out[f"v{i}"] = [str(chg[i])] + \
                ([str(vals[i][0]), str(vals[i][-1])] if n else [])
        return pa.table({k: pa.array(v) for k, v in out.items()})

    edges = agg._to_arrow(srt.map_batches(
        adjacency_partial, batch_format="pyarrow"))
    kind = edges.column("kind").to_pylist()
    okey = edges.column("okey").to_pylist()
    ln = edges.column("ln").to_pylist()
    pk = edges.column("pk").to_pylist()
    sk = edges.column("sk").to_pylist()
    vcols = [edges.column(f"v{i}").to_pylist() for i in range(5)]
    changes = [0] * 5
    n_orders = 0
    lasts, firsts = [], []
    for j, k in enumerate(kind):
        if k == "c":
            n_orders += okey[j]
            for i in range(5):
                changes[i] += int(vcols[i][j])
        elif k == "l":
            lasts.append(((okey[j], ln[j], pk[j], sk[j]), j))
        else:
            firsts.append(j)
    # the global predecessor of a batch-first row is always some
    # batch's LAST row: the greatest last-row key strictly below it
    # in the total sort order (keys are unique)
    lasts.sort()
    lkeys = [k for k, _ in lasts]
    import bisect
    for j in firsts:
        pos = bisect.bisect_left(lkeys, (okey[j], ln[j], pk[j], sk[j]))
        if pos == 0:
            continue  # global first row: the tentative start stands
        _, pj = lasts[pos - 1]
        if okey[pj] == okey[j]:
            n_orders -= 1  # not a new order after all
            for i in range(5):
                if vcols[i][pj] != vcols[i][j]:
                    changes[i] += 1
    rows = []
    for i, name in enumerate(_ENC_COLS):
        runs = rle_runs_from(changes[i], n_orders)
        rows.append((name, n_values[i], n_distinct[i],
                     dict_bits(n_distinct[i]), changes[i], runs,
                     runs * 1000 // max(n_values[i], 1)))
    rows.sort()
    return pa.table({
        "column": pa.array([r[0] for r in rows], pa.string()),
        "n_values": pa.array([r[1] for r in rows], pa.int64()),
        "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
        "dict_bits": pa.array([r[3] for r in rows], pa.int64()),
        "changes": pa.array([r[4] for r in rows], pa.int64()),
        "rle_runs": pa.array([r[5] for r in rows], pa.int64()),
        "runs_per_mille": pa.array([r[6] for r in rows], pa.int64()),
    })


SQL_DICT_ENCODING_AUDIT = """
WITH c AS (
  SELECT l_orderkey AS ok, l_linenumber AS ln,
         l_partkey AS pk, l_suppkey AS sk,
         CAST(l_returnflag AS VARCHAR) AS v0,
         CAST(l_linestatus AS VARCHAR) AS v1,
         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS v2,
         CAST(CAST(round(l_discount * 100, 0) AS BIGINT) AS VARCHAR)
           AS v3,
         CAST(CAST(round(l_tax * 100, 0) AS BIGINT) AS VARCHAR) AS v4
  FROM lineitem),
lagd AS (
  SELECT v0, v1, v2, v3, v4,
         lag(v0) OVER w AS p0, lag(v1) OVER w AS p1,
         lag(v2) OVER w AS p2, lag(v3) OVER w AS p3,
         lag(v4) OVER w AS p4
  FROM c WINDOW w AS (PARTITION BY ok ORDER BY ln, pk, sk)),
norders AS (SELECT count(DISTINCT ok) AS g FROM c),
stats AS (
  SELECT 'l_returnflag' AS col, count(*) AS n,
         count(DISTINCT v0) AS d,
         sum(CASE WHEN p0 IS NOT NULL AND p0 <> v0
                  THEN 1 ELSE 0 END) AS chg
  FROM lagd
  UNION ALL
  SELECT 'l_linestatus', count(*), count(DISTINCT v1),
         sum(CASE WHEN p1 IS NOT NULL AND p1 <> v1 THEN 1 ELSE 0 END)
  FROM lagd
  UNION ALL
  SELECT 'l_quantity', count(*), count(DISTINCT v2),
         sum(CASE WHEN p2 IS NOT NULL AND p2 <> v2 THEN 1 ELSE 0 END)
  FROM lagd
  UNION ALL
  SELECT 'l_discount', count(*), count(DISTINCT v3),
         sum(CASE WHEN p3 IS NOT NULL AND p3 <> v3 THEN 1 ELSE 0 END)
  FROM lagd
  UNION ALL
  SELECT 'l_tax', count(*), count(DISTINCT v4),
         sum(CASE WHEN p4 IS NOT NULL AND p4 <> v4 THEN 1 ELSE 0 END)
  FROM lagd)
SELECT col AS "column",
       CAST(n AS BIGINT) AS n_values,
       CAST(d AS BIGINT) AS n_distinct,
       CAST(CASE WHEN d = 1 THEN 1 ELSE length(bin(d - 1)) END
            AS BIGINT) AS dict_bits,
       CAST(chg AS BIGINT) AS changes,
       CAST(chg + g AS BIGINT) AS rle_runs,
       CAST((chg + g) * 1000 // greatest(n, 1) AS BIGINT)
         AS runs_per_mille
FROM stats, norders
ORDER BY 1
"""

QUERIES["dict_encoding_audit"] = (q_dict_encoding_audit,
                                  SQL_DICT_ENCODING_AUDIT)


# ---------------------------------------------------------------------------
# selectivity_estimate_audit — equi-width histogram vs exact
# ---------------------------------------------------------------------------

_SEL_BINS = 64
_SEL_QS = (10, 50, 90)     # predicate thresholds as (mn..mx) percents


def bin_width_exact(b: int, rng: int, nbins: int) -> int:
    """Number of integer values that land in equi-width bin ``b`` of
    ``nbins`` over a domain of ``rng`` consecutive integers, under the
    exact integer binning u*nbins // rng."""
    return ((b + 1) * rng + nbins - 1) // nbins - \
        (b * rng + nbins - 1) // nbins


def bin_lo(b: int, mn: int, rng: int, nbins: int) -> int:
    """Smallest domain value mapped to bin ``b``."""
    return mn + (b * rng + nbins - 1) // nbins


def selectivity_estimate(hist: dict, mn: int, mx: int, x: int,
                         nbins: int = _SEL_BINS) -> float:
    """Estimated row count for predicate ``value <= x`` from an
    equi-width histogram {bin: count} with uniform-within-bin
    interpolation — the textbook optimizer estimate."""
    rng = mx - mn + 1
    bx = (x - mn) * nbins // rng
    below = sum(c for b, c in hist.items() if b < bx)
    w = bin_width_exact(bx, rng, nbins)
    lo = bin_lo(bx, mn, rng, nbins)
    frac = (x + 1 - lo) / w if w > 0 else 0.0
    return below + hist.get(bx, 0) * frac


def q_selectivity_estimate_audit(sf_dir: str):
    """Optimizer-statistics audit: build the 64-bin equi-width
    histogram of o_totalprice (exact integer binning over cents) in one
    bounded partial pass, then compare its interpolated estimate for
    three range predicates (value <= mn + q%% of the range) against the
    exact counts gathered in the same pass.  The per-mille error is
    what a cost-based planner would mis-estimate by; DuckDB's own
    optimizer keeps the same statistic internally
    (reference delegates all of this to the store,
    `/root/reference/python/logai_agent.py:385-407`)."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def minmax_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100), 0), pa.int64())
        if len(cents) == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "mn": pa.array([pc.min(cents).as_py()], pa.int64()),
            "mx": pa.array([pc.max(cents).as_py()], pa.int64())})

    mm = _partial_final(ds, minmax_partial, [],
                        [("mn", "min"), ("mx", "max")])
    mn = int(mm.column("mn")[0].as_py())
    mx = int(mm.column("mx")[0].as_py())
    rng = mx - mn + 1
    xs = [mn + (mx - mn) * q // 100 for q in _SEL_QS]

    def hist_partial(t: pa.Table) -> pa.Table:
        cents = np.asarray(pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100), 0), pa.int64()),
            dtype=np.int64)
        b = (cents - mn) * _SEL_BINS // rng
        binv, cnts = np.unique(b, return_counts=True)
        rows_b = binv.tolist()
        rows_c = cnts.tolist()
        for i, x in enumerate(xs):
            rows_b.append(-1 - i)
            rows_c.append(int((cents <= x).sum()))
        return pa.table({"b": pa.array(rows_b, pa.int64()),
                         "cnt": pa.array(rows_c, pa.int64())})

    ht = _partial_final(ds, hist_partial, ["b"], [("cnt", "sum")])
    bs = np.asarray(ht.column("b"), dtype=np.int64)
    cs = np.asarray(ht.column("cnt"), dtype=np.int64)
    hist = {int(b): int(c) for b, c in zip(bs, cs) if b >= 0}
    exact = {int(-1 - i): int(cs[bs == (-1 - i)][0])
             for i in range(len(xs))}
    n_total = sum(hist.values())
    rows = []
    for i, (q, x) in enumerate(zip(_SEL_QS, xs)):
        est = selectivity_estimate(hist, mn, mx, x)
        ex = exact[-1 - i]
        rows.append((f"p{q:02d}", x, round(est, 6), ex,
                     round((est - ex) / n_total * 1000.0, 6)))
    return pa.table({
        "predicate": pa.array([r[0] for r in rows], pa.string()),
        "threshold_cents": pa.array([r[1] for r in rows], pa.int64()),
        "est_rows": pa.array([r[2] for r in rows], pa.float64()),
        "exact_rows": pa.array([r[3] for r in rows], pa.int64()),
        "err_per_mille": pa.array([r[4] for r in rows], pa.float64()),
    })


SQL_SELECTIVITY_ESTIMATE_AUDIT = f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
  FROM orders),
mm AS (SELECT min(v) AS mn, max(v) AS mx,
              max(v) - min(v) + 1 AS rng, count(*) AS n FROM c),
h AS (
  SELECT (v - mn) * {_SEL_BINS} // rng AS b, count(*) AS cnt
  FROM c, mm GROUP BY 1),
preds AS (
  SELECT 'p' || lpad(CAST(q AS VARCHAR), 2, '0') AS predicate,
         mn + (mx - mn) * q // 100 AS x, mn, mx, rng, n
  FROM (SELECT unnest([10, 50, 90]) AS q), mm),
est AS (
  SELECT p.predicate, p.x, p.n,
         (SELECT coalesce(sum(cnt), 0) FROM h
           WHERE h.b < (p.x - p.mn) * {_SEL_BINS} // p.rng) AS below,
         (SELECT coalesce(sum(cnt), 0) FROM h
           WHERE h.b = (p.x - p.mn) * {_SEL_BINS} // p.rng) AS inbin,
         (p.x - p.mn) * {_SEL_BINS} // p.rng AS bx,
         p.mn AS mn, p.rng AS rng
  FROM preds p),
fin AS (
  SELECT predicate, x, n, below, inbin, bx, mn, rng,
         ((bx + 1) * rng + {_SEL_BINS} - 1) // {_SEL_BINS}
           - (bx * rng + {_SEL_BINS} - 1) // {_SEL_BINS} AS w,
         mn + (bx * rng + {_SEL_BINS} - 1) // {_SEL_BINS} AS lo
  FROM est),
ex AS (
  SELECT f.predicate, f.x, f.n,
         f.below + f.inbin * (CASE WHEN f.w > 0
             THEN CAST(f.x + 1 - f.lo AS DOUBLE) / f.w
             ELSE 0.0 END) AS est_rows,
         (SELECT count(*) FROM c WHERE c.v <= f.x) AS exact_rows
  FROM fin f)
SELECT predicate, CAST(x AS BIGINT) AS threshold_cents,
       round(est_rows, 6) AS est_rows,
       CAST(exact_rows AS BIGINT) AS exact_rows,
       round((est_rows - exact_rows) / n * 1000.0, 6)
         AS err_per_mille
FROM ex ORDER BY 1
"""

QUERIES["selectivity_estimate_audit"] = (q_selectivity_estimate_audit,
                                         SQL_SELECTIVITY_ESTIMATE_AUDIT)


# ---------------------------------------------------------------------------
# feature_hash_buckets — hashing-trick collision + count-sketch probe
# ---------------------------------------------------------------------------

_FH_BUCKETS = 1024


def feature_hash_stats(token_counts: dict, nbuckets: int = _FH_BUCKETS):
    """Hashing-trick audit from {token: count}: (distinct, occupied,
    collisions, max_load, top_token, top_exact, top_est).  bucket =
    md5_hash32 %% nbuckets; sign from the next hash bit; the top-token
    estimate is the signed bucket sum — the count-sketch d=1 row whose
    bias the signed cancellation bounds."""
    buckets, signs = {}, {}
    loads = {}
    for tok in token_counts:
        h = md5_hash32(tok)
        b = h % nbuckets
        buckets[tok] = b
        signs[tok] = 1 if (h // nbuckets) % 2 == 0 else -1
        loads[b] = loads.get(b, 0) + 1
    distinct = len(token_counts)
    occupied = len(loads)
    max_load = max(loads.values()) if loads else 0
    top = min(((-c, t) for t, c in token_counts.items()))[1] \
        if token_counts else ""
    top_exact = token_counts.get(top, 0)
    tb = buckets.get(top)
    est = sum(signs[t] * c for t, c in token_counts.items()
              if buckets[t] == tb)
    top_est = signs.get(top, 1) * est
    return (distinct, occupied, distinct - occupied, max_load,
            top, top_exact, top_est)


def q_feature_hash_buckets(sf_dir: str):
    """Feature-hashing (hashing-trick) audit over the document
    vocabulary: distinct tokens, occupied buckets among 1024,
    collision count and per-mille, the max bucket load, and a
    count-sketch probe of the most frequent token (signed bucket sum
    vs exact count).  The vocabulary partials are the same bounded
    (token, count) shuffle every lexical query here uses; hashing runs
    on the distinct vocabulary only.  This is the audit behind any
    fixed-width feature map a downstream trainer would use."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        g = pa.table({"token": flat.filter(keep)}) \
            .group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "cnt"])

    vc = _partial_final(ds, partial, ["token"], [("cnt", "sum")])
    toks = vc.column("token").to_pylist()
    cnts = np.asarray(vc.column("cnt"), dtype=np.int64).tolist()
    counts = dict(zip(toks, cnts))
    (distinct, occupied, collisions, max_load,
     top, top_exact, top_est) = feature_hash_stats(counts)
    return pa.table({
        "n_buckets": pa.array([_FH_BUCKETS], pa.int64()),
        "distinct_tokens": pa.array([distinct], pa.int64()),
        "occupied_buckets": pa.array([occupied], pa.int64()),
        "collisions": pa.array([collisions], pa.int64()),
        "collision_pm": pa.array(
            [collisions * 1000 // max(distinct, 1)], pa.int64()),
        "max_bucket_load": pa.array([max_load], pa.int64()),
        "top_token": pa.array([top], pa.string()),
        "top_exact": pa.array([top_exact], pa.int64()),
        "top_sketch_est": pa.array([top_est], pa.int64()),
    })


_FH_HASH = ORACLE_HASH_SQL.format(col="tok")

SQL_FEATURE_HASH_BUCKETS = f"""
WITH t AS (
  SELECT tok, count(*) AS cnt FROM (
    SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
    FROM documents)
  WHERE tok <> '' GROUP BY 1),
hb AS (
  SELECT tok, cnt,
         {_FH_HASH} % {_FH_BUCKETS} AS b,
         CASE WHEN ({_FH_HASH} // {_FH_BUCKETS}) % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM t),
loads AS (SELECT b, count(*) AS load FROM hb GROUP BY 1),
top AS (
  SELECT tok, cnt, b, sgn FROM hb
  ORDER BY cnt DESC, tok LIMIT 1),
est AS (
  SELECT top.tok, top.cnt,
         top.sgn * (SELECT sum(hb.sgn * hb.cnt) FROM hb
                     WHERE hb.b = top.b) AS est
  FROM top)
SELECT CAST({_FH_BUCKETS} AS BIGINT) AS n_buckets,
       CAST((SELECT count(*) FROM hb) AS BIGINT) AS distinct_tokens,
       CAST((SELECT count(*) FROM loads) AS BIGINT)
         AS occupied_buckets,
       CAST((SELECT count(*) FROM hb)
            - (SELECT count(*) FROM loads) AS BIGINT) AS collisions,
       CAST(((SELECT count(*) FROM hb)
             - (SELECT count(*) FROM loads)) * 1000
            // greatest((SELECT count(*) FROM hb), 1) AS BIGINT)
         AS collision_pm,
       CAST((SELECT max(load) FROM loads) AS BIGINT)
         AS max_bucket_load,
       (SELECT tok FROM top) AS top_token,
       CAST((SELECT cnt FROM top) AS BIGINT) AS top_exact,
       CAST((SELECT est FROM est) AS BIGINT) AS top_sketch_est
"""

QUERIES["feature_hash_buckets"] = (q_feature_hash_buckets,
                                   SQL_FEATURE_HASH_BUCKETS)
