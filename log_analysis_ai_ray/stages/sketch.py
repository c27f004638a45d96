"""Mergeable sketches for corpus-scale statistics.

Misra-Gries heavy hitters: per-block MG summaries (k counters each)
merge associatively, and the merged sketch's candidate set is a
GUARANTEED superset of every item with true frequency > n/k
(Misra & Gries 1982; merge property per Agarwal et al., "Mergeable
Summaries", PODS 2012). A second exact counting pass over only the
candidates turns the approximate sketch into an exact heavy-hitters
answer — which is what makes the operator oracle-checkable end to end.

Scale shape: pass 1 ships one k-entry summary per block (no shuffle of
raw tokens); pass 2 is a broadcast candidate filter + partial/final
count. k bounds memory everywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def mg_update(counters: dict[str, int], items: np.ndarray,
              counts: np.ndarray, k: int) -> None:
    """Fold (item, count) pairs into a Misra-Gries summary of ≤ k-1
    counters (weighted update; decrement step subtracts the minimum
    counter when capacity is exceeded)."""
    for item, cnt in zip(items.tolist(), counts.tolist()):
        if item in counters:
            counters[item] += cnt
        elif len(counters) < k - 1:
            counters[item] = cnt
        else:
            dec = min(cnt, min(counters.values()))
            cnt -= dec
            for key in list(counters):
                counters[key] -= dec
                if counters[key] <= 0:
                    del counters[key]
            if cnt > 0:
                counters[item] = cnt


def mg_merge(a: dict[str, int], b: dict[str, int], k: int) -> dict[str, int]:
    """Merge two MG summaries into one of ≤ k-1 counters (pairwise sum,
    then subtract the k-th largest value — the mergeable-summaries
    construction)."""
    out = dict(a)
    for item, cnt in b.items():
        out[item] = out.get(item, 0) + cnt
    if len(out) >= k:
        kth = sorted(out.values(), reverse=True)[k - 1]
        out = {i: c - kth for i, c in out.items() if c - kth > 0}
    return out


class MgSketchStage:
    """map_batches stage: one MG summary row set per block over the
    whitespace tokens of ``text_col``. Tokens are counted distinct-first
    (np.unique) so the Python fold touches vocab, not rows."""

    def __init__(self, k: int = 200, text_col: str = "text",
                 split_pattern: str = r"\s+"):
        self.k = k
        self.text_col = text_col
        self.split_pattern = split_pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            batch.column(self.text_col), pattern=self.split_pattern))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)  # vectorized distinct-count (Arrow)
        uniq = np.asarray(vc.field("values"), dtype=object)
        counts = np.asarray(vc.field("counts"), dtype=np.int64)
        counters: dict[str, int] = {}
        mg_update(counters, uniq, counts, self.k)
        items = list(counters.keys())
        # no block-total column: heavy_hitter_tokens recomputes exact
        # totals in its pass-2 partials, so shipping one per counter
        # row was pure shuffle waste (round-4 review finding)
        return pa.table({
            "token": pa.array(items, type=pa.string()),
            "mg_count": pa.array([counters[i] for i in items],
                                 type=pa.int64()),
        })


def heavy_hitter_tokens(ds, phi: float = 0.005, k: int | None = None,
                        text_col: str = "text",
                        split_pattern: str = r"\s+") -> pa.Table:
    """Exact items with frequency > phi·total, found via MG sketch +
    exact verification. k defaults to ceil(2/phi) so the sketch's
    superset guarantee covers the phi threshold with slack. The
    ``split_pattern`` chooses the item granularity — whitespace tokens
    by default, newline-split LINES for boilerplate detection."""
    from .aggregate import _combine_partials, _to_arrow

    k = k or int(np.ceil(2.0 / phi))
    sketches = _to_arrow(ds.map_batches(
        MgSketchStage(k=k, text_col=text_col,
                      split_pattern=split_pattern),
        batch_format="pyarrow"))
    if sketches.num_rows == 0 or "token" not in sketches.column_names:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    # merge per-block summaries (driver: ≤ k rows per block)
    merged: dict[str, int] = {}
    tok = np.asarray(sketches.column("token"), dtype=object)
    cnt = np.asarray(sketches.column("mg_count"), dtype=np.int64)
    mg_update(merged, tok, cnt, k)
    candidates = pa.array(sorted(merged.keys()), type=pa.string())

    # pass 2: exact counts of candidates only (broadcast filter). The
    # per-block token total rides in a dedicated is_total flag row —
    # never as an in-band magic token a real corpus could collide with
    # (ADVICE r2). Tokens are non-empty by construction, so the
    # total row's empty-string token can never merge with a real one.
    def exact_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            t.column(text_col), pattern=split_pattern))
        toks = toks.filter(pc.not_equal(toks, ""))
        total = pa.table({
            "token": pa.array([""], type=pa.string()),
            "is_total": pa.array([1], type=pa.int64()),
            "cnt": pa.array([len(toks)], type=pa.int64()),
        })
        hits = toks.filter(pc.is_in(toks, value_set=candidates))
        tt = pa.table({"token": hits}).group_by("token").aggregate(
            [([], "count_all")]).rename_columns(["token", "cnt"])
        tt = tt.add_column(1, "is_total",
                           pa.array(np.zeros(tt.num_rows, dtype=np.int64)))
        return pa.concat_tables([total, tt])

    exact = _combine_partials(
        ds.map_batches(exact_partial, batch_format="pyarrow"),
        keys=["token", "is_total"], aggs=[("cnt", "sum")],
        empty_schema=pa.schema([("token", pa.string()),
                                ("is_total", pa.int64()),
                                ("cnt", pa.int64())]))
    is_total = pc.equal(exact.column("is_total"), 1)
    total = int(pc.sum(exact.filter(is_total).column("cnt")).as_py() or 0)
    out = exact.filter(pc.invert(is_total)).drop_columns(["is_total"])
    out = out.filter(pc.greater(out.column("cnt"),
                                pa.scalar(int(total * phi), pa.int64())))
    return out.sort_by([("cnt", "descending"), ("token", "ascending")])


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct count — the second mergeable
# summary (with Misra-Gries above): one 2^p-register sketch per block
# crosses the shuffle-free reduce, merged by elementwise max on the
# driver. Deterministic (splitmix64 hash), ~1.04/sqrt(2^p) standard
# error; small cardinalities fall back to linear counting.
# ---------------------------------------------------------------------------

HLL_P = 12  # 4096 registers → ~1.6% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_registers(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint8[2^p] register array for an int64 value batch."""
    h = _splitmix64(values.astype(np.uint64))
    m = np.uint64(1 << p)
    idx = (h & (m - np.uint64(1))).astype(np.int64)
    rest = h >> np.uint64(p)
    # rank = leading position of first 1-bit in the remaining 64-p bits
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for b in range(nbits):
        hit = ~found & (((rest >> np.uint64(nbits - 1 - b))
                         & np.uint64(1)) == 1)
        rank[hit] = b + 1
        found |= hit
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray, p: int = HLL_P) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting
    return raw


class HllSketchStage:
    """map_batches stage: one (registers) row per block for an int64
    column; registers travel as a 2^p-byte binary blob."""

    def __init__(self, col: str, p: int = HLL_P):
        self.col = col
        self.p = p

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = np.asarray(pc.cast(batch.column(self.col),
                                  pa.int64()).drop_null(),
                          dtype=np.int64)
        regs = hll_registers(vals, self.p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          type=pa.binary())})


def approx_distinct(ds, col: str, p: int = HLL_P) -> int:
    """Estimated distinct count of an int64 column: one small sketch
    row per block, merged driver-side."""
    from .aggregate import _to_arrow

    rows = _to_arrow(ds.map_batches(HllSketchStage(col, p),
                                    batch_format="pyarrow"))
    regs = np.zeros(1 << p, dtype=np.uint8)
    if "regs" in rows.column_names:
        for blob in rows.column("regs").to_pylist():
            regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
    return int(round(hll_estimate(regs, p)))


# ---------------------------------------------------------------------------
# Mergeable quantile summary (MRL-style equal-weight compaction)
# ---------------------------------------------------------------------------
#
# Each block is compressed to ≤ k weighted points: sort, then take the
# value at each of k evenly-spaced weighted-rank midpoints, each point
# carrying weight W/k. One compression introduces ≤ W_block/(2k) rank
# error; a driver-side merge of all block summaries re-compresses once
# more, so the end-to-end rank error is ≤ n/k (Manku, Rajagopalan &
# Lindsay, SIGMOD 1998 collapse policy; mergeability per Agarwal et
# al., PODS 2012). Deterministic — no sampling — so results are
# independent of block structure up to the documented bound, and k
# bounds memory everywhere: the shuffle ships k points per block.

def quantile_compress(values: np.ndarray, weights: np.ndarray | None,
                      k: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted values to ≤ k equal-weight points."""
    values = np.asarray(values, dtype=np.float64)
    if weights is None:
        weights = np.ones(len(values), dtype=np.float64)
    mask = ~np.isnan(values)
    values, weights = values[mask], np.asarray(weights, float)[mask]
    if len(values) == 0:
        return values, weights
    order = np.argsort(values, kind="stable")
    values, weights = values[order], weights[order]
    total = float(weights.sum())
    if len(values) <= k:
        return values, weights
    cum = np.cumsum(weights)
    # midpoint ranks of k equal-weight spans
    targets = (np.arange(k) + 0.5) * (total / k)
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(values) - 1)
    return values[idx], np.full(k, total / k)


def quantile_query(points: np.ndarray, weights: np.ndarray,
                   qs: "list[float]") -> np.ndarray:
    """Weighted quantiles from a summary (lower weighted order stat)."""
    if len(points) == 0:
        return np.full(len(qs), np.nan)
    order = np.argsort(points, kind="stable")
    points, weights = points[order], weights[order]
    cum = np.cumsum(weights)
    total = cum[-1]
    idx = np.searchsorted(cum, np.asarray(qs) * total, side="left")
    return points[np.minimum(idx, len(points) - 1)]


class QuantileSketchStage:
    """map_batches partial: one ≤ k-point weighted summary per block
    (columns ``point``/``weight``). Stateless task stage."""

    def __init__(self, col: str, k: int = 256):
        self.col = col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.col).to_numpy(zero_copy_only=False)
        pts, wts = quantile_compress(vals, None, self.k)
        return pa.table({"point": pa.array(pts, type=pa.float64()),
                         "weight": pa.array(wts, type=pa.float64())})


def approx_quantiles(ds, col: str, qs: "list[float]",
                     k: int = 256) -> np.ndarray:
    """Distributed approximate quantiles: k points per block shipped
    to a driver merge (bounded: k × n_blocks rows), one re-compression,
    then the weighted quantile read — total rank error ≤ n/k."""
    from .aggregate import _to_arrow

    parts = _to_arrow(ds.map_batches(QuantileSketchStage(col, k),
                                     batch_format="pyarrow"))
    pts = parts.column("point").to_numpy(zero_copy_only=False)
    wts = parts.column("weight").to_numpy(zero_copy_only=False)
    pts, wts = quantile_compress(pts, wts, 4 * k)
    return quantile_query(pts, wts, qs)


def _group_slices(g: np.ndarray):
    """Sort-and-segment a (null-free) group-key array: returns
    (order, first, bounds) where applying ``order`` sorts the rows and
    rows first[i]:bounds[i+1] of the sorted view form the i-th group.
    Shared by the grouped sketch stages so their segmentation (and its
    edge cases) stays identical."""
    order = np.argsort(g, kind="stable")
    gs = g[order]
    first = np.concatenate([[0], np.flatnonzero(gs[1:] != gs[:-1]) + 1]) \
        if len(gs) else np.array([], dtype=np.int64)
    bounds = np.concatenate([first, [len(gs)]])
    return order, first, bounds


class HllGroupedStage:
    """map_batches stage: one (group, registers) row per group per
    block — the mergeable GROUPED distinct-count sketch (HLL as an
    aggregate function, not just a global counter). Register blobs are
    2^p bytes; the shuffle/merge moves groups × blocks rows of fixed
    size, never values. Rows with a null group or null value are
    dropped (matching the global stage's drop_null — a null would
    otherwise hash as a garbage INT64_MIN 'value')."""

    def __init__(self, col: str, group_col: str, p: int = HLL_P):
        self.col = col
        self.group_col = group_col
        self.p = p

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.select([self.group_col, self.col]).drop_null()
        g = batch.column(self.group_col).to_numpy(zero_copy_only=False)
        vals = np.asarray(pc.cast(batch.column(self.col), pa.int64()),
                          dtype=np.int64)
        order, first, bounds = _group_slices(g)
        g, vals = g[order], vals[order]
        keys, blobs = [], []
        for i in range(len(first)):
            keys.append(g[first[i]])
            blobs.append(hll_registers(
                vals[bounds[i]:bounds[i + 1]], self.p).tobytes())
        return pa.table({self.group_col: pa.array(keys),
                         "regs": pa.array(blobs, type=pa.binary())})


def approx_distinct_by(ds, col: str, group_col: str,
                       p: int = HLL_P) -> dict:
    """Per-group estimated distinct counts: grouped register partials,
    merged per group driver-side (bounded: groups × blocks fixed-size
    rows; at an unbounded group space the same max-merge runs as a
    groupby over register bytes)."""
    from .aggregate import _to_arrow

    rows = _to_arrow(ds.map_batches(HllGroupedStage(col, group_col, p),
                                    batch_format="pyarrow"))
    merged: dict = {}
    if "regs" in rows.column_names:
        for key, blob in zip(rows.column(group_col).to_pylist(),
                             rows.column("regs").to_pylist()):
            r = np.frombuffer(blob, dtype=np.uint8)
            merged[key] = hll_merge(merged[key], r) if key in merged \
                else r.copy()
    return {k: int(round(hll_estimate(regs, p)))
            for k, regs in merged.items()}


class QuantileSketchGroupedStage:
    """map_batches partial: one ≤ k-point weighted summary PER GROUP
    per block (columns group/point/weight) — the mergeable GROUPED
    quantile sketch (quantiles as an aggregate function). The
    shuffle/merge moves ≤ groups × k fixed-width rows per block,
    never the raw values."""

    def __init__(self, col: str, group_col: str, k: int = 128):
        self.col = col
        self.group_col = group_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.select([self.group_col, self.col])
        batch = batch.filter(pc.is_valid(batch.column(self.group_col)))
        g = batch.column(self.group_col).to_numpy(zero_copy_only=False)
        vals = batch.column(self.col).to_numpy(zero_copy_only=False)
        order, first, bounds = _group_slices(g)
        g, vals = g[order], vals[order]
        keys, pts_out, wts_out = [], [], []
        for i in range(len(first)):
            pts, wts = quantile_compress(vals[bounds[i]:bounds[i + 1]],
                                         None, self.k)
            keys.extend([g[first[i]]] * len(pts))
            pts_out.append(pts)
            wts_out.append(wts)
        flat_p = np.concatenate(pts_out) if pts_out else \
            np.array([], dtype=np.float64)
        flat_w = np.concatenate(wts_out) if wts_out else \
            np.array([], dtype=np.float64)
        return pa.table({self.group_col: pa.array(keys),
                         "point": pa.array(flat_p, type=pa.float64()),
                         "weight": pa.array(flat_w, type=pa.float64())})


def approx_quantiles_by(ds, col: str, group_col: str, qs: "list[float]",
                        k: int = 128) -> dict:
    """Per-group approximate quantiles: grouped k-point partials merged
    per group driver-side (bounded: groups × k × blocks rows; an
    unbounded group space would run the same re-compression as a
    distributed groupby over the partial rows), one re-compression per
    group, then the weighted quantile read — rank error ≤ n_g/k per
    group."""
    from .aggregate import _to_arrow

    rows = _to_arrow(ds.map_batches(
        QuantileSketchGroupedStage(col, group_col, k),
        batch_format="pyarrow"))
    out: dict = {}
    if rows.num_rows == 0 or "point" not in rows.column_names:
        return out
    keys = np.asarray(rows.column(group_col).to_pylist())
    pts = rows.column("point").to_numpy(zero_copy_only=False)
    wts = rows.column("weight").to_numpy(zero_copy_only=False)
    for key in np.unique(keys):
        m = keys == key
        p2, w2 = quantile_compress(pts[m], wts[m], 4 * k)
        out[key if not hasattr(key, "item") else key.item()] = \
            quantile_query(p2, w2, qs)
    return out
