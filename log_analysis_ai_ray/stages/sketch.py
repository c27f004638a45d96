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

    def __init__(self, k: int = 200, text_col: str = "text"):
        self.k = k
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            batch.column(self.text_col), pattern=r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)  # vectorized distinct-count (Arrow)
        uniq = np.asarray(vc.field("values"), dtype=object)
        counts = np.asarray(vc.field("counts"), dtype=np.int64)
        counters: dict[str, int] = {}
        mg_update(counters, uniq, counts, self.k)
        n_tokens = int(counts.sum())
        items = list(counters.keys())
        return pa.table({
            "token": pa.array(items, type=pa.string()),
            "mg_count": pa.array([counters[i] for i in items],
                                 type=pa.int64()),
            "block_tokens": pa.array([n_tokens] * len(items),
                                     type=pa.int64()),
        })


def heavy_hitter_tokens(ds, phi: float = 0.005, k: int | None = None,
                        text_col: str = "text") -> pa.Table:
    """Exact tokens with frequency > phi·total, found via MG sketch +
    exact verification. k defaults to ceil(2/phi) so the sketch's
    superset guarantee covers the phi threshold with slack."""
    from .aggregate import _combine_partials, _to_arrow

    k = k or int(np.ceil(2.0 / phi))
    sketches = _to_arrow(ds.map_batches(
        MgSketchStage(k=k, text_col=text_col), batch_format="pyarrow"))
    if sketches.num_rows == 0 or "token" not in sketches.column_names:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    # merge per-block summaries (driver: ≤ k rows per block)
    merged: dict[str, int] = {}
    # total token count: one block_tokens value per distinct block row
    # group — recompute exactly from per-block partials instead:
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
            t.column(text_col), pattern=r"\s+"))
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
