"""Wide aggregations with explicit partial/final structure.

Every aggregate here follows the same scale discipline: a per-batch
combiner (``pa.Table.group_by`` inside ``map_batches``) shrinks blocks
from O(rows) to O(distinct keys) BEFORE the all-to-all
``Dataset.groupby`` — the shuffle then moves partial rows, not raw
rows. This is the Ray-native form of the reference's per-thread parse +
merged SQL count (SURVEY.md A9), and it is what makes the Zipfian
template distribution (hot keys) harmless: a hot template contributes
ONE partial row per block regardless of its row share, so no explicit
salting is needed on the count path.

Reference aggregate semantics being reproduced:
- template frequency: /root/reference/python/logai_agent.py:283-304
- count by level:     python/logai_agent.py:466-473
- global min/max ts:  python/logai_agent.py:513-528
- group_by_time 'H':  python/data_analysis_agent.py:175
- z-score anomalies:  python/data_analysis_agent.py:170-174
- trending top-k:     python/logai_agent.py:530-535
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.timestamps import floor_hour


def _assert_groupby_column_order() -> None:
    """Repo-wide, ``group_by(...).aggregate(...).rename_columns([...])``
    call sites assume pyarrow's keys-first result ordering (true on the
    pinned pyarrow; OLDER releases ordered aggregate columns first, so
    an environment downgrade would silently swap names/types). This
    one-time probe (microseconds) fails the import loudly instead
    (ADVICE r2)."""
    probe = pa.table({"k": [1, 1], "v": [2, 3]}) \
        .group_by("k").aggregate([("v", "sum")])
    if probe.column_names != ["k", "v_sum"]:
        raise RuntimeError(
            "pyarrow group_by result ordering changed (expected keys "
            f"first, got {probe.column_names}); positional "
            "rename_columns call sites are unsafe on this pyarrow")


_assert_groupby_column_order()


# Per-stage stats of the most recent materialized partial pipeline
# (ds.stats() text) — persisted by flagship.run as _stats.txt.
LAST_EXECUTION_STATS = ""

# Above this many partial rows the final merge happens as a Ray
# groupby shuffle; below it, a single driver-side pyarrow group_by (a
# few hundred ms) beats the distributed exchange by an order of
# magnitude. Partial row count = O(blocks × distinct keys), so the
# driver path covers everything but truly huge key spaces.
DRIVER_MERGE_MAX_ROWS = 5_000_000


def _combine_partials(ds, keys: list[str],
                      aggs: list[tuple[str, str]],
                      empty_schema: pa.Schema | None = None,
                      dataset_final: bool = False):
    """Final merge of partial rows → driver-side pa.Table (small key
    spaces) or merged Dataset (unbounded ones).

    aggs: list of (column, fn) with fn in {sum,min,max}; output columns
    keep the partial's name.

    The partials are MATERIALIZED first: they are tiny, and Ray's
    groupby schema probe otherwise re-executes the entire upstream map
    pipeline a second time (observed as a duplicate Aggregate→limit=1
    run in ds.stats()). The merge itself is adaptive: pyarrow on the
    driver when the partials fit comfortably, Dataset.groupby beyond.

    ``dataset_final=True`` callers (unbounded key spaces: content-hash
    dedup, pair lists) get the distributed branch's result back as the
    merged DATASET — O(distinct keys) rows never land on the driver;
    write it or keep streaming. Bounded-key callers (templates, levels,
    hour buckets) keep the table contract.
    """
    ds = ds.materialize()
    # expose the executed plan's per-stage stats (wall time, rows,
    # object-store traffic) for metrics persistence by callers
    global LAST_EXECUTION_STATS
    try:
        LAST_EXECUTION_STATS = ds.stats()
    except Exception:
        LAST_EXECUTION_STATS = ""
    if ds.count() <= DRIVER_MERGE_MAX_ROWS:
        tbl = _to_arrow(ds)
        if any(k not in tbl.column_names for k in keys):
            # Ray canonicalizes fully-empty datasets to schema-less
            # blocks; recover the declared partial schema
            if empty_schema is None:
                raise ValueError(
                    f"empty partials lost schema and no empty_schema "
                    f"given (keys={keys})")
            tbl = empty_schema.empty_table()
        merged = tbl.group_by(keys).aggregate(
            [(col, fn) for col, fn in aggs])
        return merged.rename_columns(keys + [col for col, _ in aggs])

    from ray.data.aggregate import Count, Max, Min, Sum

    fns = {"sum": Sum, "min": Min, "max": Max}
    specs = [fns[fn](col, alias_name=col) for col, fn in aggs]
    if not specs:
        # pure-DISTINCT callers (aggs=[]): Ray's groupby().aggregate()
        # rejects zero aggregation specs, so count and drop it —
        # previously this branch crashed exactly when a distinct key
        # space first exceeded the driver merge bound
        grouped = ds.groupby(keys) \
            .aggregate(Count(alias_name="_distinct_n")) \
            .select_columns(keys)
    else:
        grouped = ds.groupby(keys).aggregate(*specs)
    if dataset_final:
        return grouped
    return _to_arrow(grouped)


# Hour buckets use an impossible sentinel for null (ADVICE r1: -1 is a
# REAL bucket — 1969-12-31T23:00 — so pre-epoch data would be misfiled).
NULL_BUCKET = -(2 ** 62)

# Timestamps cross the Ray shuffle as sentinel-filled int64 micros:
# Ray's Min/Max aggregates round-trip values through Python datetimes and
# break on nullable timestamp columns.
TS_MAX = 2**63 - 1
TS_MIN = -(2**63)


def _ts_us(col, sentinel: int):
    return pc.cast(col, pa.int64()).fill_null(sentinel)


def _us_to_ts(col, sentinel: int):
    return pc.if_else(pc.equal(col, sentinel),
                      pa.scalar(None, type=pa.timestamp("us")),
                      pc.cast(col, pa.timestamp("us")))


def template_counts_partial(batch: pa.Table) -> pa.Table:
    if "params" in batch.column_names:
        n_params = pc.list_value_length(batch.column("params")).cast(pa.int32())
    else:
        # aggregating from routed output (no params column): n_params =
        # wildcard count of the template string — same value by
        # construction (wildcard positions define the params list)
        n_params = pc.count_substring(batch.column("template"),
                                      "<*>").cast(pa.int32())
    t = pa.table({
        "template_hash": batch.column("template_hash"),
        "template": batch.column("template"),
        "ts_min": _ts_us(batch.column("line_ts"), TS_MAX),
        "ts_max": _ts_us(batch.column("line_ts"), TS_MIN),
        "n_params": n_params,
    })
    out = t.group_by(["template_hash", "template", "n_params"]).aggregate(
        [([], "count_all"), ("ts_min", "min"), ("ts_max", "max")]
    )
    return out.rename_columns(
        ["template_hash", "template", "n_params", "count",
         "first_us", "last_us"])


def template_registry(parsed_ds) -> pa.Table:
    """F3 template registry: small aggregate → driver-side pa.Table."""
    partials = parsed_ds.map_batches(template_counts_partial,
                                     batch_format="pyarrow", batch_size=None)
    merged = _combine_partials(
        partials,
        keys=["template_hash", "template", "n_params"],
        aggs=[("count", "sum"), ("first_us", "min"), ("last_us", "max")],
    )
    tbl = merged
    tbl = pa.table({
        "template_hash": tbl.column("template_hash"),
        "template": tbl.column("template"),
        "count": tbl.column("count"),
        "n_params": tbl.column("n_params"),
        "first_ts": _us_to_ts(tbl.column("first_us"), TS_MAX),
        "last_ts": _us_to_ts(tbl.column("last_us"), TS_MIN),
    })
    return tbl.sort_by([("count", "descending"), ("template", "ascending")])


def level_counts(parsed_ds) -> pa.Table:
    def partial(batch: pa.Table) -> pa.Table:
        out = (pa.table({"level": batch.column("level")})
               .group_by("level").aggregate([([], "count_all")]))
        return out.rename_columns(["level", "count"])

    partials = parsed_ds.map_batches(partial, batch_format="pyarrow")
    merged = _combine_partials(partials, keys=["level"],
                               aggs=[("count", "sum")])
    return merged.sort_by("level")


def hour_rollup(parsed_ds) -> pa.Table:
    """Counts per (template_hash, hour bucket) — F4 minus scores."""
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "template_hash": batch.column("template_hash"),
            "bucket": floor_hour(batch.column("line_ts")),
        })
        out = t.group_by(["template_hash", "bucket"]).aggregate([([], "count_all")])
        return out.rename_columns(["template_hash", "bucket", "count"])

    partials = parsed_ds.map_batches(partial, batch_format="pyarrow")
    merged = _combine_partials(partials, keys=["template_hash", "bucket"],
                               aggs=[("count", "sum")])
    return merged.sort_by(
        [("template_hash", "ascending"), ("bucket", "ascending")])


def anomaly_scores(rollup: pa.Table) -> pa.Table:
    """F4: z-score of each (template, bucket) count against the
    template's own bucket-count distribution (reference
    ``detect_anomalies``: z = (x - mean) / std, population std).

    The rollup is a genuinely small aggregate (templates × hours), so
    scoring is a driver-side numpy pass; the heavy lifting (the rollup)
    was distributed.
    """
    h = np.asarray(rollup.column("template_hash"))
    c = np.asarray(rollup.column("count"), dtype=np.float64)
    order = np.argsort(h, kind="stable")
    hs, cs = h[order], c[order]
    # segment boundaries per template
    starts = np.concatenate(([0], np.flatnonzero(hs[1:] != hs[:-1]) + 1, [len(hs)]))
    mean = np.empty_like(cs)
    std = np.empty_like(cs)
    for i in range(len(starts) - 1):
        lo, hi = starts[i], starts[i + 1]
        seg = cs[lo:hi]
        mean[lo:hi] = seg.mean()
        std[lo:hi] = seg.std()
    z = np.where(std > 0, (cs - mean) / np.where(std > 0, std, 1.0), 0.0)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return rollup.append_column("mean_count", pa.array(mean[inv])) \
                 .append_column("std_count", pa.array(std[inv])) \
                 .append_column("anomaly_score", pa.array(z[inv]))


def global_stats(parsed_ds) -> dict:
    """Global count + min/max line_ts (reference get_statistics,
    python/logai_agent.py:513-528)."""
    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("line_ts")
        return pa.table({
            "count": pa.array([batch.num_rows], type=pa.int64()),
            "min_ts": pa.array([pc.min(ts).as_py()], type=pa.timestamp("us")),
            "max_ts": pa.array([pc.max(ts).as_py()], type=pa.timestamp("us")),
        })

    partials = _to_arrow(parsed_ds.map_batches(partial, batch_format="pyarrow"))
    return {
        "count": pc.sum(partials.column("count")).as_py() or 0,
        "min_ts": pc.min(partials.column("min_ts")).as_py(),
        "max_ts": pc.max(partials.column("max_ts")).as_py(),
    }


def grouped_discrete_quantiles(ds, key: str, value_col: str,
                               qs: tuple[float, ...] = (0.5, 0.9)) -> pa.Table:
    """Exact discrete quantiles + distinct count per group, computed as
    a (key, value)-count aggregation (the shuffle moves one row per
    DISTINCT (key, value) pair, never raw rows) + a driver-side
    weighted-quantile pass over the small result.

    Discrete quantile semantics match DuckDB's ``quantile_disc``:
    element at index ceil(n·q)−1 of the sorted values (verified
    empirically against DuckDB across group sizes).
    Reproduces the reference's ``calculate_stats`` median/nunique
    (/root/reference/python/data_analysis_agent.py:161-169).
    """
    def partial(batch: pa.Table) -> pa.Table:
        tt = (pa.table({key: batch.column(key),
                        value_col: batch.column(value_col)})
              .group_by([key, value_col]).aggregate([([], "count_all")]))
        return tt.rename_columns([key, value_col, "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    merged = _combine_partials(partials, keys=[key, value_col],
                               aggs=[("cnt", "sum")])
    merged = merged.sort_by([(key, "ascending"), (value_col, "ascending")])

    keys_np = np.array(merged.column(key).to_pylist())
    vals = np.asarray(merged.column(value_col))
    cnts = np.asarray(merged.column("cnt"))
    out_key, out_nuniq, out_q = [], [], {q: [] for q in qs}
    # segment bounds vectorized (the per-row Python while-loop scanned
    # string equality element-wise over up to 5M merged rows)
    if len(keys_np):
        bounds = np.concatenate(
            [[0], np.flatnonzero(keys_np[1:] != keys_np[:-1]) + 1,
             [len(keys_np)]])
    else:
        bounds = np.array([0], dtype=np.int64)
    for i, j in zip(bounds[:-1], bounds[1:]):
        seg_v, seg_c = vals[i:j], cnts[i:j]
        n = int(seg_c.sum())
        cum = np.cumsum(seg_c)
        out_key.append(keys_np[i])
        out_nuniq.append(int(j - i))
        for q in qs:
            idx = max(int(np.ceil(n * q)) - 1, 0)
            out_q[q].append(seg_v[np.searchsorted(cum, idx + 1)])
    cols = {key: pa.array(out_key),
            "n_distinct": pa.array(out_nuniq, type=pa.int64())}
    for q in qs:
        cols[f"q{int(q * 100)}"] = pa.array(
            np.array(out_q[q]), type=pa.int64())
    return pa.table(cols)


def salted_count(ds, key: str, num_salts: int = 16,
                 empty_schema: pa.Schema | None = None) -> pa.Table:
    """Two-phase SALTED count for hot keys (north-rule skew handling):
    phase 1 groups by (key, salt) where salt is the row's POSITION in
    its batch mod ``num_salts`` — positional, valid only for
    commutative aggregates like counts (ADVICE r1: partials are then
    parallelism-dependent, which a pure count absorbs at the phase-2
    sum; a state-bearing per-(key, salt) aggregate would instead need a
    content-stable salt, e.g. a row-column hash). A Zipfian key's rows
    spread over ``num_salts`` reducers; phase 2 drops the salt and sums.

    NOTE: the per-block combiners used everywhere else in this module
    already neutralize count-path skew (a hot key contributes one
    partial row per block). Salting is the tool for aggregations that
    CANNOT pre-combine per block — e.g. when the per-key state is a
    large structure (exact distinct sets, big reservoirs) rather than a
    commutative scalar; this utility documents and tests the pattern.
    """
    def phase1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        salt = pa.array(np.arange(n, dtype=np.int64) % num_salts)
        t = (pa.table({key: batch.column(key), "salt": salt})
             .group_by([key, "salt"]).aggregate([([], "count_all")]))
        return t.rename_columns([key, "salt", "cnt"])

    schema = empty_schema or pa.schema(
        [(key, pa.string()), ("salt", pa.int64()), ("cnt", pa.int64())])
    salted = _combine_partials(
        ds.map_batches(phase1, batch_format="pyarrow"),
        keys=[key, "salt"], aggs=[("cnt", "sum")], empty_schema=schema)
    # phase 2: drop the salt (driver-side; salted table is small)
    out = (salted.group_by(key).aggregate([("cnt", "sum")])
           .rename_columns([key, "cnt"]))
    return out.sort_by(key)


def top_k_templates(registry: pa.Table, k: int = 5) -> pa.Table:
    """Trending templates (python/logai_agent.py:530-535): top-k by
    count, template string as deterministic tie-break."""
    return registry.sort_by(
        [("count", "descending"), ("template", "ascending")]).slice(0, k)


def combined_partials(batch: pa.Table) -> pa.Table:
    """One composite partial per block covering ALL flagship aggregates
    (template registry, level counts, hour rollup, parse quality) —
    they share a single pass over the parsed stream instead of four.

    Generic layout: kind ∈ {template, level, hour, quality};
    key_str/key_hash/bucket_h are the kind's group key. Group keys are
    sentinel-encoded ('' / -1 / NULL_BUCKET), never null — null group
    keys are implementation-defined in shuffles. bucket_h = hours since
    epoch, NULL_BUCKET when the row has no timestamp.
    """
    parts = []

    t = template_counts_partial(batch)
    parts.append(pa.table({
        "kind": pa.array(["template"] * t.num_rows,
                         type=pa.string()),
        "key_str": t.column("template"),
        "key_hash": t.column("template_hash"),
        "bucket_h": pa.array(np.full(t.num_rows, NULL_BUCKET),
                             type=pa.int64()),
        "n_params": t.column("n_params").cast(pa.int64()),
        "count": t.column("count"),
        "first_us": t.column("first_us"),
        "last_us": t.column("last_us"),
    }))

    lv = (pa.table({"level": batch.column("level")})
          .group_by("level").aggregate([([], "count_all")]))
    parts.append(pa.table({
        "kind": pa.array(["level"] * lv.num_rows,
                         type=pa.string()),
        "key_str": lv.column("level"),
        "key_hash": pa.array(np.full(lv.num_rows, -1), type=pa.int64()),
        "bucket_h": pa.array(np.full(lv.num_rows, NULL_BUCKET),
                             type=pa.int64()),
        "n_params": pa.array(np.full(lv.num_rows, -1), type=pa.int64()),
        "count": lv.column("count_all"),
        "first_us": pa.array(np.full(lv.num_rows, TS_MAX), type=pa.int64()),
        "last_us": pa.array(np.full(lv.num_rows, TS_MIN), type=pa.int64()),
    }))

    bucket_h = pc.divide(
        pc.cast(floor_hour(batch.column("line_ts")), pa.int64()),
        3_600_000_000)
    hr = (pa.table({
        "template_hash": batch.column("template_hash"),
        "bucket_h": bucket_h.fill_null(NULL_BUCKET),
    }).group_by(["template_hash", "bucket_h"]).aggregate([([], "count_all")]))
    parts.append(pa.table({
        "kind": pa.array(["hour"] * hr.num_rows,
                         type=pa.string()),
        "key_str": pa.array([""] * hr.num_rows, type=pa.string()),
        "key_hash": hr.column("template_hash"),
        "bucket_h": hr.column("bucket_h"),
        "n_params": pa.array(np.full(hr.num_rows, -1), type=pa.int64()),
        "count": hr.column("count_all"),
        "first_us": pa.array(np.full(hr.num_rows, TS_MAX), type=pa.int64()),
        "last_us": pa.array(np.full(hr.num_rows, TS_MIN), type=pa.int64()),
    }))

    ok = pc.sum(pc.cast(batch.column("parse_ok"), pa.int64())).as_py() or 0
    parts.append(pa.table({
        "kind": pa.array(["quality", "quality"]),
        "key_str": pa.array(["rows", "parse_ok"]),
        "key_hash": pa.array([-1, -1], type=pa.int64()),
        "bucket_h": pa.array([NULL_BUCKET, NULL_BUCKET], type=pa.int64()),
        "n_params": pa.array([-1, -1], type=pa.int64()),
        "count": pa.array([batch.num_rows, ok], type=pa.int64()),
        "first_us": pa.array([TS_MAX, TS_MAX], type=pa.int64()),
        "last_us": pa.array([TS_MIN, TS_MIN], type=pa.int64()),
    }))
    return pa.concat_tables(parts)


def combined_aggregates(parsed_ds) -> dict:
    """Single-pass flagship aggregates → dict of small driver tables."""
    partials = parsed_ds.map_batches(combined_partials, batch_format="pyarrow", batch_size=None)
    return finalize_combined(partials)


def finalize_combined(partials_ds) -> dict:
    """Merge already-computed combined-partial blocks (e.g. emitted by
    the fused route+aggregate stage) into the final small tables."""
    merged = _combine_partials(
        partials_ds,
        keys=["kind", "key_str", "key_hash", "bucket_h", "n_params"],
        aggs=[("count", "sum"), ("first_us", "min"), ("last_us", "max")],
        empty_schema=pa.schema([
            ("kind", pa.string()), ("key_str", pa.string()),
            ("key_hash", pa.int64()), ("bucket_h", pa.int64()),
            ("n_params", pa.int64()), ("count", pa.int64()),
            ("first_us", pa.int64()), ("last_us", pa.int64()),
        ]),
    )
    tbl = merged

    def part(kind: str) -> pa.Table:
        return tbl.filter(pc.equal(tbl.column("kind"), kind))

    tpl = part("template")
    registry = pa.table({
        "template_hash": tpl.column("key_hash"),
        "template": tpl.column("key_str"),
        "count": tpl.column("count"),
        "n_params": tpl.column("n_params").cast(pa.int32()),
        "first_ts": _us_to_ts(tpl.column("first_us"), TS_MAX),
        "last_ts": _us_to_ts(tpl.column("last_us"), TS_MIN),
    }).sort_by([("count", "descending"), ("template", "ascending")])

    lv = part("level")
    levels = pa.table({
        "level": lv.column("key_str"),
        "count": lv.column("count"),
    }).sort_by("level")

    hr = part("hour")
    rollup = pa.table({
        "template_hash": hr.column("key_hash"),
        "bucket": pc.if_else(
            pc.equal(hr.column("bucket_h"), NULL_BUCKET),
            pa.scalar(None, type=pa.timestamp("us")),
            pc.multiply(hr.column("bucket_h"), 3_600_000_000)
              .cast(pa.timestamp("us"))),
        "count": hr.column("count"),
    }).sort_by([("template_hash", "ascending"), ("bucket", "ascending")])

    q = part("quality")
    qd = dict(zip(q.column("key_str").to_pylist(),
                  q.column("count").to_pylist()))
    quality = {"rows": qd.get("rows", 0), "parse_ok": qd.get("parse_ok", 0),
               "parse_failed": qd.get("rows", 0) - qd.get("parse_ok", 0)}

    return {"registry": registry, "levels": levels,
            "rollup": anomaly_scores(rollup), "quality": quality}


def _to_arrow(ds) -> pa.Table:
    """Collect a SMALL dataset to a single driver-side Arrow table.
    Zero-row blocks are kept when they are all there is — the schema
    must survive an empty dataset (empty-corpus robustness).

    Materializes first: on a lazy dataset, ``to_arrow_refs`` follows a
    schema probe that re-executes the whole upstream plan a second time
    under limit=1 (observed as a duplicate full run in ds.stats())."""
    import ray

    ds = ds.materialize()
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    nonempty = [p for p in parts if p.num_rows]
    use = nonempty or parts[:1]
    if not use:
        return pa.table({})
    return pa.concat_tables(use, promote_options="default").combine_chunks()


def merge_registries(parts: list[pa.Table]) -> pa.Table:
    """Merge template registries from separate flagship runs (the
    incremental-ingest story: the reference upserts each batch into its
    template store — here registries are mergeable values: counts sum,
    first/last timestamps min/max, identity = (template_hash, template,
    n_params)). merge(run(A), run(B)) == run(A ∪ B) exactly, provided
    the runs shared a template mapping (flagship persists and reuses
    the mapping across resumed/incremental runs for this reason)."""
    t = pa.concat_tables(parts, promote_options="default")
    tt = pa.table({
        "template_hash": t.column("template_hash"),
        "template": t.column("template"),
        "n_params": t.column("n_params"),
        "count": t.column("count"),
        "first_us": _ts_us(t.column("first_ts"), TS_MAX),
        "last_us": _ts_us(t.column("last_ts"), TS_MIN),
    }).group_by(["template_hash", "template", "n_params"]).aggregate(
        [("count", "sum"), ("first_us", "min"), ("last_us", "max")]) \
        .rename_columns(["template_hash", "template", "n_params",
                         "count", "first_us", "last_us"])
    out = pa.table({
        "template_hash": tt.column("template_hash"),
        "template": tt.column("template"),
        "count": tt.column("count"),
        "n_params": tt.column("n_params"),
        "first_ts": _us_to_ts(tt.column("first_us"), TS_MAX),
        "last_ts": _us_to_ts(tt.column("last_us"), TS_MIN),
    })
    return out.sort_by([("count", "descending"), ("template", "ascending")])


def merge_rollups(parts: list[pa.Table]) -> pa.Table:
    """Merge hourly rollups from separate runs (counts sum per
    (template_hash, bucket)); z-scores are recomputed over the merged
    counts since they are a global statistic."""
    t = pa.concat_tables(
        [p.select(["template_hash", "bucket", "count"]) for p in parts],
        promote_options="default")
    tt = pa.table({
        "template_hash": t.column("template_hash"),
        "bucket_us": _ts_us(t.column("bucket"), TS_MIN),
        "count": t.column("count"),
    }).group_by(["template_hash", "bucket_us"]).aggregate(
        [("count", "sum")]) \
        .rename_columns(["template_hash", "bucket_us", "count"])
    merged = pa.table({
        "template_hash": tt.column("template_hash"),
        "bucket": _us_to_ts(tt.column("bucket_us"), TS_MIN),
        "count": tt.column("count"),
    }).sort_by([("template_hash", "ascending"), ("bucket", "ascending")])
    return anomaly_scores(merged)
