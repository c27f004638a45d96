"""Custom join operators Ray Data lacks natively.

As-of join (each left row matched to the LATEST right row with the
same key and right_ts <= left_ts): implemented as a broadcast lookup —
the right side is sorted by (key, ts) once, shipped via ``ray.put``,
and every batch probes it with two vectorized ``np.searchsorted``
passes over a rank-compressed composite key (no per-row Python).

Partitioning assumption (documented per task brief): the broadcast
path assumes the RIGHT side fits in worker memory (dimension-table
shaped — orders, price histories, config snapshots). When both sides
are huge, ``asof_join_partitioned`` hash-partitions both on the join
key (side-tagged union → one ``groupby(pkey).map_groups`` shuffle)
and runs the identical composite-rank probe inside each partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def build_asof_index(right: pa.Table, key_col: str, ts_col: str,
                     tiebreak_col: str | None = None) -> dict:
    """Sorted right-side index for as-of probes.

    Rows are deduplicated to one per (key, ts) — the row with the
    greatest ``tiebreak_col`` (falling back to input position) wins —
    so the match is deterministic on both engines regardless of input
    order (SQL mirror: row_number() OVER (PARTITION BY key, ts ORDER BY
    tiebreak DESC) = 1). BOTH keys and timestamps are rank-compressed
    against the right side's distinct values, so (key, ts) packs into
    one int64 composite per row with no overflow for any key domain
    (hash-derived 63-bit keys included: the composite is bounded by
    n_distinct_keys × (n_distinct_ts + 2)).
    """
    t = right.combine_chunks()
    keys = np.asarray(t.column(key_col), dtype=np.int64)
    ts = np.asarray(pc.cast(t.column(ts_col), pa.int64()), dtype=np.int64)
    tie = (np.asarray(t.column(tiebreak_col), dtype=np.int64)
           if tiebreak_col else np.arange(len(keys), dtype=np.int64))
    order = np.lexsort((tie, ts, keys))
    keys, ts = keys[order], ts[order]
    # dedup (key, ts): keep the LAST occurrence in sort order
    if len(keys):
        is_last = np.concatenate(
            [(keys[1:] != keys[:-1]) | (ts[1:] != ts[:-1]), [True]])
    else:
        is_last = np.zeros(0, dtype=bool)
    keep = order[is_last]
    keys, ts = keys[is_last], ts[is_last]
    uniq_ts = np.unique(ts)
    uniq_keys = np.unique(keys)
    base = np.int64(len(uniq_ts) + 2)
    key_ranks = np.searchsorted(uniq_keys, keys).astype(np.int64)
    ranks = np.searchsorted(uniq_ts, ts, side="right").astype(np.int64)
    return {
        "composite": key_ranks * base + ranks,  # sorted ascending
        "keys": keys,
        "uniq_keys": uniq_keys,
        "uniq_ts": uniq_ts,
        "base": base,
        "table": t.take(pa.array(keep, type=pa.int64())),
    }


def asof_probe(index: dict, left_keys: np.ndarray,
               left_ts: np.ndarray) -> np.ndarray:
    """Row index into ``index['table']`` of each left row's as-of match
    (-1 = no right row at or before left_ts for that key)."""
    if len(index["keys"]) == 0:
        return np.full(len(left_keys), -1, dtype=np.int64)
    ranks = np.searchsorted(index["uniq_ts"], left_ts,
                            side="right").astype(np.int64)
    key_ranks = np.searchsorted(index["uniq_keys"],
                                left_keys).astype(np.int64)
    # keys absent from the right side get a neighbor's rank; the final
    # exact-key check rejects those matches
    key_ranks = np.minimum(key_ranks, len(index["uniq_keys"]) - 1)
    composite = key_ranks * index["base"] + ranks
    pos = np.searchsorted(index["composite"], composite,
                          side="right") - 1
    valid = (pos >= 0) & (index["keys"][np.maximum(pos, 0)] == left_keys)
    return np.where(valid, pos, -1)


class AsOfLookup:
    """map_batches stage: append right-side columns as-of each left
    row. The index is broadcast once (``ray.put``) and rebuilt per
    actor/worker from the shared object — never per batch."""

    def __init__(self, index_ref, left_key: str, left_ts: str,
                 take_cols: list[str], suffix: str = ""):
        import ray

        self.index = (ray.get(index_ref)
                      if isinstance(index_ref, ray.ObjectRef) else index_ref)
        self.left_key = left_key
        self.left_ts = left_ts
        self.take_cols = take_cols
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(self.left_key), dtype=np.int64)
        ts = np.asarray(pc.cast(batch.column(self.left_ts), pa.int64()),
                        dtype=np.int64)
        pos = asof_probe(self.index, keys, ts)
        out = batch
        if self.index["table"].num_rows == 0:
            # empty right side: all-null columns (take would raise)
            for c in self.take_cols:
                col = self.index["table"].column(c)
                out = out.append_column(
                    c + self.suffix, pa.nulls(batch.num_rows, col.type))
            return out
        idx = pa.array(np.where(pos >= 0, pos, 0), type=pa.int64())
        mask = pa.array(pos >= 0)
        for c in self.take_cols:
            col = self.index["table"].column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            taken = pc.if_else(mask, col.take(idx),
                               pa.scalar(None, type=col.type))
            out = out.append_column(c + self.suffix, taken)
        return out


# Below this right-table size the lookup ships as a task closure
# (no actor-pool spin-up, ~1-2 s saved per invocation); above it the
# index is ray.put once and actors fetch it from the object store.
BROADCAST_CLOSURE_MAX_BYTES = 64 * 2 ** 20


def asof_join_broadcast(left_ds, right: pa.Table, *, left_key: str,
                        left_ts: str, right_key: str, right_ts: str,
                        take_cols: list[str], tiebreak_col: str | None = None,
                        concurrency=2):
    """Left as-of join against a broadcast right table (see module
    docstring for the large-right partitioned variant)."""
    import ray

    index = build_asof_index(right, right_key, right_ts, tiebreak_col)
    if right.nbytes <= BROADCAST_CLOSURE_MAX_BYTES:
        stage = AsOfLookup(index, left_key, left_ts, take_cols)
        return left_ds.map_batches(stage, batch_format="pyarrow")
    ref = ray.put(index)
    return left_ds.map_batches(
        AsOfLookup, fn_constructor_args=(ref, left_key, left_ts,
                                         take_cols),
        concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow")


def _hash_partition_ids(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic 64-bit mix → partition id (salt-free: the as-of
    key domain is already integer; skew handling is the caller's
    num_partitions choice)."""
    h = keys.astype(np.uint64)
    h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def asof_join_partitioned(left_ds, right_ds, *, left_key: str,
                          left_ts: str, right_key: str, right_ts: str,
                          take_cols: list[str], tiebreak_col: str,
                          num_partitions: int = 64):
    """Big-big as-of join: BOTH sides are Datasets too large to
    broadcast. Each side maps to a shared-schema form tagged with a
    hash partition id of its join key, the union is co-located with
    ONE groupby shuffle, and the identical composite-rank probe
    (build_asof_index/asof_probe) runs independently inside every
    partition — the same pattern order_priority_revenue proves for
    equi-joins. Output rows: all left columns + ``take_cols``
    (null when no right row at or before the left timestamp).

    ``tiebreak_col`` is REQUIRED here (unlike the broadcast path,
    where input position is a usable fallback): rows are shuffled, so
    only an explicit column makes (key, ts)-duplicate resolution
    deterministic. Partitioning assumption: a single join key's rows
    fit in one worker (per-key state, not per-partition, is the true
    bound — the probe is O(n log n) in partition rows).
    """
    if tiebreak_col is None:
        raise ValueError("asof_join_partitioned requires tiebreak_col")

    ls = left_ds.schema()
    overlap = set(take_cols) & set(ls.names)
    if overlap:
        # must cover EVERY left payload column, not just the keys —
        # a clobbered payload name fails much later inside the
        # shuffle with a schema-arity error (round-4 review finding)
        raise ValueError(f"take_cols collide with left columns: {overlap}")

    payload_cols = list(ls.names)
    payload_types = dict(zip(ls.names, ls.types))
    rs = right_ds.schema()
    right_types = dict(zip(rs.names, rs.types))
    take_types = {c: right_types[c] for c in take_cols}

    out_schema = pa.schema(
        [pa.field(c, payload_types[c]) for c in payload_cols]
        + [pa.field(c, take_types[c]) for c in take_cols])

    def to_left(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column(left_key), dtype=np.int64)
        cols = {
            "_pkey": pa.array(_hash_partition_ids(keys, num_partitions)),
            "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "_key": pa.array(keys, type=pa.int64()),
            "_ts": pc.cast(t.column(left_ts), pa.int64()),
            "_tie": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        }
        for c in payload_cols:
            cols[c] = t.column(c)
        for c in take_cols:
            cols[c] = pa.nulls(t.num_rows, take_types[c])
        return pa.table(cols)

    def to_right(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column(right_key), dtype=np.int64)
        cols = {
            "_pkey": pa.array(_hash_partition_ids(keys, num_partitions)),
            "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "_key": pa.array(keys, type=pa.int64()),
            "_ts": pc.cast(t.column(right_ts), pa.int64()),
            "_tie": pc.cast(t.column(tiebreak_col), pa.int64()),
        }
        for c in payload_cols:
            cols[c] = pa.nulls(t.num_rows, payload_types[c])
        for c in take_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    tagged = (left_ds.map_batches(to_left, batch_format="pyarrow")
              .union(right_ds.map_batches(to_right,
                                          batch_format="pyarrow")))

    def part_asof(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = np.asarray(group.column("_side"))
        right_t = group.filter(pa.array(side == 0)) \
            .select(["_key", "_ts", "_tie"] + take_cols)
        left_t = group.filter(pa.array(side == 1))
        if left_t.num_rows == 0:
            return out_schema.empty_table()
        index = build_asof_index(right_t, "_key", "_ts",
                                 tiebreak_col="_tie")
        pos = asof_probe(index,
                         np.asarray(left_t.column("_key"), dtype=np.int64),
                         np.asarray(left_t.column("_ts"), dtype=np.int64))
        out_cols = {c: left_t.column(c) for c in payload_cols}
        if index["table"].num_rows == 0:
            for c in take_cols:
                out_cols[c] = pa.nulls(left_t.num_rows, take_types[c])
        else:
            idx = pa.array(np.where(pos >= 0, pos, 0), type=pa.int64())
            mask = pa.array(pos >= 0)
            for c in take_cols:
                col = index["table"].column(c)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                out_cols[c] = pc.if_else(mask, col.take(idx),
                                         pa.scalar(None, type=col.type))
        return pa.table(out_cols, schema=out_schema)

    return tagged.groupby("_pkey").map_groups(part_asof,
                                              batch_format="pyarrow")
# right-side intervals [start, end) sharing its key that contain its
# timestamp. Broadcast interval-stabbing: per key, the number of
# containing intervals is (#starts <= t) - (#ends <= t), each computed
# with two vectorized searchsorted passes over a rank-compressed
# composite array — no per-row Python, no join blow-up (counts, not
# pairs, cross the stage). Same partitioning note as the as-of join:
# broadcast assumes a dimension-shaped right side; for huge right
# sides hash-partition both on the key and run the identical probe per
# partition.
# ---------------------------------------------------------------------------


def _rank_composite(keys: np.ndarray, vals: np.ndarray,
                    uniq_keys: np.ndarray):
    """(key, val) → sorted int64 composite with BOTH sides
    rank-compressed (overflow-safe for any key domain); returns
    (sorted composite, uniq vals, base)."""
    uniq = np.unique(vals)
    base = np.int64(len(uniq) + 2)
    key_ranks = np.searchsorted(uniq_keys, keys).astype(np.int64)
    ranks = np.searchsorted(uniq, vals, side="right").astype(np.int64)
    comp = np.sort(key_ranks * base + ranks)
    return comp, uniq, base


def build_interval_index(right: pa.Table, key_col: str, start_col: str,
                         end_col: str) -> dict:
    t = right.combine_chunks()
    keys = np.asarray(t.column(key_col), dtype=np.int64)
    starts = np.asarray(pc.cast(t.column(start_col), pa.int64()),
                        dtype=np.int64)
    ends = np.asarray(pc.cast(t.column(end_col), pa.int64()),
                      dtype=np.int64)
    uniq_keys = np.unique(keys)
    s_comp, s_uniq, s_base = _rank_composite(keys, starts, uniq_keys)
    e_comp, e_uniq, e_base = _rank_composite(keys, ends, uniq_keys)
    return {"s_comp": s_comp, "s_uniq": s_uniq, "s_base": s_base,
            "e_comp": e_comp, "e_uniq": e_uniq, "e_base": e_base,
            "uniq_keys": uniq_keys}


def _count_leq(comp: np.ndarray, uniq: np.ndarray, base: np.int64,
               key_ranks: np.ndarray, hit: np.ndarray,
               ts: np.ndarray) -> np.ndarray:
    """Per left row: number of right rows with the same key and value
    <= ts (vectorized; the key's block is isolated by subtracting the
    rank-0 position)."""
    ranks = np.searchsorted(uniq, ts, side="right").astype(np.int64)
    hi = np.searchsorted(comp, key_ranks * base + ranks, side="right")
    lo = np.searchsorted(comp, key_ranks * base, side="left")
    return np.where(hit, hi - lo, 0)


def interval_overlap_counts(index: dict, keys: np.ndarray,
                            ts: np.ndarray) -> np.ndarray:
    """#intervals [start, end) with the row's key containing ts."""
    uk = index["uniq_keys"]
    if len(uk) == 0:
        return np.zeros(len(keys), dtype=np.int64)
    key_ranks = np.searchsorted(uk, keys).astype(np.int64)
    in_range = key_ranks < len(uk)
    key_ranks = np.minimum(key_ranks, len(uk) - 1)
    hit = in_range & (uk[key_ranks] == keys)
    n_started = _count_leq(index["s_comp"], index["s_uniq"],
                           index["s_base"], key_ranks, hit, ts)
    n_ended = _count_leq(index["e_comp"], index["e_uniq"],
                         index["e_base"], key_ranks, hit, ts)
    return n_started - n_ended


class IntervalCountLookup:
    """map_batches stage: append ``n_overlap`` per left row (broadcast
    interval index fetched once per actor)."""

    def __init__(self, index_ref, left_key: str, left_ts: str):
        import ray

        self.index = (ray.get(index_ref)
                      if isinstance(index_ref, ray.ObjectRef) else index_ref)
        self.left_key = left_key
        self.left_ts = left_ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(self.left_key), dtype=np.int64)
        ts = np.asarray(pc.cast(batch.column(self.left_ts), pa.int64()),
                        dtype=np.int64)
        n = interval_overlap_counts(self.index, keys, ts)
        return batch.append_column("n_overlap",
                                   pa.array(n, type=pa.int64()))


def interval_join_count_broadcast(left_ds, right: pa.Table, *,
                                  left_key: str, left_ts: str,
                                  right_key: str, start_col: str,
                                  end_col: str, concurrency=2):
    import ray

    index = build_interval_index(right, right_key, start_col, end_col)
    if right.nbytes <= BROADCAST_CLOSURE_MAX_BYTES:
        stage = IntervalCountLookup(index, left_key, left_ts)
        return left_ds.map_batches(stage, batch_format="pyarrow")
    ref = ray.put(index)
    return left_ds.map_batches(
        IntervalCountLookup, fn_constructor_args=(ref, left_key, left_ts),
        concurrency=concurrency, num_cpus=0.5, batch_format="pyarrow")


def _salt_slots(u64: np.ndarray, salt: int) -> np.ndarray:
    """Per-row salt slot for skew splitting: a second independent mix
    of the key hash with the row's position, so a hot key's PROBE rows
    spread across ``salt`` slots while cold keys pay nothing. Any
    assignment is correct (each left row still meets the full build
    rows for its key — they are replicated to every slot); the mix
    only balances load."""
    pos = np.arange(len(u64), dtype=np.uint64)
    h = (u64 ^ (pos * np.uint64(0x9E3779B97F4A7C15)))
    h = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
    return (h % np.uint64(salt)).astype(np.int64)


def partitioned_lookup_join(left_ds, right_ds, *, left_key: str,
                            right_key: str, take_cols: list[str],
                            num_partitions: int = 64,
                            right_combine: list | None = None,
                            join_type: str = "inner",
                            emit_key: str | None = None,
                            left_schema: pa.Schema | None = None,
                            right_schema: pa.Schema | None = None,
                            salt: int = 1):
    """Big-big equi-join for a right side UNIQUE per key (dimension
    lookup at fact scale — orders for lineitem, customer for order
    partials); keys may be INTEGER or STRING (domains, urls, langs):
    hash-partition co-location (side-tagged union → ONE
    groupby shuffle on the partition id) + a vectorized Acero hash
    join inside each partition. Unlike a per-key map_groups reducer,
    the Python boundary is crossed ``num_partitions`` times, not
    |distinct keys| times — at 10⁹ keys that is the difference between
    a C++ join and 10⁹ interpreter calls.

    Output: all left columns + ``take_cols``. ``join_type`` is
    "inner" (default), "left outer" (unmatched left rows keep nulls in
    ``take_cols``) or "full outer" (additionally keeps unmatched RIGHT
    rows with nulls in the left payload; pass ``emit_key`` to get the
    COALESCEd join key as a leading output column — without it,
    right-only rows are unidentifiable). Partitioning assumption: one
    partition's rows
    fit in a worker; raise ``num_partitions`` for bigger inputs (it
    only adds tasks).

    Pass ``left_schema``/``right_schema`` when the input is a lazy
    chain: ``Dataset.schema()`` on one schema-probes by EXECUTING the
    upstream plan (Ray 2.49), which doubles the cost of a chained
    join.

    ``right_combine`` — list of (take_col, "sum"|"min"|"max") — lets
    the right side arrive as NON-unique per-block PARTIALS: each
    partition folds them to one row per key (group_by _key) before the
    Acero join. This removes the separate pre-aggregation shuffle a
    caller would otherwise pay (two all-to-all exchanges become one);
    it is exact for decomposable aggregates because partition =
    key-complete. Without it the right side must be unique per key.

    ``salt`` > 1 is the HOT-KEY switch: left (probe) rows of a key
    spread across ``salt`` sub-partitions via a second hash mix, and
    the right (build) rows are replicated into every sub-partition —
    a key holding 50 % of the fact table stops pinning one worker at
    the cost of salt× the (small, unique-per-key) build rows. Not
    available for "full outer": an unmatched right key would emit one
    row per replica."""
    if join_type not in ("inner", "left outer", "full outer"):
        # an unknown type would pass through to Arrow in mixed
        # partitions but silently degrade to inner in empty-side ones
        raise ValueError(f"unsupported join_type {join_type!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if salt > 1 and join_type == "full outer":
        raise ValueError("salt > 1 cannot preserve full-outer "
                         "semantics (replicated right rows would "
                         "duplicate unmatched-right output)")
    if right_combine is not None:
        combined = {c for c, _ in right_combine}
        if combined != set(take_cols):
            # a strict subset would drop the non-combined take_cols in
            # the per-partition fold and KeyError inside map_groups
            raise ValueError(
                "right_combine must cover every take_col exactly: "
                f"combined={sorted(combined)} take_cols={take_cols}")
        if salt > 1:
            raise ValueError("right_combine with salt>1 would "
                             "replicate partials into sub-partitions "
                             "and over-count")
    ls = left_schema or left_ds.schema()
    payload_cols = list(ls.names)
    payload_types = dict(zip(ls.names, ls.types))
    rs = right_schema or right_ds.schema()
    right_types = dict(zip(rs.names, rs.types))
    take_types = {c: right_types[c] for c in take_cols}
    overlap = set(take_cols) & set(payload_cols)
    if overlap:
        raise ValueError(f"take_cols collide with left columns: {overlap}")
    if emit_key and emit_key in set(payload_cols) | set(take_cols):
        raise ValueError(f"emit_key {emit_key!r} collides with a "
                         "payload/take column")
    key_is_str = pa.types.is_string(payload_types[left_key]) \
        or pa.types.is_large_string(payload_types[left_key])
    key_type = pa.string() if key_is_str else pa.int64()

    def _pkey_and_key(col):
        """Partition ids + canonical key column for INT or STRING
        keys: the column is cast to the canonical key type FIRST and
        the hash runs on the cast values — both sides must take the
        same hash path or equal-after-cast keys land in different
        partitions and matches silently vanish (string hashes via
        bloomjoin's vectorized polars path; no per-row Python). The
        join itself runs on the cast values, so hash collisions only
        co-locate, never mis-join."""
        from .bloomjoin import _column_to_u64

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(key_type)
        u64, _ = _column_to_u64(col)
        pkey = _hash_partition_ids(u64.view(np.int64), num_partitions)
        return pkey, col, u64

    def to_left(t: pa.Table) -> pa.Table:
        pkey, key, u64 = _pkey_and_key(t.column(left_key))
        if salt > 1:
            pkey = pkey * salt + _salt_slots(u64, salt)
        cols = {"_pkey": pa.array(pkey),
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "_key": key}
        for c in payload_cols:
            cols[c] = t.column(c)
        for c in take_cols:
            cols[c] = pa.nulls(t.num_rows, take_types[c])
        return pa.table(cols)

    def to_right(t: pa.Table) -> pa.Table:
        pkey, key, _ = _pkey_and_key(t.column(right_key))
        cols = {"_pkey": pa.array(pkey * salt if salt > 1 else pkey),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "_key": key}
        for c in payload_cols:
            cols[c] = pa.nulls(t.num_rows, payload_types[c])
        for c in take_cols:
            cols[c] = t.column(c)
        out = pa.table(cols)
        if salt > 1:                      # replicate build rows into
            reps = [out]                  # every salt sub-partition
            base = np.asarray(out.column("_pkey"), dtype=np.int64)
            for j in range(1, salt):
                reps.append(out.set_column(
                    0, "_pkey", pa.array(base + j)))
            out = pa.concat_tables(reps)
        return out

    out_cols = ([emit_key] if emit_key else []) + payload_cols + take_cols
    out_schema = pa.schema(
        ([pa.field(emit_key, key_type)] if emit_key else [])
        + [pa.field(c, payload_types[c]) for c in payload_cols]
        + [pa.field(c, take_types[c]) for c in take_cols])

    tagged = (left_ds.map_batches(to_left, batch_format="pyarrow")
              .union(right_ds.map_batches(to_right,
                                          batch_format="pyarrow")))

    def part_join(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = np.asarray(group.column("_side"))
        left_t = group.filter(pa.array(side == 1)) \
            .select(["_key"] + payload_cols)
        right_t = group.filter(pa.array(side == 0)) \
            .select(["_key"] + take_cols)
        if right_combine is not None and right_t.num_rows > 0:
            gt = right_t.group_by("_key").aggregate(right_combine)
            # rename by NAME (col_agg → col), never positionally —
            # pyarrow's aggregate-column ordering differs by version
            ren = {f"{c}_{fn}": c for c, fn in right_combine}
            right_t = gt.rename_columns(
                [ren.get(c, c) for c in gt.column_names]) \
                .select(["_key"] + take_cols)
        if left_t.num_rows == 0:
            if join_type != "full outer" or right_t.num_rows == 0:
                return out_schema.empty_table()
            joined = right_t
            for c in payload_cols:
                joined = joined.append_column(
                    c, pa.nulls(joined.num_rows, payload_types[c]))
        elif right_t.num_rows == 0:
            if join_type == "inner":
                return out_schema.empty_table()
            joined = left_t
            for c in take_cols:
                joined = joined.append_column(
                    c, pa.nulls(joined.num_rows, take_types[c]))
        else:
            # Arrow coalesces "_key" across sides for full outer
            joined = left_t.join(right_t, keys="_key",
                                 join_type=join_type)
        if emit_key:
            joined = joined.rename_columns(
                [emit_key if c == "_key" else c for c in
                 joined.column_names])
        return joined.select(out_cols).cast(out_schema)

    return tagged.groupby("_pkey").map_groups(part_join,
                                              batch_format="pyarrow")


def interval_join_count_partitioned(left_ds, right_ds, *, left_key: str,
                                    left_ts: str, right_key: str,
                                    start_col: str, end_col: str,
                                    num_partitions: int = 64,
                                    left_schema: pa.Schema | None = None,
                                    right_schema: pa.Schema | None = None):
    """Big-big range join (interval-containment COUNTS): the
    partitioned twin of interval_join_count_broadcast, for a right
    side too large to broadcast. Same co-location recipe as
    asof_join_partitioned — shared-schema side tagging, ONE groupby
    shuffle on the key-hash partition id — and the identical
    interval-stabbing probe (build_interval_index /
    interval_overlap_counts: #starts≤t − #ends≤t per key, four
    searchsorted passes) runs independently inside each partition.
    Output: all left columns + ``n_overlap``. Partitioning assumption:
    one key's intervals and probes fit in a worker.

    Pass ``left_schema``/``right_schema`` for lazy chains —
    Dataset.schema() would schema-probe by executing the upstream
    plan (Ray 2.49)."""
    ls = left_schema or left_ds.schema()
    payload_cols = list(ls.names)
    payload_types = dict(zip(ls.names, ls.types))

    out_schema = pa.schema(
        [pa.field(c, payload_types[c]) for c in payload_cols]
        + [pa.field("n_overlap", pa.int64())])

    def to_left(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column(left_key), dtype=np.int64)
        cols = {
            "_pkey": pa.array(_hash_partition_ids(keys, num_partitions)),
            "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "_key": pa.array(keys, type=pa.int64()),
            "_ts": pc.cast(t.column(left_ts), pa.int64()),
            "_start": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "_end": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        }
        for c in payload_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    def to_right(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column(right_key), dtype=np.int64)
        cols = {
            "_pkey": pa.array(_hash_partition_ids(keys, num_partitions)),
            "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "_key": pa.array(keys, type=pa.int64()),
            "_ts": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "_start": pc.cast(t.column(start_col), pa.int64()),
            "_end": pc.cast(t.column(end_col), pa.int64()),
        }
        for c in payload_cols:
            cols[c] = pa.nulls(t.num_rows, payload_types[c])
        return pa.table(cols)

    tagged = (left_ds.map_batches(to_left, batch_format="pyarrow")
              .union(right_ds.map_batches(to_right,
                                          batch_format="pyarrow")))

    def part_count(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = np.asarray(group.column("_side"))
        left_t = group.filter(pa.array(side == 1))
        if left_t.num_rows == 0:
            return out_schema.empty_table()
        right_t = group.filter(pa.array(side == 0))
        ivals = pa.table({"k": right_t.column("_key"),
                          "s": right_t.column("_start"),
                          "e": right_t.column("_end")})
        index = build_interval_index(ivals, "k", "s", "e")
        keys = np.asarray(left_t.column("_key"), dtype=np.int64)
        ts = np.asarray(left_t.column("_ts"), dtype=np.int64)
        n = interval_overlap_counts(index, keys, ts)
        out = left_t.select(payload_cols).append_column(
            "n_overlap", pa.array(n, type=pa.int64()))
        return out.cast(out_schema)

    return tagged.groupby("_pkey").map_groups(part_count,
                                              batch_format="pyarrow")


BROADCAST_JOIN_MAX_ROWS = 2_000_000


def lookup_join_auto(left_ds, right_ds, *, left_key: str,
                     right_key: str, take_cols: list[str],
                     join_type: str = "inner",
                     broadcast_max_rows: int | None = None,
                     **partitioned_kw):
    """Cost-based equi-join path selection (the planner decision every
    engine makes): count the build side — a metadata-only count for
    parquet inputs — and

    - ≤ ``broadcast_max_rows``: BROADCAST it (one `ray.put`, a
      per-block Acero hash join inside map_batches — zero shuffle of
      the probe side, the right answer whenever a dimension table
      fits in a worker heap);
    - larger: fall back to the hash-partitioned shuffle join
      (partitioned_lookup_join, with its salt/outer options).

    Returns (dataset, chosen_path) so callers/tests can assert the
    decision. Parity between the two paths is pytest-pinned.

    Semantics that the per-block broadcast join CANNOT honor force
    the partitioned path regardless of size: "full outer" (a
    per-block outer join would emit every right row once per left
    block) and ``salt`` (meaningless without a shuffle, and its
    full-outer interaction is validated there). ``right_combine`` IS
    honored on the broadcast path by folding the collected partials
    driver-side before the ray.put."""
    import ray

    limit = (BROADCAST_JOIN_MAX_ROWS if broadcast_max_rows is None
             else broadcast_max_rows)
    broadcast_incompatible = (
        join_type == "full outer"
        or partitioned_kw.get("salt", 1) != 1
        or partitioned_kw.get("emit_key") is not None)
    n_right = None if broadcast_incompatible else right_ds.count()
    if broadcast_incompatible or n_right > limit:
        return partitioned_lookup_join(
            left_ds, right_ds, left_key=left_key, right_key=right_key,
            take_cols=take_cols, join_type=join_type,
            **partitioned_kw), "partitioned"

    # materialize the (small) build side once, broadcast by ref
    rows = right_ds.select_columns([right_key] + take_cols)
    from . import aggregate as _agg
    right_t = _agg._to_arrow(rows)
    right_combine = partitioned_kw.get("right_combine")
    if right_combine:
        # fold non-unique per-block partials to one row per key —
        # the same exactness contract the partitioned path provides
        # in-partition; skipping this multiplied output rows and
        # returned unsummed partials (round-4 review finding)
        combined = {c for c, _ in right_combine}
        if combined != set(take_cols):
            # a non-combined take_col would be DROPPED by the fold and
            # fail later inside a remote task; demand exact coverage
            # up front (round-4 review finding)
            raise ValueError(
                "right_combine must cover every take_col exactly: "
                f"combined={sorted(combined)} take_cols={take_cols}")
        gt = right_t.group_by([right_key]).aggregate(
            [(c, fn) for c, fn in right_combine])
        # rename BY NAME ("{col}_{fn}" -> col) — positional rename
        # breaks on pyarrow versions that order aggregates before keys
        mapping = {f"{c}_{fn}": c for c, fn in right_combine}
        gt = gt.rename_columns([mapping.get(n, n)
                                for n in gt.column_names])
        right_t = gt.select([right_key] + take_cols)
    ref = ray.put(right_t)

    def block_join(t: pa.Table) -> pa.Table:
        overlap = set(take_cols) & set(t.column_names)
        if overlap:
            # mirror the partitioned path's plan-time ValueError so
            # the error surface does not flip with build-side size
            raise ValueError(
                f"take_cols collide with left columns: {overlap}")
        r = ray.get(ref)
        out = t.join(r, keys=[left_key], right_keys=[right_key],
                     join_type=join_type)
        # keep left columns + take_cols, original order
        cols = list(t.column_names) + [c for c in take_cols
                                       if c in out.column_names]
        return out.select(cols)

    return left_ds.map_batches(block_join,
                               batch_format="pyarrow"), "broadcast"
