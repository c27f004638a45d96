"""As-of join: vectorized composite-rank probe vs a naive per-row scan."""

import numpy as np
import pyarrow as pa

from log_analysis_ai_ray.stages.joins import asof_probe, build_asof_index


def _naive_asof(rk, rt, tie, lk, lt):
    """Latest right row with key==lk and ts<=lt; ties on (key, ts) keep
    the greatest tiebreak."""
    best, best_key = -1, None
    for i in range(len(rk)):
        if rk[i] == lk and rt[i] <= lt:
            cand = (rt[i], tie[i])
            if best_key is None or cand >= best_key:
                best, best_key = i, cand
    return best


def test_asof_probe_matches_naive():
    rng = np.random.default_rng(5)
    n_r, n_l = 200, 300
    rk = rng.integers(0, 12, size=n_r).astype(np.int64)
    rt = rng.integers(0, 50, size=n_r).astype(np.int64)
    tie = rng.permutation(n_r).astype(np.int64)
    right = pa.table({"k": rk, "ts": pa.array(rt).cast(pa.timestamp("us")),
                      "tie": tie, "val": np.arange(n_r)})
    idx = build_asof_index(right, "k", "ts", tiebreak_col="tie")

    lk = rng.integers(0, 14, size=n_l).astype(np.int64)  # incl missing keys
    lt = rng.integers(-5, 55, size=n_l).astype(np.int64)
    pos = asof_probe(idx, lk, lt)
    vals = np.asarray(idx["table"].column("val"))
    for j in range(n_l):
        naive = _naive_asof(rk, rt, tie, lk[j], lt[j])
        if naive < 0:
            assert pos[j] < 0
        else:
            assert pos[j] >= 0
            assert vals[pos[j]] == naive  # same original row wins


def test_union_find_clusters():
    from log_analysis_ai_ray.pipelines import queries as q

    pairs = pa.table({"doc_a": pa.array([1, 2, 10, 20], type=pa.int64()),
                      "doc_b": pa.array([2, 3, 11, 21], type=pa.int64()),
                      "est_jaccard": pa.array([1.0] * 4)})
    orig = q.q_doc_minhash_pairs
    try:
        q.q_doc_minhash_pairs = lambda sf: pairs
        out = q.q_near_dup_clusters("ignored")
    finally:
        q.q_doc_minhash_pairs = orig
    got = dict(zip(out["doc_id"].to_pylist(),
                   out["cluster_root"].to_pylist()))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_interval_overlap_counts_match_naive():
    from log_analysis_ai_ray.stages.joins import (build_interval_index,
                                                  interval_overlap_counts)

    rng = np.random.default_rng(6)
    n_r, n_l = 150, 250
    rk = rng.integers(0, 10, size=n_r).astype(np.int64)
    rs = rng.integers(0, 80, size=n_r).astype(np.int64)
    re_ = rs + rng.integers(1, 25, size=n_r)
    right = pa.table({"k": rk,
                      "s": pa.array(rs).cast(pa.timestamp("us")),
                      "e": pa.array(re_).cast(pa.timestamp("us"))})
    idx = build_interval_index(right, "k", "s", "e")
    lk = rng.integers(0, 12, size=n_l).astype(np.int64)
    lt = rng.integers(-5, 110, size=n_l).astype(np.int64)
    got = interval_overlap_counts(idx, lk, lt)
    for j in range(n_l):
        naive = int(((rk == lk[j]) & (rs <= lt[j]) & (re_ > lt[j])).sum())
        assert got[j] == naive

def test_asof_partitioned_matches_broadcast(ray_session):
    """The big-big hash-partitioned as-of path must agree row-for-row
    with the broadcast composite-rank probe."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.joins import (asof_join_broadcast,
                                                  asof_join_partitioned)

    rng = np.random.default_rng(17)
    n_r, n_l = 400, 900
    right = pa.table({
        "k": pa.array(rng.integers(0, 40, n_r), type=pa.int64()),
        "rts": pa.array(rng.integers(0, 1000, n_r), type=pa.int64()),
        "tie": pa.array(np.arange(n_r), type=pa.int64()),
        "payload": pa.array(rng.integers(0, 10**6, n_r), type=pa.int64()),
    })
    left = pa.table({
        "k": pa.array(rng.integers(0, 50, n_l), type=pa.int64()),
        "lts": pa.array(rng.integers(0, 1000, n_l), type=pa.int64()),
        "row": pa.array(np.arange(n_l), type=pa.int64()),
    })
    left_ds = ray.data.from_arrow(left).repartition(5)
    right_ds = ray.data.from_arrow(right).repartition(4)

    bcast = asof_join_broadcast(
        left_ds, right, left_key="k", left_ts="lts",
        take_cols=["payload", "tie"], right_key="k", right_ts="rts",
        tiebreak_col="tie")
    parted = asof_join_partitioned(
        left_ds, right_ds, left_key="k", left_ts="lts",
        right_key="k", right_ts="rts", take_cols=["payload", "tie"],
        tiebreak_col="tie", num_partitions=8)

    def rows(ds):
        t = pa.concat_tables(
            [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")],
            promote_options="default")
        return sorted(zip(t["row"].to_pylist(), t["k"].to_pylist(),
                          t["lts"].to_pylist(), t["payload"].to_pylist(),
                          t["tie"].to_pylist()))

    assert rows(bcast) == rows(parted)


def test_asof_partitioned_requires_tiebreak(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from log_analysis_ai_ray.stages.joins import asof_join_partitioned

    t = pa.table({"k": pa.array([1], type=pa.int64()),
                  "ts": pa.array([1], type=pa.int64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join_partitioned(ds, ds, left_key="k", left_ts="ts",
                              right_key="k", right_ts="ts",
                              take_cols=[], tiebreak_col=None)


def test_partitioned_lookup_join_parity(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data

    from log_analysis_ai_ray.stages.joins import partitioned_lookup_join

    rng = np.random.default_rng(11)
    left = pa.table({
        "k": pa.array(rng.integers(0, 200, 1_000), type=pa.int64()),
        "v": pa.array(rng.integers(0, 10**6, 1_000), type=pa.int64())})
    rkeys = rng.permutation(250)[:180]  # some left keys unmatched
    right = pa.table({
        "rk": pa.array(rkeys, type=pa.int64()),
        "payload": pa.array(rkeys * 7, type=pa.int64())})
    got = partitioned_lookup_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3),
        left_key="k", right_key="rk", take_cols=["payload"],
        num_partitions=8).to_pandas()
    want = left.to_pandas().merge(
        right.to_pandas().rename(columns={"rk": "k"}), on="k")
    cols = ["k", "v", "payload"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    with pytest.raises(ValueError, match="collide"):
        partitioned_lookup_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="k", right_key="rk", take_cols=["v"],
            left_schema=left.schema, right_schema=pa.schema(
                [("rk", pa.int64()), ("v", pa.int64())]))


def test_interval_partitioned_matches_broadcast(ray_session):
    """The big-big partitioned range-join path must agree per row with
    the broadcast interval-stabbing probe (keys present on one side
    only, zero-length and overlapping intervals included)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.joins import (
        interval_join_count_broadcast, interval_join_count_partitioned)

    rng = np.random.default_rng(23)
    n_r, n_l = 300, 800
    starts = rng.integers(0, 1000, n_r)
    right = pa.table({
        "k": pa.array(rng.integers(0, 40, n_r), type=pa.int64()),
        "s": pa.array(starts, type=pa.int64()),
        "e": pa.array(starts + rng.integers(0, 60, n_r),
                      type=pa.int64()),
    })
    left = pa.table({
        "k": pa.array(rng.integers(0, 50, n_l), type=pa.int64()),
        "lts": pa.array(rng.integers(0, 1050, n_l), type=pa.int64()),
        "row": pa.array(np.arange(n_l), type=pa.int64()),
    })
    left_ds = ray.data.from_arrow(left).repartition(5)
    right_ds = ray.data.from_arrow(right).repartition(4)

    bcast = interval_join_count_broadcast(
        left_ds, right, left_key="k", left_ts="lts",
        right_key="k", start_col="s", end_col="e")
    parted = interval_join_count_partitioned(
        left_ds, right_ds, left_key="k", left_ts="lts",
        right_key="k", start_col="s", end_col="e", num_partitions=8)

    b = bcast.to_pandas().sort_values("row").reset_index(drop=True)
    p = parted.to_pandas().sort_values("row").reset_index(drop=True)
    assert list(b["n_overlap"]) == list(p["n_overlap"])
    assert b["n_overlap"].sum() > 0


def test_partitioned_left_outer_join(ray_session):
    """'left outer' keeps unmatched left rows with nulls in take_cols,
    including partitions that hold zero right rows."""
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.joins import partitioned_lookup_join

    left = pa.table({
        "k": pa.array([1, 2, 3, 60, 61], type=pa.int64()),
        "tag": pa.array(["a", "b", "c", "d", "e"]),
    })
    right = pa.table({
        "rk": pa.array([2, 3], type=pa.int64()),
        "payload": pa.array([20, 30], type=pa.int64()),
    })
    out = partitioned_lookup_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right),
        left_key="k", right_key="rk", take_cols=["payload"],
        join_type="left outer", num_partitions=4).to_pandas()
    import pandas as pd

    got = {r.tag: (None if pd.isna(r.payload) else int(r.payload))
           for r in out.itertuples()}
    assert got == {"a": None, "b": 20, "c": 30, "d": None, "e": None}

    inner = partitioned_lookup_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right),
        left_key="k", right_key="rk", take_cols=["payload"],
        num_partitions=4).to_pandas()
    assert sorted(inner.tag) == ["b", "c"]


def test_partitioned_full_outer_join(ray_session):
    """'full outer' keeps unmatched rows of BOTH sides (null take_cols
    on the left-only rows, null payload on the right-only rows) and
    emits the COALESCEd join key, including partitions holding only
    one side."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.joins import partitioned_lookup_join

    left = pa.table({
        "k": pa.array([1, 2, 3, 60], type=pa.int64()),
        "tag": pa.array(["a", "b", "c", "d"]),
    })
    right = pa.table({
        "rk": pa.array([2, 3, 7, 61], type=pa.int64()),
        "payload": pa.array([20, 30, 70, 610], type=pa.int64()),
    })
    out = partitioned_lookup_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
        left_key="k", right_key="rk", take_cols=["payload"],
        join_type="full outer", emit_key="key",
        num_partitions=4).to_pandas()
    assert list(out.columns) == ["key", "k", "tag", "payload"]
    rows = {int(r.key): (None if pd.isna(r.tag) else r.tag,
                         None if pd.isna(r.payload) else int(r.payload))
            for r in out.itertuples()}
    assert rows == {
        1: ("a", None), 2: ("b", 20), 3: ("c", 30), 60: ("d", None),
        7: (None, 70), 61: (None, 610),
    }
    # coalesced key is never null
    assert not out.key.isna().any()


def test_partitioned_join_string_keys(ray_session):
    """String join keys partition via the vectorized hash and join on
    the original values; null keys never match (join semantics) and
    must not crash partitioning."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.joins import partitioned_lookup_join

    left = pa.table({
        "dom": pa.array(["a.com", "b.com", None, "c.com", "a.com"]),
        "n": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    })
    right = pa.table({
        "rdom": pa.array(["a.com", "c.com", "z.com"]),
        "tier": pa.array(["hi", "lo", "mid"]),
    })
    out = partitioned_lookup_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right),
        left_key="dom", right_key="rdom", take_cols=["tier"],
        join_type="left outer", num_partitions=4).to_pandas()
    got = sorted(((None if pd.isna(d) else d,
                   int(n), None if pd.isna(t) else t)
                  for d, n, t in zip(out.dom, out.n, out.tier)),
                 key=lambda r: (r[0] or "", r[1]))
    assert got == [(None, 3, None), ("a.com", 1, "hi"), ("a.com", 5, "hi"),
                   ("b.com", 2, None), ("c.com", 4, "lo")]

    import pytest
    with pytest.raises(ValueError):
        partitioned_lookup_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="dom", right_key="rdom", take_cols=["tier"],
            join_type="right outer")


def test_partitioned_join_cross_type_keys(ray_session):
    """A string left key joined against an int right key must hash
    both sides through the same path (cast to the canonical key type
    FIRST): before the fix, each side hashed by its own dtype and
    equal-after-cast keys landed in different partitions — 1 row
    survived out of 8, silently."""
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.joins import partitioned_lookup_join

    left = pa.table({
        "k": pa.array([str(i) for i in range(1, 9)]),
        "tag": pa.array(list("abcdefgh")),
    })
    right = pa.table({
        "rk": pa.array(list(range(1, 9)), type=pa.int64()),
        "payload": pa.array([i * 10 for i in range(1, 9)],
                            type=pa.int64()),
    })
    out = partitioned_lookup_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
        left_key="k", right_key="rk", take_cols=["payload"],
        num_partitions=8).to_pandas()
    assert len(out) == 8
    assert sorted(zip(out.k, out.payload)) == \
        [(str(i), i * 10) for i in range(1, 9)]


def test_partitioned_join_right_combine_folds_partials(ray_session):
    """Non-unique right-side partials fold to per-key sums inside each
    partition — parity with pre-aggregating before the join."""
    import numpy as np
    import ray

    from log_analysis_ai_ray.stages.joins import partitioned_lookup_join

    rng = np.random.RandomState(5)
    keys = rng.randint(0, 40, size=300)
    vals = rng.randint(1, 100, size=300)
    left = pa.table({"k": pa.array(range(40), type=pa.int64()),
                     "tag": pa.array([f"t{i}" for i in range(40)])})
    right = pa.table({"rk": pa.array(keys, type=pa.int64()),
                      "v": pa.array(vals, type=pa.int64())})
    out = partitioned_lookup_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(6),
        left_key="k", right_key="rk", take_cols=["v"],
        num_partitions=8, right_combine=[("v", "sum")],
        join_type="left outer").to_pandas()
    assert len(out) == 40
    expect = {}
    for k, v in zip(keys, vals):
        expect[int(k)] = expect.get(int(k), 0) + int(v)
    for _, row in out.iterrows():
        e = expect.get(int(row.k))
        got = None if row.isna().v else int(row.v)
        assert got == e


def test_right_combine_rejects_salt_and_unknown_cols(ray_session):
    import ray

    from log_analysis_ai_ray.stages.joins import partitioned_lookup_join

    t = pa.table({"k": pa.array([1], type=pa.int64()),
                  "v": pa.array([1], type=pa.int64())})
    ds = ray.data.from_arrow(t)
    import pytest
    with pytest.raises(ValueError):
        partitioned_lookup_join(ds, ds, left_key="k", right_key="k",
                                take_cols=["v"],
                                right_combine=[("nope", "sum")])
    with pytest.raises(ValueError):
        partitioned_lookup_join(ds, ds, left_key="k", right_key="k",
                                take_cols=["v"], salt=2,
                                right_combine=[("v", "sum")])
