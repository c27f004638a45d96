"""Misra-Gries sketch: superset guarantee, merge associativity, exact
heavy hitters via the two-pass pipeline."""

import numpy as np
import pyarrow as pa

from log_analysis_ai_ray.stages import sketch


def _stream(rng, n, zipf_vocab=50):
    ranks = np.clip(rng.zipf(1.5, size=n), 1, zipf_vocab)
    return np.array([f"w{r}" for r in ranks], dtype=object)


def test_mg_superset_guarantee():
    rng = np.random.default_rng(9)
    items = _stream(rng, 20_000)
    uniq, counts = np.unique(items, return_counts=True)
    k = 20
    counters = {}
    sketch.mg_update(counters, uniq, counts, k)
    n = len(items)
    exact_heavy = {u for u, c in zip(uniq, counts) if c > n / k}
    assert exact_heavy <= set(counters)  # every heavy item survives
    # undercount bound: estimate >= true - n/k
    truth = dict(zip(uniq, counts))
    for item, est in counters.items():
        assert est <= truth[item]
        assert est >= truth[item] - n / k


def test_mg_merge_keeps_guarantee():
    rng = np.random.default_rng(10)
    k = 25
    parts, alls = [], []
    for _ in range(8):
        items = _stream(rng, 5_000)
        alls.append(items)
        uniq, counts = np.unique(items, return_counts=True)
        c = {}
        sketch.mg_update(c, uniq, counts, k)
        parts.append(c)
    merged = parts[0]
    for p in parts[1:]:
        merged = sketch.mg_merge(merged, p, k)
    allitems = np.concatenate(alls)
    uniq, counts = np.unique(allitems, return_counts=True)
    n = len(allitems)
    exact_heavy = {u for u, c in zip(uniq, counts) if c > 2 * n / k}
    assert exact_heavy <= set(merged)


def test_heavy_hitter_tokens_exact(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    docs = []
    for i in range(60):
        toks = _stream(rng, 200)
        docs.append(" ".join(toks.tolist()))
    t = pa.table({"text": pa.array(docs)})
    out = sketch.heavy_hitter_tokens(
        ray.data.from_arrow(t).repartition(5), phi=0.01)
    # exact reference
    alltoks = " ".join(docs).split()
    uniq, counts = np.unique(np.array(alltoks, dtype=object),
                             return_counts=True)
    n = len(alltoks)
    expected = {u: int(c) for u, c in zip(uniq, counts)
                if c > int(n * 0.01)}
    got = dict(zip(out["token"].to_pylist(), out["cnt"].to_pylist()))
    assert got == expected


def test_corpus_containing_old_sentinel_token(ray_session):
    """A corpus whose text actually contains the literal token
    '\\x00TOTAL' must count it like any other token (ADVICE r2: the
    total used to ride in-band as that magic string)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import heavy_hitter_tokens

    texts = ["\x00TOTAL appears here \x00TOTAL often \x00TOTAL"] * 20 \
        + ["filler words only"] * 5
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    out = heavy_hitter_tokens(ray.data.from_arrow(t).repartition(3),
                              phi=0.2)
    got = dict(zip(out["token"].to_pylist(), out["cnt"].to_pylist()))
    assert got["\x00TOTAL"] == 60  # counted exactly, not swallowed


def test_hll_error_bound_and_mergeability(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import (approx_distinct,
                                                   hll_merge,
                                                   hll_registers)

    rng = np.random.default_rng(13)
    vals = rng.choice(np.arange(1_000_000), size=120_000, replace=False)
    vals = np.concatenate([vals, vals[:20_000]])  # dups don't inflate
    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    est = approx_distinct(ray.data.from_arrow(t).repartition(8), "v")
    assert abs(est - 120_000) / 120_000 < 0.05

    # merge(partials) == single-pass registers, bit-exact
    a, b = vals[:70_000], vals[70_000:]
    merged = hll_merge(hll_registers(a), hll_registers(b))
    assert np.array_equal(merged, hll_registers(vals))

    # block-structure invariance of the estimate
    est2 = approx_distinct(ray.data.from_arrow(t).repartition(3), "v")
    assert est == est2


def test_hll_small_cardinality_linear_counting(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import approx_distinct

    t = pa.table({"v": pa.array(np.arange(50).repeat(10),
                                type=pa.int64())})
    est = approx_distinct(ray.data.from_arrow(t), "v")
    assert est == 50  # linear-counting regime is near-exact here


def test_quantile_compress_rank_error_bound():
    import numpy as np

    from log_analysis_ai_ray.stages.sketch import (quantile_compress,
                                                   quantile_query)

    rng = np.random.default_rng(7)
    k = 256
    for vals in [rng.uniform(0, 1, 100_000),
                 rng.zipf(1.5, 100_000).astype(float),
                 np.full(10_000, 3.25),
                 np.concatenate([np.zeros(99_000), np.ones(1_000)])]:
        pts, wts = quantile_compress(vals, None, k)
        assert len(pts) <= k
        n = len(vals)
        srt = np.sort(vals)
        for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
            est = quantile_query(pts, wts, [q])[0]
            # rank of the estimate must be within n/k of the target
            lo = np.searchsorted(srt, est, side="left")
            hi = np.searchsorted(srt, est, side="right")
            target = q * n
            err = 0 if lo <= target <= hi else min(abs(lo - target),
                                                   abs(hi - target))
            assert err <= n / k + 1, (q, err)


def test_quantile_summary_merge_and_block_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import (approx_quantiles,
                                                   quantile_compress,
                                                   quantile_query)

    rng = np.random.default_rng(11)
    vals = rng.normal(50, 10, 60_000)
    t = pa.table({"value": pa.array(vals, type=pa.float64())})
    qs = [0.05, 0.5, 0.95]

    est_1 = approx_quantiles(ray.data.from_arrow(t), "value", qs, k=256)
    est_8 = approx_quantiles(
        ray.data.from_arrow(t).repartition(8), "value", qs, k=256)
    exact = np.quantile(vals, qs)
    n = len(vals)
    srt = np.sort(vals)
    for est in (est_1, est_8):
        for q, e in zip(qs, est):
            rank = np.searchsorted(srt, e)
            assert abs(rank - q * n) <= 2 * n / 256 + 1
    # merging two summaries ≡ one summary over the union (up to the
    # documented bound): check the merged read stays within bound too
    p1, w1 = quantile_compress(vals[:30_000], None, 256)
    p2, w2 = quantile_compress(vals[30_000:], None, 256)
    merged_pts = np.concatenate([p1, p2])
    merged_wts = np.concatenate([w1, w2])
    for q, e_exact in zip(qs, exact):
        e = quantile_query(merged_pts, merged_wts, [q])[0]
        rank = np.searchsorted(srt, e)
        assert abs(rank - q * n) <= 2 * n / 256 + 1


def test_quantile_compress_edge_cases():
    import numpy as np

    from log_analysis_ai_ray.stages.sketch import (quantile_compress,
                                                   quantile_query)

    # empty + all-NaN
    pts, wts = quantile_compress(np.array([]), None, 16)
    assert len(pts) == 0
    assert np.isnan(quantile_query(pts, wts, [0.5])[0])
    pts, _ = quantile_compress(np.array([np.nan, np.nan]), None, 16)
    assert len(pts) == 0
    # short input passes through exactly
    pts, wts = quantile_compress(np.array([3.0, 1.0, 2.0]), None, 16)
    assert list(pts) == [1.0, 2.0, 3.0]
    assert quantile_query(pts, wts, [0.5])[0] == 2.0


def test_grouped_hll_matches_global_per_group(ray_session):
    """The grouped HLL must give, per group, the same estimate as a
    global HLL run over only that group's values (merge correctness),
    and stay within the error bound of the exact count."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import (approx_distinct,
                                                   approx_distinct_by)

    rng = np.random.default_rng(5)
    n = 40_000
    g = np.where(rng.random(n) < 0.7, "a", "b")
    vals = np.where(g == "a", rng.integers(0, 3_000, n),
                    rng.integers(10**6, 10**6 + 500, n))
    t = pa.table({"g": pa.array(g), "v": pa.array(vals, type=pa.int64())})
    ds = ray.data.from_arrow(t).repartition(8)
    by = approx_distinct_by(ds, "v", "g")
    assert set(by) == {"a", "b"}
    for key, exact in (("a", len(np.unique(vals[g == "a"]))),
                       ("b", len(np.unique(vals[g == "b"])))):
        sub = ray.data.from_arrow(
            t.filter(pa.array(g == key))).repartition(4)
        assert by[key] == approx_distinct(sub, "v")   # merge == subset
        assert abs(by[key] - exact) <= max(2, 0.05 * exact)


def test_grouped_quantiles_rank_bound(ray_session):
    """Per-group sketch quantiles must land within the documented
    n_g/k rank-error bound of the exact per-group quantile, and match
    a global sketch run over only that group's values (mergeability),
    on skewed group sizes."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import approx_quantiles_by

    rng = np.random.default_rng(11)
    n = 50_000
    g = np.where(rng.random(n) < 0.9, "big", "small")
    vals = np.where(g == "big", rng.normal(100, 15, n),
                    rng.exponential(5, n))
    t = pa.table({"g": pa.array(g), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(8)
    k = 128
    qs = [0.1, 0.5, 0.9]
    by = approx_quantiles_by(ds, "v", "g", qs, k=k)
    assert set(by) == {"big", "small"}
    for key in ("big", "small"):
        vv = np.sort(vals[g == key])
        n_g = len(vv)
        for q, est in zip(qs, by[key]):
            # exact rank interval of the estimate within the group
            lt = np.searchsorted(vv, est, side="left")
            le = np.searchsorted(vv, est, side="right")
            target = q * n_g
            bound = n_g / k + n_g / (4 * k)  # block + re-compress error
            assert lt - bound <= target <= le + bound, \
                (key, q, est, lt, le, target)


def test_grouped_sketches_drop_nulls(ray_session):
    """Null values must not hash as garbage INT64_MIN 'distinct users'
    and null group keys must not crash the grouped stages (they are
    dropped, matching the global stages' drop_null)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import (approx_distinct_by,
                                                   approx_quantiles_by)

    t = pa.table({
        "g": pa.array(["a", "a", None, "b", "a", "b"]),
        "v": pa.array([1, None, 7, 2, 1, None], type=pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    by = approx_distinct_by(ds, "v", "g")
    assert by == {"a": 1, "b": 1}  # nulls contribute nothing

    tq = pa.table({
        "g": pa.array(["a", None, "a", "b"]),
        "v": pa.array([1.0, 9.0, 3.0, 5.0]),
    })
    byq = approx_quantiles_by(ray.data.from_arrow(tq).repartition(2),
                              "v", "g", [0.5], k=16)
    assert set(byq) == {"a", "b"}
    assert float(byq["b"][0]) == 5.0


def test_heavy_hitters_line_granularity(ray_session):
    """split_pattern=newline turns the heavy-hitter operator into
    boilerplate-LINE detection; the exact-recount guarantee holds at
    any granularity."""
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.sketch import heavy_hitter_tokens

    boiler = "subscribe to our newsletter"
    docs = [f"unique line {i}\n{boiler}\nbody {i * 7}" for i in range(40)]
    docs += [f"solo doc {i}" for i in range(20)]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(docs)})).repartition(4)
    out = heavy_hitter_tokens(ds, phi=0.2, split_pattern=r"\n")
    # 40 boiler lines / 140 total non-empty lines = 0.286 > phi
    assert out.column("token").to_pylist() == [boiler]
    assert out.column("cnt").to_pylist() == [40]
