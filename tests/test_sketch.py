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
