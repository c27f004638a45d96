import pyarrow as pa

from log_analysis_ai_ray.stages.aggregate import salted_count


def test_salted_count_matches_plain(ray_session):
    import ray.data

    # Zipfian hot key: 'hot' owns 80% of rows
    keys = ["hot"] * 800 + [f"k{i}" for i in range(200)]
    t = pa.table({"k": pa.array(keys, type=pa.string())})
    ds = ray.data.from_arrow(t).repartition(5)
    out = salted_count(ds, "k", num_salts=8)
    got = dict(zip(out["k"].to_pylist(), out["cnt"].to_pylist()))
    assert got["hot"] == 800
    assert sum(got.values()) == 1000
    assert len(got) == 201


def test_pre_epoch_hour_bucket_not_null(ray_session):
    """ADVICE r1: hour -1 (1969-12-31T23:00) is a real bucket; pre-epoch
    rows must land there, with null-timestamp rows kept separate."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from log_analysis_ai_ray.stages.aggregate import combined_aggregates

    ts = pa.array([np.datetime64("1969-12-31T23:30:00", "us"),
                   np.datetime64("1969-12-31T23:45:00", "us"),
                   None], type=pa.timestamp("us"))
    batch = pa.table({
        "line": pa.array(["a", "b", "c"]),
        "level": pa.array(["INFO"] * 3),
        "line_ts": ts,
        "template": pa.array(["t <*>"] * 3),
        "template_hash": pa.array([5] * 3, type=pa.int64()),
        "params": pa.array([["x"]] * 3, type=pa.list_(pa.string())),
        "parse_ok": pa.array([True] * 3),
    })
    out = combined_aggregates(ray.data.from_arrow(batch))
    rollup = out["rollup"]
    buckets = dict(zip(rollup["bucket"].to_pylist(),
                       rollup["count"].to_pylist()))
    import datetime
    pre = datetime.datetime(1969, 12, 31, 23, 0)
    assert buckets.get(pre) == 2          # real pre-epoch bucket
    assert buckets.get(None) == 1         # null ts stays null


def test_incremental_merge_equals_full_run(ray_session, pages_small,
                                           tmp_path):
    """Incremental ingest invariant: running the flagship on each half
    of the corpus with a SHARED mapping and merging the registries and
    rollups must equal the single full run exactly."""
    from log_analysis_ai_ray.pipelines import flagship
    from log_analysis_ai_ray.sources.pages import list_page_files
    from log_analysis_ai_ray.stages.aggregate import (merge_registries,
                                                      merge_rollups)

    files = list_page_files(pages_small)
    assert len(files) >= 2
    half = len(files) // 2
    mapping = flagship.fit_mapping(pages_small)

    full = flagship.run(pages_small, str(tmp_path / "full"),
                        mapping=mapping)
    a = flagship.run(files[:half], str(tmp_path / "a"), mapping=mapping)
    b = flagship.run(files[half:], str(tmp_path / "b"), mapping=mapping)

    merged_reg = merge_registries([a["registry"], b["registry"]])
    assert merged_reg.equals(full["registry"])

    merged_roll = merge_rollups([a["rollup"], b["rollup"]])
    assert merged_roll.equals(full["rollup"])
