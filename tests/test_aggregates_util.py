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
