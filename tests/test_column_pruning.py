"""Evidence that `_read(columns=...)` prunes at the parquet source:
bytes produced by the pruned read are a small fraction of the full-
schema read (checked via Dataset.stats(), the same signal a cluster
operator would inspect)."""

def _read_output_bytes(ds) -> int:
    return ds.materialize().size_bytes()


def test_column_pruned_read_is_smaller(ray_session):
    from log_analysis_ai_ray.pipelines.queries import _read

    sf = "/root/testdata/sf0.01"
    full = _read(sf, "events")
    one = _read(sf, "events", columns=["event_type"])
    b_full = _read_output_bytes(full)
    b_one = _read_output_bytes(one)
    assert b_one * 3 < b_full, (b_one, b_full)


def test_pruned_read_keeps_only_requested_columns(ray_session):
    from log_analysis_ai_ray.pipelines.queries import _read

    sf = "/root/testdata/sf0.01"
    ds = _read(sf, "lineitem", columns=["l_orderkey", "l_quantity"])
    assert set(ds.schema().names) == {"l_orderkey", "l_quantity"}
