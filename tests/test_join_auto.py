"""Cost-based join path selection: small build side -> broadcast,
large -> partitioned; both paths produce identical rows."""

import numpy as np
import pyarrow as pa

from log_analysis_ai_ray.stages.joins import lookup_join_auto


def _inputs():
    import ray.data

    rng = np.random.default_rng(3)
    left = pa.table({
        "k": pa.array(rng.integers(0, 50, 2000).astype(np.int64)),
        "v": pa.array(np.arange(2000, dtype=np.int64))})
    right = pa.table({
        "rk": pa.array(np.arange(50, dtype=np.int64)),
        "label": pa.array([f"L{i}" for i in range(50)], pa.string())})
    return ray.data.from_arrow(left), ray.data.from_arrow(right)


def _sorted(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_auto_picks_broadcast_for_small_build(ray_session):
    lds, rds = _inputs()
    out, path = lookup_join_auto(lds, rds, left_key="k",
                                 right_key="rk", take_cols=["label"])
    assert path == "broadcast"
    df = _sorted(out)
    assert len(df) == 2000
    assert (df.label == "L" + df.k.astype(str)).all()


def test_auto_picks_partitioned_past_threshold(ray_session):
    lds, rds = _inputs()
    out, path = lookup_join_auto(lds, rds, left_key="k",
                                 right_key="rk", take_cols=["label"],
                                 broadcast_max_rows=10)
    assert path == "partitioned"
    df = _sorted(out)
    assert len(df) == 2000


def test_paths_are_row_identical(ray_session):
    lds, rds = _inputs()
    a, pa_ = lookup_join_auto(lds, rds, left_key="k", right_key="rk",
                              take_cols=["label"])
    lds2, rds2 = _inputs()
    b, pb = lookup_join_auto(lds2, rds2, left_key="k", right_key="rk",
                             take_cols=["label"],
                             broadcast_max_rows=10)
    assert (pa_, pb) == ("broadcast", "partitioned")
    assert _sorted(a).equals(_sorted(b))
