"""Hot-key salting in partitioned_lookup_join: identical output to the
unsalted path on a 90 %-skewed probe side, hot-key probe rows spread
across salt sub-partitions, full-outer + salt rejected."""

import numpy as np
import pyarrow as pa

from log_analysis_ai_ray.stages.joins import (_hash_partition_ids,
                                              _salt_slots,
                                              partitioned_lookup_join)


def _skewed_inputs():
    import ray.data

    rng = np.random.default_rng(11)
    # 90% of probe rows hit key 7
    keys = np.where(rng.random(5000) < 0.9, 7,
                    rng.integers(0, 100, 5000)).astype(np.int64)
    left = pa.table({"k": pa.array(keys),
                     "v": pa.array(np.arange(5000, dtype=np.int64))})
    right = pa.table({"rk": pa.array(np.arange(100, dtype=np.int64)),
                      "label": pa.array([f"L{i}" for i in range(100)],
                                        pa.string())})
    return (ray.data.from_arrow(left), ray.data.from_arrow(right),
            left, right)


def _sorted_pandas(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_salted_parity_with_unsalted(ray_session):
    lds, rds, _, _ = _skewed_inputs()
    base = partitioned_lookup_join(
        lds, rds, left_key="k", right_key="rk", take_cols=["label"],
        num_partitions=8)
    lds2, rds2, _, _ = _skewed_inputs()
    salted = partitioned_lookup_join(
        lds2, rds2, left_key="k", right_key="rk", take_cols=["label"],
        num_partitions=8, salt=4)
    a, b = _sorted_pandas(base), _sorted_pandas(salted)
    assert a.equals(b)
    assert len(a) == 5000


def test_salted_left_outer_parity(ray_session):
    import ray.data

    left = pa.table({"k": pa.array([7] * 50 + [999] * 3, pa.int64()),
                     "v": pa.array(range(53), type=pa.int64())})
    right = pa.table({"rk": pa.array([7], pa.int64()),
                      "label": pa.array(["hot"], pa.string())})
    out = partitioned_lookup_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        left_key="k", right_key="rk", take_cols=["label"],
        num_partitions=4, join_type="left outer", salt=3)
    df = out.to_pandas()
    assert len(df) == 53                      # no duplicate left rows
    assert (df[df.k == 7].label == "hot").all()
    assert df[df.k == 999].label.isna().all()


def test_hot_key_rows_spread_across_salt_slots():
    u64 = np.full(10_000, np.uint64(12345))   # one hot key
    slots = _salt_slots(u64, 8)
    counts = np.bincount(slots, minlength=8)
    assert (counts > 0).all()                 # every slot used
    assert counts.max() < 10_000 * 0.25       # no slot dominates
    # base partition of the hot key is a single value; salting is
    # what splits it
    pk = _hash_partition_ids(u64.view(np.int64), 8)
    assert len(np.unique(pk)) == 1


def test_full_outer_with_salt_rejected(ray_session):
    lds, rds, _, _ = _skewed_inputs()
    try:
        partitioned_lookup_join(
            lds, rds, left_key="k", right_key="rk",
            take_cols=["label"], join_type="full outer", salt=2)
        raise AssertionError("full outer + salt must raise")
    except ValueError:
        pass
