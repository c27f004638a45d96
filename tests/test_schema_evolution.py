"""Schema evolution in the versioned store: a version whose files were
written before and after an ADD COLUMN reads as the union schema with
typed nulls; incompatible type reuse is an error; the homogeneous fast
path is untouched."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from log_analysis_ai_ray.state import versioned


def _mk_evolved(root):
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64()),
                             "v": pa.array([10, 20], pa.int64())}),
                   os.path.join(root, "old.parquet"))
    pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                             "v": pa.array([30], pa.int64()),
                             "tag": pa.array(["x"], pa.string())}),
                   os.path.join(root, "new.parquet"))
    return versioned.commit_version(
        root, ["old.parquet", "new.parquet"], parent=None,
        op="add-column")


def test_union_schema_with_typed_nulls(ray_session, tmp_path):
    root = str(tmp_path / "t")
    _mk_evolved(root)
    ds = versioned.read_version(root, schema_evolution=True)
    tbl = pa.Table.from_pylist(ds.take_all())
    df = tbl.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "v", "tag"]
    assert df["id"].tolist() == [1, 2, 3]
    assert df["tag"].tolist()[:2] == [None, None]
    assert df["tag"].tolist()[2] == "x"


def test_incompatible_type_reuse_raises(ray_session, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}),
                   os.path.join(root, "a.parquet"))
    pq.write_table(pa.table({"id": pa.array(["s"], pa.string())}),
                   os.path.join(root, "b.parquet"))
    versioned.commit_version(root, ["a.parquet", "b.parquet"],
                             parent=None, op="bad")
    try:
        versioned.read_version(root, schema_evolution=True)
        raise AssertionError("type conflict must raise")
    except ValueError as e:
        assert "cannot unify" in str(e)


def test_homogeneous_fast_path_unchanged(ray_session, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    for n in ("a", "b"):
        pq.write_table(pa.table({"id": pa.array([1], pa.int64())}),
                       os.path.join(root, f"{n}.parquet"))
    versioned.commit_version(root, ["a.parquet", "b.parquet"],
                             parent=None, op="create")
    assert versioned.read_version(root).count() == 2
    assert versioned.read_version(
        root, schema_evolution=True).count() == 2
