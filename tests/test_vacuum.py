"""Versioned-store VACUUM: retention drops old manifests, deletes only
files unreferenced by every retained version, keeps copy-on-write
shared files, and leaves retained reads intact."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from log_analysis_ai_ray.state import versioned


def _mk_store(root):
    """4 versions over copy-on-write files:
    v1: a.parquet b.parquet
    v2: a b c          (add)
    v3: a c d          (drop b, add d)
    v4: a c d e        (add e)
    'a' is shared by all; 'b' dies with v1/v2; versions chain parents.
    """
    os.makedirs(root, exist_ok=True)
    for name, val in (("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5)):
        pq.write_table(pa.table({"x": pa.array([val], pa.int64())}),
                       os.path.join(root, f"{name}.parquet"))
    v1 = versioned.commit_version(root, ["a.parquet", "b.parquet"],
                                  parent=None, op="create")
    v2 = versioned.commit_version(root, ["a.parquet", "b.parquet",
                                         "c.parquet"],
                                  parent=v1, op="append")
    v3 = versioned.commit_version(root, ["a.parquet", "c.parquet",
                                         "d.parquet"],
                                  parent=v2, op="rewrite")
    v4 = versioned.commit_version(root, ["a.parquet", "c.parquet",
                                         "d.parquet", "e.parquet"],
                                  parent=v3, op="append")
    return v1, v2, v3, v4


def test_vacuum_dry_run_reports_without_deleting(tmp_path):
    root = str(tmp_path / "t")
    _mk_store(root)
    rep = versioned.vacuum_versions(root, keep_last=2, dry_run=True)
    assert rep["kept_versions"] == [3, 4]
    assert rep["dropped_versions"] == [1, 2]
    assert rep["deleted_files"] == ["b.parquet"]
    # nothing actually touched
    assert os.path.exists(os.path.join(root, "b.parquet"))
    assert versioned.latest_version(root) == 4
    assert versioned.read_manifest(root, 1)["op"] == "create"


def test_vacuum_deletes_only_unreferenced_files(tmp_path):
    root = str(tmp_path / "t")
    _mk_store(root)
    rep = versioned.vacuum_versions(root, keep_last=2)
    assert rep["deleted_files"] == ["b.parquet"]
    assert not os.path.exists(os.path.join(root, "b.parquet"))
    # shared 'a' and live c/d/e survive
    for f in ("a", "c", "d", "e"):
        assert os.path.exists(os.path.join(root, f"{f}.parquet"))
    # dropped manifests gone, kept ones intact with lineage
    assert not os.path.exists(versioned._vpath(root, 1))
    assert not os.path.exists(versioned._vpath(root, 2))
    assert versioned.read_manifest(root, 3)["parent"] == 2
    assert versioned.latest_version(root) == 4


def test_vacuum_retained_reads_still_work(ray_session, tmp_path):
    root = str(tmp_path / "t")
    _mk_store(root)
    versioned.vacuum_versions(root, keep_last=2)
    rows = versioned.read_version(root, 4).take_all()
    assert sorted(r["x"] for r in rows) == [1, 3, 4, 5]
    rows3 = versioned.read_version(root, 3).take_all()
    assert sorted(r["x"] for r in rows3) == [1, 3, 4]


def test_vacuum_keep_all_and_validation(tmp_path):
    root = str(tmp_path / "t")
    _mk_store(root)
    rep = versioned.vacuum_versions(root, keep_last=10)
    assert rep["dropped_versions"] == []
    assert rep["deleted_files"] == []
    assert versioned.latest_version(root) == 4
    try:
        versioned.vacuum_versions(root, keep_last=0)
        raise AssertionError("keep_last=0 must raise")
    except ValueError:
        pass


def test_vacuum_idempotent(tmp_path):
    root = str(tmp_path / "t")
    _mk_store(root)
    versioned.vacuum_versions(root, keep_last=2)
    rep2 = versioned.vacuum_versions(root, keep_last=2)
    assert rep2["dropped_versions"] == []
    assert rep2["deleted_files"] == []
