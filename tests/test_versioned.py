"""Versioned-manifest tables (state/versioned.py): commit atomicity,
time travel, diff, and double-commit protection."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from log_analysis_ai_ray.state import versioned


def _write(root, rel, n):
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"x": list(range(n))}), path)


def test_commit_read_diff_time_travel(tmp_path):
    root = str(tmp_path)
    _write(root, "base/a.parquet", 3)
    _write(root, "base/b.parquet", 2)
    v1 = versioned.commit_version(root, ["base/a.parquet",
                                         "base/b.parquet"],
                                  parent=0, op="create")
    assert v1 == 1
    _write(root, "v2/b.parquet", 1)     # b rewritten smaller
    v2 = versioned.commit_version(root, ["base/a.parquet",
                                         "v2/b.parquet"],
                                  parent=v1, op="rewrite")
    assert versioned.latest_version(root) == v2 == 2
    m1, m2 = (versioned.read_manifest(root, v) for v in (1, 2))
    assert m2["parent"] == 1 and m1["parent"] == 0
    d = versioned.diff_versions(root, 1, 2)
    assert d == {"added": ["v2/b.parquet"],
                 "removed": ["base/b.parquet"], "unchanged": 1}


def test_sequential_recommit_appends_not_overwrites(tmp_path):
    # version numbers come from latest+1, so a recompute with an old
    # parent appends a new version instead of colliding with (and
    # silently losing to) the existing successor
    root = str(tmp_path)
    _write(root, "base/a.parquet", 1)
    v1 = versioned.commit_version(root, ["base/a.parquet"], parent=0,
                                  op="create")
    v2 = versioned.commit_version(root, ["base/a.parquet"],
                                  parent=v1, op="rewrite")
    v3 = versioned.commit_version(root, ["base/a.parquet"],
                                  parent=v1, op="rewrite")  # recompute
    assert (v1, v2, v3) == (1, 2, 3)
    assert versioned.read_manifest(root, 3)["parent"] == 1


def test_concurrent_same_number_commit_rejected(tmp_path,
                                                monkeypatch):
    # two writers that computed the SAME next version: the os.link
    # publish raises for the loser instead of overwriting the winner
    root = str(tmp_path)
    _write(root, "base/a.parquet", 1)
    versioned.commit_version(root, ["base/a.parquet"], parent=0,
                             op="create")
    monkeypatch.setattr(versioned, "latest_version", lambda r: 0)
    with pytest.raises(FileExistsError):
        versioned.commit_version(root, ["base/a.parquet"], parent=0,
                                 op="create")


def test_crash_leaves_table_unchanged(tmp_path):
    # a writer that wrote data files but never committed a manifest
    # does not change what readers see
    root = str(tmp_path)
    _write(root, "base/a.parquet", 4)
    versioned.commit_version(root, ["base/a.parquet"], parent=0,
                             op="create")
    _write(root, "orphan/x.parquet", 9)   # crash before commit
    m = versioned.read_manifest(root)
    assert m["files"] == ["base/a.parquet"]


def test_read_version_dataset(ray_session, tmp_path):
    root = str(tmp_path)
    _write(root, "base/a.parquet", 3)
    _write(root, "base/b.parquet", 2)
    versioned.commit_version(root, ["base/a.parquet",
                                    "base/b.parquet"], parent=0,
                             op="create")
    _write(root, "v2/a.parquet", 1)
    versioned.commit_version(root, ["v2/a.parquet",
                                    "base/b.parquet"], parent=1,
                             op="rewrite")
    assert versioned.read_version(root, 1).count() == 5
    assert versioned.read_version(root).count() == 3  # head = v2
